package graft

import java.io.PrintWriter

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.debug._

/** Dev-only plan-dump entry (not part of the driver contract): writes
  * formatted physical plans for the signature queries to docs/PLANS.md
  * input material.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.1"
    val out = new PrintWriter("/tmp/plans.txt")
    for (q <- Seq("q01_flagship", "q10_cube_month", "q32_minhash_candidates",
        "q37_ann_cosine_topk", "q24_tpch_q1", "q55_asof_bucketed",
        "q71_decontaminate")) {
      out.println(s"##### $q")
      out.println(SparkEntry.queries(q)(spark, sf)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      out.println()
    }
    out.close()
    println("plans written")
    spark.stop()
  }
}
