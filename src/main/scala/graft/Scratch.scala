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

/** Dev-only isolated re-measure of bench outliers (not part of the
  * driver contract) — the falsification run VERDICT r15 asked for on
  * the once-per-run single samples (q135 16.2 s vs 4.3 s on a loaded
  * host): same session config as [[Bench]], same warmup, N samples per
  * query on an otherwise idle JVM, every sample printed.
  */
object QuietMeasure {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val queries = if (args.length > 1) args.drop(1).toSeq
      else Seq("q119_quality_classifier", "q135_stream_bm25",
        "q136_stream_hybrid")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        "1m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for (q <- queries; pass <- 1 to 3) {
      SparkEntry.cleanIndexScratch()
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, sfDir).count()
      println(f"$q%-26s pass $pass: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
