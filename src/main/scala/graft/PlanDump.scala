package graft

import java.io.PrintWriter

import org.apache.spark.sql.SparkSession

/** Dev-only formatted-plan dumper for the optimization rounds (not part
  * of the driver contract): writes `plans/<round>/<query>_<suffix>.txt`
  * with `.explain("formatted")` output for each named query, under the
  * SAME session configuration as [[Bench]] (master/core count from
  * `SPARK_GRAFT_CPUS`, AQE with the bench-scale advisory sizes) so the
  * committed plans are the plans the bench actually executes.
  *
  * Usage: `runMain graft.PlanDump <suffix> <query...>`; `all` expands
  * to every `SparkEntry.queries` entry. Round dir from
  * `SPARK_GRAFT_PLAN_DIR` (default plans/r19).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val suffix = args.headOption.getOrElse("before")
    val names =
      if (args.drop(1).toSeq == Seq("all")) SparkEntry.queries.keys.toSeq.sorted
      else args.drop(1).toSeq
    require(names.nonEmpty, "usage: PlanDump <suffix> <query...|all>")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val planDir = sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "plans/r19")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(planDir))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for (q <- names) {
      SparkEntry.cleanIndexScratch()
      val out = new PrintWriter(s"$planDir/${q}_$suffix.txt")
      try {
        out.println(s"# $q — explain(formatted), $sfDir, local[$cpus]")
        out.println(SparkEntry.queries(q)(spark, sfDir)
          .queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
      } catch {
        case e: Throwable => out.println(s"PLAN DUMP FAILED: $e")
      } finally out.close()
      println(s"dumped $q")
    }
    spark.stop()
  }
}
