package graft

import org.apache.spark.sql.SparkSession

/** Scheduler entry point for the extension-tier corpus lifecycle — the
  * E3-analog shell surface ([[RefDataMain]] is the reference-tier
  * model): one subcommand per composed job.
  *
  *   - `refresh <batchDir> <indexRoot> <corpusDir> [embeddingsDir]` —
  *     [[Pipeline.refreshCorpus]] over a parquet batch (and optional
  *     `(vec_id, embedding)` parquet); prints the one-row report.
  *   - `retract <idsDir> <indexRoot> <corpusDir>` —
  *     [[Pipeline.retractCorpus]] over a one-column parquet of ids;
  *     prints the one-row report.
  *   - `maintain <indexRoot>` — [[Pipeline.maintainIndexes]]
  *     compaction sweep.
  *   - `rebuild-ivf <indexRoot> <nlist>` —
  *     [[graft.operators.Similarity.rebuildIvfIndex]] over the
  *     `<indexRoot>/ivf` family: re-train the cell geometry at the
  *     operator-chosen `nlist` once a season of refreshes has outgrown
  *     the frozen centroids (the compaction sweep never touches
  *     geometry).
  *
  * Thresholds/bucket counts stay at the operators' production defaults
  * on purpose: a deployment that needs different ones calls
  * [[Pipeline.refreshCorpus]] directly (the parameters are the API;
  * this main is the cron line).
  */
object CorpusMain {

  private def usage(): Nothing = {
    System.err.println(
      """usage: CorpusMain refresh <batchDir> <indexRoot> <corpusDir> [embeddingsDir]
        |       CorpusMain retract <idsDir> <indexRoot> <corpusDir>
        |       CorpusMain maintain <indexRoot>
        |       CorpusMain rebuild-ivf <indexRoot> <nlist>""".stripMargin)
    sys.exit(2)
  }

  def main(args: Array[String]): Unit = {
    if (args.isEmpty) usage()
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .appName("graft-corpus")
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try args.toList match {
      case "refresh" :: batchDir :: indexRoot :: corpusDir :: rest
          if rest.length <= 1 =>
        val emb = rest.headOption.map(spark.read.parquet(_))
        val out = Pipeline.refreshCorpus(spark,
          spark.read.parquet(batchDir), indexRoot, corpusDir,
          embeddings = emb)
        println(out.report.head().json)
      case "retract" :: idsDir :: indexRoot :: corpusDir :: Nil =>
        val report = Pipeline.retractCorpus(spark,
          spark.read.parquet(idsDir), indexRoot, corpusDir)
        println(report.head().json)
      case "maintain" :: indexRoot :: Nil =>
        Pipeline.maintainIndexes(spark, indexRoot)
        println(s"""{"maintained":"$indexRoot"}""")
      case "rebuild-ivf" :: indexRoot :: nlist :: Nil =>
        graft.operators.Similarity.rebuildIvfIndex(spark,
          s"$indexRoot/ivf", nlist.toInt)
        println(s"""{"rebuilt":"$indexRoot/ivf","nlist":$nlist}""")
      case _ => usage()
    } finally spark.stop()
  }
}
