package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Dev-only scaling measurement (not part of the driver contract):
  * quantifies the persisted-minhash-index economics that motivate
  * [[Dedup.nearDupAgainstIndex]] — the weekly-refresh regime dedups each
  * NEW batch against a standing index instead of recomputing signatures
  * corpus-wide. Feeds the docs/BENCH_SF1.md round-9 appendix.
  *
  * Scenario on the synthetic sf1 corpus (`tools/make_scaled_sf.py`):
  * a ~1% batch arrives against an already-indexed corpus. Timed:
  *   - index_build: one-time `writeMinhashIndex` of the standing corpus;
  *   - incremental: `nearDupAgainstIndex(batch)` ∪ `nearDupPairs(batch)`
  *     — the recurring per-batch cost under the index regime;
  *   - full_rerun: `nearDupPairs(corpus ∪ batch)` — the recurring
  *     per-batch cost WITHOUT the index (recompute everything).
  * The incremental and full runs find the identical batch-touching pair
  * set (DedupSpec proves bit-exactness; counts printed as a sanity echo).
  */
object IncrBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("target/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // ~1% of doc ids play the arriving batch; the rest is the standing,
    // already-indexed corpus
    val batch = docs.where(pmod(col("doc_id"), lit(100)) === 7)
      .localCheckpoint()
    val standing = docs.where(pmod(col("doc_id"), lit(100)) =!= 7)
      .localCheckpoint()
    println(s"corpus=${standing.count()} batch=${batch.count()}")
    val dir = java.nio.file.Files.createTempDirectory("incrbench").toString

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-12s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // warm the JIT/scan paths once
    Dedup.nearDupPairs(batch, threshold = 0.5).count()

    timed("index_build") { Dedup.writeMinhashIndex(standing, dir) }
    val nInc = timed("incremental") {
      Dedup.nearDupAgainstIndex(spark, batch, dir, threshold = 0.5)
        .count() +
        Dedup.nearDupPairs(batch, threshold = 0.5).count()
    }
    val nFull = timed("full_rerun") {
      val all = Dedup.nearDupPairs(standing.unionByName(batch),
        threshold = 0.5)
      // restrict to batch-touching pairs so the count is comparable
      val bids = batch.select(col("doc_id").as("id_a"))
      all.join(broadcast(bids), Seq("id_a"), "left_semi")
        .unionByName(all.join(
          broadcast(batch.select(col("doc_id").as("id_b"))),
          Seq("id_b"), "left_semi").select(col("id_a"), col("id_b"),
            col("jaccard")))
        .distinct().count()
    }
    println(s"pairs incremental=$nInc full_touching=$nFull")
    spark.stop()
  }
}
