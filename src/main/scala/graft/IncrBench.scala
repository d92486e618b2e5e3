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

/** Dev-only measurement of the persisted-benchmark-index economics
  * ([[Dedup.writeBenchmarkIndex]] / `contaminationScreenAgainstIndex`):
  * the regime where the EVAL SUITE is the big side — a full
  * eval-plus-holdout collection screened weekly by small training
  * batches. The whole sf corpus plays the benchmark; a ~1% slice plays
  * the arriving batch. Timed:
  *   - inline_screen: `contaminationScreen(batch, benchmark)` — the
  *     recurring per-batch cost WITHOUT the index (re-shingle +
  *     re-collect the suite every call);
  *   - index_build: one-time `writeBenchmarkIndex` of the suite;
  *   - indexed_screen: `contaminationScreenAgainstIndex(batch)` — the
  *     recurring per-batch cost under the index.
  * Both screens return identical rows (DedupSpec proves it; the q101
  * oracle hash-proves the round-trip); counts echo as a sanity check.
  * Feeds the docs/BENCH_SF1.md round-11 appendix.
  */
object ScreenBench {
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
    val batch = docs.where(pmod(col("doc_id"), lit(100)) === 7)
      .localCheckpoint()
    val benchmark = docs.where(pmod(col("doc_id"), lit(100)) =!= 7)
      .localCheckpoint()
    println(s"benchmark=${benchmark.count()} batch=${batch.count()}")
    val dir = java.nio.file.Files
      .createTempDirectory("screenbench").toString
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-14s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // warm the shingle/scan paths once
    Dedup.contaminationScreen(batch, batch.limit(10)).count()
    val nInline = timed("inline_screen") {
      Dedup.contaminationScreen(batch, benchmark)
        .agg(sum(col("n_contaminated"))).head().getLong(0)
    }
    timed("index_build") { Dedup.writeBenchmarkIndex(benchmark, dir) }
    val nIndexed = timed("indexed_screen") {
      Dedup.contaminationScreenAgainstIndex(spark, batch, dir)
        .agg(sum(col("n_contaminated"))).head().getLong(0)
    }
    println(s"contaminated_shingles inline=$nInline indexed=$nIndexed")
    spark.stop()
  }
}

/** Dev-only measurement of the COMPOSED weekly-refresh lifecycle
  * ([[Pipeline.refreshCorpus]]): bootstrap batch (the standing ~99% of
  * the corpus — within-batch dedup + first index build) followed by a
  * ~1% weekly batch (probe all three indexes + append + publish). The
  * second number is the recurring weekly cost the composition exists
  * for; feeds the docs/BENCH_SF1.md composed-refresh appendix.
  *
  * Bucket counts 64 (not the 256 production default): at sf0.1-sf1
  * corpus sizes 256 near-empty partition dirs per family would make the
  * bootstrap number mostly small-file IO (the q89 bench note); the
  * probe-side pruning economics are unchanged.
  */
object RefreshBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
      .select(col("doc_id"), col("text"), col("lang"))
    // id-ordered split: refreshCorpus requires monotone ids across
    // batches (the chunk watermark), so the batch is the TOP 1% of ids
    val cut = docs.selectExpr("percentile(doc_id, 0.99)").head()
      .getDouble(0).toLong
    val standing = docs.where(col("doc_id") <= cut).localCheckpoint()
    val weekly = docs.where(col("doc_id") > cut).localCheckpoint()
    println(s"bootstrap=${standing.count()} weekly=${weekly.count()}")
    val idxRoot = java.nio.file.Files
      .createTempDirectory("refreshbench_idx").toString
    val corpusDir = java.nio.file.Files
      .createTempDirectory("refreshbench_corpus").toString
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-12s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def refresh(batch: DataFrame) =
      Pipeline.refreshCorpus(spark, batch, idxRoot, corpusDir,
        jaccardThreshold = 0.5, bandBuckets = 64, pieceBuckets = 64,
        chunkBuckets = 64)
    // warm the scan/JIT paths once
    Dedup.nearDupPairs(weekly, threshold = 0.5).count()
    val b1 = timed("bootstrap") { refresh(standing) }
    val b2 = timed("weekly") { refresh(weekly) }
    println(s"published bootstrap=${b1.report.head().getAs[Long]("n_published")} " +
      s"weekly=${b2.report.head().getAs[Long]("n_published")} " +
      s"weekly_pairs=${b2.report.head().getAs[Long]("n_dup_pairs")}")
    // the maintenance-cadence big-big containment sweep over the
    // published corpus — the one corpus-wide pass of the lifecycle,
    // priced here so the "run it at maintain cadence" advice has a
    // measured cost next to the weekly number it amortizes against
    val nSwept = timed("sweep") {
      Pipeline.sweepContainment(spark, corpusDir, threshold = 0.5,
        sampleK = 64).count()
    }
    println(s"sweep_pairs=$nSwept")
    spark.stop()
  }
}

/** Dev-only measurement of the MAINTENANCE legs of the index lifecycle
  * — the only lifecycle passes not benched elsewhere: [[Dedup
  * .compactIndex]] per family after a season's worth of duplicate-
  * laying appends, [[Dedup.deleteFromIndex]] /
  * [[Dedup.deleteFromChunkIndex]] for a takedown-sized retraction
  * (with the bucketed shingles/ layout doing touched-bucket deletion),
  * and [[graft.operators.Similarity.rebuildIvfIndex]] re-training the
  * geometry. Scenario: the sf corpus indexed whole, a ~1% slice
  * re-appended twice (the documented crashed-append duplicate rows),
  * then one compaction sweep, a 0.1%-of-ids retraction, and an IVF
  * rebuild at doubled nlist. Feeds the docs/BENCH_SF1.md round-12
  * appendix; run against sf0.1 and the synthetic sf1 back-to-back to
  * see each pass's scaling shape (∝ index for compact/rebuild, ∝
  * touched buckets for deletion).
  */
object MaintenanceBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Similarity
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).localCheckpoint()
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).localCheckpoint()
    val batch = docs.where(pmod(col("doc_id"), lit(100)) === 7)
      .localCheckpoint()
    val retractIds = docs.where(pmod(col("doc_id"), lit(1000)) === 3)
      .select(col("doc_id")).localCheckpoint()
    println(s"corpus=${docs.count()} appends=${batch.count()} " +
      s"retractions=${retractIds.count()} vectors=${vecs.count()}")
    def tmp(tag: String) =
      java.nio.file.Files.createTempDirectory(s"maint_$tag").toString
    val mh = tmp("mh"); val ch = tmp("ch"); val ivf = tmp("ivf")
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-16s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // builds (not the measurement target, printed for context), plus a
    // season's duplicate rows: the same append run twice per family
    timed("build_minhash") {
      Dedup.writeMinhashIndex(docs, mh, bandBuckets = 64)
    }
    (1 to 2).foreach(_ => Dedup.writeMinhashIndex(batch, mh,
      bandBuckets = 64, mode = "append"))
    timed("build_chunk") { Dedup.writeChunkIndex(docs, ch,
      chunkBuckets = 64) }
    (1 to 2).foreach(_ => Dedup.writeChunkIndex(batch, ch,
      chunkBuckets = 64, mode = "append"))
    timed("build_ivf") {
      Similarity.writeIvfIndex(vecs, ivf,
        Similarity.kmeansCentroids(vecs, nlist = 64, iters = 1))
    }
    val vbatch = vecs.where(pmod(col("vec_id"), lit(100)) === 7)
    (1 to 2).foreach(_ => Similarity.appendIvfIndex(vbatch, ivf))
    // ---- the maintenance legs
    timed("compact_minhash") { Dedup.compactIndex(spark, mh) }
    timed("compact_chunk") { Dedup.compactIndex(spark, ch) }
    timed("compact_ivf") { Dedup.compactIndex(spark, ivf) }
    timed("delete_minhash") { Dedup.deleteFromIndex(spark, mh,
      retractIds) }
    timed("delete_chunk") { Dedup.deleteFromChunkIndex(spark, ch,
      docs.join(retractIds, Seq("doc_id"), "left_semi")) }
    timed("delete_ivf") { Dedup.deleteFromIndex(spark, ivf,
      retractIds.withColumnRenamed("doc_id", "vec_id")) }
    timed("rebuild_ivf") { Similarity.rebuildIvfIndex(spark, ivf,
      nlist = 128) }
    spark.stop()
  }
}
