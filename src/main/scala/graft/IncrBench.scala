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

/** Dev-only pricing of the SQ8 quantized ANN tier (feeds the
  * docs/BENCH_SF1.md round-13 appendix) — the 4×-fewer-bytes claim
  * MEASURED, not asserted. On the sf embeddings (64 query vectors,
  * k = 10):
  *
  *   - `brute_f32`: [[graft.operators.Similarity.bruteForceTopK]] —
  *     the exact scan baseline;
  *   - `sq8_scan`: [[graft.operators.Similarity.sq8TopK]] rerank=0 —
  *     the pure quantized ranking, recall@10 reported;
  *   - `sq8_rerank32/128`: quantized scan + exact f32 re-rank tiers,
  *     recall@10 per tier (the r-tunes-recall trade priced);
  *   - `ivf_probe_f32` / `ivf_probe_sq8`: the INDEXED hot path — the
  *     same centroids and nprobe over both storage layouts
  *     ([[graft.operators.Similarity.writeIvfIndex]] storage knob);
  *     the sq8 probe scans int8 codes and exact-re-ranks from the
  *     vbucket-pruned `vectors/`;
  *   - `cells_bytes_f32` / `cells_bytes_sq8`: on-disk bytes of each
  *     layout's `cells/` — the probed-scan bytes quantization
  *     shrinks (parquet-encoded, so the ratio is what the scan
  *     actually pays, not the theoretical 4×).
  */
object Sq8Bench {
  def main(args: Array[String]): Unit = {
    import graft.operators.Similarity
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
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).localCheckpoint()
    val queries = emb.orderBy(col("vec_id")).limit(64).localCheckpoint()
    println(s"corpus=${emb.count()} queries=${queries.count()}")

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-16s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def ids(df: DataFrame) =
      df.select(col("query_id"), col("vec_id")).localCheckpoint()
    def recall(exact: DataFrame, approx: DataFrame): Double = {
      val hit = exact.join(approx.withColumn("hit", lit(1)),
        Seq("query_id", "vec_id"), "left")
      val r = hit.agg((sum(coalesce(col("hit"), lit(0))) /
        count(lit(1))).as("r")).head().getDouble(0)
      r
    }
    // warm the scan/codegen paths once
    Similarity.sq8TopK(emb, queries, k = 10).count()

    val exact = ids(timed("brute_f32") {
      val d = Similarity.bruteForceTopK(emb, queries, k = 10)
        .localCheckpoint(); d.count(); d
    })
    for ((label, r) <- Seq(("sq8_scan", 0), ("sq8_rerank32", 32),
        ("sq8_rerank128", 128))) {
      val approx = ids(timed(label) {
        val d = Similarity.sq8TopK(emb, queries, k = 10, rerank = r)
          .localCheckpoint(); d.count(); d
      })
      println(f"$label%-16s recall@10 ${recall(exact, approx)}%.4f")
    }
    // ---- the indexed hot path: same centroids, two storage layouts
    val cents = Similarity.kmeansCentroids(emb, nlist = 64, iters = 1)
    val f32Dir = java.nio.file.Files.createTempDirectory("sq8b_f32")
    val sq8Dir = java.nio.file.Files.createTempDirectory("sq8b_sq8")
    timed("ivf_write_f32") { Similarity.writeIvfIndex(emb,
      f32Dir.toString, cents) }
    timed("ivf_write_sq8") { Similarity.writeIvfIndex(emb,
      sq8Dir.toString, cents, storage = "sq8", vecBuckets = 64) }
    def du(p: java.nio.file.Path): Long = {
      val s = java.nio.file.Files.walk(p)
      try s.filter(java.nio.file.Files.isRegularFile(_))
        .mapToLong(java.nio.file.Files.size(_)).sum()
      finally s.close()
    }
    println(s"cells_bytes_f32  ${du(f32Dir.resolve("cells"))}")
    println(s"cells_bytes_sq8  ${du(sq8Dir.resolve("cells"))}")
    for ((label, dir, r) <- Seq(
        ("ivf_probe_f32", f32Dir, 0), ("ivf_probe_sq8", sq8Dir, 128))) {
      val probe = ids(timed(label) {
        val d = Similarity.ivfTopKIndexedSelf(spark, dir.toString,
          queries, k = 10, nprobe = 8, rerank = r)
          .localCheckpoint(); d.count(); d
      })
      println(f"$label%-16s recall@10 ${recall(exact, probe)}%.4f")
    }
    spark.stop()
  }
}

/** Dev-only scaling measurement for the round-14 tier: the bm25
  * lifecycle economics (does the refresh APPEND stay ∝ batch while the
  * rebuild grows ∝ corpus?) and the token-ID artifact path (map-only
  * id encode; the materialized shard export, whose cost is the
  * artifact's own token size). Run at sf0.1 and the synthetic sf1 —
  * feeds the docs/BENCH_SF1.md round-14 appendix.
  */
object IdTierBench {
  def main(args: Array[String]): Unit = {
    import graft.operators.{Bpe, Retrieval}
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
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).localCheckpoint()
    println(s"corpus=${docs.count()}")
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-20s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // bm25 lifecycle: index the low 90% once, then the weekly regime —
    // APPEND the top 10% batch (what refreshCorpus now does) vs a full
    // REBUILD (what retraction pays, corpus-scale by contract)
    val cut = docs.agg(expr("percentile(doc_id, 0.9)")).head()
      .getDouble(0)
    val bmDir = java.nio.file.Files.createTempDirectory("idt_bm25")
      .toString
    timed("bm25_build_90") {
      Retrieval.writeBm25Index(docs.where(col("doc_id") <= cut), bmDir)
    }
    timed("bm25_append_10") {
      Retrieval.writeBm25Index(docs.where(col("doc_id") > cut), bmDir,
        mode = "append")
    }
    timed("bm25_rebuild_full") {
      Retrieval.writeBm25Index(docs, bmDir)
    }
    // the token-ID path: complete-model train, map-only id encode
    // (against the string encode for the same segmentation), and the
    // end-to-end shard export (manifest + gather + write)
    val model = timed("bpe_train_model") {
      Bpe.trainModel(docs, numMerges = 1000, maxTypes = 20000)
    }
    timed("bpe_encode_strings") { Bpe.encode(docs, model.merges)
      .agg(sum(col("n_subwords"))).head() }
    timed("bpe_encode_ids") { Bpe.encodeIds(docs, model)
      .agg(sum(col("n_ids"))).head() }
    val corpusDir = java.nio.file.Files
      .createTempDirectory("idt_corpus").toString
    docs.write.parquet(s"$corpusDir/corpus")
    val modelDir = java.nio.file.Files
      .createTempDirectory("idt_model").toString
    Bpe.writeModel(spark, model, modelDir)
    val shardsDir = java.nio.file.Files
      .createTempDirectory("idt_shards").toString
    val r = timed("export_shards_2048") {
      graft.Pipeline.writeTrainingShards(spark, corpusDir, modelDir,
        shardsDir, seqLen = 2048, numShards = 64).head()
    }
    println(s"n_sequences=${r.getAs[Long]("n_sequences")} " +
      s"n_ids_total=${r.getAs[Long]("n_ids_total")}")
    // incremental export economics: bootstrap the low 90% (one
    // batch partition), then the weekly APPEND of the top 10% — the
    // ∝-batch path — against the full re-export above
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
    val corpus2 = java.nio.file.Files
      .createTempDirectory("idt_c2").toString
    docs.where(col("doc_id") <= cut)
      .write.parquet(s"$corpus2/corpus/batch_id=${cut.toLong}")
    val shards2 = java.nio.file.Files
      .createTempDirectory("idt_sh2").toString
    timed("export_build_90") {
      graft.Pipeline.writeTrainingShards(spark, corpus2, modelDir,
        shards2, seqLen = 2048, numShards = 64)
    }
    docs.where(col("doc_id") > cut)
      .write.parquet(s"$corpus2/corpus/batch_id=$maxId")
    timed("export_append_10") {
      graft.Pipeline.writeTrainingShards(spark, corpus2, modelDir,
        shards2, seqLen = 2048, numShards = 64, mode = "append")
    }
    // retraction-repair economics: a GDPR trickle (10 docs, all in
    // the appended 10% batch) leaves the corpus — the pack-targeted
    // repair rewrites ONLY that pack, priced against the
    // export_shards_2048 full re-export it replaces. Retraction
    // hand-simulated to its two surfaces (partition rewrite + ledger
    // row), the ShardingSpec fixture shape.
    val retractIds = docs.where(col("doc_id") > cut)
      .orderBy(col("doc_id").asc).limit(10)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSeq
    docs.where(col("doc_id") > cut &&
        !col("doc_id").isin(retractIds: _*))
      .write.mode("overwrite").parquet(s"$corpus2/corpus/batch_id=$maxId")
    Seq((retractIds.size.toLong, retractIds.size.toLong))
      .toDF("n_requested", "n_retracted")
      .write.parquet(s"$corpus2/retractions/retraction_id=xbench")
    timed("export_repair_10docs") {
      graft.Pipeline.repairTrainingShards(spark, corpus2, modelDir,
        shards2)
    }
    // the same trickle against a SMALLER touched pack (a ~1% weekly
    // batch appended on top): repair cost is detection (ids-only)
    // plus re-encoding ONE batch-sized pack, so it tracks the touched
    // pack's size, not the corpus — the ∝-touched-packs claim
    val cut99 = docs.agg(expr("percentile(doc_id, 0.99)")).head()
      .getDouble(0)
    val extra = docs.where(col("doc_id") > cut99)
      .withColumn("doc_id", col("doc_id") + lit(maxId + 1))
    val extraMax = 2 * maxId + 1
    extra.write.parquet(s"$corpus2/corpus/batch_id=$extraMax")
    graft.Pipeline.writeTrainingShards(spark, corpus2, modelDir,
      shards2, seqLen = 2048, numShards = 64, mode = "append")
    val retract2 = extra.orderBy(col("doc_id").asc).limit(10)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSeq
    extra.where(!col("doc_id").isin(retract2: _*))
      .write.mode("overwrite")
      .parquet(s"$corpus2/corpus/batch_id=$extraMax")
    Seq((retract2.size.toLong, retract2.size.toLong))
      .toDF("n_requested", "n_retracted")
      .write.parquet(s"$corpus2/retractions/retraction_id=xbench2")
    timed("export_repair_1pct_pack") {
      graft.Pipeline.repairTrainingShards(spark, corpus2, modelDir,
        shards2)
    }
    spark.stop()
  }
}

/** Dev-only scaling measurement for the round-13 operator tier: line
  * dedup (inline + indexed probe), DSIR (fit / score / resample under
  * the native ngram kernel), BPE (train at capped types / map-only
  * encode), and BM25 top-k. Run at sf0.1 and the synthetic sf1 to
  * check every leg scales ∝ corpus (one pass each) — feeds the
  * docs/BENCH_SF1.md round-13 appendix.
  */
object NewOpsBench {
  def main(args: Array[String]): Unit = {
    import graft.operators.{Bpe, Retrieval, Sharding}
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
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang")).localCheckpoint()
    println(s"corpus=${docs.count()}")
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-18s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // line dedup: inline full-corpus, then the incremental split
    // (index the low 90%, probe the top 10% — the weekly regime)
    timed("line_inline") { Dedup.dedupLines(docs).count() }
    val cut = docs.agg(expr("percentile(doc_id, 0.9)")).head().getDouble(0)
    val dir = java.nio.file.Files.createTempDirectory("nob_line").toString
    timed("line_index_build") {
      Dedup.writeChunkIndexLines(docs.where(col("doc_id") <= cut), dir)
    }
    timed("line_index_probe") {
      Dedup.dedupChunksAgainstIndex(spark,
        docs.where(col("doc_id") > cut), dir).count()
    }
    // DSIR under the native kernel
    val target = docs.where(col("lang") === "en")
    val w = timed("dsir_fit") {
      val d = Sharding.dsirWeights(target, docs).localCheckpoint()
      d.count(); d
    }
    timed("dsir_score") { Sharding.dsirScore(docs, w).count() }
    timed("dsir_resample") {
      Sharding.dsirResample(docs, target, k = 1000).count()
    }
    // BPE: capped train, then the map-only corpus-wide encode
    val merges = timed("bpe_train_1k") {
      Bpe.train(docs, numMerges = 1000, maxTypes = 20000)
    }
    println(s"bpe_merges=${merges.size}")
    timed("bpe_encode") { Bpe.encode(docs, merges)
      .agg(sum(col("n_subwords"))).head() }
    // BM25 over three probe queries: inline (per-query-set corpus
    // recompute) vs the persisted index (write once, probe pruned)
    val queries = Seq((0, "spark hash join"), (1, "window sort merge"),
      (2, "stream batch dup")).toDF("query_id", "text")
    timed("bm25_topk") { Retrieval.bm25TopK(docs, queries).count() }
    val bmDir = java.nio.file.Files.createTempDirectory("nob_bm25")
      .toString
    timed("bm25_index_build") { Retrieval.writeBm25Index(docs, bmDir) }
    timed("bm25_index_probe") {
      Retrieval.bm25TopKIndexed(spark, queries, bmDir).count()
    }
    spark.stop()
  }
}

/** Dev-only scaling measurement for the round-16 tier: (a) the WIDE
  * retraction repair — many touched packs — priced serial
  * (`maxConcurrentRebuilds = 1`, the r15 shape: one Spark job + staged
  * swap per pack, each paying the fixed ~5-job scheduling floor) vs
  * concurrent (the default bounded pool), same damage, bit-equal
  * results (ShardingSpec pins equality); (b) the epoch-scale reorder —
  * [[graft.operators.Sharding.epochReorder]] over a standing export's
  * sequences, the one loader-side step between the artifact and a
  * training run (ONE range exchange whose volume is the artifact's own
  * size). Run at sf0.1 and the synthetic sf1 — feeds the
  * docs/BENCH_SF1.md round-16 appendix.
  */
object RepairEpochBench {
  def main(args: Array[String]): Unit = {
    import graft.operators.Bpe
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
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).localCheckpoint()
    println(s"corpus=${docs.count()}")
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-26s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // one model for everything (training is priced elsewhere)
    val modelDir = java.nio.file.Files
      .createTempDirectory("reb_model").toString
    Bpe.writeModel(spark,
      Bpe.trainModel(docs, numMerges = 1000, maxTypes = 20000),
      modelDir)
    // 17 pack generations: bootstrap the low 50%, then 16 appended
    // batches of ~3% each — the season-of-weekly-refreshes shape
    val qs = (0 to 16).map(i => 0.5 + i * (0.5 / 16.0))
    val cuts = docs.agg(expr(
      s"percentile(doc_id, array(${qs.mkString(",")}))")).head()
      .getSeq[Double](0)
    val corpusDir = java.nio.file.Files
      .createTempDirectory("reb_corpus").toString
    def writeBatch(lo: Double, hi: Double): Long = {
      val hiId = hi.toLong
      docs.where(col("doc_id") > lo && col("doc_id") <= hi)
        .write.mode("overwrite")
        .parquet(s"$corpusDir/corpus/batch_id=$hiId")
      hiId
    }
    writeBatch(-1.0, cuts.head)
    val shardsA = java.nio.file.Files
      .createTempDirectory("reb_shA").toString
    timed("export_bootstrap_50") {
      graft.Pipeline.writeTrainingShards(spark, corpusDir, modelDir,
        shardsA, seqLen = 2048, numShards = 64)
    }
    timed("export_16_appends") {
      (1 to 16).foreach { i =>
        writeBatch(cuts(i - 1), cuts(i))
        graft.Pipeline.writeTrainingShards(spark, corpusDir, modelDir,
          shardsA, seqLen = 2048, numShards = 64, mode = "append")
      }
    }
    // mirror the artifact so serial and parallel repair the SAME damage
    val shardsB = java.nio.file.Files
      .createTempDirectory("reb_shB").toString + "/shards"
    val fs = new org.apache.hadoop.fs.Path(shardsA).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    org.apache.hadoop.fs.FileUtil.copy(fs,
      new org.apache.hadoop.fs.Path(shardsA), fs,
      new org.apache.hadoop.fs.Path(shardsB), false,
      spark.sparkContext.hadoopConfiguration)
    // a GDPR sweep touching EVERY appended batch: 10 docs from each of
    // the 16 batches leave the corpus -> 16 packs touched
    var nRetracted = 0L
    (1 to 16).foreach { i =>
      val (lo, hi) = (cuts(i - 1), cuts(i))
      val gone = docs.where(col("doc_id") > lo && col("doc_id") <= hi)
        .orderBy(col("doc_id").asc).limit(10)
        .select(col("doc_id")).collect().map(_.getLong(0)).toSeq
      nRetracted += gone.size
      docs.where(col("doc_id") > lo && col("doc_id") <= hi &&
          !col("doc_id").isin(gone: _*))
        .write.mode("overwrite")
        .parquet(s"$corpusDir/corpus/batch_id=${hi.toLong}")
    }
    Seq((nRetracted, nRetracted)).toDF("n_requested", "n_retracted")
      .write.parquet(s"$corpusDir/retractions/retraction_id=xreb")
    timed("repair_16packs_serial") {
      graft.Pipeline.repairTrainingShards(spark, corpusDir, modelDir,
        shardsA, maxConcurrentRebuilds = 1)
    }
    timed("repair_16packs_parallel4") {
      graft.Pipeline.repairTrainingShards(spark, corpusDir, modelDir,
        shardsB)
    }
    // the loader-side epoch reorder: strict read + map-only key + ONE
    // range exchange + in-partition sort, written in consumable order
    // (the `CorpusMain epoch-stream` line)
    val epochOut = java.nio.file.Files
      .createTempDirectory("reb_epoch").toString + "/epoch0"
    timed("epoch_reorder_write") {
      val (seqs, _) = graft.Pipeline.readTrainingShards(spark, shardsA,
        strict = true)
      graft.operators.Sharding.epochReorder(seqs, epoch = 0)
        .write.mode("overwrite").parquet(epochOut)
    }
    println(s"epoch_rows=${spark.read.parquet(epochOut).count()}")
    spark.stop()
  }
}

/** Dev-only scaling measurement for the round-17 pack-tail compaction
  * ([[graft.Pipeline.compactTrainingShards]]): the DAILY-micro-batch
  * regime — a large bootstrap generation plus 64 tiny appended
  * generations (1–2 sequences each, every one a fill candidate) — is
  * the accumulated-waste shape the stats survey's padding_waste /
  * n_short columns flag. Timed: the compaction (cost claimed ∝ the
  * SHORT packs' own id bytes) vs the `mode=overwrite` full re-export
  * it replaces (corpus-scale re-encode). Stats are printed before and
  * after so the waste collapse and generation count ride the log.
  * Feeds the docs/BENCH_SF1.md round-17 appendix.
  */
object CompactBench {
  def main(args: Array[String]): Unit = {
    import graft.operators.Bpe
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
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).localCheckpoint()
    println(s"corpus=${docs.count()}")
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val modelDir = java.nio.file.Files
      .createTempDirectory("cpb_model").toString
    Bpe.writeModel(spark,
      Bpe.trainModel(docs, numMerges = 1000, maxTypes = 20000),
      modelDir)
    // 64 daily micro-batches of 4 docs each ride on top of one big
    // bootstrap — the year-of-daily-crons shape
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
    val cut = maxId - 64L * 4L
    val corpusDir = java.nio.file.Files
      .createTempDirectory("cpb_corpus").toString
    docs.where(col("doc_id") <= cut).write.mode("overwrite")
      .parquet(s"$corpusDir/corpus/batch_id=$cut")
    val shards = java.nio.file.Files
      .createTempDirectory("cpb_shards").toString
    timed("export_bootstrap") {
      graft.Pipeline.writeTrainingShards(spark, corpusDir, modelDir,
        shards, seqLen = 2048, numShards = 64)
    }
    timed("export_64_tiny_appends") {
      (1 to 64).foreach { i =>
        val hi = cut + i * 4L
        docs.where(col("doc_id") > hi - 4 && col("doc_id") <= hi)
          .write.mode("overwrite")
          .parquet(s"$corpusDir/corpus/batch_id=$hi")
        graft.Pipeline.writeTrainingShards(spark, corpusDir, modelDir,
          shards, seqLen = 2048, numShards = 64, mode = "append")
      }
    }
    def statsLine(tag: String): Unit = {
      val st = graft.Pipeline.statsTrainingShards(spark, shards)
        .agg(count(lit(1)), sum(col("n_sequences")),
          sum(col("n_short")), sum(col("padding_waste"))).head()
      println(s"stats_$tag packs=${st.getLong(0)} " +
        s"seqs=${st.getLong(1)} short=${st.getLong(2)} " +
        s"waste_ids=${st.getLong(3)}")
    }
    statsLine("before")
    timed("compact_64_tiny_packs") {
      graft.Pipeline.compactTrainingShards(spark, shards)
    }
    statsLine("after")
    // the corpus-scale remedy compaction replaces
    val shardsFull = java.nio.file.Files
      .createTempDirectory("cpb_full").toString
    timed("export_overwrite_full") {
      graft.Pipeline.writeTrainingShards(spark, corpusDir, modelDir,
        shardsFull, seqLen = 2048, numShards = 64)
    }
    spark.stop()
  }
}

/** Round-18 pricing: the FULL artifact audit ([[graft.Pipeline
  * .auditTrainingShards]]) over a standing sf1 export — the one
  * deliberate corpus-∝ read left in the export tier (reconstruct +
  * decode every doc, diff against the model's image of the corpus).
  * Priced NEXT TO the bootstrap export it mirrors and the
  * metadata-priced stats survey, so the audit-cadence recommendation
  * in docs/EXTENSIONS.md is a measured ratio, not vibes: the audit is
  * the read-side twin of a full re-export and belongs at the same
  * deliberate cadence (post-incident, post-repair spot checks,
  * scheduled quiet windows), never per-cron — the per-cron trust
  * surface is the append's own gates + statsTrainingShards.
  */
object AuditBench {
  def main(args: Array[String]): Unit = {
    import graft.operators.Bpe
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
      .select(col("doc_id"), col("text")).localCheckpoint()
    println(s"corpus=${docs.count()}")
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val modelDir = java.nio.file.Files
      .createTempDirectory("adb_model").toString
    Bpe.writeModel(spark,
      Bpe.trainModel(docs, numMerges = 1000, maxTypes = 20000),
      modelDir)
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
    val corpusDir = java.nio.file.Files
      .createTempDirectory("adb_corpus").toString
    docs.write.mode("overwrite")
      .parquet(s"$corpusDir/corpus/batch_id=$maxId")
    val shards = java.nio.file.Files
      .createTempDirectory("adb_shards").toString
    timed("export_bootstrap") {
      graft.Pipeline.writeTrainingShards(spark, corpusDir, modelDir,
        shards, seqLen = 2048, numShards = 64)
    }
    timed("stats_survey") {
      graft.Pipeline.statsTrainingShards(spark, shards)
        .agg(count(lit(1)), sum(col("n_ids"))).head()
    }
    val verdict = timed("audit_full") {
      graft.Pipeline.auditTrainingShards(spark, shards, modelDir,
        corpusDir).head()
    }
    println(s"audit_row n_docs=${verdict.getAs[Long]("n_docs")} " +
      s"n_mismatched=${verdict.getAs[Long]("n_mismatched")} " +
      s"n_bad=${verdict.getAs[Long]("n_bad")} " +
      s"n_unk=${verdict.getAs[Long]("n_unk")}")
    spark.stop()
  }
}
