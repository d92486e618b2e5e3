package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Fsck, Lease, Similarity}

/** The read-only integrity survey: a healthy multi-family root is
  * clean, every documented crash state is named with its recovery,
  * and diagnostics never mutate or block anything.
  */
class FsckSpec extends SparkSuite {
  import spark.implicits._

  private def docs = (0L until 30L)
    .map(i => (i, s"document number $i with some shared words " +
      s"about topic ${i % 5} and more filler text to shingle"))
    .toDF("doc_id", "text")

  private def vecs = (0 until 30)
    .map(i => (i.toLong,
      Array.tabulate(8)(j => ((i * j) % 7).toFloat / 7f + 0.1f).toSeq))
    .toDF("vec_id", "embedding")
    .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))

  private def mkRoot() =
    java.nio.file.Files.createTempDirectory("fsckroot").toString

  private def rm(p: String): Unit = {
    def r(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(r))
      f.delete()
    }
    r(new java.io.File(p))
  }

  private def mkdirs(p: String): Unit = new java.io.File(p).mkdirs()

  private def touch(p: String): Unit = {
    new java.io.File(p).getParentFile.mkdirs()
    new java.io.File(p).createNewFile()
  }

  private def levels(root: String) =
    Fsck.check(spark, root).groupBy(_.level)
      .view.mapValues(_.size).toMap.withDefaultValue(0)

  test("a healthy multi-family root surveys clean: one ok row per " +
      "index, no warnings, no errors") {
    val root = mkRoot()
    Dedup.writeMinhashIndex(docs, s"$root/minhash",
      bandBuckets = 8, shingleBuckets = 8)
    Dedup.writeBenchmarkIndex(docs.where($"doc_id" < 5),
      s"$root/bench", hashBuckets = 8)
    val cents = Similarity.kmeansCentroids(vecs, nlist = 4, iters = 1)
    Similarity.writeIvfIndex(vecs, s"$root/ivf", cents)
    Similarity.writeIvfIndex(vecs, s"$root/ivf8", cents,
      storage = "sq8", vecBuckets = 4)
    val f = Fsck.check(spark, root)
    assert(f.count(_.level == "ok") === 4, f.mkString("\n"))
    assert(f.forall(_.level == "ok"), f.mkString("\n"))
    // and the survey is read-only: probes still answer afterwards
    assert(Similarity.ivfTopKIndexedSelf(spark, s"$root/ivf",
      vecs.where($"vec_id" < 2), k = 3, nprobe = 4).count() > 0)
  }

  test("crashed-write states are errors naming their recovery") {
    val root = mkRoot()
    // data without params: the crashed index write
    Dedup.writeMinhashIndex(docs, s"$root/mh", bandBuckets = 8,
      shingleBuckets = 8)
    rm(s"$root/mh/params")
    // params absent + rebuild_staged: the crashed IVF rebuild
    val cents = Similarity.kmeansCentroids(vecs, nlist = 4, iters = 1)
    Similarity.writeIvfIndex(vecs, s"$root/ivf", cents)
    rm(s"$root/ivf/params")
    mkdirs(s"$root/ivf/rebuild_staged")
    // sq8 with vectors/ gone: the re-rank side is missing
    Similarity.writeIvfIndex(vecs, s"$root/sq8", cents,
      storage = "sq8", vecBuckets = 4)
    rm(s"$root/sq8/vectors")
    val f = Fsck.check(spark, root)
    def err(dir: String) =
      f.filter(x => x.level == "error" && x.dir.startsWith(dir))
    assert(err(s"$root/mh").exists(_.detail.contains("crashed index write")))
    assert(err(s"$root/ivf").exists(_.detail.contains("rebuildIvfIndex")))
    assert(err(s"$root/sq8").exists(_.detail.contains("re-rank")))
    assert(f.count(_.level == "ok") === 0)
  }

  test("layout mismatches are errors: flat files beside bucket dirs, " +
      "out-of-range buckets, params demoted under bucketed data") {
    val root = mkRoot()
    Dedup.writeMinhashIndex(docs, s"$root/mh", bandBuckets = 8,
      shingleBuckets = 8)
    // a flat parquet file landed next to the bucket= dirs
    touch(s"$root/mh/shingles/part-00000.parquet")
    // a bucket dir outside the stored 8-partition layout
    mkdirs(s"$root/mh/bands/bucket=999")
    val f1 = Fsck.check(spark, root).filter(_.level == "error")
    assert(f1.exists(x => x.dir == s"$root/mh/shingles" &&
      x.detail.contains("NEXT TO")))
    assert(f1.exists(x => x.dir == s"$root/mh/bands" &&
      x.detail.contains("out of range")))
    // the crashed re-bucket-migration state: params demoted to flat
    // (no shingle_buckets column) while the data stays bucketed
    val root2 = mkRoot()
    Dedup.writeMinhashIndex(docs, s"$root2/mh", bandBuckets = 8,
      shingleBuckets = 8)
    val demoted = spark.read.parquet(s"$root2/mh/params")
      .drop("shingle_buckets").localCheckpoint()
    rm(s"$root2/mh/params")
    demoted.write.parquet(s"$root2/mh/params")
    val f2 = Fsck.check(spark, root2).filter(_.level == "error")
    assert(f2.exists(x => x.dir == s"$root2/mh/shingles" &&
      x.detail.contains("migrateShingleBuckets")))
  }

  test("leftovers and held leases warn without demoting the index") {
    val root = mkRoot()
    Dedup.writeMinhashIndex(docs, s"$root/mh", bandBuckets = 8,
      shingleBuckets = 8)
    mkdirs(s"$root/mh/bands__compact_tmp")
    mkdirs(s"$root/_stage_reports")
    Lease.acquire(spark, s"$root/mh", "crashed-maintain")
    val f = Fsck.check(spark, root)
    assert(!f.exists(_.level == "error"), f.mkString("\n"))
    assert(f.exists(x => x.level == "warn" &&
      x.component == "_LEASE" && x.detail.contains("crashed-maintain")))
    assert(f.exists(x => x.level == "warn" &&
      x.dir == s"$root/mh/bands__compact_tmp"))
    assert(f.exists(x => x.level == "warn" &&
      x.dir == s"$root/_stage_reports"))
    // the index itself still reports healthy
    assert(f.exists(x => x.level == "ok" && x.dir == s"$root/mh"))
  }

  test("corpus-root surface: foreign corpus entries error, legacy " +
      "markers and marker-less stream stagings warn") {
    val root = mkRoot()
    mkdirs(s"$root/corpus/batch_id=0")
    mkdirs(s"$root/corpus/junk")
    mkdirs(s"$root/reports")
    // a stream staging dir crashed before its _COMMIT marker
    mkdirs(s"$root/batch_7")
    val f = Fsck.check(spark, root)
    assert(f.exists(x => x.level == "error" &&
      x.dir == s"$root/corpus/junk"))
    assert(f.exists(x => x.level == "warn" &&
      x.component == "modalities"))
    assert(f.exists(x => x.level == "warn" &&
      x.component == "retraction_base"))
    assert(f.exists(x => x.level == "warn" &&
      x.dir == s"$root/batch_7" && x.component == "_COMMIT"))
    // a nonexistent root is one loud error, not an empty clean bill
    assert(Fsck.check(spark, s"$root/nope")
      .exists(x => x.level == "error" && x.component == "root"))
  }

  test("a REAL published corpus surveys clean, and stagedWrite " +
      "temps/asides are staging findings with the two-rename crash " +
      "told apart — never foreign-dir errors or stream-staging warns") {
    val idx = mkRoot()
    val corpusRoot = mkRoot()
    rm(corpusRoot) // refreshCorpus owns creation
    Pipeline.refreshCorpus(spark,
      (0L until 4L).map(i =>
        (i, (0 until 10).map(j => s"t${i}x$j").mkString(" "), "en"))
        .toDF("doc_id", "text", "lang"),
      idx, corpusRoot, jaccardThreshold = 0.5, chunkTokens = 4,
      bandBuckets = 8, pieceBuckets = 8, chunkBuckets = 8)
    // healthy published corpus: no errors, and crucially its
    // batch_id=<n> partitions are NOT mistaken for marker-less stream
    // stagings, nor its markers for foreign dirs
    val f0 = Fsck.check(spark, corpusRoot)
    assert(!f0.exists(_.level == "error"), f0.mkString("\n"))
    assert(!f0.exists(_.component == "_COMMIT"), f0.mkString("\n"))
    // completed staged-write aside (its destination is live): ONE warn
    // naming it safe to delete — visited through both the corpus-root
    // surface and corpus/'s own walk, so distinct must hold
    val live = new java.io.File(s"$corpusRoot/corpus").listFiles()
      .map(_.getName).filter(_.startsWith("batch_id=")).head
    val doneAside = s"$corpusRoot/corpus/_old_" + live.replace('=', '~')
    mkdirs(doneAside)
    val f1 = Fsck.check(spark, corpusRoot).filter(_.dir == doneAside)
    assert(f1.length === 1, f1.mkString("\n"))
    assert(f1.head.level === "warn" &&
      f1.head.detail.contains("safe to delete"))
    // ORPHAN aside (no live destination — the crash BETWEEN the two
    // staged renames): this aside holds the partition's only copy, and
    // the finding must say restore, never delete
    mkdirs(s"$corpusRoot/corpus/_old_batch_id~99")
    val f2 = Fsck.check(spark, corpusRoot)
      .filter(_.dir == s"$corpusRoot/corpus/_old_batch_id~99")
    assert(f2.length === 1 && f2.head.level === "error", f2.mkString("\n"))
    assert(f2.head.detail.contains("Do NOT delete") &&
      f2.head.detail.contains("batch_id=99"))
    // a _stage_ temp is a warn (never read), not a corpus error
    mkdirs(s"$corpusRoot/corpus/_stage_batch_id~7")
    val f3 = Fsck.check(spark, corpusRoot)
      .filter(_.dir == s"$corpusRoot/corpus/_stage_batch_id~7")
    assert(f3.length === 1 && f3.head.level === "warn", f3.mkString("\n"))
  }

  test("a quality-classifier model dir surveys as a recognized healthy " +
      "shape, and its crashed write (params without weights) errs") {
    val root = mkRoot()
    graft.operators.QualityClassifier.writeModel(spark,
      Seq(("alpha", 0.5)).toDF("token", "weight"), 0.0, s"$root/model")
    val f = Fsck.check(spark, root)
    assert(f.exists(x => x.dir == s"$root/model" && x.level == "ok" &&
      x.detail.contains("classifier")), f.mkString("\n"))
    assert(!f.exists(_.level == "error"), f.mkString("\n"))
    rm(s"$root/model/weights")
    val f2 = Fsck.check(spark, root)
    assert(f2.exists(x => x.dir == s"$root/model" &&
      x.level == "error" && x.detail.contains("writeModel")),
      f2.mkString("\n"))
  }

  test("a BPE tokenizer model dir surveys as a recognized healthy " +
      "shape, and its crashed write (params without merges) errs") {
    val root = mkRoot()
    graft.operators.Bpe.writeModel(spark,
      Seq(("e", "s"), ("es", "t")), s"$root/bpe")
    val f = Fsck.check(spark, root)
    assert(f.exists(x => x.dir == s"$root/bpe" && x.level == "ok" &&
      x.detail.contains("BPE")), f.mkString("\n"))
    assert(!f.exists(_.level == "error"), f.mkString("\n"))
    rm(s"$root/bpe/merges")
    val f2 = Fsck.check(spark, root)
    assert(f2.exists(x => x.dir == s"$root/bpe" &&
      x.level == "error" && x.detail.contains("writeModel")),
      f2.mkString("\n"))
  }

  test("a model dir's CANONICAL crash state — data written, params " +
      "not yet — errs instead of passing silently as 'not an index'") {
    val root = mkRoot()
    // merges/ without params/: exactly what a crash inside
    // Bpe.writeModel leaves (params are deleted first, written last)
    Seq((0, "e", "s")).toDF("rank", "left", "right")
      .write.parquet(s"$root/bpe/merges")
    // ratios/ without params/: writeDsirModel's equivalent
    spark.range(4).select($"id".cast("int").as("bucket"),
        lit(0.1).as("log_ratio"))
      .write.parquet(s"$root/dsir/ratios")
    val f = Fsck.check(spark, root)
    assert(f.exists(x => x.dir == s"$root/bpe" && x.level == "error" &&
      x.component == "merges"), f.mkString("\n"))
    assert(f.exists(x => x.dir == s"$root/dsir" && x.level == "error" &&
      x.component == "ratios"), f.mkString("\n"))
  }

  test("the complete BPE model and the shards export survey as " +
      "recognized shapes; their crashed writes err with recoveries") {
    import graft.operators.Bpe
    val root = mkRoot()
    val model = Bpe.BpeModel(Seq("e", "s", "t", "</w>"),
      Seq(("e", "s"), ("es", "t")))
    Bpe.writeModel(spark, model, s"$root/bpe")
    Seq((0L, "test set tes")).toDF("doc_id", "text")
      .write.parquet(s"$root/c/corpus")
    graft.Pipeline.writeTrainingShards(spark, s"$root/c", s"$root/bpe",
      s"$root/shards", seqLen = 4, numShards = 2)
    val f = Fsck.check(spark, root)
    assert(f.exists(x => x.dir == s"$root/bpe" && x.level == "ok" &&
      x.detail.contains("complete BPE")), f.mkString("\n"))
    assert(f.exists(x => x.dir == s"$root/shards" && x.level == "ok" &&
      x.detail.contains("training-shards") &&
      x.detail.contains("digest")), f.mkString("\n"))
    assert(!f.exists(_.level == "error"), f.mkString("\n"))
    // a pre-digest-era export (counts-only provenance) surveys as a
    // WARN naming the re-export upgrade, not a silent ok
    spark.read.parquet(s"$root/shards/sequences")
      .write.parquet(s"$root/oldshards/sequences")
    spark.read.parquet(s"$root/shards/params").drop("model_digest")
      .write.parquet(s"$root/oldshards/params")
    val fw = Fsck.check(spark, root)
    assert(fw.exists(x => x.dir == s"$root/oldshards" &&
      x.level == "warn" && x.detail.contains("pre-digest-era")),
      fw.mkString("\n"))
    rm(s"$root/oldshards")
    // a crashed repair's staged-swap aside under sequences/ surveys
    // as a WARN naming the re-run-repair recovery (the aside is
    // invisible to every reader — without fsck nothing names it)
    new java.io.File(s"$root/shards/sequences/_old_pack~0").mkdirs()
    val fa = Fsck.check(spark, root)
    assert(fa.exists(x => x.dir == s"$root/shards" &&
      x.level == "warn" && x.detail.contains("repairTrainingShards")),
      fa.mkString("\n"))
    // the aside warn is ADDITIVE: the digest classification still
    // runs for the same dir, so one finding never masks the other —
    // but it must not read "healthy" while a pack sits aside,
    // invisible to every reader (tooling filters on ok-level text)
    assert(fa.exists(x => x.dir == s"$root/shards" &&
      x.level == "ok" && x.detail.contains("training-shards") &&
      !x.detail.contains("healthy")),
      fa.mkString("\n"))
    // ... and an aside'd PRE-digest export reports BOTH warns
    spark.read.parquet(s"$root/shards/sequences")
      .write.parquet(s"$root/oldshards2/sequences")
    spark.read.parquet(s"$root/shards/params").drop("model_digest")
      .write.parquet(s"$root/oldshards2/params")
    new java.io.File(s"$root/oldshards2/sequences/_old_pack~0").mkdirs()
    val fb = Fsck.check(spark, root)
    assert(fb.exists(x => x.dir == s"$root/oldshards2" &&
      x.level == "warn" && x.detail.contains("repairTrainingShards")),
      fb.mkString("\n"))
    assert(fb.exists(x => x.dir == s"$root/oldshards2" &&
      x.level == "warn" && x.detail.contains("pre-digest-era")),
      fb.mkString("\n"))
    rm(s"$root/oldshards2")
    rm(s"$root/shards/sequences/_old_pack~0")
    // complete-model params with the alphabet gone: readFullModel's
    // refusal state, and fsck must name it
    rm(s"$root/bpe/alphabet")
    val f2 = Fsck.check(spark, root)
    assert(f2.exists(x => x.dir == s"$root/bpe" &&
      x.level == "error" && x.component == "alphabet"),
      f2.mkString("\n"))
    // export params with sequences gone: a params-over-deleted-tree
    rm(s"$root/shards/sequences")
    val f3 = Fsck.check(spark, root)
    assert(f3.exists(x => x.dir == s"$root/shards" &&
      x.level == "error" && x.component == "sequences" &&
      x.detail.contains("writeTrainingShards")), f3.mkString("\n"))
  }

  test("the shard export's crashed-overwrite generation floor: inert " +
      "debris next to live params warns safe-to-delete; the floor " +
      "WITHOUT params errors do-NOT-delete (it holds the " +
      "generation's only copy)") {
    import graft.operators.Bpe
    val root = mkRoot()
    val model = Bpe.BpeModel(Seq("e", "s", "t", "</w>"),
      Seq(("e", "s")))
    Bpe.writeModel(spark, model, s"$root/bpe")
    Seq((0L, "test set tes")).toDF("doc_id", "text")
      .write.parquet(s"$root/c/corpus")
    graft.Pipeline.writeTrainingShards(spark, s"$root/c", s"$root/bpe",
      s"$root/shards", seqLen = 4, numShards = 2)
    // inert-debris half: the floor next to live params (a crash
    // between the params commit and the floor delete) — warn only,
    // the export classification stays intact
    java.nio.file.Files.write(java.nio.file.Paths.get(
      s"$root/shards/_layout_gen_floor"), "7".getBytes("UTF-8"))
    val fw = Fsck.check(spark, root)
    assert(fw.exists(x =>
      x.dir == s"$root/shards/_layout_gen_floor" &&
        x.level == "warn" && x.detail.contains("safe to delete")),
      fw.mkString("\n"))
    assert(!fw.exists(_.level == "error"), fw.mkString("\n"))
    // mid-overwrite half: params gone, the floor holds the seq-id-
    // space generation's ONLY copy — the error must say do NOT
    // delete (an operator sweeping stray underscore files here would
    // silently reset the generation lineage; ShardingSpec pins the
    // re-run's restamp-past-the-floor arithmetic)
    rm(s"$root/shards/params")
    val fe = Fsck.check(spark, root)
    assert(fe.exists(x =>
      x.dir == s"$root/shards/_layout_gen_floor" &&
        x.level == "error" && x.detail.contains("Do NOT delete")),
      fe.mkString("\n"))
  }

  test("a DSIR model dir surveys as a recognized healthy shape, and " +
      "its crashed write (params without ratios) errs") {
    val root = mkRoot()
    val w = spark.range(8).select($"id".cast("int").as("bucket"),
      lit(0.5).as("log_ratio"))
    graft.operators.Sharding.writeDsirModel(spark, w, 8, s"$root/dsir")
    val f = Fsck.check(spark, root)
    assert(f.exists(x => x.dir == s"$root/dsir" && x.level == "ok" &&
      x.detail.contains("DSIR")), f.mkString("\n"))
    assert(!f.exists(_.level == "error"), f.mkString("\n"))
    rm(s"$root/dsir/ratios")
    val f2 = Fsck.check(spark, root)
    assert(f2.exists(x => x.dir == s"$root/dsir" &&
      x.level == "error" && x.detail.contains("writeDsirModel")),
      f2.mkString("\n"))
  }
}
