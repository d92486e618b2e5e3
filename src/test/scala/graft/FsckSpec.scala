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
}
