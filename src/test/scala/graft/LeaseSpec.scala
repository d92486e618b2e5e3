package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Lease}
import graft.streaming.StreamingAgg

/** The single-writer lease ([[graft.operators.Lease]]): enforcement of
  * the discipline every maintenance pass and bridge documents. Under
  * proof: a second concurrent writer refuses naming the holder; a
  * crashed holder's stale lease is recoverable (break + re-run); and
  * probes — readers — are never blocked by a held lease.
  */
class LeaseSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_$tag").toString

  private val doc0 = "the quick brown fox jumps over the lazy dog and " +
    "then runs far away into the deep dark forest tonight"

  private def batchOf(ids: Range) = ids.map(i =>
    (i.toLong, s"wholly distinct lease document $i with words$i", "en"))
    .toDF("doc_id", "text", "lang")

  private def refresh(b: org.apache.spark.sql.DataFrame,
      idxRoot: String, corpusDir: String) =
    Pipeline.refreshCorpus(spark, b, idxRoot, corpusDir,
      jaccardThreshold = 0.5, chunkTokens = 4, bandBuckets = 8,
      pieceBuckets = 8, chunkBuckets = 8)

  test("a second concurrent writer refuses naming the holder; the " +
      "stale lease of a crashed holder is broken and the pass re-runs; " +
      "completion and refusal both release") {
    val idxRoot = tmp("lease_idx")
    val corpusDir = tmp("lease_corpus")
    refresh(batchOf(0 until 3), idxRoot, corpusDir)
    // completion released every lease
    for (d <- Seq(corpusDir, s"$idxRoot/minhash", s"$idxRoot/hamming",
        s"$idxRoot/chunk"))
      assert(!new java.io.File(s"$d/_LEASE").exists(), d)
    // another writer holds the minhash family (as a crashed maintain
    // would): a refresh over the same root refuses, NAMING the holder
    Lease.acquire(spark, s"$idxRoot/minhash", "maintainIndexes")
    val e = intercept[IllegalStateException] {
      refresh(batchOf(10 until 13), idxRoot, corpusDir)
    }
    assert(e.getMessage.contains("maintainIndexes") &&
      e.getMessage.contains("break-lease"))
    // ...and the refused refresh released the leases it DID acquire
    assert(!new java.io.File(s"$corpusDir/_LEASE").exists())
    // maintain over the held family refuses too (writer vs writer)
    intercept[IllegalStateException] {
      Pipeline.maintainIndexes(spark, idxRoot)
    }
    // READERS are never blocked: the probe works under the held lease
    val probe = Seq((100L, doc0)).toDF("doc_id", "text")
    Dedup.nearDupAgainstIndex(spark, probe, s"$idxRoot/minhash",
      threshold = 0.5).collect() // must not throw
    // stale-lease takeover: break (the operator confirmed the holder
    // died), then the interrupted passes run to completion
    Lease.breakLease(spark, s"$idxRoot/minhash")
    refresh(batchOf(10 until 13), idxRoot, corpusDir)
    Pipeline.maintainIndexes(spark, idxRoot)
    assert(spark.read.parquet(s"$corpusDir/reports").count() === 2L)
    // a refusal INSIDE the leased scope releases too: modality drift
    // (adopt containment, then omit it)
    refresh(batchOf(20 until 22), idxRoot, corpusDir) // no containment
    Pipeline.refreshCorpus(spark, batchOf(30 until 32), idxRoot,
      corpusDir, jaccardThreshold = 0.5, chunkTokens = 4,
      bandBuckets = 8, pieceBuckets = 8, chunkBuckets = 8,
      containmentThreshold = Some(0.5))
    intercept[IllegalArgumentException] {
      refresh(batchOf(40 until 42), idxRoot, corpusDir) // omits it
    }
    assert(!new java.io.File(s"$corpusDir/_LEASE").exists())
    assert(!new java.io.File(s"$idxRoot/minhash/_LEASE").exists())
  }

  test("a bridge append mid-stream refuses under a held lease; after " +
      "the break, the SAME batch replays its committed probe output " +
      "and retries the append (the documented recovery)") {
    val idxDir = tmp("lease_stream")
    Dedup.writeMinhashIndex(Seq((1L, doc0)).toDF("doc_id", "text"),
      idxDir, numHashes = 8, bands = 4, bandBuckets = 8)
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val batch = Seq((t("2024-01-01 10:00:00"), 10L,
      "wholly novel vocabulary about stream lease interplay"))
      .toDF("ts", "doc_id", "text")
    val got = scala.collection.mutable.ArrayBuffer.empty[Set[Long]]
    def run(): Unit = StreamingAgg.processTextBatch(batch, idxDir,
      threshold = 0.5, appendSurvivors = true, batchId = 0L) {
      (out, _) => got += out.select($"doc_id").collect()
        .map(_.getLong(0)).toSet
    }
    // a maintenance pass holds the index: the batch's PROBE runs and
    // commits, the APPEND refuses — loud, nothing interleaved
    Lease.acquire(spark, idxDir, "maintainIndexes")
    intercept[IllegalStateException] { run() }
    assert(new java.io.File(s"$idxDir/stream_out/batch_0/_COMMIT")
      .exists()) // probe committed before the refused append
    assert(spark.read.parquet(s"$idxDir/bands")
      .where($"doc_id" === 10L).count() === 0L) // append never ran
    // break + re-run the same batch: the committed probe output
    // re-emits (no recompute against a moved index) and the append
    // retry completes the batch
    Lease.breakLease(spark, idxDir)
    run()
    assert(got.toSeq === Seq(Set(10L)))
    assert(spark.read.parquet(s"$idxDir/bands")
      .where($"doc_id" === 10L).count() > 0L)
    assert(!new java.io.File(s"$idxDir/_LEASE").exists())
  }

  test("breakAllUnder sweeps the root's and its direct children's " +
      "stale leases in one call — and ONLY those (a deeper tree keeps " +
      "its live writer's lease)") {
    val root = tmp("lease_sweep")
    // the crashed-refresh shape: leases on the root and two families
    new java.io.File(s"$root/minhash").mkdirs()
    new java.io.File(s"$root/chunk").mkdirs()
    new java.io.File(s"$root/chunk/shingles").mkdirs()
    Lease.acquire(spark, root, "refreshCorpus")
    Lease.acquire(spark, s"$root/minhash", "refreshCorpus")
    Lease.acquire(spark, s"$root/chunk", "refreshCorpus")
    // an unrelated LIVE writer two levels down must survive the sweep
    Lease.acquire(spark, s"$root/chunk/shingles", "live-writer")
    // look-before-you-break: status surveys exactly the sweep's blast
    // radius (root + direct children), with holder identity and age
    val surveyed = Lease.status(spark, root)
    assert(surveyed.map(_._2).toSet === Set("refreshCorpus"))
    assert(surveyed.size === 3)
    assert(surveyed.forall(_._4 >= 0L)) // parseable acquire stamps
    assert(surveyed.forall(_._5.nonEmpty)) // recorded JVM names
    val broken = Lease.breakAllUnder(spark, root)
    assert(broken.map(d => d.stripPrefix("file:")).toSet ===
      Set(root, s"$root/minhash", s"$root/chunk"))
    for (d <- Seq(root, s"$root/minhash", s"$root/chunk"))
      assert(!new java.io.File(s"$d/_LEASE").exists(), d)
    assert(new java.io.File(s"$root/chunk/shingles/_LEASE").exists())
    // idempotent: a second sweep finds nothing — and status agrees
    assert(Lease.breakAllUnder(spark, root).isEmpty)
    assert(Lease.status(spark, root).isEmpty)
  }

  test("rebuild and shingle migration hold their index's lease and " +
      "release on completion; concurrent writers refuse") {
    val emb = spark.read.parquet(sf() + "/embeddings.parquet")
    val dir = tmp("lease_ivf")
    graft.operators.Similarity.writeIvfIndex(emb, dir,
      graft.operators.Similarity.collectCentroids(
        graft.operators.Similarity.ivfCentroids(emb, nlist = 4)))
    Lease.acquire(spark, dir, "someone-else")
    intercept[IllegalStateException] {
      graft.operators.Similarity.rebuildIvfIndex(spark, dir, nlist = 8)
    }
    Lease.breakLease(spark, dir)
    graft.operators.Similarity.rebuildIvfIndex(spark, dir, nlist = 8,
      iters = 1)
    assert(!new java.io.File(s"$dir/_LEASE").exists())
    val mh = tmp("lease_mh")
    Dedup.writeMinhashIndex(Seq((1L, doc0)).toDF("doc_id", "text"), mh,
      bandBuckets = 8)
    Lease.acquire(spark, mh, "someone-else")
    intercept[IllegalStateException] {
      Dedup.migrateShingleBuckets(spark, mh, shingleBuckets = 2)
    }
    Lease.breakLease(spark, mh)
    Dedup.migrateShingleBuckets(spark, mh, shingleBuckets = 2)
    assert(!new java.io.File(s"$mh/_LEASE").exists())
  }
}
