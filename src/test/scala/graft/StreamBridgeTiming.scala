package graft

// Dev-only localization harness for the text streaming bridge's
// per-batch cost (not a correctness spec): times each stage of the
// foreachBatch body in plain batch mode, against the same tiny inputs
// the MultimodalStreamingSpec test streams, then times TWO consecutive
// full bridge bodies — batch 1 runs with the per-index params cache
// warm, so (batch0 − batch1) bounds the cache's share of the fixed
// floor, and the separately-timed raw params read is the per-trigger
// driver-side cost the cache removes. Skipped unless GRAFT_TIMING=1:
// `GRAFT_TIMING=1 sbt "testOnly graft.StreamBridgeTiming"`.
class StreamBridgeTiming extends SparkSuite {
  import spark.implicits._
  import org.apache.spark.sql.functions._
  import graft.operators.Dedup

  private def timed[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"TIMING $label%-14s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  test("per-stage timing of the text bridge body (batch mode)") {
    assume(sys.env.get("GRAFT_TIMING").contains("1"),
      "set GRAFT_TIMING=1 to run the timing harness")
    val textA = "the quick brown fox jumps over the lazy dog and then " +
      "runs far away into the deep dark forest tonight"
    val textC = "completely different words about spark query engines " +
      "and distributed joins running on large clusters of machines"
    val idxDir = java.nio.file.Files
      .createTempDirectory("graft_timing").toString
    Dedup.writeMinhashIndex(Seq((1L, textA)).toDF("doc_id", "text"),
      idxDir, bandBuckets = 8)
    val b = Seq((10L, textA.replace("tonight", "today")), (11L, textC))
      .toDF("doc_id", "text").persist()
    b.count()
    val cross = timed("cross") {
      val c = Dedup.nearDupAgainstIndex(spark, b, idxDir, 0.5)
      c.count(); c
    }
    val crossIds = cross.select($"id_a".as("doc_id"))
      .unionByName(cross.select($"id_b".as("doc_id"))).distinct()
    val kept = b.join(broadcast(crossIds), Seq("doc_id"), "left_anti")
    val pairs = timed("within") {
      val p = Dedup.nearDupPairs(kept, 0.5); p.count(); p
    }
    val survivors = timed("clusters") {
      val s = Dedup.dedupByClusters(kept, pairs); s.count(); s
    }
    timed("append") {
      val (nsw, nh, bands, buckets) =
        Dedup.readMinhashIndexParams(spark, idxDir)
      Dedup.writeMinhashIndex(
        kept.join(survivors.select($"doc_id"), Seq("doc_id"), "left_semi"),
        idxDir, numShingleWords = nsw, numHashes = nh, bands = bands,
        bandBuckets = buckets, mode = "append")
    }
    timed("sinkcollect") { survivors.collect() }
    b.unpersist()
  }

  test("per-batch floor of the full text bridge body, params cache " +
      "warm vs cold, and the raw params-read cost it removes") {
    assume(sys.env.get("GRAFT_TIMING").contains("1"),
      "set GRAFT_TIMING=1 to run the timing harness")
    val textA = "the quick brown fox jumps over the lazy dog and then " +
      "runs far away into the deep dark forest tonight"
    def doc(i: Long) = s"wholly distinct streaming document number $i " +
      s"about topic $i with unique vocabulary item$i and token$i"
    val idxDir = java.nio.file.Files
      .createTempDirectory("graft_timing_floor").toString
    Dedup.writeMinhashIndex(Seq((1L, textA)).toDF("doc_id", "text"),
      idxDir, bandBuckets = 8)
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    def batchOf(id: Long) = Seq((t("2024-01-01 10:00:00"), 100L + id,
      doc(id))).toDF("ts", "doc_id", "text")
    // the per-trigger driver-side read the cache removes (timed cold —
    // a fresh path each trigger in the uncached regime)
    timed("params-read") { Dedup.readMinhashIndexParams(spark, idxDir) }
    timed("params-read2") { Dedup.readMinhashIndexParams(spark, idxDir) }
    (0L to 2L).foreach { id =>
      timed(s"batch$id") {
        graft.streaming.StreamingAgg.processTextBatch(batchOf(id),
          idxDir, threshold = 0.5, appendSurvivors = true,
          batchId = id) { (out, _) => out.collect() }
      }
    }
  }

  test("per-trigger floor of the RETRIEVAL bridge (ninth): the bm25 " +
      "stats read is deliberately NOT params-cached (they mutate on " +
      "every refresh append) — this prices that one metadata read per " +
      "trigger, and the consecutive probe bodies around it") {
    assume(sys.env.get("GRAFT_TIMING").contains("1"),
      "set GRAFT_TIMING=1 to run the timing harness")
    import graft.operators.Retrieval
    val idxDir = java.nio.file.Files
      .createTempDirectory("graft_timing_ret").toString
    Retrieval.writeBm25Index(
      (0L until 50L).map(i =>
          (i, s"document $i about spark joins windows and streams " +
            s"with unique token$i"))
        .toDF("doc_id", "text"),
      idxDir, tokenBuckets = 8, dlBuckets = 4)
    // the per-trigger driver-side read retrieveStream pays EVERY
    // trigger by design (a refresh append mutates n_docs/n_tokens, so
    // caching would rank under a stale corpus): first read cold,
    // second warm-ish (FS metadata cached) — the steady-state trigger
    // pays something between the two
    timed("bm25-stats-read") { Retrieval.readBm25IndexParams(spark, idxDir) }
    timed("bm25-stats-read2") { Retrieval.readBm25IndexParams(spark, idxDir) }
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    (0L to 2L).foreach { id =>
      timed(s"retrieve$id") {
        graft.streaming.StreamingAgg.processRetrieveBatch(
          Seq((t("2024-01-01 10:00:00"), 500L + id,
            s"spark joins token$id"))
            .toDF("ts", "query_id", "text"),
          idxDir, None, 10, 20, 1.2, 0.75, 60, false, 4, id) {
          (out, _) => out.collect()
        }
      }
    }
  }
}
