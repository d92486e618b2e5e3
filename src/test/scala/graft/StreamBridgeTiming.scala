package graft

// Dev-only localization harness for the text streaming bridge's
// per-batch cost (not a correctness spec): times each stage of the
// foreachBatch body in plain batch mode, against the same tiny inputs
// the MultimodalStreamingSpec test streams. Run with
// `testOnly graft.StreamBridgeTiming` when chasing a regression.
class StreamBridgeTiming extends SparkSuite {
  import spark.implicits._
  import org.apache.spark.sql.functions._
  import graft.operators.Dedup

  ignore("per-stage timing of the text bridge body (batch mode)") {
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
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"TIMING $label%-12s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
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
  }
}
