package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.Multimodal
import graft.streaming.StreamingAgg

class MultimodalStreamingSpec extends SparkSuite {
  import spark.implicits._

  test("multimodal: payload + typed metadata, per-partition decode, " +
      "frame sampling") {
    val docs = spark.read.parquet(sf() + "/documents.parquet").limit(50)
    val media = Multimodal.mediaFromDocuments(docs)
    assert(media.schema("payload").dataType.typeName === "binary")
    assert(media.schema("meta").dataType.typeName === "struct")
    val decoded = Multimodal.decodeAndFeaturize(media)
    assert(decoded.schema === Multimodal.decodedSchema)
    val d0 = decoded.orderBy($"media_id").collect()(0)
    assert(d0.getInt(1) >= 1 && d0.getInt(1) <= 640) // width
    assert(d0.getSeq[Float](4).length === 8)          // features
    // metadata-only projection never deserializes the payload
    val metaOnly = media.select($"media_id", $"meta.n_bytes")
    assert(metaOnly.count() === 50)
    val frames = Multimodal.sampleFrames(decoded, 5)
    val f = frames.groupBy($"media_id").agg(count(lit(1)).as("n"),
      max($"frame_idx").as("mx")).collect()
    assert(f.forall(r => r.getLong(1) >= 1))
    assert(frames.where($"frame_idx" % 5 =!= 0).count() === 0)
  }

  test("streaming document dedup drops watermark-window duplicates by " +
      "content fingerprint") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("ddup").toString
    val input = MemoryStream[(java.sql.Timestamp, Long, String)]
    val docs = input.toDF().toDF("ts", "doc_id", "text")
    val q = graft.streaming.StreamingAgg
      .dedupDocumentsStream(docs, "1 hour")
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out")
      .option("checkpointLocation", s"$tmp/ckpt")
      .start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    input.addData(Seq(
      (t("2024-01-01 10:00:00"), 1L, "same   TEXT here"),
      (t("2024-01-01 10:05:00"), 2L, "same text HERE"), // dup (normalized)
      (t("2024-01-01 10:06:00"), 3L, "different text")))
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("dedup_out").select($"doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(ids === Set(1L, 3L))
  }

  test("corpus-prep operators compose unchanged onto a stream " +
      "(stateless projections: mix + split + token count + quality)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.{Sharding, TextAnalysis}
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("prep").toString
    val input = MemoryStream[(Long, String, String)]
    val docs = input.toDF().toDF("doc_id", "lang", "text")
    // the same operator calls as the batch queries — no streaming
    // variants needed because mixing/splitting/counting are per-row
    val prepped = Sharding.hashSplit(
      Sharding.stratifiedSample(docs, col("lang"), Map("en" -> 0.5)))
      .withColumn("n_tokens", TextAnalysis.tokenCount(col("text")))
    val q = prepped.writeStream.outputMode("append")
      .format("memory").queryName("prep_out")
      .option("checkpointLocation", s"$tmp/ckpt")
      .start()
    input.addData((1L to 200L).map(i =>
      (i, if (i % 2 == 0) "en" else "de", s"doc number $i words")))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("prep_out")
    // de: default fraction 1.0 → all 100 survive; en: ~half
    assert(out.where($"lang" === "de").count() === 100L)
    val en = out.where($"lang" === "en").count()
    assert(en > 20 && en < 80, s"en kept $en")
    assert(out.where($"n_tokens" =!= 4).count() === 0)
    assert(out.select($"split").distinct().count() >= 2)
    // and membership matches the batch run exactly (determinism
    // across execution modes)
    val batch = Sharding.stratifiedSample(
      (1L to 200L).map(i =>
        (i, if (i % 2 == 0) "en" else "de", s"doc number $i words"))
        .toDF("doc_id", "lang", "text"),
      col("lang"), Map("en" -> 0.5))
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(out.select($"doc_id").collect().map(_.getLong(0)).toSet
      === batch)
  }

  test("streaming flagship: watermarked dedup+count equals the batch " +
      "result, late duplicates collapse, windows close as the watermark " +
      "advances") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("stream").toString
    val input = MemoryStream[(java.sql.Timestamp, Long, String)]
    val stream = input.toDF().toDF("ts", "user_id", "event_type")
    val agg = StreamingAgg.distinctDailyCounts(stream, "1 day")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("stream_out")
      .option("checkpointLocation", s"$tmp/ckpt")
      .start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // batch 1: day-1 events incl. a same-user duplicate, plus one day-2 row
    input.addData(Seq(
      (t("2024-01-01 01:00:00"), 1L, "click"),
      (t("2024-01-01 02:00:00"), 1L, "click"), // dedup within (day,user,type)
      (t("2024-01-01 03:00:00"), 2L, "click"),
      (t("2024-01-02 01:00:00"), 1L, "view")))
    q.processAllAvailable()
    // batches 2-3: advance event time so the watermark passes both windows
    input.addData(Seq((t("2024-01-05 00:00:00"), 9L, "noise")))
    q.processAllAvailable()
    input.addData(Seq((t("2024-01-07 00:00:00"), 9L, "noise")))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("stream_out")
      .where($"event_type" =!= "noise") // watermark-advancer rows
      .orderBy($"day", $"event_type")
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1),
        r.getLong(2))).toSeq
    assert(got === Seq(
      ("2024-01-01 00:00:00.0", "click", 2L),
      ("2024-01-02 00:00:00.0", "view", 1L)))
  }
}
