package graft

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamingAgg

/** Batch-equivalence anchor for the streaming tier: the streaming
  * flagship driven by a FILE source over the SAME rows as the batch
  * plan (the real sf0.001 events parquet), available-now trigger, must
  * produce row-identical closed windows. Everything else about the
  * streaming entries is unit-fixture-tested (MultimodalStreamingSpec);
  * this pins them to the real testdata the way every batch query is
  * pinned.
  */
class StreamingEquivalenceSpec extends SparkSuite {
  import spark.implicits._

  /** events.parquet carries ts as TIMESTAMP(NANOS) (read as Long under
    * nanosAsLong, set in SparkSuite) or as microsecond NTZ depending on
    * the generator version — same normalization to TimestampType as the
    * batch events reader (UTC session: the NTZ cast is micros-identity).
    */
  private def tsFixed(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts",
          $"ts".cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }

  test("streaming flagship over the events file source equals the " +
      "batch dedup+count plan (available-now trigger)") {
    val srcDir = sf() + "/events.parquet"
    val raw = spark.read.parquet(srcDir)
    val maxTs = tsFixed(raw).agg(max($"ts")).collect()(0).getTimestamp(0)

    // staging dir: the real event files first, then two far-future
    // sentinel files. maxFilesPerTrigger=1 + ascending mtimes makes the
    // sentinels arrive in their own later micro-batches, so the
    // watermark passes every real window and append mode emits it; the
    // sentinels' own windows stay open and are filtered from the
    // comparison.
    val stage = Files.createTempDirectory("stream-eq")
    val src = Paths.get(srcDir)
    val parts =
      if (Files.isDirectory(src)) {
        val s = Files.list(src)
        try s.toArray.map(_.asInstanceOf[Path])
          .filter(_.getFileName.toString.endsWith(".parquet")).sorted
        finally s.close()
      } else Array(src) // driver testdata writes one plain parquet file
    var mtime = System.currentTimeMillis() - 60000
    parts.foreach { p =>
      val dst = stage.resolve(p.getFileName)
      Files.copy(p, dst, StandardCopyOption.REPLACE_EXISTING)
      dst.toFile.setLastModified(mtime)
    }
    def sentinel(name: String, daysAhead: Int): Unit = {
      // anchored on maxTs, not an arbitrary row: the watermark must pass
      // the LAST real window no matter how wide a time span the events
      // fixture covers
      val s = tsFixed(raw).limit(1)
        .withColumn("ts",
          lit(new java.sql.Timestamp(
            maxTs.getTime + daysAhead * 86400000L)))
        .withColumn("event_type", lit("zz_sentinel"))
      // write back in the SOURCE encoding (the staged file is read
      // under raw.schema): long nanos, NTZ micros, or plain timestamp
      val out = raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          s.withColumn("ts", ($"ts".cast("long") * 1000000000L))
        case org.apache.spark.sql.types.TimestampNTZType =>
          s.withColumn("ts",
            $"ts".cast(org.apache.spark.sql.types.TimestampNTZType))
        case _ => s
      }
      val tmp = Files.createTempDirectory("sentinel")
      out.select(raw.columns.map(col): _*).coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      val listing = Files.list(tmp)
      val part =
        try listing.toArray.map(_.asInstanceOf[Path])
          .filter(_.getFileName.toString.endsWith(".parquet")).head
        finally listing.close()
      mtime += 10000
      val dst = stage.resolve(name)
      Files.copy(part, dst, StandardCopyOption.REPLACE_EXISTING)
      dst.toFile.setLastModified(mtime)
    }
    sentinel("zz1.parquet", 400)
    sentinel("zz2.parquet", 800)

    val stream = tsFixed(
      spark.readStream.schema(raw.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stage.toString))
      .select($"ts", $"user_id", $"event_type")
    val ckpt = Files.createTempDirectory("stream-eq-ckpt").toString
    val q = StreamingAgg.distinctDailyCounts(stream, "365 days")
      .writeStream.outputMode("append")
      .format("memory").queryName("stream_eq_out")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(300000),
      "stream did not finish within the timeout")

    val got = spark.table("stream_eq_out")
      .where($"event_type" =!= "zz_sentinel")
      .collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2)))
      .sorted
    // the batch plan with the same dedup identity (day, user, type)
    val want = tsFixed(raw)
      .select(date_trunc("day", $"ts").as("day"), $"user_id",
        $"event_type")
      .distinct()
      .groupBy($"day", $"event_type")
      .agg(count(lit(1)).as("count"))
      .collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2)))
      .sorted
    assert(want.nonEmpty)
    assert(got.toSeq === want.toSeq)
  }

  test("q91's PRODUCTION folded two-batch shape (first sentinel riding " +
      "the data batch) equals the batch dedup+count plan") {
    // the r20 fold: q91 stages data + sentinel-1 as micro-batch 0 and
    // sentinel-2 alone as micro-batch 1 (maxFilesPerTrigger = data
    // files + 1). The watermark consumed during a batch comes from the
    // PREVIOUS batch's max event time, so batch 0 still emits nothing
    // and batch 1 — starting at max-sentinel-ts − 365 d — emits every
    // real window: row-identical to the spec's one-file-per-trigger
    // mirror above, minus the per-data-file micro-batch floors.
    val raw = spark.read.parquet(sf() + "/events.parquet")
    val got = SparkEntry.queries("q91_streaming_flagship")(spark, sf())
      .collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2)))
      .sorted
    val want = tsFixed(raw)
      .select(date_trunc("day", $"ts").as("day"), $"user_id",
        $"event_type")
      .distinct()
      .groupBy($"day", $"event_type")
      .agg(count(lit(1)).as("count"))
      .collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2)))
      .sorted
    assert(want.nonEmpty)
    assert(got.toSeq === want.toSeq)
  }

  test("q110 streaming screen over the documents file source equals " +
      "q101's batch screen row-for-row (available-now trigger)") {
    // the same real-testdata anchor as the flagship: the bridge's
    // unioned micro-batch reports must be BIT-identical to the batch
    // screen — which is what lets q110 share q101's DuckDB oracle
    val streamed = SparkEntry.queries("q110_stream_screen")(spark, sf())
    val batch = SparkEntry.queries("q101_contamination_index")(spark, sf())
    assert(streamed.columns.toSeq === batch.columns.toSeq)
    val s = streamed.collect().map(_.toSeq).toSeq
    val b = batch.collect().map(_.toSeq).toSeq
    assert(s.nonEmpty && s === b)
  }

  test("q117 streaming semantic screen over the embeddings file source " +
      "equals q115's batch screen row-for-row (available-now trigger)") {
    // same anchor for the sixth bridge: unioned micro-batch reports
    // BIT-identical to the batch screen — what lets q117 share q115's
    // DuckDB oracle
    val streamed = SparkEntry.queries("q117_stream_semantic")(spark, sf())
    val batch = SparkEntry.queries("q115_semantic_screen")(spark, sf())
    assert(streamed.columns.toSeq === batch.columns.toSeq)
    val s = streamed.collect().map(_.toSeq).toSeq
    val b = batch.collect().map(_.toSeq).toSeq
    assert(s.nonEmpty && s === b)
  }
}
