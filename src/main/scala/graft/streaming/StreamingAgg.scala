package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured-Streaming variant of the flagship aggregation (extension
  * tier — the reference is pure batch, re-run per feed drop; this is the
  * same dedup+count semantics expressed incrementally).
  *
  * Late-data handling: the watermark bounds dedup/agg state; events later
  * than the watermark are dropped rather than growing state forever —
  * the property the reference gets implicitly by re-running whole days.
  */
object StreamingAgg {

  /** Streaming dedup+count per (day, key...): watermark → streaming
    * dedup on the tuple → windowed count.
    *
    * The dedup uses `dropDuplicatesWithinWatermark` (NOT plain
    * `dropDuplicates`): the derived `day` column carries no event-time
    * tag, so keying plain dropDuplicates on it would never expire state.
    * WithinWatermark keys state on the tuple but expires each entry as
    * the watermark passes it, so state stays bounded. The dedup guarantee
    * is correspondingly scoped: a duplicate is dropped only while the
    * FIRST occurrence is still within the watermark delay. With the
    * default `lateness = "1 day"` every same-day duplicate of a
    * (day,user,type) tuple falls inside that horizon (any admitted dup's
    * `ts` is within the day, and the first occurrence's state lives for a
    * full day), so counts match the batch `dropDuplicates` plan; a
    * SHORTER lateness trades exactness for state — a dup arriving more
    * than `lateness` after the first occurrence is counted again.
    *
    * @param events   streaming DataFrame with an event-time column `ts`,
    *                 a dedup identity `user_id`, and a group key
    *                 `event_type` (the events-table shape; the logentry
    *                 shape maps date/ip/risk onto these)
    * @param lateness watermark delay, e.g. "1 day"
    */
  def distinctDailyCounts(events: DataFrame,
      lateness: String = "1 day"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .withColumn("day", date_trunc("day", col("ts")))
      .dropDuplicatesWithinWatermark("day", "user_id", "event_type")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("count"))
      .select(col("window.start").as("day"), col("event_type"), col("count"))

  /** Streaming exact document dedup: drop any document whose content
    * fingerprint (md5 of normalized text) was already seen within the
    * watermark delay — `dropDuplicatesWithinWatermark` keys state on the
    * fingerprint only and expires it as event time advances, so state is
    * bounded by the dedup horizon, not the stream length.
    *
    * Input needs (ts, doc_id, text); emits the surviving rows.
    */
  def dedupDocumentsStream(docs: DataFrame,
      horizon: String = "1 hour"): DataFrame =
    docs
      .withWatermark("ts", horizon)
      .withColumn("fingerprint",
        md5(graft.operators.Dedup.normalized(col("text"))))
      .dropDuplicatesWithinWatermark("fingerprint")
}
