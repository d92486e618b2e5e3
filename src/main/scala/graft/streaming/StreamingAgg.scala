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
    * the watermark passes it; duplicates of a (day,user,type) tuple all
    * carry a `ts` inside that day, so any dup still admitted by the
    * watermark is also still within the dedup horizon — semantics match,
    * state is bounded.
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
