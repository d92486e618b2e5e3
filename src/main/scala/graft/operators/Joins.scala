package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join shapes beyond the reference's equi/anti joins (SURVEY.md §2
  * "explicit absences"): as-of and range joins.
  */
object Joins {

  /** As-of join: for each left row, the single right row with the same
    * key and the greatest `rightTime` ≤ `leftTime`.
    *
    * Implemented as equi-join on the key + time predicate + per-left-row
    * argmax (`max_by` over a struct, ties to the greatest tie-break
    * column) — one shuffle on the key, no window sort. At 100 TB both
    * sides hash-partition by the key; skewed keys fall back to the same
    * salting pattern as [[RiskAggregation.skewSafeDistinctCount]].
    *
    * @param leftId  unique id column of the left side (argmax group key)
    * @param tieCol  right-side column breaking ties among equal times
    */
  def asOf(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, leftId: String,
      tieCol: String, rightVals: Seq[String]): DataFrame = {
    val joined = left.join(right, Seq(key), "inner")
      .where(col(rightTime) <= col(leftTime))
    val payload = struct(
      (left.columns ++ rightVals).distinct.map(col).toSeq: _*)
    joined
      .groupBy(col(leftId).as("__id"))
      .agg(
        max_by(payload,
          struct(col(rightTime), col(tieCol))).as("__best"))
      .select(col("__best.*")) // left rows without a match drop (inner)
  }

  /** Range join: left rows matched to right rows whose half-open
    * [lo, hi) interval contains the left value. With a broadcast-sized
    * right (band/bucket tables), this is a BroadcastNestedLoop with a
    * cheap predicate; for two large sides, bucketize the value and turn
    * it into an equi-join on the bucket + residual predicate.
    */
  def range(left: DataFrame, right: DataFrame, value: Column,
      lo: Column, hi: Column): DataFrame =
    left.join(broadcast(right), value >= lo && value < hi, "inner")
}
