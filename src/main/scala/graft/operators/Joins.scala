package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
    * column) — one shuffle on the key, no window sort. The key-only
    * shuffle materializes |left_k|×|right_k| candidate rows per key
    * before the argmax, so a hot key makes one task quadratic: at scale,
    * or whenever key skew is possible, use [[asOfBucketed]], which bounds
    * candidates by time-bucket density instead.
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

  /** Skew-safe as-of join — identical semantics to [[asOf]], different
    * physical shape: both sides bucket by `floor(time / bucketSeconds)`,
    * so the shuffle key is (key, bucket) and a celebrity key spreads
    * across its time range instead of landing on one task.
    *
    * For each left row the as-of match is the better of:
    *   - the best same-bucket right row with `rightTime` ≤ `leftTime` — a
    *     row-level join restricted to the SAME bucket, so candidate pairs
    *     per task are bounded by per-bucket density, never |left_k|×|right_k|;
    *   - the best right row of any strictly-earlier bucket — every such
    *     row satisfies the time predicate by construction (its bucket
    *     ends before the left bucket starts), so buckets pre-reduce to
    *     one best row each and a per-key running max over the BUCKET AXIS
    *     (≤ timespan/bucketSeconds rows per key — index-sized) carries it
    *     forward.
    *
    * "Best" is everywhere the lexicographic struct max on
    * (`rightTime`, `tieCol`, …), exactly [[asOf]]'s `max_by` ordering.
    * Cost: left shuffles twice (bucket join + argmax), right once, plus a
    * bucket-axis window — all linear; `bucketSeconds` tunes the
    * candidate-density / axis-length trade.
    */
  def asOfBucketed(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, leftId: String,
      tieCol: String, rightVals: Seq[String],
      bucketSeconds: Long = 30L * 86400): DataFrame = {
    def bucket(c: Column): Column =
      floor(unix_timestamp(c) / bucketSeconds).cast("long")
    // ordering fields first: struct max ≡ argmax by (rightTime, tieCol)
    val payloadFields = (Seq(rightTime, tieCol) ++ rightVals).distinct
    val lb = left.withColumn("__b", bucket(col(leftTime)))
    // NULL-time right rows can never satisfy rt <= lt, so asOf drops
    // them via the predicate; here they must be filtered EXPLICITLY — a
    // NULL bucket sorts first on the carry axis and would otherwise leak
    // a null-payload "best" into every later bucket's carry frame
    val rb = right.where(col(rightTime).isNotNull)
      .select(col(key).as("__k"),
        bucket(col(rightTime)).as("__rbkt"),
        struct(payloadFields.map(col).toSeq: _*).as("__rb"))

    // per-(key, bucket) best right row → running best over all
    // strictly-earlier ACTIVE buckets (axis = buckets either side touches,
    // so every left bucket has a carry row even if no right row landed in
    // it)
    val bestPerBucket = rb
      .groupBy(col("__k"), col("__rbkt").as("__b"))
      .agg(max(col("__rb")).as("__bucket_best"))
    val axis = lb.select(col(key).as("__k"), col("__b"))
      .unionByName(bestPerBucket.select(col("__k"), col("__b")))
      .distinct()
    val w = Window.partitionBy(col("__k")).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = axis.join(bestPerBucket, Seq("__k", "__b"), "left")
      .select(col("__k"), col("__b").as("__cb"),
        max(col("__bucket_best")).over(w).as("__carry"))

    // in-bucket candidates: the only row-level right join, same-bucket
    val inBest = lb
      .select(col(leftId).as("__id"), col(key).as("__lk"),
        col("__b").as("__lb"), col(leftTime).as("__lt"))
      .join(rb, col("__lk") === col("__k") &&
        col("__lb") === col("__rbkt") &&
        col("__rb").getField(rightTime) <= col("__lt"))
      .groupBy(col("__id"))
      .agg(max(col("__rb")).as("__in"))

    val leftCols = left.columns.toSeq
    lb
      .join(carry, lb(key) === carry("__k") && lb("__b") === carry("__cb"),
        "left")
      .join(inBest, col(leftId) === col("__id"), "left")
      .withColumn("__best", greatest(col("__in"), col("__carry")))
      .where(col("__best").isNotNull) // inner semantics, like asOf
      .select(leftCols.map(col) ++
        rightVals.map(v => col("__best").getField(v).as(v)): _*)
  }

  /** Range join: left rows matched to right rows whose half-open
    * [lo, hi) interval contains the left value. With a broadcast-sized
    * right (band/bucket tables), this is a BroadcastNestedLoop with a
    * cheap predicate; for two large sides use [[rangeBucketed]].
    */
  def range(left: DataFrame, right: DataFrame, value: Column,
      lo: Column, hi: Column): DataFrame =
    left.join(broadcast(right), value >= lo && value < hi, "inner")

  /** Range join for two LARGE sides: bucketize the value axis so the
    * theta-join becomes an equi-join on the bucket + residual predicate.
    * Each interval row replicates into the buckets it covers
    * (`sequence` + `explode` — replication = interval span /
    * bucketWidth), each left row lands in exactly one bucket, and the
    * shuffle key is the bucket — no nested loop, no broadcast, pairs
    * bounded by per-bucket density.
    *
    * Pick `bucketWidth` near the typical interval length: too small
    * replicates intervals, too large packs unrelated rows into one
    * bucket. Interval ends are clamped to the observed left value range
    * (one min/max agg over the left side) before bucketizing, so an
    * open-ended or sentinel `hi` (Long.MaxValue, year-9999) replicates
    * only across the buckets the left side actually occupies, never the
    * whole axis; intervals that cannot intersect the observed range
    * drop before the explode.
    *
    * The bounds agg runs EAGERLY when this method is called (the clamp
    * must be a literal so the exploded sequence stays bounded at plan
    * time) — the left plan executes once here and again in the join, so
    * cache/checkpoint an expensive derived left before calling. NaN
    * values are excluded from the bounds (Spark orders NaN above every
    * double, so one NaN row would un-clamp `hi` entirely); NaN left
    * rows match no interval in either the bucketed or the theta shape.
    */
  def rangeBucketed(left: DataFrame, right: DataFrame, value: Column,
      lo: Column, hi: Column, bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def bkt(c: Column): Column = floor(c / bucketWidth).cast("long")
    val floating = left.select(value).schema.head.dataType match {
      case org.apache.spark.sql.types.DoubleType |
           org.apache.spark.sql.types.FloatType => true
      case _ => false
    }
    val boundsSrc = if (floating) left.where(!isnan(value)) else left
    val bounds = boundsSrc.agg(min(value), max(value)).head()
    val (vMin, vMax) = (bounds.get(0), bounds.get(1))
    // empty left (or all-NULL values): no row can match — skip the
    // explode entirely rather than replicate unclamped intervals
    val intersecting =
      if (vMin == null) right.where(lit(false))
      // half-open [lo, hi): hi == vMin cannot match, lo == vMax can
      else right.where(hi > lit(vMin) && lo <= lit(vMax))
    val clampLo = if (vMin == null) lo else greatest(lo, lit(vMin))
    val clampHi = if (vMin == null) hi else least(hi, lit(vMax))
    val rb = intersecting.withColumn("__bkt",
      explode(sequence(bkt(clampLo), bkt(clampHi))))
    left.withColumn("__bkt", bkt(value))
      .join(rb, Seq("__bkt"))
      .where(value >= lo && value < hi) // residual on the ORIGINAL ends
      .drop("__bkt")
  }
}
