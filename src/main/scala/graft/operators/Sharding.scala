package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.native

/** Corpus-preparation operators for a training-data pipeline: deterministic
  * train/val/test splitting and token-budget sharding. Both are pure
  * functions of the data (no RNG state), so a re-run at any scale assigns
  * every document to the same split/shard — the property a 100 TB pipeline
  * needs to resume, backfill, or audit a split.
  */
object Sharding {

  /** Deterministic hash bucket in [0, 100): the portable rolling
    * polynomial hash (same fold as [[graft.functions.RollingHashExpr]],
    * reproducible by any engine — see the q44 oracle) of
    * `"<salt>:<id>"`, mod 100. Salting gives effectively-independent
    * re-splits without touching the data.
    *
    * The salt must be the PREFIX: a polynomial fold of a concatenation is
    * affine in each part, so a suffix salt only adds a constant — two
    * salts differing in the last character would shift every hash by the
    * same tiny offset and "re-split" almost nothing. As a prefix the
    * salt's contribution is scaled by 257^len(id), a large per-length
    * rotation of the bucket space.
    */
  def hashBucket(id: Column, salt: String): Column =
    pmod(native.rolling_hash(
      concat(lit(salt + ":"), id.cast("string"))), lit(100L)).cast("int")

  /** Deterministic train/val/test assignment by hash bucket — the
    * held-out-split operator of a training pipeline. Map-only (a
    * projection per row, no shuffle, no RNG): at 100 TB the split is a
    * free column, never a sampling pass, and membership is stable across
    * re-runs and engines.
    */
  def hashSplit(df: DataFrame, id: Column = col("doc_id"),
      salt: String = "v1", trainPct: Int = 80,
      valPct: Int = 10): DataFrame = {
    require(trainPct + valPct < 100, "train+val must leave room for test")
    val b = hashBucket(id, salt)
    df.withColumn("bucket", b)
      .withColumn("split",
        when(col("bucket") < trainPct, lit("train"))
          .when(col("bucket") < trainPct + valPct, lit("val"))
          .otherwise(lit("test")))
  }

  /** Cross-split decontamination report: for each split, how many
    * documents it holds, how many distinct content fingerprints, and how
    * many of its documents share a fingerprint with ANOTHER split —
    * the train/test-leakage check run before training on a split. One
    * aggregate over (fingerprint → distinct-split count) joined back;
    * both sides shuffle on the fingerprint key only.
    */
  def splitLeakage(docs: DataFrame, salt: String = "v1"): DataFrame = {
    val tagged = hashSplit(docs, salt = salt)
      .select(col("doc_id"), col("split"),
        TextAnalysis.fingerprint(col("text")).as("fp"))
    val fpSplits = tagged.groupBy(col("fp"))
      .agg(countDistinct(col("split")).as("n_splits"))
    tagged.join(fpSplits, Seq("fp"))
      .groupBy(col("split"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("fp")).as("n_fingerprints"),
        sum(when(col("n_splits") > 1, 1L).otherwise(0L))
          .as("n_leaked_docs"))
  }

  /** Deterministic stratified downsampling — the data-mixing step of
    * corpus assembly (keep 30% of web text, all of books, ...): keep a
    * per-stratum fraction of rows, membership decided by the portable
    * hash of `"<salt>:<id>"` (salt-prefixed, see [[hashBucket]]) against
    * a 1/10000-resolution threshold.
    * Map-only (a projection + filter, no RNG, no sampling pass): at
    * 100 TB the mix is one scan, stable across re-runs/engines, and
    * re-mixable by salt without touching the data. Strata absent from
    * `fractions` keep `defaultFraction`.
    */
  def stratifiedSample(df: DataFrame, strata: Column,
      fractions: Map[String, Double], defaultFraction: Double = 1.0,
      id: Column = col("doc_id"), salt: String = "mix1"): DataFrame = {
    require((fractions.values ++ Seq(defaultFraction))
      .forall(f => f >= 0.0 && f <= 1.0), "fractions must be in [0, 1]")
    // salt as prefix, for the same reason as [[hashBucket]]. NULL ids
    // hash to NULL — coalesce to tick 0 so they ride with ANY non-zero
    // fraction (a fraction-1.0 stratum keeps everything, including its
    // null-id rows) instead of being silently dropped by the null
    // comparison.
    val tick = coalesce(pmod(native.rolling_hash(
      concat(lit(salt + ":"), id.cast("string"))), lit(10000L)), lit(0L))
    val threshold = fractions.toSeq.sortBy(_._1)
      .foldLeft(lit(math.round(defaultFraction * 10000))) {
        case (acc, (k, f)) =>
          when(strata === lit(k), lit(math.round(f * 10000)))
            .otherwise(acc)
      }
    df.where(tick < threshold)
  }

  /** Token-budget sharding: assign documents (in `doc_id` order) to
    * consecutive shards of ~`budget` tokens each — the pack-the-corpus
    * step before writing training shards. A document lands in shard
    * `floor(tokens_before_it / budget)`.
    *
    * Scale design: the global running sum is a DISTRIBUTED prefix sum,
    * not a single-partition window — range-partition by doc_id, cumsum
    * within each partition, then add per-partition offsets computed from
    * the partition totals (nParts rows through the driver — index
    * metadata, like any distributed scan's split points). A plain
    * `Window.orderBy` with no partitioning would funnel the corpus
    * through ONE task; this keeps every stage parallel.
    */
  def tokenShards(docs: DataFrame, budget: Long,
      numParts: Int = 32): DataFrame = {
    require(budget > 0, "budget must be positive")
    val toks = docs.select(col("doc_id"),
      TextAnalysis.tokenCount(col("text")).as("n_tokens"))
    // localCheckpoint pins the (sampled) range boundaries so the totals
    // job and the final job see identical partitions/pids
    val ranged = toks
      .repartitionByRange(numParts, col("doc_id"))
      .sortWithinPartitions(col("doc_id"))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint()
    val totals = ranged.groupBy(col("pid"))
      .agg(sum(col("n_tokens")).as("t"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .sortBy(_._1)
    // per-partition prefix offsets: offset(pid) = sum of earlier totals
    val offByPid = totals.zip(
      totals.scanLeft(0L) { case (acc, (_, t)) => acc + t })
      .map { case ((pid, _), off) => pid -> off }.toMap
    val offCol = element_at(typedLit(offByPid), col("pid")).cast("long")
    val w = Window.partitionBy(col("pid")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    ranged
      .withColumn("cum_prev",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)) + offCol)
      .withColumn("shard_id",
        floor(col("cum_prev") / lit(budget.toDouble)))
      .select(col("doc_id"), col("n_tokens"), col("shard_id"))
  }
}
