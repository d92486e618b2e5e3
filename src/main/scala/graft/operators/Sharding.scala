package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** The portable uniform variate in [0, 1e9+7) behind every sampling
    * operator here: the rolling polynomial hash (same fold as
    * [[graft.functions.RollingHashExpr]], reproducible by any engine —
    * see the q44 oracle) of `"<salt>:<id>"`, then ONE Lehmer mixing
    * step `(h · 48271) mod p` (Park–Miller MINSTD multiplier —
    * bijective because p = 1e9+7 is prime, and 48271·(p−1) < 2⁶³ so
    * the step is exact in 64-bit integers).
    *
    * Both halves are load-bearing:
    *  - The salt must be the PREFIX: a polynomial fold of a
    *    concatenation is affine in each part, so a suffix salt only
    *    adds a constant — two salts differing in the last character
    *    would shift every hash by the same tiny offset and "re-split"
    *    almost nothing. As a prefix the salt's contribution is scaled
    *    by 257^len(id), a large per-length rotation.
    *  - The mix must follow the fold: the fold is affine in the
    *    TRAILING character too, so adjacent ids produce adjacent raw
    *    hashes — mod-m consumers would degrade to round-robin over id
    *    runs (systematic, id-correlated membership: exactly the bias a
    *    crawl corpus with time-ordered ids cannot afford), and
    *    magnitude consumers ([[weightedSample]]) to "largest digit
    *    suffix wins". The multiplication scatters adjacency across the
    *    whole field.
    *
    * SPLIT-FORMAT NOTE: adding the Lehmer step changed every
    * hashBucket / stratifiedSample / weightedSample assignment
    * relative to the pre-mix scheme (same salt, different membership).
    * Splits persisted under the unmixed scheme do NOT re-derive —
    * treat the mixed hash as split-format v2 and either keep consuming
    * the persisted split columns or re-materialize the split once.
    * Reproducibility holds within a format version, never across one.
    */
  private[graft] def mixedHash(id: Column, salt: String): Column =
    pmod(native.rolling_hash(
      concat(lit(salt + ":"), id.cast("string"))) * lit(48271L),
      lit(1000000007L))

  /** Deterministic hash bucket in [0, 100): [[mixedHash]] mod 100.
    * Salting gives effectively-independent re-splits without touching
    * the data.
    */
  def hashBucket(id: Column, salt: String): Column =
    pmod(mixedHash(id, salt), lit(100L)).cast("int")

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
    // salted+mixed variate (see [[mixedHash]] — without the mix a 30%
    // fraction would keep contiguous 3000-id runs). NULL ids hash to
    // NULL — coalesce to tick 0 so they ride with ANY non-zero fraction
    // (a fraction-1.0 stratum keeps everything, including its null-id
    // rows) instead of being silently dropped by the null comparison.
    val tick = coalesce(pmod(mixedHash(id, salt), lit(10000L)), lit(0L))
    val threshold = fractions.toSeq.sortBy(_._1)
      .foldLeft(lit(math.round(defaultFraction * 10000))) {
        case (acc, (k, f)) =>
          when(strata === lit(k), lit(math.round(f * 10000)))
            .otherwise(acc)
      }
    df.where(tick < threshold)
  }

  /** Deterministic per-EPOCH training order for a packed-sequence
    * artifact: adds `epoch_key` — the mixed hash of the sequence id
    * under salt `"<salt>:<epoch>"` (the explicit separator keeps
    * distinct (salt, epoch) pairs in distinct hash streams — without
    * it ("ep", 13) and ("ep1", 3) would share a permutation) — so
    * ordering by (epoch_key, seq_id) is a different pseudorandom
    * PERMUTATION of the data every epoch, reproducible bit-for-bit
    * across runs and engines (resume a crashed epoch mid-stream;
    * replay the exact batch neighborhood of a loss spike), and
    * computed as a MAP-ONLY projection: no RNG state, no driver-side
    * index permutation — at 100 TB the epoch order must be a COLUMN
    * the consumer sorts or range-partitions by, never an array
    * anything materializes. The id tie-break makes the order total
    * (hash collisions cannot make two runs disagree); a different
    * `salt` is an independent curriculum redraw without touching the
    * data (the [[stratifiedSample]] rule). NULL ids hash to key 0
    * ([[stratifiedSample]]'s coalesce discipline — engines disagree
    * on NULL sort position, so a NULL key must never reach the sort);
    * the order AMONG null-id rows is undefined — give sequences real
    * ids. Composes directly with
    * [[graft.Pipeline.readTrainingShards]]'s sequences frame.
    */
  def epochOrder(seqs: DataFrame, epoch: Int, salt: String = "ep",
      id: Column = col("seq_id")): DataFrame = {
    require(epoch >= 0, s"epoch must be >= 0, got $epoch")
    seqs.withColumn("epoch_key",
      coalesce(mixedHash(id, s"$salt:$epoch"), lit(0L)))
  }

  /** The loader-side epoch MATERIALIZATION: [[epochOrder]]'s key
    * applied to a packed-sequence artifact (the
    * [[graft.Pipeline.readTrainingShards]] frame) and the rows
    * physically arranged into that epoch's order — range-partitioned
    * by `(epoch_key, seq_id)` and sorted within partitions, so a
    * training run streaming partition 0, 1, 2, … reads the exact
    * permutation [[epochOrder]] defines, resumable at any partition
    * boundary. `CorpusMain epoch-stream` writes it; a loader that
    * consumes Spark partitions directly skips the write.
    *
    * Scale: the key is map-only; the reorder is ONE range exchange
    * (the consumer's own partitioning — sampled bounds, no global
    * single-partition sort, no driver-side index array) plus the
    * in-partition sort, and its volume is the artifact's own size —
    * the unavoidable floor of a global permutation (PlanSpec pins the
    * single-exchange shape; BENCH_SF1 prices it at sf1).
    *
    * `numParts` defaults to 0 = ARTIFACT-SCALED: the partition count
    * is [[epochPartitions]] over the frame's own Σ `n_ids` (one
    * column-pruned metadata aggregate — the id arrays are never
    * deserialized), so a direct API caller at 100× the test artifact
    * gets ~128 MB-of-ids sort tasks, not 32 multi-GB ones. A frame
    * without an `n_ids` column falls back to `ids` lengths when
    * present (same count, one size() pass) and to the 32 floor
    * otherwise; pass an explicit count to override — a loader's
    * resume granularity is the consumer's call.
    */
  def epochReorder(seqs: DataFrame, epoch: Int, salt: String = "ep",
      numParts: Int = 0): DataFrame = {
    val parts =
      if (numParts > 0) numParts
      else {
        val idCount =
          if (seqs.columns.contains("n_ids"))
            seqs.agg(coalesce(sum(col("n_ids").cast("long")), lit(0L)))
              .head().getLong(0)
          else if (seqs.columns.contains("ids"))
            seqs.agg(coalesce(sum(size(col("ids")).cast("long")),
              lit(0L))).head().getLong(0)
          else 0L
        epochPartitions(idCount)
      }
    epochOrder(seqs, epoch, salt)
      .repartitionByRange(parts, col("epoch_key"), col("seq_id"))
      .sortWithinPartitions(col("epoch_key"), col("seq_id"))
  }

  /** THE range-partition sizing rule behind [[epochReorder]]'s
    * default and `CorpusMain epoch-stream`'s metadata path — ONE
    * definition so the two can never drift: ~128 MB of ids (4 B
    * each) per partition, floor 32 (small artifacts still spread
    * across the cluster's cores; a fixed count would funnel a large
    * export through multi-GB single-task sorts). */
  def epochPartitions(nIdsTotal: Long): Int =
    math.max(32L, nIdsTotal * 4L / (128L << 20)).toInt

  /** RESUME a crashed epoch mid-stream — the executable form of the
    * [[epochOrder]] reproducibility claim: given the last consumed
    * position `(lastKey, lastId)` (the epoch key and seq_id of the
    * last sequence the training run checkpointed), return the
    * sequences STRICTLY AFTER it in that epoch's total
    * (epoch_key, seq_id) order. Because the permutation is a pure
    * function of (data, epoch, salt), the cursor is two longs — no
    * loader state, no index array, no affinity to the partitioning
    * that produced it — and the same two longs resume the same
    * position on any engine folding the same hash. Map-only: one
    * projection + filter; compose with [[epochReorder]] to
    * re-materialize only the remainder.
    */
  def epochResume(seqs: DataFrame, epoch: Int, lastKey: Long,
      lastId: Long, salt: String = "ep",
      id: Column = col("seq_id")): DataFrame =
    epochOrder(seqs, epoch, salt, id)
      .where(col("epoch_key") > lit(lastKey) ||
        (col("epoch_key") === lit(lastKey) && id > lit(lastId)))

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
  /** The distributed-prefix scaffold shared by [[tokenShards]] and
    * [[packBins]]: range-partition by `sortCols`, pin partitions with a
    * localCheckpoint (so the per-partition totals job and the final job
    * see identical pids/boundaries), aggregate `perPid` per partition,
    * and return the pinned frame plus a column mapping each row's pid
    * to the sum of EARLIER partitions' totals — nParts driver rows of
    * index metadata, never a single-partition window.
    */
  private def rangedWithOffsets(df: DataFrame, numParts: Int,
      sortCols: Seq[Column], perPid: Column): (DataFrame, Column) = {
    val ranged = df
      .repartitionByRange(numParts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("pid", spark_partition_id())
      .localCheckpoint()
    val totals = ranged.groupBy(col("pid"))
      .agg(perPid.as("t"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .sortBy(_._1)
    val offByPid = totals.zip(
      totals.scanLeft(0L) { case (acc, (_, t)) => acc + t })
      .map { case ((pid, _), off) => pid -> off }.toMap
    (ranged, element_at(typedLit(offByPid), col("pid")).cast("long"))
  }

  def tokenShards(docs: DataFrame, budget: Long,
      numParts: Int = 32,
      tokens: Column = TextAnalysis.tokenCount(col("text"))): DataFrame = {
    require(budget > 0, "budget must be positive")
    // `tokens` is the per-doc budget unit — default whitespace words;
    // pass a MODEL count (e.g. size(Bpe.encode(...).subwords)) to cut
    // shards in the tokens a training run actually consumes
    val toks = docs.select(col("doc_id"), tokens.as("n_tokens"))
    val (ranged, offCol) = rangedWithOffsets(toks, numParts,
      Seq(col("doc_id")), sum(col("n_tokens")))
    val w = Window.partitionBy(col("pid")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    ranged
      .withColumn("cum_prev",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)) + offCol)
      .withColumn("shard_id",
        floor(col("cum_prev") / lit(budget.toDouble)))
      .select(col("doc_id"), col("n_tokens"), col("shard_id"))
  }

  /** Balanced token packing: assign documents to `nBins` bins with
    * near-equal total token load — the pack-the-batch step before
    * assembling fixed-budget training sequences (distinct from
    * [[tokenShards]], which cuts CONSECUTIVE docs into budget-sized
    * shards; here bins are balanced, order is free). Greedy serpentine
    * over the global descending-token rank: rank r →
    * `r mod 2B < B ? r mod B : B-1-(r mod B)`, the deterministic
    * SQL-expressible cousin of longest-processing-time scheduling —
    * per full serpentine pass every bin receives exactly one doc from
    * each direction, so bin loads differ by at most one document's
    * tokens per boundary effect (PropertySpec bounds the spread by the
    * largest document).
    *
    * Scale design: the global rank is the [[tokenShards]] distributed
    * prefix machinery — range-partition by (tokens desc, id), rank
    * within partitions, add per-partition count offsets (driver rows =
    * partition metadata). No global single-partition window.
    */
  def packBins(docs: DataFrame, nBins: Int,
      numParts: Int = 32,
      tokens: Column = TextAnalysis.tokenCount(col("text"))): DataFrame = {
    require(nBins > 0, "nBins must be positive")
    // same pluggable budget unit as [[tokenShards]]
    val toks = docs.select(col("doc_id"), tokens.as("n_tokens"))
    val (ranged, offCol) = rangedWithOffsets(toks, numParts,
      Seq(col("n_tokens").desc, col("doc_id").asc), count(lit(1)))
    val w = Window.partitionBy(col("pid"))
      .orderBy(col("n_tokens").desc, col("doc_id").asc)
    val rank0 = row_number().over(w).cast("long") - 1L + offCol
    val m = pmod(rank0, lit(2L * nBins))
    ranged.select(col("doc_id"), col("n_tokens"),
      when(m < nBins, m).otherwise(lit(2L * nBins) - 1L - m)
        .cast("long").as("bin"))
  }

  /** CCNet's head/middle/tail corpus split (Wenzek et al., "CCNet:
    * Extracting High Quality Monolingual Datasets from Web Crawl
    * Data", arXiv:1911.00359 §4.3: the corpus is cut into equal parts
    * by LM score and the highest-quality part trains the best models):
    * bucket documents 0..nBuckets−1 by the GLOBAL rank of a quality
    * score (descending, NULLS LAST — zero-token docs land in the tail;
    * ties break by doc_id, so the split is fully deterministic), with
    * `bucket = (rank0 · nBuckets) div N` — bucket sizes equal within
    * one. Feed it [[TextAnalysis.lmScore]]'s `avg_logp` (bucket 0 =
    * head = highest mean log-prob = lowest perplexity).
    *
    * Scale: the global rank is the [[tokenShards]]/[[packBins]]
    * distributed range-partition machinery — rank within range
    * partitions plus driver-side per-partition offsets, never a
    * single-partition window; N is one count aggregate broadcast back
    * as a column, and the bucket arithmetic is exact integer division.
    */
  def scoreBuckets(scored: DataFrame, score: String = "avg_logp",
      nBuckets: Int = 3, numParts: Int = 32): DataFrame = {
    require(nBuckets > 0, "nBuckets must be positive")
    val base = scored.select(col("doc_id"), col(score))
    val sortCols = Seq(col(score).desc_nulls_last, col("doc_id").asc)
    val (ranged, offCol) = rangedWithOffsets(base, numParts, sortCols,
      count(lit(1)))
    val w = Window.partitionBy(col("pid")).orderBy(sortCols: _*)
    val rank0 = row_number().over(w).cast("long") - 1L + offCol
    ranged
      .withColumn("__rank0", rank0)
      .crossJoin(broadcast(base.agg(count(lit(1)).as("__n"))))
      // `div` = exact integer division — no floor-of-double boundary
      .select(col("doc_id"), col(score),
        expr(s"(__rank0 * $nBuckets) div __n").as("bucket"))
  }

  /** GPT-3-style quality-weighted stochastic ACCEPTANCE (Brown et
    * al., arXiv:2005.14165 Appendix A: a document is kept when
    * `np.random.pareto(alpha) > 1 - score`, α = 9 — high scores are
    * kept near-always while low-scoring docs still survive at the
    * Pareto tail rate, so the filtered corpus keeps tail diversity
    * instead of applying a hard score cutoff). Deterministic portable
    * form of the paper's RNG draw: the Pareto variate is inverse-CDF'd
    * from the salted [[mixedHash]] tick — u = (tick + 0.5)/10000
    * (half-tick centering keeps u strictly inside (0,1) so the inverse
    * CDF is finite), draw = (1−u)^(−1/α) − 1, ROUNDED to 6 decimals
    * before the comparison ([[temperatureRates]]' discipline: pow is
    * the one non-correctly-rounded op in the chain, and the rounding
    * makes the keep/drop verdict engine-portable). Kept ⇔
    * draw > 1 − score.
    *
    * Map-only (a projection + filter, no RNG state, no sampling pass);
    * membership is a pure function of (id, salt, score) — re-runnable,
    * auditable, re-drawable by salt, monotone in score for a fixed id
    * (raising a doc's score can only keep it). NULL ids tick 0 (the
    * [[stratifiedSample]] rule); a NULL score never keeps.
    */
  def paretoAccept(scored: DataFrame,
      score: Column = col("quality_prob"), alpha: Double = 9.0,
      salt: String = "pareto1",
      id: Column = col("doc_id")): DataFrame = {
    require(alpha > 0, "alpha must be positive")
    val tick = coalesce(pmod(mixedHash(id, salt), lit(10000L)), lit(0L))
    val u = (tick.cast("double") + lit(0.5)) / lit(10000.0)
    val draw = round(pow(lit(1.0) - u, lit(-1.0 / alpha)) - lit(1.0), 6)
    scored.where(draw > lit(1.0) - score)
  }

  /** Quality-weighted sampling WITHOUT replacement (Efraimidis &
    * Spirakis, "Weighted random sampling with a reservoir", IPL 2006):
    * rank rows by key = ln(u)/w — the A-ES key u^(1/w) through the
    * order-preserving ln(·)/w transform — and keep the global top `k`,
    * so each row's inclusion odds are proportional to its weight (the
    * quality-weighted subsample step of corpus assembly). `u` ∈ (0, 1)
    * is deterministic: [[mixedHash]] (whose Lehmer step exists for
    * exactly this magnitude-ordered use) shifted by 0.5 over the hash
    * modulus — the sample is a pure function of the data, re-runnable,
    * auditable, re-drawable by salt, and reproducible by any engine
    * folding the same hash. ln/w beats pow(u, 1/w) for that
    * reproducibility: ONE libm call on a hash-derived operand, then
    * IEEE-exact division and comparison.
    *
    * Rows with NULL id or weight ≤ 0 are never sampled (w → 0 drives
    * the A-ES key to −∞; negative weights are meaningless) — they are
    * filtered, not errors, so a quality score of 0 composes naturally.
    *
    * Scale: the key is a map-only projection and the global top-k plans
    * as TakeOrderedAndProject — a bounded per-partition heap and a
    * k·numPartitions driver merge, never a global sort and never a
    * single-partition window (PlanSpec-pinned). `k` must therefore be
    * driver-merge-sized: samples and eval slices, not corpus partitions.
    */
  def weightedSample(df: DataFrame, k: Int, weight: Column,
      id: Column = col("doc_id"), salt: String = "ws1"): DataFrame = {
    require(k > 0, "k must be positive")
    val u = (mixedHash(id, salt).cast("double") + lit(0.5)) /
      lit(1000000007.0)
    // NaN > 0 is TRUE in Spark's ordering and NaN sorts above every
    // finite key — without the isnan guard a NaN weight (0.0/0.0 from
    // an upstream score) would deterministically steal a sample slot
    df.where(id.isNotNull && weight.cast("double") > 0 &&
        !isnan(weight.cast("double")))
      .withColumn("__wskey", log(u) / weight.cast("double"))
      .orderBy(col("__wskey").desc, id.asc)
      .limit(k)
      .drop("__wskey")
  }

  /** Per-domain keep rates for TEMPERATURE-flattened data mixing — the
    * "sample domain d ∝ count_d^α" step of multi-source corpus assembly
    * (the multilingual/multi-domain flattening rule popularized by
    * mT5/XLM-R-style training mixes). [[stratifiedSample]] takes the
    * mix as OPERATOR-chosen fractions; here the fractions are DERIVED
    * from the corpus itself: with per-domain counts c_d, the target
    * distribution ∝ c_d^α is reached by pure downsampling with
    *
    *   rate_d = (c_min / c_d)^(1−α)
    *
    * — the unique rate vector that hits the target while keeping the
    * best-kept domain (the smallest, for α < 1) at rate 1.0, i.e.
    * maximal data retention with no upsampling. α = 1 keeps everything
    * (rates 1.0, the no-op mix); α = 0 equalizes (every domain
    * downsampled to ~c_min); between, rarer domains are favored
    * smoothly. Upsampling (α > 1 semantics, duplicating rows) is
    * deliberately out of scope: repeats are an epoch-schedule concern,
    * not a corpus-membership one.
    *
    * Returns one row per domain: `(domain, n_docs, rate, threshold)`
    * where `threshold = round(rate·10000)` is the tick cut actually
    * applied by [[temperatureMix]] — rate is rounded to 6 decimals
    * first (the [[TextAnalysis.lmScore]] engine-portability discipline:
    * `pow` is the one non-correctly-rounded IEEE op in the chain, and
    * the rounding absorbs a last-ulp disagreement between engines).
    *
    * Scale: one aggregate over the corpus (map-side partial → #domains
    * rows), then a #domains-row global window for c_min — domain
    * metadata, like centroids, never corpus-sized.
    */
  def temperatureRates(df: DataFrame, domain: Column,
      alpha: Double = 0.5): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, "alpha must be in [0, 1]")
    val counts = df.groupBy(domain.as("domain"))
      .agg(count(lit(1)).as("n_docs"))
    val cmin = min(col("n_docs")).over(Window.partitionBy())
    counts
      .withColumn("rate",
        round(pow(cmin.cast("double") / col("n_docs").cast("double"),
          lit(1.0 - alpha)), 6))
      .withColumn("threshold",
        round(col("rate") * lit(10000)).cast("long"))
  }

  /** Temperature-flattened domain mixing: keep each row of `df` iff its
    * [[mixedHash]] tick clears its domain's [[temperatureRates]]
    * threshold — the data-derived analogue of [[stratifiedSample]],
    * same salt-prefixed portable variate, same 1/10000 resolution, so
    * membership is deterministic, engine-reproducible, and re-mixable
    * by salt without touching the data.
    *
    * Scale: TWO corpus passes by necessity (the rates are a function
    * of the full per-domain counts): the counts aggregate, then a
    * map-only filter under a BROADCAST join against the #domains-row
    * rate table — the corpus itself never shuffles. NULL ids tick 0
    * (ride with any non-zero rate, the [[stratifiedSample]] rule);
    * NULL domains match their own rate row (null-safe join key).
    */
  def temperatureMix(df: DataFrame, domain: Column,
      alpha: Double = 0.5, id: Column = col("doc_id"),
      salt: String = "mix1"): DataFrame = {
    val rates = temperatureRates(df, domain, alpha)
      .select(col("domain").as("__dom"), col("threshold").as("__thr"))
    val tick = coalesce(pmod(mixedHash(id, salt), lit(10000L)), lit(0L))
    df.join(broadcast(rates), domain <=> col("__dom"))
      .where(tick < col("__thr"))
      .drop("__dom", "__thr")
  }

  /** GPT-style pretraining sequence-packing MANIFEST: concatenate the
    * corpus in doc_id order and cut fixed `seqLen`-token training
    * sequences across document boundaries (the "pack documents
    * end-to-end, split at the sequence boundary" assembly every
    * GPT/T5-style pretraining run performs) — WITHOUT materializing a
    * single token. Returns one row per (sequence, document) span:
    *
    *   (seq_id, doc_id, doc_from, seq_from, n_tokens)
    *
    * — doc d contributes its tokens [doc_from, doc_from+n_tokens) at
    * position seq_from of sequence seq_id. Every sequence's spans sum
    * to exactly seqLen (the last may be short); every doc's spans
    * partition [0, its token count); zero-token docs contribute
    * nothing. A training loader joins the manifest back to the text
    * (or subword) column and slices — the engine ships the integer
    * plan, not a token explosion.
    *
    * `tokens` is the pluggable budget unit ([[tokenShards]]'s knob) —
    * pass a BPE count to pack in model tokens.
    *
    * Scale: the global offsets are the [[tokenShards]] distributed
    * prefix-sum machinery (range partition + per-partition window +
    * driver offsets — never a single-partition window); the explode
    * emits docs + boundary-crossings rows (≤ docs + total/seqLen),
    * manifest-sized, not token-sized. Offset arithmetic is exact
    * integer `div`, no doubles anywhere.
    */
  def packSequences(docs: DataFrame, seqLen: Long, numParts: Int = 32,
      tokens: Column = TextAnalysis.tokenCount(col("text"))): DataFrame = {
    require(seqLen > 0, s"seqLen must be > 0, got $seqLen")
    val toks = docs.select(col("doc_id"),
      tokens.cast("long").as("n_tokens"))
    val (ranged, offCol) = rangedWithOffsets(toks, numParts,
      Seq(col("doc_id")), sum(col("n_tokens")))
    val w = Window.partitionBy(col("pid")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    ranged
      .withColumn("cum_prev",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)) + offCol)
      .where(col("n_tokens") > 0)
      .withColumn("seq_id", explode(sequence(
        expr(s"cum_prev div $seqLen"),
        expr(s"(cum_prev + n_tokens - 1) div $seqLen"))))
      .withColumn("start",
        greatest(col("cum_prev"), col("seq_id") * seqLen))
      .withColumn("stop",
        least(col("cum_prev") + col("n_tokens"),
          (col("seq_id") + 1) * seqLen))
      .select(col("seq_id"), col("doc_id"),
        (col("start") - col("cum_prev")).as("doc_from"),
        (col("start") - col("seq_id") * seqLen).as("seq_from"),
        (col("stop") - col("start")).as("n_tokens"))
  }

  /** Materialize the [[packSequences]] manifest into the TRAINING
    * ARTIFACT itself: per-sequence token-ID arrays of exactly `seqLen`
    * ids (the trailing sequence short), encoded under a complete
    * [[Bpe.BpeModel]] — train → encode → pack → read, closed end to
    * end. The manifest remains the planning shape (spans ∝ docs +
    * boundary crossings); this is the repo's one deliberately
    * TOKEN-SIZED output: its rows ARE what a training run reads, so
    * the Σ-tokens shuffle is the artifact's own size, not overhead.
    *
    * Shape: ids encode map-only ONCE (barrier'd — the frame feeds
    * both the manifest's distributed prefix sum and the gather join),
    * spans join their docs' arrays on doc_id, each span slices its
    * piece, and one groupBy(seq_id) flattens the pieces in seq_from
    * order. The id unit and the span unit can never disagree: the
    * manifest is computed over `size(ids)` of the same encoded frame
    * it gathers from.
    */
  /** @param eosId when set, every document's id stream gains ONE
    *              trailing end-of-document separator id (the GPT
    *              `<|endoftext|>` convention) BEFORE packing, so no
    *              sequence ever splices two documents without the
    *              boundary token and next-token training never
    *              predicts across a document edge unmarked. The id
    *              must live OUTSIDE the model's vocabulary (ids 1..V;
    *              0 is OOV) — [[Bpe.eosIdOf]] returns the V+1
    *              convention. Output also carries `spans`
    *              (array&lt;struct&lt;doc_id, seq_from, n_tokens&gt;&gt;,
    *              seq_from-ordered): the per-sequence document
    *              boundaries a block-diagonal attention mask needs —
    *              carried ALWAYS (eos or not), derived from the same
    *              rows as the ids, so the two can never disagree.
    */
  def materializeSequences(docs: DataFrame, model: Bpe.BpeModel,
      seqLen: Long, numParts: Int = 0,
      text: Column = col("text"),
      eosId: Option[Int] = None): DataFrame = {
    // numParts 0 = artifact-scaled: threaded to [[packIdStreams]],
    // whose sizing aggregate runs on the already-barriered encoded
    // frame — the encode never re-runs for sizing
    require(seqLen > 0, s"seqLen must be > 0, got $seqLen")
    eosId.foreach { e =>
      val v = graft.functions.BpeEncodeExpr
        .vocabIds(model.alphabet, model.merges).size
      require(e < 0 || e > v,
        s"eosId $e collides with the model's id space [0..$v] " +
          s"(0 = OOV, 1..$v = vocabulary) — use Bpe.eosIdOf (${v + 1})")
    }
    val rawIds = graft.functions.native.bpe_encode_ids(
      Bpe.bpeTokens(text), model.alphabet, model.merges)
    packIdStreams(
      docs.select(col("doc_id"),
        eosId.fold(rawIds)(e => concat(rawIds, array(lit(e))))
          .as("ids")),
      seqLen, numParts)
  }

  /** The pack half of [[materializeSequences]], factored at the id
    * level: cut per-document id STREAMS (`(doc_id, ids)` — eos, when
    * wanted, already appended by the caller) into fixed `seqLen`-id
    * sequences in doc_id order, emitting the same
    * `(seq_id, ids, spans, n_ids)` artifact shape. The id-level seam
    * exists for consumers whose streams do NOT come from a fresh
    * encode: [[graft.Pipeline.compactTrainingShards]] re-cuts the id
    * streams [[reconstructDocs]] reassembles from standing packs —
    * re-packing without re-encoding, so compaction never needs the
    * model and can never drift the id space. Identity property
    * (PropertySpec): packIdStreams ∘ reconstructDocs over one pack's
    * own geometry reproduces a densely-packed equivalent bit-for-bit.
    *
    * `numParts` defaults to 0 = ARTIFACT-SCALED via the shared
    * [[epochPartitions]] rule over Σ size(ids) (one aggregate on the
    * already-barriered input — the arrays themselves stay put), so a
    * direct API caller re-cutting a large id stream gets ~128 MB-of-
    * ids pack tasks, not a fixed 32 multi-GB ones; pass an explicit
    * count to override (compaction passes its runs' metadata sums —
    * already on the driver — so its reconstructions never re-run for
    * sizing).
    */
  def packIdStreams(docIds: DataFrame, seqLen: Long,
      numParts: Int = 0): DataFrame = {
    require(seqLen > 0, s"seqLen must be > 0, got $seqLen")
    val withIds = Barriers.barrier(
      docIds.select(col("doc_id"), col("ids")))
    val parts =
      if (numParts > 0) numParts
      else epochPartitions(
        withIds.agg(coalesce(sum(size(col("ids")).cast("long")),
          lit(0L))).head().getLong(0))
    packSequences(withIds, seqLen, parts,
        tokens = size(col("ids")))
      .join(withIds, Seq("doc_id"))
      .select(col("seq_id"), col("seq_from"), col("doc_id"),
        col("n_tokens"),
        slice(col("ids"), (col("doc_from") + 1).cast("int"),
          col("n_tokens").cast("int")).as("piece"))
      .groupBy(col("seq_id"))
      // the seq_from sort runs ONCE, inside the aggregate's result
      // projection: the downstream select references the Aggregate's
      // OUTPUT attribute, which no projection collapse can re-inline —
      // deriving ids and spans from two array_sort(parts) copies in one
      // select would lean on codegen subexpression elimination to avoid
      // sorting the piece-bearing structs twice per sequence
      .agg(array_sort(collect_list(struct(col("seq_from"),
        col("doc_id"), col("n_tokens"), col("piece")))).as("sorted"))
      .select(col("seq_id"),
        expr("flatten(transform(sorted, x -> x.piece))").as("ids"),
        expr("transform(sorted, x -> struct(" +
          "x.doc_id AS doc_id, x.seq_from AS seq_from, " +
          "x.n_tokens AS n_tokens))").as("spans"),
        // = size(ids): every piece is exactly n_tokens long (the slice
        // bounds come from the manifest's partition of the doc's ids)
        expr("cast(aggregate(sorted, 0L, (a, x) -> a + x.n_tokens) " +
          "as int)").as("n_ids"))
  }

  /** Reassemble the per-DOCUMENT id streams from a packed-sequence
    * artifact — the inverse of [[materializeSequences]], and the first
    * tool an audit reaches for on a suspicious shard or after a
    * retraction repair ("does this artifact still decode to my
    * corpus?"): each sequence's `spans` name exactly which doc
    * contributed which slice of its `ids`, so slicing every span's
    * piece and regrouping by doc reproduces each document's id stream
    * bit-for-bit — across pack boundaries and mid-doc cuts (a doc cut
    * across sequences reassembles from its (seq_id, seq_from)-ordered
    * pieces; docs never splice across packs, so the order is total).
    * Returns `(doc_id, ids)`; with `eosId` set, one trailing
    * end-of-document separator is stripped per doc (conditionally —
    * a damaged stream missing it is returned as-is, for the audit to
    * see, never mis-sliced).
    *
    * Scale: the spans explode emits span-count rows (docs + boundary
    * crossings — manifest-sized), each carrying its piece (token-sized
    * in aggregate: the artifact's own bulk, the one deliberately
    * token-sized path here); ONE groupBy(doc_id) shuffle reassembles —
    * ∝ the slice of the artifact actually read, so auditing one pack
    * or one doc range prunes to exactly those packs' files.
    */
  def reconstructDocs(seqs: DataFrame,
      eosId: Option[Int] = None): DataFrame = {
    val assembled = seqs
      .select(col("seq_id"), col("ids"), explode(col("spans")).as("sp"))
      .select(col("sp.doc_id").as("doc_id"),
        struct(col("seq_id"), col("sp.seq_from").as("seq_from"),
          slice(col("ids"), (col("sp.seq_from") + lit(1)).cast("int"),
            col("sp.n_tokens").cast("int")).as("piece")).as("ps"))
      .groupBy(col("doc_id"))
      // the (seq_id, seq_from) sort runs once inside the aggregate's
      // result projection — the [[materializeSequences]] discipline
      .agg(array_sort(collect_list(col("ps"))).as("ps"))
      .select(col("doc_id"),
        expr("flatten(transform(ps, x -> x.piece))").as("ids"))
    eosId.fold(assembled)(e => assembled.select(col("doc_id"),
      when(element_at(col("ids"), -1) === lit(e),
          expr("slice(ids, 1, size(ids) - 1)"))
        .otherwise(col("ids")).as("ids")))
  }

  // ------------------------------------- DSIR importance resampling

  /** Hashed bag-of-ngrams feature stream for DSIR (Xie et al., "Data
    * Selection for Language Models via Importance Resampling",
    * arXiv:2302.03169 §3: unigrams + bigrams of the lowercased
    * whitespace tokenization, hashed into `buckets` feature buckets):
    * one bucket element per token and per adjacent token pair. The
    * hash is the repo's engine-portable rolling-hash + Lehmer mix over
    * the NGRAM text (no salt — the feature space is part of the model,
    * not a redraw knob), computed by the one-pass native kernel
    * [[graft.functions.NgramBucketsExpr]]: bit-identical to hashing
    * the joined ngram strings, without materializing them (the
    * built-in HOF formulation measured ~5x slower at sf0.1).
    */
  private def dsirBuckets(text: Column, buckets: Int): Column =
    native.ngram_buckets(TextAnalysis.normTokens(text), buckets)

  /** Per-bucket DSIR log importance ratios: fit two add-one-smoothed
    * hashed bag-of-ngrams models — `target` (the distribution you WANT,
    * e.g. a curated high-quality set) and `raw` (the corpus you have) —
    * and return one row per feature bucket with
    *
    *   log_ratio_b = ln((t_b + 1)/(T + B)) − ln((r_b + 1)/(R + B))
    *
    * (t_b/r_b = the bucket's ngram count in target/raw, T/R = total
    * ngrams, B = `buckets`), 6-decimal rounded under the
    * [[TextAnalysis.lmScore]] engine-portability discipline. The domain
    * is COMPLETE — all B buckets, absent ones at the pure smoothing
    * ratio — so a document's score never depends on which buckets
    * happened to be observed.
    *
    * Scale: two token-stream count aggregates (shuffle ∝ corpus
    * ngrams collapsing map-side to ≤ B rows each) joined onto a
    * B-row range — the weight table is model-sized (B ≤ ~10⁵ rows),
    * broadcastable, persistable, and inspectable like the
    * [[QualityClassifier]] weights.
    */
  def dsirWeights(target: DataFrame, raw: DataFrame,
      buckets: Int = 10000, text: Column = col("text")): DataFrame = {
    require(buckets > 0, s"buckets must be > 0, got $buckets")
    // barrier'd: each count table is referenced TWICE downstream (the
    // bucket join and its own total) — without the materialization the
    // corpus-scale ngram explode behind it would run twice per corpus
    // (measured 2x on q123/q124 at sf0.1); the materialized tables are
    // ≤ B rows each
    def bucketCounts(df: DataFrame, name: String) =
      Barriers.barrier(
        df.select(explode(dsirBuckets(text, buckets)).as("bucket"))
          .groupBy(col("bucket")).agg(count(lit(1)).as(name)))
    val t = bucketCounts(target, "tc")
    val r = bucketCounts(raw, "rc")
    val totals = t.agg(coalesce(sum(col("tc")), lit(0L)).as("tt"))
      .crossJoin(r.agg(coalesce(sum(col("rc")), lit(0L)).as("rt")))
    target.sparkSession.range(buckets)
      .select(col("id").cast("int").as("bucket"))
      .join(t, Seq("bucket"), "left")
      .join(r, Seq("bucket"), "left")
      .crossJoin(broadcast(totals))
      .select(col("bucket"),
        round(
          log((coalesce(col("tc"), lit(0L)) + 1).cast("double") /
            (col("tt") + buckets).cast("double")) -
          log((coalesce(col("rc"), lit(0L)) + 1).cast("double") /
            (col("rt") + buckets).cast("double")), 6).as("log_ratio"))
  }

  /** Per-document DSIR log importance weight: the bag-of-ngrams
    * log-likelihood ratio Σ_b c_b(x)·log_ratio_b — the quantity DSIR
    * resamples by. Returns (doc_id, n_ngrams, log_weight) for EVERY
    * input document (ngram-free docs report (0, 0.0) — completeness,
    * the [[QualityClassifier.score]] rule), log_weight 6-decimal
    * rounded: each doc's ngrams live in one partition (explode of one
    * row), so the per-doc partial sum folds in text order and the
    * rounding is deterministic — the [[TextAnalysis.lmScore]] argument.
    *
    * Scale: one map-side explode joined to the BROADCAST B-row weight
    * table, then one per-doc aggregate collapsing map-side — the
    * q48/q104 cost class, shuffle ∝ corpus ngrams, never all-pairs.
    */
  def dsirScore(docs: DataFrame, weights: DataFrame,
      buckets: Int = 10000, text: Column = col("text")): DataFrame =
    docs.select(col("doc_id"),
        explode_outer(dsirBuckets(text, buckets)).as("bucket"))
      .join(broadcast(weights), Seq("bucket"), "left")
      .groupBy(col("doc_id"))
      .agg(count(col("bucket")).as("n_ngrams"),
        round(sum(coalesce(col("log_ratio"), lit(0.0))), 6)
          .as("log_weight"))

  /** Persist a fitted DSIR weight table under `dir` — the
    * [[QualityClassifier.writeModel]] discipline: `ratios/` (bucket,
    * log_ratio — the COMPLETE B-row domain) written first, ONE
    * `params/` row (n_buckets, family) LAST, so a crashed write is a
    * params-less dir every reader refuses. */
  def writeDsirModel(spark: SparkSession, weights: DataFrame,
      buckets: Int, dir: String): Unit = {
    import org.apache.hadoop.fs.Path
    import spark.implicits._
    val fs = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // materialize AND validate before touching the standing model: the
    // count() below runs the full two-pass fit, and deleting params/
    // first would turn a refused (wrong-buckets) or failed fit into a
    // destroyed previously-healthy model — and a refusal window during
    // which every per-trigger scoreStreamDsir re-read dies
    val mat = Barriers.barrier(
      weights.select(col("bucket"), col("log_ratio")))
    val n = mat.count()
    require(n == buckets.toLong,
      s"writeDsirModel: weight table has $n rows, expected the " +
        s"complete $buckets-bucket domain (dsirWeights' contract)")
    if (fs.exists(new Path(s"$dir/params")))
      fs.delete(new Path(s"$dir/params"), true)
    mat.coalesce(1).write.mode("overwrite").parquet(s"$dir/ratios")
    Seq((buckets.toLong, "dsir_ratios")).toDF("n_buckets", "family")
      .coalesce(1).write.parquet(s"$dir/params")
  }

  /** Read a persisted DSIR model back: (weights, buckets). Refuses a
    * params-less dir (crashed write) and an incomplete bucket domain
    * (corruption [[dsirScore]] would silently mis-score under). */
  def readDsirModel(spark: SparkSession,
      dir: String): (DataFrame, Int) = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(new Path(s"$dir/params")),
      s"$dir has no params/ — not a written DSIR model (or its write " +
        "crashed before the params commit); re-run writeDsirModel")
    val buckets = spark.read.parquet(s"$dir/params").head()
      .getAs[Long]("n_buckets").toInt
    val w = spark.read.parquet(s"$dir/ratios")
    val n = w.count()
    require(n == buckets.toLong,
      s"$dir/ratios holds $n rows, params say $buckets — refusing to " +
        "score under an incomplete bucket domain; re-run writeDsirModel")
    (w, buckets)
  }

  /** DSIR selection: resample `k` documents WITHOUT replacement with
    * inclusion odds ∝ exp(log_weight) via Gumbel top-k — key =
    * log_weight − ln(−ln(u)) stays in the log domain, so a large
    * corpus/target likelihood gap cannot overflow the way
    * exp(log_weight) through [[weightedSample]]'s A-ES key would. `u`
    * is the deterministic salted 1/10000 tick ([[paretoAccept]]'s
    * variate, NOT the raw hash over the modulus: the rolling hash is
    * affine in an id's trailing digit, so h/p orders ADJACENT ids
    * monotonically and a salt change shifts them uniformly — the
    * mod-10000 step decorrelates both). The sample is a pure function
    * of (data, salt), re-runnable and engine-portable; the key is
    * 6-decimal rounded with doc_id as the total tie-break.
    * Returns the selected (doc_id, n_ngrams, log_weight, dsir_key) —
    * metadata-sized; join back to the corpus for the rows.
    *
    * Scale: [[dsirWeights]] + [[dsirScore]] passes, then a bounded
    * global top-k (TakeOrdered — per-partition heaps, k·partitions
    * driver merge, never a global sort). `k` is sample-sized by
    * construction, the [[weightedSample]] contract.
    */
  def dsirResample(docs: DataFrame, target: DataFrame, k: Int,
      buckets: Int = 10000, salt: String = "dsir1",
      text: Column = col("text")): DataFrame = {
    require(k > 0, "k must be positive")
    val scored = dsirScore(docs, dsirWeights(target, docs, buckets, text),
      buckets, text)
    val tick = pmod(mixedHash(col("doc_id"), salt), lit(10000L))
    val u = (tick.cast("double") + lit(0.5)) / lit(10000.0)
    scored.where(col("doc_id").isNotNull)
      .withColumn("dsir_key",
        round(col("log_weight") - log(-log(u)), 6))
      .orderBy(col("dsir_key").desc, col("doc_id").asc)
      .limit(k)
  }
}
