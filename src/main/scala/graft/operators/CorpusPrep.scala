package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed corpus-preparation pipeline a training-data user
  * actually runs — quality screen → decontamination → near-dup removal
  * → data-mixing sample → balanced packing — as ONE DataFrame, so the
  * whole run is a single Spark job graph instead of five materialized
  * intermediate tables.
  *
  * Composition is where pipelines silently go quadratic: each stage
  * here is the PASS-THROUGH form of its operator, so no stage joins
  * its verdict back to the corpus —
  *  - the quality screen is a pure filter Column
  *    ([[TextAnalysis.gopherKeep]]),
  *  - the decontamination screen appends its columns map-only
  *    ([[Dedup.withContamination]]),
  *  - the sample is a salted-hash filter ([[Sharding.stratifiedSample]]).
  * The only shuffles in the whole composition are the ones the dedup
  * edge set and the packing rank own (PlanSpec pins the screen front
  * at ZERO shuffle exchanges).
  */
object CorpusPrep {

  /** The map-only screen front: Gopher keep filter, then contamination
    * filter against `benchmark`. All corpus columns pass through; zero
    * shuffles, one broadcast of the benchmark shingle array.
    *
    * The explode-of-one-element-array between the contamination
    * columns and the frac filter is an OPTIMIZATION FENCE, not data
    * flow: without it Catalyst pushes the filter into the broadcast
    * join's condition, inlining the shingle-hash kernel subtree ~3×
    * per corpus row (size twice, intersect once — join conditions get
    * no subexpression elimination; measured in the executed plan).
    * Filters cannot push through a Generate whose output they
    * reference, so the kernel is evaluated ONCE per row in the
    * generator input and the filter reads the computed field
    * (PlanSpec pins the corpus branch at one kernel occurrence). The
    * fence stays map-only — one Generate of a one-element array per
    * row, no shuffle, no materialization.
    */
  def screen(docs: DataFrame, benchmark: DataFrame,
      minWords: Long = 50L, maxWords: Long = 100000L,
      minStopHits: Long = 2L, maxContamination: Double = 0.2,
      numShingleWords: Int = 3): DataFrame = {
    val keep = docs.columns
    Dedup.withContamination(
        docs.where(TextAnalysis.gopherKeep(col("text"), minWords,
          maxWords, minStopHits)),
        benchmark, numShingleWords)
      .select(explode(array(struct(
        // getField-free construction but getField-based extraction:
        // dotted/special caller column names must survive the fence
        // (embedded backticks are doubled per the quoting rules)
        struct(keep.map(c =>
          col(s"`${c.replace("`", "``")}`").as(c)): _*).as("__row"),
        col("contaminated_frac").as("__frac")))).as("__e"))
      .where(col("__e").getField("__frac") <= maxContamination)
      .select(keep.map(c =>
        col("__e").getField("__row").getField(c).as(c)): _*)
  }

  /** The full pipeline. `pairs` generates the near-dup edge set over
    * the screened corpus — [[Dedup.nearDupPairs]] (MinHash+LSH) is the
    * production default; the oracle entry passes
    * [[Dedup.jaccardAllPairs]] so an external engine can rebuild the
    * identical fixpoint. Returns (doc_id, n_tokens, bin): the packed,
    * sampled, deduplicated, screened corpus.
    */
  def prepare(docs: DataFrame, benchmark: DataFrame,
      minWords: Long = 50L, maxWords: Long = 100000L,
      minStopHits: Long = 2L, maxContamination: Double = 0.2,
      pairs: DataFrame => DataFrame = Dedup.nearDupPairs(_),
      maxIter: Int = 10, strategy: String = "labelprop",
      fractions: Map[String, Double] = Map.empty,
      defaultFraction: Double = 1.0, sampleSalt: String = "mix1",
      nBins: Int = 8, numShingleWords: Int = 3): DataFrame = {
    // barrier: the screened corpus feeds the pair generator (both
    // sides of its self-join), the verify pass, AND the final
    // anti-join — without it each consumer re-runs the regex/shingle
    // screen over the full corpus (2-4 redundant scans at scale)
    val screened = Barriers.barrier(
      screen(docs, benchmark, minWords, maxWords, minStopHits,
        maxContamination, numShingleWords))
    val deduped = Dedup.dedupByClusters(screened, pairs(screened),
      maxIter, strategy)
    val sampled = Sharding.stratifiedSample(deduped,
      strata = col("lang"), fractions, defaultFraction,
      salt = sampleSalt)
    Sharding.packBins(sampled, nBins)
  }
}
