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
    */
  def screen(docs: DataFrame, benchmark: DataFrame,
      minWords: Long = 50L, maxWords: Long = 100000L,
      minStopHits: Long = 2L, maxContamination: Double = 0.2,
      numShingleWords: Int = 3): DataFrame =
    Dedup.withContamination(
        docs.where(TextAnalysis.gopherKeep(col("text"), minWords,
          maxWords, minStopHits)),
        benchmark, numShingleWords)
      .where(col("contaminated_frac") <= maxContamination)
      .drop("n_shingles", "n_contaminated", "contaminated_frac")

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
