package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.native

/** Deduplication operators for a training-data pipeline over the
  * `documents` table (extension tier): exact, MinHash+LSH, SimHash, n-gram
  * Jaccard verification, and embedding-cosine near-dup.
  *
  * Scale design: every near-dup path follows shingle → signature → band →
  * bucket-join. The only join is on band-hash buckets (pairs meet only
  * inside a bucket), so the shuffle is proportional to candidate pairs, not
  * |docs|². No all-pairs cross join anywhere.
  */
object Dedup {

  /** Normalized text used by all fingerprints: lowercase, collapsed
    * whitespace. */
  def normalized(text: Column): Column =
    regexp_replace(lower(text), "\\s+", " ")

  // ---------------------------------------------------------------- exact

  /** Exact dedup: md5-of-normalized-text grouping; canonical row = lowest
    * doc_id in the group. One hash-shuffle on the 128-bit key — the 100 TB
    * path (never a sort, never text-vs-text compare).
    */
  def exactGroups(docs: DataFrame): DataFrame =
    docs
      .groupBy(md5(normalized(col("text"))).as("fingerprint"))
      .agg(
        min(col("doc_id")).as("canonical_id"),
        count(lit(1)).as("n_copies"))

  /** Rows surviving exact dedup (the canonical copy per fingerprint). */
  def exactDedup(docs: DataFrame): DataFrame = {
    val canon = exactGroups(docs).select(col("canonical_id").as("doc_id"))
    docs.join(canon, Seq("doc_id"), "left_semi")
  }

  // ------------------------------------------------------------- shingles

  /** Word n-gram shingles of the normalized text (distinct). */
  def shingles(docs: DataFrame, n: Int = 3): DataFrame = {
    val toks = split(normalized(col("text")), " ")
    docs.select(
      col("doc_id"),
      explode(array_distinct(
        transform(sequence(lit(0), greatest(size(toks) - n, lit(0))),
          i => concat_ws(" ", slice(toks, i + 1, lit(n)))))).as("shingle"))
  }

  // ---------------------------------------------------------- MinHash/LSH

  /** MinHash signatures: `numHashes` permutations h_k(x) = (a_k·x + b_k)
    * mod p over 64-bit shingle hashes (xxhash64), min per doc per
    * permutation. Computed as one groupBy over the exploded shingle table —
    * a single shuffle keyed by doc_id; signature size is numHashes longs.
    */
  def minhashSignatures(docs: DataFrame, numShingleWords: Int = 3,
      numHashes: Int = 32): DataFrame = {
    // p = 2^31 - 1 (Mersenne prime): keeps a·x + b < 2^62, no long overflow
    val p = 2147483647L
    // deterministic per-permutation coefficients (seeded, data-independent)
    val rnd = new scala.util.Random(42)
    val coeffs = Seq.fill(numHashes)(
      (math.abs(rnd.nextLong()) % (p - 1) + 1, math.abs(rnd.nextLong()) % p))
    val base = pmod(xxhash64(col("shingle")), lit(p))
    val mins = coeffs.zipWithIndex.map { case ((a, b), k) =>
      min(pmod(base * lit(a) + lit(b), lit(p))).as(s"mh_$k")
    }
    shingles(docs, numShingleWords)
      .groupBy(col("doc_id"))
      .agg(mins.head, mins.tail: _*)
  }

  /** LSH banding: split the signature into `bands` bands of `rowsPerBand`
    * hashes, hash each band, explode to (band_id, band_hash, doc_id).
    */
  def lshBands(signatures: DataFrame, bands: Int,
      rowsPerBand: Int): DataFrame = {
    val bandCols = (0 until bands).map { b =>
      val slice = (0 until rowsPerBand)
        .map(r => col(s"mh_${b * rowsPerBand + r}"))
      struct(lit(b).as("band_id"),
        xxhash64(slice: _*).as("band_hash"))
    }
    signatures.select(col("doc_id"), explode(array(bandCols: _*)).as("band"))
      .select(col("doc_id"), col("band.band_id"), col("band.band_hash"))
  }

  /** Candidate near-dup pairs: docs sharing any (band_id, band_hash)
    * bucket. Self-join on the bucket key only — the shuffle is keyed by
    * band hash, and the `<` predicate keeps each unordered pair once.
    */
  def minhashCandidates(docs: DataFrame, numShingleWords: Int = 3,
      numHashes: Int = 32, bands: Int = 8): DataFrame = {
    val sigs = minhashSignatures(docs, numShingleWords, numHashes)
    val banded = lshBands(sigs, bands, numHashes / bands)
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b,
        col("a.band_id") === col("b.band_id") &&
        col("a.band_hash") === col("b.band_hash") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
  }

  /** n-gram Jaccard verification of candidate pairs: exact |A∩B|/|A∪B| on
    * shingle sets, computed relationally (shingle-join on candidates), no
    * array materialization per pair.
    */
  def jaccardVerify(docs: DataFrame, candidates: DataFrame,
      numShingleWords: Int = 3, threshold: Double = 0.7): DataFrame = {
    val sh = shingles(docs, numShingleWords)
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))
    val inter = candidates
      .join(sh.toDF("id_a", "shingle"), Seq("id_a"))
      .join(sh.toDF("id_b", "shingle"), Seq("id_b", "shingle"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.select(col("doc_id").as("id_a"),
        col("n_shingles").as("n_a")), Seq("id_a"))
      .join(sizes.select(col("doc_id").as("id_b"),
        col("n_shingles").as("n_b")), Seq("id_b"))
      .withColumn("jaccard",
        col("n_inter") / (col("n_a") + col("n_b") - col("n_inter")))
      .where(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** MinHash+LSH near-dup end-to-end: candidates → exact-Jaccard verify. */
  def nearDupPairs(docs: DataFrame, threshold: Double = 0.7): DataFrame =
    jaccardVerify(docs, minhashCandidates(docs), threshold = threshold)

  // -------------------------------------------------------------- SimHash

  /** 64-bit SimHash over token hashes: per bit, sign of Σ±1 across token
    * xxhash64 bits. Expressed with explode + groupBy — one shuffle keyed by
    * doc_id.
    */
  def simhash(docs: DataFrame): DataFrame = {
    val tok = docs.select(
      col("doc_id"),
      explode(split(normalized(col("text")), " ")).as("token"))
      .where(col("token") =!= "")
      .select(col("doc_id"), xxhash64(col("token")).as("h"))
    val bitSums = (0 until 64).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"bit_$b")
    }
    val agg = tok.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until 64).map { b =>
      when(col(s"bit_$b") > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    agg.select(col("doc_id"), sig.as("simhash"))
  }

  /** SimHash near-dup: pairs within `maxHamming` bits. Bucketed by the four
    * 16-bit quarters of the signature (pigeonhole: distance ≤3 ⇒ some
    * quarter matches exactly), so the join is on quarter buckets, not
    * all-pairs.
    */
  def simhashCandidates(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sigs = simhash(docs)
    val quarters = sigs.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(q => struct(lit(q).as("q"),
        shiftright(col("simhash"), q * 16).bitwiseAND(lit(0xffffL))
          .as("qh"))): _*)).as("quarter"))
      .select(col("doc_id"), col("simhash"),
        col("quarter.q"), col("quarter.qh"))
    val a = quarters.as("a")
    val b = quarters.as("b")
    a.join(b, col("a.q") === col("b.q") && col("a.qh") === col("b.qh") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash")))
          .as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  // --------------------------------------------------- embedding near-dup

  /** Embedding-cosine near-dup: pairs with cosine ≥ threshold, bucketed by
    * random-hyperplane LSH (sign bits of `planes` fixed random projections)
    * so the self-join is on bucket keys. Exact cosine verifies inside each
    * bucket via the native codegen'd dot product.
    */
  def embeddingNearDup(embeddings: DataFrame, dim: Int = 64,
      planes: Int = 8, threshold: Double = 0.95): DataFrame = {
    val rnd = new scala.util.Random(7)
    val planeVecs = Seq.fill(planes)(Array.fill(dim)(rnd.nextGaussian()))
    val bucketBits = planeVecs.zipWithIndex.map { case (v, i) =>
      val proj = native.fvec_dot(col("embedding"),
        typedLit(v.map(_.toFloat).toSeq))
      when(proj >= 0, shiftleft(lit(1), i)).otherwise(lit(0))
    }.reduce((a, b) => a.bitwiseOR(b))
    val bucketed = embeddings.select(col("vec_id"), col("embedding"),
      bucketBits.as("bucket"))
    val a = bucketed.as("a")
    val b = bucketed.as("b")
    a.join(b, col("a.bucket") === col("b.bucket") &&
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        native.fvec_cosine(col("a.embedding"), col("b.embedding"))
          .as("cosine"))
      .where(col("cosine") >= threshold)
  }
}
