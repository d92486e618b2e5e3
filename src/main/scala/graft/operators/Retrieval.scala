package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lexical retrieval over the corpus: BM25 top-k — the keyword
  * counterpart of the semantic ANN tier ([[Similarity]]), and a
  * curation primitive in its own right (find the corpus documents
  * matching a probe query, pull exemplars for a target distribution,
  * spot-check what a filter kept). Okapi BM25 with the Lucene-style
  * non-negative idf:
  *
  *   score(q, d) = Σ_t∈q idf(t) · tf(t,d)·(k1+1)
  *                              / (tf(t,d) + k1·(1 − b + b·|d|/avgdl))
  *   idf(t) = ln(1 + (N − df(t) + 0.5)/(df(t) + 0.5))
  *
  * idf is 6-decimal rounded (the [[TextAnalysis.lmScore]] engine-
  * portability discipline: ln is the one non-exact op; every other
  * input is integer counts), and the final score is 6-decimal rounded
  * after the per-(query, doc) sum.
  *
  * Scale shape: two corpus aggregates (per-(doc, token) tf and the
  * (N, avgdl) scalars — shuffle ∝ corpus tokens, collapsing map-side),
  * a document-frequency count RESTRICTED to the query terms (the
  * semi-joined token stream — df is never computed vocabulary-wide),
  * and a candidate join that touches only postings containing a query
  * term (queries broadcast — a query set is metadata-sized). The
  * top-k is a per-query window over candidate rows, hash-partitioned
  * by query — never a global sort; a term shared by every document
  * makes the candidate set corpus-sized, which is the honest cost of
  * querying a stop word (idf → ~0 scores it into noise anyway).
  */
object Retrieval {

  /** BM25 top-k documents per query. `queries` is (query_id, text) —
    * tokenized under the SAME normalization as the corpus side
    * ([[TextAnalysis.tokenStream]]'s lowercase + whitespace collapse),
    * duplicate terms within a query collapse to one (the standard
    * bag-of-WORDS query model; weight repeats by repeating queries if
    * needed). Returns (query_id, doc_id, score, rank), rank 1-based by
    * (score desc, doc_id asc) — fully deterministic.
    */
  def bm25TopK(docs: DataFrame, queries: DataFrame, k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75,
      excludeSelf: Boolean = false): DataFrame = {
    require(k > 0, "k must be positive")
    require(k1 >= 0 && b >= 0 && b <= 1, s"bad BM25 params k1=$k1 b=$b")
    val toks = TextAnalysis.tokenStream(docs)
    // per-(doc, term) tf and per-doc length in ONE aggregate pass
    // each; both shuffle on doc-sized keys and collapse map-side
    val tf = toks.groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val dl = toks.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("dl"))
    // avgdl over ALL docs (zero-token docs included) = Σ tokens / N —
    // one scalar definition both engines can state in one line
    val stats = docs.agg(count(lit(1)).as("n_docs"))
      .crossJoin(toks.agg(count(lit(1)).as("n_tokens")))
      .select(col("n_docs"),
        (col("n_tokens").cast("double") /
          col("n_docs").cast("double")).as("avgdl"))
    val qterms = queries.select(col("query_id"),
        explode(TextAnalysis.normTokens(col("text"))).as("token"))
      .distinct()
    // df restricted to the query terms: the distinct (doc, term)
    // postings semi-join against the broadcast term set, then one
    // small aggregate — never a vocabulary-wide count
    val df = tf.join(broadcast(qterms.select(col("token")).distinct()),
        Seq("token"), "left_semi")
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
    val idf = df.crossJoin(broadcast(stats))
      .select(col("token"),
        round(log(lit(1.0) +
          (col("n_docs").cast("double") - col("df") + lit(0.5)) /
            (col("df").cast("double") + lit(0.5))), 6).as("idf"))
    val candidates = tf
      .join(broadcast(qterms), Seq("token"))
      .join(broadcast(idf), Seq("token"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("doc_id"),
        (col("idf") * col("tf").cast("double") * lit(k1 + 1.0) /
          (col("tf").cast("double") +
            lit(k1) * (lit(1.0 - b) +
              lit(b) * col("dl").cast("double") / col("avgdl"))))
          .as("part"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(round(sum(col("part")), 6).as("score"))
    // excludeSelf: when queries ARE corpus documents (query_id = the
    // probe doc's id — the hybrid/more-like-this shape), drop the
    // trivial self-hit BEFORE ranking so ranks stay gapless
    val pool =
      if (excludeSelf) candidates.where(col("doc_id") =!= col("query_id"))
      else candidates
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id").asc)
    pool
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("score"),
        col("rank").cast("int").as("rank"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher, "Reciprocal
    * Rank Fusion outperforms Condorcet and individual Rank Learning
    * Methods", SIGIR 2009): fuse two rankings of the same query set by
    * `rrf(q, d) = Σ_r 1/(c + rank_r(q, d))` over the rankings that
    * retrieved d, 6-decimal rounded; re-rank by (rrf desc, doc_id
    * asc). The RANKS are the only inputs — the two scores never need a
    * shared scale, which is exactly why RRF is the standard lexical ×
    * semantic fusion. Inputs are (query_id, doc_id, rank) frames;
    * returns (query_id, doc_id, rrf, rank).
    *
    * Scale: candidate-sized all the way — a union of two k·|queries|
    * frames, one aggregate, one per-query window. Nothing touches the
    * corpus.
    */
  def rrfFuse(a: DataFrame, b: DataFrame, k: Int = 10,
      c: Int = 60): DataFrame = {
    require(k > 0 && c >= 0, s"bad RRF params k=$k c=$c")
    val fused = a.select(col("query_id"), col("doc_id"), col("rank"))
      .unionByName(b.select(col("query_id"), col("doc_id"), col("rank")))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(round(sum(lit(1.0) / (lit(c.toDouble) + col("rank"))), 6)
        .as("rrf"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf").desc, col("doc_id").asc)
    fused
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("rrf"),
        col("rank").cast("int").as("rank"))
  }

  /** Hybrid retrieval: probe documents (by id) query the corpus BOTH
    * lexically ([[bm25TopK]] over their text, self-hits excluded) and
    * semantically ([[Similarity.bruteForceTopK]] over their
    * embeddings), fused by [[rrfFuse]]. `kEach` bounds each ranking's
    * candidate pool; the exact-cosine semantic leg is the baseline —
    * swap in the IVF probe for the 100 TB path (the fusion consumes
    * only (query_id, doc_id, rank), so any ranker slots in).
    */
  def hybridTopK(docs: DataFrame, embeddings: DataFrame,
      queryIds: Seq[Long], k: Int = 10, kEach: Int = 20,
      c: Int = 60): DataFrame = {
    require(queryIds.nonEmpty, "need at least one probe id")
    val qd = docs.where(col("doc_id").isin(queryIds: _*))
      .select(col("doc_id").as("query_id"), col("text"))
    val lex = bm25TopK(docs, qd, k = kEach, excludeSelf = true)
    val sem = Similarity.bruteForceTopK(embeddings,
        embeddings.where(col("vec_id").isin(queryIds: _*)), k = kEach)
      .select(col("query_id"), col("vec_id").as("doc_id"), col("rank"))
    rrfFuse(lex.select(col("query_id"), col("doc_id"), col("rank")),
      sem, k, c)
  }
}
