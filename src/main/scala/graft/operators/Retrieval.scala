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


  /** The Lucene-style non-negative idf, 6-decimal rounded — ONE
    * definition for the inline and indexed scorers. */
  private def idfExpr(nDocs: Column, df: Column): Column =
    round(log(lit(1.0) +
      (nDocs.cast("double") - df + lit(0.5)) /
        (df.cast("double") + lit(0.5))), 6)

  /** One query term's BM25 contribution. */
  private def bm25Part(idf: Column, tf: Column, dl: Column,
      avgdl: Column, k1: Double, b: Double): Column =
    idf * tf.cast("double") * lit(k1 + 1.0) /
      (tf.cast("double") +
        lit(k1) * (lit(1.0 - b) + lit(b) * dl.cast("double") / avgdl))

  /** Shared ranking tail: per-(query, doc) sum of `part` rounded to 6,
    * optional self-hit drop BEFORE ranking, per-query window top-k. */
  private def bm25Tail(parts: DataFrame, k: Int,
      excludeSelf: Boolean): DataFrame = {
    val scored = parts.groupBy(col("query_id"), col("doc_id"))
      .agg(round(sum(col("part")), 6).as("score"))
    // excludeSelf: when queries ARE corpus documents (query_id = the
    // probe doc's id — the hybrid/more-like-this shape), drop the
    // trivial self-hit BEFORE ranking so ranks stay gapless
    val pool =
      if (excludeSelf) scored.where(col("doc_id") =!= col("query_id"))
      else scored
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id").asc)
    pool
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("score"),
        col("rank").cast("int").as("rank"))
  }

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
      .select(col("token"), idfExpr(col("n_docs"), col("df")).as("idf"))
    val parts = tf
      .join(broadcast(qterms), Seq("token"))
      .join(broadcast(idf), Seq("token"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("doc_id"),
        bm25Part(col("idf"), col("tf"), col("dl"), col("avgdl"),
          k1, b).as("part"))
    bm25Tail(parts, k, excludeSelf)
  }

  // ------------------------- persisted BM25 index (the scale path)

  /** Materialize the corpus' BM25 statistics under `dir` — the
    * retrieval tier's written family (the eighth): [[bm25TopK]]
    * recomputes tf/dl/stats corpus-wide per query set, which is the
    * wrong cost the moment queries outnumber corpus rewrites. Layout:
    *
    *   - `postings/`: (token, doc_id, tf) PARTITIONED BY
    *     `bucket = pmod(xxhash64(token), tokenBuckets)` — a probe
    *     prunes the scan to its query terms' buckets;
    *   - `doclen/`: (doc_id, dl) PARTITIONED BY
    *     `dbucket = pmod(doc_id, dlBuckets)` — the exact-length
    *     re-join reads only the CANDIDATE docs' buckets (the
    *     shingles-verify pruning pattern);
    *   - `params/`: ONE row (token_buckets, dl_buckets, n_docs,
    *     n_tokens, max_doc_id) written LAST — n_docs/n_tokens are the
    *     corpus-wide idf/avgdl statistics, max_doc_id the monotone-id
    *     append watermark every incremental family here enforces.
    *
    * `mode = "append"` folds a new batch in (stats accumulate; the
    * stored bucket counts drive the layout). RETRACTION is deliberately
    * rebuild-only: postings are partitioned by TOKEN (the probe
    * dimension), so deleting a document touches every bucket — and
    * unlike the dedup families, this index is cheap DERIVED data (two
    * aggregates of the corpus; no geometry, no watermark semantics
    * worth preserving) — re-run writeBm25Index over the published
    * corpus after a retraction, like an IVF rebuild.
    *
    * A crashed append retried leaves exact-duplicate rows: the probe
    * collapses them (`dropDuplicates`) and [[Dedup.compactIndex]]
    * removes them, so answers are identical throughout — the chunk
    * family's contract.
    */
  def writeBm25Index(docs: DataFrame, dir: String,
      tokenBuckets: Int = 256, dlBuckets: Int = 256,
      mode: String = "overwrite"): Unit = {
    require(tokenBuckets > 0 && dlBuckets > 0,
      s"bucket counts must be > 0, got ($tokenBuckets, $dlBuckets)")
    val spark = docs.sparkSession
    // one CHEAP aggregate (count/min/max scan, no token shuffle)
    // carries the batch's doc count and the watermark id range — all
    // append refusals fire on it BEFORE any corpus-scale work (the
    // early-refusal discipline: a mis-knobbed cron append must not
    // tokenize and checkpoint the whole batch first)
    val idAgg = docs.agg(count(lit(1)), min(col("doc_id")),
      max(col("doc_id"))).head()
    val (nDocsB, minIdB, maxIdB) =
      (idAgg.getLong(0),
        if (idAgg.isNullAt(1)) Long.MaxValue else idAgg.getLong(1),
        if (idAgg.isNullAt(2)) Long.MinValue else idAgg.getLong(2))
    var prev = (0L, 0L, Long.MinValue) // (n_docs, n_tokens, max_doc_id)
    var nTokensB = 0L
    Dedup.writeIndexScaffold(spark, dir, mode) {
      val p = readBm25IndexParams(spark, dir)
      require((p._1, p._2) == (tokenBuckets, dlBuckets),
        s"append with buckets ($tokenBuckets, $dlBuckets) onto an " +
          s"index written with (${p._1}, ${p._2})")
      require(minIdB > p._5,
        s"batch min doc_id $minIdB is not above the index's " +
          s"max_doc_id ${p._5} — appended stats assume disjoint docs " +
          "(monotone ids); index the lower-id batch first, or renumber")
      prev = (p._3, p._4, p._5)
    } {
      // tf is barrier'd — it feeds postings, doclen and the token
      // total (three consumers of one corpus-token shuffle), and runs
      // only AFTER every refusal above has passed
      val tf = Barriers.barrier(
        TextAnalysis.tokenStream(docs)
          .groupBy(col("doc_id"), col("token"))
          .agg(count(lit(1)).as("tf")))
      // the three consumers are independent reads of the barrier'd tf
      // targeting disjoint outputs; params (which needs nTokensB) is
      // written by the scaffold only after all three
      val aggTask = () => nTokensB =
        tf.agg(coalesce(sum(col("tf")), lit(0L))).head().getLong(0)
      val postingsTask = () => tf.withColumn("bucket",
          pmod(xxhash64(col("token")), lit(tokenBuckets.toLong))
            .cast("int"))
        .write.mode(mode).partitionBy("bucket")
        .parquet(s"$dir/postings")
      val doclenTask = () =>
        tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
          .withColumn("dbucket",
            pmod(col("doc_id"), lit(dlBuckets.toLong)).cast("int"))
          .write.mode(mode).partitionBy("dbucket")
          .parquet(s"$dir/doclen")
      if (mode == "append") {
        // STRICT sequential order on append (the Dedup writers' rule:
        // the standing params stays valid mid-append, so a concurrent
        // probe can legally read both datasets) — doclen lands before
        // postings, because the probe's re-join drops any candidate
        // whose postings row has no doclen row yet (silently fewer
        // results); the reverse interleaving only leaves unreferenced
        // doclen rows, which no probe path reads
        aggTask(); doclenTask(); postingsTask()
      } else
        // overwrite: the scaffold deleted params first, every reader
        // refuses while we rewrite — the three overlap (Par, guide
        // §2.6) instead of summing three fixed job floors
        Par.run(3)(Seq(aggTask, postingsTask, doclenTask))
    } {
      import spark.implicits._
      Seq((tokenBuckets, dlBuckets, prev._1 + nDocsB,
          prev._2 + nTokensB, math.max(prev._3, maxIdB)))
        .toDF("token_buckets", "dl_buckets", "n_docs", "n_tokens",
          "max_doc_id")
    }
  }

  private[graft] def readBm25IndexParams(spark: org.apache.spark
      .sql.SparkSession, dir: String): (Int, Int, Long, Long, Long) = {
    val r = spark.read.parquet(s"$dir/params").head()
    (r.getAs[Int]("token_buckets"), r.getAs[Int]("dl_buckets"),
      r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
      r.getAs[Long]("max_doc_id"))
  }

  /** BM25 top-k against a [[writeBm25Index]] corpus — [[bm25TopK]]'s
    * contract and arithmetic through the STORED statistics: identical
    * output when the index covers the same corpus (RetrievalSpec pins
    * score-and-rank bit-equality; q133 shares q129's oracle).
    *
    * Scale: the probe never touches corpus text. `postings/` is
    * scanned ONLY at the query terms' buckets (DPP via the broadcast
    * term join), df comes from the matched rows, and the doc-length
    * re-join reads only the candidate docs' `doclen/` buckets. Probe
    * IO ∝ the query terms' posting lists — a stop-word query degrades
    * to a corpus-sized posting list, the [[bm25TopK]] disclosure.
    * `broadcastProbe = false` degrades both pruned joins to shuffles
    * for a query set too large to broadcast (the dedup probes' flag).
    */
  def bm25TopKIndexed(spark: org.apache.spark.sql.SparkSession,
      queries: DataFrame, dir: String, k: Int = 10, k1: Double = 1.2,
      b: Double = 0.75, excludeSelf: Boolean = false,
      broadcastProbe: Boolean = true): DataFrame = {
    require(k > 0, "k must be positive")
    require(k1 >= 0 && b >= 0 && b <= 1, s"bad BM25 params k1=$k1 b=$b")
    val (tokenBuckets, dlBuckets, nDocs, nTokens, _) =
      readBm25IndexParams(spark, dir)
    require(nDocs > 0, s"$dir indexes an empty corpus — nothing to rank")
    val avgdl = nTokens.toDouble / nDocs
    val qterms0 = queries.select(col("query_id"),
        explode(TextAnalysis.normTokens(col("text"))).as("token"))
      .distinct()
      .withColumn("bucket",
        pmod(xxhash64(col("token")), lit(tokenBuckets.toLong))
          .cast("int"))
      // vacuously-true predicate marking the probe side selective so
      // dynamic partition pruning fires (the chunk probe's trick)
      .where(length(col("token")) > 0)
    val qterms = if (broadcastProbe) broadcast(qterms0) else qterms0
    val matched = spark.read.schema(Dedup.bm25PostingsSchema)
      .parquet(s"$dir/postings")
      .join(qterms, Seq("bucket", "token"))
      // a retried crashed append duplicates rows verbatim — collapse
      // before anything counts or sums
      .dropDuplicates("query_id", "token", "doc_id")
    // df from the matched rows themselves: post-collapse each (token,
    // doc) is one row, so the per-token doc count IS df — no second
    // index pass (distinct over query_id first: two queries sharing a
    // term must not double-count it)
    val dfreq = matched.select(col("token"), col("doc_id")).distinct()
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
    val idf = dfreq.select(col("token"),
      idfExpr(lit(nDocs), col("df")).as("idf"))
    val candIds0 = matched.select(col("doc_id")).distinct()
      .withColumn("dbucket",
        pmod(col("doc_id"), lit(dlBuckets.toLong)).cast("int"))
      .where(col("doc_id").isNotNull)
    val candIds = if (broadcastProbe) broadcast(candIds0) else candIds0
    val dl = spark.read.schema(Dedup.bm25DoclenSchema)
      .parquet(s"$dir/doclen")
      .join(candIds, Seq("dbucket", "doc_id"), "left_semi")
      .dropDuplicates("doc_id")
      .select(col("doc_id"), col("dl"))
    val parts = matched
      .join(broadcast(idf), Seq("token"))
      .join(dl, Seq("doc_id"))
      .select(col("query_id"), col("doc_id"),
        bm25Part(col("idf"), col("tf"), col("dl"), lit(avgdl),
          k1, b).as("part"))
    bm25Tail(parts, k, excludeSelf)
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
