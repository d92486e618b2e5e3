package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.native

/** Similarity search over an embedding column (extension tier):
  * brute-force cosine top-k as the exact baseline, and an IVF
  * (inverted-file / coarse-quantizer) variant as the scale path.
  *
  * Scale design: queries are the small side and are always broadcast — the
  * corpus never shuffles for the join. Top-k is a window per query over the
  * scored candidates (post-filter, bounded by k·|queries| rows out). The
  * IVF path prunes the corpus to `nprobe` of `nlist` centroid cells before
  * scoring, so scored pairs shrink by ~nprobe/nlist; at 100 TB the corpus
  * would be written bucketed by cell id so a probe is a partition-pruned
  * scan, not a full pass.
  */
object Similarity {

  /** Exact brute-force cosine top-k: score every (query, corpus) pair via
    * the native codegen'd dot product, keep the k best per query.
    * Deterministic tie-break on vec_id.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      k: Int = 10): DataFrame = {
    val q = broadcast(queries.select(
      col("vec_id").as("query_id"), col("embedding").as("query_vec")))
    val scored = corpus.join(q, col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        native.fvec_cosine(col("query_vec"), col("embedding")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Exact all-pairs cosine-similarity pairs above `threshold` — the
    * brute-force ORACLE BASELINE that [[graft.operators.Dedup
    * .embeddingNearDup]]'s LSH bucketing approximates. O(n²) by
    * construction; for validation on samples, never the scale path. The
    * kernel's sequential double accumulation makes the score bit-exactly
    * reproducible by any engine folding the same order.
    */
  def cosinePairsExact(embeddings: DataFrame,
      threshold: Double): DataFrame = {
    val a = embeddings.select(col("vec_id").as("id_a"),
      col("embedding").as("ea"))
    val b = embeddings.select(col("vec_id").as("id_b"),
      col("embedding").as("eb"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        native.fvec_cosine(col("ea"), col("eb")).as("cosine"))
      .where(col("cosine") >= threshold)
  }

  /** `nlist` coarse centroids picked deterministically from the corpus by
    * hash-sampling vec_ids (data-independent, no count() pre-pass — at
    * 100 TB an extra full scan just to size a stride is wasted IO).
    * Returns (cell, centroid), cell = 0..nlist-1. Broadcast-sized.
    */
  def ivfCentroids(corpus: DataFrame, nlist: Int = 16): DataFrame =
    corpus
      .orderBy(pmod(xxhash64(col("vec_id")), lit(1000000007L)).asc,
        col("vec_id").asc)
      .limit(nlist)
      .select(
        (row_number().over(Window.orderBy(col("vec_id"))) - 1).as("cell"),
        col("embedding").as("centroid"))

  /** IVF assignment: each corpus vector → its nearest centroid by cosine —
    * an argmax per row (`max_by` over the broadcast centroid join), not a
    * window: no sort, no per-vector state beyond the running max.
    * Returns (vec_id, cell). At scale this is the bucketing column the
    * corpus is written `bucketBy`/`partitionBy` on.
    */
  def ivfAssign(corpus: DataFrame, centroids: DataFrame): DataFrame =
    corpus.select(col("vec_id"), col("embedding"))
      .join(broadcast(centroids))
      .select(col("vec_id"), col("cell"),
        native.fvec_cosine(col("embedding"), col("centroid")).as("sim"))
      .groupBy(col("vec_id"))
      // deterministic arg-max: highest sim, ties to the lowest cell
      .agg(max_by(col("cell"), struct(col("sim"), -col("cell")))
        .as("cell"))

  /** Lloyd-refined centroids: seed with [[ivfCentroids]], then `iters`
    * rounds of assign → elementwise-mean recompute. Each round is one
    * broadcast join + one aggregate with 64 column means — the standard
    * distributed k-means step, no vector collect to the driver. Empty
    * cells keep their previous centroid (left join + coalesce).
    */
  def kmeansCentroids(corpus: DataFrame, nlist: Int = 16, dim: Int = 64,
      iters: Int = 2): DataFrame = {
    var cents = ivfCentroids(corpus, nlist)
    for (_ <- 0 until iters) {
      val assign = ivfAssign(corpus, cents)
      val means = corpus.join(assign, Seq("vec_id"))
        .groupBy(col("cell"))
        .agg(array((0 until dim).map(i =>
          avg(element_at(col("embedding"), i + 1)).cast("float")): _*)
          .as("new_centroid"))
      cents = cents.join(means, Seq("cell"), "left")
        .select(col("cell"),
          coalesce(col("new_centroid"), col("centroid")).as("centroid"))
        .localCheckpoint() // truncate the per-iteration lineage
    }
    cents
  }

  /** IVF approximate top-k: probe the `nprobe` nearest cells per query,
    * score only vectors in probed cells. Recall < 1 by construction; the
    * exact [[bruteForceTopK]] is the correctness oracle. Centroids are
    * Lloyd-refined when `kmeansIters > 0`.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int = 10,
      nlist: Int = 16, nprobe: Int = 4, dim: Int = 64,
      kmeansIters: Int = 1): DataFrame = {
    val centroids0 =
      if (kmeansIters > 0) kmeansCentroids(corpus, nlist, dim, kmeansIters)
      else ivfCentroids(corpus, nlist)
    val assign = ivfAssign(corpus, centroids0)
    val indexed = corpus.join(assign, Seq("vec_id"))
    val centroids = broadcast(
      centroids0.select(col("cell").as("ccell"), col("centroid")))
    // nearest nprobe cells per query
    val q = queries.select(
      col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("csim").desc, col("ccell").asc)
    val probes = q.join(centroids)
      .select(col("query_id"), col("query_vec"), col("ccell"),
        native.fvec_cosine(col("query_vec"), col("centroid")).as("csim"))
      .withColumn("rn", row_number().over(probeW))
      .where(col("rn") <= nprobe)
      .select(col("query_id"), col("query_vec"), col("ccell").as("cell"))
    val scored = indexed.join(broadcast(probes), Seq("cell"))
      .where(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        native.fvec_cosine(col("query_vec"), col("embedding")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Engine-portable exact top-k on quantized vectors: components rounded
    * to 1e-3 and summed as integers, so the score is exactly reproducible
    * across engines (used by the DuckDB oracle; float summation order is
    * not).
    */
  def quantizedTopK(corpus: DataFrame, queries: DataFrame,
      k: Int = 10, scale: Int = 1000): DataFrame = {
    val qz: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      v => transform(v, x => round(x.cast("double") * scale).cast("long"))
    val q = broadcast(queries.select(
      col("vec_id").as("query_id"), qz(col("embedding")).as("query_vec")))
    val scored = corpus
      .select(col("vec_id"), qz(col("embedding")).as("vec"))
      .join(q, col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        aggregate(zip_with(col("query_vec"), col("vec"), (a, b) => a * b),
          lit(0L), (acc, x) => acc + x).as("dot"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dot").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }
}
