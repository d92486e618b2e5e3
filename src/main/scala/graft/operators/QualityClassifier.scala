package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Trained quality-classifier tier — the model-based document filter of
  * the GPT-3 / CCNet pipelines (Brown et al., arXiv:2005.14165
  * Appendix A: a logistic-regression classifier over token features
  * separates a high-quality reference corpus from raw web text and its
  * score gates admission; Wenzek et al., arXiv:1911.00359 train the
  * same shape to tell the LM head from the tail). The repo already
  * carries the rule-based tier ([[TextAnalysis.gopherRules]]) and the
  * LM-perplexity tier ([[TextAnalysis.lmScore]]); this is the third
  * standard tier — a classifier DISTILLED from seed classes, applied
  * corpus-wide.
  *
  * Two deliberately separated surfaces:
  *
  *   - [[score]] is the PRODUCTION path: pure DataFrame algebra over a
  *     token-keyed weight table (explode → broadcast join → one
  *     per-doc aggregate → sigmoid), the q48/q104 cost class —
  *     shuffles ∝ corpus tokens, codegen throughout, engine-portable
  *     and oracle-checkable. At 100 TB this is the only pass that
  *     touches the corpus.
  *   - [[train]] is the MODEL path: MLlib logistic regression over
  *     vocabulary-indexed count vectors, run on SEED sets (seed
  *     corpora are metadata-sized next to the corpus being scored —
  *     the GPT-3 contract). Training features are vocabulary-indexed,
  *     NOT hash-bucketed, so the learned weights come back
  *     token-keyed: the model stays inspectable and the scoring path
  *     above needs no hash function an external engine couldn't
  *     reproduce.
  *
  * Model persistence follows the index params discipline:
  * `weights/` + `params/` (bias, vocab size; written LAST), so a
  * half-written model refuses rather than half-answers.
  */
object QualityClassifier {

  /** Score documents under a token-keyed weight table: per doc,
    * `quality_prob = sigmoid(Σ_occurrences weight(token) + bias)`
    * rounded to 6 decimals (the [[TextAnalysis.lmScore]] portability
    * discipline — and like there, a doc's token rows stay in one
    * partition so the partial sum folds in text order; weights that
    * are exact binary fractions make the sum bit-exact in ANY order).
    * Out-of-vocabulary tokens contribute 0 (the LEFT join against the
    * weight table leaves them a null weight, coalesced to 0 inside the
    * sum); a document with no weighted tokens — or no tokens at all —
    * still reports `sigmoid(bias)`, carried by its explode_outer row,
    * the screen-completeness rule every report here follows.
    *
    * Plan shape: token explode is map-only (explode_OUTER, so a
    * token-free or null-text doc keeps one row and lands on the
    * bias-only score without a corpus-sized join back), the weight
    * table broadcasts (a model is metadata-sized), one per-doc
    * aggregate — shuffle ∝ corpus tokens, and the weighted sum
    * collapses map-side before it. Returns (doc_id, quality_prob).
    */
  def score(docs: DataFrame, weights: DataFrame,
      bias: Double): DataFrame = {
    val w = broadcast(weights.select(col("token"), col("weight")))
    docs.select(col("doc_id"),
        explode_outer(TextAnalysis.normTokens(col("text"))).as("token"))
      .join(w, Seq("token"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(coalesce(col("weight"), lit(0.0))).as("__z"))
      .select(col("doc_id"),
        round(lit(1.0) / (lit(1.0) +
            exp(-(col("__z") + lit(bias)))), 6)
          .as("quality_prob"))
  }

  /** Train an L2-regularized logistic regression separating `good`
    * seed documents (label 1) from `bad` ones (label 0) over the top
    * `topV` tokens of the combined seed set (count features; the
    * vocabulary's frequency cut breaks ties lexicographically like
    * every vocabulary here). Returns the token-keyed weight table and
    * the intercept, ready for [[score]] / [[writeModel]].
    *
    * The featurization maps each seed doc through the SAME
    * normalization as [[TextAnalysis.tokenStream]] (lowercase,
    * whitespace-class collapse) — a typed map, not codegen, which is
    * fine HERE because seeds are sample-sized by contract; the
    * corpus-wide pass is [[score]]'s. The vocabulary (≤ topV tokens)
    * is collected and broadcast like the IVF centroid table — model
    * geometry, not data.
    */
  def train(spark: SparkSession, good: DataFrame, bad: DataFrame,
      topV: Int = 4096, maxIter: Int = 100,
      regParam: Double = 0.01): (DataFrame, Double) = {
    import spark.implicits._
    val seeds = good.select(col("text"), lit(1.0).as("label"))
      .unionByName(bad.select(col("text"), lit(0.0).as("label")))
    val vocab = TextAnalysis.vocabulary(
      seeds.withColumn("doc_id", lit(0L)), topV)
      .select(col("token")).collect().map(_.getString(0))
    require(vocab.nonEmpty,
      "quality classifier: the seed sets contain no tokens")
    val bvmap = spark.sparkContext.broadcast(vocab.zipWithIndex.toMap)
    val dim = vocab.length
    val feats = seeds.as[(String, Double)].map { case (text, label) =>
      val counts = scala.collection.mutable.Map.empty[Int, Double]
      // Locale.ROOT: Spark's lower() is locale-independent and the
      // vocabulary came through it — a tr_TR default locale would
      // silently unmap dotted-I tokens; null seed text = zero features
      Option(text).getOrElse("")
        .toLowerCase(java.util.Locale.ROOT)
        .split(TextAnalysis.WsPattern + "+").foreach { t =>
        if (t.nonEmpty) bvmap.value.get(t).foreach { i =>
          counts(i) = counts.getOrElse(i, 0.0) + 1.0
        }
      }
      (label, org.apache.spark.ml.linalg.Vectors.sparse(dim,
        counts.toSeq.sortBy(_._1)))
    }.toDF("label", "features")
    val model = new org.apache.spark.ml.classification.LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam)
      .setFitIntercept(true).setStandardization(false)
      .fit(feats)
    val coeffs = model.coefficients.toArray
    val weights = vocab.toSeq.zipWithIndex
      .map { case (t, i) => (t, coeffs(i)) }.toDF("token", "weight")
    (weights, model.intercept)
  }

  /** Persist a model under the index params discipline: `weights/`
    * first, `params/` (bias, n_tokens) LAST — a crash between the two
    * leaves a directory [[readModel]] refuses. Overwrite deletes
    * params FIRST for the same reason.
    */
  def writeModel(spark: SparkSession, weights: DataFrame, bias: Double,
      dir: String): Unit = {
    import org.apache.hadoop.fs.Path
    import spark.implicits._
    val fs = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new Path(s"$dir/params")))
      fs.delete(new Path(s"$dir/params"), true)
    val n = weights.count()
    weights.select(col("token"), col("weight"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/weights")
    Seq((bias, n, "lr_token_counts"))
      .toDF("bias", "n_tokens", "family")
      .coalesce(1).write.parquet(s"$dir/params")
  }

  /** Read a persisted model back: (weights, bias). Refuses a
    * params-less directory (the crashed-write state, like every index
    * family here). */
  def readModel(spark: SparkSession, dir: String): (DataFrame, Double) = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(new Path(s"$dir/params")),
      s"$dir has no params/ — not a written quality-classifier model " +
        "(or its write crashed before the params commit); re-run " +
        "writeModel")
    val p = spark.read.parquet(s"$dir/params").head()
    (spark.read.parquet(s"$dir/weights"), p.getAs[Double]("bias"))
  }
}
