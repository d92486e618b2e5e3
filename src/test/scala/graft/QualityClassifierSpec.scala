package graft

import org.apache.spark.sql.functions._

import graft.operators.QualityClassifier

class QualityClassifierSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_$prefix").toString

  test("score: sigmoid of the weighted token-count sum, 6-decimal " +
      "rounded; OOV-only and empty docs still report sigmoid(bias)") {
    val docs = Seq(
      (1L, "fast fast merge"),      // z = 0.25*2 + 0.125 = 0.625
      (2L, "slow HASH unrelated"),  // z = -0.5 - 0.125 = -0.625 (lowercased)
      (3L, "nothing weighted here"),
      (4L, "")).toDF("doc_id", "text")
    val weights = Seq(("fast", 0.25), ("slow", -0.5), ("merge", 0.125),
      ("hash", -0.125)).toDF("token", "weight")
    def sig(z: Double) =
      BigDecimal(1.0 / (1.0 + math.exp(-z)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = QualityClassifier.score(docs, weights, bias = -0.25)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) === sig(0.625 - 0.25))
    assert(got(2L) === sig(-0.625 - 0.25))
    // completeness: no weighted token ⇒ the bias-only score, reported
    assert(got(3L) === sig(-0.25) && got(4L) === sig(-0.25))
    assert(got.size === 4)
  }

  test("train distills planted classes: held-out docs classify " +
      "correctly and the learned weights carry the discriminative " +
      "tokens with the right signs") {
    def good(i: Int) = s"thorough peer reviewed analysis with careful " +
      s"citations and rigorous methodology section number$i"
    def bad(i: Int) = s"click here buy cheap pills now amazing free " +
      s"offer limited deal winner number$i"
    val goodDf = (0 until 30).map(i => (i.toLong, good(i)))
      .toDF("doc_id", "text")
    val badDf = (0 until 30).map(i => (100L + i, bad(i)))
      .toDF("doc_id", "text")
    val (w, b) = QualityClassifier.train(spark, goodDf, badDf,
      topV = 64, maxIter = 50)
    // held-out docs (same classes, unseen suffixes — and a fresh
    // number token the vocabulary never saw, which must ride as OOV)
    val holdout = Seq(
      (900L, "rigorous methodology with peer reviewed citations " +
        "number9999"),
      (901L, "amazing free pills deal click now number9999"))
      .toDF("doc_id", "text")
    val scored = QualityClassifier.score(holdout, w, b)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scored(900L) > 0.5, s"good held-out scored ${scored(900L)}")
    assert(scored(901L) < 0.5, s"bad held-out scored ${scored(901L)}")
    // the model is INSPECTABLE: token-keyed weights, discriminative
    // tokens signed toward their class
    val wm = w.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(wm("rigorous") > 0.0 && wm("citations") > 0.0)
    assert(wm("pills") < 0.0 && wm("cheap") < 0.0)
  }

  test("model round-trip: writeModel/readModel scores bit-identically; " +
      "a params-less dir (crashed write) refuses") {
    val docs = Seq((1L, "alpha beta beta"), (2L, "gamma alpha"))
      .toDF("doc_id", "text")
    val weights = Seq(("alpha", 0.5), ("beta", -0.25), ("gamma", 0.125))
      .toDF("token", "weight")
    val dir = tmp("qc_model")
    QualityClassifier.writeModel(spark, weights, bias = 0.0625, dir)
    val (w2, b2) = QualityClassifier.readModel(spark, dir)
    assert(b2 === 0.0625)
    val before = QualityClassifier.score(docs, weights, 0.0625)
      .orderBy($"doc_id").collect().toSeq
    val after = QualityClassifier.score(docs, w2, b2)
      .orderBy($"doc_id").collect().toSeq
    assert(before === after)
    // overwrite is staged params-last: delete params to simulate the
    // crash window — the read refuses instead of serving half a model
    val crashed = tmp("qc_crash")
    QualityClassifier.writeModel(spark, weights, 0.0, crashed)
    def deleteRec(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(deleteRec); f.delete()
    }
    deleteRec(new java.io.File(s"$crashed/params"))
    val e = intercept[IllegalArgumentException](
      QualityClassifier.readModel(spark, crashed))
    assert(e.getMessage.contains("params"))
  }

  test("train-quality CLI: the season-cadence model build distills a " +
      "published corpus' LM head/tail into a persisted model the " +
      "quality modality consumes, and releases its lease") {
    val corpusDir = tmp("tq_corpus")
    val modelDir = tmp("tq_model")
    // a corpus with an unmistakable LM split: six docs share a common
    // vocabulary (high token probabilities = the LM head), six are
    // all-unique gibberish (every token count 1 = the tail)
    val common = (0 until 8).map(j => s"common$j").mkString(" ")
    val corpus = (
      (0L until 6L).map(i => (i, s"$common extra$i")) ++
      (10L until 16L).map(i =>
        (i, (0 until 9).map(j => s"rare${i}x$j").mkString(" "))))
      .toDF("doc_id", "text")
    corpus.write.parquet(s"$corpusDir/corpus")
    CorpusMain.run(spark,
      List("train-quality", corpusDir, modelDir, "64"))
    val (w, b) = QualityClassifier.readModel(spark, modelDir)
    // the model is standing and lease-free (a refresh can read it now)
    assert(!new java.io.File(s"$modelDir/_LEASE").exists())
    // held-out docs: common-vocabulary prose outscores gibberish
    val holdout = Seq(
      (900L, "common1 common2 common5 common7 freshword"),
      (901L, "zzq1 zzq2 zzq3 zzq4 zzq5")).toDF("doc_id", "text")
    val scored = QualityClassifier.score(holdout, w, b)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scored(900L) > scored(901L), scored.toString)
  }

  test("trainQualityModel's seed cap samples every ERA, " +
      "deterministically: a late-batch drift class reaches the capped " +
      "seed set (an id-ordered cap would train on the oldest " +
      "exemplars forever), and two runs produce bit-identical models") {
    val corpusDir = tmp("tq_era_corpus")
    // 30 LM-head docs in two eras — ids 0..14 published early (token
    // 'oldmark'), ids 1000..1014 a much later batch ('newmark' = the
    // drift the season retrain exists to see) — and 60 gibberish tail
    // docs, so tercile 0 is exactly the 30 good docs and the cap of
    // 10 must CHOOSE among them
    val common = (0 until 8).map(j => s"common$j").mkString(" ")
    val corpus = (
      (0L until 15L).map(i => (i, s"$common oldmark extra$i")) ++
      (1000L until 1015L).map(i => (i, s"$common newmark extra$i")) ++
      (100L until 160L).map(i =>
        (i, (0 until 10).map(j => s"rare${i}x$j").mkString(" "))))
      .toDF("doc_id", "text")
    corpus.write.parquet(s"$corpusDir/corpus")
    def fit(dir: String) = {
      Pipeline.trainQualityModel(spark, corpusDir, dir, topV = 256,
        maxSeedsPerClass = 10)
      QualityClassifier.readModel(spark, dir)
    }
    val (w1, b1) = fit(tmp("tq_era_m1"))
    val vocab = w1.select($"token").collect().map(_.getString(0)).toSet
    assert(vocab.contains("newmark"),
      s"the late era never reached the capped seed set: $vocab")
    assert(vocab.contains("oldmark"),
      s"the early era never reached the capped seed set: $vocab")
    // same corpus, same salt, same cap → the same model, bit for bit
    val (w2, b2) = fit(tmp("tq_era_m2"))
    assert(b1 === b2)
    assert(w1.orderBy($"token").collect().toSeq ===
      w2.orderBy($"token").collect().toSeq)
  }

  test("q119 composition: the corpus-trained classifier reproduces the " +
      "LM head/tail signal it distilled (head docs outscore tail docs " +
      "on average)") {
    val q = SparkEntry.queries("q119_quality_classifier")(spark, sf())
    val buckets = graft.operators.Sharding.scoreBuckets(
      graft.operators.TextAnalysis.lmScore(
        spark.read.parquet(s"${sf()}/documents.parquet"), topV = 512))
    val joined = q.join(buckets.select($"doc_id", $"bucket"), Seq("doc_id"))
      .groupBy($"bucket").agg(avg($"quality_prob").as("p"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(joined(0L) > joined(2L),
      s"head avg ${joined(0L)} should exceed tail avg ${joined(2L)}")
  }
}
