package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

class TextAnalysisSpec extends SparkSuite {
  import spark.implicits._

  private def one(text: String) = Seq((0L, text)).toDF("doc_id", "text")

  test("token and subword counts") {
    val df = one("  the quick  brown fox  ")
    val r = df.select(
      TextAnalysis.tokenCount($"text"),
      TextAnalysis.subwordCount($"text")).collect()(0)
    assert(r.getInt(0) === 4) // empties from double spaces dropped
    // the|quic|k|brow|n|fox → 6 chunks of ≤4 alnum chars
    assert(r.getInt(1) === 6)
  }

  test("quality features count punctuation and stopwords") {
    val r = TextAnalysis.qualityFeatures(
      one("The cat, the dog; and a bird!")).collect()(0)
    assert(r.getAs[Int]("n_punct") === 3)     // , ; !
    assert(r.getAs[Int]("n_stopwords") === 4) // the, the, and, a
  }

  test("language id picks the best-scoring language deterministically") {
    val en = TextAnalysis.languageId(one("the cat and the dog is in town"))
      .collect()(0)
    assert(en.getString(1) === "en")
    val es = TextAnalysis.languageId(one("el perro que ladra y la casa"))
      .collect()(0)
    assert(es.getString(1) === "es")
    // no markers at all → first language wins the all-zero tie... except
    // scores start at -1, so a zero-hit doc resolves to the first lang
    val none = TextAnalysis.languageId(one("xyzzy plugh")).collect()(0)
    assert(none.getString(1) === "de")
    assert(none.getInt(2) === 0)
  }

  test("fingerprint is whitespace/case-insensitive; rolling hash is " +
      "order-sensitive") {
    val fp = spark.range(1).select(
      TextAnalysis.fingerprint(lit("Hello   World")).as("a"),
      TextAnalysis.fingerprint(lit("hello world")).as("b"),
      TextAnalysis.rollingHash(lit("ab cd")).as("h1"),
      TextAnalysis.rollingHash(lit("cd ab")).as("h2")).collect()(0)
    assert(fp.getString(0) === fp.getString(1))
    assert(fp.getLong(2) !== fp.getLong(3))
  }

  test("lmScore: add-one-smoothed unigram log-probs, deterministic " +
      "vocabulary boundary, OOV counted, zero-token docs null") {
    val docs = Seq(
      (0L, "the cat"),
      (1L, "THE  the"),   // normalizes to two 'the' tokens
      (2L, "zzz"),        // out of the top-2 vocabulary
      (3L, ""))           // zero tokens
      .toDF("doc_id", "text")
    // counts: the=3, cat=1, zzz=1; top-2 by (cnt desc, token asc) =
    // {the, cat} — 'cat' beats 'zzz' lexicographically at the tied
    // boundary, which is exactly the determinism under test
    val out = TextAnalysis.lmScore(docs, topV = 2)
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) Double.NaN else r.getDouble(3)))
    // N=5, |V|=2 → denom 8: p(the)=4/8, p(cat)=2/8, p(zzz OOV)=1/8
    def q(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(0) === ((0L, 2L, 0L,
      q((math.log(0.5) + math.log(0.25)) / 2))))
    assert(out(1) === ((1L, 2L, 0L, q(math.log(0.5)))))
    assert(out(2)._1 === 2L && out(2)._2 === 1L && out(2)._3 === 1L)
    assert(out(2)._4 === q(math.log(0.125)))
    assert(out(3)._1 === 3L && out(3)._2 === 0L && out(3)._3 === 0L)
    assert(out(3)._4.isNaN) // null avg_logp surfaced as NaN sentinel
  }

  test("gopher rules: each rule rejects its violation, a clean doc keeps") {
    def verdict(text: String, minWords: Long = 5L): (Boolean, org.apache.spark.sql.Row) = {
      val r = TextAnalysis.gopherRules(one(text), minWords = minWords)
        .collect()(0)
      (r.getBoolean(8), r)
    }
    // clean: enough words, sane lengths, 2+ stop words, alphabetic
    val good = "the quick brown fox jumps over that lazy dog today"
    assert(verdict(good)._1 === true)
    // too few words (minWords=5 here; the paper default is 50)
    assert(verdict("the cat and")._1 === false)
    // mean word length out of [3,10]
    assert(verdict("a b c d e f g h i j the of")._1 === false)
    // symbol-to-word ratio > 0.1 (hashes)
    assert(verdict("the # fox # and # dog # runs # home #")._1 === false)
    // bullet lines > 90%
    val bullets = (1 to 10).map(i => s"- item the of $i").mkString("\n")
    val (bk, br) = verdict(bullets)
    assert(br.getDouble(4) === 1.0 && bk === false)
    // ellipsis lines > 30%
    val ell = "the fox runs...\nand hides...\nthe dog of it sleeps"
    val (ek, er) = verdict(ell)
    assert(er.getDouble(5) > 0.3 && ek === false)
    // alphabetic words < 80%
    assert(verdict("the 123 456 789 012 345 of 678")._1 === false)
    // fewer than 2 distinct stop words
    assert(verdict("quick brown foxes jump over lazy dogs")._1 === false)
    // empty doc: zero ratios, no divide-by-zero, rejected
    val (zk, zr) = verdict("")
    assert(zk === false && zr.getLong(1) === 0L &&
      zr.getDouble(2) === 0.0)
    // words split on ALL whitespace: a clean doc spread over lines must
    // not merge words across newlines (12 words, not 10 merged ones)
    val multi = "the quick brown fox\njumps over that lazy\ndog in the barn"
    val (mk, mr) = verdict(multi)
    assert(mr.getLong(1) === 12L, s"n_words: $mr")
    assert(mr.getDouble(2) < 5.0, s"mean_word_len: $mr") // no \n-merged words
    assert(mk === true)
    // unicode ellipsis counts as a symbol, same as '...'
    val uni = "the fox … and … dog … runs … home … the … of …"
    assert(verdict(uni)._1 === false)
    // vertical tab is whitespace under the explicit class (Java \s
    // includes \x0B, RE2 does not — the class keeps both engines on the
    // Java semantics): 10 words, not 9 with a glued "fox\x0Bjumps"
    val vt = "the quick brown fox\u000Bjumps over that lazy dog today"
    val (vk, vr) = verdict(vt)
    assert(vr.getLong(1) === 10L, s"n_words: $vr")
    assert(vk === true)
    // stop hits count DISTINCT stop words: repeating one stop word many
    // times is still a single hit (the one-pass extract must distinct)
    val rep = "the quick the brown the foxes the jump the quick again"
    assert(verdict(rep)._1 === false)
    assert(verdict(rep)._2.getLong(7) === 1L)
  }

  test("gopherKeep filter column selects exactly gopherRules' keepers") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select($"doc_id").collect().map(_.getLong(0)).toSet
    val viaRules = ids(TextAnalysis.gopherRules(docs, minWords = 20,
      minStopHits = 0).where($"keep"))
    val viaKeep = ids(docs.where(TextAnalysis.gopherKeep($"text",
      minWords = 20, minStopHits = 0)))
    assert(viaKeep === viaRules)
    assert(viaKeep.nonEmpty && viaKeep.size < docs.count())
  }
}
