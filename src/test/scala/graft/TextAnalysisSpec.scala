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
}
