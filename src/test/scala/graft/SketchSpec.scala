package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Misra–Gries heavy-hitters sketch: bounded state, the frequent-item
  * guarantee under eviction and partial-sketch merges, and exactness of
  * the sketch-then-recount pipeline.
  */
class SketchSpec extends SparkSuite {
  import spark.implicits._

  test("sketch keeps at most k counters and never loses a frequent item") {
    // 20k noise items (each once) + 5 planted items (500 each) across
    // 8 partitions: eviction fires constantly, partial sketches merge
    val planted = (0 until 5).flatMap(i => Seq.fill(500)(s"hot_$i"))
    val noise = (0 until 20000).map(i => s"noise_$i")
    val df = spark.sparkContext
      .parallelize(scala.util.Random.shuffle(planted ++ noise), 8)
      .toDF("item")
    val k = 64
    val agg = df
      .agg(graft.functions.sketches.misra_gries($"item", k).as("s"))
    // the sketch tracks the total ingested count n exactly
    assert(agg.select($"s.n").head().getLong(0) === 22500L)
    val sketch = agg
      .select(explode($"s.candidates").as("c"))
      .select($"c.item", $"c.min_count")
      .collect()
    assert(sketch.length <= k)
    val items = sketch.map(_.getString(0)).toSet
    // n = 22500, n/(k+1) ≈ 346 < 500 → every planted item must survive
    (0 until 5).foreach(i => assert(items.contains(s"hot_$i"), s"hot_$i"))
    // estimates never exceed true counts (MG only undercounts)
    sketch.foreach { r =>
      val truth = if (r.getString(0).startsWith("hot_")) 500L else 1L
      assert(r.getLong(1) <= truth, r.getString(0))
    }
  }

  test("heavy hitters pipeline is exact against a plain group-by") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val got = TextAnalysis.heavyHitters(docs, minCount = 300L)
      .orderBy($"token").collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val ref = TextAnalysis.tokenStream(docs)
      .groupBy($"token").agg(count(lit(1)).as("cnt"))
      .where($"cnt" >= 300L)
      .orderBy($"token").collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(got.toSeq === ref.toSeq)
    assert(got.nonEmpty)
  }

  test("heavy hitters stays exact when n outgrows the sketch guarantee") {
    // k=4, minCount=10 → guarantee ceiling n < 50, far below the corpus:
    // the runtime n-check must kick in and fall back to the exact
    // recount instead of silently dropping evicted hitters
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val got = TextAnalysis.heavyHitters(docs, minCount = 300L, k = 4)
      .orderBy($"token").collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val ref = TextAnalysis.tokenStream(docs)
      .groupBy($"token").agg(count(lit(1)).as("cnt"))
      .where($"cnt" >= 300L)
      .orderBy($"token").collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(got.toSeq === ref.toSeq)
    assert(got.nonEmpty)
  }
}
