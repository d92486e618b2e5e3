package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Sharding, TextAnalysis}

/** Corpus-preparation operators: deterministic hash splits and
  * token-budget sharding via the distributed prefix sum.
  */
class ShardingSpec extends SparkSuite {
  import spark.implicits._

  test("hash split is deterministic, salted, and roughly proportional") {
    val ids = (0L until 2000L).toDF("doc_id")
    val a = Sharding.hashSplit(ids).groupBy($"split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // ~80/10/10 with slack for hash variance on 2000 ids
    assert(a("train") > 1400 && a("train") < 1800)
    assert(a("val") > 100 && a("val") < 320)
    assert(a("test") > 100 && a("test") < 320)
    // determinism: identical assignment on a re-run
    val r1 = Sharding.hashSplit(ids).select($"doc_id", $"split").collect()
    val r2 = Sharding.hashSplit(ids).select($"doc_id", $"split").collect()
    assert(r1.map(r => r.getLong(0) -> r.getString(1)).toMap ===
      r2.map(r => r.getLong(0) -> r.getString(1)).toMap)
    // a different salt reshuffles at least SOME documents
    val other = Sharding.hashSplit(ids, salt = "v2")
      .select($"doc_id", $"split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val moved = r1.count(r => other(r.getLong(0)) != r.getString(1))
    assert(moved > 0)
  }

  test("split leakage counts cross-split duplicate fingerprints") {
    val docs = (0L until 100L)
      .map(i => (i, if (i < 10) "dup text" else s"unique text $i"))
      .toDF("doc_id", "text")
    val rep = Sharding.splitLeakage(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    val splits = Sharding.hashSplit(docs).select($"doc_id", $"split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val dupIds = (0L until 10L)
    // the shared fingerprint leaks iff its copies span >1 split
    val leak: Map[String, Long] =
      if (dupIds.map(splits).toSet.size > 1)
        dupIds.groupBy(splits).map { case (s, ids) => s -> ids.size.toLong }
      else Map.empty
    assert(rep.values.map(_._1).sum === 100L)
    rep.foreach { case (split, (_, _, nLeaked)) =>
      assert(nLeaked === leak.getOrElse(split, 0L), split)
    }
  }

  test("token shards: distributed prefix sum equals the single-window " +
      "reference and respects the budget boundaries") {
    val docs = (0L until 500L)
      .map(i => (i, Seq.fill((i % 37).toInt + 1)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val budget = 100L
    val got = Sharding.tokenShards(docs, budget, numParts = 7)
      .orderBy($"doc_id").collect()
    // reference: the naive global window (fine on test-sized data)
    val ref = docs
      .select($"doc_id",
        TextAnalysis.tokenCount($"text").as("n_tokens"))
      .withColumn("cum_prev",
        coalesce(sum($"n_tokens").over(
          Window.orderBy($"doc_id")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("shard_id", floor($"cum_prev" / lit(budget.toDouble)))
      .select($"doc_id", $"n_tokens", $"shard_id")
      .orderBy($"doc_id").collect()
    assert(got.length === ref.length)
    got.zip(ref).foreach { case (g, r) =>
      assert(g.getLong(0) === r.getLong(0))
      assert(g.getInt(1) === r.getInt(1))
      assert(g.getLong(2) === r.getLong(2), s"doc ${g.getLong(0)}")
    }
    // shards are contiguous in doc order and start at 0
    val shards = got.map(_.getLong(2))
    assert(shards.head === 0L)
    shards.sliding(2).foreach { case Array(a, b) =>
      assert(b === a || b === a + 1 || b > a) // non-decreasing
    }
    assert(shards.toSet.size > 1) // budget actually splits the corpus
  }
}
