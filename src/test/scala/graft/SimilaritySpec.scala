package graft

import org.apache.spark.sql.functions._

import graft.functions.native
import graft.operators.Similarity

/** Similarity search: native expressions, brute-force top-k correctness,
  * IVF recall against the exact baseline on real testdata.
  */
class SimilaritySpec extends SparkSuite {
  import spark.implicits._

  test("native fvec expressions match a scala-side computation") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)))
      .toDF("a", "b")
    val r = df.select(
      native.fvec_dot($"a", $"b"),
      native.fvec_norm($"a"),
      native.fvec_cosine($"a", $"b")).collect()(0)
    assert(r.getDouble(0) === 32.0)
    assert(math.abs(r.getDouble(1) - math.sqrt(14.0)) < 1e-12)
    val cos = 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))
    assert(math.abs(r.getDouble(2) - cos) < 1e-12)
  }

  test("native expressions survive codegen and interpreted paths equally") {
    val df = Seq((Array(1.0f, 0.0f), Array(0.0f, 1.0f))).toDF("a", "b")
    val dot = df.select(native.fvec_dot($"a", $"b")).collect()(0)
      .getDouble(0)
    assert(dot === 0.0)
    // rolling hash: stable known value, order-sensitive
    val h1 = Seq("ab").toDF("t")
      .select(native.rolling_hash($"t")).collect()(0).getLong(0)
    val h2 = Seq("ba").toDF("t")
      .select(native.rolling_hash($"t")).collect()(0).getLong(0)
    assert(h1 === 97L * 257L + 98L)
    assert(h2 === 98L * 257L + 97L)
    assert(h1 !== h2)
  }

  test("brute-force top-k returns the true nearest neighbours") {
    val emb = spark.read.parquet(sf() + "/embeddings.parquet")
    val got = Similarity.bruteForceTopK(emb, emb.where($"vec_id" === 0),
      k = 5).collect()
    assert(got.length === 5)
    assert(got.forall(_.getLong(0) == 0L))
    // ranks are 1..5 with non-increasing cosine
    val byRank = got.sortBy(_.getInt(3))
    assert(byRank.map(_.getInt(3)).toSeq === Seq(1, 2, 3, 4, 5))
    val sims = byRank.map(_.getDouble(2)).toSeq
    assert(sims === sims.sorted.reverse)
    // cross-check rank-1 against an exhaustive driver-side scan
    val all = emb.collect().map(r => r.getLong(0) ->
      r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]) = {
      val d = a.zip(b).map(p => p._1.toDouble * p._2.toDouble).sum
      d / (math.sqrt(a.map(x => x.toDouble * x).sum) *
        math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    val q = all(0L)
    val best = all.filter(_._1 != 0L)
      .maxBy { case (_, v) => cos(q, v) }._1
    assert(byRank(0).getLong(1) === best)
  }

  test("IVF top-k achieves reasonable recall vs brute force") {
    val emb = spark.read.parquet(sf() + "/embeddings.parquet")
    val queries = emb.where($"vec_id" < 5)
    val exact = Similarity.bruteForceTopK(emb, queries, k = 10)
      .select($"query_id", $"vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.ivfTopK(emb, queries, k = 10, nlist = 8,
      nprobe = 4).select($"query_id", $"vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    // random near-orthogonal data is LSH-hostile; nprobe=4 of nlist=8
    // scans ~half the corpus, so recall should beat coin-flip clearly
    assert(recall > 0.4, s"recall $recall")
  }

  test("written IVF index returns the same top-k as the inline path") {
    val emb = spark.read.parquet(sf() + "/embeddings.parquet")
    val queries = emb.where($"vec_id" < 5)
    val cents = Similarity.collectCentroids(
      Similarity.ivfCentroids(emb, nlist = 8))
    val dir = java.nio.file.Files.createTempDirectory("ivfidx").toString
    Similarity.writeIvfIndex(emb, dir, cents)
    // the index holds every vector exactly once, spread over cell dirs
    assert(spark.read.parquet(dir).count() === emb.count())
    assert(new java.io.File(dir).listFiles()
      .count(_.getName.startsWith("cell=")) > 1)
    val inline = Similarity.ivfTopK(emb, queries, k = 10, nlist = 8,
      nprobe = 4, kmeansIters = 0)
      .orderBy($"query_id", $"rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    val indexed = Similarity.ivfTopKIndexed(spark, dir, queries, cents,
      k = 10, nprobe = 4)
      .orderBy($"query_id", $"rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    assert(indexed.toSeq === inline.toSeq)
  }

  test("q70 gate: IVF recall@10 >= 0.9 at the driver-checked parameters") {
    val row = SparkEntry.queries("q70_ivf_recall")(spark, sf()).collect()(0)
    assert(row.getLong(1) === 50L) // 5 queries × k=10 exact rows
    val recall = row.getDouble(0)
    assert(recall >= 0.9, s"recall@10 $recall < 0.9")
  }

  test("quantized top-k agrees with float top-k on rank-1 for most queries") {
    val emb = spark.read.parquet(sf() + "/embeddings.parquet")
    val queries = emb.where($"vec_id" < 5)
    val qz = Similarity.quantizedTopK(emb, queries, k = 1)
      .select($"query_id", $"vec_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fl = Similarity.bruteForceTopK(emb, queries, k = 1)
      .select($"query_id", $"vec_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // quantization at 1e-3 on unit-ish vectors rarely flips rank 1;
    // cosine ranking and dot ranking differ only via per-vector norms,
    // which are ~constant for these embeddings
    val agree = qz.count { case (q, v) => fl.get(q).contains(v) }
    assert(agree >= 3, s"only $agree/5 rank-1 agreements")
  }
}
