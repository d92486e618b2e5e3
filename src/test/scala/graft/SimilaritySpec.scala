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
    assert(spark.read.parquet(s"$dir/cells").count() === emb.count())
    assert(new java.io.File(s"$dir/cells").listFiles()
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
    // SELF-describing probe: the stored centroids round-trip exactly
    // (floats through parquet are bit-preserving), so the result is
    // identical without any caller-held state
    assert(Similarity.readIvfCentroids(spark, dir).toSeq
      .map { case (c, v) => (c, v.toSeq) } ===
      cents.toSeq.map { case (c, v) => (c, v.toSeq) })
    val selfIndexed = Similarity.ivfTopKIndexedSelf(spark, dir, queries,
      k = 10, nprobe = 4)
      .orderBy($"query_id", $"rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    assert(selfIndexed.toSeq === indexed.toSeq)
  }

  test("filtered ANN: pre-filter inside the probed scan returns the k " +
      "best MATCHING vectors (full probe ≡ brute force over the " +
      "filtered corpus), never a short post-filtered list") {
    val emb = spark.read.parquet(sf() + "/embeddings.parquet")
    val queries = emb.where($"vec_id" < 5)
    val cents = Similarity.collectCentroids(
      Similarity.ivfCentroids(emb, nlist = 8))
    val dir = java.nio.file.Files.createTempDirectory("ivffilt").toString
    Similarity.writeIvfIndex(emb, dir, cents)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy($"query_id", $"rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getInt(3))).toSeq
    val filtered = rows(Similarity.ivfTopKIndexedWhere(spark, dir,
      queries, col("label") === 3, k = 10, nprobe = 8))
    // full probe ≡ brute force over the pre-filtered corpus, scores
    // and ranks bit-equal
    assert(filtered === rows(Similarity.bruteForceTopK(
      emb.where($"label" === 3), queries, k = 10)))
    // every query got its FULL k — the whole point of pre-filtering
    // (a post-filter of the unfiltered top-10 keeps only the ~10% of
    // entries that happen to carry the label)
    assert(filtered.groupBy(_._1).values.forall(_.size === 10))
    val labels = emb.where($"label" === 3).select($"vec_id")
      .collect().map(_.getLong(0)).toSet
    val unfilteredThenPost = rows(Similarity.ivfTopKIndexedSelf(spark,
      dir, queries, k = 10, nprobe = 8))
      .filter(r => labels(r._2))
    assert(unfilteredThenPost.size < filtered.size)
    // results only ever name matching vectors
    assert(filtered.forall(r => labels(r._2)))
  }

  test("fvec_mean equals the per-dimension avg fan-out, in one aggregate") {
    val rows: Seq[(Int, Array[Float])] = Seq(
      (0, Array(1.0f, 2.0f, 3.0f)),
      (0, Array(3.0f, 4.0f, 5.0f)),
      (1, Array(10.0f, 20.0f, 30.0f)),
      (1, null)) // null ROW: skipped
    val df = rows.toDF("g", "e").repartition(4) // force partial + merge
    val viaKernel = df.groupBy($"g")
      .agg(graft.functions.sketches.fvec_mean($"e").as("m"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Float](1)).toMap
    val viaAvg = df.groupBy($"g")
      .agg(array((0 until 3).map(i =>
        avg(element_at($"e", i + 1)).cast("float")): _*).as("m"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Float](1)).toMap
    assert(viaKernel === viaAvg)
    assert(viaKernel(0) === Seq(2.0f, 3.0f, 4.0f))
    assert(viaKernel(1) === Seq(10.0f, 20.0f, 30.0f))
    // all-null group → null mean, not a crash or zero vector
    val allNull = Seq((0, null.asInstanceOf[Array[Float]])).toDF("g", "e")
      .groupBy($"g")
      .agg(graft.functions.sketches.fvec_mean($"e").as("m")).collect()
    assert(allNull.length === 1 && allNull(0).isNullAt(1))
    // mixed vector lengths violate the dense contract loudly
    val ex = intercept[org.apache.spark.SparkException] {
      Seq((0, Array(1.0f)), (0, Array(1.0f, 2.0f))).toDF("g", "e")
        .coalesce(1).groupBy($"g")
        .agg(graft.functions.sketches.fvec_mean($"e")).collect()
    }
    assert(ex.getMessage.contains("mixed vector lengths") ||
      ex.getCause != null &&
        ex.getCause.getMessage.contains("mixed vector lengths"))
    // array<double> input is rejected at analysis time, not silently
    // misread through 4-byte float slots
    val tex = intercept[org.apache.spark.sql.AnalysisException] {
      Seq((0, Array(1.0, 2.0))).toDF("g", "e").groupBy($"g")
        .agg(graft.functions.sketches.fvec_mean($"e")).collect()
    }
    assert(tex.getMessage.contains("array<float>"), tex.getMessage)
  }

  test("k-means at dim 512 plans ONE aggregate expression, not 512") {
    val rnd = new scala.util.Random(7)
    val corpus = (0 until 40).map(i =>
      (i.toLong, Array.fill(512)(rnd.nextFloat()))).toDF("vec_id", "embedding")
    val cents = Similarity.kmeansCentroids(corpus, nlist = 4, iters = 1)
    assert(cents.length === 4)
    assert(cents.forall(_._2.length === 512))
    // the plan shape that makes this viable: a single fvec_mean
    // aggregate, no per-dimension element_at fan-out
    val plan = corpus
      .agg(graft.functions.sketches.fvec_mean($"embedding"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("fvec_mean"), plan.take(2000))
    assert(!plan.contains("element_at"), plan.take(2000))
    assert("fvec_mean".r.findAllIn(plan).size <= 4, // partial+final ×2 lines
      plan.take(2000))
  }

  test("q70 gate: IVF recall@10 >= 0.9 at a 1/8 probe ratio, with the " +
      "replication cost disclosed in the row; the driver entry pins " +
      "both as verdict bits") {
    val emb = spark.read.parquet(sf() + "/embeddings.parquet")
    val row = Similarity.ivfRecallStats(emb, emb.where($"vec_id" < 5),
      k = 10, nlist = 64, nprobe = 8, multiAssign = 8).head()
    assert(row.getAs[Long]("n_exact") === 50L) // 5 queries × k=10
    val recall = row.getAs[Double]("recall_at_k")
    assert(recall >= 0.9, s"recall@10 $recall < 0.9")
    // the pruning ratio the gate is earned at: 8 of 64 cells
    assert(row.getAs[Double]("probe_frac") === 0.125)
    // isotropic data buys that recall with multi-assign replication —
    // the row must disclose the real scanned fraction, not hide it
    val scanFrac = row.getAs[Double]("scan_frac")
    assert(scanFrac > 0.125 && scanFrac < 0.8, s"scan_frac $scanFrac")
    assert(row.getAs[Int]("multi_assign") === 8)
    // the oracle-checked shape: the same floors as verdict bits
    val bits = SparkEntry.queries("q70_ivf_recall")(spark, sf()).head()
    assert(bits.getAs[Boolean]("recall_ge_floor"))
    assert(bits.getAs[Boolean]("scan_le_ceiling"))
  }

  test("ivfRecallStats scan_frac is exact for external query sets: full " +
      "probing reports 1.0, never > 1") {
    val rnd = new scala.util.Random(3)
    val corpus = (0 until 60).map(i =>
      (i.toLong, Array.fill(16)(rnd.nextFloat()))).toDF("vec_id", "embedding")
    // query ids disjoint from the corpus: no self-pair exclusion applies
    val queries = (1000 until 1003).map(i =>
      (i.toLong, Array.fill(16)(rnd.nextFloat()))).toDF("vec_id", "embedding")
    val row = Similarity.ivfRecallStats(corpus, queries, k = 5,
      nlist = 4, nprobe = 4, kmeansIters = 0, multiAssign = 1)
      .collect()(0)
    assert(row.getDouble(2) === 1.0, s"scan_frac ${row.getDouble(2)}")
    assert(row.getDouble(0) === 1.0) // full probing = exact
  }

  test("on clustered data the IVF prunes for real: recall >= 0.9 at 1/8 " +
      "probes with NO replication and scan_frac near probe_frac") {
    // 16 well-separated gaussian cluster directions, 40 members each
    // with small noise — the shape real embedding corpora have
    val rnd = new scala.util.Random(42)
    val centers = Array.fill(16)(Array.fill(64)(rnd.nextGaussian().toFloat))
    val corpus = (0 until 640).map { i =>
      val c = centers(i % 16)
      (i.toLong, c.map(x => x + 0.1f * rnd.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
    val queries = corpus.where($"vec_id" < 5)
    val row = Similarity.ivfRecallStats(corpus, queries, k = 10,
      nlist = 16, nprobe = 2, kmeansIters = 2, multiAssign = 1)
      .collect()(0)
    val recall = row.getDouble(0)
    assert(recall >= 0.9, s"clustered recall@10 $recall < 0.9")
    // single assignment, 2 of 16 cells probed: the scan really shrinks
    val scanFrac = row.getDouble(2)
    assert(scanFrac <= 0.4, s"clustered scan_frac $scanFrac")
    assert(row.getInt(4) === 1)
    // the two-level quantizer holds the same gate on the same data:
    // well-separated families route identically through the hierarchy
    val two = Similarity.ivfRecallStats(corpus, queries, k = 10,
      nlist = 16, nprobe = 2, kmeansIters = 2, multiAssign = 1,
      quantizer = "two-level").collect()(0)
    assert(two.getDouble(0) >= 0.9, s"two-level recall $two")
    assert(two.getDouble(2) <= 0.4, s"two-level scan_frac $two")
    intercept[IllegalArgumentException] {
      Similarity.ivfRecallStats(corpus, queries, quantizer = "nope")
        .collect()
    }
    // "auto" resolves by the measured crossover: exact flat assignment
    // while it is cheap, two-level once the flat argmax would outgrow
    // the codegen budget
    assert(Similarity.resolveQuantizer("auto", 64) === "flat")
    assert(Similarity.resolveQuantizer("auto", 65) === "two-level")
    assert(Similarity.resolveQuantizer("flat", 1000) === "flat")
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

  test("sq8 encode: one signed byte per dimension, deterministic, " +
      "matches a scala-side normalize-then-quantize; zero vector " +
      "encodes all-zero") {
    val df = Seq(
      (1L, Array(3.0f, 4.0f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val codes = Similarity.sq8Encode(df).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("code")).toMap
    // (3,4,0)/5 * 127 = (76.2, 101.6, 0) → rint → (76, 102, 0)
    assert(codes(1L).toSeq === Seq[Byte](76, 102, 0))
    assert(codes(2L).toSeq === Seq[Byte](0, 0, 0))
    // 4× smaller than the f32 array, by construction
    assert(codes(1L).length === 3)
    // i8 kernels agree with a scala-side computation
    val r = Seq((Array[Byte](76, 102, 0), Array[Byte](127, 0, 0)))
      .toDF("a", "b")
      .select(native.i8vec_dot($"a", $"b"), native.i8vec_norm($"a"),
        native.i8vec_cosine($"a", $"b")).head()
    assert(r.getLong(0) === 76L * 127L)
    assert(math.abs(r.getDouble(1) -
      math.sqrt((76 * 76 + 102 * 102).toDouble)) < 1e-12)
    assert(math.abs(r.getDouble(2) -
      76.0 * 127 / (r.getDouble(1) * 127.0)) < 1e-12)
    // zero-norm code → cosine 0.0, not NaN
    val z = Seq((Array[Byte](0, 0), Array[Byte](1, 1))).toDF("a", "b")
      .select(native.i8vec_cosine($"a", $"b")).head().getDouble(0)
    assert(z === 0.0)
  }

  test("sq8 top-k with full re-rank is BIT-IDENTICAL to the exact " +
      "brute force; pure quantized ranking keeps high recall on real " +
      "embeddings and the honesty row prices the trade") {
    val emb = spark.read.parquet(sf() + "/embeddings.parquet")
    val queries = emb.where($"vec_id" < 5)
    val n = emb.count().toInt
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getInt(3))).toSeq
    // r ≥ |corpus|: every pair re-scored exactly → the proven endpoint
    assert(rows(Similarity.sq8TopK(emb, queries, k = 10, rerank = n)) ===
      rows(Similarity.bruteForceTopK(emb, queries, k = 10)))
    // pure quantized ranking: recall floored on the real testdata
    // (int8 on unit vectors loses ~1e-2 cosine resolution — far below
    // these embeddings' neighbour gaps)
    val stats = Similarity.sq8RecallStats(emb, queries, k = 10).head()
    assert(stats.getDouble(0) >= 0.9,
      s"sq8 recall@10 ${stats.getDouble(0)}")
    assert(stats.getLong(1) === 50L)
    val d = stats.getInt(2)
    assert(stats.getInt(3) === d * 4 &&
      stats.getInt(4) === d) // the 4× storage story, from the data
    // the oracle-checked entry shape: the same floor as a verdict bit
    val bits = SparkEntry.queries("q107_sq8_recall")(spark, sf()).head()
    assert(bits.getAs[Boolean]("recall_ge_floor"))
  }

  test("SQ8-storage IVF index: quantized probed scan + bucket-pruned " +
      "exact re-rank — full probe/full re-rank bit-identical to the " +
      "f32 index; production re-rank holds the recall gate with EXACT " +
      "scores; the filtered probe matches filtered brute force") {
    val emb = spark.read.parquet(sf() + "/embeddings.parquet")
    val queries = emb.where($"vec_id" < 5)
    val cents = Similarity.collectCentroids(
      Similarity.ivfCentroids(emb, nlist = 8))
    val f32Dir = java.nio.file.Files
      .createTempDirectory("ivf_f32").toString
    val sqDir = java.nio.file.Files
      .createTempDirectory("ivf_sq8").toString
    Similarity.writeIvfIndex(emb, f32Dir, cents)
    Similarity.writeIvfIndex(emb, sqDir, cents, storage = "sq8",
      vecBuckets = 8)
    // the layout: cells/ holds codes (no f32), vectors/ holds the f32
    // arrays under id-hash bucket partitions
    val cellCols = spark.read.parquet(s"$sqDir/cells")
      .schema.fieldNames.toSet
    assert(cellCols.contains("code") && !cellCols.contains("embedding"))
    assert(new java.io.File(s"$sqDir/vectors").listFiles()
      .count(_.getName.startsWith("vbucket=")) > 1)
    assert(Similarity.readIvfStorage(spark, sqDir) === ("sq8", 8))
    assert(Similarity.readIvfStorage(spark, f32Dir) === ("f32", 0))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy($"query_id", $"rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getInt(3))).toSeq
    // full probe + full re-rank: every candidate re-scored exactly →
    // bit-identical to the f32 probe (scores AND ranks)
    val exact = rows(Similarity.ivfTopKIndexedSelf(spark, f32Dir,
      queries, k = 10, nprobe = 8))
    assert(rows(Similarity.ivfTopKIndexedSelf(spark, sqDir, queries,
      k = 10, nprobe = 8, rerank = 1000000)) === exact)
    // production re-rank (4k): the recall gate holds, and every
    // returned pair's cosine is the EXACT f32 score (re-rank always
    // re-scores — quantization error can only hide in WHICH tail
    // candidates made the cut, never in a reported score)
    val prod = rows(Similarity.ivfTopKIndexedSelf(spark, sqDir,
      queries, k = 10, nprobe = 8))
    val exactPairs = exact.map(r => (r._1, r._2)).toSet
    val recall = prod.map(r => (r._1, r._2)).toSet
      .intersect(exactPairs).size.toDouble / exact.size
    assert(recall >= 0.9, s"sq8 indexed recall@10 $recall")
    val exactScore = exact.map(r => (r._1, r._2) -> r._3).toMap
    assert(prod.forall(r => exactScore.get((r._1, r._2))
      .forall(_ === r._3)))
    // filtered probe: predicate lands in the quantized scan (cells/
    // carries the extra columns); at full probe/re-rank it equals
    // brute force over the pre-filtered corpus bit-exactly
    assert(rows(Similarity.ivfTopKIndexedWhere(spark, sqDir, queries,
      col("label") === 3, k = 10, nprobe = 8, rerank = 1000000)) ===
      rows(Similarity.bruteForceTopK(emb.where($"label" === 3),
        queries, k = 10)))
  }

  test("SQ8 IVF lifecycle: append folds raw batches in (vectors/ + " +
      "codes), compaction collapses retried-append duplicates, " +
      "deletion is vbucket-local, rebuild keeps the sq8 storage, and " +
      "the semantic-dedup probe refuses the quantized layout") {
    import graft.operators.Dedup
    val emb = spark.read.parquet(sf() + "/embeddings.parquet")
      .localCheckpoint()
    val queries = emb.where($"vec_id" < 5).localCheckpoint()
    val base = emb.where($"vec_id" % 2 === 0)
    val batch = emb.where($"vec_id" % 2 =!= 0)
    val cents = Similarity.collectCentroids(
      Similarity.ivfCentroids(emb, nlist = 8))
    val dir = java.nio.file.Files
      .createTempDirectory("ivf_sq8life").toString
    Similarity.writeIvfIndex(base, dir, cents, storage = "sq8",
      vecBuckets = 8)
    Similarity.appendIvfIndex(batch, dir)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy($"query_id", $"rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getInt(3))).toSeq
    def probe() = rows(Similarity.ivfTopKIndexedSelf(spark, dir,
      queries, k = 10, nprobe = 8, rerank = 1000000))
    // append-then-probe ≡ whole-corpus brute force (codes and cells
    // are per-row functions of (vector, stored geometry))
    val whole = rows(Similarity.bruteForceTopK(emb, queries, k = 10))
    assert(probe() === whole)
    // retried append: answers unchanged at the duplicate-row price;
    // compaction reclaims both sub-datasets to one file per partition
    Similarity.appendIvfIndex(batch, dir)
    assert(probe() === whole)
    val vecs = () => spark.read.parquet(s"$dir/vectors")
    assert(vecs().count() > vecs().dropDuplicates("vec_id").count())
    Dedup.compactIndex(spark, dir)
    assert(vecs().count() === vecs().dropDuplicates("vec_id").count())
    assert(probe() === whole)
    // stats surface reports the re-rank side like any bucketed dataset
    val stats = Dedup.indexStats(spark, dir)
    assert(stats.where($"dataset" === "vectors").count() === 1L)
    // deletion: the id leaves cells AND vectors, by touched vbucket —
    // untouched vbucket part files stay byte-identical by name
    def fileNames(sub: String): Map[String, Set[String]] =
      new java.io.File(sub).listFiles().filter(_.isDirectory)
        .map(d => d.getName ->
          d.listFiles().map(_.getName).filter(_.endsWith(".parquet"))
            .toSet).toMap
    val before = fileNames(s"$dir/vectors")
    Dedup.deleteFromIndex(spark, dir, Seq(2L).toDF("vec_id"))
    val after = fileNames(s"$dir/vectors")
    (before.keySet - "vbucket=2").foreach(b =>
      assert(after(b) === before(b), s"untouched $b rewritten"))
    assert(after("vbucket=2") !== before("vbucket=2"))
    assert(vecs().where($"vec_id" === 2L).count() === 0L)
    assert(spark.read.parquet(s"$dir/cells")
      .where($"vec_id" === 2L).count() === 0L)
    val minus2 = rows(Similarity.bruteForceTopK(
      emb.where($"vec_id" =!= 2L), queries, k = 10))
    assert(probe() === minus2)
    // rebuild re-trains geometry from the EXACT staged floats and
    // keeps the sq8 storage + bucket count
    Similarity.rebuildIvfIndex(spark, dir, nlist = 4, iters = 1)
    assert(Similarity.readIvfStorage(spark, dir) === ("sq8", 8))
    assert(rows(Similarity.ivfTopKIndexedSelf(spark, dir, queries,
      k = 10, nprobe = 4, rerank = 1000000)) === minus2)
    // the semantic-dedup probe needs exact f32 cells — refuses sq8
    val e = intercept[IllegalArgumentException] {
      Dedup.semanticNearDupAgainstIndex(spark,
        queries.select($"vec_id", $"embedding"), dir)
    }
    assert(e.getMessage.contains("f32"))
  }

  test("q112 gate: fused-SQ8 indexed probe recall@10 >= 0.9 at the " +
      "8/64 probe ratio (multiAssign=8, default 4·k re-rank), recall " +
      "measured against the index's own f32 side") {
    val emb = spark.read.parquet(sf() + "/embeddings.parquet")
      .localCheckpoint()
    val queries = emb.where($"vec_id" < 5).localCheckpoint()
    val dir = java.nio.file.Files
      .createTempDirectory("sq8_recall_gate").toString
    Similarity.writeIvfIndex(emb, dir, Similarity.collectCentroids(
        Similarity.ivfCentroids(emb, nlist = 64)),
      storage = "sq8", vecBuckets = 16, multiAssign = 8)
    val r = Similarity.sq8IndexedRecallStats(spark, dir, queries,
      k = 10, nprobe = 8).head()
    assert(r.getAs[Double]("recall_at_k") >= 0.9,
      s"recall ${r.getAs[Double]("recall_at_k")}")
    assert(r.getAs[Double]("probe_frac") === 0.125)
    assert(r.getAs[Int]("rerank_per_query") === 40)
    // the oracle-checked entry shape: the same floor as a verdict bit
    val bits = SparkEntry.queries("q112_sq8_ivf_recall")(spark, sf())
      .head()
    assert(bits.getAs[Boolean]("recall_ge_floor"))
  }

  test("f32→sq8 conversion rebuild inherits the WRITE-path vecBuckets " +
      "default (64), never a single bucket; the cached storage " +
      "dispatch follows the rewritten params") {
    val emb = spark.read.parquet(sf() + "/embeddings.parquet")
      .localCheckpoint()
    val queries = emb.where($"vec_id" < 5).localCheckpoint()
    val dir = java.nio.file.Files
      .createTempDirectory("ivf_f32_to_sq8").toString
    Similarity.writeIvfIndex(emb, dir, Similarity.collectCentroids(
      Similarity.ivfCentroids(emb, nlist = 4)))
    // prime the per-JVM cache on the f32 layout
    assert(Similarity.readIvfStorage(spark, dir) === ("f32", 0))
    // convert without an explicit vecBuckets: the f32 index has no
    // stored bucket count to inherit (svb = 0), and falling to 1
    // would put the whole exact re-rank side in ONE vbucket partition
    Similarity.rebuildIvfIndex(spark, dir, nlist = 4, iters = 1,
      storage = "sq8")
    // the rewritten params re-stamp the cache key — the dispatch sees
    // the new layout in the SAME JVM, at the write-path default
    assert(Similarity.readIvfStorage(spark, dir) === ("sq8", 64))
    assert(new java.io.File(s"$dir/vectors").listFiles()
      .count(_.getName.startsWith("vbucket=")) > 1)
    // conversion preserved answers: full-re-rank probe ≡ brute force
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy($"query_id", $"rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getInt(3))).toSeq
    val whole = rows(Similarity.bruteForceTopK(emb, queries, k = 10))
    assert(rows(Similarity.ivfTopKIndexedSelf(spark, dir, queries,
        k = 10, nprobe = 4, rerank = 1000000)) === whole)
    // ...and the conversion BACK is lossless (vectors/ holds exact
    // floats): the restored f32 index probes identically, and the
    // semantic-dedup probe — which refuses sq8 — works again, which
    // is the refusal message's documented escape hatch
    Similarity.rebuildIvfIndex(spark, dir, nlist = 4, iters = 1,
      storage = "f32")
    assert(Similarity.readIvfStorage(spark, dir) === ("f32", 0))
    assert(!new java.io.File(s"$dir/vectors").exists())
    assert(rows(Similarity.ivfTopKIndexedSelf(spark, dir, queries,
        k = 10, nprobe = 4)) === whole)
    graft.operators.Dedup.semanticNearDupAgainstIndex(spark,
      queries.select($"vec_id", $"embedding"), dir).collect()
  }
}
