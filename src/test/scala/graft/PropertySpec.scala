package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, RiskAggregation}

/** Property-style invariants over seeded random inputs (SURVEY.md §5:
  * cube totals, dedup idempotence, salted-vs-plain equivalence,
  * fingerprint determinism). Plain seeded loops — the scalatest+scalacheck
  * bridge artifact is not in the offline cache.
  */
class PropertySpec extends SparkSuite {
  import spark.implicits._

  private val words = Array("alpha", "beta", "gamma", "delta", "eps")
  private def randomDocs(rnd: scala.util.Random, n: Int = 20) =
    (0 until n).map { i =>
      (i.toLong, Seq.fill(12)(words(rnd.nextInt(words.length)))
        .mkString(" "))
    }.toDF("doc_id", "text")

  test("exact dedup is idempotent; group sizes sum to corpus size") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val docs = randomDocs(rnd)
      val once = Dedup.exactDedup(docs)
      assert(once.count() === Dedup.exactDedup(once).count())
      assert(Dedup.exactGroups(docs).agg(sum($"n_copies"))
        .collect()(0).getLong(0) === 20L)
    }
  }

  test("salted distinct count equals plain distinct count") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val df = (0 until 100)
        .map(_ => (s"g${rnd.nextInt(4)}", s"v${rnd.nextInt(30)}"))
        .toDF("grp", "ip")
      val plain = df.select($"grp", $"ip").distinct()
        .groupBy($"grp").agg(count(lit(1)).as("count"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val salted = RiskAggregation
        .skewSafeDistinctCount(df, Seq("grp"), "ip", salts = 4)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(salted === plain)
    }
  }

  test("bucketed as-of equals join+argmax over random keys, times, and " +
      "bucket widths") {
    import graft.operators.Joins
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      // timestamps across ~3 years incl. exact bucket-edge collisions
      def randTs() = new java.sql.Timestamp(
        1500000000000L + rnd.nextInt(100000).toLong * 1000000L)
      // ~5% null times on both sides: asOf drops them via the time
      // predicate; the bucketed variant must agree, not leak null-time
      // rows through the carry path
      def maybeNull(t: java.sql.Timestamp): java.sql.Timestamp =
        if (rnd.nextInt(20) == 0) null else t
      val left = (1 to 120).map(i =>
        (i.toLong, rnd.nextInt(8).toLong, maybeNull(randTs())))
        .toDF("lid", "k", "lt")
      val right = (1 to 150).map(i =>
        (rnd.nextInt(8).toLong, 1000L + i, maybeNull(randTs()),
          rnd.nextInt(100)))
        .toDF("k", "rid", "rt", "v")
      val plain = Joins.asOf(left, right, "k", "lt", "rt", "lid", "rid",
        Seq("rid", "rt", "v")).orderBy($"lid")
        .collect().map(_.toSeq).toSeq
      for (width <- Seq(3600L, 86400L, 40L * 86400L)) {
        val bucketed = Joins.asOfBucketed(left, right, "k", "lt", "rt",
          "lid", "rid", Seq("rid", "rt", "v"), bucketSeconds = width)
          .orderBy($"lid").collect().map(_.toSeq).toSeq
        assert(bucketed === plain, s"seed=$seed width=$width")
      }
    }
  }

  test("bucketed range join equals the broadcast theta-join over random " +
      "intervals and bucket widths") {
    import graft.operators.Joins
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val left = (1 to 150).map(i => (i.toLong, rnd.nextDouble() * 1000))
        .toDF("lid", "v")
      val right = (1 to 40).map { i =>
        val lo = rnd.nextDouble() * 900
        (1000L + i, lo, lo + rnd.nextDouble() * 200)
      }.toDF("rid", "lo", "hi")
      val theta = Joins.range(left, right, col("v"), col("lo"), col("hi"))
        .select($"lid", $"rid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      for (width <- Seq(7.0, 50.0, 333.0)) {
        val bucketed = Joins.rangeBucketed(left, right, col("v"),
          col("lo"), col("hi"), bucketWidth = width)
          .select($"lid", $"rid").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(bucketed === theta, s"seed=$seed width=$width")
      }
    }
  }

  test("bucketed range join clamps open-ended and out-of-range intervals " +
      "to the observed value range (no axis-wide replication)") {
    import graft.operators.Joins
    val left = (1 to 100).map(i => (i.toLong, i * 10.0)).toDF("lid", "v")
    val right = Seq(
      (1L, 0.0, Double.MaxValue),      // open-ended: every left row
      (2L, 500.0, 1e15),               // sentinel hi
      (3L, -1e12, 250.0),              // sentinel lo
      (4L, 5e6, 6e6),                  // entirely above the range
      (5L, -100.0, -50.0)              // entirely below the range
    ).toDF("rid", "lo", "hi")
    val theta = Joins.range(left, right, col("v"), col("lo"), col("hi"))
      .select($"lid", $"rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bucketed = Joins.rangeBucketed(left, right, col("v"),
      col("lo"), col("hi"), bucketWidth = 50.0)
    assert(bucketed.select($"lid", $"rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet === theta)
    // the whole point of the clamp: replication stays bounded by the
    // buckets the left side occupies (v in [10,1000] / 50 → 21 buckets),
    // so the exploded right side is ≤ intervals × occupied-axis, nowhere
    // near Double.MaxValue / bucketWidth
    val exploded = right
      .where(col("hi") > 10.0 && col("lo") <= 1000.0)
      .withColumn("__bkt", explode(sequence(
        floor(greatest(col("lo"), lit(10.0)) / 50.0).cast("long"),
        floor(least(col("hi"), lit(1000.0)) / 50.0).cast("long"))))
      .count()
    assert(exploded <= 3 * 21)
    // empty left: no matches and no runaway explode either
    assert(Joins.rangeBucketed(left.where(lit(false)), right, col("v"),
      col("lo"), col("hi"), bucketWidth = 50.0).count() === 0)
    // a NaN left value must not defeat the clamp (Spark orders NaN above
    // every double, so an unguarded max(value) would return NaN and
    // least(hi, NaN) would keep the raw Double.MaxValue sentinel)
    val withNaN = left.unionByName(
      Seq((999L, Double.NaN)).toDF("lid", "v"))
    val thetaN = Joins.range(withNaN, right, col("v"), col("lo"),
      col("hi")).select($"lid", $"rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(Joins.rangeBucketed(withNaN, right, col("v"), col("lo"),
      col("hi"), bucketWidth = 50.0)
      .select($"lid", $"rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet === thetaN)
    assert(!thetaN.exists(_._1 == 999L)) // NaN matches no interval
    // all-NaN left behaves like empty (min/max of zero non-NaN rows)
    assert(Joins.rangeBucketed(
      Seq((1L, Double.NaN)).toDF("lid", "v"), right, col("v"),
      col("lo"), col("hi"), bucketWidth = 50.0).count() === 0)
    // integer-typed values take the non-isnan bounds path; a
    // Long.MaxValue sentinel interval still clamps to the observed range
    val leftL = (1 to 50).map(i => (i.toLong, i.toLong * 10))
      .toDF("lid", "v")
    val rightL = Seq((1L, 0L, Long.MaxValue), (2L, -100L, 200L),
      (3L, 9000L, 9999L)).toDF("rid", "lo", "hi")
    val thetaL = Joins.range(leftL, rightL, col("v"), col("lo"),
      col("hi")).select($"lid", $"rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(Joins.rangeBucketed(leftL, rightL, col("v"), col("lo"),
      col("hi"), bucketWidth = 100.0)
      .select($"lid", $"rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet === thetaL)
  }

  test("jaccard stays within [0,1]; emitted pairs are ordered") {
    for (seed <- 1 to 3) {
      val docs = randomDocs(new scala.util.Random(seed))
      Dedup.nearDupPairs(docs, threshold = 0.0).collect().foreach { r =>
        val j = r.getDouble(2)
        assert(j >= 0.0 && j <= 1.0)
        assert(r.getLong(0) < r.getLong(1))
      }
    }
  }

  test("rolling hash equals its reference implementation after " +
      "normalization") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 10) {
      val s = rnd.alphanumeric.take(rnd.nextInt(40) + 1).mkString
      val got = Seq(s).toDF("t")
        .select(graft.operators.TextAnalysis.rollingHash($"t"))
        .collect()(0).getLong(0)
      val norm = s.toLowerCase.replaceAll("\\s+", " ")
      assert(got === graft.functions.RollingHashExpr.hashBytes(
        norm.getBytes("UTF-8"), 257L, 1000000007L))
    }
  }

  test("cube leaf sums equal the grand total for random facts") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val fact = (0 until 30).map { i =>
        val r = rnd.nextInt(3) + 1
        (java.sql.Date.valueOf(s"2024-0$r-01"), r,
          s"C${rnd.nextInt(5)}", i.toLong, rnd.nextInt(9) + 1L, 0.0)
      }.toDF("date", "risk", "country", "asn", "count", "count_amplified")
      val cube = graft.operators.StarSchema.cubeRollup(fact, "month")
      val grand = cube.where($"date".isNull && $"country".isNull &&
        $"risk".isNull).select($"count").collect()(0).getLong(0)
      assert(grand === fact.agg(sum($"count")).collect()(0).getLong(0))
    }
  }

  test("semantic pairs ⊆ exact pairs for random data, both quantizers") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 3) {
      val n = 60 + rnd.nextInt(60)
      val dim = 8 + 4 * rnd.nextInt(3)
      val data = (0 until n).map(i =>
        (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat)))
        .toDF("vec_id", "embedding")
      val th = 0.1 + rnd.nextDouble() * 0.4
      val nlist = Seq(4, 8, 16)(rnd.nextInt(3))
      val m = 1 + rnd.nextInt(2)
      val exact = graft.operators.Similarity.cosinePairsExact(data, th)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      for (q <- Seq("flat", "two-level")) {
        val found = Dedup.semanticNearDupPairs(data, nlist, th,
          kmeansIters = 1, multiAssign = m, quantizer = q).collect()
        found.foreach { r =>
          val pair = (r.getLong(0), r.getLong(1))
          assert(r.getLong(0) < r.getLong(1), s"$q $trial unordered $pair")
          assert(exact.contains(pair),
            s"$q trial=$trial th=$th nlist=$nlist m=$m: $pair not exact")
        }
        // no duplicate pair rows survive multi-assignment
        val ids = found.map(r => (r.getLong(0), r.getLong(1)))
        assert(ids.distinct.length === ids.length, s"$q dup pairs")
      }
    }
  }

  test("weighted sample nests monotonically in k and respects " +
      "eligibility") {
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 3) {
      val rows = (0 until 80).map { i =>
        val w = rnd.nextInt(5) match {
          case 0 => 0.0
          case 1 => -rnd.nextDouble()
          case _ => rnd.nextDouble() * (i + 1)
        }
        (i.toLong, w)
      }.toDF("doc_id", "w")
      val eligible = rows.where($"w" > 0).count()
      // deterministic total order (key desc, id asc) ⇒ top-k nests
      val samples = Seq(5, 15, 40, 100).map { k =>
        k -> graft.operators.Sharding.weightedSample(rows, k, $"w")
          .collect().map(_.getLong(0)).toSet
      }
      samples.foreach { case (k, s) =>
        assert(s.size === math.min(k.toLong, eligible), s"k=$k")
      }
      samples.sliding(2).foreach { case Seq((k1, s1), (_, s2)) =>
        assert(s1.subsetOf(s2), s"trial $trial: sample($k1) not nested")
      }
    }
  }

  test("retraction-ledger n_remaining equals the actual corpus count " +
      "under random (overlapping, repeated) retraction sequences") {
    for (seed <- 1 to 2) {
      val rnd = new scala.util.Random(400 + seed)
      val idxRoot = java.nio.file.Files
        .createTempDirectory(s"graft_ledgerprop_idx$seed").toString
      val corpusDir = java.nio.file.Files
        .createTempDirectory(s"graft_ledgerprop_c$seed").toString
      val n = 10
      // pairwise-distinct vocabularies: no near-dups, so the published
      // corpus is the whole batch and the ledger starts from n rows
      val docs = (0 until n).map(i => (i.toLong,
        (0 until 8).map(j => s"w${i}x$j").mkString(" ")))
        .toDF("doc_id", "text")
      Pipeline.refreshCorpus(spark, docs, idxRoot, corpusDir,
        chunkTokens = 4, bandBuckets = 8, pieceBuckets = 8,
        chunkBuckets = 8)
      for (_ <- 1 to 3) {
        // random subset, deliberately allowed to overlap earlier
        // retractions and to repeat ids
        val ids = (0 until (1 + rnd.nextInt(4)))
          .map(_ => rnd.nextInt(n).toLong)
        val report = Pipeline.retractCorpus(spark,
          ids.toDF("doc_id"), idxRoot, corpusDir).head()
        val actual = spark.read.parquet(s"$corpusDir/corpus").count()
        assert(report.getAs[Long]("n_remaining") === actual,
          s"seed $seed ids $ids: ledger disagrees with the corpus")
      }
    }
  }

  test("reconstructDocs inverts materializeSequences for random " +
      "corpora, seqLens, and eos modes; epoch keys permute the same " +
      "id set") {
    import graft.operators.{Bpe, Sharding}
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(seed)
      // variable-length docs (1..20 words) force a mix of mid-doc
      // cuts, multi-doc sequences, and doc-spanning sequences; one
      // deterministic tokenless doc rides along under eos ON
      val docs = ((0 until 15).map { i =>
        (i.toLong, Seq.fill(1 + rnd.nextInt(20))(
          words(rnd.nextInt(words.length))).mkString(" "))
      } :+ (15L, " ")).toDF("doc_id", "text")
      val model = Bpe.trainModel(docs, numMerges = 4 + rnd.nextInt(8),
        maxTypes = 100)
      val seqLen = 3L + rnd.nextInt(10)
      for (eos <- Seq(Some(Bpe.eosIdOf(model)), None)) {
        val seqs = Sharding.materializeSequences(docs, model, seqLen,
          eosId = eos)
        val got = Sharding.reconstructDocs(seqs, eos)
          .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
        val want = Bpe.encodeIds(docs, model)
          .select($"doc_id", $"ids").collect()
          .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
        // with eos OFF the tokenless doc packs nothing and is absent
        // from the reconstruction; with eos ON it reconstructs empty
        val expectIds =
          if (eos.isDefined) want.keySet else want.filter(_._2.nonEmpty).keySet
        assert(got.keySet === expectIds, s"seed $seed seqLen $seqLen eos $eos")
        got.foreach { case (id, ids) =>
          assert(ids === want(id),
            s"seed $seed seqLen $seqLen eos $eos doc $id") }
      }
      // the epoch key is a permutation of whatever id set it is
      // given, at any epoch (no collision-induced loss at the sort)
      val ids = (0 until 50).map(_ => rnd.nextLong() & 0xffffffL)
        .distinct.map(Tuple1(_)).toDF("seq_id")
      val e = rnd.nextInt(100)
      val ordered = Sharding.epochOrder(ids, e)
        .orderBy($"epoch_key", $"seq_id")
        .collect().map(_.getLong(0))
      assert(ordered.sorted.toSeq ===
        ids.collect().map(_.getLong(0)).sorted.toSeq, s"seed $seed epoch $e")
    }
  }

  test("packIdStreams ∘ reconstructDocs is the identity re-cut of a " +
      "dense artifact for random corpora, seqLens, and eos modes — " +
      "the compaction invariant") {
    import graft.operators.{Bpe, Sharding}
    for (seed <- 11 to 13) {
      val rnd = new scala.util.Random(seed)
      val docs = (0 until 12).map { i =>
        (i.toLong, Seq.fill(1 + rnd.nextInt(16))(
          words(rnd.nextInt(words.length))).mkString(" "))
      }.toDF("doc_id", "text")
      val model = Bpe.trainModel(docs, numMerges = 4 + rnd.nextInt(6),
        maxTypes = 100)
      val seqLen = 3L + rnd.nextInt(8)
      for (eos <- Seq(Some(Bpe.eosIdOf(model)), None)) {
        val seqs = Sharding.materializeSequences(docs, model, seqLen,
          eosId = eos)
        // reconstruct with eos KEPT in stream (the compaction path),
        // re-cut at the same seqLen: a dense artifact re-cuts to
        // itself bit-for-bit — ids, spans, and n_ids
        def img(df: org.apache.spark.sql.DataFrame) = df
          .selectExpr("seq_id",
            "md5(array_join(transform(ids, x -> cast(x as string)), " +
              "' ')) AS ih",
            "md5(array_join(transform(spans, x -> concat(" +
              "cast(x.doc_id as string), ':', " +
              "cast(x.seq_from as string), ':', " +
              "cast(x.n_tokens as string))), ' ')) AS sh",
            "n_ids")
          .collect()
          .map(r => r.getLong(0) ->
            (r.getString(1), r.getString(2), r.getInt(3))).toMap
        val want = img(seqs)
        val got = img(Sharding.packIdStreams(
          Sharding.reconstructDocs(seqs), seqLen))
        assert(got === want, s"seed $seed seqLen $seqLen eos $eos")
      }
    }
  }
}
