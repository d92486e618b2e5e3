package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Dedup operators: exact, MinHash+LSH recall on planted near-duplicates,
  * SimHash, Jaccard verification, embedding near-dup.
  */
class DedupSpec extends SparkSuite {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and " +
    "then runs far away into the deep dark forest tonight"

  private def docs = Seq(
    (0L, base),
    (1L, base),                                    // exact dup of 0
    (2L, base.replace("tonight", "today")),        // near-dup of 0
    (3L, "completely different words about spark query engines and " +
      "distributed joins running on large clusters of machines"),
    (4L, "THE  quick   brown fox jumps over the lazy dog and then runs " +
      "far away into the deep dark forest tonight"), // normalizes to 0
    (5L, "yet another unrelated document discussing minhash banding " +
      "signatures buckets and locality sensitive hashing methods"))
    .toDF("doc_id", "text")

  test("exact dedup: normalization-insensitive, lowest id canonical") {
    val groups = Dedup.exactGroups(docs).collect()
    assert(groups.length === 4) // {0,1,4}, {2}, {3}, {5}
    val canon = Dedup.exactDedup(docs).select($"doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(canon === Set(0L, 2L, 3L, 5L))
  }

  test("minhash LSH finds planted near-dup pairs, skips unrelated") {
    val cands = Dedup.minhashCandidates(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact dups must collide on every band; near-dup 0~2 on most
    assert(cands.contains((0L, 1L)))
    assert(cands.contains((0L, 4L)))
    assert(cands.contains((0L, 2L)))
    assert(!cands.contains((3L, 5L))) // unrelated docs don't pair
  }

  test("jaccard verification scores candidates exactly") {
    val verified = Dedup.nearDupPairs(docs, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2))).toSeq
    val exactPair = verified.find(p => p._1 == 0L && p._2 == 1L)
    assert(exactPair.exists(_._3 === 1.0)) // identical shingle sets
    assert(verified.forall(_._3 >= 0.5))
  }

  test("simhash: identical docs have distance 0, near-dups small, " +
      "unrelated docs large") {
    val sigs = Dedup.simhash(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(0L) === sigs(1L))
    assert(sigs(0L) === sigs(4L)) // normalization
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sigs(0L), sigs(2L)) < ham(sigs(0L), sigs(3L)))
    val cands = Dedup.simhashCandidates(docs, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.contains((0L, 1L)))
  }

  test("simhash candidates are COMPLETE within maxHamming " +
      "(pigeonhole chunks derived from the radius)") {
    // many single-word variants → a spread of pairwise hamming distances
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    val variants = (0 until 12).map { i =>
      (i.toLong, base.replace("tonight", words(i)))
    } :+ (99L, base)
    val vdocs = variants.toDF("doc_id", "text")
    val sigs = Dedup.simhash(vdocs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    for (h <- Seq(3, 8, 16)) {
      val expected = (for {
        a <- sigs.keys; b <- sigs.keys
        if a < b && ham(sigs(a), sigs(b)) <= h
      } yield (a, b)).toSet
      val got = Dedup.simhashCandidates(vdocs, maxHamming = h)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === expected, s"maxHamming=$h")
    }
  }

  test("near-dup removal keeps one canonical per cluster plus " +
      "unclustered documents") {
    // docs 0/1/4 are exact/normalized dups, 2 is a near-dup of 0 at
    // threshold 0.5 → cluster {0,1,2,4} keeps only 0; 3 and 5 unrelated
    val survivors = Dedup.nearDupDedup(docs, threshold = 0.5)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors === Set(0L, 3L, 5L))
    // generic tail: same answer through an explicit exact edge set
    val viaExact = Dedup.dedupByClusters(docs,
      Dedup.jaccardAllPairs(docs, threshold = 0.5))
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(viaExact === survivors)
    // the stars-CC strategy (O(log n) rounds, for chain-shaped
    // components) is a drop-in: identical survivors end-to-end
    val viaStars = Dedup.nearDupDedup(docs, threshold = 0.5,
      strategy = "stars")
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(viaStars === survivors)
    intercept[IllegalArgumentException] {
      Dedup.dedupByClusters(docs,
        Dedup.jaccardAllPairs(docs, threshold = 0.5), strategy = "nope")
    }
  }

  test("incremental dedup against a persisted minhash index equals the " +
      "full-corpus run restricted to pairs touching the new batch") {
    // near-dup pairs crossing the batch boundary in both directions,
    // plus within-batch duplication on each side
    val b1 = Seq(
      (0L, base),
      (1L, base.replace("tonight", "today")), // b1-internal near-dup of 0
      (3L, "completely different words about spark query engines and " +
        "distributed joins running on large clusters of machines"))
      .toDF("doc_id", "text")
    val b2 = Seq(
      (10L, base),                            // cross exact dup of 0
      (11L, base.replace("fox", "cat")),      // cross near-dup of 0
      (12L, "yet another unrelated document discussing minhash banding " +
        "signatures buckets and locality sensitive hashing methods"),
      (13L, base.replace("fox", "cat")))      // b2-internal dup of 11
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("mhidx").toString
    Dedup.writeMinhashIndex(b1, dir)
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val incCross = pairSet(
      Dedup.nearDupAgainstIndex(spark, b2, dir, threshold = 0.5))
    val incWithin = pairSet(Dedup.nearDupPairs(b2, threshold = 0.5))
    val full = pairSet(
      Dedup.nearDupPairs(b1.unionByName(b2), threshold = 0.5))
    val b2Ids = Set(10L, 11L, 12L, 13L)
    val fullTouching = full.filter(p => b2Ids(p._1) || b2Ids(p._2))
    // BIT-exact equality, jaccard doubles included: band-bucket
    // collision is a pure per-pair function of the two signatures, and
    // the verify arithmetic is shared — incremental ∪ within-batch must
    // reproduce the full run on every pair touching the batch
    assert((incCross ++ incWithin) === fullTouching)
    assert(incCross.exists(p => p._1 == 0L && p._2 == 10L))
    assert(incWithin.nonEmpty)
    // the non-broadcast (large-batch) probe flavor: identical pairs
    val incShuffle = pairSet(Dedup.nearDupAgainstIndex(spark, b2, dir,
      threshold = 0.5, broadcastProbe = false))
    assert(incShuffle === incCross)
  }

  test("minhash index append folds a batch in; a params mismatch is " +
      "rejected loudly") {
    val b1 = docs.where($"doc_id" <= 2)
    val b2 = Seq((20L, base),
      (21L, "unrelated novel content entirely about something else"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("mhidx2").toString
    Dedup.writeMinhashIndex(b1, dir)
    Dedup.writeMinhashIndex(b2, dir, mode = "append")
    // a batch probed after the append sees BOTH earlier batches
    val b3 = Seq((30L, base)).toDF("doc_id", "text")
    val pairs = Dedup.nearDupAgainstIndex(spark, b3, dir, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 30L)))
    assert(pairs.contains((20L, 30L)))
    // probing with different signature parameters than the index was
    // written with must error, not silently mis-candidate
    intercept[IllegalArgumentException] {
      Dedup.writeMinhashIndex(b2, dir, bands = 4, mode = "append")
    }
  }

  test("exact jaccard against stored index arrays is bit-identical to " +
      "the inline all-pairs run restricted to cross pairs") {
    val b1 = docs.where(pmod($"doc_id", lit(2)) === 0)
    val b2 = docs.where(pmod($"doc_id", lit(2)) === 1)
    val dir = java.nio.file.Files.createTempDirectory("mhidx3").toString
    Dedup.writeMinhashIndex(b1, dir)
    val viaIndex = Dedup.jaccardAllPairsAgainstIndex(spark, b2, dir,
        threshold = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val inline = Dedup.jaccardAllPairs(docs, threshold = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      .filter(p => (p._1 % 2) != (p._2 % 2))
    assert(viaIndex === inline)
    assert(viaIndex.nonEmpty)
  }

  test("incremental chunk dedup against a persisted chunk index equals " +
      "the full-corpus run restricted to the batch (both rules; append " +
      "folds in; params mismatch loud)") {
    // passages shared across the index/batch boundary, within the batch,
    // and fresh — under MONOTONE ids (batch ids > indexed ids)
    val passage = "alpha beta gamma delta epsilon zeta eta theta"
    val b1 = Seq(
      (0L, s"$passage one two three four five six seven eight"),
      (1L, "completely unrelated indexed content about spark engines " +
        "and distributed query planning at scale"))
      .toDF("doc_id", "text")
    val b2 = Seq(
      (10L, s"$passage nine ten eleven twelve thirteen fourteen"),
      (11L, s"fresh words only here nothing shared $passage"),
      (12L, "entirely novel batch document with no overlap whatsoever " +
        "to anything indexed before today"))
      .toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"doc_id", $"n_chunks", $"n_kept", $"text")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
          r.getString(3))).toSet
    // grid rule
    val dirG = java.nio.file.Files.createTempDirectory("chidx").toString
    Dedup.writeChunkIndex(b1, dirG, chunkTokens = 4)
    val incG = rows(Dedup.dedupChunksAgainstIndex(spark, b2, dirG))
    val fullG = rows(Dedup.dedupChunks(b1.unionByName(b2), 4)
      .where($"doc_id" >= 10))
    assert(incG === fullG)
    // something actually deduped AND something survived (non-vacuous)
    assert(incG.exists(r => r._3 < r._2))
    assert(incG.exists(r => r._3 > 0))
    // cdc rule
    val dirC = java.nio.file.Files.createTempDirectory("chidxc").toString
    Dedup.writeChunkIndexCDC(b1, dirC, divisor = 3)
    val incC = rows(Dedup.dedupChunksAgainstIndex(spark, b2, dirC))
    val fullC = rows(Dedup.dedupChunksCDC(b1.unionByName(b2), 3)
      .where($"doc_id" >= 10))
    assert(incC === fullC)
    // append folds the processed batch in: a later batch duplicating
    // batch-2 content dedups against it
    Dedup.writeChunkIndex(b2, dirG, chunkTokens = 4, mode = "append")
    val b3 = Seq((20L, s"fresh words only here nothing shared $passage"))
      .toDF("doc_id", "text")
    val incG3 = rows(Dedup.dedupChunksAgainstIndex(spark, b3, dirG))
    assert(incG3.forall(_._3 === 0)) // every chunk seen in b1 ∪ b2
    intercept[IllegalArgumentException] {
      Dedup.writeChunkIndex(b3, dirG, chunkTokens = 7, mode = "append")
    }
    // a CDC-rule probe cannot run against a grid index silently
    intercept[IllegalArgumentException] {
      Dedup.writeChunkIndexCDC(b3, dirG, divisor = 4, mode = "append")
    }
    // the monotone-id watermark is enforced, not trusted: a batch whose
    // ids do not exceed every indexed id would silently break the
    // equality contract, so it errors instead
    intercept[IllegalArgumentException] {
      Dedup.dedupChunksAgainstIndex(spark, b1, dirG).collect()
    }
    // an index over an EMPTY corpus is probe-able (nothing matches),
    // not a schema-inference crash
    val dirE = java.nio.file.Files.createTempDirectory("chidxe").toString
    Dedup.writeChunkIndex(b1.where($"doc_id" < -1), dirE, chunkTokens = 4)
    val incE = rows(Dedup.dedupChunksAgainstIndex(spark, b3, dirE))
    assert(incE.forall(r => r._3 === r._2)) // every chunk survives
  }

  test("incremental Hamming candidates against a persisted signature " +
      "index equal the full run restricted to batch-touching pairs; " +
      "radius above the index's is rejected") {
    val b1 = docs.where($"doc_id" <= 2)
    val b2 = docs.where($"doc_id" >= 3)
    val dir = java.nio.file.Files.createTempDirectory("hmidx").toString
    Dedup.writeHammingIndex(Dedup.simhash(b1), dir, maxHamming = 8)
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val incCross = pairSet(Dedup.hammingCandidatesAgainstIndex(spark,
      Dedup.simhash(b2), dir, maxHamming = 8))
    val incWithin = pairSet(
      Dedup.hammingCandidates(Dedup.simhash(b2), maxHamming = 8))
    val full = pairSet(
      Dedup.hammingCandidates(Dedup.simhash(docs), maxHamming = 8))
    val b2Ids = Set(3L, 4L, 5L)
    val fullTouching = full.filter(p => b2Ids(p._1) || b2Ids(p._2))
    assert((incCross ++ incWithin) === fullTouching)
    assert(incCross.nonEmpty) // 0~4 are normalized dups across the split
    // a smaller probe radius is a filter; a larger one is a loud error
    assert(pairSet(Dedup.hammingCandidatesAgainstIndex(spark,
      Dedup.simhash(b2), dir, maxHamming = 3))
      .subsetOf(incCross))
    intercept[IllegalArgumentException] {
      Dedup.hammingCandidatesAgainstIndex(spark, Dedup.simhash(b2), dir,
        maxHamming = 20)
    }
    // append folds the batch in; params mismatch rejected
    Dedup.writeHammingIndex(Dedup.simhash(b2), dir, maxHamming = 8,
      mode = "append")
    intercept[IllegalArgumentException] {
      Dedup.writeHammingIndex(Dedup.simhash(b2), dir, maxHamming = 3,
        mode = "append")
    }
  }

  test("incremental semantic near-dup against a written IVF index " +
      "equals the full run under the stored centroids restricted to " +
      "batch-touching pairs") {
    import graft.operators.Similarity
    val rnd = new scala.util.Random(11)
    val dirs = Seq(
      Array.tabulate(8)(i => if (i == 0) 1.0f else 0.0f),
      Array.tabulate(8)(i => if (i == 4) 1.0f else 0.0f))
    def around(d: Array[Float]): Array[Float] =
      d.map(x => x + 0.04f * rnd.nextGaussian().toFloat)
    // corpus: 20 vectors over two tight clusters; batch: 8 more of the
    // same clusters, plus one isolated direction (no cross pair)
    val corpus = (0 until 20)
      .map(i => (i.toLong, around(dirs(i % 2)).toSeq))
      .toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
    val batchRows = (100 until 108)
      .map(i => (i.toLong, around(dirs(i % 2)).toSeq)) :+
      (110L, Array.tabulate(8)(i => if (i == 7) 1.0f else 0.0f).toSeq)
    val batch = batchRows.toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batchIds = batchRows.map(_._1).toSet
    for (m <- Seq(1, 2)) {
      val dir = java.nio.file.Files
        .createTempDirectory(s"ivfsem$m").toString
      val cents = Similarity.kmeansCentroids(corpus, nlist = 4,
        iters = 1)
      Similarity.writeIvfIndex(corpus, dir, cents, multiAssign = m)
      val incr = pairSet(Dedup.semanticNearDupAgainstIndex(spark, batch,
        dir, threshold = 0.9))
      val within = pairSet(Dedup.semanticNearDupPairsWith(batch, cents,
        threshold = 0.9, multiAssign = m))
      val full = pairSet(Dedup.semanticNearDupPairsWith(
        corpus.unionByName(batch), cents, threshold = 0.9,
        multiAssign = m))
      val fullTouching =
        full.filter(p => batchIds(p._1) || batchIds(p._2))
      // BIT-exact equality, cosines included: cell assignment under a
      // fixed centroid set is a pure per-row function, and the scoring
      // arithmetic is shared
      assert((incr ++ within) === fullTouching, s"multiAssign=$m")
      assert(incr.nonEmpty, s"multiAssign=$m: no cross pairs found")
      assert(within.nonEmpty)
      // the isolated batch vector pairs with nothing
      assert(!incr.exists(p => p._1 == 110L || p._2 == 110L))
      // the non-broadcast (large-batch) probe flavor: identical pairs
      val incrShuffle = pairSet(Dedup.semanticNearDupAgainstIndex(spark,
        batch, dir, threshold = 0.9, broadcastProbe = false))
      assert(incrShuffle === incr)
    }
  }

  test("semantic contamination screen: nearest eval vector per corpus " +
      "row, ties to the lowest eval id, empty eval set unflagged") {
    def unit(ax: Int) =
      Array.tabulate(8)(i => if (i == ax) 1.0f else 0.0f).toSeq
    def vecs(rows: Seq[(Long, Seq[Float])]) =
      rows.toDF("vec_id", "embedding")
        .select($"vec_id", $"embedding".cast("array<float>")
          .as("embedding"))
    // corpus 0 ≡ eval 100; corpus 2 ≡ eval 101; corpus 1 orthogonal
    // to both (its nearest is a cosine-0 TIE → lowest eval id)
    val corpus = vecs(Seq(0L -> unit(0), 1L -> unit(3), 2L -> unit(1)))
    val eval = vecs(Seq(100L -> unit(0), 101L -> unit(1)))
    val out = Dedup.semanticContaminationScreen(corpus, eval, 0.9)
      .orderBy($"vec_id").collect()
      .map(r => r.getLong(0) ->
        (r.getDouble(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(out.size === 3)                    // every corpus row reports
    assert(out(0L) === ((1.0, 100L, true)))
    assert(out(1L) === ((0.0, 100L, false))) // tie falls to eval 100
    assert(out(2L) === ((1.0, 101L, true)))
    // empty eval set: complete report, null scores, nothing flagged
    val empty = Dedup.semanticContaminationScreen(corpus,
        eval.where(lit(false)), 0.9)
      .orderBy($"vec_id").collect()
    assert(empty.length === 3)
    assert(empty.forall(r => r.isNullAt(1) && !r.getBoolean(3)))
  }

  test("indexed semantic contamination hits: exhaustive probe equals " +
      "the brute-force over-threshold pairs, pruned probe ⊆ exact, " +
      "sq8 storage refuses") {
    import graft.operators.Similarity
    import graft.functions.native
    val rnd = new scala.util.Random(23)
    val dirsAx = Seq(
      Array.tabulate(8)(i => if (i == 0) 1.0f else 0.0f),
      Array.tabulate(8)(i => if (i == 4) 1.0f else 0.0f))
    def around(d: Array[Float]): Seq[Float] =
      d.map(x => x + 0.04f * rnd.nextGaussian().toFloat).toSeq
    val corpus = (0 until 20)
      .map(i => (i.toLong, around(dirsAx(i % 2))))
      .toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
    // eval: two probes near cluster 0, one isolated direction
    val eval = (Seq(100L -> around(dirsAx(0)), 101L -> around(dirsAx(0))) :+
      (110L -> Array.tabulate(8)(i => if (i == 7) 1.0f else 0.0f).toSeq))
      .toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
    def hitSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2))).toSet
    // brute-force truth: every (corpus, eval) pair over the threshold
    val exact = hitSet(corpus.select($"vec_id", $"embedding")
      .crossJoin(eval.select($"vec_id".as("eval_id"),
        $"embedding".as("ev")))
      .select($"vec_id", $"eval_id",
        native.fvec_cosine($"embedding", $"ev").as("cosine"))
      .where($"cosine" >= 0.9))
    assert(exact.nonEmpty)
    for (m <- Seq(1, 2)) {
      val dir = java.nio.file.Files
        .createTempDirectory(s"semscreen$m").toString
      val cents = Similarity.kmeansCentroids(corpus, nlist = 4, iters = 1)
      Similarity.writeIvfIndex(corpus, dir, cents, multiAssign = m)
      // nprobe <= 0 probes every cell: bit-exact equality, cosines in
      val all = hitSet(Dedup.semanticContaminationHitsAgainstIndex(
        spark, dir, eval, threshold = 0.9, nprobe = 0))
      assert(all === exact, s"multiAssign=$m")
      // the isolated eval direction hits nothing even exhaustively
      assert(!all.exists(_._2 == 110L))
      // pruned probe: found ⊆ exact (the IVF recall trade, disclosed)
      val pruned = hitSet(Dedup.semanticContaminationHitsAgainstIndex(
        spark, dir, eval, threshold = 0.9, nprobe = 1))
      assert(pruned.subsetOf(exact), s"multiAssign=$m")
      assert(pruned.nonEmpty, s"multiAssign=$m")
    }
    // sq8 layout refuses: the screen's verdicts need exact f32 cosines
    val sq8Dir = java.nio.file.Files
      .createTempDirectory("semscreensq8").toString
    Similarity.writeIvfIndex(corpus, sq8Dir,
      Similarity.kmeansCentroids(corpus, nlist = 4, iters = 1),
      storage = "sq8", vecBuckets = 4)
    val e = intercept[IllegalArgumentException](
      Dedup.semanticContaminationHitsAgainstIndex(spark, sq8Dir, eval))
    assert(e.getMessage.contains("sq8"))
  }

  test("contamination screen counts shingle overlap with the benchmark, " +
      "map-only over the corpus") {
    // benchmark = doc 0's text; doc 1 (exact dup) fully contaminated,
    // doc 2 (near-dup) partially, doc 3 (unrelated) clean
    val bench = docs.where($"doc_id" === 0L)
    val out = Dedup.contaminationScreen(docs, bench)
      .orderBy($"doc_id").collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L)._3 === 1.0)           // exact dup: all shingles shared
    assert(out(4L)._3 === 1.0)           // normalizes to doc 0
    assert(out(2L)._3 > 0.5 && out(2L)._3 < 1.0) // one word changed
    assert(out(3L)._2 === 0L)            // unrelated: zero overlap
    assert(out(3L)._3 === 0.0)
    // the corpus side never shuffles: broadcast + map-only merge kernel
    val p = Dedup.contaminationScreen(docs, bench)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("contamination shuffle fallback (benchmark too big to broadcast) " +
      "matches the broadcast path row for row") {
    val bench = docs.where($"doc_id" <= 1L)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy($"doc_id").collect().map(_.toSeq).toSeq
    val viaBroadcast = Dedup.contaminationScreen(docs, bench)
    // threshold 0 forces the shuffle flavor on the same input
    val viaShuffle = Dedup.contaminationScreen(docs, bench,
      maxBroadcastShingles = 0L)
    assert(rows(viaShuffle) === rows(viaBroadcast))
    // same columns and types (nullability legitimately differs: the
    // fallback's coalesce proves non-null, the broadcast path can't)
    assert(viaShuffle.schema.map(f => (f.name, f.dataType)) ===
      viaBroadcast.schema.map(f => (f.name, f.dataType)))
    // the fallback keys its join on the shingle hash — no broadcast
    // nested loop, no all-pairs
    val p = viaShuffle.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    // empty-text and NULL-text docs report (0, 0, 0.0) in BOTH flavors —
    // null text must not diverge into size(NULL)/NULL on the broadcast
    // path while the fallback coalesces to zeros
    val oddRows: Seq[(Long, String)] = Seq((77L, ""), (78L, null))
    val withOdd = docs.unionByName(oddRows.toDF("doc_id", "text"))
    for (cap <- Seq(0L, Long.MaxValue)) {
      val odd = Dedup.contaminationScreen(withOdd, bench,
        maxBroadcastShingles = cap)
        .where($"doc_id" >= 77L).orderBy($"doc_id").collect()
      assert(odd.length === 2, s"cap=$cap")
      odd.foreach { r =>
        assert(r.getLong(1) === 0L && r.getLong(2) === 0L &&
          r.getDouble(3) === 0.0, s"cap=$cap row=$r")
      }
    }
  }

  test("containment index: incremental pairs equal the full run " +
      "restricted to batch-touching pairs, bit-exact across df and " +
      "size cuts; appended batches compose; no standing-only pairs") {
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2))).toSet
    val small = "alpha beta gamma delta epsilon zeta eta theta"
    def filler(tag: String, n: Int) =
      (1 to n).map(i => s"$tag$i").mkString(" ")
    val corpus = Seq(
      (0L, small),
      (1L, s"${filler("w", 30)} $small"), // big doc quoting 0
      (2L, "totally unrelated content about oceans currents and tides"),
      (3L, filler("z", 20))).toDF("doc_id", "text")
    val batch = Seq(
      (10L, s"$small extra trailing tokens"),
      (11L, s"${filler("v", 30)} $small"), // big batch doc quoting 0
      (12L, "totally unrelated content about oceans currents and " +
        "tides rolling")).toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_contidx").toString
    // the standing corpus lands as TWO appends — probes see the union
    Dedup.writeContainmentIndex(corpus.where($"doc_id" <= 1), dir,
      postingBuckets = 8)
    Dedup.writeContainmentIndex(corpus.where($"doc_id" >= 2), dir,
      postingBuckets = 8, mode = "append")
    val batchIds = Set(10L, 11L, 12L)
    // the equality must hold WITH the cuts biting, not only in the
    // exhaustive regime: cap=12 makes docs 1/11 big (their pair is the
    // disclosed big-big cut on BOTH sides), df=3 cuts the quoted
    // passage's shingles (present in 4 docs)
    for ((cap, df) <- Seq((4096, 1000L), (12, 1000L), (4096, 3L),
        (12, 3L))) {
      val incr = pairSet(Dedup.containmentPairsAgainstIndex(spark,
        batch, dir, threshold = 0.5, smallMaxShingles = cap,
        maxDocFreq = df))
      val full = pairSet(Dedup.containmentPairs(
        corpus.unionByName(batch), threshold = 0.5,
        smallMaxShingles = cap, maxDocFreq = df))
        .filter(p => batchIds(p._1) || batchIds(p._2))
      assert(incr === full, s"cap=$cap df=$df")
    }
    val incr = pairSet(Dedup.containmentPairsAgainstIndex(spark, batch,
      dir, threshold = 0.5))
    // found: the indexed small doc inside both batch quotes (scores
    // exact 1.0 — all its shingles present), the boilerplate cross
    // pair, and the within-batch quote pair
    assert(incr.contains((0L, 10L, 1.0)))
    assert(incr.contains((0L, 11L, 1.0)))
    assert(incr.contains((2L, 12L, 1.0)))
    assert(incr.exists(p => p._1 == 10L && p._2 == 11L))
    // standing-vs-standing pairs (0⊂1 exists in the corpus) are the
    // full run's business, never the probe's
    assert(!incr.exists(p => p._1 < 10L && p._2 < 10L))
    // the non-broadcast (large-batch) probe flavor: identical pairs
    assert(pairSet(Dedup.containmentPairsAgainstIndex(spark, batch,
      dir, threshold = 0.5, broadcastProbe = false)) === incr)
    // appends under different signature params are refused
    intercept[IllegalArgumentException] {
      Dedup.writeContainmentIndex(batch, dir, numShingleWords = 2,
        postingBuckets = 8, mode = "append")
    }
  }

  test("benchmark index screen matches the inline contamination screen " +
      "bit-exactly; appended eval sets compose; odd docs report zeros") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_benchidx").toString
    val bench = docs.where($"doc_id" === 0L || $"doc_id" === 3L)
    val oddRows: Seq[(Long, String)] = Seq((77L, ""), (78L, null))
    val corpus = docs.unionByName(oddRows.toDF("doc_id", "text"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy($"doc_id").collect().map(_.toSeq).toSeq
    val inline = rows(Dedup.contaminationScreen(corpus, bench))
    // the suite lands as TWO appended eval sets — the probe must see
    // exactly the union (the adoption-over-time regime)
    Dedup.writeBenchmarkIndex(docs.where($"doc_id" === 0L), dir,
      hashBuckets = 8)
    Dedup.writeBenchmarkIndex(docs.where($"doc_id" === 3L), dir,
      hashBuckets = 8, mode = "append")
    val viaIndex =
      rows(Dedup.contaminationScreenAgainstIndex(spark, corpus, dir))
    assert(viaIndex === inline)
    // the non-broadcast (large-batch) probe flavor: identical rows
    assert(rows(Dedup.contaminationScreenAgainstIndex(spark, corpus, dir,
      broadcastProbe = false)) === inline)
    // same columns and types as the inline report
    assert(Dedup.contaminationScreenAgainstIndex(spark, corpus, dir)
      .schema.map(f => (f.name, f.dataType)) ===
      Dedup.contaminationScreen(corpus, bench)
        .schema.map(f => (f.name, f.dataType)))
    // appends under different signature params are refused, not merged
    intercept[IllegalArgumentException] {
      Dedup.writeBenchmarkIndex(bench, dir, numShingleWords = 2,
        hashBuckets = 8, mode = "append")
    }
  }

  test("containment catches a small doc quoted in a large one that " +
      "jaccard misses") {
    val small = "alpha beta gamma delta epsilon zeta eta theta"
    val filler = (1 to 200).map(i => s"word$i").mkString(" ")
    val corpus = Seq(
      (0L, small),
      (1L, s"$filler $small"), // small quoted inside a large page
      (2L, "completely different text entirely")).toDF("doc_id", "text")
    val cont = Dedup.containmentAllPairs(corpus, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cont === Set((0L, 1L)))
    // the same pair is invisible to jaccard at any comparable threshold:
    // the union denominator dilutes the small doc's full overlap
    val jac = Dedup.jaccardAllPairs(corpus, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!jac.contains((0L, 1L)))
    // zero-shingle docs are excluded, not NaN/NULL-divergent: an empty
    // doc pairs with nothing under either measure
    val withEmpty = corpus.union(Seq((3L, "")).toDF("doc_id", "text"))
    val contEmpty = Dedup.containmentAllPairs(withEmpty, threshold = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!contEmpty.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("withContamination pass-through rows match the screen's report " +
      "and keep the corpus columns") {
    val bench = docs.where($"doc_id" % 2 === 0)
    val report = Dedup.contaminationScreen(docs, bench)
      .orderBy($"doc_id").collect().toSeq
    val passthru = Dedup.withContamination(docs, bench)
      .select($"doc_id", $"n_shingles", $"n_contaminated",
        $"contaminated_frac")
      .orderBy($"doc_id").collect().toSeq
    assert(passthru === report)
    assert(Dedup.withContamination(docs, bench).columns
      .contains("text")) // pass-through really keeps corpus columns
    // the shuffle fallback (benchmark over the broadcast cap) returns
    // the same rows AND the same pass-through columns
    val fallback = Dedup.withContamination(docs, bench,
        maxBroadcastShingles = 1)
      .select($"doc_id", $"n_shingles", $"n_contaminated",
        $"contaminated_frac")
      .orderBy($"doc_id").collect().toSeq
    assert(fallback === report)
    assert(Dedup.withContamination(docs, bench, maxBroadcastShingles = 1)
      .columns.contains("text"))
  }

  test("containment scale path: found == exact on planted doc-in-doc " +
      "duplicates, scores bit-equal, recall row disclosed") {
    val small = "alpha beta gamma delta epsilon zeta eta theta"
    val filler = (1 to 200).map(i => s"word$i").mkString(" ")
    val corpus = Seq(
      (0L, small),
      (1L, s"$filler $small"), // small quoted inside a large page
      (2L, "completely different text entirely"),
      (3L, (1 to 50).map(i => s"tok$i").mkString(" ")),
      (4L, (30 to 120).map(i => s"tok$i").mkString(" ")) // partial overlap
    ).toDF("doc_id", "text")
    val exact = Dedup.containmentAllPairs(corpus, threshold = 0.5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val found = Dedup.containmentPairs(corpus, threshold = 0.5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // no df cut bites at this size, so the scale path is exhaustive:
    // identical pair sets AND bit-identical scores (shared arithmetic)
    assert(found === exact)
    assert(found.exists(p => p._1 == 0L && p._2 == 1L))
    val r = Dedup.containmentRecall(corpus, threshold = 0.5).collect()(0)
    assert(r.getAs[Double]("recall") === 1.0)
    // candidates = pairs sharing >= 1 shingle, a strict subset of all
    // 10 pairs on this corpus
    assert(r.getAs[Double]("scan_frac") < 1.0)
    assert(r.getAs[Double]("scan_frac") > 0.0)
  }

  test("containment df cut is disclosed by the recall row, not silent") {
    // ten identical docs: every shingle has df = 10, so maxDocFreq = 5
    // cuts ALL postings — zero candidates, and the recall row must say
    // so instead of the path quietly reporting nothing
    val quote = "one two three four five six seven eight"
    val corpus = (0L to 9L).map(i => (i, quote)).toDF("doc_id", "text")
    val r = Dedup.containmentRecall(corpus, threshold = 0.9,
      maxDocFreq = 5).collect()(0)
    assert(r.getAs[Long]("n_exact") === 45L)
    assert(r.getAs[Long]("n_found") === 0L)
    assert(r.getAs[Double]("recall") === 0.0)
    assert(r.getAs[Double]("scan_frac") === 0.0)
  }

  test("sampled-probe covers big-big containment the absolute cap " +
      "misses, found stays ⊆ exact, knobs disclosed") {
    // both docs exceed smallMaxShingles = 20; a 60-word common block
    // gives set containment ~58/78 ≈ 0.74 on the smaller side
    val common = (1 to 60).map(i => s"shared$i").mkString(" ")
    val corpus = Seq(
      (0L, s"$common ${(1 to 20).map(i => s"taila$i").mkString(" ")}"),
      (1L, s"${(1 to 30).map(i => s"tailb$i").mkString(" ")} $common"),
      (2L, (1 to 80).map(i => s"other$i").mkString(" ")) // unrelated big
    ).toDF("doc_id", "text")
    val exact = Dedup.containmentAllPairs(corpus, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact === Set((0L, 1L))) // premise: a true big-big pair
    // absolute cap: both sides big -> ZERO candidates (the disclosed cut)
    val capped = Dedup.containmentPairs(corpus, threshold = 0.5,
      smallMaxShingles = 20).collect()
    assert(capped.isEmpty)
    // sampled probes: P[miss] <= (1-0.74)^16 ~ 5e-10, and min-wise
    // sampling is deterministic, so detection is exact-repeatable
    val sampled = Dedup.containmentPairs(corpus, threshold = 0.5,
      smallMaxShingles = 20, sampleK = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sampled === Set((0L, 1L))) // found, and still ⊆ exact
    val r = Dedup.containmentRecall(corpus, threshold = 0.5,
      smallMaxShingles = 20, sampleK = 16).collect()(0)
    assert(r.getAs[Double]("recall") === 1.0)
    assert(r.getAs[Int]("sample_k") === 16)
    assert(r.getAs[Int]("sample_min_hits") === 1)
    intercept[IllegalArgumentException] {
      Dedup.containmentCandidates(corpus, sampleK = 4, sampleMinHits = 5)
    }
  }

  test("containment candidates count each shared shingle once per " +
      "unordered pair (probe-probe orientation)") {
    // two identical 3-token docs share exactly ONE shingle; a
    // double-counted orientation would report hits = 2 and wrongly
    // pass minHits = 2
    val corpus = Seq((0L, "a b c"), (1L, "a b c"))
      .toDF("doc_id", "text")
    assert(Dedup.containmentCandidates(corpus, minHits = 2).isEmpty)
    val single = Dedup.containmentCandidates(corpus, minHits = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(single === Set((0L, 1L)))
  }

  test("line dedup keeps each trimmed line's first occurrence and " +
      "reassembles newline-joined (Dolma paragraph rule)") {
    val corpus = Seq(
      (0L, "Header line\nbody alpha\nHeader line\nbody beta"),
      (1L, "  Header line  \nunique one"), // trims to doc 0's header
      (2L, "\n\n   \n"),                   // all-empty lines -> 0 chunks
      (3L, null.asInstanceOf[String]),     // null text -> 0 chunks
      (4L, "body alpha\nbody beta")        // every line seen in doc 0
    ).toDF("doc_id", "text")
    val r = Dedup.dedupLines(corpus)
      .orderBy($"doc_id").collect()
      .map(x => (x.getLong(0), x.getInt(1), x.getInt(2), x.getString(3)))
    // within-doc repeat drops too (first occurrence is (0, idx 0))
    assert(r(0) === ((0L, 4, 3, "Header line\nbody alpha\nbody beta")))
    assert(r(1) === ((1L, 2, 1, "unique one")))
    assert(r(2) === ((2L, 0, 0, "")))
    assert(r(3) === ((3L, 0, 0, "")))
    assert(r(4) === ((4L, 2, 0, "")))
    // CRLF-authored lines dedup against their LF twins (the split eats
    // the \r — a trailing carriage return must not defeat the rule)
    val crlf = Seq(
      (0L, "shared footer\nunique lf"),
      (1L, "shared footer\r\nunique crlf\r\n"))
      .toDF("doc_id", "text")
    val rc = Dedup.dedupLines(crlf).orderBy($"doc_id").collect()
      .map(x => (x.getLong(0), x.getInt(2), x.getString(3)))
    assert(rc(0) === ((0L, 2, "shared footer\nunique lf")))
    assert(rc(1) === ((1L, 1, "unique crlf")))
  }

  test("incremental line dedup against a persisted line-rule index " +
      "equals the full run restricted to the batch; cross-rule " +
      "append refuses; deletion re-derives the retracted lines") {
    val b1 = Seq(
      (0L, "shared boilerplate footer\nindexed body one"),
      (1L, "indexed body two\nshared boilerplate footer"))
      .toDF("doc_id", "text")
    val b2 = Seq(
      (10L, "fresh batch body\nshared boilerplate footer"),
      (11L, "entirely novel lines\nnothing indexed here"))
      .toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"doc_id", $"n_chunks", $"n_kept", $"text")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
          r.getString(3))).toSet
    val dir = java.nio.file.Files.createTempDirectory("chidxl").toString
    Dedup.writeChunkIndexLines(b1, dir, chunkBuckets = 8)
    val inc = rows(Dedup.dedupChunksAgainstIndex(spark, b2, dir))
    val full = rows(Dedup.dedupLines(b1.unionByName(b2))
      .where($"doc_id" >= 10))
    assert(inc === full)
    // the indexed footer dropped, the fresh line survived, and the
    // probe's reassembly is NEWLINE-joined (the stored rule's separator)
    assert(inc.contains((10L, 2, 1, "fresh batch body")))
    assert(inc.exists(r => r._4.contains("\n")))
    // a grid append onto a line index refuses loudly (params guard)
    intercept[IllegalArgumentException] {
      Dedup.writeChunkIndex(b2, dir, chunkTokens = 4, mode = "append")
    }
    // content-addressed retraction under the stored line rule: after
    // deleting doc 0's lines (doc 1 still holds the footer is NOT true
    // here — distinct hashes are index-wide, so deletion removes the
    // hash outright), a re-probe of the footer line survives
    Dedup.deleteFromChunkIndex(spark, dir, b1)
    val after = rows(Dedup.dedupChunksAgainstIndex(spark,
      Seq((20L, "shared boilerplate footer")).toDF("doc_id", "text"),
      dir))
    assert(after === Set((20L, 1, 1, "shared boilerplate footer")))
  }

  test("chunk dedup keeps first occurrences and reassembles in order") {
    // chunks of 3 tokens; doc 1 repeats doc 0's first chunk, doc 2 is
    // a full copy of doc 0, doc 3 is unrelated
    val corpus = Seq(
      (0L, "a b c d e f"),            // chunks: "a b c", "d e f"
      (1L, "a b c x y z"),            // first chunk duplicates doc 0's
      (2L, "a b c d e f"),            // all chunks duplicate doc 0's
      (3L, "p q r"),
      (4L, "")                        // zero tokens -> zero chunks
    ).toDF("doc_id", "text")
    val r = Dedup.dedupChunks(corpus, chunkTokens = 3)
      .orderBy($"doc_id").collect()
      .map(x => (x.getLong(0), x.getInt(1), x.getInt(2), x.getString(3)))
    assert(r(0) === ((0L, 2, 2, "a b c d e f")))
    assert(r(1) === ((1L, 2, 1, "x y z"))) // dup chunk dropped, order kept
    assert(r(2) === ((2L, 2, 0, "")))      // nothing survives a full copy
    assert(r(3) === ((3L, 1, 1, "p q r")))
    assert(r(4) === ((4L, 0, 0, "")))
  }

  test("chunk dedup at the paper's 50-token windows on " +
      "multi-hundred-token documents") {
    // 500-token docs (the realistic regime the sf1 generator now
    // plants): doc 1 repeats doc 0's first 200 tokens grid-aligned,
    // so exactly its first 4 of 10 chunks drop; the unrelated tail
    // survives
    def toks(tag: String, n: Int, from: Int = 1) =
      (from until from + n).map(i => s"$tag$i").mkString(" ")
    val corpus = Seq(
      (0L, toks("alpha", 500)),
      (1L, toks("alpha", 200) + " " + toks("beta", 300)),
      (2L, toks("gamma", 500))
    ).toDF("doc_id", "text")
    val r = Dedup.dedupChunks(corpus, chunkTokens = 50)
      .orderBy($"doc_id").collect()
      .map(x => (x.getLong(0), x.getInt(1), x.getInt(2)))
    assert(r(0) === ((0L, 10, 10)))
    assert(r(1) === ((1L, 10, 6))) // 200 duplicated tokens = 4 chunks
    assert(r(2) === ((2L, 10, 10)))
    // CDC at the matching ~50-token granularity catches the same
    // duplication when it is NOT grid-aligned (3-token prefix shift)
    val shifted = Seq(
      (0L, toks("alpha", 500)),
      (1L, "pre1 pre2 pre3 " + toks("alpha", 500))
    ).toDF("doc_id", "text")
    val cdc = Dedup.dedupChunksCDC(shifted, divisor = 50)
      .orderBy($"doc_id").collect()
    assert(cdc(1).getInt(2) < cdc(1).getInt(1),
      s"CDC should drop realigned 50-token-scale chunks: ${cdc.toSeq}")
    val grid = Dedup.dedupChunks(shifted, chunkTokens = 50)
      .orderBy($"doc_id").collect()
    assert(grid(1).getInt(1) === grid(1).getInt(2),
      "the fixed grid is blind to the 3-token shift")
  }

  test("CDC chunk dedup drops a passage duplicated at a shifted offset") {
    // the same ~30-token passage planted at token offset 0 (doc 0) and
    // token offset 3 (doc 1): content-defined boundaries realign inside
    // the passage, so doc 1's copy dedups; the fixed token grid sees
    // only disjoint chunks and detects nothing
    val passage = "the quick brown fox jumps over the lazy dog while " +
      "seventeen sailors navigate around treacherous coral reefs " +
      "carrying bundles of fresh mangoes toward distant harbor towns"
    val corpus = Seq(
      (0L, passage),
      (1L, s"unrelated preamble words $passage"),
      (2L, "entirely different filler sentences about compilers"),
      (3L, null.asInstanceOf[String]) // NULL text -> 0 chunks, like q88
    ).toDF("doc_id", "text")
    val divisor = 4

    // engine-identical simulation of the boundary rule
    def isBoundary(t: String): Boolean =
      (graft.functions.RollingHashExpr.hashBytes(
        t.getBytes("UTF-8"), 257L, 1000000007L) * 48271L) %
        1000000007L % divisor == 0
    def chunksOf(text: String): Seq[String] = {
      val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      val cur = scala.collection.mutable.ArrayBuffer.empty[String]
      toks.foreach { t =>
        cur += t
        if (isBoundary(t)) { out += cur.mkString(" "); cur.clear() }
      }
      if (cur.nonEmpty) out += cur.mkString(" ")
      out.toSeq
    }
    val c0 = chunksOf(passage)
    val c1 = chunksOf("unrelated preamble words " + passage)
    val shared = c1.filter(c0.toSet)
    assert(shared.size >= 2, // premise: boundaries realign inside passage
      s"test passage must realign (chunks0=$c0 chunks1=$c1)")

    val r = Dedup.dedupChunksCDC(corpus, divisor = divisor)
      .orderBy($"doc_id").collect()
      .map(x => (x.getLong(0), x.getInt(1), x.getInt(2), x.getString(3)))
    assert(r(0) === ((0L, c0.size, c0.size, passage.toLowerCase)))
    val kept1 = c1.filterNot(c0.toSet)
    assert(r(1) === ((1L, c1.size, kept1.size, kept1.mkString(" "))))
    assert(kept1.size < c1.size) // the shifted copy WAS detected
    assert(r(3) === ((3L, 0, 0, ""))) // null text, not NULL n_chunks
    // contrast: the fixed 8-token grid at offset 3 detects nothing
    val grid = Dedup.dedupChunks(corpus, chunkTokens = 8)
      .orderBy($"doc_id").collect()
    assert(grid(1).getInt(1) === grid(1).getInt(2),
      "fixed grid should be blind to the offset-shifted duplicate")
  }

  test("containmentDedup keeps one canonical per containment cluster") {
    val small = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val filler = (1 to 100).map(i => s"word$i").mkString(" ")
    val corpus = Seq(
      (0L, small),
      (1L, s"$filler $small"),
      (2L, "unrelated text about other things entirely today"))
      .toDF("doc_id", "text")
    val kept = Dedup.containmentDedup(corpus, threshold = 0.9)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(0L, 2L))
  }

  test("auto quantizer never rejects a multiAssign the flat path " +
      "accepts") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val emb = (0 until 200).map(i =>
      (i.toLong, Array.fill(8)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    // nlist=80 resolves auto -> two-level, whose family cap is
    // ceil(sqrt(80)) = 9 < multiAssign=10 — auto falls back to flat
    // instead of throwing; the explicit two-level still rejects
    val pairs = Dedup.semanticNearDupPairs(emb, nlist = 80,
      threshold = 0.2, kmeansIters = 1, multiAssign = 10,
      quantizer = "auto")
    assert(pairs.count() >= 0L)
    intercept[IllegalArgumentException] {
      Dedup.semanticNearDupPairs(emb, nlist = 80, threshold = 0.2,
        kmeansIters = 1, multiAssign = 10, quantizer = "two-level")
        .count()
    }
    // collapsed families: identical embeddings make every sampled
    // centroid identical, so groupCentroids drops to ONE family —
    // fewer than the ceil(sqrt(nlist)) estimate. The auto fallback
    // must gate on the ACTUAL family count: multiAssign=2 is within
    // the estimate (9) but above the real count (1), and must fall
    // back to flat instead of tripping two-level's require
    val flat = (0 until 200).map(i =>
      (i.toLong, Array.fill(8)(0.5f)))
      .toDF("vec_id", "embedding")
    val degenerate = Dedup.semanticNearDupPairs(flat, nlist = 80,
      threshold = 0.2, kmeansIters = 0, multiAssign = 2,
      quantizer = "auto")
    assert(degenerate.count() >= 0L)
  }

  test("semdedup centroid keep policies: 'centroid' keeps the closest " +
      "member, 'centroid_far' the paper's low-similarity member, " +
      "minid the lowest id") {
    // one tight duplicate component where the CENTRAL vector has the
    // HIGHEST id: the cell centroid (mean of the three) is exactly vec
    // 3's direction, so the prototype-keeping 'centroid' policy must
    // pick 3; vecs 1 and 2 tie for farthest (symmetric off-axis), so
    // the paper's 'centroid_far' picks the tie-broken lowest id 1
    val vecs = Seq(
      (1L, Array(1.0f, 0.30f, 0.00f)),
      (2L, Array(1.0f, 0.00f, 0.30f)),
      (3L, Array(1.0f, 0.15f, 0.15f)))
      .toDF("vec_id", "embedding")
    val viaMin = Dedup.semanticDedup(vecs, nlist = 1, threshold = 0.9,
        kmeansIters = 1)
      .select($"vec_id").collect().map(_.getLong(0)).toSet
    assert(viaMin === Set(1L))
    val viaCent = Dedup.semanticDedup(vecs, nlist = 1, threshold = 0.9,
        kmeansIters = 1, keep = "centroid")
      .select($"vec_id").collect().map(_.getLong(0)).toSet
    assert(viaCent === Set(3L))
    val viaFar = Dedup.semanticDedup(vecs, nlist = 1, threshold = 0.9,
        kmeansIters = 1, keep = "centroid_far")
      .select($"vec_id").collect().map(_.getLong(0)).toSet
    assert(viaFar === Set(1L))
    intercept[IllegalArgumentException] {
      Dedup.semanticDedup(vecs, keep = "nope")
    }
  }

  test("embedding near-dup finds the planted duplicate vector") {
    val vecs = Seq(
      (0L, Array.fill(8)(1.0f)),
      (1L, Array.fill(8)(1.0f)),              // exact dup direction
      (2L, Array.tabulate(8)(i => if (i % 2 == 0) 1.0f else -1.0f)),
      (3L, Array.tabulate(8)(i => if (i < 4) 1.0f else -1.0f)))
      .toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDup(vecs, dim = 8, threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((0L, 1L)))
  }

  // 4 orthogonal directions × 3 exact copies each: within a direction
  // the vectors are bit-identical, so cell assignment is identical too
  // (same argmax on same input) — co-location is guaranteed by
  // construction, never by seeding luck, keeping the test
  // deterministic. This is the clustered regime SemDeDup targets.
  private def plantedClusters = {
    import spark.implicits._
    (for (c <- 0 until 4; i <- 0 until 3) yield {
      val v = Array.fill(8)(0.01f)
      v(2 * c) = 1.0f
      ((c * 3 + i).toLong, v, c)
    }).toDF("vec_id", "embedding", "label")
  }

  test("semdedup: clustered regime finds every dup pair at m=1 " +
    "without all-pairs scan") {
    val r = Dedup.semanticDedupRecall(plantedClusters, nlist = 4,
      threshold = 0.95, multiAssign = 1).collect().head
    assert(r.getLong(0) === 12) // 4 clusters × C(3,2) exact pairs
    assert(r.getDouble(2) === 1.0, s"recall: $r")
    // 12 vectors over >=2 occupied cells: strictly below all-pairs
    assert(r.getDouble(3) <= 0.6, s"scan_frac: $r")
  }

  test("semdedup: two-level quantizer keeps clustered-regime recall " +
      "and stays a pure projection") {
    // identical-copy clusters: two-level routes every copy identically
    // (same input → same super → same child), so recall stays 1.0
    val r = Dedup.semanticDedupRecall(plantedClusters, nlist = 4,
      threshold = 0.95, quantizer = "two-level").collect().head
    assert(r.getLong(0) === 12 && r.getDouble(2) === 1.0, s"row: $r")
    // on the real testdata the approximate routing must stay within a
    // few points of flat assignment's recall at the same scan budget
    val emb = spark.read.parquet(sf("0.01") + "/embeddings.parquet")
    val flat = Dedup.semanticDedupRecall(emb, nlist = 16,
      threshold = 0.25, multiAssign = 2).collect().head
    val two = Dedup.semanticDedupRecall(emb, nlist = 16,
      threshold = 0.25, multiAssign = 2, quantizer = "two-level")
      .collect().head
    assert(two.getDouble(2) >= flat.getDouble(2) - 0.15,
      s"two-level $two vs flat $flat")
    // the assignment is a projection: no join, no exchange before the
    // pair self-join's own shuffle
    val plan = graft.operators.Similarity.assignCellsTwoLevel(
      emb.select(col("vec_id"), col("embedding")),
      graft.operators.Similarity.kmeansCentroids(
        emb.select(col("vec_id"), col("embedding")), 16, 1))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Exchange"),
      plan.take(2000))
    // unknown quantizer names fail loudly
    intercept[IllegalArgumentException] {
      Dedup.semanticNearDupPairs(emb, quantizer = "nope")
    }
  }

  test("semdedup: auto nlist derives cells from corpus size, keeps the " +
      "recall gate, honors explicit nlist") {
    // 12 vectors / TargetCellSize=64 -> 1 cell: the small-corpus floor.
    // One cell scores all pairs, so the clustered-regime recall gate
    // holds a fortiori; scan_frac discloses the full scan honestly.
    val auto = Dedup.semanticDedupRecall(plantedClusters, nlist = 0,
      threshold = 0.95).collect().head
    assert(auto.getLong(0) === 12 && auto.getDouble(2) === 1.0,
      s"row: $auto")
    assert(auto.getDouble(3) === 1.0, s"scan_frac: $auto") // 1 cell
    // the real testdata is big enough for >1 auto cell: recall gate
    // still holds vs the fixed-nlist run at the same threshold (fewer,
    // larger cells can only score MORE pairs than nlist=16)
    val emb = spark.read.parquet(sf("0.01") + "/embeddings.parquet")
      .where(col("vec_id") < 500)
    val autoBig = Dedup.semanticDedupRecall(emb, nlist = 0,
      threshold = 0.25, multiAssign = 2).collect().head
    val fixed = Dedup.semanticDedupRecall(emb, nlist = 16,
      threshold = 0.25, multiAssign = 2).collect().head
    assert(autoBig.getDouble(2) >= fixed.getDouble(2) - 1e-9,
      s"auto $autoBig vs fixed $fixed")
    intercept[IllegalArgumentException] {
      Dedup.semanticNearDupPairs(emb, nlist = -1)
    }
  }

  test("semdedup: degenerate inputs report 0.0 scan_frac, not null") {
    import spark.implicits._
    val single = Seq((0L, Array.fill(8)(1.0f)))
      .toDF("vec_id", "embedding")
    val r = Dedup.semanticDedupRecall(single, nlist = 4,
      threshold = 0.9).collect().head
    assert(r.getLong(0) === 0L)      // no scoreable pairs
    assert(r.getDouble(2) === 1.0)   // vacuous recall
    assert(!r.isNullAt(3) && r.getDouble(3) === 0.0, s"row: $r")
  }

  test("semdedup: survivors match the exact-pairs dedup tail") {
    val viaSem = Dedup.semanticDedup(plantedClusters, nlist = 4,
        threshold = 0.95)
      .collect().map(_.getLong(0)).toSet
    val viaExact = Dedup.dedupByClusters(plantedClusters,
        graft.operators.Similarity.cosinePairsExact(
          plantedClusters, 0.95),
        idCol = "vec_id")
      .collect().map(_.getLong(0)).toSet
    // canonical per direction = lowest vec_id: 0, 3, 6, 9
    assert(viaSem === Set(0L, 3L, 6L, 9L))
    assert(viaSem === viaExact)
  }

  test("semdedup: isotropic worst case — found pairs are a bit-exact " +
    "subset of exact pairs, and bucketing beats random scan") {
    val emb = spark.read.parquet(sf("0.01") + "/embeddings.parquet")
    val exact = graft.operators.Similarity
      .cosinePairsExact(emb, 0.25)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = Dedup.semanticNearDupPairs(emb, nlist = 16,
      threshold = 0.25, multiAssign = 2).collect()
    found.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.25)
      assert(exact.contains((r.getLong(0), r.getLong(1))))
    }
    val rep = Dedup.semanticDedupRecall(emb, nlist = 16,
      threshold = 0.25, multiAssign = 2).collect().head
    assert(rep.getLong(1) === found.length.toLong)
    // the honesty contract on data with NO cluster structure: recall
    // cannot be high at low scan (q70's regime note), but k-means
    // buckets must still concentrate close pairs well above the
    // random-sampling line recall == scan_frac (measured ~0.55 recall
    // at ~0.25 scan; floors leave jitter room)
    assert(rep.getDouble(2) >= 1.7 * rep.getDouble(3), s"row: $rep")
    assert(rep.getDouble(2) >= 0.4, s"recall: $rep")
    assert(rep.getDouble(3) <= 0.3, s"scan_frac: $rep")
    // the oracle-checked entry shape (q75's exact parameters, capped
    // input): the same floors as verdict bits the DuckDB oracle pins
    val bits = SparkEntry.queries("q77_semdedup_recall")(spark, sf())
      .head()
    assert(bits.getAs[Boolean]("recall_ge_floor"))
    assert(bits.getAs[Boolean]("scan_le_ceiling"))
    val cbits = SparkEntry.queries("q83_containment_recall")(spark,
      sf()).head()
    assert(cbits.getAs[Boolean]("recall_ge_floor"))
    assert(cbits.getAs[Boolean]("scan_le_ceiling"))
  }

  test("maxBandFreq caps hot LSH bands: a planted template family's " +
      "candidates stay ∝ M instead of M², skipped bands are disclosed, " +
      "cold-band pairs survive, capped ⊆ uncapped, default off") {
    val template = "lorem ipsum dolor sit amet consectetur adipiscing " +
      "elit sed do eiusmod tempor incididunt ut labore et dolore magna " +
      "aliqua enim ad minim veniam quis nostrud exercitation ullamco"
    // M near-identical-but-UNEQUAL variants: exact dedup cannot
    // collapse them (the cap's scaladoc-documented target shape),
    // plus one genuine near-dup pair of cold vocabulary
    val M = 30
    val tpl = (0 until M).map(i =>
      (100L + i, s"$template closing token$i"))
    val genuine = Seq(
      (1L, "completely different prose about distributed query " +
        "engines shuffle exchanges and broadcast joins tonight"),
      (2L, "completely different prose about distributed query " +
        "engines shuffle exchanges and broadcast joins today"))
    val docs = (tpl ++ genuine).toDF("doc_id", "text")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select($"id_a", $"id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = pairs(Dedup.minhashCandidates(docs))
    val capped = pairs(Dedup.minhashCandidates(docs, maxBandFreq = 5))
    // uncapped: the template family is quadratic (~M²/2 pairs)
    assert(uncapped.count(_._1 >= 100L) > M * M / 4,
      s"template family should dominate uncapped: $uncapped")
    // capped: template pairs collapse to at most linear in M; the
    // cold-vocabulary genuine pair is untouched
    assert(capped.count(_._1 >= 100L) <= 3 * M)
    assert(capped.contains((1L, 2L)))
    assert(capped.subsetOf(uncapped))
    // the cut is DISCLOSED: each skipped band names its membership
    val hot = Dedup.minhashHotBands(docs, maxBandFreq = 5)
    assert(hot.count() > 0)
    assert(hot.agg(min($"df")).head().getLong(0) > 5L)
    // default (0) = off: bit-equal to the never-capped surface
    assert(pairs(Dedup.minhashCandidates(docs, maxBandFreq = 0L))
      === uncapped)

    // ---- the incremental mirror: an INDEXED template family must not
    // make every future batch's probe pay its membership
    val dir = java.nio.file.Files.createTempDirectory("mhhot").toString
    Dedup.writeMinhashIndex(
      (tpl :+ genuine.head).toDF("doc_id", "text"), dir, bandBuckets = 8)
    val batch = Seq(
      (500L, s"$template closing fresh"), // M+1th template variant
      (501L, genuine(1)._2))              // near-dup of indexed doc 1
      .toDF("doc_id", "text")
    val iUncapped = pairs(
      Dedup.minhashCandidatesAgainstIndex(spark, batch, dir))
    val iCapped = pairs(Dedup.minhashCandidatesAgainstIndex(spark,
      batch, dir, maxBandFreq = 5))
    // uncapped probe: the new variant pairs with the whole family
    assert(iUncapped.count(p => p._2 === 500L) >= M - 2)
    // capped probe: family pairs cut ∝ cap, cold cross pair survives
    assert(iCapped.count(p => p._2 === 500L) <= 10)
    assert(iCapped.contains((1L, 501L)))
    assert(iCapped.subsetOf(iUncapped))
    val iHot = Dedup.minhashHotBandsAgainstIndex(spark, batch, dir,
      maxBandFreq = 5)
    assert(iHot.count() > 0)
    assert(iHot.agg(min($"df")).head().getLong(0) > 5L)
    // verified tail under the cap: scores it does emit are the exact
    // ones (found ⊆ exact, the family-wide contract)
    val v = Dedup.nearDupAgainstIndex(spark, batch, dir,
      threshold = 0.5, maxBandFreq = 5)
    val exact = Dedup.jaccardAllPairsAgainstIndex(spark, batch, dir,
      threshold = 0.5)
    val vSet = v.select($"id_a", $"id_b", $"jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val eSet = exact.select($"id_a", $"id_b", $"jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(vSet.subsetOf(eSet))
    assert(vSet.exists(t => t._1 === 1L && t._2 === 501L))
  }
}
