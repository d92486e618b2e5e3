package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Multimodal, Similarity}

/** Index lifecycle maintenance: compaction (and, below, deletion) over
  * the five persisted index families. The contract under proof:
  * maintenance changes LAYOUT (and removes rows), never probe answers —
  * compaction is bit-identical before/after, and deletion removes
  * exactly the asked-for ids from every future answer.
  */
class IndexMaintenanceSpec extends SparkSuite {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and " +
    "then runs far away into the deep dark forest tonight"

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_$tag").toString

  /** parquet data files per bucket partition dir of `sub` — the
    * compaction file-count contract ("one file per bucket"). */
  private def filesPerPartition(sub: String): Map[String, Int] = {
    val root = java.nio.file.Paths.get(sub)
    val l = java.nio.file.Files.list(root)
    try l.toArray.map(_.asInstanceOf[java.nio.file.Path])
      .filter(p => java.nio.file.Files.isDirectory(p) &&
        p.getFileName.toString.contains("="))
      .map { p =>
        val ll = java.nio.file.Files.list(p)
        try p.getFileName.toString -> ll.toArray
          .map(_.asInstanceOf[java.nio.file.Path].getFileName.toString)
          .count(_.endsWith(".parquet"))
        finally ll.close()
      }.toMap
    finally l.close()
  }

  private def pairSet(df: DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet

  test("minhash index compaction: probe bit-identical, one file per " +
      "bucket, retried-append duplicate rows re-distincted away") {
    val b1 = Seq(
      (0L, base),
      (1L, base.replace("tonight", "today")),
      (2L, "completely different words about spark query engines and " +
        "distributed joins running on large clusters of machines"))
      .toDF("doc_id", "text")
    val b2 = Seq(
      (10L, base),
      (11L, "yet another unrelated document discussing minhash banding " +
        "signatures buckets and locality sensitive hashing methods"))
      .toDF("doc_id", "text")
    val dir = tmp("mhcompact")
    Dedup.writeMinhashIndex(b1, dir, bandBuckets = 8)
    Dedup.writeMinhashIndex(b2, dir, bandBuckets = 8, mode = "append")
    // the documented crashed-append recovery: re-run the SAME append —
    // idempotent, at the price of duplicate rows compaction removes
    Dedup.writeMinhashIndex(b2, dir, bandBuckets = 8, mode = "append")
    val bands = () => spark.read.parquet(s"$dir/bands")
    assert(bands().count() > bands().distinct().count()) // dups present
    val b3 = Seq((20L, base), (21L, base.replace("fox", "cat")))
      .toDF("doc_id", "text")
    val before = pairSet(
      Dedup.nearDupAgainstIndex(spark, b3, dir, threshold = 0.5))
    val beforeJac = pairSet(
      Dedup.jaccardAllPairsAgainstIndex(spark, b3, dir, threshold = 0.5))
    // a stray half-written staging dir from a "crashed" prior compaction
    // must be swept, not tripped over
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$dir/bands__compact_tmp"))
    Dedup.compactIndex(spark, dir)
    assert(before.nonEmpty)
    assert(pairSet(Dedup.nearDupAgainstIndex(spark, b3, dir,
      threshold = 0.5)) === before)
    assert(pairSet(Dedup.jaccardAllPairsAgainstIndex(spark, b3, dir,
      threshold = 0.5)) === beforeJac)
    assert(bands().count() === bands().distinct().count())
    val perBucket = filesPerPartition(s"$dir/bands")
    assert(perBucket.nonEmpty)
    assert(perBucket.values.forall(_ === 1),
      s"expected one file per bucket, got $perBucket")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dir/bands__compact_tmp")))
    // shingles re-distincted too (one row per doc)
    val sh = spark.read.parquet(s"$dir/shingles")
    assert(sh.count() === sh.select($"doc_id").distinct().count())
  }

  test("chunk index compaction: probe bit-identical, watermark " +
      "preserved, duplicate hashes collapsed") {
    val passage = "alpha beta gamma delta epsilon zeta eta theta"
    val b1 = Seq(
      (0L, s"$passage one two three four five six seven eight"))
      .toDF("doc_id", "text")
    val b2 = Seq(
      (10L, s"$passage nine ten eleven twelve thirteen fourteen"))
      .toDF("doc_id", "text")
    val dir = tmp("chcompact")
    Dedup.writeChunkIndex(b1, dir, chunkTokens = 4, chunkBuckets = 8)
    Dedup.writeChunkIndex(b2, dir, chunkTokens = 4, chunkBuckets = 8,
      mode = "append")
    // retried append → duplicate hash rows (b2 shares `passage` with b1)
    Dedup.writeChunkIndex(b2, dir, chunkTokens = 4, chunkBuckets = 8,
      mode = "append")
    val chunks = () => spark.read.parquet(s"$dir/chunks")
    assert(chunks().count() > chunks().distinct().count())
    val watermarkBefore = spark.read.parquet(s"$dir/params")
      .head().getAs[Long]("max_doc_id")
    val b3 = Seq(
      (20L, s"$passage fifteen sixteen seventeen eighteen nineteen"),
      (21L, "entirely novel twenty-one content with no shared chunks " +
        "anywhere near the indexed corpus at all"))
      .toDF("doc_id", "text")
    def rows(df: DataFrame) =
      df.select($"doc_id", $"n_chunks", $"n_kept", $"text").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
          r.getString(3))).toSet
    val before = rows(Dedup.dedupChunksAgainstIndex(spark, b3, dir))
    Dedup.compactIndex(spark, dir)
    assert(rows(Dedup.dedupChunksAgainstIndex(spark, b3, dir)) === before)
    assert(before.exists(r => r._3 < r._2)) // something actually deduped
    assert(chunks().count() === chunks().distinct().count())
    assert(filesPerPartition(s"$dir/chunks").values.forall(_ === 1))
    // compaction must NOT move the monotone-id watermark
    assert(spark.read.parquet(s"$dir/params")
      .head().getAs[Long]("max_doc_id") === watermarkBefore)
  }

  test("hamming index compaction: candidates bit-identical, one file " +
      "per bucket") {
    val b1 = Seq(
      (0L, base),
      (1L, "completely different words about spark query engines and " +
        "distributed joins running on large clusters of machines"))
      .toDF("doc_id", "text")
    val b2 = Seq((10L, base.replace("tonight", "today")))
      .toDF("doc_id", "text")
    val dir = tmp("hmcompact")
    Dedup.writeHammingIndex(Dedup.simhash(b1), dir, maxHamming = 8,
      pieceBuckets = 8)
    Dedup.writeHammingIndex(Dedup.simhash(b2), dir, maxHamming = 8,
      pieceBuckets = 8, mode = "append")
    Dedup.writeHammingIndex(Dedup.simhash(b2), dir, maxHamming = 8,
      pieceBuckets = 8, mode = "append") // retried append
    val pieces = () => spark.read.parquet(s"$dir/pieces")
    assert(pieces().count() > pieces().distinct().count())
    val b3 = Seq((20L, base.replace("fox", "cat"))).toDF("doc_id", "text")
    def hset(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val before = hset(Dedup.hammingCandidatesAgainstIndex(spark,
      Dedup.simhash(b3), dir))
    Dedup.compactIndex(spark, dir)
    assert(hset(Dedup.hammingCandidatesAgainstIndex(spark,
      Dedup.simhash(b3), dir)) === before)
    assert(before.nonEmpty)
    assert(pieces().count() === pieces().distinct().count())
    assert(filesPerPartition(s"$dir/pieces").values.forall(_ === 1))
  }

  test("IVF index compaction: top-k and incremental semantic probes " +
      "bit-identical, one file per cell, extra corpus columns survive") {
    val rnd = new scala.util.Random(3)
    val dirsArr = Seq(
      Array.tabulate(8)(i => if (i == 0) 1.0f else 0.0f),
      Array.tabulate(8)(i => if (i == 4) 1.0f else 0.0f))
    def around(d: Array[Float]): Seq[Float] =
      d.map(x => x + 0.04f * rnd.nextGaussian().toFloat).toSeq
    val corpus = (0 until 20)
      .map(i => (i.toLong, around(dirsArr(i % 2)), s"tag$i"))
      .toDF("vec_id", "embedding", "tag")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"),
        $"tag")
    val batch = (100 until 104)
      .map(i => (i.toLong, around(dirsArr(i % 2))))
      .toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
    val dir = tmp("ivfcompact")
    val cents = Similarity.kmeansCentroids(corpus, nlist = 4, iters = 1)
    Similarity.writeIvfIndex(corpus, dir, cents, multiAssign = 2)
    val queries = corpus.where($"vec_id" < 3)
      .select($"vec_id", $"embedding")
    def topk(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSeq
    val topBefore = topk(Similarity.ivfTopKIndexedSelf(spark, dir,
      queries, k = 5, nprobe = 4, multiAssigned = true))
    val semBefore = pairSet(Dedup.semanticNearDupAgainstIndex(spark,
      batch, dir, threshold = 0.9))
    Dedup.compactIndex(spark, dir)
    assert(topk(Similarity.ivfTopKIndexedSelf(spark, dir, queries,
      k = 5, nprobe = 4, multiAssigned = true)) === topBefore)
    assert(pairSet(Dedup.semanticNearDupAgainstIndex(spark, batch, dir,
      threshold = 0.9)) === semBefore)
    assert(semBefore.nonEmpty)
    assert(filesPerPartition(s"$dir/cells").values.forall(_ === 1))
    // the indexed corpus' extra column came through the rewrite
    assert(spark.read.parquet(s"$dir/cells").columns.contains("tag"))
  }

  test("compaction on an unknown layout fails loudly") {
    val dir = tmp("badidx")
    Seq((1, "x")).toDF("a", "b").write.parquet(s"$dir/params")
    intercept[IllegalArgumentException] {
      Dedup.compactIndex(spark, dir)
    }
  }

  test("minhash index deletion: retracted docs stop generating " +
      "candidates and all-pairs rows; survivors unaffected; absent ids " +
      "are a no-op") {
    val b1 = Seq(
      (0L, base),
      (1L, base.replace("tonight", "today")),
      (2L, "completely different words about spark query engines and " +
        "distributed joins running on large clusters of machines"))
      .toDF("doc_id", "text")
    val dir = tmp("mhdelete")
    Dedup.writeMinhashIndex(b1, dir, bandBuckets = 8)
    val probe = Seq((20L, base)).toDF("doc_id", "text")
    val beforeIds = pairSet(
      Dedup.nearDupAgainstIndex(spark, probe, dir, threshold = 0.5))
      .flatMap(p => Seq(p._1, p._2))
    assert(beforeIds.contains(0L) && beforeIds.contains(1L))
    Dedup.deleteFromIndex(spark, dir, Seq(1L).toDF("doc_id"))
    val after = pairSet(
      Dedup.nearDupAgainstIndex(spark, probe, dir, threshold = 0.5))
    val afterIds = after.flatMap(p => Seq(p._1, p._2))
    assert(!afterIds.contains(1L)) // the retracted doc is gone
    assert(afterIds.contains(0L))  // the surviving near-dup still pairs
    val jacIds = pairSet(Dedup.jaccardAllPairsAgainstIndex(spark, probe,
      dir, threshold = 0.5)).flatMap(p => Seq(p._1, p._2))
    assert(!jacIds.contains(1L) && jacIds.contains(0L))
    // deleting ids the index never held changes nothing
    Dedup.deleteFromIndex(spark, dir, Seq(999L).toDF("doc_id"))
    assert(pairSet(Dedup.nearDupAgainstIndex(spark, probe, dir,
      threshold = 0.5)) === after)
    // shingle rows gone too (not just the candidate side)
    assert(spark.read.parquet(s"$dir/shingles")
      .where($"doc_id" === 1L).count() === 0L)
  }

  test("hamming index deletion by touched bucket; emptied buckets are " +
      "swept, and an emptied index still probes cleanly") {
    val b1 = Seq(
      (0L, base),
      (1L, "completely different words about spark query engines and " +
        "distributed joins running on large clusters of machines"))
      .toDF("doc_id", "text")
    val dir = tmp("hmdelete")
    Dedup.writeHammingIndex(Dedup.simhash(b1), dir, maxHamming = 8,
      pieceBuckets = 8)
    val probe = Dedup.simhash(
      Seq((20L, base.replace("tonight", "today"))).toDF("doc_id", "text"))
    def hset(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(hset(Dedup.hammingCandidatesAgainstIndex(spark, probe, dir))
      .exists(p => p._1 == 0L || p._2 == 0L))
    Dedup.deleteFromIndex(spark, dir, Seq(0L).toDF("doc_id"))
    assert(!hset(Dedup.hammingCandidatesAgainstIndex(spark, probe, dir))
      .exists(p => p._1 == 0L || p._2 == 0L))
    // retract EVERYTHING: probes return empty, never crash, and the
    // emptied bucket partition dirs are swept from disk
    Dedup.deleteFromIndex(spark, dir, Seq(0L, 1L).toDF("doc_id"))
    assert(hset(
      Dedup.hammingCandidatesAgainstIndex(spark, probe, dir)).isEmpty)
    assert(filesPerPartition(s"$dir/pieces").isEmpty)
  }

  test("IVF index deletion: retracted vectors leave every multi-assign " +
      "replica; top-k and semantic probes never name them") {
    val rnd = new scala.util.Random(5)
    val d0 = Array.tabulate(8)(i => if (i == 0) 1.0f else 0.0f)
    def around(): Seq[Float] =
      d0.map(x => x + 0.04f * rnd.nextGaussian().toFloat).toSeq
    val corpus = (0 until 12).map(i => (i.toLong, around()))
      .toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
    val dir = tmp("ivfdelete")
    val cents = Similarity.kmeansCentroids(corpus, nlist = 3, iters = 1)
    Similarity.writeIvfIndex(corpus, dir, cents, multiAssign = 2)
    val batch = Seq((100L, around())).toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
    assert(pairSet(Dedup.semanticNearDupAgainstIndex(spark, batch, dir,
      threshold = 0.9)).exists(p => p._1 == 3L || p._2 == 3L))
    Dedup.deleteFromIndex(spark, dir, Seq(3L).toDF("vec_id"))
    assert(spark.read.parquet(s"$dir/cells")
      .where($"vec_id" === 3L).count() === 0L) // every replica gone
    val sem = pairSet(Dedup.semanticNearDupAgainstIndex(spark, batch,
      dir, threshold = 0.9))
    assert(!sem.exists(p => p._1 == 3L || p._2 == 3L))
    assert(sem.nonEmpty) // the rest of the cluster still pairs
    val top = Similarity.ivfTopKIndexedSelf(spark, dir, batch, k = 12,
      nprobe = 3, multiAssigned = true).collect()
      .map(_.getLong(1)).toSet
    assert(!top.contains(3L) && top.nonEmpty)
  }

  test("IVF append under stored geometry: appended index answers " +
      "bit-identically to one written whole under the same centroids; " +
      "retried append's duplicates compact away; mismatched columns " +
      "and a missing index refuse") {
    val rnd = new scala.util.Random(7)
    val dirs2 = Seq(
      Array.tabulate(8)(i => if (i == 0) 1.0f else 0.0f),
      Array.tabulate(8)(i => if (i == 4) 1.0f else 0.0f))
    def around(d: Array[Float]): Seq[Float] =
      d.map(x => x + 0.04f * rnd.nextGaussian().toFloat).toSeq
    def vecs(ids: Range) = ids.map(i => (i.toLong, around(dirs2(i % 2))))
      .toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
    val standing = vecs(0 until 16)
    val weekly = vecs(16 until 24)
    val cents = Similarity.kmeansCentroids(standing, nlist = 4, iters = 1)

    // reference: the union indexed in one shot under the SAME centroids
    val whole = tmp("ivfwhole")
    Similarity.writeIvfIndex(standing.unionByName(weekly), whole, cents,
      multiAssign = 2)
    // under test: standing indexed, weekly appended
    val dir = tmp("ivfappend")
    Similarity.writeIvfIndex(standing, dir, cents, multiAssign = 2)
    Similarity.appendIvfIndex(weekly, dir)

    val queries = vecs(0 until 3)
    def topk(d: String) = Similarity.ivfTopKIndexedSelf(spark, d,
      queries, k = 6, nprobe = 4, multiAssigned = true).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSeq
    val batch = vecs(100 until 103)
    def sem(d: String) = pairSet(
      Dedup.semanticNearDupAgainstIndex(spark, batch, d, threshold = 0.9))
    assert(topk(dir) === topk(whole))
    assert(sem(dir) === sem(whole))
    assert(sem(dir).nonEmpty)

    // crashed-append recovery: the SAME append retried → duplicate
    // (vec_id, cell) rows, probes unchanged, compaction removes them
    Similarity.appendIvfIndex(weekly, dir)
    assert(sem(dir) === sem(whole))
    val cells = () => spark.read.parquet(s"$dir/cells")
    assert(cells().count() >
      cells().dropDuplicates("vec_id", "cell").count())
    Dedup.compactIndex(spark, dir)
    assert(cells().count() ===
      cells().dropDuplicates("vec_id", "cell").count())
    assert(topk(dir) === topk(whole))

    // a batch missing the indexed corpus' columns is refused
    intercept[IllegalArgumentException] {
      Similarity.appendIvfIndex(
        weekly.withColumn("extra", lit(1)), dir)
    }
    // appending to a non-index refuses loudly (no params to trust)
    intercept[Exception] {
      Similarity.appendIvfIndex(weekly, tmp("notanindex"))
    }
  }

  test("IVF index rebuild: re-trained geometry grows nlist, membership " +
      "preserved, append duplicates collapse, extra columns and stored " +
      "knobs survive, crashed rebuild resumes from the staged corpus") {
    val rnd = new scala.util.Random(13)
    val dirs2 = Seq(
      Array.tabulate(8)(i => if (i == 0) 1.0f else 0.0f),
      Array.tabulate(8)(i => if (i == 4) 1.0f else 0.0f))
    def around(d: Array[Float]): Seq[Float] =
      d.map(x => x + 0.04f * rnd.nextGaussian().toFloat).toSeq
    def vecs(ids: Range) = ids
      .map(i => (i.toLong, around(dirs2(i % 2)), s"tag$i"))
      .toDF("vec_id", "embedding", "tag")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"),
        $"tag")
    val standing = vecs(0 until 16)
    val weekly = vecs(16 until 24)
    val dir = tmp("ivfrebuild")
    Similarity.writeIvfIndex(standing, dir,
      Similarity.kmeansCentroids(standing, nlist = 2, iters = 1))
    // a season of appends, one retried (duplicate rows) — the
    // degradation scenario rebuild exists for
    Similarity.appendIvfIndex(weekly, dir)
    Similarity.appendIvfIndex(weekly, dir)

    Similarity.rebuildIvfIndex(spark, dir, nlist = 4)

    val cells = spark.read.parquet(s"$dir/cells")
    // membership: every indexed id exactly once (multiAssign 1), the
    // retried append's duplicates collapsed by the distinct staging
    assert(cells.select($"vec_id").collect().map(_.getLong(0)).sorted
      .toSeq === (0L until 24L))
    assert(cells.columns.contains("tag"))
    // geometry: 4 centroids now stored; knobs survived the resize
    assert(spark.read.parquet(s"$dir/centroids").count() === 4)
    assert(Similarity.readIvfIndexParams(spark, dir) === ((1, "flat")))
    // answers under the new geometry: a near-dup of an indexed vector
    // is still found, and the staging dir is gone
    val probe = vecs(100 until 102)
      .select($"vec_id", $"embedding")
    assert(pairSet(Dedup.semanticNearDupAgainstIndex(spark, probe, dir,
      threshold = 0.9)).nonEmpty)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dir/rebuild_staged")))

    // crashed rebuild: params/ + centroids/ died mid-rewrite, the
    // staged corpus survived — resume requires explicit geometry, then
    // restores a probeable index and sweeps the staging dir
    cells.drop("cell").dropDuplicates("vec_id")
      .write.parquet(s"$dir/rebuild_staged")
    Seq("params", "centroids").foreach { s =>
      val p = new org.apache.hadoop.fs.Path(s"$dir/$s")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(p, true)
    }
    intercept[IllegalArgumentException] {
      Similarity.rebuildIvfIndex(spark, dir, nlist = 4)
    }
    Similarity.rebuildIvfIndex(spark, dir, nlist = 4,
      multiAssign = 1, quantizer = "auto", storage = "f32")
    assert(pairSet(Dedup.semanticNearDupAgainstIndex(spark, probe, dir,
      threshold = 0.9)).nonEmpty)
    assert(spark.read.parquet(s"$dir/cells")
      .select($"vec_id").distinct().count() === 24)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dir/rebuild_staged")))
    // a dir with neither params/ nor a staged corpus refuses
    intercept[IllegalArgumentException] {
      Similarity.rebuildIvfIndex(spark, tmp("norebuild"), nlist = 2,
        multiAssign = 1, quantizer = "auto", storage = "f32")
    }
  }

  test("chunk index deletion is content-addressed: deleteFromIndex " +
      "refuses, deleteFromChunkIndex retracts content, watermark and " +
      "monotone-id check stand") {
    val passage = "alpha beta gamma delta epsilon zeta eta theta"
    val other = "one two three four five six seven eight nine ten"
    val b1 = Seq((0L, passage), (1L, other)).toDF("doc_id", "text")
    val dir = tmp("chdelete")
    Dedup.writeChunkIndex(b1, dir, chunkTokens = 4, chunkBuckets = 8)
    intercept[IllegalArgumentException] {
      Dedup.deleteFromIndex(spark, dir, Seq(0L).toDF("doc_id"))
    }
    def rows(df: DataFrame) =
      df.select($"doc_id", $"n_chunks", $"n_kept").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    // before retraction: a batch duplicating doc 0's passage dedups
    val b2 = Seq((10L, passage), (11L, other)).toDF("doc_id", "text")
    assert(rows(Dedup.dedupChunksAgainstIndex(spark, b2, dir))
      .forall(r => r._3 === 0))
    // retract doc 0's content; doc 1's stays indexed
    Dedup.deleteFromChunkIndex(spark, dir,
      Seq((0L, passage)).toDF("doc_id", "text"))
    val after = rows(Dedup.dedupChunksAgainstIndex(spark, b2, dir))
    assert(after.exists(r => r._1 == 10L && r._3 === r._2)) // kept now
    assert(after.exists(r => r._1 == 11L && r._3 === 0))    // still dedups
    // the watermark did not move: ids at or below it stay rejected
    assert(spark.read.parquet(s"$dir/params")
      .head().getAs[Long]("max_doc_id") === 1L)
    intercept[IllegalArgumentException] {
      Dedup.dedupChunksAgainstIndex(spark, b1, dir).collect()
    }
  }

  test("containment index: compaction keeps probe answers bit-identical " +
      "and collapses retried-append duplicates (hit counts are " +
      "duplicate-sensitive); deletion removes a retracted doc from " +
      "candidates and verify; stats cover both sub-datasets") {
    val small = "alpha beta gamma delta epsilon zeta eta theta"
    val b1 = Seq(
      (0L, small),
      (1L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    val b2 = Seq((2L, "totally distinct words about ocean currents " +
      "and rolling tides tonight")).toDF("doc_id", "text")
    val dir = tmp("contmaint")
    Dedup.writeContainmentIndex(b1, dir, postingBuckets = 8)
    Dedup.writeContainmentIndex(b2, dir, postingBuckets = 8,
      mode = "append")
    // the documented crashed-append recovery: re-run the SAME append
    Dedup.writeContainmentIndex(b2, dir, postingBuckets = 8,
      mode = "append")
    val postings = () => spark.read.parquet(s"$dir/postings")
    assert(postings().count() > postings().distinct().count())
    val batch = Seq(
      (10L, s"$small plus a tail"),
      (11L, "ocean currents and rolling tides tonight onto shores"))
      .toDF("doc_id", "text")
    def probe() = pairSet(Dedup.containmentPairsAgainstIndex(spark,
      batch, dir, threshold = 0.5))
    val before = probe()
    assert(before.exists(p => p._1 == 0L && p._2 == 10L))
    assert(before.exists(p => p._1 == 2L && p._2 == 11L))
    val st = Dedup.indexStats(spark, dir).collect()
      .map(r => r.getString(1) -> r).toMap
    assert(st.keySet === Set("postings", "shingles"))
    assert(st("postings").getLong(2) > st("postings").getLong(3))
    Dedup.compactIndex(spark, dir)
    assert(probe() === before)
    assert(postings().count() === postings().distinct().count())
    assert(filesPerPartition(s"$dir/postings").values.forall(_ === 1))
    // retraction: doc 2 stops generating candidates; doc 0 stands
    Dedup.deleteFromIndex(spark, dir, Seq(2L).toDF("doc_id"))
    val after = probe()
    assert(!after.exists(p => p._1 == 2L || p._2 == 2L))
    assert(after.exists(p => p._1 == 0L && p._2 == 10L))
    assert(spark.read.parquet(s"$dir/shingles")
      .where($"doc_id" === 2L).count() === 0L)
  }

  /** Rewrite an index's shingles/ to the pre-round-12 FLAT layout and
    * strip `shingle_buckets` from params — the legacy state every
    * bucketed-layout test needs to prove compatibility against. */
  private def demoteShinglesToFlat(dir: String): Unit = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val sh = spark.read.parquet(s"$dir/shingles")
      .select($"doc_id", $"sh").localCheckpoint()
    fs.delete(new Path(s"$dir/shingles"), true)
    sh.write.parquet(s"$dir/shingles")
    val p = spark.read.parquet(s"$dir/params")
      .drop("shingle_buckets").localCheckpoint()
    fs.delete(new Path(s"$dir/params"), true)
    p.write.parquet(s"$dir/params")
  }

  /** file NAMES per partition dir — part files get fresh UUID names on
    * every write, so name-set equality proves a dir was NOT rewritten. */
  private def fileNames(sub: String): Map[String, Set[String]] = {
    val root = java.nio.file.Paths.get(sub)
    val l = java.nio.file.Files.list(root)
    try l.toArray.map(_.asInstanceOf[java.nio.file.Path])
      .filter(p => java.nio.file.Files.isDirectory(p) &&
        p.getFileName.toString.contains("="))
      .map { p =>
        val ll = java.nio.file.Files.list(p)
        try p.getFileName.toString -> ll.toArray
          .map(_.asInstanceOf[java.nio.file.Path].getFileName.toString)
          .filter(_.endsWith(".parquet")).toSet
        finally ll.close()
      }.toMap
    finally l.close()
  }

  test("bucketed shingles/: deletion rewrites ONLY the retracted ids' " +
      "buckets (file-level), probe answers match a flat index " +
      "bit-identically, and migrateShingleBuckets upgrades a legacy " +
      "index in place — crashed-migration state included") {
    val docs = (0L until 12L).map(i => (i,
      if (i % 3 == 0) base
      else if (i % 3 == 1) base.replace("tonight", s"today$i")
      else s"unrelated document number $i about spark query engines " +
        s"and distributed joins on cluster $i")).toDF("doc_id", "text")
    val probe = Seq((100L, base)).toDF("doc_id", "text")
    def pairs(d: String) = pairSet(
      Dedup.nearDupAgainstIndex(spark, probe, d, threshold = 0.5))
    def jac(d: String) = pairSet(
      Dedup.jaccardAllPairsAgainstIndex(spark, probe, d, threshold = 0.5))

    // the bucketed layout (the default write) vs a legacy flat index
    // over the same corpus: bit-identical probe answers
    val dir = tmp("shbucket")
    Dedup.writeMinhashIndex(docs, dir, bandBuckets = 8,
      shingleBuckets = 4)
    val legacy = tmp("shflat")
    Dedup.writeMinhashIndex(docs, legacy, bandBuckets = 8)
    demoteShinglesToFlat(legacy)
    assert(fileNames(s"$legacy/shingles").isEmpty) // really flat
    assert(pairs(dir).nonEmpty)
    assert(pairs(dir) === pairs(legacy))
    assert(jac(dir) === jac(legacy))

    // deletion on the bucketed layout: doc 3 lives in bucket 3 — every
    // other shingle bucket's part files must be untouched BY NAME
    val before = fileNames(s"$dir/shingles")
    assert(before.keySet.size > 1)
    Dedup.deleteFromIndex(spark, dir, Seq(3L).toDF("doc_id"))
    val after = fileNames(s"$dir/shingles")
    assert(spark.read.parquet(s"$dir/shingles")
      .where($"doc_id" === 3L).count() === 0L)
    (before.keySet - "bucket=3").foreach { b =>
      assert(after(b) === before(b),
        s"untouched shingle bucket $b was rewritten")
    }
    assert(after.get("bucket=3") !== before.get("bucket=3"))
    // the same deletion on the flat index full-rewrites but agrees
    Dedup.deleteFromIndex(spark, legacy, Seq(3L).toDF("doc_id"))
    assert(pairs(dir) === pairs(legacy))
    assert(jac(dir) === jac(legacy))

    // migration: the flat index upgrades in place; answers identical,
    // deletion now bucket-local
    Dedup.migrateShingleBuckets(spark, legacy, shingleBuckets = 4)
    assert(fileNames(s"$legacy/shingles").nonEmpty)
    assert(pairs(legacy) === pairs(dir))
    assert(jac(legacy) === jac(dir))
    val mBefore = fileNames(s"$legacy/shingles")
    Dedup.deleteFromIndex(spark, legacy, Seq(4L).toDF("doc_id"))
    val mAfter = fileNames(s"$legacy/shingles")
    (mBefore.keySet - "bucket=0").foreach { b =>
      assert(mAfter(b) === mBefore(b))
    }
    // re-running a completed migration is a no-op (same file names)
    Dedup.migrateShingleBuckets(spark, legacy, shingleBuckets = 4)
    assert(fileNames(s"$legacy/shingles") === mAfter)
    // RE-bucket (4 → 2): the demote-params-first protocol rewrites the
    // layout at the new count with answers intact and params updated
    val preRebucket = (pairs(legacy), jac(legacy))
    Dedup.migrateShingleBuckets(spark, legacy, shingleBuckets = 2)
    assert(fileNames(s"$legacy/shingles").keySet
      .forall(Set("bucket=0", "bucket=1")))
    assert((pairs(legacy), jac(legacy)) === preRebucket)

    // crashed-migration state: bucketed data under flat params reads
    // correctly (unpruned) and a re-run completes the migration
    val crash = tmp("shcrash")
    Dedup.writeMinhashIndex(docs, crash, bandBuckets = 8,
      shingleBuckets = 4)
    val expected = pairs(crash)
    val expectedJac = jac(crash)
    val p = spark.read.parquet(s"$crash/params")
      .drop("shingle_buckets").localCheckpoint()
    val fs = new org.apache.hadoop.fs.Path(crash)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$crash/params"), true)
    p.write.parquet(s"$crash/params")
    assert(pairs(crash) === expected)
    assert(jac(crash) === expectedJac)
    // an APPEND into the crashed state must refuse: its flat part
    // files next to the bucket= dirs would make shingles/ unreadable
    // (conflicting directory structures) — including by the migration
    // re-run that would otherwise repair the index
    val appendRefused = intercept[IllegalArgumentException] {
      Dedup.writeMinhashIndex(
        Seq((50L, "fresh append document about message queues"))
          .toDF("doc_id", "text"),
        crash, bandBuckets = 8, mode = "append")
    }
    assert(appendRefused.getMessage.contains("migrateShingleBuckets"))
    Dedup.migrateShingleBuckets(spark, crash, shingleBuckets = 4)
    assert(pairs(crash) === expected)
    // post-repair the append goes through (bucketed layout restored)
    Dedup.writeMinhashIndex(
      Seq((50L, "fresh append document about message queues"))
        .toDF("doc_id", "text"),
      crash, bandBuckets = 8, mode = "append")
    assert(pairs(crash) === expected)

    // a non-shingle family refuses the migration
    val hm = tmp("shhm")
    Dedup.writeHammingIndex(Dedup.simhash(docs), hm, pieceBuckets = 8)
    intercept[IllegalArgumentException] {
      Dedup.migrateShingleBuckets(spark, hm)
    }
  }

  test("containment index: bucketed shingles/ deletion is " +
      "bucket-local and a legacy flat containment index still probes " +
      "and migrates") {
    val small = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = (0L until 8L).map(i => (i,
      if (i == 0) small
      else s"filler document $i with words nobody else shares " +
        s"numbered $i uniquely")).toDF("doc_id", "text")
    val batch = Seq((50L, s"$small plus a tail")).toDF("doc_id", "text")
    def probe(d: String) = pairSet(Dedup.containmentPairsAgainstIndex(
      spark, batch, d, threshold = 0.5))
    val dir = tmp("ctbucket")
    Dedup.writeContainmentIndex(docs, dir, postingBuckets = 8,
      shingleBuckets = 4)
    val legacy = tmp("ctflat")
    Dedup.writeContainmentIndex(docs, legacy, postingBuckets = 8)
    demoteShinglesToFlat(legacy)
    assert(probe(dir).nonEmpty)
    assert(probe(dir) === probe(legacy))
    val before = fileNames(s"$dir/shingles")
    Dedup.deleteFromIndex(spark, dir, Seq(5L).toDF("doc_id"))
    val after = fileNames(s"$dir/shingles")
    (before.keySet - "bucket=1").foreach { b =>
      assert(after(b) === before(b))
    }
    assert(probe(dir).nonEmpty) // doc 0's pair stands
    Dedup.migrateShingleBuckets(spark, legacy, shingleBuckets = 4)
    Dedup.deleteFromIndex(spark, legacy, Seq(5L).toDF("doc_id"))
    assert(probe(legacy) === probe(dir))
  }

  test("indexStats: duplicate-row volume and files-per-bucket " +
      "amplification visible before compaction, gone after") {
    val dir = tmp("stats")
    val b1 = Seq((0L, base),
      (1L, "completely different words about spark query engines and " +
        "distributed joins running on large clusters of machines"))
      .toDF("doc_id", "text")
    val b2 = Seq((10L, "yet another unrelated document discussing " +
      "minhash banding signatures buckets and hashing methods"))
      .toDF("doc_id", "text")
    Dedup.writeMinhashIndex(b1, dir, bandBuckets = 8)
    Dedup.writeMinhashIndex(b2, dir, bandBuckets = 8, mode = "append")
    // the documented crashed-append retry lays duplicate rows
    Dedup.writeMinhashIndex(b2, dir, bandBuckets = 8, mode = "append")
    def stats() = Dedup.indexStats(spark, dir).collect()
      .map(r => r.getString(1) -> r).toMap
    val before = stats()
    assert(before.keySet === Set("bands", "shingles"))
    assert(before("bands").getString(0) === "minhash")
    // duplicate volume: the retried append's rows, exactly
    assert(before("bands").getLong(2) > before("bands").getLong(3))
    assert(before("shingles").getLong(2) > before("shingles").getLong(3))
    // file amplification: ≥ 2 appends landed in some shared bucket
    assert(before("bands").getInt(6) >= 2)
    Dedup.compactIndex(spark, dir)
    val after = stats()
    // rows collapse to the predicted unique count; one file per bucket
    assert(after("bands").getLong(2) === before("bands").getLong(3))
    assert(after("bands").getLong(2) === after("bands").getLong(3))
    assert(after("bands").getInt(6) === 1)
    assert(after("shingles").getLong(2) === after("shingles").getLong(3))
    // partition count is the live bucket dirs, not the configured max
    assert(after("bands").getInt(4) > 0 && after("bands").getInt(4) <= 8)
    // population skew rides the report (raw-row basis, like n_rows):
    // before compaction the retried append's duplicates inflate it
    assert(before("bands").getAs[Long]("max_rows_per_partition") >=
      after("bands").getAs[Long]("max_rows_per_partition"))
    assert(after("bands").getAs[Long]("max_rows_per_partition") > 0L)
  }

  test("indexStats max_rows_per_partition: an IVF cell bulging under " +
      "frozen append geometry is visible in the report — the rebuild " +
      "trigger compaction cannot fix") {
    import graft.operators.Similarity
    val emb = spark.read.parquet(sf() + "/embeddings.parquet")
      .localCheckpoint()
    val dir = tmp("stats_skew")
    Similarity.writeIvfIndex(emb, dir, Similarity.collectCentroids(
      Similarity.ivfCentroids(emb, nlist = 8)))
    // a drifted ingest: 200 new vectors all equal to ONE existing
    // vector — frozen centroids assign every one into the same cell
    // (the batch carries ALL indexed columns; appends refuse schema
    // drift)
    val one = broadcast(emb.limit(1).drop("vec_id").localCheckpoint())
    val hot = spark.range(1000L, 1200L)
      .select(col("id").as("vec_id")).crossJoin(one)
    Similarity.appendIvfIndex(hot, dir)
    val cells = Dedup.indexStats(spark, dir).collect()
      .find(_.getString(1) === "cells").get
    val (nRows, nPart, maxRows) = (cells.getAs[Long]("n_rows"),
      cells.getAs[Int]("n_partitions"),
      cells.getAs[Long]("max_rows_per_partition"))
    assert(maxRows >= 200L)
    // the skew signal: the hot cell carries several × the mean
    assert(maxRows.toDouble / (nRows.toDouble / nPart) > 2.0,
      s"maxRows=$maxRows nRows=$nRows nPart=$nPart")
  }

  test("benchmark index: maintainIndexes compacts it (screen answers " +
      "bit-identical, one file per bucket); retracting an eval set " +
      "stops flagging exactly its n-grams") {
    val root = tmp("benchroot")
    val dir = s"$root/benchmark"
    val setA = Seq((0L, base)).toDF("doc_id", "text")
    val setB = Seq((1L, "totally distinct benchmark prompts about " +
      "ocean currents and tides rolling steadily"))
      .toDF("doc_id", "text")
    Dedup.writeBenchmarkIndex(setA, dir, hashBuckets = 8)
    Dedup.writeBenchmarkIndex(setB, dir, hashBuckets = 8,
      mode = "append")
    // the documented crashed-append recovery: re-run the SAME append
    Dedup.writeBenchmarkIndex(setB, dir, hashBuckets = 8,
      mode = "append")
    val hashes = () => spark.read.parquet(s"$dir/hashes")
    assert(hashes().count() > hashes().distinct().count())
    val batch = Seq(
      (10L, base),
      (11L, "ocean currents and tides rolling steadily onto the shore"),
      (12L, "nothing in common here at all with anything indexed"))
      .toDF("doc_id", "text")
    def screen() = Dedup
      .contaminationScreenAgainstIndex(spark, batch, dir)
      .orderBy($"doc_id").collect()
    val before = screen().map(_.toSeq).toSeq
    // the composed sweep reaches the benchmark family like every other
    Pipeline.maintainIndexes(spark, root)
    assert(screen().map(_.toSeq).toSeq === before)
    assert(hashes().count() === hashes().distinct().count())
    val perBucket = filesPerPartition(s"$dir/hashes")
    assert(perBucket.nonEmpty)
    assert(perBucket.values.forall(_ === 1),
      s"expected one file per bucket, got $perBucket")
    // content-addressed: id-keyed deletion refuses loudly
    intercept[IllegalArgumentException] {
      Dedup.deleteFromIndex(spark, dir, Seq(0L).toDF("doc_id"))
    }
    // retract set B (disjoint shingles from set A, so the remainder is
    // exact): doc 11 stops flagging, doc 10 (set A overlap) keeps its
    // counts, and the result equals a fresh index over set A alone
    Dedup.deleteFromBenchmarkIndex(spark, dir, setB)
    val after = screen()
    val m = after.map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(m(11L) === 0L)
    assert(m(10L) > 0L)
    assert(m(12L) === 0L)
    val freshDir = tmp("benchfresh")
    Dedup.writeBenchmarkIndex(setA, freshDir, hashBuckets = 8)
    assert(Dedup.contaminationScreenAgainstIndex(spark, batch, freshDir)
      .orderBy($"doc_id").collect().map(_.toSeq).toSeq ===
      after.map(_.toSeq).toSeq)
  }
}
