package graft

import org.apache.spark.sql.functions._

import graft.operators.Retrieval

/** BM25 retrieval: hand-computed scores on a tiny corpus, ranking
  * determinism, idf behavior.
  */
class RetrievalSpec extends SparkSuite {
  import spark.implicits._

  private val docs = Seq(
    (0L, "spark spark join"),      // tf(spark)=2, dl=3
    (1L, "spark window"),          // tf(spark)=1, dl=2
    (2L, "completely unrelated"),  // no query terms
    (3L, ""))                      // zero tokens
    .toDF("doc_id", "text")

  test("bm25TopK matches the hand-computed Okapi arithmetic and ranks " +
      "deterministically") {
    val queries = Seq((0, "spark")).toDF("query_id", "text")
    val r = Retrieval.bm25TopK(docs, queries, k = 10)
      .orderBy($"rank").collect()
      .map(x => (x.getInt(0), x.getLong(1), x.getDouble(2), x.getInt(3)))
    // N=4, df(spark)=2, idf = ln(1 + (4-2+0.5)/(2+0.5)) = ln(2)
    // avgdl = 7/4 = 1.75
    val idf = BigDecimal(math.log(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def score(tf: Double, dl: Double) = BigDecimal(
        idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / 1.75)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.map(_._2).toSeq === Seq(0L, 1L)) // only matching docs
    assert(r(0)._3 === score(2.0, 3.0))
    assert(r(1)._3 === score(1.0, 2.0))
    assert(r.map(_._4).toSeq === Seq(1, 2))
    // doc 0 outranks doc 1: higher tf beats its longer length here
    assert(r(0)._3 > r(1)._3)
  }

  test("rarer terms outweigh common ones; absent terms return no " +
      "rows; k bounds the output; duplicate query terms collapse") {
    val corpus = (0L until 20L).map(i =>
        (i, if (i == 0) "rare common" else "common filler")).toDF(
      "doc_id", "text")
    val q = Seq((0, "rare"), (1, "common"), (2, "absent"),
      (3, "rare rare")).toDF("query_id", "text")
    val r = Retrieval.bm25TopK(corpus, q, k = 3).collect()
      .map(x => (x.getInt(0), x.getLong(1), x.getDouble(2), x.getInt(3)))
    val byQ = r.groupBy(_._1)
    // rare: one hit, scored far above any common hit
    assert(byQ(0).map(_._2).toSeq === Seq(0L))
    assert(byQ(0).head._3 > byQ(1).map(_._3).max * 2)
    // common: k=3 bounds 20 matches
    assert(byQ(1).length === 3)
    assert(byQ(1).map(_._4).sorted.toSeq === Seq(1, 2, 3))
    // absent term: no candidate rows at all
    assert(!byQ.contains(2))
    // "rare rare" ≡ "rare" (bag-of-words query, duplicates collapse)
    assert(byQ(3).map(x => (x._2, x._3)).toSeq ===
      byQ(0).map(x => (x._2, x._3)).toSeq)
  }

  test("the persisted BM25 index probe is score-and-rank identical to " +
      "the inline run; appends fold stats in; retried-append " +
      "duplicates collapse; compaction preserves answers") {
    import graft.operators.{Dedup, Retrieval}
    val corpus = Seq(
      (0L, "spark spark join engines"),
      (1L, "spark window functions"),
      (2L, "join join join order"),
      (3L, "entirely unrelated words"),
      (10L, "spark join window appended"),
      (11L, "late batch join document"))
      .toDF("doc_id", "text")
    val queries = Seq((0, "spark join"), (1, "window"))
      .toDF("query_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getLong(1),
        r.getDouble(2), r.getInt(3))).toSet
    val inline = rows(Retrieval.bm25TopK(corpus, queries, k = 10))
    // full-corpus index == inline, bit for bit
    val dir = java.nio.file.Files.createTempDirectory("bm25i").toString
    Retrieval.writeBm25Index(corpus, dir, tokenBuckets = 8,
      dlBuckets = 4)
    assert(rows(Retrieval.bm25TopKIndexed(spark, queries, dir,
      k = 10)) === inline)
    // append path: index the low ids, fold the high ids in — stats
    // accumulate to the same corpus-wide values
    val dir2 = java.nio.file.Files.createTempDirectory("bm25a").toString
    Retrieval.writeBm25Index(corpus.where($"doc_id" < 10), dir2,
      tokenBuckets = 8, dlBuckets = 4)
    Retrieval.writeBm25Index(corpus.where($"doc_id" >= 10), dir2,
      tokenBuckets = 8, dlBuckets = 4, mode = "append")
    assert(rows(Retrieval.bm25TopKIndexed(spark, queries, dir2,
      k = 10)) === inline)
    // mismatched append knobs and non-monotone batches refuse
    intercept[IllegalArgumentException] {
      Retrieval.writeBm25Index(corpus, dir2, tokenBuckets = 16,
        dlBuckets = 4, mode = "append")
    }
    intercept[IllegalArgumentException] {
      Retrieval.writeBm25Index(corpus.where($"doc_id" < 10), dir2,
        tokenBuckets = 8, dlBuckets = 4, mode = "append")
    }
    // a retried crashed append = exact-duplicate rows: plant them by
    // re-appending the data files directly; the probe collapses them
    spark.read.parquet(s"$dir2/postings").write.mode("append")
      .partitionBy("bucket").parquet(s"$dir2/postings")
    spark.read.parquet(s"$dir2/doclen").write.mode("append")
      .partitionBy("dbucket").parquet(s"$dir2/doclen")
    assert(rows(Retrieval.bm25TopKIndexed(spark, queries, dir2,
      k = 10)) === inline)
    // compaction removes the duplicates and preserves answers
    Dedup.compactIndex(spark, dir2)
    val st = Dedup.indexStats(spark, dir2).collect()
      .map(r => r.getString(1) -> (r.getLong(2), r.getLong(3))).toMap
    assert(st("postings")._1 === st("postings")._2) // rows == distinct
    assert(rows(Retrieval.bm25TopKIndexed(spark, queries, dir2,
      k = 10)) === inline)
    // fsck recognizes the healthy family
    val f = graft.operators.Fsck.check(spark, dir2)
    assert(f.exists(x => x.level == "ok" && x.detail.contains("bm25")),
      f.mkString("\n"))
    // per-doc deletion refuses with the rebuild-only recovery (never a
    // bare MatchError)
    val e = intercept[IllegalArgumentException] {
      Dedup.deleteFromIndex(spark, dir2,
        Seq(0L).toDF("doc_id"))
    }
    assert(e.getMessage.contains("rebuild"), e.getMessage)
    // fsck flags an out-of-range postings bucket a pruned probe would
    // silently miss (token_buckets = 8, planted bucket 40)
    spark.read.parquet(s"$dir2/postings").limit(1)
      .withColumn("bucket", lit(40))
      .write.mode("append").partitionBy("bucket")
      .parquet(s"$dir2/postings")
    val f2 = graft.operators.Fsck.check(spark, dir2)
    assert(f2.exists(x => x.level == "error" &&
      x.dir.contains("postings")), f2.mkString("\n"))
  }

  test("retractCorpus rebuilds a standing bm25 index so the probe " +
      "surface never serves retracted documents") {
    import graft.operators.Retrieval
    val root = java.nio.file.Files
      .createTempDirectory("bm25retr").toString
    val idxRoot = s"$root/idx"
    val corpusDir = s"$root/corpus"
    val batch = Seq(
      (0L, "retract target unique tokens here", "en"),
      (1L, "surviving document about spark joins", "en"))
      .toDF("doc_id", "text", "lang")
    graft.Pipeline.refreshCorpus(spark, batch, idxRoot, corpusDir,
      jaccardThreshold = 0.5, chunkTokens = 4, bandBuckets = 8,
      pieceBuckets = 8, chunkBuckets = 8)
    Retrieval.writeBm25Index(
      spark.read.parquet(s"$corpusDir/corpus")
        .select($"doc_id", $"text"),
      s"$idxRoot/bm25", tokenBuckets = 8, dlBuckets = 4)
    val q = Seq((0, "retract target unique")).toDF("query_id", "text")
    assert(Retrieval.bm25TopKIndexed(spark, q, s"$idxRoot/bm25",
      k = 10).count() > 0)
    graft.Pipeline.retractCorpus(spark, Seq(0L).toDF("doc_id"),
      idxRoot, corpusDir).collect()
    // the rebuilt index no longer ranks the retracted doc
    val after = Retrieval.bm25TopKIndexed(spark, q, s"$idxRoot/bm25",
      k = 10).select($"doc_id").collect().map(_.getLong(0))
    assert(!after.contains(0L), after.toSeq.toString)
    // stats followed the rebuild (one doc left)
    assert(Retrieval.readBm25IndexParams(spark,
      s"$idxRoot/bm25")._3 === 1L)
  }

  test("refreshCorpus appends each published batch to a standing bm25 " +
      "index; an index stale from pre-append-era refreshes refuses") {
    import graft.operators.Retrieval
    val root = java.nio.file.Files
      .createTempDirectory("bm25ref").toString
    val idxRoot = s"$root/idx"
    val corpusDir = s"$root/corpus"
    def refresh(b: Seq[(Long, String, String)]) =
      graft.Pipeline.refreshCorpus(spark, b.toDF("doc_id", "text", "lang"),
        idxRoot, corpusDir, jaccardThreshold = 0.5, chunkTokens = 4,
        bandBuckets = 8, pieceBuckets = 8, chunkBuckets = 8)
    refresh(Seq((0L, "alpha document about spark joins", "en"),
      (1L, "beta document covering window frames", "en")))
    // ADOPT the retrieval family mid-corpus: build over the published
    // corpus (n_docs == corpus rows — the freshness contract)
    Retrieval.writeBm25Index(
      spark.read.parquet(s"$corpusDir/corpus")
        .select($"doc_id", $"text"),
      s"$idxRoot/bm25", tokenBuckets = 8, dlBuckets = 4)
    // the next refresh folds its published batch in — no manual append
    refresh(Seq((10L, "gamma zephyr quasar notes entirely fresh", "en"),
      (11L, "delta umbra syzygy rows also fresh", "en")))
    val q = Seq((0, "zephyr quasar")).toDF("query_id", "text")
    val hits = Retrieval.bm25TopKIndexed(spark, q, s"$idxRoot/bm25",
      k = 5).select($"doc_id").collect().map(_.getLong(0))
    assert(hits.contains(10L), hits.toSeq.toString)
    assert(Retrieval.readBm25IndexParams(spark, s"$idxRoot/bm25")._3
      === 4L)
    // a recovery re-run of the SAME batch is a read-back no-op (report
    // stands), not a double append
    refresh(Seq((10L, "gamma zephyr quasar notes entirely fresh", "en"),
      (11L, "delta umbra syzygy rows also fresh", "en")))
    assert(Retrieval.readBm25IndexParams(spark, s"$idxRoot/bm25")._3
      === 4L)

    // STALE refusal: a second corpus whose bm25 covers only batch 1
    // (the pre-append-era shape) must refuse the append — silently
    // folding one batch onto an index with holes loses documents
    val root2 = java.nio.file.Files
      .createTempDirectory("bm25stale").toString
    val idx2 = s"$root2/idx"
    val cd2 = s"$root2/corpus"
    def refresh2(b: Seq[(Long, String, String)]) =
      graft.Pipeline.refreshCorpus(spark, b.toDF("doc_id", "text", "lang"),
        idx2, cd2, jaccardThreshold = 0.5, chunkTokens = 4,
        bandBuckets = 8, pieceBuckets = 8, chunkBuckets = 8)
    refresh2(Seq((0L, "one ancient batch text here", "en")))
    Retrieval.writeBm25Index(
      spark.read.parquet(s"$cd2/corpus").select($"doc_id", $"text"),
      s"$idx2/bm25", tokenBuckets = 8, dlBuckets = 4)
    // this batch lands BEFORE the index learns to follow — simulate by
    // removing the appended rows' effect: rebuild the index from batch
    // 1 only AFTER batch 2 publishes
    refresh2(Seq((10L, "two middle batch entirely different", "en")))
    Retrieval.writeBm25Index(
      spark.read.parquet(s"$cd2/corpus").where($"doc_id" === 0L)
        .select($"doc_id", $"text"),
      s"$idx2/bm25", tokenBuckets = 8, dlBuckets = 4)
    val e = intercept[IllegalArgumentException] {
      refresh2(Seq((20L, "three newest batch words unique", "en")))
    }
    assert(e.getMessage.contains("stale"), e.getMessage)
  }

  test("a crashed retraction's re-run still rebuilds bm25 (the gate is " +
      "the ledger, not this run's count); a completed one's re-run " +
      "skips the corpus-scale rebuild") {
    import graft.operators.Retrieval
    val root = java.nio.file.Files
      .createTempDirectory("bm25crash").toString
    val idxRoot = s"$root/idx"
    val corpusDir = s"$root/corpus"
    val batch = Seq(
      (0L, "retract me xylophone quartz unique", "en"),
      (1L, "keeper document about spark joins", "en"),
      (2L, "another keeper on window frames", "en"))
      .toDF("doc_id", "text", "lang")
    graft.Pipeline.refreshCorpus(spark, batch, idxRoot, corpusDir,
      jaccardThreshold = 0.5, chunkTokens = 4, bandBuckets = 8,
      pieceBuckets = 8, chunkBuckets = 8)
    Retrieval.writeBm25Index(
      spark.read.parquet(s"$corpusDir/corpus")
        .select($"doc_id", $"text"),
      s"$idxRoot/bm25", tokenBuckets = 8, dlBuckets = 4)
    graft.Pipeline.retractCorpus(spark, Seq(0L).toDF("doc_id"),
      idxRoot, corpusDir).collect()
    // simulate the crash window the ADVICE names: the corpus rewrite
    // committed (doc 0 is gone, the ledger row stands) but the bm25
    // rebuild did not — restore the PRE-retraction index verbatim
    Retrieval.writeBm25Index(
      spark.read.parquet(s"$corpusDir/corpus")
        .select($"doc_id", $"text")
        .unionByName(Seq((0L, "retract me xylophone quartz unique"))
          .toDF("doc_id", "text")),
      s"$idxRoot/bm25", tokenBuckets = 8, dlBuckets = 4)
    val q = Seq((0, "xylophone quartz")).toDF("query_id", "text")
    assert(Retrieval.bm25TopKIndexed(spark, q, s"$idxRoot/bm25", k = 5)
      .where($"doc_id" === 0L).count() === 1L) // the stale surface
    // the documented recovery: re-run the SAME retraction. This run
    // retracts 0 rows (docs already gone) — an nRetracted gate would
    // skip the rebuild forever; the ledger gate rebuilds
    val r = graft.Pipeline.retractCorpus(spark, Seq(0L).toDF("doc_id"),
      idxRoot, corpusDir).head()
    assert(r.getAs[Long]("n_retracted") === 0L)
    assert(r.getAs[Long]("n_remaining") === 2L)
    assert(Retrieval.bm25TopKIndexed(spark, q, s"$idxRoot/bm25", k = 5)
      .where($"doc_id" === 0L).count() === 0L)
    assert(Retrieval.readBm25IndexParams(spark, s"$idxRoot/bm25")._3
      === 2L)
    // a re-run of the now-COMPLETED retraction skips the rebuild: the
    // postings files are byte-identical afterwards (no corpus-scale
    // pass on a no-op)
    import org.apache.hadoop.fs.Path
    val fs = new Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def postings(): Seq[(String, Long, Long)] = {
      val it = fs.listFiles(new Path(s"$idxRoot/bm25/postings"), true)
      val b = scala.collection.mutable.ArrayBuffer
        .empty[(String, Long, Long)]
      while (it.hasNext) {
        val s = it.next()
        b += ((s.getPath.toString, s.getLen, s.getModificationTime))
      }
      b.sortBy(_._1).toSeq
    }
    val before = postings()
    graft.Pipeline.retractCorpus(spark, Seq(0L).toDF("doc_id"),
      idxRoot, corpusDir).collect()
    assert(postings() === before)
  }

  test("a retraction that removed rows ALWAYS rebuilds bm25 — count " +
      "equality is not content equality (the stale-index trap)") {
    import graft.operators.Retrieval
    val root = java.nio.file.Files
      .createTempDirectory("bm25stale2").toString
    val idxRoot = s"$root/idx"
    val corpusDir = s"$root/corpus"
    val batch = Seq(
      (0L, "retract me xebec quince unique", "en"),
      (1L, "first keeper document on joins", "en"),
      (2L, "second keeper document on frames", "en"))
      .toDF("doc_id", "text", "lang")
    graft.Pipeline.refreshCorpus(spark, batch, idxRoot, corpusDir,
      jaccardThreshold = 0.5, chunkTokens = 4, bandBuckets = 8,
      pieceBuckets = 8, chunkBuckets = 8)
    // a PRE-APPEND-ERA stale index: covers docs {0, 1} only — its
    // n_docs (2) will EQUAL the post-retraction corpus count (2), so
    // a pure count gate would skip the rebuild and keep serving the
    // retracted doc 0 forever
    Retrieval.writeBm25Index(
      spark.read.parquet(s"$corpusDir/corpus")
        .where($"doc_id" < 2).select($"doc_id", $"text"),
      s"$idxRoot/bm25", tokenBuckets = 8, dlBuckets = 4)
    val q = Seq((0, "xebec quince")).toDF("query_id", "text")
    assert(Retrieval.bm25TopKIndexed(spark, q, s"$idxRoot/bm25", k = 5)
      .where($"doc_id" === 0L).count() === 1L)
    val r = graft.Pipeline.retractCorpus(spark, Seq(0L).toDF("doc_id"),
      idxRoot, corpusDir).head()
    assert(r.getAs[Long]("n_retracted") === 1L &&
      r.getAs[Long]("n_remaining") === 2L)
    // nRetracted > 0 forced the rebuild despite the count coincidence:
    // the retracted doc is gone AND the rebuilt index now covers the
    // full corpus (stale repair as a side effect)
    assert(Retrieval.bm25TopKIndexed(spark, q, s"$idxRoot/bm25", k = 5)
      .where($"doc_id" === 0L).count() === 0L)
    val q2 = Seq((0, "second keeper frames")).toDF("query_id", "text")
    assert(Retrieval.bm25TopKIndexed(spark, q2, s"$idxRoot/bm25",
      k = 5).where($"doc_id" === 2L).count() === 1L)
  }

  test("rrfFuse sums reciprocal ranks across rankings, hand-checked; " +
      "excludeSelf drops the probe doc BEFORE ranking") {
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val lex = Seq((0L, 10L, 1), (0L, 11L, 2)).toDF(
      "query_id", "doc_id", "rank")
    val sem = Seq((0L, 11L, 1), (0L, 12L, 2)).toDF(
      "query_id", "doc_id", "rank")
    val fused = Retrieval.rrfFuse(lex, sem, k = 10).orderBy($"rank")
      .collect().map(x =>
        (x.getLong(1), x.getDouble(2), x.getInt(3)))
    // doc 11 in BOTH rankings: 1/62 + 1/61 beats either single hit
    assert(fused.toSeq === Seq(
      (11L, r6(1.0 / 62 + 1.0 / 61), 1),
      (10L, r6(1.0 / 61), 2),
      (12L, r6(1.0 / 62), 3)))
    // excludeSelf: the probe doc would trivially rank #1 on its own
    // text; with the flag it is gone and ranks stay gapless from 1
    val probes = docs.where($"doc_id" === 0L)
      .select($"doc_id".as("query_id"), $"text")
    val kept = Retrieval.bm25TopK(docs, probes, k = 10,
        excludeSelf = true)
      .orderBy($"rank").collect()
      .map(x => (x.getLong(1), x.getInt(3)))
    assert(!kept.map(_._1).contains(0L))
    assert(kept.map(_._2).toSeq === (1 to kept.length).toSeq)
    // hybrid composition runs end to end over matching id spaces
    val emb = (0L until 4L).map(i => (i,
        Seq(1.0f * i, 1.0f, 0.5f * (i % 2)))).toDF("vec_id", "embedding")
    val h = Retrieval.hybridTopK(docs, emb, queryIds = Seq(0L), k = 3)
      .collect()
    assert(h.nonEmpty && h.forall(_.getLong(1) != 0L))
  }
}
