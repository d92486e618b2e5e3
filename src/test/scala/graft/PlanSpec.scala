package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Physical-plan assertions — the 100 TB posture, checked mechanically:
  * dimension joins broadcast (fact never shuffles for them), filters reach
  * the parquet scan, projections prune the read schema, aggregates are
  * partial+final (map-side combine before any exchange).
  */
class PlanSpec extends SparkSuite {

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("amplified update-join broadcasts the risk dimension " +
      "(no fact-side shuffle)") {
    val p = plan(SparkEntry.queries("q07_update_join")(spark, sf()))
    assert(p.contains("BroadcastHashJoin") ||
      p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("multiway join broadcasts the customer dimension") {
    val p = plan(SparkEntry.queries("q20_multiway_join")(spark, sf()))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("anti-join dimension repair broadcasts the dimension side") {
    val p = plan(SparkEntry.queries("q16_anti_join")(spark, sf()))
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      p.take(2000))
  }

  test("TPC-H q1 filter is pushed down to the parquet scan") {
    val p = plan(SparkEntry.queries("q24_tpch_q1")(spark, sf()))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), " +
      "LessThanOrEqual(l_shipdate"), p.take(3000))
  }

  test("projection prunes the parquet read schema to used columns") {
    val df = spark.read.parquet(sf() + "/lineitem.parquet")
      .select(col("l_orderkey"), col("l_quantity"))
    val p = plan(df)
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint," +
      "l_quantity:double>"), p.take(2000))
    // documents: metadata-only query never reads the text column
    val meta = spark.read.parquet(sf() + "/documents.parquet")
      .select(col("doc_id"), col("lang"))
    assert(plan(meta).contains("ReadSchema: struct<doc_id:bigint," +
      "lang:string>"))
  }

  test("flagship aggregation plans partial+final hash aggregates " +
      "(map-side combine before the exchange)") {
    val p = plan(SparkEntry.queries("q04_group_count")(spark, sf()))
    assert(p.contains("HashAggregate"), p.take(2000))
    assert(p.contains("Exchange hashpartitioning"), p.take(2000))
    // partial aggregate appears below the first exchange
    val firstAgg = p.indexOf("HashAggregate")
    assert(firstAgg >= 0)
  }

  test("signature pipeline stays map-only until the band join " +
      "(no shuffle before lshBands' exchange)") {
    val p = plan(graft.operators.Dedup.minhashSignatures(
      spark.read.parquet(sf() + "/documents.parquet")))
    assert(!p.contains("Exchange"), p.take(2000))
  }

  test("bucketed tables join without any exchange (co-located join)") {
    val orders = spark.read.parquet(sf() + "/orders.parquet")
    val customer = spark.read.parquet(sf() + "/customer.parquet")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    orders.write.bucketBy(4, "o_custkey").sortBy("o_custkey")
      .saveAsTable("b_orders")
    customer.write.bucketBy(4, "c_custkey").sortBy("c_custkey")
      .saveAsTable("b_customer")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders").join(spark.table("b_customer"),
        col("o_custkey") === col("c_custkey"))
      val p = plan(joined)
      assert(p.contains("SortMergeJoin"), p.take(2000))
      assert(!p.contains("Exchange"),
        "bucketed join should not shuffle:\n" + p.take(2000))
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("brute-force ANN broadcasts the query side, never shuffles the " +
      "corpus") {
    val emb = spark.read.parquet(sf() + "/embeddings.parquet")
    val p = plan(graft.operators.Similarity.bruteForceTopK(
      emb, emb.where(col("vec_id") < 5), 10))
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("SQ8 quantized scan broadcasts the query codes, never shuffles " +
      "the corpus; the parquet read prunes to (vec_id, embedding)") {
    val emb = spark.read.parquet(sf() + "/embeddings.parquet")
    val p = plan(graft.operators.Similarity.sq8TopK(
      emb, emb.where(col("vec_id") < 5), 10, rerank = 20))
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    // the re-rank join back onto the f32 vectors stays broadcast-side
    // too (candidates are k·|queries| rows) — no corpus shuffle
    assert(!p.contains("SortMergeJoin"), p.take(3000))
  }

  test("written IVF index probe scan is dynamically partition-pruned " +
      "to probed cells") {
    val emb = spark.read.parquet(sf() + "/embeddings.parquet")
    val cents = graft.operators.Similarity.collectCentroids(
      graft.operators.Similarity.ivfCentroids(emb, nlist = 8))
    val dir = java.nio.file.Files.createTempDirectory("ivfplan").toString
    graft.operators.Similarity.writeIvfIndex(emb, dir, cents)
    val p = plan(graft.operators.Similarity.ivfTopKIndexed(spark, dir,
      emb.where(col("vec_id") < 5), cents, k = 10, nprobe = 2))
    // the probe join keys on the partition column → the parquet scan
    // carries a dynamicpruning partition filter (IO ∝ nprobe/nlist)
    assert(p.contains("dynamicpruning"), p.take(3000))
  }

  test("SQ8-storage IVF probe: BOTH stages prune — the quantized " +
      "cells scan to probed cells, the f32 vectors scan to the " +
      "candidates' vbuckets; the filtered variant pushes the " +
      "predicate into the quantized scan") {
    val emb = spark.read.parquet(sf() + "/embeddings.parquet")
    val cents = graft.operators.Similarity.collectCentroids(
      graft.operators.Similarity.ivfCentroids(emb, nlist = 8))
    val dir = java.nio.file.Files
      .createTempDirectory("sq8plan").toString
    graft.operators.Similarity.writeIvfIndex(emb, dir, cents,
      storage = "sq8", vecBuckets = 8)
    val p = plan(graft.operators.Similarity.ivfTopKIndexed(spark, dir,
      emb.where(col("vec_id") < 5), cents, k = 10, nprobe = 2))
    // one dynamicpruning filter per stage: cells (probe join on the
    // cell partition column) and vectors (re-rank join on vbucket)
    val first = p.indexOf("dynamicpruning")
    assert(first >= 0, p.take(3000))
    assert(p.indexOf("dynamicpruning", first + 1) > first,
      "expected BOTH the cells and vectors scans pruned:\n" +
        p.take(4000))
    val pw = plan(graft.operators.Similarity.ivfTopKIndexedWhere(spark,
      dir, emb.where(col("vec_id") < 2), col("label") === 3, k = 5,
      nprobe = 2))
    assert(pw.contains("EqualTo(label,3)"), pw.take(3000))
  }

  test("minhash index probe scan is dynamically partition-pruned to " +
      "the batch's band buckets") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
      .where(col("doc_id") < 200)
    val dir = java.nio.file.Files.createTempDirectory("mhplan").toString
    graft.operators.Dedup.writeMinhashIndex(docs, dir)
    // a tiny batch probes far fewer buckets than the index holds — the
    // broadcast probe join keys on the partition column, so the bands/
    // scan must carry a dynamicpruning partition filter (IO ∝ probed
    // buckets / bandBuckets, the weekly-refresh economics)
    val batch = spark.range(1).select(lit(100000L).as("doc_id"),
      lit("a brand new incremental document about fresh topics").as("text"))
    val p = plan(graft.operators.Dedup.minhashCandidatesAgainstIndex(
      spark, batch, dir))
    assert(p.contains("dynamicpruning"), p.take(3000))
  }

  test("minhash index VERIFY scan (bucketed shingles/) is dynamically " +
      "partition-pruned to the candidate ids' doc-id buckets") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
      .where(col("doc_id") < 200)
    val dir = java.nio.file.Files.createTempDirectory("shplan").toString
    graft.operators.Dedup.writeMinhashIndex(docs, dir)
    // a near-dup of an indexed doc, so the candidate set is non-empty
    // and the verify stage reads shingles/. The candidates are
    // barrier'd (checkpoint scan) inside nearDupAgainstIndex, so the
    // ONLY parquet index scan left in the returned plan is the
    // shingles/ verify side — its dynamicpruning filter is the
    // bucketed layout's payoff (verify IO ∝ candidate ids' buckets,
    // not the corpus)
    val batch = docs.where(col("doc_id") < 3)
      .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
    val p = plan(graft.operators.Dedup.nearDupAgainstIndex(
      spark, batch, dir, threshold = 0.5))
    assert(p.contains("dynamicpruning"), p.take(3000))
  }

  test("chunk index probe scan is dynamically partition-pruned to the " +
      "batch's chunk buckets") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
      .where(col("doc_id") < 200)
    val dir = java.nio.file.Files.createTempDirectory("chplan").toString
    graft.operators.Dedup.writeChunkIndex(docs, dir, chunkTokens = 10)
    val batch = spark.range(1).select(lit(100000L).as("doc_id"),
      lit("a brand new incremental document about fresh topics").as("text"))
    val p = plan(graft.operators.Dedup.dedupChunksAgainstIndex(
      spark, batch, dir))
    assert(p.contains("dynamicpruning"), p.take(3000))
  }

  test("benchmark index probe scan is dynamically partition-pruned to " +
      "the batch's shingle-hash buckets") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
      .where(col("doc_id") < 200)
    val dir = java.nio.file.Files.createTempDirectory("bmplan").toString
    graft.operators.Dedup.writeBenchmarkIndex(docs, dir)
    val batch = spark.range(1).select(lit(100000L).as("doc_id"),
      lit("a brand new incremental document about fresh topics").as("text"))
    val p = plan(graft.operators.Dedup.contaminationScreenAgainstIndex(
      spark, batch, dir))
    assert(p.contains("dynamicpruning"), p.take(3000))
  }

  test("filtered ANN pushes the metadata predicate into the probed " +
      "cells scan (pre-filter cuts IO, not just candidates)") {
    val emb = spark.read.parquet(sf() + "/embeddings.parquet")
      .where(col("vec_id") < 200)
    val dir = java.nio.file.Files.createTempDirectory("ivffp").toString
    graft.operators.Similarity.writeIvfIndex(emb, dir,
      graft.operators.Similarity.collectCentroids(
        graft.operators.Similarity.ivfCentroids(emb, nlist = 4)))
    val p = plan(graft.operators.Similarity.ivfTopKIndexedWhere(spark,
      dir, emb.where(col("vec_id") < 2), col("label") === 3, k = 5,
      nprobe = 2))
    assert(p.contains("EqualTo(label,3)"), p.take(3000))
  }

  test("containment index probe scan is dynamically partition-pruned " +
      "to the batch's posting buckets") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
      .where(col("doc_id") < 200)
    val dir = java.nio.file.Files.createTempDirectory("ctplan").toString
    graft.operators.Dedup.writeContainmentIndex(docs, dir)
    val batch = spark.range(1).select(lit(100000L).as("doc_id"),
      lit("a brand new incremental document about fresh topics").as("text"))
    val p = plan(graft.operators.Dedup.containmentCandidatesAgainstIndex(
      spark, batch, dir))
    assert(p.contains("dynamicpruning"), p.take(3000))
  }

  test("Hamming signature index probe scan is dynamically " +
      "partition-pruned to the batch's piece buckets") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
      .where(col("doc_id") < 200)
    val dir = java.nio.file.Files.createTempDirectory("hmplan").toString
    graft.operators.Dedup.writeHammingIndex(
      graft.operators.Dedup.simhash(docs), dir, maxHamming = 3)
    val batch = spark.range(1).select(lit(100000L).as("doc_id"),
      lit("a brand new incremental document about fresh topics").as("text"))
    val p = plan(graft.operators.Dedup.hammingCandidatesAgainstIndex(
      spark, graft.operators.Dedup.simhash(batch), dir))
    assert(p.contains("dynamicpruning"), p.take(3000))
  }

  test("semantic near-dup probe scan is dynamically partition-pruned " +
      "to the batch's cells") {
    val emb = spark.read.parquet(sf() + "/embeddings.parquet")
      .where(col("vec_id") < 500)
    val cents = graft.operators.Similarity.collectCentroids(
      graft.operators.Similarity.ivfCentroids(emb, nlist = 8))
    val dir = java.nio.file.Files.createTempDirectory("semplan").toString
    graft.operators.Similarity.writeIvfIndex(emb, dir, cents)
    // one new vector occupies one cell — the broadcast probe join keys
    // on the cells/ partition column, so the embeddings scan must carry
    // a dynamicpruning partition filter (probe IO ∝ the batch's cell
    // footprint, the weekly-refresh economics)
    val batch = emb.where(col("vec_id") === 3)
      .select(lit(100000L).as("vec_id"), col("embedding"))
    val p = plan(graft.operators.Dedup.semanticNearDupAgainstIndex(
      spark, batch, dir, threshold = 0.5))
    assert(p.contains("dynamicpruning"), p.take(3000))
  }

  test("IVF cell assignment is a pure projection (no join, no exchange)") {
    val emb = spark.read.parquet(sf() + "/embeddings.parquet")
    val cents = graft.operators.Similarity.ivfCentroids(emb, nlist = 4)
    val p = plan(graft.operators.Similarity.ivfAssign(emb, cents))
    assert(!p.contains("Exchange") && !p.contains("Join"), p.take(2000))
  }

  test("exact Jaccard runs on the merge kernel, not array_intersect") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
      .where(col("doc_id") < 100)
    val p = plan(graft.operators.Dedup.jaccardAllPairs(docs))
    assert(p.contains("sorted_intersect_count"), p.take(3000))
    assert(!p.contains("array_intersect"), p.take(3000))
  }

  test("top-terms tf×df join shuffles both sides — the billion-row df " +
      "side is never broadcast") {
    val p = plan(SparkEntry.queries("q48_top_terms")(spark, sf()))
    assert(p.contains("ShuffledHashJoin") || p.contains("SortMergeJoin"),
      p.take(3000))
    assert(!p.contains("BroadcastHashJoin"),
      "df (distinct tokens — corpus-scale) must not broadcast:\n" +
        p.take(3000))
  }

  test("bucketed range join plans an equi-join on the value bucket, " +
      "not a nested loop") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the large-large shape the operator exists for
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val p = plan(SparkEntry.queries("q73_range_bucketed")(spark, sf()))
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        p.take(3000))
      assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
      assert(p.contains("__bkt"), p.take(3000))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("semdedup pair search equi-joins on the k-means cell, never " +
      "all-pairs") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the large-large shape: at 100 TB neither side broadcasts
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val p = plan(SparkEntry.queries("q75_semdedup_pairs")(spark, sf()))
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        p.take(3000))
      assert(!p.contains("BroadcastNestedLoopJoin") &&
        !p.contains("CartesianProduct"), p.take(3000))
      assert(p.contains("cell"), p.take(3000))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("bucketed as-of joins right rows on (key, bucket) — never a " +
      "key-only row-level join") {
    val p = plan(SparkEntry.queries("q55_asof_bucketed")(spark, sf()))
    // the only row-level right join carries the bucket in its key list:
    // the hot-key escape valve is the composite shuffle key
    assert(p.contains("__lb") && p.contains("__rbkt"), p.take(3000))
    // the carry window is partitioned by key (bucket-axis rows), not
    // global
    assert(p.contains("windowspecdefinition(__k"), p.take(3000))
  }

  test("pack bins ranks per range partition, never a global " +
      "single-partition window") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val p = plan(graft.operators.Sharding.packBins(docs, 8, numParts = 4))
    assert(p.contains("windowspecdefinition(pid"), p.take(3000))
  }

  test("score buckets rank per range partition, never a global " +
      "single-partition window") {
    val scored = spark.range(100).select(col("id").as("doc_id"),
      (col("id") % 7).cast("double").as("avg_logp"))
    val p = plan(graft.operators.Sharding.scoreBuckets(scored,
      numParts = 4))
    assert(p.contains("windowspecdefinition(pid"), p.take(3000))
  }

  test("weighted sample plans a bounded top-k, never a global sort") {
    val p = plan(SparkEntry.queries("q78_weighted_sample")(spark, sf()))
    assert(p.contains("TakeOrderedAndProject"), p.take(3000))
  }

  test("epoch reorder is ONE range exchange + in-partition sort: the " +
      "consumer's own partitioning, no global single-partition sort, " +
      "no key-side shuffle") {
    val seqs = spark.range(1000).select(col("id").as("seq_id"),
      array(col("id").cast("int")).as("ids"))
    val p = plan(graft.operators.Sharding.epochReorder(seqs, epoch = 2,
      numParts = 4))
    assert(p.contains("Exchange rangepartitioning"), p.take(3000))
    // exactly one exchange in the whole plan — the reorder IS the
    // consumer's range partition, nothing else shuffles
    assert("Exchange".r.findAllIn(p).size == 1, p.take(3000))
    // the sort is the in-partition one (Sort [...], global=false) —
    // a global sort would print true and add a second range exchange
    assert(p.contains("], false, 0") && !p.contains("], true, 0"),
      p.take(3000))
  }

  test("containment candidates equi-join postings on the shingle hash " +
      "with map-side hit counting — never a nested loop") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val p = plan(graft.operators.Dedup.containmentCandidates(docs))
    // the self-join must key on the posting hash h (BHJ at test scale,
    // SMJ/SHJ on a cluster — either way an equi-join, never BNLJ), and
    // the per-pair hit count must partial-aggregate before its exchange
    assert(p.contains("Join [h#") || p.contains("Join [h_"),
      p.take(3000))
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), p.take(3000))
    assert(p.contains("partial_count"), p.take(3000))
  }

  test("chunk dedup equi-joins on the chunk hash with a partial " +
      "min-aggregate — never a nested loop") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val p = plan(graft.operators.Dedup.dedupChunks(docs, chunkTokens = 10))
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), p.take(3000))
    // canonical-occurrence aggregate combines map-side before its
    // exchange (first-occurrence min over (doc_id, idx) per chunk key)
    assert(p.contains("partial_min"), p.take(3000))
  }

  test("corpus-prep screen front is map-only: zero shuffle exchanges, " +
      "one benchmark broadcast") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val bench = docs.where(pmod(col("doc_id"), lit(97)) === 0)
    val p = plan(graft.operators.CorpusPrep.screen(docs, bench,
      minStopHits = 0, maxContamination = 0.5))
    // the quality filter, the contamination columns, and their filters
    // must all ride the corpus scan: the composition adds NO
    // corpus-wide shuffle beyond what the dedup/pack stages own. The
    // CORPUS branch prints before the benchmark's BroadcastExchange —
    // everything under the broadcast is the eval-set-sized shingle
    // distinct that the contamination stage owns.
    assert(p.contains("BroadcastExchange"), p.take(3000))
    val corpusBranch = p.substring(0, p.indexOf("BroadcastExchange"))
    assert(!corpusBranch.contains("Exchange "), corpusBranch.take(3000))
    assert(corpusBranch.contains("FileScan parquet"),
      corpusBranch.take(3000))
    // the shingle-hash kernel must appear ONCE in the corpus branch:
    // without the screen's Generate fence the frac filter inlines it
    // ~3x per row into the join condition (no subexpression
    // elimination there — measured before the fence landed)
    val kernelCount =
      "shingle_hashes_sorted".r.findAllIn(corpusBranch).length
    assert(kernelCount === 1,
      s"shingle kernel appears $kernelCount times in the corpus " +
        s"branch:\n${corpusBranch.take(3000)}")
  }

  test("token sharding windows per range partition, never a global " +
      "single-partition window") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val df = graft.operators.Sharding.tokenShards(docs, budget = 2048L,
      numParts = 4)
    val p = plan(df)
    // the running sum is partitioned by pid — a Window with a non-empty
    // partition spec (an empty spec would funnel the corpus into 1 task)
    assert(p.contains("Window"), p.take(2000))
    assert(p.contains("partitionwindowspecdefinition") ||
      p.contains("windowspecdefinition(pid"), p.take(3000))
    assert(df.count() > 0)
  }

  test("temperature mix broadcasts the rate table onto a map-only " +
      "filter — the corpus never shuffle-joins its own mix rates") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
      .select(col("doc_id"), col("lang"))
    val p = plan(graft.operators.Sharding.temperatureMix(docs,
      col("lang")))
    // the #domains-row rate table is the build side; a SortMergeJoin
    // here would shuffle the corpus to join metadata
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("SortMergeJoin"), p.take(3000))
  }

  test("semantic contamination screen broadcasts the eval set and " +
      "partial-aggregates the max before its single exchange; the " +
      "indexed hits probe is dynamically partition-pruned") {
    val emb = spark.read.parquet(sf() + "/embeddings.parquet")
    val corpus = emb.where(pmod(col("vec_id"), lit(97)) =!= 0)
    val eval = emb.where(pmod(col("vec_id"), lit(97)) === 0)
    val p = plan(graft.operators.Dedup.semanticContaminationScreen(
      corpus, eval))
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    // the corpus×eval expansion collapses map-side: partial_max runs
    // BEFORE the exchange, which then carries one row per corpus vector
    assert(p.contains("partial_max"), p.take(4000))
    val dir = java.nio.file.Files
      .createTempDirectory("semscreenplan").toString
    graft.operators.Similarity.writeIvfIndex(corpus, dir,
      graft.operators.Similarity.collectCentroids(
        graft.operators.Similarity.ivfCentroids(corpus, nlist = 8)))
    val p2 = plan(graft.operators.Dedup
      .semanticContaminationHitsAgainstIndex(spark, dir, eval,
        threshold = 0.3, nprobe = 2))
    // probe IO ∝ the eval set's cell footprint, never the corpus
    assert(p2.contains("dynamicpruning"), p2.take(3000))
  }

  test("quality-classifier scoring broadcasts the weight table and " +
      "partial-aggregates per doc — the corpus never shuffle-joins " +
      "its own model") {
    import spark.implicits._
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val w = Seq(("fast", 0.25), ("slow", -0.5)).toDF("token", "weight")
    val p = plan(graft.operators.QualityClassifier.score(docs, w, -0.25))
    // the model-sized weight table is the build side everywhere; the
    // token stream's weighted sum collapses map-side before the one
    // doc_id exchange
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("SortMergeJoin"), p.take(3000))
    assert(p.contains("partial_sum"), p.take(4000))
  }

  test("line dedup shares the chunk family's equi-join + partial-min " +
      "plan; the indexed probe's chunks/ scan is partition-pruned") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val p = plan(graft.operators.Dedup.dedupLines(docs))
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), p.take(3000))
    assert(p.contains("partial_min"), p.take(3000))
    // the indexed probe partition-prunes chunks/ to the batch's buckets
    val dir = java.nio.file.Files.createTempDirectory("plline").toString
    graft.operators.Dedup.writeChunkIndexLines(
      docs.where(col("doc_id") < 250), dir, chunkBuckets = 8)
    val p2 = plan(graft.operators.Dedup.dedupChunksAgainstIndex(spark,
      docs.where(col("doc_id") >= 250), dir))
    assert(p2.contains("dynamicpruning"), p2.take(3000))
  }

  test("dsir scoring broadcasts the bucket-weight table onto a " +
      "map-side explode and partial-aggregates per doc; the resample " +
      "tail is a bounded top-k, never a global sort") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val target = docs.where(col("lang") === "en")
    val w = graft.operators.Sharding.dsirWeights(target, docs,
      buckets = 64)
    val p = plan(graft.operators.Sharding.dsirScore(docs, w, 64))
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(p.contains("partial_sum"), p.take(4000))
    val p2 = plan(graft.operators.Sharding.dsirResample(docs, target,
      k = 10, buckets = 64))
    assert(p2.contains("TakeOrderedAndProject"), p2.take(4000))
    assert(!p2.contains("SortMergeJoin"), p2.take(4000))
  }

  test("bm25 ranks inside per-query window partitions with the query " +
      "terms and idf table broadcast — never a global sort") {
    import spark.implicits._
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val q = Seq((0, "spark hash join")).toDF("query_id", "text")
    val p = plan(graft.operators.Retrieval.bm25TopK(docs, q, k = 10))
    assert(p.contains("windowspecdefinition(query_id"), p.take(4000))
    assert(p.contains("BroadcastExchange"), p.take(4000))
    assert(!p.contains("CartesianProduct"), p.take(4000))
  }

  test("packSequences windows per range partition — never a " +
      "single-partition global window") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val p = plan(graft.operators.Sharding.packSequences(docs,
      seqLen = 512, numParts = 4))
    assert(p.contains("windowspecdefinition(pid"), p.take(3000))
  }

  test("the persisted BM25 probe partition-prunes postings/ to the " +
      "query terms' buckets and doclen/ to the candidates' buckets") {
    import spark.implicits._
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("plbm25").toString
    graft.operators.Retrieval.writeBm25Index(docs, dir,
      tokenBuckets = 8, dlBuckets = 8)
    val q = Seq((0, "spark hash join")).toDF("query_id", "text")
    val p = plan(graft.operators.Retrieval.bm25TopKIndexed(spark, q,
      dir, k = 10))
    // one dynamicpruning filter per pruned side: postings (term
    // buckets) and doclen (candidate doc buckets)
    val first = p.indexOf("dynamicpruning")
    assert(first >= 0, p.take(4000))
    assert(p.indexOf("dynamicpruning", first + 1) > first, p.take(4000))
    assert(!p.contains("CartesianProduct"), p.take(4000))
  }

  test("BPE encoding is a map-only projection: the merges ride the " +
      "kernel, no join and no exchange anywhere in the plan") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val merges = Seq(("e", "s"), ("es", "t"))
    val p = plan(graft.operators.Bpe.encode(docs, merges))
    assert(p.contains("bpe_encode"), p.take(3000))
    assert(!p.contains("Exchange") && !p.contains("Join"), p.take(3000))
  }

  test("ID encoding is the same map-only shape: the model rides the " +
      "kernel, no join and no exchange") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val model = graft.operators.Bpe.BpeModel(
      Seq("e", "s", "t", "</w>"), Seq(("e", "s"), ("es", "t")))
    val p = plan(graft.operators.Bpe.encodeIds(docs, model))
    assert(p.contains("bpe_encode_ids"), p.take(3000))
    assert(!p.contains("Exchange") && !p.contains("Join"), p.take(3000))
  }

  test("materializeSequences encodes ids ONCE (one kernel site behind " +
      "the barrier) and gathers with a single seq_id aggregation — " +
      "never a global window or a cartesian join") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
      .where(col("doc_id") < 200)
    val model = graft.operators.Bpe.BpeModel(
      Seq("e", "s", "t", "</w>"), Seq(("e", "s"), ("es", "t")))
    val p = plan(graft.operators.Sharding.materializeSequences(docs,
      model, seqLen = 512, numParts = 4))
    // the barrier'd encode shows as the checkpoint scan, not as N
    // bpe_encode_ids kernel sites re-tokenizing the corpus per branch
    assert(!p.contains("bpe_encode_ids"), p.take(3000))
    // the manifest's window stays per-range-partition
    assert(p.contains("windowspecdefinition(pid") ||
      !p.contains("windowspecdefinition"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("repair damage detection reads SPANS, never the id arrays: " +
      "the probe over the packed artifact prunes the read schema to " +
      "the metadata columns (the token-id bulk is never deserialized)") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_planrep").toString
    Seq((0L, "test set tes"), (1L, "set test set"))
      .toDF("doc_id", "text")
      .write.parquet(s"$root/c/corpus/batch_id=1")
    graft.Pipeline.trainBpeModel(spark, s"$root/c", s"$root/m",
      numMerges = 2)
    graft.Pipeline.writeTrainingShards(spark, s"$root/c", s"$root/m",
      s"$root/shards", seqLen = 4, numShards = 2)
    val p = plan(graft.Pipeline.packedSpanDocs(spark, s"$root/shards"))
    assert(p.contains("spans"), p.take(3000))
    // the ids column (array<int>, the artifact's actual bytes) must
    // be pruned out of the scan — a detection pass that read it would
    // scale with the token volume instead of the span metadata
    assert(!p.contains("ids:array"), p.take(3000))
  }
}
