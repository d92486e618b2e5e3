package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main: times every `SparkEntry.queries` entry on
  * `SPARK_GRAFT_SF_DIR` and prints one JSON line
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`.
  */
object Bench {

  /** Frozen round-1 headline set — one representative per operator family.
    * Do not grow this list when adding queries; it anchors the perf
    * baseline across rounds.
    */
  val Headline: Seq[String] = Seq(
    "q01_flagship", "q03_tuple_distinct", "q10_cube_month", "q14_dim_date",
    "q17_anti_dedup_firstwins", "q20_multiway_join", "q21_window_topk",
    "q24_tpch_q1", "q27_sessionize", "q30_dedup_exact_groups",
    "q32_minhash_candidates", "q34_simhash", "q37_ann_cosine_topk",
    "q42_langid", "q46_frame_sample", "q48_top_terms")

  /** Sample count for [[OncePerRun]] entries (reported time = min of
    * these): 1 was unfalsifiable — see the r15 q135 phantom — and the
    * full 5-pass replication is exactly what OncePerRun exists to
    * avoid; 2 is the cheapest count that can reject an outlier. */
  val OncePasses = 2

  /** Composed-lifecycle entries timed [[OncePasses]] times per bench
    * run (reported min) instead of once per pass: their cost is the
    * sum of constituent operators that are each already benched
    * per-pass (q100 = 2× the probe/publish/append plans of
    * q89/q95/q97 plus ~30 fixed-floor actions — 22.7 s at sf0.1), so
    * full replication adds wall time without timing signal. Still
    * measured, still reported in `queries`, still error-poisoning —
    * just not 5-pass-replicated.
    */
  val OncePerRun: Set[String] = Set("q100_corpus_refresh",
    // q110 = q101's screen THROUGH the streaming harness (staging +
    // checkpoint + per-file micro-batches — the q91 overhead shape);
    // its only per-pass signal is the batch screen, already benched
    // as q101
    "q110_stream_screen",
    // q117 = q115's screen through the same streaming harness; its
    // per-pass signal is the batch screen, already benched as q115
    "q117_stream_semantic",
    // q135/q136 = the q133 probe / q134 hybrid through the streaming
    // harness (staging + checkpoint + per-file micro-batches); their
    // per-pass signals are the batch probes, already benched as
    // q133/q134
    "q135_stream_bm25", "q136_stream_hybrid",
    // q119 = q104's score + q105's split + an MLlib LR fit + q118's
    // scoring plan; the training fit is a model-build (the q100
    // class), its per-pass scoring signal is already benched as q118
    "q119_quality_classifier",
    // q142 = bootstrap export + append + retraction + repair + strict
    // read + per-doc reconstruction in ONE timer (the q100 composed-
    // lifecycle class); its per-pass signals are already benched —
    // materializeSequences as q138/q139, the decode tier as q141 —
    // and the repair core is priced at sf1 (BENCH_SF1)
    "q142_repaired_export",
    // q144 = train + bootstrap export + strict read per invocation
    // (the write-inside-the-timer convention made it the most
    // expensive per-pass entry by r16); its per-pass signals are
    // already benched — the export as q138/q139, the key as q143
    "q144_epoch_shards",
    // q152 = a bootstrap export inside the timer feeding a map-only
    // gated resume — the q144 write-inside-the-timer class
    "q152_resume_gated",
    // q153 = the same bootstrap plus a knob-inert append feeding the
    // snapshot-bounded CLI resume — the q152 class exactly
    "q153_resume_snapshot",
    // q154 = a planted-model bootstrap plus filesystem residue
    // feeding a metadata-priced fsck — the q144 write-inside-the-
    // timer class (the survey itself costs directory listings)
    "q154_fsck_residue",
    // q145 = q141's encode+decode round trip through the streaming
    // harness (staging + checkpoint + per-file micro-batches); its
    // per-pass signal is the batch round trip, already benched as q141
    "q145_stream_encode",
    // q91 = the flagship dedup+count THROUGH the full structured-
    // streaming harness (staging + sentinel construction + checkpoint
    // + 3 stateful micro-batches): the same micro-batch-scheduling
    // noise profile that put its streaming siblings (q110/q117/q135/
    // q136/q145) in this tier, and its per-pass signal — the batch
    // dedup+count plan — is already benched as q01/q03/q04 (r19
    // optimization round: 5-pass replication of the harness floor
    // added wall time without timing signal)
    "q91_streaming_flagship")

  /** Composed-lifecycle entries whose near-identical corpus+model+
    * export builds are CONSOLIDATED into one shared fixture per
    * sample ([[SparkEntry.buildBenchFixture]] — the r18 verdict's
    * once-tier item): the five used to rebuild ~the same tree inside
    * their own timers (~5× the build per sample, no extra signal).
    * Bench times the build once per sample as `fixture_lifecycle`
    * and each entry's SURFACE against the standing tree
    * ([[SparkEntry.benchFixtureSurfaces]], mutation-safe order).
    * Each sample gets a FRESH fixture so min-of-[[OncePasses]]
    * compares like states. Verify still runs the self-contained
    * oracle-checked entries — this consolidation changes what the
    * bench TIMES, not what the oracle CHECKS, and the per-entry
    * meaning ("the surface over a standing lifecycle tree") is the
    * honest per-cron price each entry's claim is about. */
  val FixtureTier: Set[String] = Set("q146_audit_shards",
    "q147_stats_shards", "q149_compacted_export",
    "q150_refresh_shards", "q151_fsck_lifecycle")

  /** The fixture build's own entry name in the bench line. */
  val FixtureKey = "fixture_lifecycle"

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // coalesce post-shuffle partitions by size, not cpu count — but at
      // bench scale the default 64 MB advisory size would coalesce sf0.1's
      // small shuffles to ~1 partition and serialize every post-shuffle
      // stage (the round-2 regression: q20 3.6x, q21 3.3x, ...). Pair the
      // production instinct with a bench-scale advisory size so shuffles
      // keep >= cpu-count partitions while still merging the near-empty
      // ones.
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        "1m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // ERROR, not WARN: the bench is a measurement main and its tail is
    // machine-read — the per-query localCheckpoint-block unpersist
    // otherwise emits hundreds of benign lineage-truncation WARNs
    spark.sparkContext.setLogLevel("ERROR")
    // Warm up once outside the timers: file-listing + parquet footers +
    // first-query codegen/JIT otherwise land on whichever query runs
    // first. The shuffle, broadcast, and window machinery each JIT their
    // own code paths, so warm all three (q01 ran first alphabetically and
    // absorbed ~1s of one-time exchange/codegen cost before this).
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.range(10000).selectExpr("id % 7 AS k").groupBy("k").count()
      .orderBy("count").collect()
    // partitioned window: warms the same WindowExec/codegen paths as the
    // real queries without tripping the loud no-partition warning (every
    // production window here is partitioned)
    spark.range(100).toDF("id")
      .join(org.apache.spark.sql.functions.broadcast(
        spark.range(10).toDF("id")), "id")
      .selectExpr("id",
        "row_number() OVER (PARTITION BY id % 2 ORDER BY id) AS rn")
      .collect()
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Seq("lineitem", "orders", "customer", "events", "documents",
      "embeddings").foreach { t =>
      try spark.read
        .parquet(s"$sfDir/$t.parquet").limit(1).collect()
      catch { case _: Throwable => }
    }
    // pass-count override for off-driver scaling runs (e.g. a one-shot
    // synthetic-sf1 sanity check); the driver's 5-pass default stands
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "5").toInt
    val all = SparkEntry.queries.toSeq.sortBy(_._1)
    // The frozen headline set runs in its own isolated passes FIRST:
    // interleaving it with the full (growing) inventory made the
    // cross-round anchor share each pass's GC/JIT pressure with every
    // query added since round 1 (including index-writing ones), so
    // inventory growth read as headline "regression" (r7: driver 9.2 s
    // vs 7.9-10.6 s spread on byte-identical code). Headline members'
    // reported times come from these isolated passes; the subsequent
    // full-inventory passes supply everything else's.
    val headlineQs = all.filter(q => Headline.contains(q._1))
    val (headTimes, headErrs) = runTimes(spark, sfDir, headlineQs, passes)
    // the full-inventory passes run only NON-headline queries: headline
    // members' reported times come exclusively from the isolated passes
    // above, so re-running them here would be pure discarded wall time
    // (2× every one of the 16 frozen headline queries per bench run)
    val (invRes, invErrs) =
      runQueries(spark, sfDir,
        all.filterNot(q => Headline.contains(q._1) ||
          OncePerRun(q._1) || FixtureTier(q._1)),
        passes)
    // OncePerRun entries run TWICE and report the MIN: a single sample
    // cannot tell a real regression from micro-batch scheduling
    // latency or GC pressure on a loaded host (r15: q135 printed
    // 16.2 s vs 4.3 s with an unchanged per-trigger plan — a 3.8×
    // phantom only a second sample could have falsified). Min-of-2
    // rejects one outlier per entry; both samples ride the full-detail
    // file and the line carries the sample count.
    val (onceTimes, onceErrs) =
      runTimes(spark, sfDir, all.filter(q => OncePerRun(q._1)),
        passes = OncePasses)
    val onceRes = onceTimes.map { case (k, xs) => k -> xs.min }
    // ---- fixture tier: one shared lifecycle tree per sample
    // ([[FixtureTier]]); the build is timed as its own entry, each
    // member's surface timed against the standing tree in the
    // declared mutation-safe order. A fresh fixture per sample keeps
    // min-of-OncePasses comparing like states (a shared MUTABLE tree
    // across samples would time different work each time).
    val fixTimes =
      scala.collection.mutable.Map.empty[String, List[Double]]
    val fixErrs = scala.collection.mutable.SortedSet.empty[String]
    for (_ <- 1 to OncePasses) {
      SparkEntry.cleanIndexScratch()
      val t0 = System.nanoTime()
      val rootOpt =
        try Some(SparkEntry.buildBenchFixture(spark, sfDir))
        catch { case _: Throwable => fixErrs += FixtureKey; None }
      fixTimes(FixtureKey) = (System.nanoTime() - t0) / 1e9 ::
        fixTimes.getOrElse(FixtureKey, Nil)
      rootOpt match {
        case Some(root) =>
          for ((name, fn) <- SparkEntry.benchFixtureSurfaces) {
            val t1 = System.nanoTime()
            try { fn(spark, sfDir, root).count() }
            catch { case _: Throwable => fixErrs += name }
            fixTimes(name) = (System.nanoTime() - t1) / 1e9 ::
              fixTimes.getOrElse(name, Nil)
            spark.sparkContext.getPersistentRDDs.values
              .foreach(_.unpersist(blocking = false))
          }
        case None =>
          // no tree to time against: every member is an error, not a
          // phantom 0-second "speedup"
          SparkEntry.benchFixtureSurfaces
            .foreach { case (nm, _) => fixErrs += nm }
      }
    }
    val fixRes = fixTimes.map { case (k, xs) => k -> xs.min }.toMap
    val onceSamples = (onceTimes.map { case (k, xs) =>
      k -> xs.reverse
    } ++ fixTimes.map { case (k, xs) => k -> xs.reverse }).toMap
    val errors = headErrs ++ invErrs ++ onceErrs ++ fixErrs
    val headMap = headTimes.map { case (k, xs) =>
      k -> median(xs)
    }.toMap
    val invMap = (invRes ++ onceRes).toMap ++ fixRes
    val results = all.map { case (k, _) =>
      k -> (if (errors(k)) -1.0
            else headMap.getOrElse(k, invMap(k)))
    } :+ (FixtureKey ->
      (if (errors(FixtureKey)) -1.0 else invMap(FixtureKey)))
    // secondary anchor: sum of per-query MINIMA over the isolated
    // passes — min-of-N is far less sensitive to GC/JIT outliers than
    // the median, so cross-round drift in this number is likelier to be
    // a real code change (uniform host slowdown still moves both)
    val headlineMin =
      if (errors.exists(Headline.contains)) -1.0
      else headTimes.map(_._2.min).sum
    val sfLabel = sfDir.substring(sfDir.lastIndexOf('/') + 1)
    // full, never-trimmed detail to a file (the stdout line may drop
    // cheap entries under the tail-capture budget — see renderJson).
    // SPARK_GRAFT_BENCH_FULL points it at a TRACKED per-round path
    // (docs/BENCH_FULL_r<N>.json) so the dropped per-query times and
    // the once-per-run sample arrays survive the round — the r16
    // verdict's falsifiability gap: over half the inventory's
    // round-over-round comparison lived in a git-ignored scratch file.
    // The DEFAULT path is stamped with sf+cpus so the driver's 8-core
    // scaling pass stops clobbering the 32-core detail (r19 verdict:
    // the surviving bench_full.json held only the c8 run).
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(sys.env.getOrElse(
        "SPARK_GRAFT_BENCH_FULL",
        s"target/bench_full_${sfLabel}_c$cpus.json")),
      renderJson(results, errors, sfLabel, Int.MaxValue,
        Some(headlineMin), onceSamples).getBytes("UTF-8"))
    catch { case _: Throwable => () }
    val benchLine = renderJson(results, errors, sfLabel, LineBudget,
      Some(headlineMin), onceSamples)
    // the machine-read line ALSO lands verbatim in a stable file: the
    // stdout tail is a lossy channel (2000-char capture + sbt trailer)
    // and the driver's parse of it failed every round before r20
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(
        s"target/bench_line_${sfLabel}_c$cpus.json"),
      (benchLine + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () }
    println(benchLine)
    spark.stop()
  }

  /** Times every query over `passes` interleaved passes and reports the
    * per-query median plus the set of queries that threw on ANY pass.
    *
    * Median of 5 passes per query: 3-pass medians still let an
    * occasional multi-second GC/JIT outlier through (a whole round was
    * lost to chasing one — the flagged q06/q07/q09 "regression" vanished
    * on re-run with byte-identical code); 5 passes tolerate two outliers
    * per query. Pass-level interleaving (all queries per pass) keeps the
    * cache/JIT state comparable between the runs of one query.
    */
  def runQueries(
      spark: SparkSession,
      sfDir: String,
      queries: Seq[(String, (SparkSession, String) => DataFrame)],
      passes: Int = 5): (Seq[(String, Double)], Set[String]) = {
    val (times, errors) = runTimes(spark, sfDir, queries, passes)
    val timesMap = times.toMap
    // A query that threw on any pass gets a -1 sentinel instead of its
    // fast-fail wall time: a broken query must never read as a speedup.
    val results = queries.map { case (name, _) =>
      name -> (if (errors(name)) -1.0 else median(timesMap(name)))
    }
    (results, errors)
  }

  /** THE median definition — both the isolated-headline and the
    * full-inventory paths must use the same statistic or cross-round
    * comparisons silently drift. */
  private def median(xs: List[Double]): Double =
    xs.sorted.apply(xs.size / 2)

  /** Raw per-pass wall times, pass-interleaved (all queries per pass so
    * the cache/JIT state is comparable between one query's runs).
    */
  def runTimes(
      spark: SparkSession,
      sfDir: String,
      queries: Seq[(String, (SparkSession, String) => DataFrame)],
      passes: Int = 5): (Seq[(String, List[Double])], Set[String]) = {
    val times = scala.collection.mutable.Map.empty[String, List[Double]]
    val errors = scala.collection.mutable.SortedSet.empty[String]
    for (_ <- 1 to passes) {
      // recycle the index-writing queries' scratch dirs OUTSIDE the
      // timers: each of those queries overwrites its per-process index
      // dir, and the overwrite's delete-old-part-files churn would
      // otherwise run inside a later pass's timed region, drifting
      // with inventory growth (r9 backlog #7)
      SparkEntry.cleanIndexScratch()
      for ((name, fn) <- queries) {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() }
        catch { case _: Throwable => errors += name }
        val dt = (System.nanoTime() - t0) / 1e9
        times(name) = dt :: times.getOrElse(name, Nil)
        // release the RDD blocks pinned by operators' localCheckpoint
        // barriers: one-shot per query, but across 5 passes × every query
        // they accumulate in the fixed driver heap and the mounting GC
        // pressure inflates every LATER query's median (~35% measured;
        // a full System.gc() here measured WORSE — let G1 pace itself).
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
    }
    (queries.map { case (name, _) => name -> times(name) }, errors.toSet)
  }

  /** Stdout line byte budget: the driver keeps only the LAST 2000
    * chars of the run's output (BENCH_r05.json `tail` is exactly 2000),
    * and sbt's success trailer eats ~75 from the end — a longer line
    * loses its HEAD, where `"value"` lives (round 2 overflowed exactly
    * this way; at 80 queries the old 2-decimal line crossed the cliff
    * again in round 6). 1880 leaves ~45 bytes of slack under the
    * measured ceiling.
    */
  val LineBudget = 1880

  /** Compact time format: 2 decimals (10 ms) under 1 s, 1 decimal
    * above (sub-second queries are where 10 ms resolution matters;
    * multi-second medians drown 10 ms in jitter), trailing zeros
    * trimmed — every byte of the stdout line is tail-capture budget
    * ([[LineBudget]]). headline_total is summed from the UNrounded
    * medians, so per-entry rounding never skews the headline.
    */
  private def fmt(v: Double): String = {
    val s = if (math.abs(v) >= 1) f"$v%.1f" else f"$v%.2f"
    if (s.contains('.'))
      s.reverse.dropWhile(_ == '0').dropWhile(_ == '.').reverse
    else s
  }

  /** One machine-read JSON line. Failed queries appear with time -1 in
    * `queries`, their names in an `errors` array (key present only on
    * failure, to preserve the tail byte budget), and they poison
    * `headline_total` to -1 so a driver reading only the headline sees
    * the breakage.
    *
    * If the line would overflow [[LineBudget]], the CHEAPEST
    * non-headline, non-error query entries are dropped (they carry the
    * least timing signal) and a `"dropped":N` field discloses the
    * count — headline members, failures, and the totals always
    * survive, so the head of the line can never be truncated away by
    * the driver's tail capture.
    */
  /** @param onceSamples raw per-sample times of the [[OncePerRun]]
    *        entries (pass order). Nonempty ⇒ the line carries
    *        `"once_min_of":N` (so a reader knows those entries are
    *        min-of-N, not single samples); the samples themselves are
    *        emitted only while the line fits — they are the FIRST
    *        thing dropped under the tail-capture budget. */
  def renderJson(
      results: Seq[(String, Double)],
      errors: Set[String],
      sfLabel: String,
      budget: Int = LineBudget,
      headlineMin: Option[Double] = None,
      onceSamples: Map[String, List[Double]] = Map.empty): String = {
    // headline = a FIXED representative set, stable across rounds, so the
    // round-over-round baseline comparison is apples-to-apples even as the
    // query inventory grows; per-query times for everything are in
    // `queries`.
    val headlineSet = Headline.toSet
    val headline = results.filter(r => headlineSet.contains(r._1))
    val total =
      if (errors.nonEmpty) -1.0
      else if (headline.nonEmpty) headline.map(_._2).sum
      else results.map(_._2).sum
    def line(rs: Seq[(String, Double)], dropped: Int,
        errShown: Int, withSamples: Boolean = true): String = {
      val qs = rs.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
      val droppedField =
        if (dropped == 0) "" else s""","dropped":$dropped"""
      val sortedErrs = errors.toSeq.sorted
      val omitted = sortedErrs.length - errShown
      val errsField =
        if (errors.isEmpty) ""
        else sortedErrs.take(errShown).map("\"" + _ + "\"")
          .mkString(""","errors":[""", ",", "]") +
          (if (omitted == 0) "" else s""","errors_omitted":$omitted""")
      val minField = headlineMin
        .map(m => f""","headline_min":$m%.3f""").getOrElse("")
      val onceField =
        if (onceSamples.isEmpty) ""
        else s""","once_min_of":${
            onceSamples.values.map(_.size).max}""" +
          (if (!withSamples) ""
           else onceSamples.toSeq.sortBy(_._1).map { case (k, xs) =>
             "\"" + k + "\":[" + xs.map(fmt).mkString(",") + "]"
           }.mkString(""","once_samples":{""", ",", "}"))
      f"""{"metric":"headline_total","value":$total%.3f,"unit":"sec"$minField%s$onceField%s,"queries":$qs%s$errsField%s$droppedField%s,"sf":"$sfLabel%s"}"""
    }
    val full = line(results, 0, errors.size)
    if (full.length <= budget) full
    else {
      // trim in rising order of information loss: (0) the once-entry
      // sample arrays (their min survives in `queries` and the
      // `once_min_of` marker survives — the full-detail file keeps the
      // raw samples); (1) the cheapest clean non-headline timings;
      // (2) erred queries' map entries — their names survive in the
      // errors array, the -1 is redundant; (3) the errors array
      // itself, keeping a count of the omitted names. Stage 3 bounds
      // the line even in a mass-failure round (every query erred →
      // nothing unprotected to drop → the old loop returned an
      // over-budget line and the tail capture cut "value" off exactly
      // when everything was broken).
      val dropOrder =
        results.filter(r => !headlineSet.contains(r._1) && !errors(r._1))
          .sortBy { case (k, v) => (v, k) }.map(_._1) ++
        results.map(_._1).filter(k => errors(k) && !headlineSet.contains(k))
      var keep = results
      var out = line(results, 0, errors.size, withSamples = false)
      val it = dropOrder.iterator
      while (out.length > budget && it.hasNext) {
        val victim = it.next()
        keep = keep.filterNot(_._1 == victim)
        out = line(keep, results.length - keep.length, errors.size,
          withSamples = false)
      }
      var errShown = errors.size
      while (out.length > budget && errShown > 0) {
        errShown -= 1
        out = line(keep, results.length - keep.length, errShown,
          withSamples = false)
      }
      out
    }
  }
}
