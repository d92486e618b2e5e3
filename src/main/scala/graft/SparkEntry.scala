package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators._

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2 (parity tier) plus the extension tier (dedup, similarity
  * search, text analysis, multimodal).
  *
  * Oracle-parity rules used throughout (so the DuckDB hash-compare is
  * exact, not approximate):
  *   - every query ends in a TOTAL deterministic ORDER BY (ties broken to a
  *     key), so row order can never differ;
  *   - money-style double sums are quantized per-row to integer units
  *     before aggregation (per-row IEEE arithmetic is bit-identical across
  *     engines; only float *summation order* is not) — sums become exact
  *     integer math;
  *   - counts/extracts are cast so Spark and DuckDB output types line up
  *     (DuckDB `count` → BIGINT matches, but `EXTRACT`/`len`/`sum(BIGINT)`
  *     need casts).
  */
object SparkEntry {

  // ------------------------------------------------------------ helpers

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(s, dir)
    else s.read.parquet(s"$dir/$name.parquet")

  /** Deterministic multi-line view of the single-line synthetic docs
    * for the line-dedup queries (q121/q122): every literal " scan "
    * becomes a line break. DuckDB mirrors it with
    * `replace(text, ' scan ', chr(10))` — both are left-to-right
    * non-overlapping literal replacement, so the derived lines are
    * engine-identical. */
  private def multiLineDocs(docs: DataFrame): DataFrame =
    docs.withColumn("text",
      regexp_replace(coalesce(col("text"), lit("")),
        lit(java.util.regex.Pattern.quote(" scan ")), lit("\n")))

  /** Scratch location for the written-IVF-index queries (q84/q85):
    * under the JVM tmpdir, keyed by SF dir and tag so scale factors
    * never collide, and by the process id so two CONCURRENT
    * bench/verify runs over the same dataset cannot overwrite each
    * other's index mid-probe (q84/q85 write mode=overwrite then read).
    * Rewritten on every call — re-indexing is part of the measured
    * query by design.
    */
  private def ivfIndexDir(sfDir: String, tag: String): String = {
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_ivf_" +
      s"${sfDir.replaceAll("[^A-Za-z0-9]", "_")}_${tag}_p" +
      java.lang.ProcessHandle.current().pid()
    IvfScratch.register(dir)
    dir
  }

  /** Shutdown-hook cleanup for the per-process IVF scratch dirs: the
    * pid suffix prevents cross-run collisions but means no later run
    * overwrites this run's directory, so without cleanup every process
    * would leak a full index copy (the embeddings table, twice) into
    * tmpdir.
    */
  private object IvfScratch {
    private val dirs =
      java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    private lazy val hook: Unit = Runtime.getRuntime.addShutdownHook(
      new Thread(() => clean()))
    def register(dir: String): Unit = { hook; dirs.add(dir) }
    def clean(): Unit = dirs.forEach { d =>
      try {
        val root = java.nio.file.Paths.get(d)
        if (java.nio.file.Files.exists(root)) {
          val walk = java.nio.file.Files.walk(root)
          try walk.sorted(java.util.Comparator.reverseOrder())
            .forEach(p => java.nio.file.Files.deleteIfExists(p))
          finally walk.close()
        }
      } catch { case scala.util.control.NonFatal(_) => () }
    }
  }

  /** Delete every scratch dir the index-writing queries have registered
    * (the q84/q85/q89/q90/q95–q98 index roots, the streaming
    * stage/sentinel dirs), so the next bench pass's `mode = "overwrite"`
    * index writes land on EMPTY paths. [[Bench]] calls this BETWEEN
    * timing passes: the overwrite's delete-the-old-part-files churn
    * otherwise executes inside a later pass's timers and drifts with
    * inventory growth (the r9/r10 interleaved-number complaint).
    * Registration survives a clean, so the end-of-JVM shutdown hook
    * still sweeps whatever the final pass left behind.
    */
  def cleanIndexScratch(): Unit = IvfScratch.clean()

  /** The events table's `ts` has been written with parquet
    * TIMESTAMP(NANOS) by some generator versions (which Spark has no
    * native type for — read nanos as long under the legacy conf) and
    * plain microsecond NTZ by others. Normalize EITHER encoding to a
    * microsecond TimestampType column: `timestamp_micros` interprets
    * the ns-derived value as a UTC epoch, and the NTZ cast under the
    * UTC session is micros-identity — so every downstream day
    * truncation, window, and oracle compare sees the same column no
    * matter which writer produced the file.
    */
  private def normalizeTs(raw: DataFrame): DataFrame = {
    // both branches are UTC-dependent (timestamp_micros interprets a
    // UTC epoch; the NTZ cast is micros-identity only under a UTC
    // session) — a session missing the conf would silently shift every
    // downstream day truncation, so refuse it loudly instead
    val tz = raw.sparkSession.conf.get("spark.sql.session.timeZone", "")
    require(tz == "UTC",
      s"events normalization needs spark.sql.session.timeZone=UTC " +
        s"(got '$tz') — set it in the session builder")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integer division — a double `/` would lose precision on ns epochs
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }

  private def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(s.read.parquet(s"$dir/events.parquet"))
  }

  /** Streaming-flagship entry machinery (q91): stage the events parquet
    * plus two far-future watermark sentinels into per-process scratch,
    * run the available-now file-source streaming flagship
    * ([[graft.streaming.StreamingAgg.distinctDailyCounts]] — the
    * StreamingEquivalenceSpec shape), and return the closed real-event
    * windows. With sentinels 400/800 days past max(ts) and the 365-day
    * watermark delay, the watermark passes every REAL window, so
    * append-mode output IS the batch dedup+count answer — which is why
    * this entry is ORACLE-checked, not rows-only: the DuckDB compare
    * hash-matches the streaming result against the batch SQL.
    * TWO micro-batches (maxFilesPerTrigger = data files + 1, ascending
    * mtimes): the FIRST sentinel copy rides WITH the data batch — the
    * watermark consumed during a batch is computed from the PREVIOUS
    * batch's max event time, so advancing it inside batch 0 changes
    * nothing about what batch 0 emits (nothing: its starting watermark
    * is 0) — and the second copy arrives alone as batch 1, whose
    * starting watermark (max sentinel ts − 365 d) passes every REAL
    * window and emits them all. Identical output to the old
    * one-file-per-trigger shape (each batch emits the windows the
    * previous batch's watermark closed — the spec-proven rule), minus
    * `n_data_files` micro-batch floors (guide §1.2;
    * StreamingEquivalenceSpec's folded-shape test pins the equality).
    */
  private object StreamScratch {
    val seq = new java.util.concurrent.atomic.AtomicLong()
    @volatile var lastSink: String = null
  }

  private def streamingFlagship(s: SparkSession, dir: String): DataFrame = {
    import java.nio.file.{Files, Path, Paths, StandardCopyOption}
    // the legacy nanos conf is needed only while THIS entry reads and
    // streams the events parquet — everything here executes eagerly
    // (awaitTermination below), and the returned frame reads the memory
    // sink, so the previous value is restored before returning instead
    // of leaking legacy timestamp decoding into every later entry in
    // the same Verify/Bench session
    val prevNanosConf = s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try streamingFlagshipRun(s, dir)
    finally prevNanosConf match {
      case Some(v) => s.conf.set("spark.sql.legacy.parquet.nanosAsLong", v)
      case None => s.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    }
  }

  private def streamingFlagshipRun(s: SparkSession, dir: String): DataFrame = {
    import java.nio.file.{Files, Path, Paths, StandardCopyOption}
    val raw = s.read.parquet(s"$dir/events.parquet")
    // kept ONLY for the sentinel-encoding match below; normalization
    // itself is [[normalizeTs]]'s own dispatch
    val tsType = raw.schema("ts").dataType
    val maxTs = normalizeTs(raw).agg(max(col("ts"))).head()
      .getTimestamp(0)
    val n = StreamScratch.seq.incrementAndGet()
    // ONE staging dir per (sf dir, process): contents are deterministic,
    // so later calls just re-copy the same bytes (REPLACE_EXISTING); the
    // checkpoint, by contrast, MUST be fresh per run — a reused one
    // would resume an all-committed query and emit nothing
    val stage = Paths.get(ivfIndexDir(dir, "stream_stage"))
    Files.createDirectories(stage)
    val src = Paths.get(s"$dir/events.parquet")
    val parts =
      if (Files.isDirectory(src)) {
        val l = Files.list(src)
        try l.toArray.map(_.asInstanceOf[Path])
          .filter(_.getFileName.toString.endsWith(".parquet")).sorted
        finally l.close()
      } else Array(src)
    var mtime = System.currentTimeMillis() - 60000
    parts.foreach { p =>
      val dst = stage.resolve(p.getFileName)
      Files.copy(p, dst, StandardCopyOption.REPLACE_EXISTING)
      dst.toFile.setLastModified(mtime)
    }
    // sentinel writes go through ONE registered scratch dir (reused per
    // call, cleaned by the IvfScratch shutdown hook) — a fresh
    // createTempDirectory per sentinel would leak two dirs per call
    // across bench passes and survive JVM exit
    val sentScratch = Paths.get(ivfIndexDir(dir, "stream_sent"))
    // ONE sentinel parquet (both far-future rows, 400 and 800 days
    // past max ts) written in a single Spark job, then staged TWICE
    // under ascending mtimes: the first copy rides with the data batch
    // (see the scaladoc above — it advances the watermark at batch 0's
    // END without changing batch 0's emissions), the second arrives as
    // its own batch 1 and triggers the emit of every real window. Its
    // rows land below the advanced watermark and are dropped as late —
    // exactly the old third batch's role. Sentinel rows are dropped by
    // the final null-safe filter either way; one write + one listing
    // (not two), and two micro-batches total (not data-files + 2).
    def sentinelTs(daysAhead: Int): Column = {
      val tsMs = maxTs.getTime + daysAhead * 86400000L
      tsType match {
        case org.apache.spark.sql.types.LongType => lit(tsMs * 1000000L)
        case org.apache.spark.sql.types.TimestampNTZType =>
          lit(new java.sql.Timestamp(tsMs))
            .cast(org.apache.spark.sql.types.TimestampNTZType)
        case _ => lit(new java.sql.Timestamp(tsMs))
      }
    }
    raw.limit(1).withColumn("event_type", lit("zz_sentinel"))
      .withColumn("__days", explode(array(lit(400), lit(800))))
      .withColumn("ts",
        when(col("__days") === 400, sentinelTs(400))
          .otherwise(sentinelTs(800)))
      .select(raw.columns.map(col).toIndexedSeq: _*).coalesce(1)
      .write.mode("overwrite").parquet(sentScratch.toString)
    val sentPart = {
      val l = Files.list(sentScratch)
      try l.toArray.map(_.asInstanceOf[Path])
        .filter(_.getFileName.toString.endsWith(".parquet")).head
      finally l.close()
    }
    Seq("zz1.parquet", "zz2.parquet").foreach { name =>
      mtime += 10000
      val dst = stage.resolve(name)
      Files.copy(sentPart, dst, StandardCopyOption.REPLACE_EXISTING)
      dst.toFile.setLastModified(mtime)
    }
    val stream = normalizeTs(
      s.readStream.schema(raw.schema)
        // data + first sentinel in batch 0, second sentinel as batch 1
        // (the folded two-batch shape — scaladoc above)
        .option("maxFilesPerTrigger", (parts.length + 1).toString)
        .parquet(stage.toString))
      .select(col("ts"), col("user_id"), col("event_type"))
    val ckpt = ivfIndexDir(dir, s"stream_ckpt_$n")
    val sink = s"q91_stream_out_$n"
    // the previous call's memory-sink view is consumed by the time the
    // next call starts (Verify/Bench run entries sequentially) — drop it
    // so repeated bench passes don't accumulate driver-held result sets
    val prev = StreamScratch.lastSink
    if (prev != null) s.catalog.dropTempView(prev)
    StreamScratch.lastSink = sink
    val q = graft.streaming.StreamingAgg
      .distinctDailyCounts(stream, "365 days")
      .writeStream.outputMode("append")
      .format("memory").queryName(sink)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    require(q.awaitTermination(300000), "q91 stream did not finish")
    s.table(sink)
      // null-SAFE not-equal: a NULL event_type row must survive the
      // sentinel filter (the batch oracle keeps its NULL group; a plain
      // =!= would NULL out and silently drop the whole window)
      .where(!(col("event_type") <=> lit("zz_sentinel")))
      .withColumnRenamed("count", "cnt")
      .orderBy(col("day").asc, col("event_type").asc)
  }

  /** events plays the logentry role (FIXTURES.md §7): ts/user_id/event_type
    * ≅ date/ip/risk, and `k` (parsed from props) plays country/asn.
    */
  private def eventTuples(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events").select(
      date_trunc("day", col("ts")).as("day"),
      col("user_id"),
      col("event_type"),
      regexp_extract(col("props"), "([0-9]+)", 1).cast("int").as("k"))

  private val eventTuplesSql =
    """SELECT date_trunc('day', ts) AS day, user_id, event_type,
      |       CAST(regexp_extract(props, '([0-9]+)', 1) AS INT) AS k
      |FROM events""".stripMargin

  /** Deduped daily tuples → per-(day, event_type) distinct-entity counts —
    * the flagship aggregation shape (SURVEY.md §2 ops 6-9).
    */
  private def flagshipCounts(s: SparkSession, dir: String,
      threshold: Long): DataFrame =
    eventTuples(s, dir)
      .distinct()
      .groupBy(col("day"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") > threshold)

  private def flagshipCountsSql(threshold: Long): String =
    s"""SELECT day, event_type, count(*) AS cnt
       |FROM (SELECT DISTINCT * FROM ($eventTuplesSql) raw) dedup
       |GROUP BY day, event_type
       |HAVING count(*) > $threshold""".stripMargin

  /** The events-derived fact used by the cube queries: per (day,
    * event_type, k) distinct-user counts, no threshold (test-config shape).
    */
  private def eventFact(s: SparkSession, dir: String): DataFrame =
    eventTuples(s, dir)
      .distinct()
      .groupBy(col("day"), col("event_type"), col("k"))
      .agg(count(lit(1)).as("cnt"))

  private val eventFactSql =
    s"""SELECT day, event_type, k, count(*) AS cnt
       |FROM (SELECT DISTINCT * FROM ($eventTuplesSql) raw) dedup
       |GROUP BY day, event_type, k""".stripMargin

  /** Op 13 per granularity: 3-d CUBE over the events fact. */
  private def cubeAt(s: SparkSession, dir: String, g: String): DataFrame =
    StarSchema.cubeRollup(
      eventFact(s, dir).select(
        col("day").as("date"), col("event_type").as("country"),
        col("k").as("risk"), col("cnt").as("count"),
        lit(0.0).as("count_amplified")), g)
      .drop("count_amplified")
      .orderBy(col("date").desc_nulls_first, col("country").asc_nulls_first,
        col("risk").asc_nulls_first, col("count").asc)

  private def cubeAtSql(g: String): String =
    s"""SELECT CAST(date_trunc('$g', day) AS DATE) AS date, k AS risk,
       |       event_type AS country, CAST(sum(cnt) AS BIGINT) AS count
       |FROM ($eventFactSql) fact
       |GROUP BY CUBE(date_trunc('$g', day), event_type, k)
       |ORDER BY date DESC NULLS FIRST, country ASC NULLS FIRST,
       |         risk ASC NULLS FIRST, count ASC""".stripMargin

  /** Quantize a money-style double to integer basis points per row —
    * per-row IEEE ops are engine-identical, so integer sums are exact.
    */
  private def cents(c: Column, scale: Int = 10000): Column =
    round(c * scale).cast("long")

  // ----------------------------------------------------------- flagship

  /** Flagship on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_flagship")(spark, "/root/testdata/sf0.001")

  private def riskDim(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(("click", Option(41.0)), ("purchase", Option(556.9)),
      ("error", Option(6.3)), ("view", Option.empty[Double]))
      .toDF("slug", "factor")
  }

  // ------------------------------------------------------------ queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- parity tier: SURVEY.md §2 ops 6-19 over the shared testdata ----
    "q01_flagship" -> ((s, dir) => {
      val counts = flagshipCounts(s, dir, 5L)
        .withColumn("count_amplified", lit(0.0))
      val dim = broadcast(riskDim(s))
      counts.join(dim, counts("event_type") === dim("slug"), "left")
        .withColumn("count_amplified",
          when(col("slug").isNotNull, col("cnt") * col("factor"))
            .otherwise(col("count_amplified")))
        .drop("slug", "factor")
        .orderBy(col("day").desc, col("event_type").asc)
    }),
    "q02_project_trunc" -> ((s, dir) =>
      eventTuples(s, dir)
        .orderBy(col("day").asc, col("user_id").asc, col("event_type").asc,
          col("k").asc)),
    "q03_tuple_distinct" -> ((s, dir) =>
      eventTuples(s, dir).distinct()
        .orderBy(col("day").asc, col("user_id").asc, col("event_type").asc,
          col("k").asc)),
    "q04_group_count" -> ((s, dir) =>
      flagshipCounts(s, dir, -1L)
        .orderBy(col("day").asc, col("event_type").asc)),
    "q05_having" -> ((s, dir) =>
      flagshipCounts(s, dir, 5L)
        .orderBy(col("day").asc, col("event_type").asc)),
    "q06_sort_mixed" -> ((s, dir) =>
      flagshipCounts(s, dir, 5L)
        .orderBy(col("day").desc, col("event_type").asc)),
    "q07_update_join" -> ((s, dir) => {
      val counts = flagshipCounts(s, dir, 5L)
        .withColumn("count_amplified", lit(0.0))
      val dim = broadcast(riskDim(s))
      counts.join(dim, counts("event_type") === dim("slug"), "left")
        .withColumn("count_amplified",
          when(col("slug").isNotNull, col("cnt") * col("factor"))
            .otherwise(col("count_amplified")))
        .drop("slug", "factor")
        .orderBy(col("day").desc, col("event_type").asc)
    }),
    "q08_count_star" -> ((s, dir) =>
      t(s, dir, "events").agg(count(lit(1)).as("n"))),
    "q09_cube_week" -> ((s, dir) => cubeAt(s, dir, "week")),
    "q10_cube_month" -> ((s, dir) => cubeAt(s, dir, "month")),
    "q11_cube_quarter" -> ((s, dir) => cubeAt(s, dir, "quarter")),
    "q12_cube_year" -> ((s, dir) => cubeAt(s, dir, "year")),
    "q13_cube_sentinel" -> ((s, dir) =>
      StarSchema.sentinelRewrite(
        StarSchema.cubeRollup(
          eventFact(s, dir).select(
            col("day").as("date"), col("event_type").as("country"),
            col("k").as("risk"), col("cnt").as("count"),
            lit(0.0).as("count_amplified")), "month")
          .drop("count_amplified"))
        .orderBy(col("date").desc_nulls_first, col("country").asc,
          col("risk").asc, col("count").asc)),
    "q14_dim_date" -> ((s, dir) =>
      StarSchema.dimDate(
        eventTuples(s, dir).select(col("day").as("date")))
        .orderBy(col("date").asc)),
    "q15_distinct_dates" -> ((s, dir) =>
      eventTuples(s, dir).select(to_date(col("day")).as("date"))
        .distinct().orderBy(col("date").asc)),
    "q16_anti_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val cust = t(s, dir, "customer")
      ev.select(col("user_id")).where(col("user_id").isNotNull).distinct()
        .join(broadcast(cust), col("user_id") === col("c_custkey"),
          "left_anti")
        .orderBy(col("user_id").asc)
    }),
    "q17_anti_dedup_firstwins" -> ((s, dir) => {
      val pairs = t(s, dir, "events")
        .select(col("user_id"), col("event_type"))
        .where(col("user_id").isNotNull).distinct()
      val supp = t(s, dir, "supplier")
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("event_type").asc_nulls_last)
      pairs
        .join(broadcast(supp), col("user_id") === col("s_suppkey"),
          "left_anti")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1).drop("rn")
        .withColumn("event_type", coalesce(col("event_type"), lit("XY")))
        .orderBy(col("user_id").asc)
    }),
    "q18_scalar_dates" -> ((s, dir) =>
      t(s, dir, "events").select(
        col("event_id"),
        to_date(date_trunc("day", col("ts"))).as("day"),
        month(col("ts")).as("m"),
        year(col("ts")).as("y"),
        quarter(col("ts")).as("q"),
        weekofyear(col("ts")).as("w"),
        date_add(to_date(col("ts")), 6).as("plus6"),
        (col("value") * 1.5).as("scaled"))
        .orderBy(col("event_id").asc)),
    // ---- join / window / set-op engine surface ----
    "q19_join_broadcast" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val c = broadcast(t(s, dir, "customer"))
      o.join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          sum(cents(col("o_totalprice"))).as("revenue_bp"))
        .orderBy(col("c_mktsegment").asc)
    }),
    "q20_multiway_join" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = broadcast(t(s, dir, "customer"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"),
          month(col("o_orderdate")).as("order_month"))
        .agg(
          sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
            .as("revenue_bp"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("c_mktsegment").asc, col("order_month").asc)
    }),
    "q21_window_topk" -> ((s, dir) => {
      // two-phase top-k, NOT a window: ~5 mktsegment values would funnel
      // the whole orders fact through 5 reducer tasks. TopK keeps a
      // k-bounded heap per group per task instead (desc price encoded as
      // negation; o_orderkey tie-break makes the order total).
      val o = t(s, dir, "orders")
      val c = broadcast(t(s, dir, "customer"))
      TopK.topKPerGroup(
        o.join(c, o("o_custkey") === c("c_custkey"))
          .select(col("c_mktsegment"), col("o_orderkey"),
            col("o_totalprice")),
        groupCols = Seq("c_mktsegment"),
        sortKey = struct((-col("o_totalprice")).as("np"),
          col("o_orderkey").as("ok")),
        payload = Seq(col("o_orderkey"), col("o_totalprice")),
        k = 3)
        .orderBy(col("c_mktsegment").asc, col("rank").asc)
    }),
    "q22_window_running" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      o.select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          cents(col("o_totalprice"), 100).as("price_c"))
        .withColumn("running_c",
          sum(col("price_c")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("prev_order", lag(col("o_orderkey"), 1).over(w))
        .orderBy(col("o_custkey").asc, col("o_orderkey").asc)
    }),
    "q23_set_ops" -> ((s, dir) => {
      val users = t(s, dir, "events").select(col("user_id").as("id"))
      val custs = t(s, dir, "customer").select(col("c_custkey").as("id"))
      val inter = users.intersect(custs).withColumn("op", lit("intersect"))
      val exc = users.except(custs).withColumn("op", lit("except"))
      inter.unionByName(exc).select(col("op"), col("id"))
        .orderBy(col("op").asc, col("id").asc)
    }),
    "q24_tpch_q1" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .where(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          sum(cents(col("l_extendedprice"))).as("sum_base_bp"),
          sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
            .as("sum_disc_bp"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag").asc, col("l_linestatus").asc)),
    "q27_sessionize" -> ((s, dir) =>
      // distinct (user, ts) first so the lag order is total — duplicate
      // timestamps would make gaps-and-islands nondeterministic
      Sessionize.sessions(
        t(s, dir, "events").select(col("user_id"), col("ts")).distinct(),
        gapMinutes = 60)
        .orderBy(col("user_id").asc, col("session_id").asc)),
    "q28_approx_distinct" -> ((s, dir) =>
      // HLL sketch VALUES differ across engines by design, so the
      // sketch itself can never hash-compare — but its ERROR BOUND
      // can: the entry emits the exact count (DuckDB-derivable) and
      // an error-bound verdict bit (the sketch is deterministic for
      // a fixed dataset, so the bit is stable and the oracle pins it
      // every round — a sketch regression or a broken grouping lands
      // in the hash instead of hiding behind a rows-only shrug).
      // Margin 15% = 3x Spark's default rsd=0.05: rsd is a STANDARD
      // DEVIATION of relative error, not a bound, so pinning 5%
      // itself would turn a legitimate tail-of-distribution group
      // (new dataset, new SF, an HLL++ impl change) into a phantom
      // oracle failure; 3 sigma is margin the bit survives while a
      // real sketch regression (wrong grouping, broken hashing,
      // collapsed registers) still lands far outside it. Measured
      // worst group error on the benched datasets is well under 5%.
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id")).as("approx"),
          countDistinct(col("user_id")).as("exact_users"))
        .select(col("event_type"), col("exact_users"),
          (abs(col("approx").cast("double") -
              col("exact_users").cast("double")) <=
            col("exact_users").cast("double") * lit(0.15))
            .as("within_3rsd"))
        .orderBy(col("event_type").asc)),
    "q50_rollup" -> ((s, dir) =>
      t(s, dir, "events")
        .select(col("event_type"), month(col("ts")).as("m"))
        .rollup(col("event_type"), col("m"))
        .agg(count(lit(1)).as("cnt"),
          grouping(col("event_type")).cast("int").as("g_type"),
          grouping(col("m")).cast("int").as("g_month"))
        .orderBy(col("g_type").asc, col("g_month").asc,
          col("event_type").asc_nulls_first, col("m").asc_nulls_first)),
    "q51_grouping_sets" -> ((s, dir) => {
      // GROUPING SETS has no DataFrame API — the SQL surface is the
      // engine's path for it
      t(s, dir, "events").createOrReplaceTempView("__events_gs")
      s.sql(
        """SELECT event_type, month(ts) AS m, count(1) AS cnt
          |FROM __events_gs
          |GROUP BY GROUPING SETS ((event_type), (month(ts)))
          |ORDER BY event_type ASC NULLS FIRST, m ASC NULLS FIRST"""
          .stripMargin)
    }),
    "q52_pivot" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .pivot("event_type",
          Seq("click", "error", "purchase", "signup", "view"))
        .count()
        .na.fill(0L)
        .orderBy(col("user_id").asc)),
    "q53_range_join" -> ((s, dir) => {
      import s.implicits._
      val bands = Seq((0.0, 50000.0, "low"), (50000.0, 150000.0, "mid"),
        (150000.0, 1e9, "high")).toDF("lo", "hi", "band")
      Joins.range(t(s, dir, "orders"), bands,
          col("o_totalprice"), col("lo"), col("hi"))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n"),
          sum(cents(col("o_totalprice"))).as("total_bp"))
        .orderBy(col("band").asc)
    }),
    // q53's semantics through the large-large bucketed shape (equi-join
    // on the value bucket + residual predicate). The high band's hi is
    // the same 1e9 sentinel as q53's: rangeBucketed clamps interval ends
    // to the observed o_totalprice range internally, so the open end
    // costs buckets only where left rows exist, not 1e9/bucketWidth rows
    "q73_range_bucketed" -> ((s, dir) => {
      import s.implicits._
      val bands = Seq((0.0, 50000.0, "low"), (50000.0, 150000.0, "mid"),
        (150000.0, 1e9, "high")).toDF("lo", "hi", "band")
      Joins.rangeBucketed(t(s, dir, "orders"), bands,
          col("o_totalprice"), col("lo"), col("hi"),
          bucketWidth = 50000.0)
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n"),
          sum(cents(col("o_totalprice"))).as("total_bp"))
        .orderBy(col("band").asc)
    }),
    "q54_asof_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("ts"))
      val ord = t(s, dir, "orders")
        .select(col("o_custkey").as("user_id"), col("o_orderkey"),
          col("o_orderdate"))
      Joins.asOf(ev, ord, key = "user_id", leftTime = "ts",
          rightTime = "o_orderdate", leftId = "event_id",
          tieCol = "o_orderkey",
          rightVals = Seq("o_orderkey", "o_orderdate"))
        .orderBy(col("event_id").asc)
    }),
    // same semantics as q54 through the skew-safe physical shape —
    // hash-checked against the identical oracle
    "q55_asof_bucketed" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("ts"))
      val ord = t(s, dir, "orders")
        .select(col("o_custkey").as("user_id"), col("o_orderkey"),
          col("o_orderdate"))
      Joins.asOfBucketed(ev, ord, key = "user_id", leftTime = "ts",
          rightTime = "o_orderdate", leftId = "event_id",
          tieCol = "o_orderkey",
          rightVals = Seq("o_orderkey", "o_orderdate"))
        .orderBy(col("event_id").asc)
    }),
    "q57_except_all" -> ((s, dir) => {
      // bag semantics: each user_id occurrence beyond its count in the
      // customer key bag survives (vs q23's set-based EXCEPT)
      val users = t(s, dir, "events").select(col("user_id").as("id"))
      val custs = t(s, dir, "customer").select(col("c_custkey").as("id"))
      users.exceptAll(custs)
        .groupBy(col("id")).agg(count(lit(1)).as("n"))
        .orderBy(col("id").asc)
    }),
    "q58_semi_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val cust = t(s, dir, "customer")
      ev.join(broadcast(cust), col("user_id") === col("c_custkey"),
          "left_semi")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(cents(col("value"), 100)).as("value_c"))
        .orderBy(col("event_type").asc)
    }),
    "q59_scalar_subquery" -> ((s, dir) => {
      // threshold = integer mean in cents via integer division — exact in
      // both engines (a double avg would make boundary rows engine-flaky)
      val o = t(s, dir, "orders")
      val thr = o.agg(expr(
        "sum(CAST(round(o_totalprice * 100) AS BIGINT)) div count(1)"))
        .collect()(0).getLong(0)
      o.where(cents(col("o_totalprice"), 100) > thr)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderpriority").asc)
    }),
    "q56_percentiles" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          expr("percentile(l_quantity, 0.5)").as("median_qty"),
          round(expr("percentile(l_quantity, 0.9)"), 6).as("p90_qty"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc)),
    // ---- sources ----
    "q25_csv_feed" -> ((s, _) => {
      graft.sources.Sources
        .logentryCsv(s, Seq("/root/repo/fixtures/logentry.csv.gz"))
        .select(date_trunc("day", col("date")).as("day"), col("ip"),
          col("risk"), col("asn"), col("country"))
        .distinct()
        .groupBy(col("day"), col("risk"), col("country"), col("asn"))
        .agg(count(lit(1)).as("count"))
        .orderBy(col("day").desc, col("country").asc, col("asn").asc,
          col("risk").asc)
    }),
    "q26_manifest_flatten" -> ((s, _) =>
      graft.sources.Sources
        .manifestEntries(s, "/root/repo/fixtures/datapackage.json")
        .orderBy(col("url").asc)),
    // ---- extension tier: dedup ----
    "q30_dedup_exact_groups" -> ((s, dir) =>
      Dedup.exactGroups(t(s, dir, "documents"))
        .orderBy(col("fingerprint").asc)),
    // chunk-granular substring dedup: 10-token windows (not the
    // paper's 50) so the synthetic ~30-60-token docs span several
    // chunks and cross-doc window duplication actually occurs
    "q87_chunk_dedup" -> ((s, dir) =>
      Dedup.dedupChunks(t(s, dir, "documents"), chunkTokens = 10)
        .select(col("doc_id"), col("n_chunks"), col("n_kept"),
          md5(col("text")).as("dedup_md5"))
        .orderBy(col("doc_id").asc)),
    // content-defined chunking: divisor 8 ≈ the q87 granularity but
    // boundaries come from token content, so duplicated passages dedup
    // at ANY token offset (the fixed grid's blind spot)
    "q88_cdc_chunk_dedup" -> ((s, dir) =>
      Dedup.dedupChunksCDC(t(s, dir, "documents"), divisor = 8)
        .select(col("doc_id"), col("n_chunks"), col("n_kept"),
          md5(col("text")).as("dedup_md5"))
        .orderBy(col("doc_id").asc)),
    // the SAME two chunking rules at the paper's 50-token granularity —
    // the regime real corpora run (and the API defaults): the frozen
    // bench inventory tracks it, and the parameterized shared oracles
    // (chunkDedupSql/cdcChunkDedupSql) hash-check both window sizes so the
    // small-doc (q87/q88) and paper-granularity entries cannot drift
    "q92_chunk_dedup50" -> ((s, dir) =>
      Dedup.dedupChunks(t(s, dir, "documents"), chunkTokens = 50)
        .select(col("doc_id"), col("n_chunks"), col("n_kept"),
          md5(col("text")).as("dedup_md5"))
        .orderBy(col("doc_id").asc)),
    "q93_cdc_chunk_dedup50" -> ((s, dir) =>
      Dedup.dedupChunksCDC(t(s, dir, "documents"), divisor = 50)
        .select(col("doc_id"), col("n_chunks"), col("n_kept"),
          md5(col("text")).as("dedup_md5"))
        .orderBy(col("doc_id").asc)),
    // incremental substring dedup against a persisted chunk index: docs
    // < 250 are the standing indexed corpus, the rest arrive as the
    // batch — oracle-checked because the monotone-id contract makes the
    // incremental result EQUAL the full-corpus run restricted to the
    // batch (the oracle runs exactly that). Index write inside the
    // query (the q84 contract). Grid rule at q87's 10-token granularity;
    // q96 is the CDC flavor at q88's divisor 8.
    "q95_index_chunk_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val idx = ivfIndexDir(dir, "ch95")
      Dedup.writeChunkIndex(docs.where(col("doc_id") < 250), idx,
        chunkTokens = 10, chunkBuckets = 32)
      Dedup.dedupChunksAgainstIndex(s, docs.where(col("doc_id") >= 250),
          idx)
        .select(col("doc_id"), col("n_chunks"), col("n_kept"),
          md5(col("text")).as("dedup_md5"))
        .orderBy(col("doc_id").asc)
    }),
    // line/paragraph-level exact dedup (Dolma-style): the synthetic
    // docs are single-line, so the query derives a deterministic
    // multi-line view first — every literal " scan " becomes a line
    // break, in BOTH engines — and dedups the trimmed lines corpus-wide
    "q121_line_dedup" -> ((s, dir) =>
      Dedup.dedupLines(multiLineDocs(t(s, dir, "documents")))
        .select(col("doc_id"), col("n_chunks"), col("n_kept"),
          md5(col("text")).as("dedup_md5"))
        .orderBy(col("doc_id").asc)),
    // incremental line dedup against a persisted line-rule chunk index
    // (the q95 split contract: index the low-id half, probe the rest)
    "q122_index_line_dedup" -> ((s, dir) => {
      val docs = multiLineDocs(t(s, dir, "documents"))
      val idx = ivfIndexDir(dir, "ch122")
      Dedup.writeChunkIndexLines(docs.where(col("doc_id") < 250), idx,
        chunkBuckets = 32)
      Dedup.dedupChunksAgainstIndex(s, docs.where(col("doc_id") >= 250),
          idx)
        .select(col("doc_id"), col("n_chunks"), col("n_kept"),
          md5(col("text")).as("dedup_md5"))
        .orderBy(col("doc_id").asc)
    }),
    "q96_index_cdc_chunk_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val idx = ivfIndexDir(dir, "ch96")
      Dedup.writeChunkIndexCDC(docs.where(col("doc_id") < 250), idx,
        divisor = 8, chunkBuckets = 32)
      Dedup.dedupChunksAgainstIndex(s, docs.where(col("doc_id") >= 250),
          idx)
        .select(col("doc_id"), col("n_chunks"), col("n_kept"),
          md5(col("text")).as("dedup_md5"))
        .orderBy(col("doc_id").asc)
    }),
    // incremental image/signature near-dup against a persisted Hamming
    // index (the third written-index family): rows-only — the q34
    // contract (signature pigeonhole buckets are engine-specific); the
    // incremental ≡ full-run equality is DedupSpec-proven, the pruned
    // scan PlanSpec-pinned. Radius 3 = q34's simhash setting so the
    // fake-payload FNV signatures pair only on exact byte duplicates
    // plus genuinely close simhashes.
    "q97_index_hamming_neardup" -> ((s, dir) => {
      val sigs = Dedup.simhash(t(s, dir, "documents"))
      val idx = ivfIndexDir(dir, "hm97")
      Dedup.writeHammingIndex(
        sigs.where(pmod(col("doc_id"), lit(2)) === 0), idx,
        maxHamming = 3, pieceBuckets = 32)
      Dedup.hammingCandidatesAgainstIndex(s,
          sigs.where(pmod(col("doc_id"), lit(2)) === 1), idx)
        .orderBy(col("id_a").asc, col("id_b").asc)
    }),
    "q31_dedup_exact_rows" -> ((s, dir) =>
      Dedup.exactDedup(t(s, dir, "documents"))
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy(col("doc_id").asc)),
    "q32_minhash_candidates" -> ((s, dir) =>
      Dedup.minhashCandidates(t(s, dir, "documents"))
        .orderBy(col("id_a").asc, col("id_b").asc)),
    "q33_neardup_jaccard" -> ((s, dir) =>
      Dedup.nearDupPairs(t(s, dir, "documents"), threshold = 0.5)
        .orderBy(col("id_a").asc, col("id_b").asc)),
    // ---- persisted-index incremental dedup (weekly-refresh regime) ----
    // index the even half of the capped corpus, then near-dup the odd
    // half AGAINST THE WRITTEN INDEX — no signature recompute for the
    // indexed side. Rows-only (band buckets are xxhash-based, q32's
    // contract); the incremental ≡ full-run equality is DedupSpec-proven
    // bit-exactly and the index round-trip is q90's oracle-checked job.
    // The index write sits inside the query on purpose — the q84
    // contract: the layout's cost must not hide outside the timer.
    "q89_index_incremental_neardup" -> ((s, dir) => {
      val docs = t(s, dir, "documents").where(col("doc_id") < 1000)
      val idx = ivfIndexDir(dir, "mh89")
      // 32 buckets at test scale (bands AND shingles): 256 partition
      // dirs of near-empty files would be pure small-file IO inside
      // the timer (the production defaults stay 256/64; pruning is
      // PlanSpec's job)
      Dedup.writeMinhashIndex(
        docs.where(pmod(col("doc_id"), lit(2)) === 0), idx,
        bandBuckets = 32, shingleBuckets = 32)
      Dedup.nearDupAgainstIndex(s,
          docs.where(pmod(col("doc_id"), lit(2)) === 1), idx,
          threshold = 0.5)
        .orderBy(col("id_a").asc, col("id_b").asc)
    }),
    // exact cross-batch baseline THROUGH the index: the odd half scored
    // all-pairs against the even half's STORED shingle arrays —
    // oracle-checked, so the shingles/ parquet round-trip and the shared
    // jaccard arithmetic are hash-proven (q62's contract extended to the
    // persisted layout). Capped like every all-pairs baseline.
    "q90_index_jaccard_exact" -> ((s, dir) => {
      val docs = t(s, dir, "documents").where(col("doc_id") < 1000)
      val idx = ivfIndexDir(dir, "mh90")
      Dedup.writeMinhashIndex(
        docs.where(pmod(col("doc_id"), lit(2)) === 0), idx,
        bandBuckets = 32, shingleBuckets = 32)
      Dedup.jaccardAllPairsAgainstIndex(s,
          docs.where(pmod(col("doc_id"), lit(2)) === 1), idx,
          threshold = 0.5)
        .orderBy(col("id_a").asc, col("id_b").asc)
    }),
    // incremental SEMANTIC near-dup against a written IVF index — the
    // symmetric completion of the q89/q95/q97 incremental family for
    // the embedding modality: even half indexed (write inside the
    // timer, the q84 contract), odd half cell-tagged with the STORED
    // centroids under the STORED quantizer/multi-assign geometry and
    // probed against the DPP-pruned cells/ scan. Rows-only — k-means
    // cells are engine-specific (q75's contract); the incremental ≡
    // full-run equality is DedupSpec-proven bit-exactly and the pruned
    // scan PlanSpec-pinned. q75's parameters (nlist 64, m = 2,
    // threshold 0.25) so the scan-fraction economics match the inline
    // scorer's on the same isotropic testdata.
    "q98_index_semantic_neardup" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val even = emb.where(pmod(col("vec_id"), lit(2)) === 0)
      val idx = ivfIndexDir(dir, "sem98")
      val cents = Similarity.kmeansCentroids(
        even.select(col("vec_id"), col("embedding")), nlist = 64,
        iters = 1)
      Similarity.writeIvfIndex(even, idx, cents, multiAssign = 2)
      Dedup.semanticNearDupAgainstIndex(s,
          emb.where(pmod(col("vec_id"), lit(2)) === 1), idx,
          threshold = 0.25)
        .orderBy(col("id_a").asc, col("id_b").asc)
    }),
    // radius 3 is the standard 64-bit near-dup setting (Manku et al.,
    // WWW'07): 4 chunks of 16 bits keep buckets selective; radius 8 would
    // shrink chunks to ~7 bits and blow up intra-bucket candidates
    "q34_simhash" -> ((s, dir) =>
      Dedup.simhashCandidates(t(s, dir, "documents"), maxHamming = 3)
        .orderBy(col("id_a").asc, col("id_b").asc)),
    "q35_embedding_neardup" -> ((s, dir) =>
      // synthetic embeddings are near-orthogonal (max cosine ~0.4), so a
      // production 0.95 threshold would be trivially empty; 0.25 exercises
      // the bucket-join + verify path with a non-empty result
      Dedup.embeddingNearDup(t(s, dir, "embeddings"), threshold = 0.25)
        .orderBy(col("id_a").asc, col("id_b").asc)),
    // SemDeDup (k-means-cluster-bucketed cosine pairs): rows-only by
    // design — k-means cells are engine-specific like q35's hyperplane
    // buckets; the exact counterpart is q63 and q77 quantifies the gap
    // as a recall row. Threshold 0.25 for the same non-emptiness reason
    // as q35. nlist=64/multiAssign=2 scores 1/16 of all pairs
    // (scan ≈ m²/nlist) — nlist grows with the corpus at scale, so the
    // bench query runs the scale-honest ratio, not a small-nlist one
    // whose within-cell density would be quadratic in corpus growth.
    // On the isotropic testdata (the ANN worst case, q70's regime
    // note) that recovers ~37% of exact pairs — a ~6x concentration
    // over random pair sampling; on clustered corpora (SemDeDup's
    // target) recall is 1.0 at m=1 and scan ≈ 1/nlist — DedupSpec
    // proves both regimes. kmeansIters=1: Lloyd refinement buys
    // nothing on isotropic data, and each iteration is a corpus pass.
    "q75_semdedup_pairs" -> ((s, dir) =>
      Dedup.semanticNearDupPairs(t(s, dir, "embeddings"),
          nlist = 64, threshold = 0.25, kmeansIters = 1,
          multiAssign = 2)
        .orderBy(col("id_a").asc, col("id_b").asc)),
    // the full SemDeDup pipeline tail: survivors after dropping
    // non-canonical semantic duplicates (rows-only; the oracle-checked
    // dedup tail is q74 on the exact edge set). Threshold 0.4, not
    // q75's 0.25: at 0.25 the pair graph is 2%-dense and label-prop
    // collapses the corpus into one giant component (3 survivors of
    // 500) — 0.4 is the sparse regime where per-cluster canonicals are
    // meaningful
    "q76_semdedup" -> ((s, dir) =>
      Dedup.semanticDedup(t(s, dir, "embeddings"),
          nlist = 64, threshold = 0.4, kmeansIters = 1,
          multiAssign = 2)
        .select(col("vec_id"), col("label"))
        .orderBy(col("vec_id").asc)),
    // the honesty gate at q75's exact parameters, ORACLE-CHECKED as
    // q28-style verdict bits: the k-means cells are engine-specific,
    // but n_exact is DuckDB's own all-pairs arithmetic (q63's oracle
    // at the same threshold/cap) and the recall-floor / scan-ceiling
    // verdicts are stable bits for a fixed dataset — an index-quality
    // regression now FAILS the round instead of drifting a number
    // nobody diffs. Floors from the measured values with margin:
    // recall 0.368/0.372 at sf0.001/sf0.01 (isotropic embeddings, the
    // ANN worst case — on clustered corpora DedupSpec proves ~1.0)
    // vs floor 0.3; scan_frac 0.062 vs ceiling 0.12 — together they
    // pin the honesty contract itself: 3x the recall of random
    // scanning at that budget. Raw values stay DedupSpec-floored and
    // readable via Dedup.semanticDedupRecall.
    "q77_semdedup_recall" -> ((s, dir) =>
      Dedup.semanticDedupRecall(
          t(s, dir, "embeddings").where(col("vec_id") < 1000),
          nlist = 64, threshold = 0.25, kmeansIters = 1,
          multiAssign = 2)
        .select(col("n_exact"), col("multi_assign"),
          (col("recall") >= lit(0.3)).as("recall_ge_floor"),
          (col("scan_frac") <= lit(0.12)).as("scan_le_ceiling"))),
    // ---- extension tier: similarity search ----
    "q36_ann_quantized_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.quantizedTopK(emb, emb.where(col("vec_id") < 5), k = 10)
        .orderBy(col("query_id").asc, col("rank").asc)
    }),
    "q37_ann_cosine_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(emb, emb.where(col("vec_id") < 5), k = 10)
        .orderBy(col("query_id").asc, col("rank").asc)
    }),
    // SQ8 (int8) quantized scan with FULL exact re-rank: the
    // candidate pass reads d BYTES per vector instead of 4d, and at
    // rerank = |corpus| every pair is re-scored exactly
    // (SimilaritySpec pins bit-equality with the brute force), so the
    // whole quantize→scan→re-rank pipeline hash-checks against q37's
    // oracle — the 4×-smaller layout is correctness-proven end-to-end,
    // not just spec'd. The count() sits inside the timer like q84's
    // index write: the exact endpoint's price must not hide outside
    // it. Production runs rerank ≪ |corpus| and reads q107's recall
    // disclosure for the pure quantized ranking.
    "q106_sq8_rerank_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.sq8TopK(emb, emb.where(col("vec_id") < 5), k = 10,
          rerank = emb.count().toInt)
        .orderBy(col("query_id").asc, col("rank").asc)
    }),
    // the SQ8 honesty row (q70's role for the quantized ranking),
    // ORACLE-CHECKED as a q28-style verdict bit: n_exact and the
    // byte columns are DuckDB-derivable (count of exact top-k rows;
    // dim from the arrays), and the recall floor is a stable bit for
    // a fixed dataset — measured 0.98/1.0 at sf0.001/sf0.01 vs floor
    // 0.9 (the SimilaritySpec floor, cleared with margin). The raw
    // recall stays readable via Similarity.sq8RecallStats.
    "q107_sq8_recall" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.sq8RecallStats(emb, emb.where(col("vec_id") < 5),
          k = 10)
        .select(col("n_exact"), col("dim"), col("f32_bytes_per_vec"),
          col("code_bytes_per_vec"),
          (col("recall_at_k") >= lit(0.9)).as("recall_ge_floor"))
    }),
    // nprobe=12/16: the synthetic embeddings are isotropic gaussian (no
    // cluster structure), so coarse cells carry little signal and recall
    // ∝ probed fraction. This sample query keeps the plain single-assign
    // shape; the recall GATE is q70, which runs nlist=64/nprobe=8 (a 1/8
    // probe ratio) with multiAssign=8 and reports recall + scan_frac.
    // Real clustered corpora reach 0.9 recall at nprobe≈2-4, m=1.
    "q38_ann_ivf_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.ivfTopK(emb, emb.where(col("vec_id") < 5), k = 10,
          nprobe = 12)
        .orderBy(col("query_id").asc, col("rank").asc)
    }),
    // the written-index layout probed END-TO-END: at nprobe = nlist
    // with the flat quantizer every cell is probed, so the result is
    // EXACT and hash-checked against the same brute-force oracle as
    // q37 — the 100 TB storage layout is correctness-proven, not just
    // plan-pinned. The index write is inside the query on purpose:
    // indexing cost is the price of the layout and must not hide
    // outside the timer.
    "q84_ivf_indexed_exact" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val cents = Similarity.collectCentroids(
        Similarity.ivfCentroids(emb, nlist = 16))
      val idx = ivfIndexDir(dir, "exact16")
      Similarity.writeIvfIndex(emb, idx, cents)
      // SELF-describing probe: centroids read back from the index, so
      // the hash-match additionally proves the centroid parquet
      // round-trip (q85 keeps the explicit-centroids path covered)
      Similarity.ivfTopKIndexedSelf(s, idx,
          emb.where(col("vec_id") < 5), k = 10, nprobe = 16)
        .orderBy(col("query_id").asc, col("rank").asc)
    }),
    // FILTERED ANN through the written index: top-k restricted to a
    // metadata predicate (label = 3, ~12% of vectors) applied as a
    // PRE-filter inside the probed cells/ scan — at full probing this
    // is EXACT filtered top-k, hash-checked against a brute-force
    // filtered oracle, so the pre-filter semantics (k best MATCHING
    // vectors, never a short post-filtered list) are oracle-proven.
    // Index write inside the timer (the q84 contract).
    "q103_ivf_filtered_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val cents = Similarity.collectCentroids(
        Similarity.ivfCentroids(emb, nlist = 16))
      val idx = ivfIndexDir(dir, "filt16")
      Similarity.writeIvfIndex(emb, idx, cents)
      Similarity.ivfTopKIndexedWhere(s, idx,
          emb.where(col("vec_id") < 5), col("label") === 3,
          k = 10, nprobe = 16)
        .orderBy(col("query_id").asc, col("rank").asc)
    }),
    // the same layout at the q70 partition-pruning ratio (8/64
    // cells): rows-only — cell contents are quantizer-specific — with
    // dynamic partition pruning pinned in PlanSpec and the machinery's
    // exactness proven by q84's full-probe hash-match
    "q85_ivf_indexed_probe" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val cents = Similarity.collectCentroids(
        Similarity.ivfCentroids(emb, nlist = 64))
      val idx = ivfIndexDir(dir, "probe64")
      Similarity.writeIvfIndex(emb, idx, cents)
      Similarity.ivfTopKIndexed(s, idx, emb.where(col("vec_id") < 5),
          cents, k = 10, nprobe = 8)
        .orderBy(col("query_id").asc, col("rank").asc)
    }),
    // SQ8 fused INTO the written IVF layout (q84 × q106): cells/ holds
    // one signed byte per dimension — the probed scan reads 4× fewer
    // bytes — and the exact re-rank reads f32 rows from the
    // vbucket-partitioned vectors/ pruned to the candidates' buckets.
    // At nprobe = nlist and rerank = |corpus| every candidate is
    // re-scored exactly, so the whole write→quantized-probe→pruned-
    // re-rank round-trip hash-checks against q37's brute-force oracle.
    // Index write inside the timer (the q84 contract).
    "q108_sq8_ivf_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val cents = Similarity.collectCentroids(
        Similarity.ivfCentroids(emb, nlist = 16))
      val idx = ivfIndexDir(dir, "sq8_16")
      Similarity.writeIvfIndex(emb, idx, cents, storage = "sq8",
        vecBuckets = 16)
      Similarity.ivfTopKIndexedSelf(s, idx,
          emb.where(col("vec_id") < 5), k = 10, nprobe = 16,
          rerank = emb.count().toInt)
        .orderBy(col("query_id").asc, col("rank").asc)
    }),
    // the sq8 layout at the q85 production shape (8/64 cells probed,
    // default 4·k re-rank): rows-only — the probed-cell candidate set
    // is quantizer-specific — with both stages' partition pruning
    // pinned in PlanSpec and exactness proven by q108's full-probe
    // hash-match; every reported cosine is an exact f32 re-score by
    // construction (re-rank always re-scores)
    "q109_sq8_ivf_probe" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val cents = Similarity.collectCentroids(
        Similarity.ivfCentroids(emb, nlist = 64))
      val idx = ivfIndexDir(dir, "sq8_probe64")
      Similarity.writeIvfIndex(emb, idx, cents, storage = "sq8",
        vecBuckets = 16)
      Similarity.ivfTopKIndexed(s, idx, emb.where(col("vec_id") < 5),
          cents, k = 10, nprobe = 8)
        .orderBy(col("query_id").asc, col("rank").asc)
    }),
    // FILTERED ANN through the sq8 layout (q103 × q108): the metadata
    // predicate pre-filters the QUANTIZED probed scan (cells/ carries
    // the extra columns next to the codes), candidates re-rank
    // exactly from vectors/ — at full probe + full re-rank this is
    // exact filtered top-k, hash-checked against q103's brute-force
    // filtered oracle, proving predicate-over-codes + re-rank
    // end-to-end. Index write inside the timer (the q84 contract).
    "q111_sq8_filtered_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val cents = Similarity.collectCentroids(
        Similarity.ivfCentroids(emb, nlist = 16))
      val idx = ivfIndexDir(dir, "sq8_filt16")
      Similarity.writeIvfIndex(emb, idx, cents, storage = "sq8",
        vecBuckets = 16)
      Similarity.ivfTopKIndexedWhere(s, idx,
          emb.where(col("vec_id") < 5), col("label") === 3,
          k = 10, nprobe = 16, rerank = emb.count().toInt)
        .orderBy(col("query_id").asc, col("rank").asc)
    }),
    // the q109 production shape's honesty row (q70's role for the
    // fused probe): recall@10 of nprobe=8/64 + default 4·k re-rank
    // against brute force over the index's OWN f32 side, with the
    // probe_frac and rerank budget disclosed beside it —
    // ORACLE-CHECKED as a q28-style verdict bit (the index geometry
    // is engine-specific, the floor verdict is a stable bit: measured
    // 0.96/0.94 at sf0.001/sf0.01 vs the SimilaritySpec floor 0.9).
    // The raw recall stays readable via sq8IndexedRecallStats.
    "q112_sq8_ivf_recall" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val cents = Similarity.collectCentroids(
        Similarity.ivfCentroids(emb, nlist = 64))
      val idx = ivfIndexDir(dir, "sq8_recall64")
      Similarity.writeIvfIndex(emb, idx, cents, storage = "sq8",
        vecBuckets = 16, multiAssign = 8)
      Similarity.sq8IndexedRecallStats(s, idx,
          emb.where(col("vec_id") < 5), k = 10, nprobe = 8)
        .select(col("n_exact"), col("probe_frac"),
          col("rerank_per_query"),
          (col("recall_at_k") >= lit(0.9)).as("recall_ge_floor"))
    }),
    // ---- extension tier: data mixing (temperature flattening) ----
    // the per-domain rate table the mix actually applies: counts →
    // rate = (c_min/c_d)^(1-α) rounded to 6 decimals (the lmScore
    // portability discipline — pow is the one non-correctly-rounded
    // op in the chain) → tick threshold at 1/10000 resolution
    // DSIR data selection (Xie et al. arXiv:2302.03169): hashed
    // bag-of-ngrams importance weights of every document against a
    // target distribution (here the lang='en' slice), then Gumbel
    // top-k resampling ∝ exp(log_weight). 512 feature buckets at
    // fixture scale (the paper's 10k is a free knob — the oracle
    // mirrors whatever is passed).
    // BM25 lexical retrieval: top-10 docs per probe query — the
    // keyword counterpart of the ANN tier, oracle-checked through the
    // full idf/tf/length arithmetic AND the ranking
    "q129_bm25_topk" -> ((s, dir) => {
      import s.implicits._
      val queries = Seq(
        (0, "spark hash join"),
        (1, "window sort merge"),
        (2, "stream batch dup")).toDF("query_id", "text")
      Retrieval.bm25TopK(t(s, dir, "documents"), queries, k = 10)
        .orderBy(col("query_id").asc, col("rank").asc)
    }),
    // BM25 through the persisted index: stored postings/doclen/stats,
    // DPP-pruned probe — identical output to q129's inline run, so it
    // shares q129's oracle (the index round-trip is the proof)
    "q133_bm25_indexed" -> ((s, dir) => {
      import s.implicits._
      val idx = ivfIndexDir(dir, "bm133")
      Retrieval.writeBm25Index(t(s, dir, "documents"), idx,
        tokenBuckets = 32, dlBuckets = 32)
      val queries = Seq(
        (0, "spark hash join"),
        (1, "window sort merge"),
        (2, "stream batch dup")).toDF("query_id", "text")
      Retrieval.bm25TopKIndexed(s, queries, idx, k = 10)
        .orderBy(col("query_id").asc, col("rank").asc)
    }),
    // the 100 TB hybrid path END TO END through the persisted layouts:
    // lexical = the stored BM25 family (probe-pruned), semantic = the
    // stored IVF family at full probe (exact ≡ brute force — q84's
    // contract), RRF-fused. Both legs and the fusion are exact, so the
    // whole persisted pipeline shares q130's brute-force oracle.
    "q134_hybrid_indexed" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val emb = t(s, dir, "embeddings")
      val bmIdx = ivfIndexDir(dir, "bm134")
      val ivfIdx = ivfIndexDir(dir, "ivf134")
      // the two index builds are INDEPENDENT (disjoint inputs to
      // disjoint dirs) — overlap them (Par, guide §2.6) instead of
      // summing two serial build chains before either probe can start
      graft.operators.Par.run(2)(Seq(
        () => Retrieval.writeBm25Index(docs, bmIdx, tokenBuckets = 32,
          dlBuckets = 32),
        () => Similarity.writeIvfIndex(emb, ivfIdx,
          Similarity.collectCentroids(
            Similarity.ivfCentroids(emb, nlist = 16)))))
      val qd = docs.where(col("doc_id") < 3)
        .select(col("doc_id").as("query_id"), col("text"))
      val lex = Retrieval.bm25TopKIndexed(s, qd, bmIdx, k = 20,
        excludeSelf = true)
      val sem = Similarity.ivfTopKIndexedSelf(s, ivfIdx,
          emb.where(col("vec_id") < 3), k = 20, nprobe = 16)
        .select(col("query_id"), col("vec_id").as("doc_id"),
          col("rank"))
      Retrieval.rrfFuse(
          lex.select(col("query_id"), col("doc_id"), col("rank")),
          sem, k = 10)
        .orderBy(col("query_id").asc, col("rank").asc)
    }),
    // sequence-packing manifest: the corpus cut into fixed 512-token
    // training sequences across doc boundaries — pure integer
    // arithmetic, oracle-checked span for span
    "q132_pack_sequences" -> ((s, dir) =>
      Sharding.packSequences(t(s, dir, "documents"), seqLen = 512)
        .orderBy(col("seq_id").asc, col("doc_id").asc)),
    // hybrid retrieval: probe docs 0-2 query the corpus lexically
    // (BM25 over their text, self excluded) AND semantically (exact
    // cosine over their embeddings), reciprocal-rank fused — both
    // rankings and the fusion arithmetic oracle-checked end to end
    "q130_hybrid_rrf" -> ((s, dir) => {
      Retrieval.hybridTopK(t(s, dir, "documents"),
          t(s, dir, "embeddings"), queryIds = Seq(0L, 1L, 2L), k = 10,
          kEach = 20)
        .orderBy(col("query_id").asc, col("rank").asc)
    }),
    // BPE subword tokenizer (rows-only: the merge loop is inherently
    // sequential and not SQL-expressible — BpeSpec replays the
    // hand-computed Sennrich merges and pins the encode invariants).
    // q125 = the learned merge list; q126 = the corpus tokenized under
    // it (train once per run, encode map-only).
    "q125_bpe_merges" -> ((s, dir) => {
      import s.implicits._
      Bpe.train(t(s, dir, "documents"), numMerges = 64)
        .zipWithIndex.map { case ((l, r), i) => (i, l, r) }
        .toDF("rank", "left", "right")
        .orderBy(col("rank").asc)
    }),
    "q126_bpe_encode" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Bpe.encode(docs, Bpe.train(docs, numMerges = 64))
        .select(col("doc_id"), col("n_subwords"),
          md5(concat_ws(" ", col("subwords"))).as("subwords_md5"))
        .orderBy(col("doc_id").asc)
    }),
    // token-budget sharding in MODEL tokens: the q66 shard cut under
    // BPE subword counts instead of whitespace words — what a training
    // run actually consumes (rows-only: the merge list is q125's)
    "q127_bpe_shards" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val merges = Bpe.train(docs, numMerges = 64)
      Sharding.tokenShards(docs, budget = 2000,
          tokens = graft.functions.native.bpe_count(
            Bpe.bpeTokens(col("text")), merges))
        .orderBy(col("doc_id").asc)
    }),
    // the token-ID tier (rows-only like its q125-q127 siblings: BPE
    // is not SQL-expressible): the corpus encoded to VOCABULARY IDS
    // under a complete trained model — id 0 reserved for
    // out-of-vocabulary code points, ids deterministic (sorted
    // alphabet, then merges in rank order); n_ids ≡ q126's
    // n_subwords (same segmentation — BpeSpec pins the bijection).
    // Deliberately NOT converted to the q138/q139 planted-model
    // trick: this entry's claim IS the trained-vocabulary id
    // assignment (real alphabet, real merges firing), which a
    // never-firing model would vacate — under the planted model
    // every id is 0/eow and nothing about trained-id encoding is
    // exercised. The trained encode is oracle-covered from the
    // outside by q141's decode round trip.
    "q137_bpe_ids" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val model = Bpe.trainModel(docs, numMerges = 64)
      Bpe.encodeIds(docs, model)
        .select(col("doc_id"), col("n_ids"),
          expr("md5(array_join(transform(ids, " +
            "x -> cast(x as string)), ' '))").as("ids_md5"))
        .orderBy(col("doc_id").asc)
    }),
    // the materialized training shards: the q132 manifest gathered
    // into actual seqLen-id sequences (train → encode → pack → read,
    // closed end to end) — ORACLE-CHECKED under the q147 planted
    // never-firing model (BpeModel(Seq("z", Eow), ("z","z")); 'z' is
    // absent from the documents text, so every code point is OOV id
    // 0, every word ends with the eow id 2, and the merge can never
    // fire): the ENTIRE packed id stream — concatenation order, cut
    // positions, fixed-length invariant, OOV/eow id assignment — is
    // integer-and-string arithmetic over the normalized text, so
    // ids_md5 itself hash-checks per sequence. The REAL-model encode
    // and packing stay covered by q141/q145/q149's oracle-checked
    // decode round trips and ShardingSpec's invariants.
    "q138_pack_ids" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val model = Bpe.BpeModel(
        Seq("z", graft.functions.BpeEncodeExpr.Eow), Seq(("z", "z")))
      Sharding.materializeSequences(docs, model, seqLen = 512)
        .select(col("seq_id"), col("n_ids"),
          expr("md5(array_join(transform(ids, " +
            "x -> cast(x as string)), ' '))").as("ids_md5"))
        .orderBy(col("seq_id").asc)
    }),
    // the eos-marked packing: every document contributes one trailing
    // end-of-document id (vocabSize + 1 = 4 under the planted model,
    // the GPT convention) before the cut, and each sequence carries
    // its `spans` document boundaries — what a block-diagonal
    // attention mask consumes. ORACLE-CHECKED like q138: the eos
    // interleave, the per-sequence document-boundary COUNT, and the
    // full id stream all hash against DuckDB's independent
    // derivation from the text; ShardingSpec pins the span partition
    // invariants for real models.
    "q139_pack_eos" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val model = Bpe.BpeModel(
        Seq("z", graft.functions.BpeEncodeExpr.Eow), Seq(("z", "z")))
      Sharding.materializeSequences(docs, model, seqLen = 512,
          eosId = Some(Bpe.eosIdOf(model)))
        .select(col("seq_id"), col("n_ids"),
          size(col("spans")).as("n_docs"),
          expr("md5(array_join(transform(ids, " +
            "x -> cast(x as string)), ' '))").as("ids_md5"))
        .orderBy(col("seq_id").asc)
    }),
    // the bm25 LIFECYCLE through the driver gate: index the lower
    // half of the corpus, APPEND the upper half (the refreshCorpus
    // follow-the-corpus path, mode=append under the watermark guard),
    // then probe — the appended statistics must rank identically to
    // one inline pass over the whole corpus, so this shares q129's
    // oracle (r14 proved the closure in specs; this makes the driver
    // hash-check it every round)
    "q140_bm25_appended" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val idx = ivfIndexDir(dir, "bm140")
      val mid = docs.agg(max(col("doc_id"))).head().getLong(0) / 2
      Retrieval.writeBm25Index(docs.where(col("doc_id") <= mid), idx,
        tokenBuckets = 32, dlBuckets = 32)
      Retrieval.writeBm25Index(docs.where(col("doc_id") > mid), idx,
        tokenBuckets = 32, dlBuckets = 32, mode = "append")
      val queries = Seq(
        (0, "spark hash join"),
        (1, "window sort merge"),
        (2, "stream batch dup")).toDF("query_id", "text")
      Retrieval.bm25TopKIndexed(s, queries, idx, k = 10)
        .orderBy(col("query_id").asc, col("rank").asc)
    }),
    // the id tier's DECODE path, ORACLE-CHECKED end to end: encode
    // every document to vocabulary ids, decode the ids back to words
    // (id → symbol LUT, end-of-word reassembly), and hash-match the
    // result against DuckDB's independent normalization — the one
    // SQL-expressible statement about a BPE artifact (the round trip
    // must land exactly on the shared normTokens stream), closing the
    // q137-q139 family's "rows-only by nature" gap from the outside
    "q141_decode_roundtrip" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      // maxTypes raised past any realistic distinct-type count at
      // oracle scale: the round trip is merges-invariant, but a code
      // point appearing ONLY in types outside a binding cap would
      // decode to <unk> and break the hash for a reason that is a
      // vocabulary-coverage knob, not a correctness defect
      val model = Bpe.trainModel(docs, numMerges = 64,
        maxTypes = 1 << 20)
      Bpe.encodeIds(docs, model)
        .select(col("doc_id"),
          array_join(Bpe.decodeWords(Bpe.decodeIds(col("ids"), model)),
            " ").as("decoded"))
        .orderBy(col("doc_id").asc)
    }),
    // the RETRACTION-REPAIR lifecycle, oracle-checked from the
    // artifact side: bootstrap + append exports (two pack
    // generations), a retraction hits only the appended batch's docs,
    // repairTrainingShards rewrites ONLY the touched pack — and the
    // proof is reconstructive: every document's id stream reassembled
    // from the repaired artifact's spans (slice each sequence by its
    // span, regroup by doc) decodes exactly to DuckDB's independent
    // normalization of the REMAINING corpus — retracted docs gone,
    // survivors bit-intact, across pack boundaries and mid-doc cuts
    "q142_repaired_export" -> ((s, dir) => {
      import s.implicits._
      // the q100/q102 slice precedent: a lifecycle entry proves the
      // closure, it does not need the whole bench corpus
      val docs = t(s, dir, "documents")
        .where(col("doc_id") < 1000)
        .select(col("doc_id"), col("text"))
      val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
      val mid = maxId / 2
      val n = StreamScratch.seq.incrementAndGet()
      val root = ivfIndexDir(dir, s"rep142_$n")
      docs.where(col("doc_id") <= mid).write.mode("overwrite")
        .parquet(s"$root/c/corpus/batch_id=$mid")
      // maxTypes past any oracle-scale type count (the q141 note:
      // full alphabet coverage keeps the decode hash a statement
      // about the lifecycle, not about a vocabulary cap).
      // ONE model for the whole lifecycle (the
      // writeTrainingShardsWith seam, guide §1.2): training holds it
      // in memory, and the export/append/repair/decode steps below
      // used to re-read the same dir four times
      val model = Pipeline.trainBpeModelReturning(s, s"$root/c",
        s"$root/model", numMerges = 64, maxTypes = 1 << 20)
      Pipeline.writeTrainingShardsWith(s, s"$root/c", s"$root/model",
        s"$root/shards", seqLen = 64, numShards = 4, eos = true,
        mode = "overwrite", modelOpt = Some(model))
      docs.where(col("doc_id") > mid).write.mode("overwrite")
        .parquet(s"$root/c/corpus/batch_id=$maxId")
      Pipeline.writeTrainingShardsWith(s, s"$root/c", s"$root/model",
        s"$root/shards", seqLen = 64, numShards = 4, eos = true,
        mode = "append", modelOpt = Some(model))
      // the retraction (multiples of 41 in the appended batch):
      // partition rewrite + ledger row — exactly the two surfaces
      // retractCorpus leaves behind that the repair consumes
      docs.where(col("doc_id") > mid &&
          pmod(col("doc_id"), lit(41)) =!= 0)
        .write.mode("overwrite")
        .parquet(s"$root/c/corpus/batch_id=$maxId")
      val nRet = docs.where(col("doc_id") > mid &&
        pmod(col("doc_id"), lit(41)) === 0).count()
      Seq((nRet, nRet)).toDF("n_requested", "n_retracted")
        .write.mode("overwrite")
        .parquet(s"$root/c/retractions/retraction_id=xq142")
      Pipeline.repairTrainingShardsWith(s, s"$root/c", s"$root/model",
        s"$root/shards", maxConcurrentRebuilds = 4,
        modelOpt = Some(model))
      val (seqs, _) = Pipeline.readTrainingShardsWith(s, s"$root/shards",
        strict = true, model = Some(s"$root/model" -> model))
      // reassemble every doc's id stream from the repaired artifact
      // (the named operator — eos stripped), then decode ids ->
      // subwords -> words (the q141 path)
      Sharding.reconstructDocs(seqs, eosId = Some(Bpe.eosIdOf(model)))
        .select(col("doc_id"),
          array_join(Bpe.decodeWords(Bpe.decodeIds(col("ids"), model)),
            " ").as("decoded"))
        .orderBy(col("doc_id").asc)
    }),
    // deterministic per-epoch data order: the salted permutation key
    // a training loader sorts an epoch by — map-only, engine-portable
    // (DuckDB reproduces the byte-fold + Lehmer mix independently),
    // totally ordered by the (key, id) tie-break. Run over the
    // documents ids as the sequence-id stand-in so the oracle can see
    // the same ids the hash is computed from.
    "q143_epoch_order" -> ((s, dir) => {
      val seqs = t(s, dir, "documents")
        .select(col("doc_id").as("seq_id"))
      Sharding.epochOrder(seqs, epoch = 3)
        .orderBy(col("epoch_key").asc, col("seq_id").asc)
    }),
    // q143's epoch key driven over the REAL artifact: build the
    // export lifecycle (train → encode → pack → write), read it back
    // STRICTLY, and key the artifact's own sequences frame with
    // epochOrder — the probed window [0, 500) keeps the oracle
    // derivable (a bootstrap export's seq_ids are dense from 0 —
    // ShardingSpec pins that — so DuckDB reproduces the id domain as
    // range(500) and the key from the shared byte-fold + Lehmer mix);
    // a gapped, truncated, or mis-id'd artifact drops rows here and
    // fails the hash. seq_id-only projection: the scan never
    // deserializes the id arrays (the artifact's bulk)
    "q144_epoch_shards" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .where(col("doc_id") < 1000)
        .select(col("doc_id"), col("text"))
      val n = StreamScratch.seq.incrementAndGet()
      val root = ivfIndexDir(dir, s"ep144_$n")
      docs.write.mode("overwrite").parquet(s"$root/c/corpus")
      // one model for train → export (the writeTrainingShardsWith
      // seam — the re-read removed is the same-dir model training
      // just held in memory)
      val model144 = Pipeline.trainBpeModelReturning(s, s"$root/c",
        s"$root/model", numMerges = 64, maxTypes = 20000)
      Pipeline.writeTrainingShardsWith(s, s"$root/c", s"$root/model",
        s"$root/shards", seqLen = 64, numShards = 4, eos = true,
        mode = "overwrite", modelOpt = Some(model144))
      val (seqs, p) = Pipeline.readTrainingShards(s, s"$root/shards",
        strict = true)
      // adaptive window: 500 at every oracle-checked SF (sf0.01 packs
      // ~1000 sequences from the slice), the full artifact below it
      // (the sf0.001 smoke has ~100 — rows-only there)
      val probe = math.min(500L, p.getAs[Long]("n_sequences"))
      Sharding.epochOrder(seqs.select(col("seq_id")), epoch = 3)
        .where(col("seq_id") < probe)
        .orderBy(col("epoch_key").asc, col("seq_id").asc)
    }),
    // the FULL artifact audit through the driver gate: the q142
    // lifecycle (bootstrap + append + retraction + repair) closed by
    // auditTrainingShards — DuckDB derives the surviving-doc count
    // independently and every damage column must be zero (the sample
    // array stringifies so the one-row schema stays oracle-hashable).
    // maxTypes past any oracle-scale type count keeps n_unk at 0 so
    // the zero is a statement about the lifecycle, not the vocabulary
    "q146_audit_shards" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
        .where(col("doc_id") < 1000)
        .select(col("doc_id"), col("text"))
      val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
      val mid = maxId / 2
      val n = StreamScratch.seq.incrementAndGet()
      val root = ivfIndexDir(dir, s"aud146_$n")
      docs.where(col("doc_id") <= mid).write.mode("overwrite")
        .parquet(s"$root/c/corpus/batch_id=$mid")
      // one model for the whole lifecycle (the
      // writeTrainingShardsWith seam — four disk re-reads removed)
      val model146 = Pipeline.trainBpeModelReturning(s, s"$root/c",
        s"$root/model", numMerges = 64, maxTypes = 1 << 20)
      Pipeline.writeTrainingShardsWith(s, s"$root/c", s"$root/model",
        s"$root/shards", seqLen = 64, numShards = 4, eos = true,
        mode = "overwrite", modelOpt = Some(model146))
      docs.where(col("doc_id") > mid).write.mode("overwrite")
        .parquet(s"$root/c/corpus/batch_id=$maxId")
      Pipeline.writeTrainingShardsWith(s, s"$root/c", s"$root/model",
        s"$root/shards", seqLen = 64, numShards = 4, eos = true,
        mode = "append", modelOpt = Some(model146))
      docs.where(col("doc_id") > mid &&
          pmod(col("doc_id"), lit(41)) =!= 0)
        .write.mode("overwrite")
        .parquet(s"$root/c/corpus/batch_id=$maxId")
      val nRet = docs.where(col("doc_id") > mid &&
        pmod(col("doc_id"), lit(41)) === 0).count()
      Seq((nRet, nRet)).toDF("n_requested", "n_retracted")
        .write.mode("overwrite")
        .parquet(s"$root/c/retractions/retraction_id=xq146")
      Pipeline.repairTrainingShardsWith(s, s"$root/c", s"$root/model",
        s"$root/shards", maxConcurrentRebuilds = 4,
        modelOpt = Some(model146))
      Pipeline.auditTrainingShardsWith(s, s"$root/shards",
          s"$root/model", s"$root/c", modelOpt = Some(model146))
        .select(col("n_docs"), col("n_mismatched"),
          concat_ws(",", col("mismatched_doc_ids"))
            .as("mismatched_doc_ids"),
          col("n_bad"), col("n_unk"), col("n_word_merge_risk"),
          col("n_unterminated"))
    }),
    // the metadata-priced export survey through the driver gate, over
    // the REAL multi-generation shape (bootstrap + one appended
    // pack): encoded under a PLANTED one-merge model whose merge can
    // never fire on this corpus (trained symbol 'z' is absent from
    // the documents text), so every word costs exactly len+1 ids (its
    // code points + the end-of-word symbol; vocabulary membership
    // never changes the COUNT, only the id) and one eos rides per
    // doc — DuckDB reproduces the whole per-pack packing arithmetic
    // (sizes, short tails, padding waste, shard spread) from the text
    // alone, INCLUDING the appended generation's base (= the
    // bootstrap's sequence count, the next_seq_id convention), never
    // seeing packs or ids
    "q147_stats_shards" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .where(col("doc_id") < 1000)
        .select(col("doc_id"), col("text"))
      val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
      val mid = maxId / 2
      val n = StreamScratch.seq.incrementAndGet()
      val root = ivfIndexDir(dir, s"st147_$n")
      // in-memory planted model for export and append (the
      // writeTrainingShardsWith seam)
      val model147 =
        Bpe.BpeModel(Seq("z", graft.functions.BpeEncodeExpr.Eow),
          Seq(("z", "z")))
      Bpe.writeModel(s, model147, s"$root/model")
      docs.where(col("doc_id") <= mid).write.mode("overwrite")
        .parquet(s"$root/c/corpus/batch_id=$mid")
      Pipeline.writeTrainingShardsWith(s, s"$root/c", s"$root/model",
        s"$root/shards", seqLen = 64, numShards = 4, eos = true,
        mode = "overwrite", modelOpt = Some(model147))
      docs.where(col("doc_id") > mid).write.mode("overwrite")
        .parquet(s"$root/c/corpus/batch_id=$maxId")
      Pipeline.writeTrainingShardsWith(s, s"$root/c", s"$root/model",
        s"$root/shards", seqLen = 64, numShards = 4, eos = true,
        mode = "append", modelOpt = Some(model147))
      Pipeline.statsTrainingShards(s, s"$root/shards")
        .select(col("pack"), col("n_sequences"), col("n_ids"),
          col("n_short"), col("padding_waste"), col("shard_spread"),
          // the seq-id-space generation rides the survey (triage:
          // "is my cursor stale?") — bootstrap + append never bump,
          // so the oracle pins 0 on both rows
          col("layout_gen"))
        .orderBy(col("pack").asc)
    }),
    // pack-tail COMPACTION through the driver gate: bootstrap + four
    // tiny weekly appends (each leaving a short-tail generation),
    // compacted, then the artifact reconstructed and decoded — the
    // merged export must still decode to every document's shared
    // normalization (the q141/q142 oracle family). Compaction re-cuts
    // id streams without re-encoding, so any drift (a lost piece, a
    // mis-based seq_id, a broken span) lands in the hash
    "q149_compacted_export" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .where(col("doc_id") < 1000)
        .select(col("doc_id"), col("text"))
      val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
      val cut = math.max(0L, maxId - 8)
      val n = StreamScratch.seq.incrementAndGet()
      val root = ivfIndexDir(dir, s"cmp149_$n")
      docs.where(col("doc_id") <= cut).write.mode("overwrite")
        .parquet(s"$root/c/corpus/batch_id=$cut")
      // one model for train → export → appends → decode (the
      // writeTrainingShardsWith seam)
      val model = Pipeline.trainBpeModelReturning(s, s"$root/c",
        s"$root/model", numMerges = 64, maxTypes = 1 << 20)
      Pipeline.writeTrainingShardsWith(s, s"$root/c", s"$root/model",
        s"$root/shards", seqLen = 64, numShards = 4, eos = true,
        mode = "overwrite", modelOpt = Some(model))
      (cut + 2 to maxId by 2).foreach { b =>
        docs.where(col("doc_id") > b - 2 && col("doc_id") <= b)
          .write.mode("overwrite")
          .parquet(s"$root/c/corpus/batch_id=$b")
        Pipeline.writeTrainingShardsWith(s, s"$root/c", s"$root/model",
          s"$root/shards", seqLen = 64, numShards = 4, eos = true,
          mode = "append", modelOpt = Some(model))
      }
      Pipeline.compactTrainingShards(s, s"$root/shards")
      val (seqs, _) = Pipeline.readTrainingShardsWith(s, s"$root/shards",
        strict = true, model = Some(s"$root/model" -> model))
      Sharding.reconstructDocs(seqs, eosId = Some(Bpe.eosIdOf(model)))
        .select(col("doc_id"),
          array_join(Bpe.decodeWords(Bpe.decodeIds(col("ids"), model)),
            " ").as("decoded"))
        .orderBy(col("doc_id").asc)
    }),
    // the COMPOSED follow-the-corpus cron line end-to-end through the
    // driver gate: batch 1 publishes via the CLI refresh and the
    // export bootstraps; batch 2 rides `refresh shards=` (pre-flight,
    // publish, knob-inert append in one line); then the FULL audit
    // closes the loop — the standing export must exactly mirror the
    // published corpus, doc by doc. The oracle pins the audit's
    // damage columns at zero: they are invariant to whatever the
    // refresh's dedup/cleaning drops (both audit sides are
    // post-publish), so the hash is a statement about the cron
    // composition, not about the dedup knobs. The tokenizer trains on
    // the full slice so later batches stay in-alphabet (n_unk = 0 is
    // part of the pinned row).
    "q150_refresh_shards" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .where(col("doc_id") < 1000)
        .select(col("doc_id"), col("text"))
      val n = StreamScratch.seq.incrementAndGet()
      val root = ivfIndexDir(dir, s"rs150_$n")
      docs.write.mode("overwrite").parquet(s"$root/seed/corpus")
      // one model for the bootstrap half and the closing audit (the
      // writeTrainingShardsWith seam); the CLI refresh line reads it
      // once itself — a separate process in the cron metaphor
      val model150 = Pipeline.trainBpeModelReturning(s, s"$root/seed",
        s"$root/model", numMerges = 64, maxTypes = 1 << 20)
      def batchDir(lo: Long, hi: Long): String = {
        val d = s"$root/batch_$lo"
        docs.where(col("doc_id") >= lo && col("doc_id") < hi)
          .write.mode("overwrite").parquet(d)
        d
      }
      // batch 1 creates the index families at the q100 test-scale
      // geometry (32 buckets; production-default 256-bucket creation
      // pays ~8x the bench floor in empty-partition writes) — the
      // knob-inert contract then drives batch 2's CLI refresh from
      // the STANDING params, which is itself part of what this entry
      // exercises (CorpusRefreshSpec pins the inheritance)
      Pipeline.refreshCorpus(s,
        s.read.parquet(batchDir(0L, 150L)), s"$root/idx",
        s"$root/corpus", jaccardThreshold = 0.5, chunkTokens = 10,
        bandBuckets = 32, pieceBuckets = 32, chunkBuckets = 32,
        tokenizerModelDir = Some(s"$root/model"),
        tokenizerModel = Some(model150))
      Pipeline.writeTrainingShardsWith(s, s"$root/corpus",
        s"$root/model", s"$root/shards", seqLen = 64, numShards = 4,
        eos = true, mode = "overwrite", modelOpt = Some(model150))
      CorpusMain.run(s, List("refresh", batchDir(150L, 300L),
        s"$root/idx", s"$root/corpus", s"tokenizer=$root/model",
        s"shards=$root/shards"))
      Pipeline.auditTrainingShardsWith(s, s"$root/shards",
          s"$root/model", s"$root/corpus", modelOpt = Some(model150))
        .select(col("n_mismatched"),
          concat_ws(",", col("mismatched_doc_ids"))
            .as("mismatched_doc_ids"),
          col("n_bad"), col("n_unk"), col("n_word_merge_risk"),
          col("n_unterminated"))
    }),
    // fsck through the driver gate — the operator you only ever run
    // when trust is already in question, so its own honesty matters
    // MORE than the read paths': a healthy composed lifecycle
    // (refresh-published corpus + its index families + the tokenizer
    // + the shard export) surveyed by Fsck must report all-ok, and
    // the oracle pins the WHOLE classification: zero errors, zero
    // warns, exactly the refresh's three standing index families
    // consistent (a contract constant of these knobs), the model and
    // export trees recognized healthy, and the corpus root SILENT (a
    // healthy corpus is no-findings by design — pinned so an fsck
    // that crashes into empty output cannot pass as "quiet"). The
    // seeded-residue variants (asides, markers, foreign dirs) stay
    // spec-level — ShardingSpec/FsckSpec plant each damage class.
    "q151_fsck_lifecycle" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .where(col("doc_id") < 1000)
        .select(col("doc_id"), col("text"))
      val n = StreamScratch.seq.incrementAndGet()
      val root = ivfIndexDir(dir, s"fk151_$n")
      docs.write.mode("overwrite").parquet(s"$root/seed/corpus")
      // one model for refresh + export (the writeTrainingShardsWith
      // seam); the fsck survey below reads only the filesystem
      val model151 = Pipeline.trainBpeModelReturning(s, s"$root/seed",
        s"$root/model", numMerges = 64, maxTypes = 1 << 20)
      docs.where(col("doc_id") < 300).write.mode("overwrite")
        .parquet(s"$root/batch_0")
      Pipeline.refreshCorpus(s,
        s.read.parquet(s"$root/batch_0"), s"$root/idx",
        s"$root/corpus", jaccardThreshold = 0.5, chunkTokens = 10,
        bandBuckets = 32, pieceBuckets = 32, chunkBuckets = 32,
        tokenizerModelDir = Some(s"$root/model"),
        tokenizerModel = Some(model151))
      Pipeline.writeTrainingShardsWith(s, s"$root/corpus",
        s"$root/model", s"$root/shards", seqLen = 64, numShards = 4,
        eos = true, mode = "overwrite", modelOpt = Some(model151))
      Seq("idx", "corpus", "model", "shards")
        .map(sub => graft.operators.Fsck.checkDf(s, s"$root/$sub")
          .withColumn("surface", lit(sub)))
        .reduce(_.unionByName(_))
        .agg(
          count(when(col("level") === "error", 1)).as("n_error"),
          count(when(col("level") === "warn", 1)).as("n_warn"),
          count(when(col("level") === "ok" &&
            col("detail").contains("index: layout consistent"), 1))
            .as("n_index_ok"),
          (count(when(col("level") === "ok" && col("detail")
            .contains("healthy complete BPE tokenizer model"), 1))
            === 1).as("model_ok"),
          (count(when(col("level") === "ok" && col("detail")
            .contains("healthy training-shards export"), 1)) === 1)
            .as("shards_ok"),
          (count(when(col("surface") === "corpus", 1)) === 0)
            .as("corpus_quiet"))
    }),
    // epochResume through the driver gate: the strict remainder of
    // q143's epoch-3 order after a REAL mid-order cursor — the
    // (epoch_key, seq_id) of the median id, so the filter's equality
    // tie-break is exercised at the cursor itself. DuckDB recomputes
    // the cursor and the remainder from scratch (the q143 byte-fold +
    // Lehmer mix); the artifact-side id domain is q144's claim, the
    // two-long resume semantics is this one's
    "q148_epoch_resume" -> ((s, dir) => {
      val seqs = t(s, dir, "documents")
        .select(col("doc_id").as("seq_id"))
      val curId = seqs.agg(max(col("seq_id"))).head().getLong(0) / 2
      val cur = Sharding.epochOrder(
        seqs.where(col("seq_id") === curId), epoch = 3).head()
      Sharding.epochResume(seqs, epoch = 3,
          lastKey = cur.getAs[Long]("epoch_key"), lastId = curId)
        .orderBy(col("epoch_key").asc, col("seq_id").asc)
    }),
    // the generation-GATED resume over a REAL export (q148 proves the
    // remainder arithmetic, q144 the artifact id domain; this one
    // composes both THROUGH Pipeline.epochResumeShards' layout-gen
    // gate — the strict read, the gen comparison, and the remainder
    // in one driver-checked pass). Under the q147 planted model the
    // sequence COUNT is DuckDB-derivable from the text (every word
    // costs len+1 ids + one eos per doc, cut at 64), ids are dense
    // from 0 (ShardingSpec-pinned), and the epoch keys are the q143
    // byte-fold — so the oracle rebuilds the id domain, recomputes
    // the mid-order cursor, and derives the exact remainder without
    // ever seeing packs, params, or the generation stamp. The
    // REFUSAL half (a repair/compaction bumping the gen strands the
    // cursor) is ShardingSpec's.
    "q152_resume_gated" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .where(col("doc_id") < 1000)
        .select(col("doc_id"), col("text"))
      val n = StreamScratch.seq.incrementAndGet()
      val root = ivfIndexDir(dir, s"rg152_$n")
      // the planted model stays in memory for the export (the
      // writeTrainingShardsWith seam — no disk re-read of the model
      // this entry itself just wrote)
      val model152 =
        Bpe.BpeModel(Seq("z", graft.functions.BpeEncodeExpr.Eow),
          Seq(("z", "z")))
      Bpe.writeModel(s, model152, s"$root/model")
      docs.write.mode("overwrite").parquet(s"$root/c/corpus")
      Pipeline.writeTrainingShardsWith(s, s"$root/c", s"$root/model",
        s"$root/shards", seqLen = 64, numShards = 4, eos = true,
        mode = "overwrite", modelOpt = Some(model152))
      // the loader's mint: generation + cursor at the median seq_id —
      // ONE params read feeds both fields (two reads before: the
      // exportLayoutGen call plus the n_sequences head)
      val p152 = s.read.parquet(s"$root/shards/params").head()
      val gen = Pipeline.layoutGenOf(p152)
      val nSeqs = p152.getAs[Long]("n_sequences")
      val curId = nSeqs / 2
      import s.implicits._
      val cur = Sharding.epochOrder(
        Seq(curId).toDF("seq_id"), epoch = 3).head()
      Pipeline.epochResumeShards(s, s"$root/shards", epoch = 3,
          lastKey = cur.getAs[Long]("epoch_key"), lastId = curId,
          cursorGen = gen)
        .select(col("seq_id"), col("epoch_key"))
        .orderBy(col("epoch_key").asc, col("seq_id").asc)
    }),
    // the OTHER coherent mid-epoch-append policy through the oracle
    // (q152 gates the default follow-the-corpus path): a loader that
    // checkpoints per-epoch PLANS mints (generation, next_seq_id,
    // cursor) at epoch start; data appended mid-epoch must wait for
    // the next one. Bootstrap a planted-model export, mint, append a
    // second batch via the knob-inert path, then resume through the
    // `snapshot=` CLI — the remainder is EXACTLY the epoch as
    // originally planned (appended ids excluded), which DuckDB
    // derives from the FIRST batch's text alone (q152's arithmetic
    // restricted to doc_id <= mid): the append never enters the
    // oracle at all, which IS the snapshot claim.
    "q153_resume_snapshot" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .where(col("doc_id") < 1000)
        .select(col("doc_id"), col("text"))
      val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
      val mid = maxId / 2
      val n = StreamScratch.seq.incrementAndGet()
      val root = ivfIndexDir(dir, s"sn153_$n")
      // in-memory planted model for export AND append (the
      // writeTrainingShardsWith seam — two disk re-reads removed)
      val model153 =
        Bpe.BpeModel(Seq("z", graft.functions.BpeEncodeExpr.Eow),
          Seq(("z", "z")))
      Bpe.writeModel(s, model153, s"$root/model")
      docs.where(col("doc_id") <= mid).write.mode("overwrite")
        .parquet(s"$root/c/corpus/batch_id=$mid")
      Pipeline.writeTrainingShardsWith(s, s"$root/c", s"$root/model",
        s"$root/shards", seqLen = 64, numShards = 4, eos = true,
        mode = "overwrite", modelOpt = Some(model153))
      // the loader's full epoch-start mint: generation + snapshot
      // bound (the standing next_seq_id) + a mid-order cursor —
      // ONE params read feeds both fields
      val p153 = s.read.parquet(s"$root/shards/params").head()
      val gen = Pipeline.layoutGenOf(p153)
      val snap = p153.getAs[Long]("next_seq_id")
      val curId = snap / 2
      import s.implicits._
      val cur = Sharding.epochOrder(Seq(curId).toDF("seq_id"),
        epoch = 3).head()
      // mid-epoch, a second batch lands (knob-inert append: the
      // generation carries, standing ids never move)
      docs.where(col("doc_id") > mid).write.mode("overwrite")
        .parquet(s"$root/c/corpus/batch_id=$maxId")
      Pipeline.appendTrainingShardsWith(s, s"$root/c", s"$root/model",
        s"$root/shards", modelOpt = Some(model153))
      CorpusMain.run(s, List("epoch-resume", s"$root/shards", "3",
        cur.getAs[Long]("epoch_key").toString, curId.toString,
        gen.toString, s"$root/resume", "ep", s"snapshot=$snap"))
      s.read.parquet(s"$root/resume/data")
        .select(col("seq_id"), col("epoch_key"))
        .orderBy(col("epoch_key").asc, col("seq_id").asc)
    }),
    // fsck's UNHEALTHY half through the driver gate (q151 pins the
    // healthy classification; the reason fsck exists is the crashed
    // tree): deterministic residue planted over a real planted-model
    // export — a crashed compaction's in-flight marker, a crashed
    // repair's staged-swap aside (dest live: the completed-swap
    // state), and a crashed model write (params/ gone after data
    // landed) — and the oracle pins the WHOLE taxonomy an operator
    // acts on: every finding's (surface, component, level, category),
    // including the export's ok row demoted from "healthy" to
    // mid-recovery and the sibling model staying healthy. The exotic
    // shapes (torn overwrites, bucket drift, crashed rebuilds) stay
    // spec-level (FsckSpec).
    "q154_fsck_residue" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .where(col("doc_id") < 1000)
        .select(col("doc_id"), col("text"))
      val n = StreamScratch.seq.incrementAndGet()
      val root = ivfIndexDir(dir, s"fr154_$n")
      // in-memory planted model for the export (the
      // writeTrainingShardsWith seam)
      val model154 =
        Bpe.BpeModel(Seq("z", graft.functions.BpeEncodeExpr.Eow),
          Seq(("z", "z")))
      Bpe.writeModel(s, model154, s"$root/model")
      docs.write.mode("overwrite").parquet(s"$root/c/corpus")
      Pipeline.writeTrainingShardsWith(s, s"$root/c", s"$root/model",
        s"$root/shards", seqLen = 64, numShards = 4, eos = true,
        mode = "overwrite", modelOpt = Some(model154))
      val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
        s.sparkContext.hadoopConfiguration)
      // plant the residue, filesystem-level and deterministic:
      // a (stale-bodied) compaction marker, a completed-swap aside
      // next to its live pack=0, and a model data tree whose params/
      // never committed
      val out = fs.create(new org.apache.hadoop.fs.Path(
        s"$root/shards/sequences/_compact~0"), true)
      try out.write("0;1;".getBytes("UTF-8")) finally out.close()
      fs.mkdirs(new org.apache.hadoop.fs.Path(
        s"$root/shards/sequences/_old_pack~0"))
      // a completed overwrite's generation-floor leftover (params
      // live, only the floor's delete was lost) — the inert-debris
      // half of the floor taxonomy; the do-NOT-delete error half
      // (floor without params) is FsckSpec's
      val fl = fs.create(new org.apache.hadoop.fs.Path(
        s"$root/shards/_layout_gen_floor"), true)
      try fl.write("7".getBytes("UTF-8")) finally fl.close()
      org.apache.hadoop.fs.FileUtil.copy(fs,
        new org.apache.hadoop.fs.Path(s"$root/model"), fs,
        new org.apache.hadoop.fs.Path(s"$root/model_crashed"), false,
        s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(
        s"$root/model_crashed/params"), true)
      Seq("model", "model_crashed", "shards")
        .map(sub => graft.operators.Fsck.checkDf(s, s"$root/$sub")
          .withColumn("surface", lit(sub)))
        .reduce(_.unionByName(_))
        .select(col("surface"), col("component"), col("level"),
          // the detail strings carry absolute paths; classify them
          // into the taxonomy the oracle pins instead
          when(col("detail").contains("compaction in-flight marker"),
              "compact_marker")
            .when(col("detail").contains("staged-swap residue"),
              "swap_residue")
            .when(col("detail")
              .contains("completed staged-write aside"), "aside_done")
            .when(col("detail").contains("generation-floor leftover"),
              "floor_done")
            .when(col("detail").contains("with no params/"),
              "crashed_write")
            .when(col("detail").contains("mid-recovery"),
              "mid_recovery")
            .when(col("detail").contains("healthy"), "healthy")
            .otherwise("other").as("category"))
        .orderBy(col("surface").asc, col("component").asc,
          col("level").asc, col("category").asc)
    }),
    "q123_dsir_weight" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Sharding.dsirScore(docs,
          Sharding.dsirWeights(docs.where(col("lang") === "en"), docs,
            buckets = 512), buckets = 512)
        .orderBy(col("doc_id").asc)
    }),
    "q124_dsir_sample" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Sharding.dsirResample(docs, docs.where(col("lang") === "en"),
          k = 50, buckets = 512)
        .orderBy(col("dsir_key").desc, col("doc_id").asc)
    }),
    "q114_temperature_rates" -> ((s, dir) =>
      Sharding.temperatureRates(t(s, dir, "documents"), col("lang"),
          alpha = 0.5)
        .orderBy(col("domain").asc)),
    // the mix itself: per-row membership under the q65/q72 portable
    // salted tick vs the data-derived q114 thresholds — the
    // multilingual flattening step of corpus assembly
    "q113_temperature_mix" -> ((s, dir) =>
      Sharding.temperatureMix(
        t(s, dir, "documents").select(col("doc_id"), col("lang")),
        domain = col("lang"), alpha = 0.5)
        .orderBy(col("doc_id").asc)),
    // ---- extension tier: semantic (embedding-level) decontamination ----
    // the full per-vector screen report: nearest eval-set vector by
    // exact cosine (q37's bit-reproducible arithmetic) — paraphrased
    // eval leakage that shares no n-grams with the benchmark still
    // lands here. Eval slice = vec_id % 97 (the q71 convention);
    // flag threshold 0.9 (the production-shaped verdict column)
    "q115_semantic_screen" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Dedup.semanticContaminationScreen(
          emb.where(pmod(col("vec_id"), lit(97)) =!= 0),
          emb.where(pmod(col("vec_id"), lit(97)) === 0),
          threshold = 0.9)
        .orderBy(col("vec_id").asc)
    }),
    // the same screen's over-threshold PAIRS through a standing f32
    // IVF index at nprobe = all cells — exhaustive, so the hits are
    // exactly the brute-force cross pairs over the threshold and the
    // DuckDB oracle hash-proves the probe round-trip (the q84
    // contract; index write inside the timer). Threshold 0.3 is the
    // test-scale choice: the synthetic embeddings are near-orthogonal
    // (max cross cosine ~0.47 at sf0.01), so a production 0.9 would
    // pin an always-empty result — 0.3 makes the hit path the thing
    // the hash checks
    "q116_semantic_screen_index" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val corpus = emb.where(pmod(col("vec_id"), lit(97)) =!= 0)
      val cents = Similarity.collectCentroids(
        Similarity.ivfCentroids(corpus, nlist = 16))
      val idx = ivfIndexDir(dir, "sem_screen16")
      Similarity.writeIvfIndex(corpus, idx, cents)
      Dedup.semanticContaminationHitsAgainstIndex(s, idx,
          emb.where(pmod(col("vec_id"), lit(97)) === 0),
          threshold = 0.3, nprobe = 0)
        .orderBy(col("vec_id").asc, col("eval_id").asc)
    }),
    // ---- extension tier: text analysis ----
    "q40_token_count" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"),
        TextAnalysis.subwordCount(col("text")).as("n_subwords"))
        .orderBy(col("doc_id").asc)),
    "q41_quality" -> ((s, dir) =>
      TextAnalysis.qualityFeatures(t(s, dir, "documents"))
        .orderBy(col("doc_id").asc)),
    "q42_langid" -> ((s, dir) =>
      TextAnalysis.languageId(t(s, dir, "documents"))
        .orderBy(col("doc_id").asc)),
    "q79_gopher_rules" -> ((s, dir) =>
      TextAnalysis.gopherRules(t(s, dir, "documents"))
        .orderBy(col("doc_id").asc)),
    "q43_fingerprint" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        TextAnalysis.fingerprint(col("text")).as("fingerprint"))
        .orderBy(col("doc_id").asc)),
    "q44_rolling_hash" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        TextAnalysis.rollingHash(col("text")).as("rhash"))
        .orderBy(col("doc_id").asc)),
    // ---- extension tier: multimodal ----
    "q60_repetition" -> ((s, dir) =>
      TextAnalysis.repetitionFeatures(t(s, dir, "documents"))
        .orderBy(col("doc_id").asc)),
    "q61_redact" -> ((s, dir) =>
      TextAnalysis.redact(t(s, dir, "documents"))
        .select(col("doc_id"), md5(col("redacted")).as("redacted_md5"),
          col("n_ips"), col("n_emails"))
        .orderBy(col("doc_id").asc)),
    "q47_vocabulary" -> ((s, dir) =>
      TextAnalysis.vocabulary(t(s, dir, "documents"), limit = 200)),
    "q48_top_terms" -> ((s, dir) =>
      TextAnalysis.topTermsPerDoc(t(s, dir, "documents"), k = 3)
        .orderBy(col("doc_id").asc, col("rank").asc)),
    // unigram-LM quality score (CCNet-style): vocab 512 at test scale
    // so OOV is a real signal (the production default 65536 would
    // swallow the whole sf0.01 vocabulary)
    "q104_lm_score" -> ((s, dir) =>
      TextAnalysis.lmScore(t(s, dir, "documents"), topV = 512)
        .orderBy(col("doc_id").asc)),
    // the CCNet head/middle/tail split over q104's score — global
    // rank via the distributed range-partition machinery, bucket
    // arithmetic pure integer, so the whole composition hash-matches
    "q105_lm_buckets" -> ((s, dir) =>
      Sharding.scoreBuckets(
          TextAnalysis.lmScore(t(s, dir, "documents"), topV = 512))
        .orderBy(col("doc_id").asc)),
    // the classifier-quality tier's PRODUCTION path under a fixed
    // token-keyed weight table (GPT-3-style LR filtering, scoring
    // side): explode → broadcast weight join → one per-doc aggregate
    // → sigmoid. The weights are exact binary fractions on purpose —
    // the per-doc sum is then bit-exact in any fold order, so the
    // 6-decimal rounding hash-matches DuckDB with only exp()'s
    // documented ~1-ulp boundary exposure (the q104 discipline)
    "q118_quality_score" -> ((s, dir) => {
      import s.implicits._
      QualityClassifier.score(t(s, dir, "documents"),
          QualityFixtureWeights.toDF("token", "weight"), bias = -0.25)
        .orderBy(col("doc_id").asc)
    }),
    // q118's score gated by the GPT-3 Pareto acceptance rule — the
    // paper's stochastic quality filter made deterministic: the Pareto
    // draw is inverse-CDF'd from the portable salted tick and rounded
    // to 6 decimals before the verdict, so the KEPT SET ITSELF
    // hash-matches DuckDB (the whole filter is engine-portable
    // arithmetic, the q72/q113 discipline)
    // bias +2.0 (vs q118's -0.25) on purpose: it shifts the synthetic
    // corpus' scores into the acceptance rule's ACTIVE region (~0.8),
    // so the kept set exercises both verdicts instead of reducing to
    // the near-empty Pareto tail
    "q120_pareto_accept" -> ((s, dir) => {
      import s.implicits._
      Sharding.paretoAccept(
          QualityClassifier.score(t(s, dir, "documents"),
            QualityFixtureWeights.toDF("token", "weight"), bias = 2.0))
        .orderBy(col("doc_id").asc)
    }),
    // the classifier tier END-TO-END, CCNet's actual construction
    // (arXiv:1911.00359): the unigram-LM score's head tercile is the
    // "good" seed, the tail tercile the "bad" one, an L2 logistic
    // regression distills that signal into token weights, and the
    // learned model scores the WHOLE corpus through the same portable
    // scoring path as q118. Rows-only: LBFGS weights are not
    // DuckDB-reproducible (the q38 k-means precedent); the spec pins
    // the classifier's behavior on planted classes and the scoring
    // path is q118's, oracle-proven there
    "q119_quality_classifier" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val buckets = Sharding.scoreBuckets(
        TextAnalysis.lmScore(docs, topV = 512))
      val seeds = docs.join(buckets.select(col("doc_id"), col("bucket")),
        Seq("doc_id"))
      val (w, b) = QualityClassifier.train(s,
        seeds.where(col("bucket") === 0), seeds.where(col("bucket") === 2),
        topV = 512, maxIter = 25)
      QualityClassifier.score(docs, w, b).orderBy(col("doc_id").asc)
    }),
    "q49_neardup_clusters" -> ((s, dir) =>
      Dedup.nearDupClusters(
        Dedup.minhashCandidates(t(s, dir, "documents")))
        .orderBy(col("id").asc)),
    // ---- brute-force oracle baselines for the LSH/ANN approximations ----
    // Capped to a deterministic sample (doc_id < 1000): the baselines are
    // O(n²) BY DESIGN — they exist to validate the approximate paths on a
    // sample, and an uncapped quadratic would dominate wall-clock at any
    // real SF. The cap covers all of sf0.01 and a fifth of sf0.1.
    "q62_jaccard_allpairs" -> ((s, dir) =>
      Dedup.jaccardAllPairs(
        t(s, dir, "documents").where(col("doc_id") < 1000),
        threshold = 0.5)
        .orderBy(col("id_a").asc, col("id_b").asc)),
    // overlap coefficient on the same capped sample — catches the
    // small-doc-quoted-in-large-doc family Jaccard's union denominator
    // suppresses (containment >= jaccard always, so this supersets q62
    // at the same threshold)
    "q81_containment_allpairs" -> ((s, dir) =>
      Dedup.containmentAllPairs(
        t(s, dir, "documents").where(col("doc_id") < 1000),
        threshold = 0.5)
        .orderBy(col("id_a").asc, col("id_b").asc)),
    // the containment SCALE path on the same capped sample and
    // threshold as q81 so found-pairs ⊆ q81 is directly checkable
    // (rows-only: the inverted-index candidate cut is df-dependent;
    // the exact counterpart IS q81 and q83 quantifies the gap).
    // maxDocFreq 1000 = the full sample and smallMaxShingles 4096 >
    // the sample's largest doc (~100 shingles) — neither cut bites at
    // this size, so the path is exhaustive here (q83 proves it:
    // recall 1.0); production sets real caps and reads the q83
    // disclosure
    "q82_containment_pairs" -> ((s, dir) =>
      Dedup.containmentPairs(
        t(s, dir, "documents").where(col("doc_id") < 1000),
        threshold = 0.5)
        .orderBy(col("id_a").asc, col("id_b").asc)),
    // the honesty gate at q82's exact parameters, ORACLE-CHECKED as
    // q28-style verdict bits: n_exact is q81's already-hash-checked
    // all-pairs containment arithmetic (counted), the knob columns
    // are the contract's own constants, and the recall-floor /
    // scan-ceiling verdicts are stable bits — measured recall 1.0 at
    // sf0.001/sf0.01 (the candidate cuts drop nothing at these
    // params) vs floor 0.95; scan_frac 0.092/0.096 vs ceiling 0.15.
    // Raw values stay DedupSpec-floored via Dedup.containmentRecall.
    "q83_containment_recall" -> ((s, dir) =>
      Dedup.containmentRecall(
          t(s, dir, "documents").where(col("doc_id") < 1000),
          threshold = 0.5)
        .select(col("n_exact"), col("small_max"), col("max_doc_freq"),
          col("sample_k"), col("sample_min_hits"),
          (col("recall") >= lit(0.95)).as("recall_ge_floor"),
          (col("scan_frac") <= lit(0.15)).as("scan_le_ceiling"))),
    // capped like every all-pairs oracle baseline (q62/q64/q69): O(n²)
    // by construction, it exists to validate the LSH path (q35) on a
    // sample — the sf1 scaling run measured the uncapped form at 98×
    // the sf0.1 cost, exactly the quadratic cliff the cap prevents
    "q63_cosine_allpairs" -> ((s, dir) =>
      Similarity.cosinePairsExact(
        t(s, dir, "embeddings").where(col("vec_id") < 1000),
        threshold = 0.25)
        .orderBy(col("id_a").asc, col("id_b").asc)),
    // the deduplicated corpus itself (survivors = canonical per cluster
    // + unclustered), through the exact edge set so the oracle can
    // rebuild the same fixpoint; the LSH-driven flavor is
    // Dedup.nearDupDedup (same tail, bucketed pairs)
    // cap 500 (not q64's 1000): the tail adds only an anti-join over
    // q64's machinery, so a smaller O(n²) oracle sample proves it at a
    // quarter of the pair cost
    "q74_neardup_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents").where(col("doc_id") < 500)
      Dedup.dedupByClusters(docs,
          Dedup.jaccardAllPairs(docs, threshold = 0.5), maxIter = 1000)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy(col("doc_id").asc)
    }),
    // maxIter bounds only a non-converged loop (it exits on fixpoint);
    // the oracle computes the exact recursive fixpoint, so the cap must
    // exceed any plausible component diameter in the sample
    "q64_cluster_allpairs" -> ((s, dir) =>
      Dedup.nearDupClusters(
        Dedup.jaccardAllPairs(
          t(s, dir, "documents").where(col("doc_id") < 1000),
          threshold = 0.5),
        maxIter = 1000)
        .orderBy(col("id").asc)),
    // the O(log n) large/small-star variant on the same capped edge set,
    // against the same recursive-CTE fixpoint oracle as q64 — proving
    // stars ≡ label-prop ≡ SQL fixpoint
    "q69_cluster_stars" -> ((s, dir) =>
      Dedup.connectedComponentsStars(
        Dedup.jaccardAllPairs(
          t(s, dir, "documents").where(col("doc_id") < 1000),
          threshold = 0.5))
        .orderBy(col("id").asc)),
    // recall@10 of the IVF probe path against the exact brute-force
    // baseline, ORACLE-CHECKED as q28-style verdict bits (the IVF
    // bucketing is engine-specific by design; the floor/ceiling
    // verdicts are stable bits for a fixed dataset, so the oracle
    // pins them every round and an index-quality regression fails
    // the round). nprobe/nlist = 8/64 — the partition-pruning ratio
    // a written index reads, 1/8 of cells. The testdata embeddings
    // are isotropic (no cluster structure), the ANN worst case, so
    // earning recall >= 0.9 at that ratio needs multiAssign = 8
    // boundary replication; the scan ceiling bit pins what that
    // costs (measured ~0.65 of pairs scored vs ceiling 0.8) instead
    // of hiding it. Measured recall 0.96 at sf0.001 AND sf0.01 vs
    // floor 0.9. On clustered corpora the same gate passes at
    // multiAssign = 1 with scan_frac ~ probe_frac — SimilaritySpec
    // proves both regimes, and floors the raw values directly.
    "q70_ivf_recall" -> ((s, dir) =>
      Similarity.ivfRecallStats(t(s, dir, "embeddings"),
          t(s, dir, "embeddings").where(col("vec_id") < 5),
          k = 10, nlist = 64, nprobe = 8, multiAssign = 8)
        .select(col("n_exact"), col("probe_frac"), col("multi_assign"),
          (col("recall_at_k") >= lit(0.9)).as("recall_ge_floor"),
          (col("scan_frac") <= lit(0.8)).as("scan_le_ceiling"))),
    // ---- extension tier: corpus preparation (splits + shards) ----
    "q65_hash_split" -> ((s, dir) =>
      Sharding.hashSplit(t(s, dir, "documents").select(col("doc_id")))
        .orderBy(col("doc_id").asc)),
    "q66_token_shards" -> ((s, dir) =>
      Sharding.tokenShards(t(s, dir, "documents"), budget = 2048L)
        .orderBy(col("doc_id").asc)),
    "q80_pack_bins" -> ((s, dir) =>
      Sharding.packBins(t(s, dir, "documents"), nBins = 8)
        .orderBy(col("doc_id").asc)),
    "q67_split_leakage" -> ((s, dir) =>
      Sharding.splitLeakage(t(s, dir, "documents"))
        .orderBy(col("split").asc)),
    // benchmark = a deterministic slice of the corpus (doc_id % 97) so
    // the oracle can rebuild the same eval set; hash-intersect ≡
    // string-intersect as in q62
    "q71_decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.contaminationScreen(docs,
          docs.where(pmod(col("doc_id"), lit(97)) === 0))
        .orderBy(col("doc_id").asc)
    }),
    // the COMPOSED corpus-prep pipeline (quality screen →
    // decontamination → near-dup dedup → stratified sample → packing)
    // as one oracle-checked query — every stage already has its own
    // oracle (q79/q71/q74/q72/q80); this proves the composition.
    // Capped like q74 (the dedup fixpoint is a recursive CTE); pairs =
    // the exact jaccard edge set so the oracle rebuilds the identical
    // clusters; minStopHits = 0 because the synthetic corpus has ≤ 1
    // distinct English stop word per doc (the screen still applies all
    // six other rules — n_words bites on ~half the sample)
    "q86_corpus_prep" -> ((s, dir) => {
      val docs = t(s, dir, "documents").where(col("doc_id") < 500)
      CorpusPrep.prepare(docs,
          benchmark = docs.where(pmod(col("doc_id"), lit(97)) === 0),
          minWords = 50, minStopHits = 0, maxContamination = 0.5,
          pairs = d => Dedup.jaccardAllPairs(d, threshold = 0.5),
          maxIter = 1000,
          fractions = Map("en" -> 0.3, "zh" -> 0.5))
        .orderBy(col("doc_id").asc)
    }),
    // A-ES weighted sample: top-100 by ln(u)/w with w = n_chars+1 —
    // longer documents proportionally likelier; u from the portable
    // hash, so DuckDB reproduces the exact sample (the ln is the one
    // libm call; ulp drift would need two keys within ~1e-16 to flip
    // the selection)
    "q78_weighted_sample" -> ((s, dir) =>
      Sharding.weightedSample(t(s, dir, "documents"), k = 100,
          weight = col("n_chars") + 1)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy(col("doc_id").asc)),
    "q72_stratified_sample" -> ((s, dir) =>
      Sharding.stratifiedSample(
        t(s, dir, "documents").select(col("doc_id"), col("lang")),
        strata = col("lang"),
        fractions = Map("en" -> 0.3, "zh" -> 0.5))
        .orderBy(col("doc_id").asc)),
    // exact output (sketch only prunes candidates; the recount decides),
    // so a plain GROUP BY / HAVING oracle checks it
    "q68_heavy_hitters" -> ((s, dir) =>
      TextAnalysis.heavyHitters(t(s, dir, "documents"), minCount = 500L)
        .orderBy(col("token").asc)),
    "q45_multimodal_meta" -> ((s, dir) =>
      Multimodal.mediaFromDocuments(t(s, dir, "documents"))
        .select(col("media_id"), col("meta.media_type"),
          col("meta.n_bytes"), col("meta.checksum"))
        .orderBy(col("media_id").asc)),
    "q46_frame_sample" -> ((s, dir) =>
      Multimodal.sampleFrames(
        Multimodal.decodeAndFeaturize(
          Multimodal.mediaFromDocuments(t(s, dir, "documents"))), 5)
        .orderBy(col("media_id").asc, col("frame_idx").asc)),
    // audio-metadata plumbing over the document-backed media table: the
    // fake payloads take the FakeCodec fallback (decoded_real = false,
    // engine-portable byte arithmetic → oracle-checkable); REAL WAV
    // parsing is AudioMetaSpec's job (in-test generated WAV bytes)
    "q94_audio_meta" -> ((s, dir) =>
      Multimodal.audioMetadata(
        Multimodal.mediaFromDocuments(t(s, dir, "documents")))
        .orderBy(col("media_id").asc)),
    // video container metadata (MP4 moov/mvhd walk): the document-backed
    // payloads are all non-MP4, so every row takes the deterministic
    // fallback arithmetic — which is exactly what makes the entry
    // ORACLE-checked (q94's contract for the audio modality); the REAL
    // parse path is spec-proven on in-test generated MP4 boxes
    // (VideoMetaSpec), the same division of proof as WAV/imageio
    "q99_video_meta" -> ((s, dir) =>
      Multimodal.videoMetadata(
        Multimodal.mediaFromDocuments(t(s, dir, "documents")))
        .orderBy(col("media_id").asc)),
    // the COMPOSED weekly-refresh lifecycle as a driver-gated entry:
    // two consecutive batches through Pipeline.refreshCorpus (probe →
    // drop → chunk-clean → publish → append) against one scratch index
    // root; returns the two report rows. Rows-only — the drop counts
    // descend from LSH candidate sets (xxhash bands, q32's contract) —
    // with every constituent separately oracle-checked (q30/q62/q90/
    // q95) and the composition spec-proven (CorpusRefreshSpec). The
    // scratch root is recycled between bench passes and the lifecycle
    // is resume-idempotent, so repeated runs yield identical rows.
    "q100_corpus_refresh" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val root = ivfIndexDir(dir, "refresh100")
      def week(lo: Long, hi: Long) = Pipeline.refreshCorpus(s,
        docs.where(col("doc_id") >= lo && col("doc_id") < hi),
        s"$root/idx", s"$root/corpus", jaccardThreshold = 0.5,
        chunkTokens = 10, bandBuckets = 32, pieceBuckets = 32,
        chunkBuckets = 32)
      val r1 = week(0L, 150L)
      val r2 = week(150L, 300L)
      r1.report.unionByName(r2.report)
        .orderBy(col("batch_max_id").asc)
    }),
    // incremental containment THROUGH the persisted postings index —
    // even half indexed (write inside the timer, the q84 contract),
    // odd half probed. At these exhaustive cut parameters (maxDocFreq
    // = the whole sample, smallMaxShingles above every doc) the found
    // set ≡ EXACT batch-touching containment pairs (the q82 argument),
    // which is what makes this entry ORACLE-checked: the DuckDB
    // all-pairs containment restricted to odd-touching pairs must
    // hash-match — proving the postings/ + shingles/ round-trip the
    // way q90 proves the minhash family's. 32 buckets at test scale
    // like q89.
    "q102_index_containment" -> ((s, dir) => {
      val docs = t(s, dir, "documents").where(col("doc_id") < 1000)
      val idx = ivfIndexDir(dir, "ct102")
      Dedup.writeContainmentIndex(
        docs.where(pmod(col("doc_id"), lit(2)) === 0), idx,
        postingBuckets = 32, shingleBuckets = 32)
      Dedup.containmentPairsAgainstIndex(s,
          docs.where(pmod(col("doc_id"), lit(2)) === 1), idx,
          threshold = 0.5)
        .orderBy(col("id_a").asc, col("id_b").asc)
    }),
    // the decontamination screen THROUGH the persisted benchmark
    // index — bit-identical rows to q71's inline screen (both
    // intersect the same xxhash64 shingle-hash sets), so the DuckDB
    // oracle hash-proves the hashes/ parquet round-trip the way q90
    // proves shingles/. Index write inside the timer (the q84
    // contract); 32 buckets at test scale like q89.
    "q101_contamination_index" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val idx = ivfIndexDir(dir, "bm101")
      Dedup.writeBenchmarkIndex(
        docs.where(pmod(col("doc_id"), lit(97)) === 0), idx,
        hashBuckets = 32)
      Dedup.contaminationScreenAgainstIndex(s, docs, idx)
        .orderBy(col("doc_id").asc)
    }),
    // ---- streaming tier: the flagship as a driver-gated entry ----
    // a REAL Structured Streaming run (file source, available-now,
    // watermark + append) whose emitted windows must hash-match the
    // batch dedup+count SQL — see [[streamingFlagship]]'s scaladoc for
    // why the sentinel construction makes this oracle-checkable
    "q91_streaming_flagship" -> ((s, dir) => streamingFlagship(s, dir)),
    // the decontamination screen AS A STREAM (the probe-only fifth
    // bridge, [[graft.streaming.StreamingAgg
    // .screenStreamAgainstBenchmark]]): the documents parquet replayed
    // as an available-now file stream, one file per micro-batch, each
    // batch's report appended to scratch — the unioned batches must
    // hash-match q101's DuckDB oracle (same suite subset, same rows),
    // proving the bridge adds NOTHING to the batch screen's semantics.
    // No watermark-closure sentinels needed: the bridge is stateless
    // (foreachBatch emits every batch's rows immediately), which is
    // exactly why it is the one oracle-checkable bridge
    // streaming quality scoring (the seventh bridge, probe-only):
    // the documents table streamed file-by-file and scored per
    // micro-batch under a PERSISTED fixture-weight model — the oracle
    // is q118's SQL (the stored model IS q118's exact-binary-fraction
    // fixture, so stream scoring ≡ batch scoring ≡ DuckDB)
    "q128_stream_quality" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val model = ivfIndexDir(dir, "qm128")
      graft.operators.QualityClassifier.writeModel(s,
        QualityFixtureWeights.toDF("token", "weight"), -0.25, model)
      val n = StreamScratch.seq.incrementAndGet()
      val stage = stageTableForStream(dir, "documents", "q128_stage")
      val stream = s.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stage)
        .withColumn("ts",
          lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
        .select(col("ts"), col("doc_id"), col("text"))
      val out = ivfIndexDir(dir, s"q128_out_$n")
      val q = graft.streaming.StreamingAgg
        .scoreStreamQuality(stream, model) { (b, _) =>
          b.select(col("doc_id"), col("quality_prob"))
            .write.mode("append").parquet(out)
        }
        .option("checkpointLocation", ivfIndexDir(dir, s"q128_ckpt_$n"))
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      require(q.awaitTermination(300000), "q128 stream did not finish")
      s.read.parquet(out).orderBy(col("doc_id").asc)
    }),
    // streaming DSIR scoring (the eighth bridge, probe-only): the
    // documents table streamed and scored per micro-batch under a
    // PERSISTED ratio table fitted exactly as q123 fits its in-memory
    // one — so the streamed scores share q123's DuckDB oracle
    "q131_stream_dsir" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val model = ivfIndexDir(dir, "dm131")
      Sharding.writeDsirModel(s,
        Sharding.dsirWeights(docs.where(col("lang") === "en"), docs,
          buckets = 512), 512, model)
      val n = StreamScratch.seq.incrementAndGet()
      val stage = stageTableForStream(dir, "documents", "q131_stage")
      val stream = s.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stage)
        .withColumn("ts",
          lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
        .select(col("ts"), col("doc_id"), col("text"))
      val out = ivfIndexDir(dir, s"q131_out_$n")
      val q = graft.streaming.StreamingAgg
        .scoreStreamDsir(stream, model) { (b, _) =>
          b.select(col("doc_id"), col("n_ngrams"), col("log_weight"))
            .write.mode("append").parquet(out)
        }
        .option("checkpointLocation", ivfIndexDir(dir, s"q131_ckpt_$n"))
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      require(q.awaitTermination(300000), "q131 stream did not finish")
      s.read.parquet(out).orderBy(col("doc_id").asc)
    }),
    // streaming tokenize-at-ingest (the TENTH bridge, probe-only):
    // the documents table streamed and encoded to vocabulary ids per
    // micro-batch under a PERSISTED complete model, each trigger's
    // ids decoded back to words in the sink — the streamed encode
    // must land exactly on DuckDB's independent normalization (q141's
    // round-trip statement, now through the streaming harness), so a
    // bridge whose per-trigger model read drifted, dropped, or
    // re-segmented anything hash-fails
    "q145_stream_encode" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val modelDir = ivfIndexDir(dir, "em145")
      // full alphabet coverage (the q141 note): the round trip is a
      // lifecycle statement, not a vocabulary-cap statement. The
      // trained model stays in memory for the SINK's decode (§1.2);
      // the bridge's own per-trigger model READ — the thing this
      // entry's hash is about — is untouched inside encodeStreamIds
      val model = Bpe.trainModel(docs, numMerges = 64,
        maxTypes = 1 << 20)
      Bpe.writeModel(s, model, modelDir)
      val n = StreamScratch.seq.incrementAndGet()
      val stage = stageTableForStream(dir, "documents", "q145_stage")
      val stream = s.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stage)
        .withColumn("ts",
          lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
        .select(col("ts"), col("doc_id"), col("text"))
      val out = ivfIndexDir(dir, s"q145_out_$n")
      val q = graft.streaming.StreamingAgg
        .encodeStreamIds(stream, modelDir) { (b, _) =>
          b.select(col("doc_id"),
              array_join(Bpe.decodeWords(
                Bpe.decodeIds(col("ids"), model)), " ").as("decoded"))
            .write.mode("append").parquet(out)
        }
        .option("checkpointLocation", ivfIndexDir(dir, s"q145_ckpt_$n"))
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      require(q.awaitTermination(300000), "q145 stream did not finish")
      s.read.parquet(out).orderBy(col("doc_id").asc)
    }),
    // streaming retrieval (the ninth bridge, probe-only): the q129
    // query set streamed ONE QUERY PER MICRO-BATCH against a persisted
    // BM25 index over the documents corpus — disjoint query sets rank
    // independently, so the unioned triggers hash-match q129's inline
    // DuckDB oracle (the bridge adds NOTHING to the probe's semantics)
    "q135_stream_bm25" -> ((s, dir) => {
      import s.implicits._
      val idx = ivfIndexDir(dir, "bm135")
      val qdf = Seq(
        (0, "spark hash join"),
        (1, "window sort merge"),
        (2, "stream batch dup")).toDF("query_id", "text")
      val n = StreamScratch.seq.incrementAndGet()
      val stage = ivfIndexDir(dir, s"q135_stage_$n")
      // index build and query staging are independent (disjoint
      // dirs) — overlap them (Par, guide §2.6)
      graft.operators.Par.run(2)(Seq(
        () => Retrieval.writeBm25Index(t(s, dir, "documents"), idx,
          tokenBuckets = 32, dlBuckets = 32),
        () => qdf.repartition(3, col("query_id"))
          .write.mode("overwrite").parquet(stage)))
      val stream = s.readStream.schema(qdf.schema)
        // all three staged query files in ONE trigger (guide §1.2):
        // the bridge's probe is per-query_id throughout
        // (processRetrieveBatch: topk/fuse keyed by query_id), so the
        // union over three one-file triggers is row-identical to one
        // three-file trigger — minus two micro-batch floors, each a
        // full per-trigger probe plan + index-params re-read
        .option("maxFilesPerTrigger", "3")
        .parquet(stage)
        .withColumn("ts",
          lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      val out = ivfIndexDir(dir, s"q135_out_$n")
      val q = graft.streaming.StreamingAgg
        .retrieveStream(stream, idx, k = 10) { (b, _) =>
          b.write.mode("append").parquet(out)
        }
        .option("checkpointLocation", ivfIndexDir(dir, s"q135_ckpt_$n"))
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      require(q.awaitTermination(300000), "q135 stream did not finish")
      s.read.parquet(out).orderBy(col("query_id").asc, col("rank").asc)
    }),
    // streaming HYBRID retrieval: q134's fully-persisted path (stored
    // BM25 probe + stored IVF at full probe, RRF-fused) driven through
    // the file-source bridge — each trigger fuses its own queries
    // per-query_id, so the union shares q130's brute-force oracle leg
    // for leg regardless of how the staged files batch into triggers
    "q136_stream_hybrid" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val emb = t(s, dir, "embeddings")
      val bmIdx = ivfIndexDir(dir, "bm136")
      val ivfIdx = ivfIndexDir(dir, "ivf136")
      val qdf = docs.where(col("doc_id") < 3)
        .select(col("doc_id").as("query_id"), col("text"))
        .join(emb.select(col("vec_id").as("query_id"),
          col("embedding")), Seq("query_id"))
      val n = StreamScratch.seq.incrementAndGet()
      val stage = ivfIndexDir(dir, s"q136_stage_$n")
      // the two index builds and the query staging are INDEPENDENT
      // (disjoint inputs-to-disjoint-dirs, no shared standing state),
      // so they overlap (Par, guide §2.6) instead of summing three
      // serial job-floor chains before the stream can even start
      graft.operators.Par.run(3)(Seq(
        () => Retrieval.writeBm25Index(docs, bmIdx, tokenBuckets = 32,
          dlBuckets = 32),
        () => Similarity.writeIvfIndex(emb, ivfIdx,
          Similarity.collectCentroids(
            Similarity.ivfCentroids(emb, nlist = 16))),
        () => qdf.repartition(3, col("query_id"))
          .write.mode("overwrite").parquet(stage)))
      val stream = s.readStream.schema(qdf.schema)
        // one three-file trigger, not three one-file triggers — the
        // q135 fold note applies verbatim (per-query_id probe + fuse,
        // union-identical output, two per-trigger hybrid plans saved)
        .option("maxFilesPerTrigger", "3")
        .parquet(stage)
        .withColumn("ts",
          lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      val out = ivfIndexDir(dir, s"q136_out_$n")
      val q = graft.streaming.StreamingAgg
        .retrieveStream(stream, bmIdx, ivfDir = Some(ivfIdx), k = 10,
          kEach = 20, excludeSelf = true, nprobe = 16) { (b, _) =>
          b.write.mode("append").parquet(out)
        }
        .option("checkpointLocation", ivfIndexDir(dir, s"q136_ckpt_$n"))
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      require(q.awaitTermination(300000), "q136 stream did not finish")
      s.read.parquet(out).orderBy(col("query_id").asc, col("rank").asc)
    }),
    "q110_stream_screen" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val idx = ivfIndexDir(dir, "bm108")
      Dedup.writeBenchmarkIndex(
        docs.where(pmod(col("doc_id"), lit(97)) === 0), idx,
        hashBuckets = 32)
      val n = StreamScratch.seq.incrementAndGet()
      val stage = stageTableForStream(dir, "documents", "q110_stage")
      val schema = docs.schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stage)
        .withColumn("ts",
          lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
        .select(col("ts"), col("doc_id"), col("text"))
      // fresh per run: an appended-to scratch or a reused checkpoint
      // would duplicate (or skip) batches across bench passes
      val out = ivfIndexDir(dir, s"q110_out_$n")
      val q = graft.streaming.StreamingAgg
        .screenStreamAgainstBenchmark(stream, idx) { (b, _) =>
          b.select(col("doc_id"), col("n_shingles"),
              col("n_contaminated"), col("contaminated_frac"))
            .write.mode("append").parquet(out)
        }
        .option("checkpointLocation", ivfIndexDir(dir, s"q110_ckpt_$n"))
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      require(q.awaitTermination(300000), "q110 stream did not finish")
      s.read.parquet(out).orderBy(col("doc_id").asc)
    }),
    // the SEMANTIC screen AS A STREAM (the probe-only sixth bridge,
    // [[graft.streaming.StreamingAgg.screenStreamSemantic]]): the
    // embeddings parquet replayed as an available-now file stream, each
    // micro-batch's vectors scored against the q115 eval slice staged
    // to a plain parquet dir — the unioned batches must hash-match
    // q115's DuckDB oracle (same eval set, same rows), proving the
    // bridge adds NOTHING to the batch screen's semantics. Stateless
    // like q110, which is what makes it oracle-checkable
    "q117_stream_semantic" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val n = StreamScratch.seq.incrementAndGet()
      val evalDir = ivfIndexDir(dir, "q117_eval")
      emb.where(pmod(col("vec_id"), lit(97)) === 0)
        .select(col("vec_id"), col("embedding"))
        .write.mode("overwrite").parquet(evalDir)
      val stage = stageTableForStream(dir, "embeddings", "q117_stage")
      val stream = s.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stage)
        .where(pmod(col("vec_id"), lit(97)) =!= 0)
        .withColumn("ts",
          lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
        .select(col("ts"), col("vec_id"), col("embedding"))
      val out = ivfIndexDir(dir, s"q117_out_$n")
      val q = graft.streaming.StreamingAgg
        .screenStreamSemantic(stream, evalDir, threshold = 0.9) {
          (b, _) =>
            b.select(col("vec_id"), col("max_cosine"),
                col("nearest_eval_id"), col("contaminated"))
              .write.mode("append").parquet(out)
        }
        .option("checkpointLocation", ivfIndexDir(dir, s"q117_ckpt_$n"))
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      require(q.awaitTermination(300000), "q117 stream did not finish")
      s.read.parquet(out).orderBy(col("vec_id").asc)
    })
  )

  /** The file-stream sources above need a DIRECTORY of part files;
    * driver testdata may be one plain parquet file — stage part files
    * into per-process scratch (deterministic contents: re-copies are
    * byte-identical, so repeated bench passes restage harmlessly).
    */
  private def stageTableForStream(dir: String, table: String,
      name: String): String = {
    import java.nio.file.{Files, Path, Paths, StandardCopyOption}
    val st = Paths.get(ivfIndexDir(dir, name))
    Files.createDirectories(st)
    val src = Paths.get(s"$dir/$table.parquet")
    val parts =
      if (Files.isDirectory(src)) {
        val l = Files.list(src)
        try l.toArray.map(_.asInstanceOf[Path])
          .filter(_.getFileName.toString.endsWith(".parquet")).sorted
        finally l.close()
      } else Array(src)
    parts.foreach(p => Files.copy(p, st.resolve(p.getFileName),
      StandardCopyOption.REPLACE_EXISTING))
    st.toString
  }

  // ------------------------------------------- shared bench fixture

  /** ONE corpus+model+export lifecycle tree per bench SAMPLE, shared
    * by the composed-lifecycle bench entries below (the r18 verdict's
    * once-tier consolidation): q146/q147/q149/q150/q151 each used to
    * bootstrap a near-identical tree INSIDE their own timers, so the
    * once tier paid ~5× the same build per sample with no extra
    * timing signal. [[graft.Bench]] now times this build once per
    * sample (reported as its own `fixture_lifecycle` line) and then
    * times each entry's SURFACE against the standing tree via
    * [[benchFixtureSurfaces]]. Correctness is untouched: the entries
    * in [[queries]] stay self-contained and oracle-checked by Verify.
    *
    * The tree is q151's lifecycle at q151's knobs: train the 64-merge
    * tokenizer on the full slice (later batches stay in-alphabet),
    * publish the first batch through the refresh (creating the three
    * index families at the 32-bucket test geometry), bootstrap the
    * shard export from the published corpus. */
  def buildBenchFixture(s: SparkSession, dir: String): String = {
    val docs = t(s, dir, "documents")
      .where(col("doc_id") < 1000)
      .select(col("doc_id"), col("text"))
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
    val b0 = math.min(300L, maxId / 2 + 1)
    val n = StreamScratch.seq.incrementAndGet()
    val root = ivfIndexDir(dir, s"fix_$n")
    docs.write.mode("overwrite").parquet(s"$root/seed/corpus")
    // ONE model threads both chains (the writeTrainingShardsWith
    // seam): the five export/refresh steps below used to re-read the
    // same just-trained model from disk. BpeModel is immutable, so
    // sharing it across the Par threads is safe.
    val model = Pipeline.trainBpeModelReturning(s, s"$root/seed",
      s"$root/model", numMerges = 64, maxTypes = 1 << 20)
    // two INDEPENDENT lifecycle chains hang off the trained model —
    // the refresh-published tree (q146/q147/q150/q151's surfaces) and
    // q149's compaction target over its own raw-batch corpus — and
    // they touch disjoint directories, so they run concurrently
    // ([[graft.operators.Par]], guide §2.6): the second chain's jobs
    // back-fill the executors the first chain's many small actions
    // leave idle
    val (_, t1, t2) = fixtureCuts(maxId)
    graft.operators.Par.run(2)(Seq(
      () => {
        docs.where(col("doc_id") < b0).write.mode("overwrite")
          .parquet(s"$root/batch_0")
        Pipeline.refreshCorpus(s,
          s.read.parquet(s"$root/batch_0"), s"$root/idx",
          s"$root/corpus", jaccardThreshold = 0.5, chunkTokens = 10,
          bandBuckets = 32, pieceBuckets = 32, chunkBuckets = 32,
          tokenizerModelDir = Some(s"$root/model"),
          tokenizerModel = Some(model))
        Pipeline.writeTrainingShardsWith(s, s"$root/corpus",
          s"$root/model", s"$root/shards", seqLen = 64, numShards = 4,
          eos = true, mode = "overwrite", modelOpt = Some(model))
      },
      // q149's compaction TARGET, built here so its surface times only
      // the compaction + read-back: a second export over raw batch
      // slices (the q149 entry's own corpus shape) — bootstrap, then
      // two 2-doc cron appends whose short tail packs give the merge a
      // guaranteed adjacent candidate run
      () => {
        docs.where(col("doc_id") < t1).write.mode("overwrite")
          .parquet(s"$root/c2/corpus/batch_id=0")
        Pipeline.writeTrainingShardsWith(s, s"$root/c2",
          s"$root/model", s"$root/shards_tails", seqLen = 64,
          numShards = 4, eos = true, mode = "overwrite",
          modelOpt = Some(model))
        Seq((t1, t2), (t2, maxId + 1)).foreach { case (lo, hi) =>
          docs.where(col("doc_id") >= lo && col("doc_id") < hi)
            .write.mode("overwrite")
            .parquet(s"$root/c2/corpus/batch_id=$lo")
          Pipeline.writeTrainingShardsWith(s, s"$root/c2",
            s"$root/model", s"$root/shards_tails", seqLen = 64,
            numShards = 4, eos = true, mode = "append",
            modelOpt = Some(model))
        }
      }))
    root
  }

  /** The fixture batch cuts, ONE definition: the first publish covers
    * `doc_id < b0`, the q150 surface appends `[b0, t1)`, and the q149
    * surface appends the two 2-doc tails `[t1, t2)` / `[t2, maxId]`
    * whose short packs give its compaction a guaranteed adjacent
    * candidate run. */
  private def fixtureCuts(maxId: Long): (Long, Long, Long) =
    (math.min(300L, maxId / 2 + 1), maxId - 3, maxId - 1)

  /** Surface-only bench passes over a [[buildBenchFixture]] tree, in
    * MUTATION-SAFE order (the read-only surveys first, then the
    * appending refresh, then the compaction that consumes the
    * appended tails — the real cron order). Each surface's plan is
    * its [[queries]] entry's final surface over the shared tree; the
    * build cost those entries used to repay per-sample lives in the
    * `fixture_lifecycle` line instead. Args: (session, sfDir,
    * fixtureRoot). */
  def benchFixtureSurfaces:
      Seq[(String, (SparkSession, String, String) => DataFrame)] = Seq(
    // q151's surface: the four-surface fsck survey (read-only,
    // metadata-priced — exactly what the entry claims to price)
    ("q151_fsck_lifecycle", (s: SparkSession, _: String,
        root: String) =>
      Seq("idx", "corpus", "model", "shards")
        .map(sub => graft.operators.Fsck.checkDf(s, s"$root/$sub")
          .withColumn("surface", lit(sub)))
        .reduce(_.unionByName(_))
        .agg(
          count(when(col("level") === "error", 1)).as("n_error"),
          count(when(col("level") === "warn", 1)).as("n_warn"),
          count(when(col("level") === "ok" &&
            col("detail").contains("index: layout consistent"), 1))
            .as("n_index_ok"),
          (count(when(col("level") === "ok" && col("detail")
            .contains("healthy complete BPE tokenizer model"), 1))
            === 1).as("model_ok"),
          (count(when(col("level") === "ok" && col("detail")
            .contains("healthy training-shards export"), 1)) === 1)
            .as("shards_ok"),
          (count(when(col("surface") === "corpus", 1)) === 0)
            .as("corpus_quiet"))),
    // q147's surface: the metadata-priced stats survey (read-only)
    ("q147_stats_shards", (s: SparkSession, _: String,
        root: String) =>
      Pipeline.statsTrainingShards(s, s"$root/shards")
        .select(col("pack"), col("n_sequences"), col("n_ids"),
          col("n_short"), col("padding_waste"), col("shard_spread"),
          col("layout_gen"))
        .orderBy(col("pack").asc)),
    // q146's surface: the FULL artifact audit (read-only; the
    // corpus-∝ reconstruct+decode+diff that dominates its entry —
    // the repair half of its lifecycle stays priced by q142's own
    // tree and the sf1 appendix)
    ("q146_audit_shards", (s: SparkSession, _: String,
        root: String) =>
      Pipeline.auditTrainingShards(s, s"$root/shards",
          s"$root/model", s"$root/corpus")
        .select(col("n_docs"), col("n_mismatched"),
          concat_ws(",", col("mismatched_doc_ids"))
            .as("mismatched_doc_ids"),
          col("n_bad"), col("n_unk"), col("n_word_merge_risk"),
          col("n_unterminated"))),
    // q150's surface: ONE follow-the-corpus cron line (pre-flight +
    // publish + knob-inert append) plus the audit that closes it —
    // the honest incremental price of the composed refresh
    ("q150_refresh_shards", (s: SparkSession, dir: String,
        root: String) => {
      val docs = t(s, dir, "documents")
        .where(col("doc_id") < 1000)
        .select(col("doc_id"), col("text"))
      val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
      val (b0, t1, _) = fixtureCuts(maxId)
      docs.where(col("doc_id") >= b0 && col("doc_id") < t1)
        .write.mode("overwrite").parquet(s"$root/batch_1")
      CorpusMain.run(s, List("refresh", s"$root/batch_1",
        s"$root/idx", s"$root/corpus", s"tokenizer=$root/model",
        s"shards=$root/shards"))
      Pipeline.auditTrainingShards(s, s"$root/shards",
          s"$root/model", s"$root/corpus")
        .select(col("n_mismatched"),
          concat_ws(",", col("mismatched_doc_ids"))
            .as("mismatched_doc_ids"),
          col("n_bad"), col("n_unk"), col("n_word_merge_risk"),
          col("n_unterminated"))
    }),
    // q149's surface: the compaction itself (minFill 0.97 makes the
    // ~300-id-per-doc tail packs candidates — the default 0.9 is
    // tuned for production pack sizes, and a no-op merge would time
    // nothing) plus the read-back decode proof over the whole
    // artifact; the target export with its two short tail packs is
    // the fixture's (so the timer holds ONLY this entry's claim)
    ("q149_compacted_export", (s: SparkSession, _: String,
        root: String) => {
      Pipeline.compactTrainingShards(s, s"$root/shards_tails",
        minFill = 0.97)
      val model = Bpe.readFullModel(s, s"$root/model")
      val (seqs, _) = Pipeline.readTrainingShardsWith(s,
        s"$root/shards_tails", strict = true,
        model = Some(s"$root/model" -> model))
      Sharding.reconstructDocs(seqs,
          eosId = Some(Bpe.eosIdOf(model)))
        .select(col("doc_id"),
          array_join(Bpe.decodeWords(
            Bpe.decodeIds(col("ids"), model)), " ").as("decoded"))
        .orderBy(col("doc_id").asc)
    }))

  // ------------------------------------------------------------- oracle

  def oracleSql: Map[String, String] = {
    val updateJoinSql =
      s"""SELECT day, event_type, cnt,
         |  CASE WHEN dim.slug IS NOT NULL THEN cnt * dim.factor
         |       ELSE 0.0 END AS count_amplified
         |FROM (${flagshipCountsSql(5)}) agg
         |LEFT JOIN (VALUES ('click', 41.0), ('purchase', 556.9),
         |                  ('error', 6.3), ('view', CAST(NULL AS DOUBLE)))
         |  dim(slug, factor) ON agg.event_type = dim.slug
         |ORDER BY day DESC, event_type ASC""".stripMargin
    Map(
      "q01_flagship" -> updateJoinSql,
      "q02_project_trunc" ->
        s"""SELECT * FROM ($eventTuplesSql) t
           |ORDER BY day, user_id, event_type, k""".stripMargin,
      "q03_tuple_distinct" ->
        s"""SELECT DISTINCT * FROM ($eventTuplesSql) t
           |ORDER BY day, user_id, event_type, k""".stripMargin,
      "q04_group_count" ->
        s"""SELECT * FROM (${flagshipCountsSql(-1)}) t
           |ORDER BY day, event_type""".stripMargin,
      "q05_having" ->
        s"""SELECT * FROM (${flagshipCountsSql(5)}) t
           |ORDER BY day, event_type""".stripMargin,
      "q06_sort_mixed" ->
        s"""SELECT * FROM (${flagshipCountsSql(5)}) t
           |ORDER BY day DESC, event_type ASC""".stripMargin,
      "q07_update_join" -> updateJoinSql,
      "q08_count_star" -> "SELECT count(*) AS n FROM events",
      // the STREAMING flagship's closed windows ≡ the batch dedup+count
      // plan (window start = day truncation under the shared UTC
      // session) — the sentinel construction closes every real window,
      // so this checks a genuine Structured Streaming run against SQL
      "q91_streaming_flagship" ->
        """SELECT day, event_type, count(*) AS cnt
          |FROM (SELECT DISTINCT date_trunc('day', ts) AS day, user_id,
          |        event_type
          |      FROM events) d
          |GROUP BY day, event_type
          |ORDER BY day, event_type""".stripMargin,
      "q09_cube_week" -> cubeAtSql("week"),
      "q10_cube_month" -> cubeAtSql("month"),
      "q11_cube_quarter" -> cubeAtSql("quarter"),
      "q12_cube_year" -> cubeAtSql("year"),
      "q13_cube_sentinel" ->
        s"""SELECT date, coalesce(risk, 100) AS risk,
           |       coalesce(country, 'T') AS country, count
           |FROM (${cubeAtSql("month")
                     .replaceAll("ORDER BY[\\s\\S]*", "")}) c
           |ORDER BY date DESC NULLS FIRST, country ASC, risk ASC,
           |         count ASC""".stripMargin,
      "q14_dim_date" ->
        """SELECT date, CAST(EXTRACT(month FROM date) AS INT) AS month,
          |       CAST(EXTRACT(year FROM date) AS INT) AS year,
          |       CAST(EXTRACT(quarter FROM date) AS INT) AS quarter,
          |       CAST(EXTRACT(week FROM date) AS INT) AS week,
          |       CAST(date_trunc('week', date) AS DATE) AS week_start,
          |       CAST(date_trunc('week', date) AS DATE) + 6 AS week_end
          |FROM (SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS date
          |      FROM events) d
          |ORDER BY date""".stripMargin,
      "q15_distinct_dates" ->
        """SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS date
          |FROM events ORDER BY date""".stripMargin,
      "q16_anti_join" ->
        """SELECT DISTINCT user_id FROM events e
          |WHERE user_id IS NOT NULL
          |  AND NOT EXISTS (SELECT 1 FROM customer c
          |                  WHERE c.c_custkey = e.user_id)
          |ORDER BY user_id""".stripMargin,
      "q17_anti_dedup_firstwins" ->
        """SELECT user_id, coalesce(event_type, 'XY') AS event_type
          |FROM (
          |  SELECT user_id, event_type,
          |         row_number() OVER (PARTITION BY user_id
          |                            ORDER BY event_type ASC NULLS LAST)
          |           AS rn
          |  FROM (SELECT DISTINCT user_id, event_type FROM events
          |        WHERE user_id IS NOT NULL) p
          |  WHERE NOT EXISTS (SELECT 1 FROM supplier s
          |                    WHERE s.s_suppkey = p.user_id)) r
          |WHERE rn = 1 ORDER BY user_id""".stripMargin,
      "q18_scalar_dates" ->
        """SELECT event_id, CAST(date_trunc('day', ts) AS DATE) AS day,
          |       CAST(EXTRACT(month FROM ts) AS INT) AS m,
          |       CAST(EXTRACT(year FROM ts) AS INT) AS y,
          |       CAST(EXTRACT(quarter FROM ts) AS INT) AS q,
          |       CAST(EXTRACT(week FROM ts) AS INT) AS w,
          |       CAST(ts AS DATE) + 6 AS plus6,
          |       value * 1.5 AS scaled
          |FROM events ORDER BY event_id""".stripMargin,
      "q19_join_broadcast" ->
        """SELECT c_mktsegment, count(*) AS n_orders,
          |  CAST(sum(CAST(round(o_totalprice * 10000) AS BIGINT))
          |       AS BIGINT) AS revenue_bp
          |FROM orders JOIN customer ON o_custkey = c_custkey
          |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
      "q20_multiway_join" ->
        """SELECT c_mktsegment,
          |  CAST(EXTRACT(month FROM o_orderdate) AS INT) AS order_month,
          |  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
          |                AS BIGINT)) AS BIGINT) AS revenue_bp,
          |  count(*) AS n_lines
          |FROM lineitem
          |JOIN orders ON l_orderkey = o_orderkey
          |JOIN customer ON o_custkey = c_custkey
          |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
      "q21_window_topk" ->
        """SELECT c_mktsegment, o_orderkey, o_totalprice,
          |       CAST(rank AS INT) AS rank FROM (
          |  SELECT c_mktsegment, o_orderkey, o_totalprice,
          |         row_number() OVER (PARTITION BY c_mktsegment
          |           ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
          |  FROM orders JOIN customer ON o_custkey = c_custkey) t
          |WHERE rank <= 3 ORDER BY c_mktsegment, rank""".stripMargin,
      "q22_window_running" ->
        """SELECT o_custkey, o_orderkey, o_orderdate,
          |  CAST(round(o_totalprice * 100) AS BIGINT) AS price_c,
          |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
          |    OVER (PARTITION BY o_custkey
          |          ORDER BY o_orderdate ASC, o_orderkey ASC
          |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          |    AS BIGINT) AS running_c,
          |  lag(o_orderkey, 1) OVER (PARTITION BY o_custkey
          |    ORDER BY o_orderdate ASC, o_orderkey ASC) AS prev_order
          |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
      "q23_set_ops" ->
        """SELECT 'intersect' AS op, id FROM
          |  (SELECT user_id AS id FROM events
          |   INTERSECT SELECT c_custkey FROM customer) a
          |UNION ALL
          |SELECT 'except' AS op, id FROM
          |  (SELECT user_id AS id FROM events
          |   EXCEPT SELECT c_custkey FROM customer) b
          |ORDER BY op, id""".stripMargin,
      "q24_tpch_q1" ->
        """SELECT l_returnflag, l_linestatus,
          |  sum(l_quantity) AS sum_qty,
          |  CAST(sum(CAST(round(l_extendedprice * 10000) AS BIGINT))
          |       AS BIGINT) AS sum_base_bp,
          |  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
          |                AS BIGINT)) AS BIGINT) AS sum_disc_bp,
          |  count(*) AS count_order
          |FROM lineitem
          |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
          |GROUP BY l_returnflag, l_linestatus
          |ORDER BY l_returnflag, l_linestatus""".stripMargin,
      // the HLL sketch value never hash-compares across engines, but
      // its error bound does: exact per-group distincts from DuckDB
      // next to the pinned 3-sigma (3x rsd=0.05) verdict bit — see
      // the entry for why the margin is 15%, not the rsd itself
      "q28_approx_distinct" ->
        """SELECT event_type,
          |  CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
          |  true AS within_3rsd
          |FROM events GROUP BY event_type
          |ORDER BY event_type""".stripMargin,
      "q27_sessionize" ->
        """SELECT user_id, session_id, min(ts) AS session_start,
          |       max(ts) AS session_end, count(*) AS n_events
          |FROM (
          |  SELECT user_id, ts,
          |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          |      AS BIGINT) AS session_id
          |  FROM (
          |    SELECT user_id, ts,
          |      CASE WHEN prev_ts IS NULL
          |                OR date_diff('second', prev_ts, ts) > 3600
          |           THEN 1 ELSE 0 END AS new_session
          |    FROM (
          |      SELECT user_id, ts,
          |        lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
          |          AS prev_ts
          |      FROM (SELECT DISTINCT user_id, ts FROM events) d) a) b) c
          |GROUP BY user_id, session_id
          |ORDER BY user_id, session_id""".stripMargin,
      "q50_rollup" ->
        """SELECT event_type, CAST(EXTRACT(month FROM ts) AS INT) AS m,
          |  count(*) AS cnt,
          |  CAST(GROUPING(event_type) AS INT) AS g_type,
          |  CAST(GROUPING(EXTRACT(month FROM ts)) AS INT) AS g_month
          |FROM events
          |GROUP BY ROLLUP(event_type, EXTRACT(month FROM ts))
          |ORDER BY g_type ASC, g_month ASC,
          |         event_type ASC NULLS FIRST, m ASC NULLS FIRST"""
          .stripMargin,
      "q51_grouping_sets" ->
        """SELECT event_type, CAST(EXTRACT(month FROM ts) AS INT) AS m,
          |       count(*) AS cnt
          |FROM events
          |GROUP BY GROUPING SETS ((event_type), (EXTRACT(month FROM ts)))
          |ORDER BY event_type ASC NULLS FIRST, m ASC NULLS FIRST"""
          .stripMargin,
      "q52_pivot" ->
        """SELECT user_id,
          |  count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
          |  count(CASE WHEN event_type = 'error' THEN 1 END) AS error,
          |  count(CASE WHEN event_type = 'purchase' THEN 1 END)
          |    AS purchase,
          |  count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
          |  count(CASE WHEN event_type = 'view' THEN 1 END) AS view
          |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
      "q53_range_join" ->
        """SELECT band, count(*) AS n,
          |  CAST(sum(CAST(round(o_totalprice * 10000) AS BIGINT))
          |       AS BIGINT) AS total_bp
          |FROM orders
          |JOIN (VALUES (0.0, 50000.0, 'low'), (50000.0, 150000.0, 'mid'),
          |             (150000.0, 1000000000.0, 'high')) bands(lo, hi,
          |               band)
          |  ON o_totalprice >= lo AND o_totalprice < hi
          |GROUP BY band ORDER BY band""".stripMargin,
      "q73_range_bucketed" ->
        """SELECT band, count(*) AS n,
          |  CAST(sum(CAST(round(o_totalprice * 10000) AS BIGINT))
          |       AS BIGINT) AS total_bp
          |FROM orders
          |JOIN (VALUES (0.0, 50000.0, 'low'), (50000.0, 150000.0, 'mid'),
          |             (150000.0, 1000000000.0, 'high')) bands(lo, hi,
          |               band)
          |  ON o_totalprice >= lo AND o_totalprice < hi
          |GROUP BY band ORDER BY band""".stripMargin,
      "q54_asof_join" ->
        """SELECT event_id, user_id, ts, o_orderkey, o_orderdate FROM (
          |  SELECT e.event_id, e.user_id, e.ts, o.o_orderkey,
          |         o.o_orderdate,
          |    row_number() OVER (PARTITION BY e.event_id
          |      ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
          |  FROM events e
          |  JOIN orders o ON e.user_id = o.o_custkey
          |                AND o.o_orderdate <= e.ts) t
          |WHERE rn = 1 ORDER BY event_id""".stripMargin,
      "q55_asof_bucketed" ->
        """SELECT event_id, user_id, ts, o_orderkey, o_orderdate FROM (
          |  SELECT e.event_id, e.user_id, e.ts, o.o_orderkey,
          |         o.o_orderdate,
          |    row_number() OVER (PARTITION BY e.event_id
          |      ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
          |  FROM events e
          |  JOIN orders o ON e.user_id = o.o_custkey
          |                AND o.o_orderdate <= e.ts) t
          |WHERE rn = 1 ORDER BY event_id""".stripMargin,
      "q57_except_all" ->
        """SELECT id, count(*) AS n FROM (
          |  SELECT user_id AS id FROM events
          |  EXCEPT ALL
          |  SELECT c_custkey FROM customer) t
          |GROUP BY id ORDER BY id""".stripMargin,
      "q58_semi_join" ->
        """SELECT event_type, count(*) AS n,
          |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
          |    AS value_c
          |FROM events e
          |WHERE EXISTS (SELECT 1 FROM customer c
          |              WHERE c.c_custkey = e.user_id)
          |GROUP BY event_type ORDER BY event_type""".stripMargin,
      "q59_scalar_subquery" ->
        """SELECT o_orderpriority, count(*) AS n
          |FROM orders
          |WHERE CAST(round(o_totalprice * 100) AS BIGINT) >
          |  (SELECT CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
          |          // count(*) AS BIGINT) FROM orders)
          |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
      "q56_percentiles" ->
        """SELECT l_returnflag,
          |  quantile_cont(l_quantity, 0.5) AS median_qty,
          |  round(quantile_cont(l_quantity, 0.9), 6) AS p90_qty,
          |  count(*) AS n
          |FROM lineitem GROUP BY l_returnflag
          |ORDER BY l_returnflag""".stripMargin,
      "q25_csv_feed" ->
        """SELECT day, risk, country, asn, count(*) AS count
          |FROM (SELECT DISTINCT
          |        date_trunc('day',
          |          CAST(strptime(substr(ts, 1, 19), '%Y-%m-%dT%H:%M:%S')
          |               AS TIMESTAMP)) AS day,
          |        ip, risk_id AS risk, asn, cc AS country
          |      FROM read_csv('/root/repo/fixtures/logentry.csv.gz',
          |        header=true,
          |        columns={'ts':'VARCHAR','ip':'VARCHAR','risk_id':'INT',
          |                 'asn':'BIGINT','cc':'VARCHAR'})) t
          |GROUP BY day, risk, country, asn
          |ORDER BY day DESC, country ASC, asn ASC, risk ASC""".stripMargin,
      "q30_dedup_exact_groups" ->
        """SELECT md5(regexp_replace(lower(text), '[ \t\n\r\f\x0B]+', ' ', 'g'))
          |         AS fingerprint,
          |       min(doc_id) AS canonical_id, count(*) AS n_copies
          |FROM documents GROUP BY 1 ORDER BY fingerprint""".stripMargin,
      "q31_dedup_exact_rows" ->
        """SELECT d.doc_id, d.lang, d.n_chars FROM documents d
          |JOIN (SELECT min(doc_id) AS m FROM documents
          |      GROUP BY md5(regexp_replace(lower(text), '[ \t\n\r\f\x0B]+', ' ', 'g')))
          |  g ON d.doc_id = g.m
          |ORDER BY d.doc_id""".stripMargin,
      // chunk dedup: 10-token windows, first (doc_id, idx) occurrence
      // survives; string partition ≡ Spark's md5 key up to collisions
      "q87_chunk_dedup" -> chunkDedupSql(10),
      "q92_chunk_dedup50" -> chunkDedupSql(50),
      // the incremental-index runs must equal the FULL-corpus dedup
      // restricted to the batch rows (monotone-id contract): the oracle
      // IS the full-run SQL with the batch restriction applied outside
      "q95_index_chunk_dedup" ->
        s"""SELECT * FROM (
           |${chunkDedupSql(10)}
           |) full_run WHERE doc_id >= 250 ORDER BY doc_id""".stripMargin,
      "q96_index_cdc_chunk_dedup" ->
        s"""SELECT * FROM (
           |${cdcChunkDedupSql(8)}
           |) full_run WHERE doc_id >= 250 ORDER BY doc_id""".stripMargin,
      "q121_line_dedup" -> lineDedupSql,
      "q122_index_line_dedup" ->
        s"""SELECT * FROM (
           |$lineDedupSql
           |) full_run WHERE doc_id >= 250 ORDER BY doc_id""".stripMargin,
      "q88_cdc_chunk_dedup" -> cdcChunkDedupSql(8),
      "q93_cdc_chunk_dedup50" -> cdcChunkDedupSql(50),
      "q36_ann_quantized_topk" ->
        """SELECT query_id, vec_id, CAST(dot AS BIGINT) AS dot,
          |       CAST(rank AS INT) AS rank FROM (
          |  SELECT q.vec_id AS query_id, v.vec_id AS vec_id,
          |    list_sum(list_transform(generate_series(1, len(q.embedding)),
          |      i -> CAST(round(CAST(q.embedding[i] AS DOUBLE) * 1000)
          |             AS BIGINT)
          |         * CAST(round(CAST(v.embedding[i] AS DOUBLE) * 1000)
          |             AS BIGINT))) AS dot,
          |    row_number() OVER (PARTITION BY q.vec_id
          |      ORDER BY list_sum(list_transform(
          |          generate_series(1, len(q.embedding)),
          |          i -> CAST(round(CAST(q.embedding[i] AS DOUBLE) * 1000)
          |                 AS BIGINT)
          |             * CAST(round(CAST(v.embedding[i] AS DOUBLE) * 1000)
          |                 AS BIGINT)))
          |        DESC, v.vec_id ASC) AS rank
          |  FROM embeddings q JOIN embeddings v ON q.vec_id != v.vec_id
          |  WHERE q.vec_id < 5) t
          |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
      "q40_token_count" ->
        """SELECT doc_id,
          |  CAST(len(list_filter(string_split(text, ' '), x -> x != ''))
          |       AS INT) AS n_tokens,
          |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9]{1,4}'))
          |       AS INT) AS n_subwords
          |FROM documents ORDER BY doc_id""".stripMargin,
      "q41_quality" ->
        """SELECT doc_id, CAST(length(text) AS INT) AS n_chars,
          |  CAST(len(list_filter(string_split(text, ' '), x -> x != ''))
          |       AS INT) AS n_tokens,
          |  CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS INT)
          |    AS n_punct,
          |  CAST(len(regexp_extract_all(lower(text),
          |    '\b(the|and|of|to|a|in|is|it)\b')) AS INT) AS n_stopwords
          |FROM documents ORDER BY doc_id""".stripMargin,
      "q42_langid" -> langIdSql,
      "q79_gopher_rules" ->
        // integer counts with the exact split/regex semantics of the
        // Spark side (explicit-whitespace-class tokens with empties
        // dropped — see TextAnalysis.WsPattern; lines on \n;
        // ratios = BIGINT/BIGINT IEEE division)
        s"""WITH ${gopherCteSql("")},
          |r AS (
          |  SELECT doc_id, n_words,
          |    CASE WHEN n_words = 0 THEN 0.0
          |         ELSE wchars::DOUBLE / n_words END AS mean_word_len,
          |    CASE WHEN n_words = 0 THEN 0.0
          |         ELSE nsym::DOUBLE / n_words END AS symbol_ratio,
          |    CASE WHEN n_lines = 0 THEN 0.0
          |         ELSE n_bullet::DOUBLE / n_lines END AS bullet_frac,
          |    CASE WHEN n_lines = 0 THEN 0.0
          |         ELSE n_ellipsis::DOUBLE / n_lines END
          |      AS ellipsis_frac,
          |    CASE WHEN n_words = 0 THEN 0.0
          |         ELSE n_alpha::DOUBLE / n_words END AS alpha_frac,
          |    n_stop_hits
          |  FROM c)
          |SELECT doc_id, n_words, mean_word_len, symbol_ratio,
          |  bullet_frac, ellipsis_frac, alpha_frac, n_stop_hits,
          |  (n_words >= 50 AND n_words <= 100000
          |   AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
          |   AND symbol_ratio <= 0.1 AND bullet_frac <= 0.9
          |   AND ellipsis_frac <= 0.3 AND alpha_frac >= 0.8
          |   AND n_stop_hits >= 2) AS keep
          |FROM r ORDER BY doc_id""".stripMargin,
      "q43_fingerprint" ->
        """SELECT doc_id,
          |  md5(regexp_replace(lower(text), '[ \t\n\r\f\x0B]+', ' ', 'g'))
          |    AS fingerprint
          |FROM documents ORDER BY doc_id""".stripMargin,
      "q60_repetition" ->
        """WITH base AS (
          |  SELECT doc_id,
          |    list_filter(string_split(
          |      regexp_replace(lower(text), '[ \t\n\r\f\x0B]+', ' ', 'g'), ' '),
          |      x -> x != '') AS toks
          |  FROM documents),
          |bg AS (
          |  SELECT doc_id, toks,
          |    list_transform(generate_series(1, len(toks) - 1),
          |      i -> toks[i] || ' ' || toks[i + 1]) AS bigrams
          |  FROM base)
          |SELECT doc_id,
          |  CAST(len(toks) AS INT) AS n_tokens,
          |  CAST(len(list_distinct(toks)) AS INT) AS n_distinct_tokens,
          |  CAST(len(bigrams) AS INT) AS n_bigrams,
          |  CAST(list_max(list_transform(list_distinct(bigrams),
          |    b -> len(list_filter(bigrams, x -> x = b)))) AS INT)
          |    AS top_bigram_count
          |FROM bg ORDER BY doc_id""".stripMargin,
      "q61_redact" ->
        """SELECT doc_id,
          |  md5(regexp_replace(regexp_replace(text,
          |    '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>',
          |    'g'), '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
          |    '<EMAIL>', 'g')) AS redacted_md5,
          |  CAST(len(regexp_extract_all(text,
          |    '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS INT)
          |    AS n_ips,
          |  CAST(len(regexp_extract_all(text,
          |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT)
          |    AS n_emails
          |FROM documents ORDER BY doc_id""".stripMargin,
      "q47_vocabulary" ->
        """SELECT token, count(*) AS cnt
          |FROM (SELECT unnest(list_filter(string_split(
          |        regexp_replace(lower(text), '[ \t\n\r\f\x0B]+', ' ', 'g'), ' '),
          |        x -> x != '')) AS token
          |      FROM documents) t
          |GROUP BY token ORDER BY cnt DESC, token ASC
          |LIMIT 200""".stripMargin,
      // add-one-smoothed unigram logp from integer counts; avg rounded
      // to 6 decimals per doc (ln-ulp divergence cannot reach a
      // 6-decimal boundary — see lmScore's scaladoc)
      "q104_lm_score" ->
        s"""WITH $lmScoreCteSql
           |SELECT doc_id, n_tokens, n_oov, avg_logp
           |FROM alldocs ORDER BY doc_id""".stripMargin,
      // q104's score → the CCNet tercile split: global rank and the
      // bucket arithmetic are pure integers, so the composition
      // hash-matches end-to-end
      "q105_lm_buckets" ->
        s"""WITH $lmScoreCteSql,
           |ranked AS (
           |  SELECT doc_id, avg_logp,
           |    row_number() OVER (ORDER BY avg_logp DESC NULLS LAST,
           |      doc_id ASC) - 1 AS r,
           |    (SELECT count(*) FROM alldocs) AS n
           |  FROM alldocs)
           |SELECT doc_id, avg_logp,
           |  CAST((r * 3) // n AS BIGINT) AS bucket
           |FROM ranked ORDER BY doc_id""".stripMargin,
      // fixed-weight classifier scoring: the shared qualityScoreCteSql
      // fixture (weights exact binary fractions so the per-doc sum is
      // order-independent bit-exact; only exp() carries the documented
      // ~1-ulp 6-decimal boundary exposure)
      "q118_quality_score" ->
        s"""WITH ${qualityScoreCteSql("-0.25")}
          |SELECT doc_id, quality_prob FROM scored
          |ORDER BY doc_id""".stripMargin,
      // the streamed scorer under the STORED q118 fixture model is
      // bit-identical to the batch scorer — same oracle
      "q128_stream_quality" ->
        s"""WITH ${qualityScoreCteSql("-0.25")}
          |SELECT doc_id, quality_prob FROM scored
          |ORDER BY doc_id""".stripMargin,
      // q118's score CTEs (shared fixture, bias shifted into the
      // acceptance rule's active region), then the portable tick (salt
      // prefix pareto1:) drives the 6-decimal-rounded inverse-CDF draw
      // against 1 - score
      "q120_pareto_accept" ->
        s"""WITH ${qualityScoreCteSql("2.0")},
          |k AS (
          |  SELECT doc_id, quality_prob,
          |    'pareto1:' || CAST(doc_id AS VARCHAR) AS key
          |  FROM scored),
          |b AS (
          |  SELECT doc_id, quality_prob, $mixedTickSql AS tick FROM k)
          |SELECT doc_id, quality_prob FROM b
          |WHERE round(pow(1.0 - (tick + 0.5) / 10000.0, -1.0 / 9.0)
          |        - 1.0, 6) > 1.0 - quality_prob
          |ORDER BY doc_id""".stripMargin,
      "q48_top_terms" ->
        """WITH toks AS (
          |  SELECT doc_id, unnest(list_filter(string_split(
          |    regexp_replace(lower(text), '[ \t\n\r\f\x0B]+', ' ', 'g'), ' '),
          |    x -> x != '')) AS token
          |  FROM documents),
          |tf AS (SELECT doc_id, token, count(*) AS tf FROM toks
          |       GROUP BY doc_id, token),
          |df AS (SELECT token, count(*) AS df FROM tf GROUP BY token)
          |SELECT doc_id, token, tf, df, CAST(rank AS INT) AS rank FROM (
          |  SELECT tf.doc_id, tf.token, tf.tf, df.df,
          |    row_number() OVER (PARTITION BY tf.doc_id
          |      ORDER BY CAST(tf.tf AS DOUBLE) / df.df DESC,
          |               tf.token ASC) AS rank
          |  FROM tf JOIN df ON tf.token = df.token) r
          |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
      "q45_multimodal_meta" ->
        """SELECT doc_id AS media_id, 'image/fake' AS media_type,
          |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
          |  md5(text) AS checksum
          |FROM documents ORDER BY media_id""".stripMargin,
      "q46_frame_sample" ->
        """SELECT doc_id AS media_id,
          |  CAST(octet_length(encode(text)) % 30 + 1 AS INT) AS n_frames,
          |  CAST(unnest(generate_series(0,
          |    octet_length(encode(text)) % 30, 5)) AS INT) AS frame_idx
          |FROM documents ORDER BY media_id, frame_idx""".stripMargin,
      // the FakeCodec audio fallback is pure byte arithmetic, so the
      // oracle replays it; duration = frames/rate is one IEEE division
      // (engine-identical per row). NULL text → empty payload (n = 0).
      "q94_audio_meta" ->
        """SELECT doc_id AS media_id,
          |  CAST(8000 + n % 40000 AS INT) AS sample_rate,
          |  CAST(n % 2 + 1 AS INT) AS channels,
          |  CAST(n * 4 AS BIGINT) AS n_frames,
          |  CAST(n * 4 AS DOUBLE) / (8000 + n % 40000) AS duration_s,
          |  false AS decoded_real
          |FROM (SELECT doc_id,
          |        octet_length(encode(coalesce(text, ''))) AS n
          |      FROM documents) t
          |ORDER BY media_id""".stripMargin,
      // same deterministic-fallback contract as q94: every documents-
      // backed payload is non-MP4, so the fake arithmetic IS the result
      "q99_video_meta" ->
        """SELECT doc_id AS media_id,
          |  CAST(n % 30 + 1 AS DOUBLE) / 25.0 AS duration_s,
          |  CAST(n % 3 + 1 AS INT) AS n_tracks,
          |  false AS decoded_real
          |FROM (SELECT doc_id,
          |        octet_length(encode(coalesce(text, ''))) AS n
          |      FROM documents) t
          |ORDER BY media_id""".stripMargin,
      "q26_manifest_flatten" ->
        """SELECT u.url, true AS mandatory FROM (
          |  SELECT unnest(r.resource.path) AS url
          |  FROM (SELECT unnest(resources) AS resource
          |        FROM read_json_auto(
          |          '/root/repo/fixtures/datapackage.json')) r
          |) u ORDER BY url""".stripMargin,
      "q44_rolling_hash" ->
        // the kernel folds (acc*257 + byte) % 1e9+7 over UTF-8 bytes; the
        // testdata text is ASCII, so code points == bytes and list_reduce
        // reproduces the fold exactly in 64-bit integer math
        """SELECT doc_id,
          |  list_reduce(list_prepend(0::BIGINT,
          |    [ascii(text[i])::BIGINT FOR i IN range(1, length(text)+1)]),
          |    (acc, b) -> (acc * 257 + b) % 1000000007) AS rhash
          |FROM documents ORDER BY doc_id""".stripMargin,
      "q37_ann_cosine_topk" -> annBruteTopKSql,
      // the written-index path at FULL probing is exact by
      // construction — same brute-force oracle as q37
      "q84_ivf_indexed_exact" -> annBruteTopKSql,
      // SQ8 scan + full exact re-rank ≡ brute force (every pair
      // re-scored with the exact cosine) — same oracle as q37
      "q106_sq8_rerank_topk" -> annBruteTopKSql,
      // SQ8 INSIDE the written IVF layout at full probe + full
      // re-rank: quantized candidate scan over stored codes, exact
      // re-rank from the bucketed f32 vectors/ — ≡ brute force, same
      // oracle as q37/q84/q106
      "q108_sq8_ivf_topk" -> annBruteTopKSql,
      // q84's oracle with the metadata pre-filter on the CANDIDATE
      // side only (queries stay unfiltered): the k best label-3
      // vectors per query — a short post-filtered list would
      // hash-mismatch, which is exactly the semantics under proof
      "q103_ivf_filtered_topk" -> annFilteredTopKSql,
      // the sq8 layout's filtered probe at full probe + full re-rank
      // ≡ the f32 layout's ≡ the filtered brute force — same oracle
      // as q103 (predicate over stored CODES, exact f32 re-rank)
      "q111_sq8_filtered_topk" -> annFilteredTopKSql,
      // BM25: same tokenization as q40, Lucene-style non-negative idf
      // rounded to 6 decimals, avgdl = Σ tokens / N over ALL docs,
      // per-(query, doc) sum rounded to 6, rank by (score desc, id)
      "q129_bm25_topk" -> bm25TopKSql,
      // the stored-stats probe is output-identical to the inline run —
      // same oracle (the index round-trip is the correctness claim)
      "q133_bm25_indexed" -> bm25TopKSql,
      // the streamed probe ranks each disjoint query micro-batch
      // independently, so the unioned triggers are output-identical
      // to the inline run — same oracle (the bridge adds nothing)
      "q135_stream_bm25" -> bm25TopKSql,
      // write-then-append lifecycle: appended stats (n_docs, n_tokens,
      // postings, doclen) must equal one pass over the whole corpus —
      // same oracle (the closure is the correctness claim)
      "q140_bm25_appended" -> bm25TopKSql,
      // the id tier's round trip: decode(encode(text)) must land
      // exactly on the ONE shared normalization (lowercase,
      // whitespace-class collapse, empties dropped) — DuckDB computes
      // the normalization independently, never seeing ids
      "q141_decode_roundtrip" ->
        """SELECT doc_id,
          |  array_to_string(list_filter(string_split_regex(
          |    lower(coalesce(text, '')), '[ \t\n\r\f\x0B]+'),
          |    x -> x != ''), ' ') AS decoded
          |FROM documents ORDER BY doc_id""".stripMargin,
      // the STREAMED encode under the persisted model decodes to the
      // same shared normalization, trigger by trigger — same oracle
      // as q141 (the bridge adds nothing to the encode's semantics)
      "q145_stream_encode" ->
        """SELECT doc_id,
          |  array_to_string(list_filter(string_split_regex(
          |    lower(coalesce(text, '')), '[ \t\n\r\f\x0B]+'),
          |    x -> x != ''), ' ') AS decoded
          |FROM documents ORDER BY doc_id""".stripMargin,
      // the repaired artifact must reconstruct, per document, to the
      // normalization of exactly the docs that SURVIVE the retraction
      // (the appended batch's multiples of 41 are gone) — DuckDB
      // computes survival and normalization independently, never
      // seeing packs, spans, or ids
      "q142_repaired_export" ->
        """WITH d AS (
          |  SELECT doc_id, text FROM documents WHERE doc_id < 1000),
          |m AS (
          |  SELECT CAST(max(doc_id) AS BIGINT) // 2 AS mid FROM d)
          |SELECT doc_id,
          |  array_to_string(list_filter(string_split_regex(
          |    lower(coalesce(text, '')), '[ \t\n\r\f\x0B]+'),
          |    x -> x != ''), ' ') AS decoded
          |FROM d, m
          |WHERE doc_id <= m.mid OR doc_id % 41 != 0
          |ORDER BY doc_id""".stripMargin,
      // sequence packing: global doc offsets by cumulative token sum
      // in doc_id order, spans by exact integer division — the q66
      // token-count semantics (split on ' ', empties dropped)
      "q132_pack_sequences" ->
        """WITH tok AS (
          |  SELECT doc_id,
          |    CAST(len(list_filter(string_split(text, ' '),
          |      x -> x != '')) AS BIGINT) AS n_tokens
          |  FROM documents),
          |cum AS (
          |  SELECT doc_id, n_tokens,
          |    CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          |      AS BIGINT) AS cum_prev
          |  FROM tok),
          |pieces AS (
          |  SELECT doc_id, n_tokens, cum_prev,
          |    unnest(generate_series(cum_prev // 512,
          |      (cum_prev + n_tokens - 1) // 512)) AS seq_id
          |  FROM cum WHERE n_tokens > 0)
          |SELECT CAST(seq_id AS BIGINT) AS seq_id, doc_id,
          |  CAST(greatest(cum_prev, seq_id * 512) - cum_prev
          |    AS BIGINT) AS doc_from,
          |  CAST(greatest(cum_prev, seq_id * 512) - seq_id * 512
          |    AS BIGINT) AS seq_from,
          |  CAST(least(cum_prev + n_tokens, (seq_id + 1) * 512)
          |    - greatest(cum_prev, seq_id * 512) AS BIGINT) AS n_tokens
          |FROM pieces ORDER BY seq_id, doc_id""".stripMargin,
      // hybrid RRF: q129's BM25 arithmetic (queries = docs 0-2's own
      // text, self-hits excluded BEFORE ranking) + q37's exact cosine
      // ranking, fused by round(Σ 1/(60+rank), 6), re-ranked
      "q130_hybrid_rrf" -> hybridRrfSql,
      // the fully-persisted hybrid (stored BM25 probe + stored IVF at
      // full probe) is leg-for-leg exact — same oracle
      "q134_hybrid_indexed" -> hybridRrfSql,
      // the streamed hybrid fuses each disjoint query micro-batch
      // independently (both probes and RRF are per-query) — same
      // oracle as the batch hybrid
      "q136_stream_hybrid" -> hybridRrfSql,
      // DSIR importance weights: hashed unigram+bigram bag-of-ngrams
      // (the cdc oracle's portable byte fold per ngram), add-one
      // smoothed target/raw log ratios over the complete 512-bucket
      // range, per-doc sum rounded to 6 decimals
      "q123_dsir_weight" ->
        s"""WITH ${dsirCtes(512)}
           |SELECT d.doc_id,
           |  CAST(coalesce(sc.n_ngrams, 0) AS BIGINT) AS n_ngrams,
           |  coalesce(sc.log_weight, 0.0) AS log_weight
           |FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
           |ORDER BY d.doc_id""".stripMargin,
      // the streamed scorer under the STORED ratio table is
      // bit-identical to the batch scorer — same oracle as q123
      "q131_stream_dsir" ->
        s"""WITH ${dsirCtes(512)}
           |SELECT d.doc_id,
           |  CAST(coalesce(sc.n_ngrams, 0) AS BIGINT) AS n_ngrams,
           |  coalesce(sc.log_weight, 0.0) AS log_weight
           |FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
           |ORDER BY d.doc_id""".stripMargin,
      // DSIR Gumbel top-k resample: key = log_weight − ln(−ln(u)),
      // u = (dsir1-salted 1/10000 tick + 0.5)/10000 (the q120 pareto
      // variate), rounded to 6 decimals, doc_id the total tie-break
      "q124_dsir_sample" ->
        s"""WITH ${dsirCtes(512)},
           |scored AS (
           |  SELECT d.doc_id,
           |    CAST(coalesce(sc.n_ngrams, 0) AS BIGINT) AS n_ngrams,
           |    coalesce(sc.log_weight, 0.0) AS log_weight
           |  FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id),
           |keyed AS (
           |  SELECT doc_id, n_ngrams, log_weight,
           |    'dsir1:' || CAST(doc_id AS VARCHAR) AS key
           |  FROM scored),
           |drawn AS (
           |  SELECT doc_id, n_ngrams, log_weight,
           |    round(log_weight - ln(-ln(
           |      ($mixedTickSql::DOUBLE + 0.5) / 10000.0)), 6)
           |      AS dsir_key
           |  FROM keyed)
           |SELECT * FROM drawn
           |ORDER BY dsir_key DESC, doc_id ASC LIMIT 50""".stripMargin,
      // temperature-flattening rate table: counts → (c_min/c_d)^(1-α)
      // rounded to 6 decimals (the lmScore portability discipline) →
      // 1/10000 tick threshold; α = 0.5 ⇒ exponent 0.5
      "q114_temperature_rates" ->
        """WITH counts AS (
          |  SELECT lang AS domain, count(*) AS n_docs
          |  FROM documents GROUP BY 1),
          |r AS (
          |  SELECT domain, n_docs,
          |    round(pow((SELECT min(n_docs) FROM counts)::DOUBLE
          |      / n_docs::DOUBLE, 0.5), 6) AS rate
          |  FROM counts)
          |SELECT domain, n_docs, rate,
          |  CAST(round(rate * 10000) AS BIGINT) AS threshold
          |FROM r ORDER BY domain""".stripMargin,
      // the mix: q72's portable salted tick (salt prefix mix1:)
      // against q114's data-derived thresholds
      "q113_temperature_mix" ->
        s"""WITH counts AS (
          |  SELECT lang, count(*) AS n_docs FROM documents GROUP BY 1),
          |thr AS (
          |  SELECT lang,
          |    CAST(round(round(pow(
          |      (SELECT min(n_docs) FROM counts)::DOUBLE
          |        / n_docs::DOUBLE, 0.5), 6) * 10000) AS BIGINT) AS t
          |  FROM counts),
          |k AS (
          |  SELECT doc_id, lang,
          |    'mix1:' || CAST(doc_id AS VARCHAR) AS key
          |  FROM documents),
          |b AS (
          |  SELECT doc_id, lang, $mixedTickSql AS tick FROM k)
          |SELECT b.doc_id, b.lang FROM b JOIN thr ON b.lang = thr.lang
          |WHERE tick < t ORDER BY doc_id""".stripMargin,
      // semantic screen report: nearest eval vector by the exact
      // bit-reproducible cosine (q37's fold); argmax ties fall to the
      // lowest eval_id in both engines
      "q115_semantic_screen" ->
        s"""WITH $vecNormSql,
           |ev AS (SELECT * FROM v WHERE vec_id % 97 = 0),
           |corp AS (SELECT * FROM v WHERE vec_id % 97 != 0),
           |scored AS (
           |  SELECT c.vec_id, q.vec_id AS eval_id, ${cosineSql("c", "q")}
           |  FROM corp c CROSS JOIN ev q),
           |ranked AS (
           |  SELECT vec_id, eval_id, cosine,
           |    row_number() OVER (PARTITION BY vec_id
           |      ORDER BY cosine DESC, eval_id ASC) AS rk
           |  FROM scored)
           |SELECT vec_id, cosine AS max_cosine,
           |  eval_id AS nearest_eval_id,
           |  cosine >= 0.9 AS contaminated
           |FROM ranked WHERE rk = 1 ORDER BY vec_id""".stripMargin,
      // the streamed screen's unioned micro-batches must equal the
      // batch screen row-for-row — q115's oracle verbatim (same eval
      // slice, same threshold), hash-proving the bridge is a no-op
      // over the batch semantics
      "q117_stream_semantic" ->
        s"""WITH $vecNormSql,
           |ev AS (SELECT * FROM v WHERE vec_id % 97 = 0),
           |corp AS (SELECT * FROM v WHERE vec_id % 97 != 0),
           |scored AS (
           |  SELECT c.vec_id, q.vec_id AS eval_id, ${cosineSql("c", "q")}
           |  FROM corp c CROSS JOIN ev q),
           |ranked AS (
           |  SELECT vec_id, eval_id, cosine,
           |    row_number() OVER (PARTITION BY vec_id
           |      ORDER BY cosine DESC, eval_id ASC) AS rk
           |  FROM scored)
           |SELECT vec_id, cosine AS max_cosine,
           |  eval_id AS nearest_eval_id,
           |  cosine >= 0.9 AS contaminated
           |FROM ranked WHERE rk = 1 ORDER BY vec_id""".stripMargin,
      // the indexed screen at nprobe = all cells is exhaustive: hits
      // are exactly the brute-force cross pairs over the threshold —
      // hash-proving the cells/ probe round-trip (the q84 contract)
      "q116_semantic_screen_index" ->
        s"""WITH $vecNormSql,
           |ev AS (SELECT * FROM v WHERE vec_id % 97 = 0),
           |corp AS (SELECT * FROM v WHERE vec_id % 97 != 0),
           |scored AS (
           |  SELECT c.vec_id, q.vec_id AS eval_id, ${cosineSql("c", "q")}
           |  FROM corp c CROSS JOIN ev q)
           |SELECT vec_id, eval_id, cosine FROM scored
           |WHERE cosine >= 0.3 ORDER BY vec_id, eval_id""".stripMargin,
      "q62_jaccard_allpairs" ->
        s"""WITH $shingleSql,
           |pairs AS (
           |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           |    len(list_intersect(a.shingles, b.shingles)) AS n_inter,
           |    len(a.shingles) AS na, len(b.shingles) AS nb
           |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
           |    AND len(a.shingles) > 0 AND len(b.shingles) > 0)
           |SELECT id_a, id_b,
           |  n_inter / (na + nb - n_inter) AS jaccard
           |FROM pairs WHERE n_inter / (na + nb - n_inter) >= 0.5
           |ORDER BY id_a, id_b""".stripMargin,
      // q62's oracle restricted to CROSS-parity pairs: the Spark side
      // reads one side's shingle arrays from the written minhash index,
      // so a hash-match proves storage round-trip + shared arithmetic
      "q90_index_jaccard_exact" ->
        s"""WITH $shingleSql,
           |pairs AS (
           |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           |    len(list_intersect(a.shingles, b.shingles)) AS n_inter,
           |    len(a.shingles) AS na, len(b.shingles) AS nb
           |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
           |    AND (a.doc_id % 2) <> (b.doc_id % 2)
           |    AND len(a.shingles) > 0 AND len(b.shingles) > 0)
           |SELECT id_a, id_b,
           |  n_inter / (na + nb - n_inter) AS jaccard
           |FROM pairs WHERE n_inter / (na + nb - n_inter) >= 0.5
           |ORDER BY id_a, id_b""".stripMargin,
      "q81_containment_allpairs" ->
        // zero-shingle docs excluded on BOTH sides (allPairsScored does
        // the same): 0/0 is NaN in DuckDB and NaN compares greater than
        // any threshold, while Spark's Divide NULL-drops — the measure
        // is simply undefined on empty shingle sets
        s"""WITH $shingleSql,
           |pairs AS (
           |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           |    len(list_intersect(a.shingles, b.shingles)) AS n_inter,
           |    len(a.shingles) AS na, len(b.shingles) AS nb
           |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
           |    AND len(a.shingles) > 0 AND len(b.shingles) > 0)
           |SELECT id_a, id_b,
           |  n_inter / least(na, nb) AS containment
           |FROM pairs WHERE n_inter / least(na, nb) >= 0.5
           |ORDER BY id_a, id_b""".stripMargin,
      // q102 = q81's exact containment restricted to pairs touching
      // the PROBED odd half (the index holds the even half; at the
      // entry's exhaustive cut parameters found ≡ exact, so the
      // hash-match proves the index round-trip — q90's role for the
      // containment family)
      "q102_index_containment" ->
        s"""WITH $shingleSql,
           |pairs AS (
           |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           |    len(list_intersect(a.shingles, b.shingles)) AS n_inter,
           |    len(a.shingles) AS na, len(b.shingles) AS nb
           |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
           |    AND len(a.shingles) > 0 AND len(b.shingles) > 0
           |    AND (a.doc_id % 2 = 1 OR b.doc_id % 2 = 1))
           |SELECT id_a, id_b,
           |  n_inter / least(na, nb) AS containment
           |FROM pairs WHERE n_inter / least(na, nb) >= 0.5
           |ORDER BY id_a, id_b""".stripMargin,
      "q63_cosine_allpairs" ->
        s"""WITH $vecNormSql,
           |p AS (
           |  SELECT a.vec_id AS id_a, b.vec_id AS id_b, ${cosineSql("a", "b")}
           |  FROM v a JOIN v b ON a.vec_id < b.vec_id
           |  WHERE a.vec_id < 1000 AND b.vec_id < 1000)
           |SELECT * FROM p WHERE cosine >= 0.25
           |ORDER BY id_a, id_b""".stripMargin,
      // the five recall gates, q28-style: the approximate structures
      // (k-means cells, IVF buckets, posting cuts) are engine-specific
      // by design, but each gate's n_exact is DuckDB's OWN exact
      // arithmetic (counted) and the floor/ceiling verdicts are
      // stable bits the oracle pins TRUE every round — an
      // index-quality regression fails the round instead of drifting
      // a number nobody diffs
      "q70_ivf_recall" ->
        s"""WITH $vecNormSql,
           |scored AS (
           |  SELECT q.vec_id AS query_id, c.vec_id, ${cosineSql("q", "c")}
           |  FROM v q JOIN v c ON q.vec_id < 5 AND q.vec_id != c.vec_id),
           |ranked AS (
           |  SELECT query_id,
           |    row_number() OVER (PARTITION BY query_id
           |      ORDER BY cosine DESC, vec_id ASC) AS rank
           |  FROM scored)
           |SELECT CAST(count(*) AS BIGINT) AS n_exact,
           |  CAST(0.125 AS DOUBLE) AS probe_frac,
           |  CAST(8 AS INT) AS multi_assign,
           |  true AS recall_ge_floor, true AS scan_le_ceiling
           |FROM ranked WHERE rank <= 10""".stripMargin,
      "q77_semdedup_recall" ->
        s"""WITH $vecNormSql,
           |p AS (
           |  SELECT a.vec_id AS id_a, b.vec_id AS id_b, ${cosineSql("a", "b")}
           |  FROM v a JOIN v b ON a.vec_id < b.vec_id
           |  WHERE a.vec_id < 1000 AND b.vec_id < 1000)
           |SELECT CAST(count(*) AS BIGINT) AS n_exact,
           |  CAST(2 AS INT) AS multi_assign,
           |  true AS recall_ge_floor, true AS scan_le_ceiling
           |FROM p WHERE cosine >= 0.25""".stripMargin,
      "q83_containment_recall" ->
        s"""WITH $shingleSql,
           |pairs AS (
           |  SELECT len(list_intersect(a.shingles, b.shingles)) AS n_inter,
           |    len(a.shingles) AS na, len(b.shingles) AS nb
           |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
           |    AND len(a.shingles) > 0 AND len(b.shingles) > 0)
           |SELECT CAST(count(*) AS BIGINT) AS n_exact,
           |  CAST(4096 AS INT) AS small_max,
           |  CAST(1000 AS BIGINT) AS max_doc_freq,
           |  CAST(0 AS INT) AS sample_k,
           |  CAST(1 AS INT) AS sample_min_hits,
           |  true AS recall_ge_floor, true AS scan_le_ceiling
           |FROM pairs
           |WHERE n_inter / least(na, nb) >= 0.5""".stripMargin,
      "q107_sq8_recall" ->
        s"""WITH $vecNormSql,
           |scored AS (
           |  SELECT q.vec_id AS query_id, c.vec_id, ${cosineSql("q", "c")}
           |  FROM v q JOIN v c ON q.vec_id < 5 AND q.vec_id != c.vec_id),
           |ranked AS (
           |  SELECT query_id,
           |    row_number() OVER (PARTITION BY query_id
           |      ORDER BY cosine DESC, vec_id ASC) AS rank
           |  FROM scored),
           |d AS (SELECT max(len(embedding)) AS dim FROM embeddings)
           |SELECT CAST(count(*) AS BIGINT) AS n_exact,
           |  CAST(d.dim AS INT) AS dim,
           |  CAST(d.dim * 4 AS INT) AS f32_bytes_per_vec,
           |  CAST(d.dim AS INT) AS code_bytes_per_vec,
           |  true AS recall_ge_floor
           |FROM ranked, d WHERE rank <= 10
           |GROUP BY d.dim""".stripMargin,
      "q112_sq8_ivf_recall" ->
        s"""WITH $vecNormSql,
           |scored AS (
           |  SELECT q.vec_id AS query_id, c.vec_id, ${cosineSql("q", "c")}
           |  FROM v q JOIN v c ON q.vec_id < 5 AND q.vec_id != c.vec_id),
           |ranked AS (
           |  SELECT query_id,
           |    row_number() OVER (PARTITION BY query_id
           |      ORDER BY cosine DESC, vec_id ASC) AS rank
           |  FROM scored)
           |SELECT CAST(count(*) AS BIGINT) AS n_exact,
           |  CAST(0.125 AS DOUBLE) AS probe_frac,
           |  CAST(40 AS INT) AS rerank_per_query,
           |  true AS recall_ge_floor
           |FROM ranked WHERE rank <= 10""".stripMargin,
      "q69_cluster_stars" ->
        // identical fixpoint to q64's oracle: stars and label-prop both
        // converge to component-minimum labels on the same edge set
        s"""WITH RECURSIVE $shingleSql,
           |pairs AS (
           |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
           |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
           |    AND len(a.shingles) > 0 AND len(b.shingles) > 0
           |  WHERE len(list_intersect(a.shingles, b.shingles))
           |    / (len(a.shingles) + len(b.shingles)
           |       - len(list_intersect(a.shingles, b.shingles))) >= 0.5),
           |edges AS (
           |  SELECT id_a AS src, id_b AS dst FROM pairs
           |  UNION SELECT id_b, id_a FROM pairs),
           |reach(id, r) AS (
           |  SELECT src, src FROM edges
           |  UNION
           |  SELECT e.src, reach.r FROM edges e
           |  JOIN reach ON e.dst = reach.id)
           |SELECT id, min(r) AS canonical_id FROM reach
           |GROUP BY id ORDER BY id""".stripMargin,
      "q64_cluster_allpairs" ->
        // connected components = min reachable id, via a recursive CTE
        // over the exact-jaccard edge set (the same min-label fixpoint the
        // Spark iterative propagation converges to)
        s"""WITH RECURSIVE $shingleSql,
           |pairs AS (
           |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
           |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
           |    AND len(a.shingles) > 0 AND len(b.shingles) > 0
           |  WHERE len(list_intersect(a.shingles, b.shingles))
           |    / (len(a.shingles) + len(b.shingles)
           |       - len(list_intersect(a.shingles, b.shingles))) >= 0.5),
           |edges AS (
           |  SELECT id_a AS src, id_b AS dst FROM pairs
           |  UNION SELECT id_b, id_a FROM pairs),
           |reach(id, r) AS (
           |  SELECT src, src FROM edges
           |  UNION
           |  SELECT e.src, reach.r FROM edges e
           |  JOIN reach ON e.dst = reach.id)
           |SELECT id, min(r) AS canonical_id FROM reach
           |GROUP BY id ORDER BY id""".stripMargin,
      "q74_neardup_dedup" ->
        s"""WITH RECURSIVE ${shingleSqlWhere("WHERE doc_id < 500")},
           |pairs AS (
           |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
           |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
           |    AND len(a.shingles) > 0 AND len(b.shingles) > 0
           |  WHERE len(list_intersect(a.shingles, b.shingles))
           |    / (len(a.shingles) + len(b.shingles)
           |       - len(list_intersect(a.shingles, b.shingles))) >= 0.5),
           |edges AS (
           |  SELECT id_a AS src, id_b AS dst FROM pairs
           |  UNION SELECT id_b, id_a FROM pairs),
           |reach(id, r) AS (
           |  SELECT src, src FROM edges
           |  UNION
           |  SELECT e.src, reach.r FROM edges e
           |  JOIN reach ON e.dst = reach.id),
           |labels AS (
           |  SELECT id, min(r) AS canonical FROM reach GROUP BY id)
           |SELECT d.doc_id, d.lang, d.n_chars FROM documents d
           |WHERE d.doc_id < 500 AND NOT EXISTS (
           |  SELECT 1 FROM labels l
           |  WHERE l.id = d.doc_id AND l.canonical != d.doc_id)
           |ORDER BY d.doc_id""".stripMargin,
      "q65_hash_split" ->
        // same byte-fold as the q44 rolling hash (ASCII key, so code
        // points == bytes), over "v1:<doc_id>" (salt-prefix) then the
        // Lehmer mixing step — see Sharding.mixedHash — bucketed mod 100
        """WITH k AS (
          |  SELECT doc_id, 'v1:' || CAST(doc_id AS VARCHAR) AS key
          |  FROM documents),
          |b AS (
          |  SELECT doc_id, CAST((list_reduce(list_prepend(0::BIGINT,
          |    [ascii(key[i])::BIGINT FOR i IN range(1, length(key)+1)]),
          |    (acc, c) -> (acc * 257 + c) % 1000000007)
          |    * 48271) % 1000000007 % 100 AS INT)
          |    AS bucket
          |  FROM k)
          |SELECT doc_id, bucket,
          |  CASE WHEN bucket < 80 THEN 'train'
          |       WHEN bucket < 90 THEN 'val'
          |       ELSE 'test' END AS split
          |FROM b ORDER BY doc_id""".stripMargin,
      // the epoch permutation key: same byte-fold as q44/q65 over
      // "ep:3:<seq_id>" (salt, epoch, id — each ':'-separated), then
      // the Lehmer mixing step — a training loader's epoch-3 order,
      // reproduced by DuckDB from scratch
      "q143_epoch_order" ->
        """WITH k AS (
          |  SELECT doc_id AS seq_id,
          |    'ep:3:' || CAST(doc_id AS VARCHAR) AS key
          |  FROM documents)
          |SELECT seq_id,
          |  CAST((list_reduce(list_prepend(0::BIGINT,
          |    [ascii(key[i])::BIGINT FOR i IN range(1, length(key)+1)]),
          |    (acc, c) -> (acc * 257 + c) % 1000000007)
          |    * 48271) % 1000000007 AS BIGINT) AS epoch_key
          |FROM k ORDER BY epoch_key, seq_id""".stripMargin,
      // the artifact-side epoch entry: the Spark half reads seq_ids
      // from a REAL export whose bootstrap ids are dense from 0
      // (ShardingSpec-pinned), so the oracle's id domain is
      // range(500) and the key is the same byte-fold + Lehmer mix as
      // q143 — any artifact-side id drift drops rows and hash-fails
      "q144_epoch_shards" ->
        """WITH k AS (
          |  SELECT CAST(t.range AS BIGINT) AS seq_id,
          |    'ep:3:' || CAST(t.range AS VARCHAR) AS key
          |  FROM range(500) t)
          |SELECT seq_id,
          |  CAST((list_reduce(list_prepend(0::BIGINT,
          |    [ascii(key[i])::BIGINT FOR i IN range(1, length(key)+1)]),
          |    (acc, c) -> (acc * 257 + c) % 1000000007)
          |    * 48271) % 1000000007 AS BIGINT) AS epoch_key
          |FROM k ORDER BY epoch_key, seq_id""".stripMargin,
      // the full artifact audit's healthy verdict: n_docs = the docs
      // that SURVIVE the q142-style retraction, every damage column
      // zero — DuckDB derives survival from the text alone, never
      // seeing packs, spans, ids, or the model
      "q146_audit_shards" ->
        """WITH d AS (
          |  SELECT doc_id FROM documents WHERE doc_id < 1000),
          |m AS (
          |  SELECT CAST(max(doc_id) AS BIGINT) // 2 AS mid FROM d)
          |SELECT CAST(count(*) AS BIGINT) AS n_docs,
          |  0::BIGINT AS n_mismatched, '' AS mismatched_doc_ids,
          |  0::BIGINT AS n_bad, 0::BIGINT AS n_unk,
          |  0::BIGINT AS n_word_merge_risk,
          |  0::BIGINT AS n_unterminated
          |FROM d, m WHERE doc_id <= m.mid OR doc_id % 41 != 0"""
          .stripMargin,
      // the export survey's packing arithmetic over BOTH generations:
      // under the planted never-firing one-merge model every word
      // costs len+1 ids (code points + end-of-word symbol) and each
      // doc one eos, so each pack's sizes/tails/waste/spread — and
      // the appended pack's BASE (the bootstrap's sequence count, the
      // next_seq_id convention) — are integer arithmetic over the
      // normalized text (the q141 normalization: lowercase,
      // whitespace-class split, empties dropped)
      "q147_stats_shards" ->
        """WITH d AS (
          |  SELECT doc_id, text FROM documents WHERE doc_id < 1000),
          |m AS (
          |  SELECT CAST(max(doc_id) AS BIGINT) // 2 AS mid FROM d),
          |tok AS (
          |  SELECT doc_id,
          |    list_filter(string_split_regex(
          |      lower(coalesce(text, '')), '[ \t\n\r\f\x0B]+'),
          |      x -> x != '') AS ts
          |  FROM d),
          |per AS (
          |  SELECT doc_id,
          |    CAST(coalesce(list_sum(list_transform(ts,
          |      x -> length(x) + 1)), 0) + 1 AS BIGINT) AS n
          |  FROM tok),
          |g AS (
          |  SELECT CASE WHEN doc_id <= m.mid THEN 0 ELSE 1 END AS grp,
          |    CAST(sum(n) AS BIGINT) AS ids
          |  FROM per, m GROUP BY 1),
          |b AS (
          |  SELECT (SELECT (ids + 63) // 64 FROM g WHERE grp = 0)
          |    AS base)
          |SELECT
          |  CAST(CASE WHEN grp = 0 THEN 0 ELSE b.base END
          |    AS BIGINT) AS pack,
          |  CAST((ids + 63) // 64 AS BIGINT) AS n_sequences,
          |  ids AS n_ids,
          |  CAST(CASE WHEN ids % 64 = 0 THEN 0 ELSE 1 END
          |    AS BIGINT) AS n_short,
          |  CAST((64 - ids % 64) % 64 AS BIGINT) AS padding_waste,
          |  CAST(CASE WHEN ((ids + 63) // 64) % 4 = 0 THEN 0 ELSE 1
          |    END AS BIGINT) AS shard_spread,
          |  0::BIGINT AS layout_gen
          |FROM g, b ORDER BY pack""".stripMargin,
      // q138/q139: the WHOLE packed id stream under the planted
      // never-firing model — every code point is OOV id 0, every
      // word ends with eow id 2 (vocabIds insertion order: z=1,
      // </w>=2), docs (q139) end with eos id 4 = vocabSize+1 — so
      // DuckDB rebuilds the global id stream from the text alone,
      // cuts it at 512, and md5-hashes each sequence's ids: the
      // concatenation order, cut positions, and id assignment all
      // land in the hash
      "q138_pack_ids" ->
        """WITH tok AS (
          |  SELECT doc_id,
          |    list_filter(string_split_regex(
          |      lower(coalesce(text, '')), '[ \t\n\r\f\x0B]+'),
          |      x -> x != '') AS ts
          |  FROM documents),
          |ids AS (
          |  SELECT doc_id,
          |    flatten(list_transform(ts, w ->
          |      list_append([0 FOR i IN range(1, length(w)+1)], 2)))
          |      AS l
          |  FROM tok),
          |g AS (SELECT flatten(list(l ORDER BY doc_id)) AS gl
          |      FROM ids),
          |t AS (SELECT CAST(len(gl) AS BIGINT) AS n FROM g),
          |s AS (SELECT unnest([CAST(i AS BIGINT)
          |        FOR i IN range(0, CAST((n + 511) // 512 AS INT))])
          |        AS seq_id
          |      FROM t)
          |SELECT s.seq_id,
          |  CAST(least((s.seq_id + 1) * 512, t.n) - s.seq_id * 512
          |    AS INT) AS n_ids,
          |  md5(array_to_string(list_slice(g.gl, s.seq_id * 512 + 1,
          |    least((s.seq_id + 1) * 512, t.n)), ' ')) AS ids_md5
          |FROM s, g, t ORDER BY s.seq_id""".stripMargin,
      "q139_pack_eos" ->
        """WITH tok AS (
          |  SELECT doc_id,
          |    list_filter(string_split_regex(
          |      lower(coalesce(text, '')), '[ \t\n\r\f\x0B]+'),
          |      x -> x != '') AS ts
          |  FROM documents),
          |ids AS (
          |  SELECT doc_id,
          |    list_append(flatten(list_transform(ts, w ->
          |      list_append([0 FOR i IN range(1, length(w)+1)], 2))),
          |      4) AS l
          |  FROM tok),
          |o AS (
          |  SELECT doc_id, CAST(len(l) AS BIGINT) AS nd,
          |    CAST(coalesce(sum(len(l)) OVER (ORDER BY doc_id
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          |      AS BIGINT) AS st
          |  FROM ids),
          |g AS (SELECT flatten(list(l ORDER BY doc_id)) AS gl
          |      FROM ids),
          |t AS (SELECT CAST(len(gl) AS BIGINT) AS n FROM g),
          |s AS (SELECT unnest([CAST(i AS BIGINT)
          |        FOR i IN range(0, CAST((n + 511) // 512 AS INT))])
          |        AS seq_id
          |      FROM t)
          |SELECT s.seq_id,
          |  CAST(least((s.seq_id + 1) * 512, t.n) - s.seq_id * 512
          |    AS INT) AS n_ids,
          |  (SELECT CAST(count(*) AS INT) FROM o
          |   WHERE o.st < least((s.seq_id + 1) * 512, t.n)
          |     AND o.st + o.nd > s.seq_id * 512) AS n_docs,
          |  md5(array_to_string(list_slice(g.gl, s.seq_id * 512 + 1,
          |    least((s.seq_id + 1) * 512, t.n)), ' ')) AS ids_md5
          |FROM s, g, t ORDER BY s.seq_id""".stripMargin,
      // the compacted artifact still decodes every doc to the ONE
      // shared normalization — DuckDB never sees packs, spans, ids,
      // or the merge; compaction is pure re-cutting, so the q141
      // statement holds verbatim over the slice
      "q149_compacted_export" ->
        """SELECT doc_id,
          |  array_to_string(list_filter(string_split_regex(
          |    lower(coalesce(text, '')), '[ \t\n\r\f\x0B]+'),
          |    x -> x != ''), ' ') AS decoded
          |FROM documents WHERE doc_id < 1000
          |ORDER BY doc_id""".stripMargin,
      // the composed refresh→append cron line leaves an export that
      // audits clean against the published corpus — the damage
      // columns are invariant to the refresh's dedup drops (both
      // audit sides are post-publish), so the pinned zeros ARE the
      // composition claim
      "q150_refresh_shards" ->
        """SELECT 0::BIGINT AS n_mismatched,
          |  '' AS mismatched_doc_ids, 0::BIGINT AS n_bad,
          |  0::BIGINT AS n_unk, 0::BIGINT AS n_word_merge_risk,
          |  0::BIGINT AS n_unterminated""".stripMargin,
      // fsck over a healthy composed lifecycle classifies all-ok:
      // zero errors/warns, the refresh's three standing index
      // families (minhash + chunk + hamming at q151's knobs — a
      // contract constant) each layout-consistent, the tokenizer and
      // export trees recognized healthy, the corpus root silent
      "q151_fsck_lifecycle" ->
        """SELECT 0::BIGINT AS n_error, 0::BIGINT AS n_warn,
          |  3::BIGINT AS n_index_ok, true AS model_ok,
          |  true AS shards_ok, true AS corpus_quiet""".stripMargin,
      // epochResume: the q143 order's strict remainder past the
      // median id's (epoch_key, seq_id) cursor — same byte-fold +
      // Lehmer mix, cursor recomputed from scratch, the tie-break
      // exercised AT the cursor row (excluded) itself
      "q148_epoch_resume" ->
        """WITH k AS (
          |  SELECT doc_id AS seq_id,
          |    'ep:3:' || CAST(doc_id AS VARCHAR) AS key
          |  FROM documents),
          |h AS (
          |  SELECT seq_id,
          |    CAST((list_reduce(list_prepend(0::BIGINT,
          |      [ascii(key[i])::BIGINT
          |        FOR i IN range(1, length(key)+1)]),
          |      (acc, c) -> (acc * 257 + c) % 1000000007)
          |      * 48271) % 1000000007 AS BIGINT) AS epoch_key
          |  FROM k),
          |c AS (
          |  SELECT epoch_key AS ck, seq_id AS ci FROM h
          |  WHERE seq_id = (SELECT CAST(max(doc_id) AS BIGINT) // 2
          |    FROM documents))
          |SELECT seq_id, epoch_key FROM h, c
          |WHERE epoch_key > c.ck OR (epoch_key = c.ck AND seq_id > c.ci)
          |ORDER BY epoch_key, seq_id""".stripMargin,
      // q152: the generation-gated resume over a real planted-model
      // export — the id domain is range(n_sequences) with n derived
      // from the TEXT (q147's packing arithmetic: len+1 ids per word
      // + one eos per doc, cut at 64), the keys are q143's byte-fold,
      // the cursor is the median id's key, the remainder strict
      "q152_resume_gated" ->
        """WITH d AS (
          |  SELECT doc_id, text FROM documents WHERE doc_id < 1000),
          |tok AS (
          |  SELECT doc_id,
          |    list_filter(string_split_regex(
          |      lower(coalesce(text, '')), '[ \t\n\r\f\x0B]+'),
          |      x -> x != '') AS ts
          |  FROM d),
          |per AS (
          |  SELECT doc_id,
          |    CAST(coalesce(list_sum(list_transform(ts,
          |      x -> length(x) + 1)), 0) + 1 AS BIGINT) AS n
          |  FROM tok),
          |t AS (SELECT CAST((sum(n) + 63) // 64 AS BIGINT) AS nseq
          |      FROM per),
          |k AS (
          |  SELECT seq_id, 'ep:3:' || CAST(seq_id AS VARCHAR) AS key
          |  FROM (SELECT unnest([CAST(i AS BIGINT)
          |          FOR i IN range(0, CAST(nseq AS INT))]) AS seq_id
          |        FROM t)),
          |h AS (
          |  SELECT seq_id,
          |    CAST((list_reduce(list_prepend(0::BIGINT,
          |      [ascii(key[i])::BIGINT
          |        FOR i IN range(1, length(key)+1)]),
          |      (acc, c) -> (acc * 257 + c) % 1000000007)
          |      * 48271) % 1000000007 AS BIGINT) AS epoch_key
          |  FROM k),
          |c AS (
          |  SELECT epoch_key AS ck, seq_id AS ci FROM h, t
          |  WHERE seq_id = t.nseq // 2)
          |SELECT seq_id, epoch_key FROM h, c
          |WHERE epoch_key > c.ck OR (epoch_key = c.ck AND seq_id > c.ci)
          |ORDER BY epoch_key, seq_id""".stripMargin,
      // q153: the snapshot-bound resume — q152's derivation over the
      // FIRST batch only (doc_id <= max//2): the snapshot bound is
      // that batch's sequence count (the next_seq_id minted at epoch
      // start), the cursor its median id, and the appended batch
      // never appears — the oracle's blindness to it IS the snapshot
      // semantics being pinned
      "q153_resume_snapshot" ->
        """WITH d0 AS (
          |  SELECT doc_id, text FROM documents WHERE doc_id < 1000),
          |m AS (
          |  SELECT CAST(max(doc_id) AS BIGINT) // 2 AS mid FROM d0),
          |d AS (
          |  SELECT doc_id, text FROM d0, m WHERE doc_id <= m.mid),
          |tok AS (
          |  SELECT doc_id,
          |    list_filter(string_split_regex(
          |      lower(coalesce(text, '')), '[ \t\n\r\f\x0B]+'),
          |      x -> x != '') AS ts
          |  FROM d),
          |per AS (
          |  SELECT doc_id,
          |    CAST(coalesce(list_sum(list_transform(ts,
          |      x -> length(x) + 1)), 0) + 1 AS BIGINT) AS n
          |  FROM tok),
          |t AS (SELECT CAST((sum(n) + 63) // 64 AS BIGINT) AS nseq
          |      FROM per),
          |k AS (
          |  SELECT seq_id, 'ep:3:' || CAST(seq_id AS VARCHAR) AS key
          |  FROM (SELECT unnest([CAST(i AS BIGINT)
          |          FOR i IN range(0, CAST(nseq AS INT))]) AS seq_id
          |        FROM t)),
          |h AS (
          |  SELECT seq_id,
          |    CAST((list_reduce(list_prepend(0::BIGINT,
          |      [ascii(key[i])::BIGINT
          |        FOR i IN range(1, length(key)+1)]),
          |      (acc, c) -> (acc * 257 + c) % 1000000007)
          |      * 48271) % 1000000007 AS BIGINT) AS epoch_key
          |  FROM k),
          |c AS (
          |  SELECT epoch_key AS ck, seq_id AS ci FROM h, t
          |  WHERE seq_id = t.nseq // 2)
          |SELECT seq_id, epoch_key FROM h, c
          |WHERE epoch_key > c.ck OR (epoch_key = c.ck AND seq_id > c.ci)
          |ORDER BY epoch_key, seq_id""".stripMargin,
      // q154: fsck's unhealthy taxonomy over planted residue — eight
      // findings, each pinned by (surface, component, level,
      // category): the crashed model write errors per data subdir,
      // the export's marker/aside/floor warns, its ok row demoted to
      // mid-recovery, and the untouched sibling model still healthy
      "q154_fsck_residue" ->
        """SELECT * FROM (VALUES
          |  ('model', 'params', 'ok', 'healthy'),
          |  ('model_crashed', 'alphabet', 'error', 'crashed_write'),
          |  ('model_crashed', 'merges', 'error', 'crashed_write'),
          |  ('shards', 'params', 'ok', 'mid_recovery'),
          |  ('shards', 'sequences', 'warn', 'compact_marker'),
          |  ('shards', 'sequences', 'warn', 'swap_residue'),
          |  ('shards', 'staging', 'warn', 'aside_done'),
          |  ('shards', 'staging', 'warn', 'floor_done'))
          |  AS t(surface, component, level, category)
          |ORDER BY surface, component, level, category""".stripMargin,
      "q78_weighted_sample" ->
        // same byte-fold as q44/q65 over "ws1:<doc_id>", then the
        // Lehmer mixing step (h*48271 % p — see Sharding.weightedSample
        // scaladoc); u = (mixed+0.5)/p; A-ES key ln(u)/w with
        // w = n_chars+1, top-100, re-sorted by id
        """WITH k AS (
          |  SELECT doc_id, lang, n_chars,
          |    'ws1:' || CAST(doc_id AS VARCHAR) AS key
          |  FROM documents
          |  WHERE doc_id IS NOT NULL AND (n_chars + 1)::DOUBLE > 0),
          |h AS (
          |  SELECT doc_id, lang, n_chars,
          |    (list_reduce(list_prepend(0::BIGINT,
          |      [ascii(key[i])::BIGINT FOR i IN range(1, length(key)+1)]),
          |      (acc, c) -> (acc * 257 + c) % 1000000007)
          |     * 48271) % 1000000007 AS hv
          |  FROM k),
          |s AS (
          |  SELECT doc_id, lang, n_chars FROM h
          |  ORDER BY ln((hv::DOUBLE + 0.5) / 1000000007.0)
          |      / ((n_chars + 1)::DOUBLE) DESC, doc_id ASC
          |  LIMIT 100)
          |SELECT doc_id, lang, n_chars FROM s
          |ORDER BY doc_id""".stripMargin,
      "q66_token_shards" ->
        """WITH tk AS (
          |  SELECT doc_id,
          |    CAST(len(list_filter(string_split(text, ' '), x -> x != ''))
          |      AS INT) AS n_tokens
          |  FROM documents),
          |c AS (
          |  SELECT doc_id, n_tokens,
          |    CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          |      AS BIGINT) AS cum_prev
          |  FROM tk)
          |SELECT doc_id, n_tokens,
          |  CAST(floor(cum_prev / 2048.0) AS BIGINT) AS shard_id
          |FROM c ORDER BY doc_id""".stripMargin,
      "q80_pack_bins" ->
        // serpentine over the global (tokens desc, id) rank with B=8:
        // r%16 < 8 forward pass, else the reflected pass
        s"""WITH ${serpentineSql("documents")}""",
      "q67_split_leakage" ->
        // q65's bucket fold + q43's fingerprint, aggregated per split
        """WITH k AS (
          |  SELECT doc_id,
          |    md5(regexp_replace(lower(text), '[ \t\n\r\f\x0B]+', ' ', 'g')) AS fp,
          |    'v1:' || CAST(doc_id AS VARCHAR) AS key
          |  FROM documents),
          |b AS (
          |  SELECT doc_id, fp, CAST((list_reduce(list_prepend(0::BIGINT,
          |    [ascii(key[i])::BIGINT FOR i IN range(1, length(key)+1)]),
          |    (acc, c) -> (acc * 257 + c) % 1000000007)
          |    * 48271) % 1000000007 % 100 AS INT)
          |    AS bucket
          |  FROM k),
          |s AS (
          |  SELECT doc_id, fp,
          |    CASE WHEN bucket < 80 THEN 'train'
          |         WHEN bucket < 90 THEN 'val'
          |         ELSE 'test' END AS split
          |  FROM b),
          |fps AS (
          |  SELECT fp, count(DISTINCT split) AS n_splits
          |  FROM s GROUP BY fp)
          |SELECT split,
          |  count(*) AS n_docs,
          |  count(DISTINCT s.fp) AS n_fingerprints,
          |  CAST(COALESCE(SUM(CASE WHEN n_splits > 1 THEN 1 ELSE 0 END),
          |    0) AS BIGINT) AS n_leaked_docs
          |FROM s JOIN fps ON s.fp = fps.fp
          |GROUP BY split ORDER BY split""".stripMargin,
      "q71_decontaminate" ->
        s"""WITH ${shingleSqlWhere("")},
           |$contaminationCntSql
           |SELECT sh.doc_id,
           |  CAST(len(sh.shingles) AS BIGINT) AS n_shingles,
           |  CAST(coalesce(cnt.n_cont, 0) AS BIGINT) AS n_contaminated,
           |  CASE WHEN len(sh.shingles) = 0 THEN 0.0
           |       ELSE CAST(coalesce(cnt.n_cont, 0) AS DOUBLE)
           |            / len(sh.shingles)
           |  END AS contaminated_frac
           |FROM sh LEFT JOIN cnt ON sh.doc_id = cnt.doc_id
           |ORDER BY sh.doc_id""".stripMargin,
      // q101 = q71's EXACT report computed through the persisted
      // benchmark index, so it shares q71's oracle verbatim — the
      // hash-match proves the index round-trip changes nothing
      "q101_contamination_index" ->
        s"""WITH ${shingleSqlWhere("")},
           |$contaminationCntSql
           |SELECT sh.doc_id,
           |  CAST(len(sh.shingles) AS BIGINT) AS n_shingles,
           |  CAST(coalesce(cnt.n_cont, 0) AS BIGINT) AS n_contaminated,
           |  CASE WHEN len(sh.shingles) = 0 THEN 0.0
           |       ELSE CAST(coalesce(cnt.n_cont, 0) AS DOUBLE)
           |            / len(sh.shingles)
           |  END AS contaminated_frac
           |FROM sh LEFT JOIN cnt ON sh.doc_id = cnt.doc_id
           |ORDER BY sh.doc_id""".stripMargin,
      // q108 = q101's report emitted THROUGH the streaming bridge
      // (stateless foreachBatch, so unioned micro-batches ≡ the batch
      // screen row-for-row) — same oracle verbatim; the hash-match
      // proves the bridge's plumbing changes nothing
      "q110_stream_screen" ->
        s"""WITH ${shingleSqlWhere("")},
           |$contaminationCntSql
           |SELECT sh.doc_id,
           |  CAST(len(sh.shingles) AS BIGINT) AS n_shingles,
           |  CAST(coalesce(cnt.n_cont, 0) AS BIGINT) AS n_contaminated,
           |  CASE WHEN len(sh.shingles) = 0 THEN 0.0
           |       ELSE CAST(coalesce(cnt.n_cont, 0) AS DOUBLE)
           |            / len(sh.shingles)
           |  END AS contaminated_frac
           |FROM sh LEFT JOIN cnt ON sh.doc_id = cnt.doc_id
           |ORDER BY sh.doc_id""".stripMargin,
      // the composed pipeline = its stages' oracles chained as CTEs:
      // the SHARED gopher/contamination/tick/packing fragments (so a
      // rule change cannot drift between q79/q71/q72/q80 and this
      // composition), plus q74's recursive-CTE dedup fixpoint
      "q86_corpus_prep" ->
        s"""WITH RECURSIVE
           |${gopherCteSql("WHERE doc_id < 500")},
           |keepers AS (
           |  SELECT doc_id FROM c
           |  WHERE n_words BETWEEN 50 AND 100000
           |    AND (CASE WHEN n_words = 0 THEN 0.0
           |         ELSE wchars::DOUBLE / n_words END) BETWEEN 3.0
           |         AND 10.0
           |    AND (CASE WHEN n_words = 0 THEN 0.0
           |         ELSE nsym::DOUBLE / n_words END) <= 0.1
           |    AND (CASE WHEN n_lines = 0 THEN 0.0
           |         ELSE n_bullet::DOUBLE / n_lines END) <= 0.9
           |    AND (CASE WHEN n_lines = 0 THEN 0.0
           |         ELSE n_ellipsis::DOUBLE / n_lines END) <= 0.3
           |    AND (CASE WHEN n_words = 0 THEN 0.0
           |         ELSE n_alpha::DOUBLE / n_words END) >= 0.8
           |    AND n_stop_hits >= 0),
           |${shingleSqlWhere("WHERE doc_id < 500")},
           |$contaminationCntSql,
           |screened AS (
           |  SELECT k.doc_id FROM keepers k
           |  JOIN sh ON sh.doc_id = k.doc_id
           |  LEFT JOIN cnt ON cnt.doc_id = k.doc_id
           |  WHERE (CASE WHEN len(sh.shingles) = 0 THEN 0.0
           |         ELSE coalesce(cnt.n_cont, 0)::DOUBLE
           |              / len(sh.shingles) END) <= 0.5),
           |pairs AS (
           |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
           |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
           |    AND len(a.shingles) > 0 AND len(b.shingles) > 0
           |  JOIN screened sa ON sa.doc_id = a.doc_id
           |  JOIN screened sb ON sb.doc_id = b.doc_id
           |  WHERE len(list_intersect(a.shingles, b.shingles))
           |    / (len(a.shingles) + len(b.shingles)
           |       - len(list_intersect(a.shingles, b.shingles))) >= 0.5),
           |edges AS (
           |  SELECT id_a AS src, id_b AS dst FROM pairs
           |  UNION SELECT id_b, id_a FROM pairs),
           |reach(id, r) AS (
           |  SELECT src, src FROM edges
           |  UNION
           |  SELECT e.src, reach.r FROM edges e
           |  JOIN reach ON e.dst = reach.id),
           |labels AS (
           |  SELECT id, min(r) AS canonical FROM reach GROUP BY id),
           |survivors AS (
           |  SELECT s.doc_id FROM screened s
           |  WHERE NOT EXISTS (SELECT 1 FROM labels l
           |    WHERE l.id = s.doc_id AND l.canonical != s.doc_id)),
           |sampk AS (
           |  SELECT d.doc_id, d.lang, d.text,
           |    'mix1:' || CAST(d.doc_id AS VARCHAR) AS key
           |  FROM documents d JOIN survivors v ON v.doc_id = d.doc_id),
           |sampled AS (
           |  SELECT doc_id, text FROM sampk
           |  WHERE $mixedTickSql
           |    < CASE lang WHEN 'en' THEN 3000 WHEN 'zh' THEN 5000
           |      ELSE 10000 END),
           |${serpentineSql("sampled")}""".stripMargin,
      "q72_stratified_sample" ->
        // q65's portable byte-fold + Lehmer mix with salt prefix mix1:,
        // 1/10000 resolution
        s"""WITH k AS (
          |  SELECT doc_id, lang,
          |    'mix1:' || CAST(doc_id AS VARCHAR) AS key
          |  FROM documents),
          |b AS (
          |  SELECT doc_id, lang,
          |    $mixedTickSql AS tick
          |  FROM k)
          |SELECT doc_id, lang FROM b
          |WHERE tick < CASE lang WHEN 'en' THEN 3000 WHEN 'zh' THEN 5000
          |             ELSE 10000 END
          |ORDER BY doc_id""".stripMargin,
      "q68_heavy_hitters" ->
        """SELECT token, count(*) AS cnt
          |FROM (SELECT unnest(list_filter(string_split(
          |        regexp_replace(lower(text), '[ \t\n\r\f\x0B]+', ' ', 'g'), ' '),
          |        x -> x != '')) AS token
          |      FROM documents) t
          |GROUP BY token HAVING count(*) >= 500
          |ORDER BY token""".stripMargin
      // q32-q35, q38, q49, q75-q76, q82, q85: not DuckDB-reproducible
      // BY DESIGN (xxhash64-based minhash/simhash signatures,
      // random-hyperplane / IVF / k-means bucketing, df-dependent
      // posting cuts) → driver records rows-only checks;
      // q62-q64/q69/q81 are their brute-force oracle-checked
      // baselines, and the recall gates (q70/q77/q83/q107/q112, plus
      // q28 for the HLL sketch) pin the approx/exact gap as
      // oracle-checked verdict bits next to DuckDB's own exact
      // counts.
    )
  }

  /** Exact brute-force cosine top-10 for 5 query vectors — the oracle
    * of q37 (inline brute force) AND q84 (written IVF index probed at
    * nprobe = nlist, which scores every cell and is therefore exact).
    */
  private def annBruteTopKSql: String =
    s"""WITH $vecNormSql,
       |scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id, ${cosineSql("q", "c")}
       |  FROM v q JOIN v c ON q.vec_id < 5 AND q.vec_id != c.vec_id),
       |ranked AS (
       |  SELECT query_id, vec_id, cosine,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY cosine DESC, vec_id ASC) AS INT) AS rank
       |  FROM scored)
       |SELECT * FROM ranked WHERE rank <= 10
       |ORDER BY query_id, rank""".stripMargin

  /** [[annBruteTopKSql]] with the label = 3 metadata pre-filter on the
    * CANDIDATE side only — the oracle of q103 (f32 filtered probe) AND
    * q111 (sq8 filtered probe at full probe + full re-rank, where the
    * predicate-over-codes + exact-re-rank pipeline is exact too).
    */
  private def annFilteredTopKSql: String =
    s"""WITH $vecNormSql,
       |lab AS (SELECT vec_id, label FROM embeddings),
       |scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id, ${cosineSql("q", "c")}
       |  FROM v q
       |  JOIN v c ON q.vec_id < 5 AND q.vec_id != c.vec_id
       |  JOIN lab ON lab.vec_id = c.vec_id AND lab.label = 3),
       |ranked AS (
       |  SELECT query_id, vec_id, cosine,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY cosine DESC, vec_id ASC) AS INT) AS rank
       |  FROM scored)
       |SELECT * FROM ranked WHERE rank <= 10
       |ORDER BY query_id, rank""".stripMargin

  /** DuckDB fragment: per-vector double-cast components and L2 norm with
    * the SAME sequential fold the native kernel uses — bit-exact doubles.
    */
  private def vecNormSql: String =
    """v AS (
      |  SELECT vec_id,
      |    [embedding[i]::DOUBLE
      |     FOR i IN range(1, len(embedding)+1)] AS e,
      |    sqrt(list_reduce(list_prepend(0.0::DOUBLE,
      |      [embedding[i]::DOUBLE * embedding[i]::DOUBLE
      |       FOR i IN range(1, len(embedding)+1)]), (x,y) -> x+y)) AS nrm
      |  FROM embeddings)""".stripMargin

  /** DuckDB fragment: cosine between two [[vecNormSql]] rows, sequential
    * dot fold / (norm * norm) — the exact arithmetic of `fvec_cosine`. */
  private def cosineSql(qa: String, qb: String): String =
    s"""list_reduce(list_prepend(0.0::DOUBLE,
       |      [$qa.e[i] * $qb.e[i] FOR i IN range(1, len($qa.e)+1)]),
       |      (x,y) -> x+y) / ($qa.nrm * $qb.nrm) AS cosine""".stripMargin

  /** DuckDB fragment: the [[graft.operators.Dedup.shingleHashArrays]]
    * semantics on shingle STRINGS — normalize,
    * whitespace tokens, distinct 3-word shingles. Capped to the q62/q64
    * oracle sample; [[shingleSqlWhere]] is the uncapped parametrized
    * form. */
  private def shingleSql: String = shingleSqlWhere("WHERE doc_id < 1000")

  /** DuckDB fragment: q79's Gopher rule-input CTEs (f: raw counts, c:
    * per-rule integers) over `documents __WHERE__` — shared by the q79
    * audit oracle and q86's composed keep filter so a rule change can
    * never drift between the stage oracle and the composition.
    */
  private def gopherCteSql(where: String): String =
    """f AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(text, '[ \t\n\r\f\x0B]+'),
      |      x -> x != '') AS ws,
      |    string_split(text, chr(10)) AS lines,
      |    CAST(length(regexp_replace(text, '[ \t\n\r\f\x0B]+', '', 'g'))
      |      AS BIGINT) AS wchars,
      |    CAST(len(regexp_extract_all(text, '#')) +
      |         len(regexp_extract_all(text, '(\.\.\.|…)'))
      |      AS BIGINT) AS nsym,
      |    CAST(len(list_distinct(regexp_extract_all(lower(text),
      |      '\b(the|be|to|of|and|that|have|with)\b', 1)))
      |      AS BIGINT) AS n_stop_hits
      |  FROM documents __WHERE__),
      |c AS (
      |  SELECT doc_id,
      |    CAST(len(ws) AS BIGINT) AS n_words,
      |    wchars, nsym, n_stop_hits,
      |    CAST(len(lines) AS BIGINT) AS n_lines,
      |    CAST(len(list_filter(lines,
      |      l -> regexp_matches(l, '^[ \t\n\r\f\x0B]*[-*•]'))) AS BIGINT)
      |      AS n_bullet,
      |    CAST(len(list_filter(lines,
      |      l -> regexp_matches(l, '(\.\.\.|…)[ \t\n\r\f\x0B]*$'))) AS BIGINT)
      |      AS n_ellipsis,
      |    CAST(len(list_filter(ws,
      |      w -> regexp_matches(w, '[A-Za-z]'))) AS BIGINT)
      |      AS n_alpha
      |  FROM f)""".stripMargin.replace("__WHERE__", where).trim

  /** DuckDB fragment: the q104 unigram-LM score chain ending in
    * `alldocs(doc_id, n_tokens, n_oov, avg_logp)` — shared by the
    * score report (q104) and the tercile split (q105) so the model
    * definition cannot drift between them. Vocab 512 = the q104
    * entry's test-scale choice.
    */
  private def lmScoreCteSql: String =
    """toks AS (
      |  SELECT doc_id, unnest(list_filter(string_split(
      |    regexp_replace(lower(text), '[ \t\n\r\f\x0B]+', ' ', 'g'), ' '),
      |    x -> x != '')) AS token
      |  FROM documents),
      |counts AS (SELECT token, count(*) AS cnt FROM toks
      |  GROUP BY token),
      |vocab AS (SELECT token, cnt FROM counts
      |  ORDER BY cnt DESC, token ASC LIMIT 512),
      |tot AS (SELECT (SELECT count(*) FROM toks) AS n_total,
      |  (SELECT count(*) FROM vocab) AS v_size),
      |lm_scored AS (
      |  SELECT t.doc_id, coalesce(v.cnt, 0) AS c,
      |    tot.n_total, tot.v_size
      |  FROM toks t LEFT JOIN vocab v ON t.token = v.token
      |  CROSS JOIN tot),
      |perdoc AS (
      |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
      |    CAST(sum(CASE WHEN c = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_oov,
      |    round(avg(ln((c + 1)::DOUBLE
      |      / (n_total + v_size + 1)::DOUBLE)), 6) AS avg_logp
      |  FROM lm_scored GROUP BY doc_id),
      |alldocs AS (
      |  SELECT d.doc_id,
      |    coalesce(p.n_tokens, 0) AS n_tokens,
      |    coalesce(p.n_oov, 0) AS n_oov,
      |    p.avg_logp
      |  FROM documents d LEFT JOIN perdoc p ON d.doc_id = p.doc_id)""".stripMargin

  /** DuckDB fragment: per-doc contamination counts (u: exploded
    * shingles, bench: the doc_id % 97 eval slice's distinct shingles,
    * cnt: per-doc hit counts) over a preceding `sh` CTE — shared by the
    * q71 report oracle and q86's composed screen.
    */
  private def contaminationCntSql: String =
    """u AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
      |bench AS (SELECT DISTINCT s FROM u WHERE doc_id % 97 = 0),
      |cnt AS (
      |  SELECT u.doc_id, count(b.s) AS n_cont
      |  FROM u LEFT JOIN bench b ON u.s = b.s
      |  GROUP BY u.doc_id)""".stripMargin

  /** DuckDB fragment: the q65/q72 portable byte-fold + Lehmer-mix tick
    * in [0, 10000) over a `key` column — shared by the q72 sample
    * oracle and q86's composed sample stage.
    */
  /** The q118/q120 fixed classifier-weight fixture — ONE definition so
    * the scoring query and the acceptance-gate query (and both DuckDB
    * oracles via [[qualityScoreCteSql]]) cannot drift. Exact binary
    * fractions on purpose: the per-doc weighted sum is then
    * order-independent bit-exact in any engine.
    */
  private val QualityFixtureWeights: Seq[(String, Double)] =
    Seq(("fast", 0.25), ("slow", -0.5), ("merge", 0.125),
      ("hash", -0.125), ("spark", 0.0625))

  /** DuckDB CTE block computing [[QualityFixtureWeights]]'s classifier
    * score as `scored(doc_id, quality_prob)` under the given bias —
    * shared by the q118 and q120 oracles (same token normalization as
    * q48/q104; only exp() carries the documented ~1-ulp 6-decimal
    * boundary exposure).
    */
  private def qualityScoreCteSql(bias: String): String = {
    val values = QualityFixtureWeights
      .map { case (t, w) => s"('$t', $w)" }.mkString(", ")
    s"""toks AS (
       |  SELECT doc_id, unnest(list_filter(string_split(
       |    regexp_replace(lower(text), '[ \\t\\n\\r\\f\\x0B]+', ' ', 'g'), ' '),
       |    x -> x != '')) AS token
       |  FROM documents),
       |w AS (
       |  SELECT token, CAST(wt AS DOUBLE) AS weight
       |  FROM (VALUES $values) v(token, wt)),
       |z AS (
       |  SELECT t.doc_id, sum(w.weight) AS z
       |  FROM toks t JOIN w ON t.token = w.token GROUP BY 1),
       |scored AS (
       |  SELECT d.doc_id,
       |    round(1.0 / (1.0 + exp(-(coalesce(z.z, 0.0) + ($bias)))), 6)
       |      AS quality_prob
       |  FROM documents d LEFT JOIN z ON d.doc_id = z.doc_id)""".stripMargin
  }

  private def mixedTickSql: String =
    """CAST((list_reduce(list_prepend(0::BIGINT,
      |    [ascii(key[i])::BIGINT FOR i IN range(1, length(key)+1)]),
      |    (acc, c) -> (acc * 257 + c) % 1000000007)
      |    * 48271) % 1000000007 % 10000 AS BIGINT)""".stripMargin.trim

  /** DuckDB fragment: q80's serpentine 8-bin packing over the global
    * (tokens desc, id) rank of `__SRC__(doc_id, text)` — shared by the
    * q80 oracle and q86's composed packing tail.
    */
  private def serpentineSql(src: String): String =
    """tk AS (
      |  SELECT doc_id,
      |    CAST(len(list_filter(string_split(text, ' '), x -> x != ''))
      |      AS INT) AS n_tokens
      |  FROM __SRC__),
      |rnk AS (
      |  SELECT doc_id, n_tokens,
      |    row_number() OVER (ORDER BY n_tokens DESC, doc_id ASC) - 1
      |      AS r0
      |  FROM tk)
      |SELECT doc_id, n_tokens,
      |  CAST(CASE WHEN r0 % 16 < 8 THEN r0 % 8
      |       ELSE 15 - (r0 % 16) END AS BIGINT) AS bin
      |FROM rnk ORDER BY doc_id""".stripMargin.replace("__SRC__", src)

  /** DuckDB oracle for [[graft.operators.Dedup.dedupChunks]] at a given
    * window size — shared by q87 (10-token windows for the short
    * synthetic docs) and q92 (the paper's 50-token granularity), so the
    * two entries cannot drift. Plain (non-interpolated) template +
    * replace: the SQL carries regex escapes an s-interpolator would eat.
    *
    * coalesce: a NULL text must report (0, 0, md5('')) like the Spark
    * side, not a NULL n_chunks from len(NULL).
    */
  /** DuckDB oracle for [[graft.operators.Dedup.dedupLines]] over the
    * derived multi-line view (see [[multiLineDocs]]): trimmed non-empty
    * lines, first occurrence by (doc_id, line index) survives,
    * newline-joined reassembly — the [[chunkDedupSql]] shape with
    * authored boundaries instead of token windows. */
  private def lineDedupSql: String =
    """WITH src AS (
      |  SELECT doc_id,
      |    replace(coalesce(text, ''), ' scan ', chr(10)) AS text
      |  FROM documents),
      |nrm AS (
      |  SELECT doc_id,
      |    list_filter(list_transform(
      |      regexp_split_to_array(text, '\r?\n'),
      |      x -> trim(x)), x -> x != '') AS tk
      |  FROM src),
      |ch AS (
      |  SELECT doc_id, unnest(generate_series(1, len(tk))) AS i, tk
      |  FROM nrm WHERE len(tk) > 0),
      |cstr AS (SELECT doc_id, i - 1 AS idx, tk[i] AS chunk FROM ch),
      |ranked AS (
      |  SELECT doc_id, idx, chunk,
      |    row_number() OVER (PARTITION BY chunk
      |      ORDER BY doc_id, idx) AS rn
      |  FROM cstr),
      |kept AS (SELECT doc_id, idx, chunk FROM ranked WHERE rn = 1),
      |out AS (
      |  SELECT doc_id, CAST(count(*) AS INT) AS n_kept,
      |    md5(string_agg(chunk, chr(10) ORDER BY idx)) AS dedup_md5
      |  FROM kept GROUP BY doc_id)
      |SELECT n.doc_id, CAST(len(tk) AS INT) AS n_chunks,
      |  CAST(coalesce(o.n_kept, 0) AS INT) AS n_kept,
      |  coalesce(o.dedup_md5, md5('')) AS dedup_md5
      |FROM nrm n LEFT JOIN out o ON n.doc_id = o.doc_id
      |ORDER BY n.doc_id""".stripMargin

  /** DuckDB CTE chain reproducing [[graft.operators.Sharding.dsirScore]]
    * over `documents` with the lang='en' slice as the DSIR target:
    * lowercased ws-collapsed tokens, unigram+bigram stream, the
    * engine-portable rolling-hash+Lehmer bucket (the cdc oracle's byte
    * fold, hence the same ASCII guard), add-one-smoothed per-bucket
    * log ratios over the COMPLETE bucket range, per-doc summed and
    * 6-decimal rounded. Ends with CTE `sc(doc_id, n_ngrams,
    * log_weight)` — incomplete (score-less docs absent), the final
    * SELECT completes it.
    */
  private def dsirCtes(buckets: Int): String =
    """guard AS (
      |  SELECT CASE WHEN bool_or(regexp_matches(coalesce(text, ''),
      |      '[^\x00-\x7f]'))
      |    THEN error('dsir oracle assumes ASCII text: ascii(code ' ||
      |      'point) diverges from the UTF-8 byte fold')
      |    ELSE 1 END AS ok
      |  FROM documents),
      |tok AS (
      |  SELECT doc_id, lang,
      |    list_filter(string_split(
      |      regexp_replace(lower(coalesce(text, '')),
      |        '[ \t\n\r\f\x0B]+', ' ', 'g'),
      |      ' '), x -> x != '') AS tk
      |  FROM documents, guard),
      |ng AS (
      |  SELECT doc_id, lang,
      |    list_concat(tk,
      |      CASE WHEN len(tk) >= 2
      |        THEN list_transform(range(1, len(tk)),
      |               i -> tk[i] || ' ' || tk[i + 1])
      |        ELSE []::VARCHAR[] END) AS ngs
      |  FROM tok),
      |f AS (
      |  SELECT doc_id, lang,
      |    ((list_reduce(list_prepend(0::BIGINT,
      |        [ascii(g[j])::BIGINT FOR j IN range(1, length(g) + 1)]),
      |        (acc, b) -> (acc * 257 + b) % 1000000007)
      |      * 48271) % 1000000007) % __B__ AS bucket
      |  FROM (SELECT doc_id, lang, unnest(ngs) AS g FROM ng)),
      |tcnt AS (SELECT bucket, count(*) AS tc FROM f
      |         WHERE lang = 'en' GROUP BY bucket),
      |rcnt AS (SELECT bucket, count(*) AS rc FROM f GROUP BY bucket),
      |tot AS (SELECT (SELECT coalesce(sum(tc), 0) FROM tcnt) AS tt,
      |               (SELECT coalesce(sum(rc), 0) FROM rcnt) AS rt),
      |w AS (
      |  SELECT b.bucket,
      |    round(ln((coalesce(tcnt.tc, 0) + 1)::DOUBLE
      |            / (tot.tt + __B__)::DOUBLE)
      |        - ln((coalesce(rcnt.rc, 0) + 1)::DOUBLE
      |            / (tot.rt + __B__)::DOUBLE), 6) AS log_ratio
      |  FROM (SELECT unnest(range(__B__)) AS bucket) b
      |  LEFT JOIN tcnt ON b.bucket = tcnt.bucket
      |  LEFT JOIN rcnt ON b.bucket = rcnt.bucket, tot),
      |sc AS (
      |  SELECT f.doc_id, count(*) AS n_ngrams,
      |    round(sum(w.log_ratio), 6) AS log_weight
      |  FROM f JOIN w ON f.bucket = w.bucket
      |  GROUP BY f.doc_id)""".stripMargin
      .replace("__B__", buckets.toString)

  /** DuckDB oracle for [[graft.operators.Retrieval.bm25TopK]] over the
    * three fixture probe queries — shared by q129 (inline) and q133
    * (persisted-index probe, output-identical by contract). */
  private def bm25TopKSql: String =
    """WITH tok AS (
          |  SELECT doc_id,
          |    unnest(list_filter(string_split(
          |      regexp_replace(lower(coalesce(text, '')),
          |        '[ \t\n\r\f\x0B]+', ' ', 'g'),
          |      ' '), x -> x != '')) AS token
          |  FROM documents),
          |tf AS (SELECT doc_id, token, count(*) AS tf
          |       FROM tok GROUP BY 1, 2),
          |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
          |stats AS (
          |  SELECT (SELECT count(*) FROM documents) AS n_docs,
          |    (SELECT count(*) FROM tok)::DOUBLE
          |      / (SELECT count(*) FROM documents) AS avgdl),
          |q(query_id, qtext) AS (VALUES
          |  (0, 'spark hash join'),
          |  (1, 'window sort merge'),
          |  (2, 'stream batch dup')),
          |qt AS (
          |  SELECT DISTINCT query_id,
          |    unnest(list_filter(string_split(
          |      regexp_replace(lower(qtext),
          |        '[ \t\n\r\f\x0B]+', ' ', 'g'),
          |      ' '), x -> x != '')) AS token
          |  FROM q),
          |dfreq AS (
          |  SELECT token, count(*) AS df FROM tf
          |  WHERE token IN (SELECT token FROM qt) GROUP BY 1),
          |idf AS (
          |  SELECT token,
          |    round(ln(1 + (stats.n_docs - df + 0.5) / (df + 0.5)), 6)
          |      AS idf
          |  FROM dfreq, stats),
          |cand AS (
          |  SELECT qt.query_id, tf.doc_id,
          |    idf.idf * tf.tf * (1.2 + 1.0)
          |      / (tf.tf + 1.2 * (1.0 - 0.75
          |           + 0.75 * dl.dl / stats.avgdl)) AS part
          |  FROM tf JOIN qt USING (token) JOIN idf USING (token)
          |    JOIN dl USING (doc_id), stats),
          |scored AS (
          |  SELECT query_id, doc_id, round(sum(part), 6) AS score
          |  FROM cand GROUP BY 1, 2),
          |ranked AS (
          |  SELECT query_id, doc_id, score,
          |    row_number() OVER (PARTITION BY query_id
          |      ORDER BY score DESC, doc_id ASC) AS rank
          |  FROM scored)
          |SELECT CAST(query_id AS INT) AS query_id, doc_id, score,
          |  CAST(rank AS INT) AS rank
          |FROM ranked WHERE rank <= 10
          |ORDER BY query_id, rank""".stripMargin

  /** DuckDB oracle for the hybrid RRF queries — q130 (inline brute
    * legs) and q134 (persisted BM25 + full-probe IVF legs, exact by
    * contract): q129's BM25 arithmetic with self-hits excluded, q37's
    * exact cosine ranking, round(Σ 1/(60+rank), 6) fusion. */
  private def hybridRrfSql: String =
    s"""WITH tok AS (
          |  SELECT doc_id,
          |    unnest(list_filter(string_split(
          |      regexp_replace(lower(coalesce(text, '')),
          |        '${graft.operators.TextAnalysis.WsPattern}+', ' ', 'g'),
          |      ' '), x -> x != '')) AS token
          |  FROM documents),
          |tf AS (SELECT doc_id, token, count(*) AS tf
          |       FROM tok GROUP BY 1, 2),
          |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
          |stats AS (
          |  SELECT (SELECT count(*) FROM documents) AS n_docs,
          |    (SELECT count(*) FROM tok)::DOUBLE
          |      / (SELECT count(*) FROM documents) AS avgdl),
          |qq AS (SELECT doc_id AS query_id, text AS qtext
          |       FROM documents WHERE doc_id < 3),
          |qt AS (
          |  SELECT DISTINCT query_id,
          |    unnest(list_filter(string_split(
          |      regexp_replace(lower(coalesce(qtext, '')),
          |        '${graft.operators.TextAnalysis.WsPattern}+', ' ', 'g'),
          |      ' '), x -> x != '')) AS token
          |  FROM qq),
          |dfreq AS (
          |  SELECT token, count(*) AS df FROM tf
          |  WHERE token IN (SELECT token FROM qt) GROUP BY 1),
          |idf AS (
          |  SELECT token,
          |    round(ln(1 + (stats.n_docs - df + 0.5) / (df + 0.5)), 6)
          |      AS idf
          |  FROM dfreq, stats),
          |bcand AS (
          |  SELECT qt.query_id, tf.doc_id,
          |    idf.idf * tf.tf * (1.2 + 1.0)
          |      / (tf.tf + 1.2 * (1.0 - 0.75
          |           + 0.75 * dl.dl / stats.avgdl)) AS part
          |  FROM tf JOIN qt USING (token) JOIN idf USING (token)
          |    JOIN dl USING (doc_id), stats
          |  WHERE tf.doc_id != qt.query_id),
          |bscored AS (
          |  SELECT query_id, doc_id, round(sum(part), 6) AS score
          |  FROM bcand GROUP BY 1, 2),
          |lex AS (
          |  SELECT query_id, doc_id, rank FROM (
          |    SELECT query_id, doc_id,
          |      row_number() OVER (PARTITION BY query_id
          |        ORDER BY score DESC, doc_id ASC) AS rank
          |    FROM bscored) WHERE rank <= 20),
          |$vecNormSql,
          |sems AS (
          |  SELECT q2.vec_id AS query_id, c.vec_id AS doc_id,
          |    ${cosineSql("q2", "c")}
          |  FROM v q2 JOIN v c
          |    ON q2.vec_id < 3 AND q2.vec_id != c.vec_id),
          |sem AS (
          |  SELECT query_id, doc_id, rank FROM (
          |    SELECT query_id, doc_id,
          |      row_number() OVER (PARTITION BY query_id
          |        ORDER BY cosine DESC, doc_id ASC) AS rank
          |    FROM sems) WHERE rank <= 20),
          |fused AS (
          |  SELECT query_id, doc_id,
          |    round(sum(1.0 / (60 + rank)), 6) AS rrf
          |  FROM (SELECT * FROM lex UNION ALL SELECT * FROM sem)
          |  GROUP BY 1, 2),
          |ranked AS (
          |  SELECT query_id, doc_id, rrf,
          |    row_number() OVER (PARTITION BY query_id
          |      ORDER BY rrf DESC, doc_id ASC) AS rank
          |  FROM fused)
          |SELECT query_id, doc_id, rrf, CAST(rank AS INT) AS rank
          |FROM ranked WHERE rank <= 10
          |ORDER BY query_id, rank""".stripMargin

  private def chunkDedupSql(chunkTokens: Int): String =
    """WITH nrm AS (
      |  SELECT doc_id,
      |    list_filter(string_split(
      |      regexp_replace(lower(coalesce(text, '')),
      |        '[ \t\n\r\f\x0B]+', ' ', 'g'),
      |      ' '), x -> x != '') AS tk
      |  FROM documents),
      |ch AS (
      |  SELECT doc_id,
      |    unnest(generate_series(0,
      |      CAST(ceil(len(tk) / __N__.0) AS INT) - 1)) AS idx, tk
      |  FROM nrm WHERE len(tk) > 0),
      |cstr AS (
      |  SELECT doc_id, idx,
      |    array_to_string(tk[idx*__N__+1 : idx*__N__+__N__], ' ') AS chunk
      |  FROM ch),
      |ranked AS (
      |  SELECT doc_id, idx, chunk,
      |    row_number() OVER (PARTITION BY chunk
      |      ORDER BY doc_id, idx) AS rn
      |  FROM cstr),
      |kept AS (SELECT doc_id, idx, chunk FROM ranked WHERE rn = 1),
      |out AS (
      |  SELECT doc_id, CAST(count(*) AS INT) AS n_kept,
      |    md5(string_agg(chunk, ' ' ORDER BY idx)) AS dedup_md5
      |  FROM kept GROUP BY doc_id)
      |SELECT n.doc_id,
      |  CAST(CASE WHEN len(tk) = 0 THEN 0
      |       ELSE ceil(len(tk) / __N__.0) END AS INT) AS n_chunks,
      |  CAST(coalesce(o.n_kept, 0) AS INT) AS n_kept,
      |  coalesce(o.dedup_md5, md5('')) AS dedup_md5
      |FROM nrm n LEFT JOIN out o ON n.doc_id = o.doc_id
      |ORDER BY n.doc_id""".stripMargin
      .replace("__N__", chunkTokens.toString)

  /** DuckDB oracle for [[graft.operators.Dedup.dedupChunksCDC]] at a
    * given divisor — shared by q88 (divisor 8 for the short synthetic
    * docs) and q93 (the paper-safe 50). Content-defined chunking: a
    * chunk ends at token i iff (rollingHash(token)*48271) % 1e9+7 %
    * divisor == 0 — the same Rabin-Karp byte fold as q44 plus the
    * Lehmer mix, all 64-bit integer math.
    */
  private def cdcChunkDedupSql(divisor: Int): String =
    """WITH nrm AS (
      |  SELECT doc_id,
      |    list_filter(string_split(
      |      regexp_replace(lower(coalesce(text, '')),
      |        '[ \t\n\r\f\x0B]+', ' ', 'g'),
      |      ' '), x -> x != '') AS tk
      |  FROM documents),
      |-- the th CTE hashes Unicode CODE POINTS via ascii(t[j]) while
      |-- the Spark kernel folds UTF-8 BYTES; they agree only on pure
      |-- ASCII, so a non-ASCII dataset must fail LOUDLY here instead
      |-- of surfacing as an inscrutable hash mismatch
      |guard AS (
      |  SELECT CASE WHEN bool_or(regexp_matches(coalesce(text, ''),
      |      '[^\x00-\x7f]'))
      |    THEN error('cdc oracle assumes ASCII text: ascii(code ' ||
      |      'point) diverges from the UTF-8 byte fold')
      |    ELSE 1 END AS ok
      |  FROM documents),
      |th AS (
      |  SELECT doc_id, tk,
      |    list_transform(tk, t ->
      |      (list_reduce(list_prepend(0::BIGINT,
      |         list_transform(range(1, length(t) + 1),
      |           j -> ascii(t[j])::BIGINT)),
      |         (acc, b) -> (acc * 257 + b) % 1000000007)
      |       * 48271) % 1000000007 % __D__) AS hb
      |  FROM nrm, guard),
      |cuts AS (
      |  SELECT doc_id, tk,
      |    CASE WHEN len(bnd) > 0 AND bnd[len(bnd)] = len(tk) THEN bnd
      |         ELSE list_append(bnd, len(tk)) END AS ends
      |  FROM (SELECT doc_id, tk,
      |          list_filter(range(1, len(tk) + 1), i -> hb[i] = 0)
      |            AS bnd
      |        FROM th WHERE len(tk) > 0)),
      |cstr AS (
      |  SELECT doc_id, k - 1 AS idx,
      |    array_to_string(
      |      tk[(CASE WHEN k = 1 THEN 0 ELSE ends[k - 1] END) + 1
      |         : ends[k]], ' ') AS chunk
      |  FROM (SELECT doc_id, tk, ends,
      |          unnest(generate_series(1, len(ends))) AS k
      |        FROM cuts)),
      |ranked AS (
      |  SELECT doc_id, idx, chunk,
      |    row_number() OVER (PARTITION BY chunk
      |      ORDER BY doc_id, idx) AS rn
      |  FROM cstr),
      |kept AS (SELECT doc_id, idx, chunk FROM ranked WHERE rn = 1),
      |out AS (
      |  SELECT doc_id, CAST(count(*) AS INT) AS n_kept,
      |    md5(string_agg(chunk, ' ' ORDER BY idx)) AS dedup_md5
      |  FROM kept GROUP BY doc_id)
      |SELECT n.doc_id,
      |  CAST(coalesce(c.n_ch, 0) AS INT) AS n_chunks,
      |  CAST(coalesce(o.n_kept, 0) AS INT) AS n_kept,
      |  coalesce(o.dedup_md5, md5('')) AS dedup_md5
      |FROM nrm n
      |LEFT JOIN (SELECT doc_id, len(ends) AS n_ch FROM cuts) c
      |  ON n.doc_id = c.doc_id
      |LEFT JOIN out o ON n.doc_id = o.doc_id
      |ORDER BY n.doc_id""".stripMargin
      .replace("__D__", divisor.toString)

  private def shingleSqlWhere(where: String): String =
    s"""nrm AS (
      |  SELECT doc_id,
      |    regexp_replace(lower(text), '[ \\t\\n\\r\\f\\x0B]+', ' ', 'g') AS t
      |  FROM documents $where),
      |toks AS (
      |  SELECT doc_id,
      |    list_filter(string_split(t, ' '), x -> x != '') AS tk
      |  FROM nrm),
      |sh AS (
      |  SELECT doc_id,
      |    CASE WHEN len(tk) = 0 THEN []
      |    -- zero-token docs get NO shingle (the kernel's semantics);
      |    -- without the CASE the comprehension yields [''] and an
      |    -- empty-vs-empty pair would score 1.0 in DuckDB only
      |    ELSE list_distinct(
      |      [array_to_string(tk[i+1:i+3], ' ')
      |       FOR i IN range(0, greatest(len(tk)-3, 0)+1)]) END AS shingles
      |  FROM toks)""".stripMargin

  /** q42 oracle: same stopword-hit argmax as
    * [[graft.operators.TextAnalysis.languageId]], ties to the
    * lexicographically-first language.
    */
  private def langIdSql: String = {
    val scores = TextAnalysis.LangMarkers.map { case (lang, words) =>
      s"CAST(len(regexp_extract_all(lower(text), '\\b$words\\b')) AS INT)" +
        s" AS score_$lang"
    }.mkString(",\n    ")
    val langs = TextAnalysis.LangMarkers.map(_._1)
    // fold in Seq order: strictly-greater wins, matching the Spark fold
    val bestLang = langs.foldLeft(("CAST(-1 AS INT)", "'und'")) {
      case ((bs, bl), lang) =>
        (s"(CASE WHEN score_$lang > $bs THEN score_$lang ELSE $bs END)",
          s"(CASE WHEN score_$lang > $bs THEN '$lang' ELSE $bl END)")
    }
    s"""SELECT doc_id, ${bestLang._2} AS lang_pred,
       |       ${bestLang._1} AS score
       |FROM (SELECT doc_id,
       |    ${scores}
       |  FROM documents) s
       |ORDER BY doc_id""".stripMargin
  }
}
