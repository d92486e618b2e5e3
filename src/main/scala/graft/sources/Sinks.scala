package graft.sources

import java.util.Properties

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.DataFrame

/** Sinks (SURVEY.md §2 ops 4-5).
  *
  * Op 4 mirrors the reference's `UNLOAD … PARALLEL OFF` + boto3 rename dance
  * (reference main.py:232-260): a single stable-named CSV artifact. The
  * single-writer `coalesce(1)` bottleneck is accepted ONLY here, as the
  * reference does — the artifact is small, post-aggregation output. Never
  * use this on a fact-sized DataFrame.
  *
  * Op 5 replaces the reference's psql `\COPY` subprocess (reference
  * main.py:296-309) with Spark's batched JDBC writer — executors write in
  * parallel, `batchsize` plays the role of the bulk path that turned a >2h
  * row-insert load into ~5s (reference main.py:321-322).
  */
object Sinks {

  /** Op 4: write exactly one CSV file named `fileName` inside `dir`
    * (default `count.csv`, like the reference's renamed `count000`).
    */
  def singleFileCsv(df: DataFrame, dir: String,
      fileName: String = "count.csv", header: Boolean = false): Unit = {
    val tmp = s"$dir/_tmp_single_csv"
    df.coalesce(1).write.mode("overwrite")
      .option("header", header.toString).csv(tmp)
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    val fs = FileSystem.get(new java.net.URI(tmp), conf)
    val part = fs.globStatus(new Path(s"$tmp/part-*"))(0).getPath
    val dest = new Path(s"$dir/$fileName")
    if (fs.exists(dest)) fs.delete(dest, false)
    fs.rename(part, dest)
    fs.delete(new Path(tmp), true)
  }

  /** Op 5: JDBC/warehouse sink, batched. */
  def jdbc(df: DataFrame, url: String, table: String,
      user: String = "", password: String = "",
      batchSize: Int = 10000, mode: String = "append"): Unit = {
    val props = new Properties()
    if (user.nonEmpty) props.setProperty("user", user)
    if (password.nonEmpty) props.setProperty("password", password)
    props.setProperty("batchsize", batchSize.toString)
    df.write.mode(mode).jdbc(url, table, props)
  }

  /** Ops 22-23, serving tier: execute constraint/index DDL against the
    * JDBC target after the load — the reference adds PKs/FKs and 12 index
    * families on RDS once the tables are populated (reference
    * main.py:499-552). Driver-side, one statement at a time (DDL is
    * catalog metadata, not data movement). Statements are plain ANSI
    * single-clause ALTERs/CREATEs so they run on any target dialect.
    *
    * @param ignoreErrors continue past per-statement failures — the
    *        drop-if-exists semantics for pre-load cleanup on dialects
    *        without `IF EXISTS`. Ignored statements are logged so a
    *        systematically rejected batch (e.g. CASCADE syntax on a
    *        dialect without it) is visible, not silent.
    */
  def servingDdl(url: String, statements: Seq[String],
      user: String = "", password: String = "",
      ignoreErrors: Boolean = false): Unit = {
    val props = new Properties()
    if (user.nonEmpty) props.setProperty("user", user)
    if (password.nonEmpty) props.setProperty("password", password)
    val conn = java.sql.DriverManager.getConnection(url, props)
    // WARN, not INFO: every entry point runs at WARN-or-quieter log
    // level, so an INFO line here would make ignored failures silent in
    // practice — the opposite of the "visible, not silent" contract.
    val log = org.slf4j.LoggerFactory.getLogger(Sinks.getClass)
    var ignored = 0
    try {
      val st = conn.createStatement()
      try statements.foreach { s =>
        try st.execute(s)
        catch {
          case e: java.sql.SQLException if ignoreErrors =>
            ignored += 1
            log.warn(s"servingDdl ignored [$s]: ${e.getMessage}")
        }
      } finally st.close()
    } finally conn.close()
    if (ignored > 0)
      log.warn(s"servingDdl: $ignored of ${statements.size} statements " +
        "failed and were ignored (ignoreErrors=true)")
  }

  /** Pre-load teardown of the serving schema (reference main.py:85-92:
    * `DROP TABLE IF EXISTS %s CASCADE` over every serving table before
    * recreating). Needed for re-runs: once the FK constraints exist, a
    * plain per-table overwrite DROP is rejected because other tables
    * reference it. Pass `cascade = false` on dialects without the
    * CASCADE clause (Derby, SQL Server) — the list is ordered
    * children-before-parents (cubes → fact → dims) so plain drops clear
    * the FK web too.
    */
  def dropServingTablesDdl(
      granularities: Seq[String] = Seq("week", "month", "quarter", "year"),
      cascade: Boolean = true): Seq[String] = {
    val c = if (cascade) " CASCADE" else ""
    (granularities.map(g => s"agg_risk_country_$g") ++
      Seq("fact_count", "dim_date", "dim_asn", "dim_country", "dim_risk"))
      .map(t => s"DROP TABLE $t$c")
  }

  /** Dim-only teardown for the weekly E3 refresh (reference
    * main.py:314-316 drops the ASN table CASCADE before reloading):
    * once [[constraintDdl]]'s fact FKs exist, overwriting a dim table
    * needs the referencing constraints cleared first. Children-first
    * order; on cascade-less dialects prepend [[dropDimConstraintsDdl]]
    * (a table drop alone cannot clear an INBOUND foreign key).
    */
  def dropDimTablesDdl(cascade: Boolean = true): Seq[String] = {
    val c = if (cascade) " CASCADE" else ""
    Seq("dim_asn", "dim_country", "dim_risk").map(t => s"DROP TABLE $t$c")
  }

  /** The dim-scoped slice of [[constraintDdl]] — everything except the
    * dim_date PK and the fact→date FK (the refresh never touches
    * dim_date). What [[graft.RefDataMain.refresh]] re-applies after its
    * teardown so a weekly refresh leaves the serving schema as
    * constrained as it found it.
    */
  def dimConstraintDdl(
      granularities: Seq[String] = Seq("week", "month", "quarter", "year"),
      quote: String => String = identity): Seq[String] =
    constraintDdl(granularities, quote)
      .filterNot(_.contains("dim_date"))

  /** Drop every [[constraintDdl]] constraint that REFERENCES a dim
    * table — the dialect-neutral way to free the dims for an overwrite
    * (CASCADE does this implicitly on postgres; Derby and friends need
    * the explicit constraint drops).
    */
  def dropDimConstraintsDdl(
      granularities: Seq[String] = Seq("week", "month", "quarter", "year"))
      : Seq[String] =
    Seq(
      "ALTER TABLE fact_count DROP CONSTRAINT fk_count_risk",
      "ALTER TABLE fact_count DROP CONSTRAINT fk_count_country",
      "ALTER TABLE fact_count DROP CONSTRAINT fk_count_asn",
      "ALTER TABLE dim_asn DROP CONSTRAINT fk_country_asn") ++
    granularities.flatMap { g =>
      Seq(s"ALTER TABLE agg_risk_country_$g DROP CONSTRAINT " +
            s"fk_cube_risk_$g",
          s"ALTER TABLE agg_risk_country_$g DROP CONSTRAINT " +
            s"fk_cube_country_$g")
    }

  /** The reference's serving-tier constraint set (reference
    * main.py:499-527), one single-clause statement each (the reference's
    * multi-clause postgres ALTERs split so every target dialect accepts
    * them): dimension PKs, the asn→country FK, the four fact FKs, and the
    * per-granularity cube FKs.
    *
    * @param quote column-identifier quoter. The Spark JDBC writer QUOTES
    *              column names on CREATE, so case-folding targets
    *              (postgres folds unquoted → lowercase: identity works;
    *              Derby folds → UPPER: pass a quoting fn) may need it.
    */
  def constraintDdl(
      granularities: Seq[String] = Seq("week", "month", "quarter", "year"),
      quote: String => String = identity): Seq[String] = {
    val q = quote
    Seq(
      s"ALTER TABLE dim_risk ADD PRIMARY KEY (${q("id")})",
      s"ALTER TABLE dim_country ADD PRIMARY KEY (${q("id")})",
      s"ALTER TABLE dim_asn ADD PRIMARY KEY (${q("number")})",
      s"ALTER TABLE dim_asn ADD CONSTRAINT fk_country_asn " +
        s"FOREIGN KEY (${q("country")}) REFERENCES dim_country(${q("id")})",
      s"ALTER TABLE dim_date ADD PRIMARY KEY (${q("date")})",
      s"ALTER TABLE fact_count ADD CONSTRAINT fk_count_risk " +
        s"FOREIGN KEY (${q("risk")}) REFERENCES dim_risk(${q("id")})",
      s"ALTER TABLE fact_count ADD CONSTRAINT fk_count_country " +
        s"FOREIGN KEY (${q("country")}) REFERENCES dim_country(${q("id")})",
      s"ALTER TABLE fact_count ADD CONSTRAINT fk_count_asn " +
        s"FOREIGN KEY (${q("asn")}) REFERENCES dim_asn(${q("number")})",
      s"ALTER TABLE fact_count ADD CONSTRAINT fk_count_time " +
        s"FOREIGN KEY (${q("date")}) REFERENCES dim_date(${q("date")})") ++
    granularities.flatMap { g =>
      Seq(
        s"ALTER TABLE agg_risk_country_$g ADD CONSTRAINT " +
          s"fk_cube_risk_$g FOREIGN KEY (${q("risk")}) " +
          s"REFERENCES dim_risk(${q("id")})",
        s"ALTER TABLE agg_risk_country_$g ADD CONSTRAINT " +
          s"fk_cube_country_$g FOREIGN KEY (${q("country")}) " +
          s"REFERENCES dim_country(${q("id")})")
    }
  }

  /** The reference's 12 serving-index families (reference
    * main.py:530-552): 7 on the fact, 5 per cube granularity, including
    * the DESC-leading date composites that serve `/api/v1/count`.
    * See [[constraintDdl]] for `quote`.
    */
  def indexDdl(
      granularities: Seq[String] = Seq("week", "month", "quarter", "year"),
      quote: String => String = identity): Seq[String] = {
    val q = quote
    Seq(
      s"CREATE INDEX idx_date_country ON fact_count" +
        s"(${q("date")} DESC, ${q("country")})",
      s"CREATE INDEX idx_all ON fact_count" +
        s"(${q("date")}, ${q("country")}, ${q("risk")}, ${q("asn")})",
      s"CREATE INDEX idx_all_desc ON fact_count" +
        s"(${q("date")} DESC, ${q("country")}, ${q("risk")}, ${q("asn")})",
      s"CREATE INDEX idx_risk ON fact_count(${q("risk")})",
      s"CREATE INDEX idx_asn ON fact_count(${q("asn")})",
      s"CREATE INDEX idx_country ON fact_count(${q("country")})",
      s"CREATE INDEX idx_date ON fact_count(${q("date")})") ++
    granularities.flatMap { g =>
      Seq(
        s"CREATE INDEX idx_all_cube_$g ON agg_risk_country_$g" +
          s"(${q("date")}, ${q("country")}, ${q("risk")})",
        s"CREATE INDEX idx_all_desc_cube_$g ON agg_risk_country_$g" +
          s"(${q("date")} DESC, ${q("country")}, ${q("risk")})",
        s"CREATE INDEX idx_risk_cube_$g ON agg_risk_country_$g" +
          s"(${q("risk")})",
        s"CREATE INDEX idx_country_cube_$g ON agg_risk_country_$g" +
          s"(${q("country")})",
        s"CREATE INDEX idx_date_cube_$g ON agg_risk_country_$g" +
          s"(${q("date")})")
    }
  }

  /** Ops 22-23 analog: partitioned, sorted parquet — the file-world
    * equivalent of the reference's date/country indexes (reference
    * main.py:530-552): `partitionBy` gives partition pruning on the hot
    * date predicate; the sort gives parquet min/max row-group pruning on
    * country/risk.
    */
  def indexedParquet(df: DataFrame, dir: String,
      partitionCols: Seq[String], sortCols: Seq[String]): Unit = {
    import org.apache.spark.sql.functions.col
    df.repartition(partitionCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(dir)
  }
}
