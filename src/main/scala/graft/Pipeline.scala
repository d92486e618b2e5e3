package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Schemas
import graft.operators.{DimRepair, RiskAggregation, StarSchema}
import graft.sources.{Sinks, Sources}

/** The reference's full lifecycle (SURVEY.md §3) as one Spark job.
  *
  * E1 `Aggregator.run()` (reference main.py:71-84): manifest → COPY →
  * dedup+count aggregate → amplified update-join → single-file UNLOAD.
  * E2 `LoadToRDS.run()` (reference main.py:279-288): ref-data load →
  * star schema → dim_date + 4× CUBE + sentinels → dimension repair →
  * serve.
  *
  * Differences by design: one engine instead of two (no S3 CSV hop between
  * aggregation and serving tiers — the fact flows as a DataFrame); the
  * dimension-repair row loop becomes a distributed anti-join; `\COPY`
  * subprocesses become the batched JDBC writer. The single-file CSV
  * artifact is still produced (it is part of the reference's output
  * contract), but from the post-aggregation output only.
  *
  * The staging-table DDL dance (reference main.py:87-92, :342-376 —
  * CREATE/DROP/RENAME staging→final) maps to write-temp-then-atomic-rename
  * at the file layer, which `.mode("overwrite")` + `FileSystem.rename`
  * already give us in [[Sinks.singleFileCsv]]; catalog-table variants would
  * be `spark.sql("ALTER TABLE ... RENAME")` against a metastore.
  */
object Pipeline {

  case class Output(
      counts: DataFrame,
      dimDate: DataFrame,
      cubes: Map[String, DataFrame],
      dimCountry: DataFrame,
      dimAsn: DataFrame)

  /** Run end-to-end from a raw feed + reference dims to all serving
    * tables, writing artifacts under `outDir`.
    *
    * @param threshold `country_count_threshold` (reference main.py:64-67)
    */
  def run(spark: SparkSession, feedPaths: Seq[String], dimRisk: DataFrame,
      dimCountry: DataFrame, dimAsn: DataFrame, outDir: String,
      threshold: Long = 100L): Output = {
    // E1: ingest + flagship aggregation + amplified counts. Persist: the
    // aggregate feeds the unload artifact, the fact table, 4 cubes, and 2
    // repairs — one aggregation, many consumers.
    val logentry = Sources.logentryCsv(spark, feedPaths)
    val counts = RiskAggregation.run(logentry, dimRisk, threshold)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // UNLOAD artifact: single stable-named CSV (reference main.py:232-260)
    Sinks.singleFileCsv(counts, s"$outDir/unload")

    // E2: TIMESTAMP→DATE narrowing across the tier hop (SURVEY.md §1)
    val fact = counts.withColumn("date", to_date(col("date")))

    // star schema: date dimension + 4 cube tables with sentinels
    val dimDate = StarSchema.dimDate(fact)
    val cubes = StarSchema.buildCubes(fact)

    // dimension repair via distributed anti-joins
    val repairedCountry = DimRepair.repairCountries(fact, dimCountry)
    val repairedAsn = DimRepair.repairAsns(fact, dimAsn)

    // serve: partitioned/sorted parquet is the file-world analog of the
    // reference's 12 index families (reference main.py:530-552)
    Sinks.indexedParquet(fact, s"$outDir/fact_count",
      partitionCols = Seq("date"), sortCols = Seq("country", "risk"))
    cubes.foreach { case (g, df) =>
      df.write.mode("overwrite").parquet(s"$outDir/agg_risk_country_$g")
    }
    dimDate.write.mode("overwrite").parquet(s"$outDir/dim_date")
    repairedCountry.write.mode("overwrite").parquet(s"$outDir/dim_country")
    repairedAsn.write.mode("overwrite").parquet(s"$outDir/dim_asn")

    Output(counts, dimDate, cubes, repairedCountry, repairedAsn)
  }

  /** E2's serving hand-off (reference main.py:279-288 →
    * `LoadToRDS.run()`): write every serving table to the JDBC target,
    * then apply the post-load constraint/index DDL (reference
    * main.py:499-552). The reference shells out to psql per table; here
    * the batched JDBC writer loads them in parallel and
    * [[Sinks.servingDdl]] replays the DDL.
    *
    * @param ddl post-load statements; defaults to the reference's full
    *            constraint+index family (postgres-cased — pass
    *            dialect-quoted statements for targets that fold
    *            differently, see [[Sinks.constraintDdl]])
    * @param preDdl best-effort teardown BEFORE the writes (per-statement
    *            errors ignored, like DROP IF EXISTS). Without it a
    *            SECOND run fails: the first run's FKs block the
    *            overwrite's per-table drop, and re-applying `ddl` would
    *            collide with existing constraint names (the reference
    *            drops everything CASCADE first, main.py:85-92)
    */
  def serveJdbc(out: Output, dimRisk: DataFrame, url: String,
      user: String = "", password: String = "",
      ddl: Seq[String] = Sinks.constraintDdl() ++ Sinks.indexDdl(),
      preDdl: Seq[String] = Sinks.dropServingTablesDdl())
      : Unit = {
    if (preDdl.nonEmpty)
      Sinks.servingDdl(url, preDdl, user, password, ignoreErrors = true)
    val fact = out.counts.withColumn("date", to_date(col("date")))
    Sinks.jdbc(dimRisk, url, "dim_risk", user, password,
      mode = "overwrite")
    Sinks.jdbc(out.dimCountry, url, "dim_country", user, password,
      mode = "overwrite")
    Sinks.jdbc(out.dimAsn, url, "dim_asn", user, password,
      mode = "overwrite")
    Sinks.jdbc(out.dimDate, url, "dim_date", user, password,
      mode = "overwrite")
    Sinks.jdbc(fact, url, "fact_count", user, password,
      mode = "overwrite")
    out.cubes.foreach { case (g, df) =>
      Sinks.jdbc(df, url, s"agg_risk_country_$g", user, password,
        mode = "overwrite")
    }
    if (ddl.nonEmpty) Sinks.servingDdl(url, ddl, user, password)
  }
}
