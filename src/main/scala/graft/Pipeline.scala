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
}
