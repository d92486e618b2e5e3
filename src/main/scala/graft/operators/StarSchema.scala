package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.model.Schemas.Sentinels

/** Serving-tier star-schema build (SURVEY.md §2 ops 13-16).
  *
  * The reference materializes four pre-aggregated CUBE tables
  * (`agg_risk_country_{week,month,quarter,year}`, reference main.py:362-368,
  * :379-384, :402-407) plus a derived date dimension (reference
  * main.py:390-401), then rewrites rollup NULLs to "global" sentinel members
  * (reference main.py:408-421).
  *
  * Scale notes: the fact is persisted once and reused across the four
  * granularities — four cube aggregations over one materialization instead of
  * four fact scans. Each `cube()` is planned as an Expand + two-phase
  * HashAggregate (partial map-side, final after one shuffle); at 100 TB the
  * partial aggregate collapses the fact before the exchange.
  */
object StarSchema {

  val Granularities: Seq[String] = Seq("week", "month", "quarter", "year")

  /** Op 13: one CUBE rollup at granularity g ∈ {week,month,quarter,year}:
    * `GROUP BY CUBE(date_trunc(g, date), country, risk)` with SUM(count),
    * SUM(count_amplified) — all 8 grouping sets incl. the grand total
    * (reference main.py:402-407).
    */
  def cubeRollup(fact: DataFrame, granularity: String): DataFrame =
    fact
      .cube(
        to_date(date_trunc(granularity, col("date"))).as("date"),
        col("country"), col("risk"))
      .agg(
        sum(col("count")).as("count"),
        sum(col("count_amplified")).as("count_amplified"))
      .select("date", "risk", "country", "count", "count_amplified")

  /** Op 14: rollup-NULL → sentinel rewrite (reference main.py:408-417).
    * NULL risk → 100 ("global"), NULL country → 'T' ("global"); date-NULL
    * rows are intentionally left NULL. Like the reference, this conflates
    * real NULL data with rollup NULLs — `grouping()` could distinguish, but
    * parity says coalesce.
    */
  def sentinelRewrite(agg: DataFrame): DataFrame =
    agg
      .withColumn("risk", coalesce(col("risk"), lit(Sentinels.GlobalRisk)))
      .withColumn("country",
        coalesce(col("country"), lit(Sentinels.GlobalCountry)))

  /** Ops 13-14 over all four granularities, reusing one persisted fact.
    * Postgres `ORDER BY date DESC` is NULLS FIRST → `desc_nulls_first` to
    * match the reference's insert order (reference main.py:406).
    */
  def buildCubes(fact: DataFrame): Map[String, DataFrame] = {
    val cached = fact.persist(StorageLevel.MEMORY_AND_DISK)
    Granularities.map { g =>
      g -> sentinelRewrite(cubeRollup(cached, g))
        .orderBy(col("date").desc_nulls_first, col("country"))
    }.toMap
  }

  /** Ops 15-16: date-dimension derivation (reference main.py:390-401).
    * Distinct dates + calendar attributes; Postgres EXTRACT(WEEK) is ISO week
    * (`weekofyear` matches) and `date_trunc('week')` starts Monday (Spark
    * matches); `week_end = week_start + 6 days`.
    */
  def dimDate(fact: DataFrame): DataFrame = {
    val weekStart = to_date(date_trunc("week", col("date")))
    fact
      .select(to_date(col("date")).as("date"))
      .distinct()
      .select(
        col("date"),
        month(col("date")).as("month"),
        year(col("date")).as("year"),
        quarter(col("date")).as("quarter"),
        weekofyear(col("date")).as("week"),
        weekStart.as("week_start"),
        date_add(weekStart, 6).as("week_end"))
  }
}
