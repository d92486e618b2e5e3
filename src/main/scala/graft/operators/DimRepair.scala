package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Schemas.Sentinels

/** Dimension repair via anti-joins (SURVEY.md §2 ops 17-18).
  *
  * The reference finds fact keys missing from a dimension with NOT EXISTS
  * subqueries, fetches them into the driver, and row-inserts placeholder
  * dimension rows (reference main.py:425-496). Here the whole repair is a
  * distributed anti-join + union — no driver-side row loop, which is the
  * only reference code path where data rows crossed into Python.
  *
  * Scale notes: the anti-join's left side is `DISTINCT key` over the fact —
  * aggregated first, so the join input is bounded by dimension cardinality,
  * not fact size. The dimension side is broadcast.
  */
object DimRepair {

  /** Op 17: countries present in the fact but missing from `dim_country`
    * (reference main.py:425-454: NOT EXISTS + NULL filter). Returns the
    * missing keys; `repairCountries` unions placeholder rows.
    */
  def missingCountries(fact: DataFrame, dimCountry: DataFrame): DataFrame =
    fact
      .select(col("country"))
      .where(col("country").isNotNull)
      .distinct()
      .join(broadcast(dimCountry), col("country") === dimCountry("id"),
        "left_anti")

  /** Placeholder country rows: `(id, 'unknown', 'unknown', 'unknown',
    * 'unknown')` (reference main.py:446-451).
    */
  def repairCountries(fact: DataFrame, dimCountry: DataFrame): DataFrame = {
    val filler = missingCountries(fact, dimCountry).select(
      col("country").as("id"),
      lit("unknown").as("name"), lit("unknown").as("slug"),
      lit("unknown").as("region"), lit("unknown").as("continent"))
    dimCountry.unionByName(filler)
  }

  /** Op 18: (asn, country) pairs missing from `dim_asn` with first-wins
    * dedup per asn and `'XY'` default country (reference main.py:457-496).
    *
    * The reference's first-wins order is nondeterministic (its SELECT has no
    * ORDER BY; the Python loop keeps whichever row arrives first). Here the
    * winner is pinned deterministically — lowest country sorts first
    * (NULLs last, so a real country beats the 'XY' default when both occur).
    */
  def missingAsns(fact: DataFrame, dimAsn: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("asn"))
      .orderBy(col("country").asc_nulls_last)
    fact
      .select(col("asn"), col("country"))
      .where(col("asn").isNotNull)
      .distinct()
      .join(broadcast(dimAsn), col("asn") === dimAsn("number"), "left_anti")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .drop("rn")
      .withColumn("country",
        coalesce(col("country"), lit(Sentinels.UnknownCountry)))
  }

  /** Placeholder ASN rows: `(number, 'unknown', country)`
    * (reference main.py:486-489).
    */
  def repairAsns(fact: DataFrame, dimAsn: DataFrame): DataFrame = {
    val filler = missingAsns(fact, dimAsn).select(
      col("asn").as("number"), lit("unknown").as("title"), col("country"))
    dimAsn.unionByName(filler)
  }
}
