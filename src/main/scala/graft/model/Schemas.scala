package graft.model

import org.apache.spark.sql.types._

/** Explicit schemas mirroring the reference's DDL (SURVEY.md §1).
  *
  * The reference declares these as SQL DDL strings (reference main.py:128-158
  * for the aggregation tier, main.py:342-376 for the serving tier). Here they
  * are `StructType`s so every scan carries an explicit, pruning-friendly
  * schema — never inferred.
  */
object Schemas {

  /** Raw scan events (reference main.py:134-139). The raw CSV feed header is
    * `ts,ip,risk_id,asn,cc` which maps POSITIONALLY onto these names
    * (reference main.py:166-167 `IGNOREHEADER 1`): header names in the file
    * are ignored, so the reader must use this schema, not header inference.
    */
  val logentry: StructType = StructType(Seq(
    StructField("date", TimestampType),
    StructField("ip", StringType),
    StructField("risk", IntegerType),
    StructField("asn", LongType),
    StructField("country", StringType)))

  /** Risk dimension (reference main.py:140-147). Broadcast-sized. */
  val dimRisk: StructType = StructType(Seq(
    StructField("id", IntegerType),
    StructField("slug", StringType),
    StructField("title", StringType),
    StructField("is_archived", BooleanType),
    StructField("taxonomy", StringType),
    StructField("measurement_units", StringType),
    StructField("amplification_factor", DoubleType),
    StructField("description", StringType)))

  /** Country dimension (reference country-datapackage.json:12-38; all
    * strings, `id` = ISO-3166-1 alpha-2; 'T' is the "global" sentinel).
    */
  val dimCountry: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("name", StringType),
    StructField("slug", StringType),
    StructField("region", StringType),
    StructField("continent", StringType)))

  /** ASN dimension (reference main.py:317). */
  val dimAsn: StructType = StructType(Seq(
    StructField("number", LongType),
    StructField("title", StringType),
    StructField("country", StringType)))

  /** Aggregation output (reference main.py:148-153). */
  val count: StructType = StructType(Seq(
    StructField("date", TimestampType),
    StructField("risk", IntegerType),
    StructField("country", StringType),
    StructField("asn", LongType),
    StructField("count", IntegerType),
    StructField("count_amplified", DoubleType)))

  /** Serving-tier fact (reference main.py:355-361). Note the TIMESTAMP→DATE
    * narrowing relative to [[count]] across the S3 hop (SURVEY.md §1).
    */
  val factCount: StructType = StructType(Seq(
    StructField("date", DateType),
    StructField("risk", IntegerType),
    StructField("country", StringType),
    StructField("asn", LongType),
    StructField("count", LongType),
    StructField("count_amplified", DoubleType)))

  /** Derived date dimension (reference main.py:348-354). */
  val dimDate: StructType = StructType(Seq(
    StructField("date", DateType),
    StructField("month", IntegerType),
    StructField("year", IntegerType),
    StructField("quarter", IntegerType),
    StructField("week", IntegerType),
    StructField("week_start", DateType),
    StructField("week_end", DateType)))

  /** Cube rollup tables `agg_risk_country_{week,month,quarter,year}`
    * (reference main.py:362-368).
    */
  val aggRiskCountry: StructType = StructType(Seq(
    StructField("date", DateType),
    StructField("risk", IntegerType),
    StructField("country", StringType),
    StructField("count", LongType),
    StructField("count_amplified", DoubleType)))

  /** Sentinel values used by the cube rewrite (reference main.py:408-417):
    * rollup-NULL risk → 100 ("global" risk, a real dimension row), rollup-NULL
    * country → 'T' ("global" country). Unknown ASN country → 'XY'
    * (reference main.py:488).
    */
  object Sentinels {
    val GlobalRisk: Int = 100
    val GlobalCountry: String = "T"
    val UnknownCountry: String = "XY"
  }
}
