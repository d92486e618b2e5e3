package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.model.Schemas

/** Sources (SURVEY.md §2 ops 1-3).
  *
  * The reference ingests gzip CSV scan feeds via Redshift `COPY` from an S3
  * manifest (reference main.py:161-175) and typed reference-data CSVs
  * described by Frictionless datapackage descriptors (reference
  * main.py:178-193, :312-339). Spark reads gzip CSV transparently and — like
  * COPY — executors pull input files directly, never through the driver.
  */
object Sources {

  /** Op 1: gzip CSV multi-file scan of the raw feed.
    *
    * The feed header is `ts,ip,risk_id,asn,cc`, mapped POSITIONALLY onto the
    * `logentry` columns (reference main.py:166-167: `IGNOREHEADER 1` ignores
    * names). So: skip the header row but bind columns by position via the
    * explicit schema — never header inference.
    */
  /** @param mode malformed-row policy: PERMISSIVE (default — unparseable
    *             fields become NULL, the faithful analog of loading what
    *             COPY accepts), DROPMALFORMED, or FAILFAST (reject the
    *             batch, like Redshift COPY with no MAXERROR)
    */
  def logentryCsv(spark: SparkSession, paths: Seq[String],
      mode: String = "PERMISSIVE"): DataFrame =
    spark.read
      .schema(Schemas.logentry)
      .option("header", "true")         // skip the row; names NOT used
      .option("enforceSchema", "true")  // positional bind, like IGNOREHEADER
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ssXXX")
      .option("mode", mode)
      .csv(paths: _*)

  /** Op 3: typed CSV resource described by a datapackage descriptor —
    * header + explicit schema (types from the descriptor's `fields` list,
    * pre-translated into the `StructType`).
    */
  def datapackageCsv(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("header", "true")
      .option("multiLine", "true") // risk.csv has multiline quoted descriptions
      .csv(path)

  /** JDBC reference-data source — the read-side counterpart of
    * [[Sinks.jdbc]] (the reference keeps dims in RDS; an engine user reads
    * them back for joins). `fetchsize` batches the wire reads; dims are
    * broadcast-sized so a single partition read is fine.
    */
  def jdbcTable(spark: SparkSession, url: String, table: String,
      fetchSize: Int = 10000): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("fetchsize", fetchSize.toString)
      .load()

  /** Op 2: manifest construction — flatten `resources[].path[]` of a
    * datapackage descriptor into one row per file URL, skipping resources
    * with empty path lists (reference main.py:95-103; golden-tested by
    * reference tests/aggregation_tests.py:503-526: five resources in, four
    * entries out).
    *
    * `explode` drops empty arrays, which implements the skip.
    */
  def manifestEntries(spark: SparkSession, datapackageJson: String): DataFrame =
    spark.read
      .option("multiLine", "true")
      .json(datapackageJson)
      .select(explode(col("resources")).as("resource"))
      .select(explode(col("resource.path")).as("url"))
      .withColumn("mandatory", lit(true))
}
