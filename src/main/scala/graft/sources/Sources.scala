package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
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
  /** resources[].path[] → one row per path — the flatten shared by the
    * manifest read and write sides (`explode` drops empty arrays, which
    * implements the skip).
    */
  private def flattenResourcePaths(descriptor: DataFrame): DataFrame =
    descriptor
      .select(explode(col("resources")).as("resource"))
      .select(explode(col("resource.path")).as("url"))

  def manifestEntries(spark: SparkSession, datapackageJson: String): DataFrame =
    flattenResourcePaths(
      spark.read.option("multiLine", "true").json(datapackageJson))
      .withColumn("mandatory", lit(true))

  // ------------------------------------------------- remote datapackage

  /** Lenient URI parse: bare local paths with URI-illegal characters
    * (spaces, %) are legal filesystem paths — callers fall back to
    * Hadoop `Path` handling when this is None.
    */
  private def uriOpt(s: String): Option[java.net.URI] =
    try Some(new java.net.URI(s))
    catch { case _: java.net.URISyntaxException => None }

  /** Driver-side input stream for any location: `http(s)://` through the
    * JDK URL machinery, everything else (bare local paths, `s3a://`,
    * `hdfs://`, `file://`) through the Hadoop FS — so a descriptor key
    * may hold a web URL, an object-store path, or a plain file path
    * interchangeably.
    */
  private def openStreamAny(spark: SparkSession,
      location: String): java.io.InputStream = {
    val scheme = uriOpt(location).map(_.getScheme).orNull
    if (scheme == "http" || scheme == "https")
      new java.net.URI(location).toURL.openStream()
    else {
      val p = new Path(location)
      FileSystem.get(p.toUri, spark.sparkContext.hadoopConfiguration)
        .open(p)
    }
  }

  /** Read a URL/path's content as UTF-8 text on the DRIVER. The reference
    * pulls datapackage descriptors the same way (reference main.py:178-193:
    * `datapackage.DataPackage(url)` fetches the descriptor over HTTP).
    * Descriptors are KB-sized metadata; driver-side IO is correct here.
    */
  def readUrl(spark: SparkSession, url: String): String = {
    val in = openStreamAny(spark, url)
    try new String(in.readAllBytes(), StandardCharsets.UTF_8)
    finally in.close()
  }

  /** Copy a URL/path's content to `dest` (any Hadoop-FS scheme) via a
    * driver-side stream — the analog of the reference's ASN fast path
    * (reference main.py:326-338: download the CSV locally, then bulk-load,
    * instead of row-by-row `push_datapackage`). On a cluster, point `dest`
    * at shared storage (s3a/hdfs) so executors can scan the result; the
    * artifact is a broadcast-sized reference CSV, so one driver stream is
    * the right amount of parallelism.
    */
  def fetchToFile(spark: SparkSession, url: String, dest: String): String = {
    val conf = spark.sparkContext.hadoopConfiguration
    val destPath = new Path(dest)
    val fs = FileSystem.get(destPath.toUri, conf)
    val in = openStreamAny(spark, url)
    try {
      val out = fs.create(destPath, true)
      try in.transferTo(out) finally out.close()
    } finally in.close()
    dest
  }

  /** First `path` entry of the named resource in a datapackage descriptor
    * (or of the first resource when `resourceName` is None), resolved
    * against the descriptor URL — datapackage paths are relative to the
    * descriptor's base (reference main.py:312-325 walks
    * `config.inventory` by resource name the same way).
    */
  private[sources] def resolveResourcePath(spark: SparkSession,
      descriptorUrl: String, descriptorJson: String,
      resourceName: Option[String]): String = {
    import spark.implicits._
    val resources = spark.read.json(Seq(descriptorJson).toDS())
      .select(explode(col("resources")).as("r"))
      .select(col("r.name").as("name"), col("r.path").as("path"))
      .collect()
      .map(r => (r.getString(0), r.getSeq[String](1)))
    val chosen = resourceName match {
      case Some(n) => resources.find(_._1 == n).getOrElse(
        throw new IllegalArgumentException(
          s"no resource named $n in $descriptorUrl"))
      case None => resources.headOption.getOrElse(
        throw new IllegalArgumentException(
          s"no resources in $descriptorUrl"))
    }
    // a resource with NO path key comes back as null, not an empty list
    val path = Option(chosen._2).getOrElse(Seq.empty).headOption.getOrElse(
      throw new IllegalArgumentException(
        s"resource ${chosen._1} has no path entries"))
    // URI resolution when both sides parse; Hadoop Path resolution for
    // bare paths with URI-illegal characters
    (for { base <- uriOpt(descriptorUrl); rel <- uriOpt(path) }
      yield base.resolve(rel).toString)
      .getOrElse(new Path(new Path(descriptorUrl).getParent, path).toString)
  }

  /** Op 3, remote flavor: fetch a datapackage descriptor BY URL, resolve
    * its resource path, download the CSV to `destDir`, and read it through
    * the existing typed-CSV reader — the reference's shipped config points
    * `inventory` at GitHub descriptor URLs (reference main.py:178-193,
    * :326-338), so this is the first path a real user exercises. Data
    * movement stays on the driver, exactly as the reference does it.
    */
  def fetchDatapackage(spark: SparkSession, descriptorUrl: String,
      schema: StructType, destDir: String,
      resourceName: Option[String] = None): DataFrame = {
    val resolved = resolveResourcePath(spark, descriptorUrl,
      readUrl(spark, descriptorUrl), resourceName)
    val fileName = resolved.substring(resolved.lastIndexOf('/') + 1)
    // per-descriptor staging subdir: the read is LAZY, so two descriptors
    // whose resources share a file name (the common data/data.csv layout)
    // must not overwrite each other's staged copy before the scan runs.
    // SHA-256 prefix — String.hashCode collisions are constructible.
    val sub = java.security.MessageDigest.getInstance("SHA-256")
      .digest(resolved.getBytes(StandardCharsets.UTF_8))
      .take(8).map(b => f"$b%02x").mkString
    val stagingDir = s"$destDir/$sub"
    val local = fetchToFile(spark, resolved, s"$stagingDir/$fileName")
    stagedDirs.add(stagingDir)
    datapackageCsv(spark, local, schema)
  }

  // ------------------------------------------------- staging lifecycle

  /** Staging dirs created by [[fetchDatapackage]], awaiting end-of-run
    * removal. Deletion cannot happen at fetch time: the returned scan is
    * lazy and is re-executed by every downstream action, so the staged
    * copy must outlive the last consumer.
    */
  private val stagedDirs = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]())

  /** Snapshot of the staging dirs registered so far — take one BEFORE a
    * scoped unit of work (e.g. [[graft.RefDataMain.refresh]]) and pass
    * it to [[cleanupStagedFetches]] as `keep` so the unit removes only
    * the dirs its own fetches created, never frames a longer-lived
    * caller still depends on.
    */
  def stagedSnapshot(): Set[String] = {
    val b = Set.newBuilder[String]
    stagedDirs.forEach(d => b += d)
    b.result()
  }

  /** End-of-run removal of staging dirs [[fetchDatapackage]] created in
    * this JVM — the analog of the reference deleting its tmpdir when the
    * run finishes (reference main.py:84, `shutil.rmtree(self.tmpdir)`).
    * Call ONLY after every DataFrame whose lineage includes a staged
    * scan has been materialized (written or collected); a later action
    * on such a frame would re-read the deleted file. Dirs in `keep`
    * (from [[stagedSnapshot]]) survive and stay tracked. Cleanup is
    * best-effort: a failed delete is logged at WARN and never fails the
    * run that already did its real work.
    */
  def cleanupStagedFetches(spark: SparkSession,
      keep: Set[String] = Set.empty): Unit = {
    val log = org.slf4j.LoggerFactory.getLogger(Sources.getClass)
    val conf = spark.sparkContext.hadoopConfiguration
    val it = stagedDirs.iterator()
    while (it.hasNext) {
      val d = it.next()
      if (!keep.contains(d)) {
        it.remove()
        try {
          val dir = new Path(d)
          val fs = FileSystem.get(dir.toUri, conf)
          if (fs.exists(dir)) fs.delete(dir, true)
        } catch {
          case scala.util.control.NonFatal(e) =>
            log.warn(s"staged-fetch cleanup left $d behind: ${e.getMessage}")
        }
      }
    }
  }

  // --------------------------------------------------- manifest write-back

  /** Flatten a datapackage descriptor string into the `clean.manifest`
    * JSON the loader consumes (reference main.py:95-103): one entry per
    * resource path, prefixed with `source`, empty-path resources skipped.
    * Byte format matches the reference's `json.dump` output
    * (golden-tested against reference tests/aggregation_tests.py:503-526).
    */
  /** Minimal JSON string escaping for the manifest writer (quote,
    * backslash, control characters — the set `json.dump` escapes).
    * Python's `json.dump` uses the SHORT escapes for the five named
    * control characters and `\u00XX` only for the rest, so the
    * byte-identical contract needs the same split.
    */
  private def jsonEscape(s: String): String = {
    val sb = new StringBuilder(s.length)
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\b' => sb.append("\\b")
      case '\f' => sb.append("\\f")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < 0x20 => sb.append(f"\\u$c%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  def createManifest(spark: SparkSession, datapackageJson: String,
      source: String): String = {
    import spark.implicits._
    val urls = flattenResourcePaths(
      spark.read.json(Seq(datapackageJson).toDS()))
      .collect().map(_.getString(0))
    val base = source.stripSuffix("/")
    urls
      .map(k =>
        s"""{"url": "${jsonEscape(s"$base/$k")}", "mandatory": true}""")
      .mkString("""{"entries": [""", ", ", "]}")
  }

  /** Manifest write-back (reference main.py:106-125): read
    * `destPath/datapackage.json`, flatten it against `destPath`, and write
    * the result to `destPath/clean.manifest` — the artifact the COPY step
    * consumes. Driver-side small-file IO through the Hadoop FS so any
    * scheme (s3a, hdfs, file) works.
    */
  def writeBackManifest(spark: SparkSession, destPath: String): String = {
    val conf = spark.sparkContext.hadoopConfiguration
    val dpPath = new Path(s"$destPath/datapackage.json")
    val fs = FileSystem.get(dpPath.toUri, conf)
    val in = fs.open(dpPath)
    val dp =
      try new String(in.readAllBytes(), StandardCharsets.UTF_8)
      finally in.close()
    val manifest = createManifest(spark, dp, destPath)
    val out = fs.create(new Path(s"$destPath/clean.manifest"), true)
    try out.write(manifest.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    manifest
  }
}
