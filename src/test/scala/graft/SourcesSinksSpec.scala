package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{Sinks, Sources}

/** Sources (gzip CSV feed, manifest flatten, datapackage CSV) and sinks
  * (single-file CSV rename, indexed parquet, JDBC via embedded Derby).
  */
class SourcesSinksSpec extends SparkSuite {
  import spark.implicits._

  test("op 1: gzip CSV feed binds positionally, parses ISO timestamps " +
      "(reference main.py:161-175)") {
    val df = Sources.logentryCsv(spark,
      Seq("/root/repo/fixtures/logentry.csv.gz"))
    assert(df.columns.toSeq ===
      Seq("date", "ip", "risk", "asn", "country"))
    assert(df.count() === 8)
    val first = df.orderBy($"date", $"ip").collect()(0)
    assert(first.getTimestamp(0).toString === "2016-09-20 00:00:01.0")
    assert(first.getString(1) === "190.81.134.82") // lexicographic min
    assert(first.getInt(2) === 2)
  }

  test("op 1: malformed feed rows — PERMISSIVE nulls bad fields, " +
      "FAILFAST rejects, DROPMALFORMED drops") {
    val tmp = Files.createTempDirectory("feed").toString
    // row 2: full arity, bad types → fields null, row survives PERMISSIVE
    // row 3: too MANY fields → malformed, dropped by DROPMALFORMED
    // (under-arity rows are padded with nulls, not malformed)
    Files.writeString(java.nio.file.Paths.get(s"$tmp/bad.csv"),
      "ts,ip,risk_id,asn,cc\n" +
        "2016-09-20T00:00:01+00:00,1.2.3.4,2,12252,US\n" +
        "not-a-timestamp,5.6.7.8,xx,yy,PE\n" +
        "a,b,c,d,e,f,g\n")
    val permissive = Sources.logentryCsv(spark, Seq(s"$tmp/bad.csv"))
    assert(permissive.count() === 3)
    assert(permissive.where($"date".isNull).count() === 2)
    assert(permissive.where($"ip" === "5.6.7.8" && $"risk".isNull &&
      $"country" === "PE").count() === 1)
    // NB: count() plans a parse-free line count, so malformed detection
    // only kicks in when columns are actually read → collect()
    val dropped = Sources.logentryCsv(spark, Seq(s"$tmp/bad.csv"),
      mode = "DROPMALFORMED").collect()
    assert(dropped.length === 1) // both bad rows dropped
    intercept[org.apache.spark.SparkException] {
      Sources.logentryCsv(spark, Seq(s"$tmp/bad.csv"), mode = "FAILFAST")
        .collect()
    }
  }

  test("typed Dataset[LogEntry] aggregation matches the DataFrame plan") {
    import graft.model.LogEntry
    val ds = Seq(
      LogEntry(java.sql.Timestamp.valueOf("2016-09-20 00:00:01"),
        "1.2.3.4", Some(2), Some(12252L), "US"),
      LogEntry(java.sql.Timestamp.valueOf("2016-09-20 08:00:00"),
        "1.2.3.4", Some(2), Some(12252L), "US"))
      .toDS()
    val out = graft.operators.RiskAggregation.aggregateTyped(ds, 0L)
      .collect()
    assert(out.length === 1)
    assert(out(0).count === 1L) // same ip, same day → deduped
    assert(out(0).count_amplified === Some(0.0))
  }

  test("op 2: manifest flatten skips empty-path resources " +
      "(reference tests/aggregation_tests.py:503-526: 5 in, 4 out)") {
    val m = Sources.manifestEntries(spark,
      "/root/repo/fixtures/datapackage.json")
    val urls = m.select($"url").collect().map(_.getString(0)).toSeq.sorted
    assert(urls.length === 4)
    assert(urls.head === "dns-scan/dns-scan.20000101.csv.gz")
    assert(m.where(!$"mandatory").count() === 0)
  }

  test("op 3: datapackage CSV with multiline quoted description " +
      "(reference fixture risk.csv)") {
    val tmp = Files.createTempDirectory("dp").toString
    Files.writeString(java.nio.file.Paths.get(s"$tmp/risk.csv"),
      "id,slug,title,is_archived,taxonomy,measurement_units," +
        "amplification_factor,description\n" +
        "0,test-risk,Test Risk,false,Testable,count,0.13456,\"Nice\n" +
        "Small\nDescription\"\n" +
        "100,global,DDOS,false,Combined risk,GBit/sec,1,\n")
    val df = Sources.datapackageCsv(spark, s"$tmp/risk.csv",
      graft.model.Schemas.dimRisk)
    val rows = df.orderBy($"id").collect()
    assert(rows.length === 2)
    assert(rows(0).getString(7) === "Nice\nSmall\nDescription")
    assert(rows(1).getInt(0) === 100)
    assert(rows(1).getDouble(6) === 1.0)
  }

  test("op 4: single-file CSV sink writes exactly one stable-named file " +
      "(reference main.py:232-260)") {
    val tmp = Files.createTempDirectory("sink").toString
    val df = Seq((1, "a"), (2, "b")).toDF("x", "y")
    Sinks.singleFileCsv(df.orderBy($"x"), tmp)
    // ignore local-FS checksum artifacts (.crc) — absent on HDFS/S3
    val files = new java.io.File(tmp).listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).toSeq
    assert(files === Seq("count.csv"))
    val content = Files.readString(
      java.nio.file.Paths.get(s"$tmp/count.csv"))
    assert(content === "1,a\n2,b\n")
  }

  test("op 5: JDBC sink and source round-trip through embedded Derby " +
      "(reference main.py:296-309)") {
    val url = "jdbc:derby:memory:graftdb;create=true"
    val df = Seq((1L, "US", 10L), (2L, "PE", 20L))
      .toDF("id", "country", "cnt")
    Sinks.jdbc(df, url, "fact_count", mode = "overwrite")
    val back = Sources.jdbcTable(spark, url, "fact_count")
    assert(back.count() === 2)
    assert(back.orderBy($"id").collect()(1).getString(1) === "PE")
  }

  test("remote datapackage fetch: descriptor by URL → resolved resource " +
      "→ typed CSV (reference main.py:178-193, :326-338)") {
    val tmp = Files.createTempDirectory("dpfetch").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$tmp/dp/data"))
    Files.writeString(java.nio.file.Paths.get(s"$tmp/dp/data/asn.csv"),
      "number,title,country\n12252,Test network,US\n64512,Private,PE\n")
    Files.writeString(
      java.nio.file.Paths.get(s"$tmp/dp/datapackage.json"),
      """{"name": "refdata", "resources": [
        |  {"name": "asn", "path": ["data/asn.csv"]}
        |]}""".stripMargin)
    val dest = Files.createTempDirectory("dpdest").toString
    val df = Sources.fetchDatapackage(spark,
      s"file://$tmp/dp/datapackage.json", graft.model.Schemas.dimAsn,
      destDir = dest, resourceName = Some("asn"))
    val rows = df.orderBy($"number").collect()
    assert(rows.length === 2)
    assert(rows(0).getLong(0) === 12252L)
    assert(rows(1).getString(2) === "PE")
    // staging isolation: a SECOND descriptor whose resource shares the
    // file name must not clobber the first's staged copy (the reads are
    // lazy) — both DataFrames stay readable with their own contents
    Files.createDirectories(java.nio.file.Paths.get(s"$tmp/dp2/data"))
    Files.writeString(java.nio.file.Paths.get(s"$tmp/dp2/data/asn.csv"),
      "number,title,country\n64496,Other network,BR\n")
    Files.writeString(
      java.nio.file.Paths.get(s"$tmp/dp2/datapackage.json"),
      """{"resources": [{"name": "asn", "path": ["data/asn.csv"]}]}""")
    val df2 = Sources.fetchDatapackage(spark,
      s"file://$tmp/dp2/datapackage.json", graft.model.Schemas.dimAsn,
      destDir = dest, resourceName = Some("asn"))
    assert(df2.collect().map(_.getLong(0)).toSeq === Seq(64496L))
    assert(df.count() === 2) // first staged copy intact
    def staged() = scala.util.Using.resource(
      java.nio.file.Files.walk(java.nio.file.Paths.get(dest))) { s =>
      val found = new scala.collection.mutable.ArrayBuffer[String]
      s.forEach(p =>
        if (p.getFileName.toString == "asn.csv") found += p.toString)
      found.toSeq
    }
    assert(staged().size === 2)
    assert(!new java.io.File(s"$dest/asn.csv").exists) // never flat
    // a bare local descriptor path (no scheme) works too — config keys
    // hold plain paths as often as URLs
    val bare = Sources.fetchDatapackage(spark, s"$tmp/dp/datapackage.json",
      graft.model.Schemas.dimAsn, dest, resourceName = Some("asn"))
    assert(bare.count() === 2)
    // unknown resource name fails loudly, like the reference's inventory
    // walk coming up empty
    intercept[IllegalArgumentException] {
      Sources.fetchDatapackage(spark, s"file://$tmp/dp/datapackage.json",
        graft.model.Schemas.dimAsn, dest, resourceName = Some("nope"))
    }
  }

  test("manifest write-back reproduces the reference's golden manifest " +
      "(reference tests/aggregation_tests.py:503-526: 5 resources in, " +
      "4 entries out, source-prefixed)") {
    val dp =
      """{"resources":[
        |{"path": ["ntp-scan/ntp-scan.20000101.csv.gz"],
        | "schema": {"fields": []}, "name": "openntp"},
        |{"path": ["ssdp-data/ssdp-data.20000101.csv.gz"],
        | "schema": {"fields": []}, "name": "openssdp"},
        |{"path": [], "schema": {"fields": []}, "name": "spam"},
        |{"path": ["snmp-data/snmp-data.20000101.csv.gz"],
        | "schema": {"fields": []}, "name": "opensnmp"},
        |{"path": ["dns-scan/dns-scan.20000101.csv.gz"],
        | "schema": {"fields": []}, "name": "opendns"}],
        |"name": "cybergreen_enriched_data"}""".stripMargin
    val manifest = Sources.createManifest(spark, dp,
      "s3://test.bucket/test/key")
    assert(manifest ===
      """{"entries": [""" +
      """{"url": "s3://test.bucket/test/key/ntp-scan/""" +
      """ntp-scan.20000101.csv.gz", "mandatory": true}, """ +
      """{"url": "s3://test.bucket/test/key/ssdp-data/""" +
      """ssdp-data.20000101.csv.gz", "mandatory": true}, """ +
      """{"url": "s3://test.bucket/test/key/snmp-data/""" +
      """snmp-data.20000101.csv.gz", "mandatory": true}, """ +
      """{"url": "s3://test.bucket/test/key/dns-scan/""" +
      """dns-scan.20000101.csv.gz", "mandatory": true}]}""")
  }

  test("createManifest escapes control chars the way json.dump does " +
      "(short escapes for \\n \\r \\t \\b \\f, \\u00XX for the rest)") {
    // JSON-escaped path text; the reader unescapes it to real control
    // chars and the writer must re-emit EXACTLY these escape spellings
    // (python json.dump uses \t \n \r \b \f, and \u00XX only for the rest)
    val escaped = "a\\tb\\nc\\rd\\be\\ff\\u0001g"
    val dp = s"""{"resources":[{"path": ["$escaped"],
                |"schema": {"fields": []}, "name": "weird"}],
                |"name": "x"}""".stripMargin
    val manifest = Sources.createManifest(spark, dp, "s3://b/k")
    assert(manifest ===
      s"""{"entries": [{"url": "s3://b/k/$escaped", "mandatory": true}]}""")
  }

  test("manifest write-back round-trip: dest datapackage.json → " +
      "clean.manifest artifact (reference main.py:106-125)") {
    val dest = Files.createTempDirectory("manifest").toString
    Files.copy(java.nio.file.Paths.get(
        "/root/repo/fixtures/datapackage.json"),
      java.nio.file.Paths.get(s"$dest/datapackage.json"))
    Sources.writeBackManifest(spark, dest)
    val written = Files.readString(
      java.nio.file.Paths.get(s"$dest/clean.manifest"))
    // fixture: 5 path entries across 4 resources, one resource empty
    assert(written.split("\"url\"").length - 1 === 4)
    assert(written.contains(
      s""""url": "$dest/dns-scan/dns-scan.20000101.csv.gz""""))
    assert(!written.contains("snmp")) // empty-path resource skipped
  }

  test("ops 22-23: serving DDL pass-through creates PK and index on the " +
      "JDBC target post-load (reference main.py:499-552)") {
    val url = "jdbc:derby:memory:servingdb;create=true"
    val df = Seq((1L, "US", 10L), (2L, "PE", 20L))
      .toDF("id", "country", "cnt")
    Sinks.jdbc(df, url, "fact_serving", mode = "overwrite")
    // Spark's JDBC writer quotes column identifiers → Derby keeps them
    // lowercase, so the DDL quotes them too (the reference's postgres DDL
    // is all-lowercase-unquoted, equivalent there)
    Sinks.servingDdl(url, Seq(
      """ALTER TABLE fact_serving ALTER COLUMN "id" NOT NULL""",
      """ALTER TABLE fact_serving ADD PRIMARY KEY ("id")""",
      """CREATE INDEX idx_date_country ON fact_serving("id" DESC, "cnt")"""))
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val md = conn.getMetaData
      val pk = md.getPrimaryKeys(null, null, "FACT_SERVING")
      assert(pk.next(), "primary key not created")
      assert(pk.getString("COLUMN_NAME") === "id")
      val idx = md.getIndexInfo(null, null, "FACT_SERVING", false, false)
      val names = Iterator.continually(idx).takeWhile(_.next())
        .map(_.getString("INDEX_NAME")).filter(_ != null).toSet
      assert(names.exists(_.equalsIgnoreCase("idx_date_country")),
        s"index not created; saw $names")
    } finally conn.close()
    // the reference generators emit the full family inventory:
    // 5 PKs + 1 asn FK + 4 fact FKs + 2 cube FKs × 4 granularities
    assert(Sinks.constraintDdl().length === 9 + 8)
    assert(Sinks.constraintDdl().count(_.contains("fk_cube_risk")) === 4)
    // 7 fact indexes + 5 cube index families × 4 granularities
    assert(Sinks.indexDdl().length === 7 + 20)
    assert(Sinks.indexDdl().count(_.contains("date DESC")) === 2 + 4)
  }

  test("ops 22-23 analog: indexed parquet partition-prunes on date and " +
      "row-group-prunes on sort key") {
    val tmp = Files.createTempDirectory("idx").toString
    val df = Seq(("2024-01-01", "US", 1L), ("2024-01-01", "PE", 2L),
      ("2024-01-02", "US", 3L))
      .toDF("day", "country", "cnt")
    Sinks.indexedParquet(df, tmp, Seq("day"), Seq("country"))
    val back = spark.read.parquet(tmp).where($"day" === "2024-01-01")
    assert(back.count() === 2)
    // partition pruning visible in the plan
    val plan = back.queryExecution.executedPlan.toString
    assert(new java.io.File(tmp).listFiles()
      .exists(_.getName.startsWith("day=")))
  }
}
