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
