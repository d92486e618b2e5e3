package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.config.Config
import graft.sources.Sinks

class ConfigSpec extends AnyFunSuite {

  test("env substitution fills $VAR and ${VAR}, fails on missing " +
      "(reference main.py:25-38)") {
    val env = Map("DB_HOST" -> "example.internal", "DB_PORT" -> "5439")
    assert(Config.substituteEnv("host=$DB_HOST port=${DB_PORT}", env) ===
      "host=example.internal port=5439")
    val e = intercept[IllegalArgumentException] {
      Config.substituteEnv("x=$MISSING_VAR", env)
    }
    assert(e.getMessage.contains("MISSING_VAR"))
  }

  test("$$ escapes a literal dollar (string.Template parity) and JSON " +
      "string escapes decode") {
    val env = Map("DB_HOST" -> "h")
    // $$DB_HOST is literal "$DB_HOST", never substituted
    assert(Config.substituteEnv("cost=$$5 path=$$DB_HOST real=$DB_HOST",
      env) === "cost=$5 path=$DB_HOST real=h")
    val tmp = Files.createTempFile("cfg-esc", ".json")
    Files.writeString(tmp,
      """{"a": "quote\" back\\ nl\n tab\t uniA"}""")
    assert(Config.load(tmp.toString, env)("a") ===
      "quote\" back\\ nl\n tab\t uniA")
  }

  test("flat JSON config loads typed scalars") {
    val tmp = Files.createTempFile("cfg", ".json")
    Files.writeString(tmp,
      """{"redshift_uri": "jdbc:$DB_HOST", "count_threshold": 100,
        |"dry_run": false}""".stripMargin)
    val cfg = Config.load(tmp.toString, Map("DB_HOST" -> "h"))
    assert(cfg("redshift_uri") === "jdbc:h")
    assert(cfg("count_threshold") === "100")
    assert(cfg("dry_run") === "false")
  }

  test("inventory parses named datapackage URLs with env substitution " +
      "(reference config.json inventory, main.py:312-325)") {
    val raw =
      """{"rds_uri": "x",
        |"inventory": [
        |  {"name": "risk",
        |   "url": "https://example.org/$REF_BRANCH/datapackage.json"},
        |  {"name": "asn", "url": "https://example.org/asn/dp.json"},
        |  {"noname": "ignored"}
        |],
        |"after": 1}""".stripMargin
    val inv = Config.inventory(
      Config.substituteEnv(raw, Map("REF_BRANCH" -> "master")))
    assert(inv === Map(
      "risk" -> "https://example.org/master/datapackage.json",
      "asn" -> "https://example.org/asn/dp.json"))
    assert(Config.inventory("""{"no": "inventory"}""") === Map.empty)
    // a ']' inside a URL must not truncate the array scan
    val bracket =
      """{"inventory": [
        |  {"name": "a", "url": "https://h/x[1]/dp.json"},
        |  {"name": "b", "url": "https://h/y/dp.json"}]}""".stripMargin
    assert(Config.inventory(bracket) === Map(
      "a" -> "https://h/x[1]/dp.json", "b" -> "https://h/y/dp.json"))
    // '{' '}' or an escaped quote inside an env-substituted URL must not
    // drop, truncate, or merge entries (values are not under repo control)
    val tricky =
      """{"inventory": [
        |  {"name": "a", "url": "https://h/tpl/{ver}/dp.json"},
        |  {"name": "b", "url": "https://h/q\"uo\"te/dp.json"},
        |  {"name": "c", "url": "https://h/plain/dp.json"}]}""".stripMargin
    assert(Config.inventory(tricky) === Map(
      "a" -> "https://h/tpl/{ver}/dp.json",
      "b" -> "https://h/q\"uo\"te/dp.json",
      "c" -> "https://h/plain/dp.json"))
  }

  test("reference rds_uri converts to a JDBC url with credentials") {
    assert(Config.jdbcFromUri("postgres://u:pw@db.example.org:5432/stats")
      === ("jdbc:postgresql://db.example.org:5432/stats", "u", "pw"))
    assert(Config.jdbcFromUri("postgresql://db.example.org/stats")
      === ("jdbc:postgresql://db.example.org/stats", "", ""))
    assert(Config.jdbcFromUri("jdbc:derby:memory:x") ===
      ("jdbc:derby:memory:x", "", ""))
    intercept[IllegalArgumentException] {
      Config.jdbcFromUri("mysql://h/db")
    }
  }

  test("s3 path parse (reference main.py:41-50)") {
    assert(Config.parseS3Path("s3://bucket/a/b/c.csv") ===
      ("bucket", "a/b/c.csv"))
    assert(Config.parseS3Path("s3a://bucket") === ("bucket", ""))
    intercept[IllegalArgumentException] {
      Config.parseS3Path("http://x/y")
    }
  }
}

/** End-to-end pipeline: the reference's E1+E2 lifecycle on the fixture
  * feed, producing every serving artifact (SURVEY.md §3).
  */
class PipelineSpec extends SparkSuite {
  import spark.implicits._

  test("full lifecycle: feed → counts → unload CSV → star schema → " +
      "repaired dims") {
    val out = Files.createTempDirectory("pipeline").toString
    val dimRisk = Seq(
      (1, "r1", "R1", false, "t", "count", Some(41.0), ""),
      (2, "r2", "R2", false, "t", "count", Some(556.9), ""))
      .toDF("id", "slug", "title", "is_archived", "taxonomy",
        "measurement_units", "amplification_factor", "description")
    val dimCountry = Seq(("US", "United States", "us", "r", "c"))
      .toDF("id", "name", "slug", "region", "continent")
    val dimAsn = Seq((12252L, "t", "US")).toDF("number", "title", "country")

    val result = Pipeline.run(spark,
      Seq("/root/repo/fixtures/logentry.csv.gz"),
      dimRisk, dimCountry, dimAsn, out, threshold = 0L)

    // unload artifact exists, is a single file
    assert(new java.io.File(s"$out/unload/count.csv").isFile)

    // counts: amplified where dim matches, 0 where not
    val amped = result.counts.where($"risk" === 2 && $"count_amplified" > 0)
    assert(amped.count() > 0)
    assert(result.counts.where($"risk" === 4)
      .select($"count_amplified").collect().forall(_.getDouble(0) == 0.0))

    // cube tables exist with grand-total sentinel rows
    for (g <- Seq("week", "month", "quarter", "year")) {
      val cube = spark.read.parquet(s"$out/agg_risk_country_$g")
      assert(cube.where($"country" === "T" && $"risk" === 100).count() > 0,
        s"granularity $g missing sentinel rollups")
    }

    // fact written partitioned by date (partition pruning layout)
    assert(new java.io.File(s"$out/fact_count").listFiles()
      .exists(_.getName.startsWith("date=")))

    // dim repair added the countries/asns the feed has but the dims lack
    val countries = spark.read.parquet(s"$out/dim_country")
    assert(countries.where($"id" === "PE" && $"name" === "unknown")
      .count() === 1)
    val asns = spark.read.parquet(s"$out/dim_asn")
    assert(asns.where($"number" === 64512L).count() === 1)

    // date dimension covers every fact date
    val factDates = spark.read.parquet(s"$out/fact_count")
      .select($"date").distinct().count()
    assert(result.dimDate.count() === factDates)
  }

  test("E2 serving hand-off: every table lands on the JDBC target and " +
      "post-load DDL applies (reference main.py:279-288, :499-552)") {
    val out = Files.createTempDirectory("serve").toString
    val dimRisk = Seq(
      (1, "r1", "R1", false, "t", "count", Some(41.0), ""))
      .toDF("id", "slug", "title", "is_archived", "taxonomy",
        "measurement_units", "amplification_factor", "description")
    val dimCountry = Seq(("US", "United States", "us", "r", "c"))
      .toDF("id", "name", "slug", "region", "continent")
    val dimAsn = Seq((12252L, "t", "US")).toDF("number", "title", "country")
    val result = Pipeline.run(spark,
      Seq("/root/repo/fixtures/logentry.csv.gz"),
      dimRisk, dimCountry, dimAsn, out, threshold = 0L)
    val url = "jdbc:derby:memory:servedb;create=true"
    // Derby folds unquoted identifiers to UPPER while the Spark JDBC
    // writer quotes them lowercase, and Derby PKs need an explicit NOT
    // NULL — so the test drives the ddl parameter with the quoted subset
    // (postgres, the reference's target, takes the defaults as-is)
    // (country is a Spark string → Derby CLOB, which Derby can't index —
    // drop those families here; postgres indexes text fine)
    Pipeline.serveJdbc(result, dimRisk, url, ddl = Seq(
      """ALTER TABLE dim_date ALTER COLUMN "date" NOT NULL""",
      """ALTER TABLE dim_date ADD PRIMARY KEY ("date")""") ++
      Sinks.indexDdl(granularities = Seq("month"),
        quote = c => "\"" + c + "\"")
        .filterNot(_.contains("country")))
    val tables = Seq("dim_risk", "dim_country", "dim_asn", "dim_date",
      "fact_count") ++
      Seq("week", "month", "quarter", "year").map("agg_risk_country_" + _)
    tables.foreach { t =>
      assert(graft.sources.Sources.jdbcTable(spark, url, t).count() > 0,
        s"table $t empty or missing on the serving target")
    }
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val pk = conn.getMetaData.getPrimaryKeys(null, null, "DIM_DATE")
      assert(pk.next(), "dim_date primary key missing")
      val idx = conn.getMetaData
        .getIndexInfo(null, null, "FACT_COUNT", false, false)
      val names = Iterator.continually(idx).takeWhile(_.next())
        .map(_.getString("INDEX_NAME")).filter(_ != null).toSet
      assert(names.exists(_.equalsIgnoreCase("idx_date")) &&
        names.exists(_.equalsIgnoreCase("idx_risk")),
        s"fact indexes missing; saw $names")
    } finally conn.close()
    // the serve is RE-RUNNABLE (the weekly cadence) even once a REAL FK
    // web exists: fact_count.date → dim_date.date means a bare
    // overwrite's DROP TABLE dim_date is rejected; the children-first
    // pre-drop clears it so the same DDL applies cleanly again
    val fkDdl = Seq(
      """ALTER TABLE dim_date ALTER COLUMN "date" NOT NULL""",
      """ALTER TABLE dim_date ADD PRIMARY KEY ("date")""",
      """ALTER TABLE fact_count ADD CONSTRAINT fk_count_time """ +
        """FOREIGN KEY ("date") REFERENCES dim_date("date")""",
      """ALTER TABLE dim_asn ALTER COLUMN "number" NOT NULL""",
      """ALTER TABLE dim_asn ADD PRIMARY KEY ("number")""",
      """ALTER TABLE fact_count ADD CONSTRAINT fk_count_asn """ +
        """FOREIGN KEY ("asn") REFERENCES dim_asn("number")""") ++
      Sinks.indexDdl(granularities = Seq("month"),
        quote = c => "\"" + c + "\"")
        .filterNot(_.contains("country"))
    Pipeline.serveJdbc(result, dimRisk, url, ddl = fkDdl,
      preDdl = Sinks.dropServingTablesDdl(cascade = false))
    // third run: the FK web from run 2 is in place — this is the exact
    // shape a bare overwrite cannot survive
    Pipeline.serveJdbc(result, dimRisk, url, ddl = fkDdl,
      preDdl = Sinks.dropServingTablesDdl(cascade = false))
    assert(graft.sources.Sources.jdbcTable(spark, url, "fact_count")
      .count() > 0)
    // and the weekly E3 dim refresh survives the same FK web: its
    // default pre-drop clears the inbound fact FK before the overwrite
    RefDataMain.refresh(spark, Map(
      "risk_csv" -> "/root/repo/fixtures/risk.csv",
      "country_csv" -> "/root/repo/fixtures/country.csv",
      "asn_csv" -> "/root/repo/fixtures/asn.csv"), url)
    assert(graft.sources.Sources.jdbcTable(spark, url, "dim_asn")
      .count() > 0)
    // the refresh's default post-DDL restores everything its teardown
    // removed (dim PKs + every dim-referencing FK; dim_date untouched)
    assert(Sinks.dimConstraintDdl().exists(_.contains("fk_count_asn")))
    assert(Sinks.dimConstraintDdl().exists(
      _.contains("dim_risk ADD PRIMARY KEY")))
    assert(!Sinks.dimConstraintDdl().exists(_.contains("dim_date")))
    assert(Sinks.dropDimConstraintsDdl().length + 3 ===
      Sinks.dimConstraintDdl().length)
    // the generated reference DDL inventory parametrizes its quoting
    assert(Sinks.indexDdl(quote = c => s"<$c>")
      .head.contains("<date> DESC"))
  }

  test("E3: RefDataMain.refresh reloads only the dimension tables " +
      "(reference load_asn_ref_data.py:8-12)") {
    val url = "jdbc:derby:memory:refdatadb;create=true"
    val cfg = Map(
      "risk_csv" -> "/root/repo/fixtures/risk.csv",
      "country_csv" -> "/root/repo/fixtures/country.csv",
      "asn_csv" -> "/root/repo/fixtures/asn.csv")
    RefDataMain.refresh(spark, cfg, url)
    val risk = graft.sources.Sources.jdbcTable(spark, url, "dim_risk")
    assert(risk.count() > 0)
    assert(risk.columns.toSeq === graft.model.Schemas.dimRisk.fieldNames
      .toSeq)
    // NB: no pushed string filter — Derby maps Spark strings to CLOB,
    // which it refuses to compare server-side; filter after collect
    assert(graft.sources.Sources.jdbcTable(spark, url, "dim_country")
      .collect().count(_.getString(0) == "US") === 1)
    val asn = graft.sources.Sources.jdbcTable(spark, url, "dim_asn")
      .orderBy($"number").collect()
    assert(asn.head.getLong(0) === 12252L)
    // refresh is idempotent week over week (overwrite, not append)
    RefDataMain.refresh(spark, cfg, url)
    assert(graft.sources.Sources.jdbcTable(spark, url, "dim_asn")
      .count() === asn.length)

    // the reference's shipped config shape: no <name>_csv keys — the asn
    // dim resolves through the inventory's datapackage descriptor URL
    val tmp = Files.createTempDirectory("inv").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$tmp/data"))
    Files.writeString(java.nio.file.Paths.get(s"$tmp/data/asn.csv"),
      "number,title,country\n64496,Inventory network,PE\n")
    Files.writeString(java.nio.file.Paths.get(s"$tmp/datapackage.json"),
      """{"resources": [{"name": "asn", "path": ["data/asn.csv"]}]}""")
    val destDir = Files.createTempDirectory("invdest").toString
    RefDataMain.refresh(spark,
      cfg - "asn_csv" + ("tmp_dir" -> destDir),
      url, inventory = Map("asn" -> s"file://$tmp/datapackage.json"))
    val viaInv = graft.sources.Sources.jdbcTable(spark, url, "dim_asn")
      .collect()
    assert(viaInv.length === 1 && viaInv(0).getLong(0) === 64496L)
    // end-of-run staging lifecycle (reference main.py:84 tmpdir rmtree):
    // refresh removes the SHA-prefixed staging dirs its fetches created
    val leftovers = new java.io.File(destDir).listFiles()
    assert(leftovers == null || leftovers.isEmpty,
      s"staging artifacts survived refresh: ${leftovers.mkString(", ")}")

    // scoped cleanup: a staged frame registered BEFORE refresh ran (a
    // longer-lived caller's fetch) must survive refresh's cleanup and
    // stay readable afterwards
    Files.writeString(java.nio.file.Paths.get(s"$tmp/data/other.csv"),
      "number,title,country\n64499,Other network,AR\n")
    Files.writeString(java.nio.file.Paths.get(s"$tmp/other.json"),
      """{"resources": [{"name": "asn", "path": ["data/other.csv"]}]}""")
    val destDir2 = Files.createTempDirectory("invdest2").toString
    val longLived = graft.sources.Sources.fetchDatapackage(spark,
      s"file://$tmp/other.json", graft.model.Schemas.dimAsn, destDir2)
    RefDataMain.refresh(spark,
      cfg - "asn_csv" + ("tmp_dir" -> destDir2),
      url, inventory = Map("asn" -> s"file://$tmp/datapackage.json"))
    // re-executing the earlier frame re-reads its staged file — it must
    // still be there; only refresh's own fetch dir was removed
    assert(longLived.collect().map(_.getLong(0)).toSeq === Seq(64499L))
    graft.sources.Sources.cleanupStagedFetches(spark) // now drop it too
    val after2 = new java.io.File(destDir2).listFiles()
    assert(after2 == null || after2.isEmpty,
      s"full cleanup left: ${after2.mkString(", ")}")
  }
}
