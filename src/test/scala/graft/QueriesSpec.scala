package graft

/** Smoke: every declared query runs on sf0.001 and returns rows, and every
  * oracle entry points at a declared query.
  */
class QueriesSpec extends SparkSuite {

  test("oracleSql keys are a subset of queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("events normalization refuses a non-UTC session instead of " +
      "silently shifting day truncations") {
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try {
      val e = intercept[IllegalArgumentException] {
        SparkEntry.queries("q02_project_trunc")(spark, sf()).count()
      }
      assert(e.getMessage.contains("UTC"))
    } finally spark.conf.set("spark.sql.session.timeZone", "UTC")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs and returns rows on sf0.001") {
      val n = fn(spark, sf()).count()
      // q16 is a faithful anti-join that is legitimately empty when the
      // dimension covers every fact key (it does on this testdata)
      if (name != "q16_anti_join") assert(n > 0, s"$name returned 0 rows")
    }
  }
}
