package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The bench is the driver's only perf signal: a throwing query must
  * surface as a failure, never as a (fast) timing.
  */
class BenchSpec extends SparkSuite {

  private val ok: (SparkSession, String) => DataFrame =
    (s, _) => s.range(10).toDF("id")
  private val boom: (SparkSession, String) => DataFrame =
    (_, _) => throw new RuntimeException("deliberately broken")
  // fails only inside the action, not at plan time — the realistic shape.
  // A filter (not a projection: count() prunes those away) that divides
  // by zero under ANSI mode throws during execution.
  private val lazyBoom: (SparkSession, String) => DataFrame = (s, _) => {
    import org.apache.spark.sql.functions._
    s.range(10).toDF("id").filter(expr("10 div (id - 5) >= -100"))
  }

  test("a throwing query records a -1 sentinel, not its wall time") {
    val (results, errors) = Bench.runQueries(
      spark, sf(), Seq("good" -> ok, "bad" -> boom), passes = 2)
    assert(errors === Set("bad"))
    val byName = results.toMap
    assert(byName("bad") === -1.0)
    assert(byName("good") > 0.0)
  }

  test("an action-time failure is caught too") {
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try {
      val (results, errors) = Bench.runQueries(
        spark, sf(), Seq("lazybad" -> lazyBoom), passes = 1)
      assert(errors === Set("lazybad"))
      assert(results.toMap.apply("lazybad") === -1.0)
    } finally spark.conf.set("spark.sql.ansi.enabled", "false")
  }

  test("errors poison headline_total and appear in the JSON line") {
    val json = Bench.renderJson(
      Seq("good" -> 0.42, "bad" -> -1.0), Set("bad"), "sf0.1")
    assert(json.contains(""""value":-1.000"""))
    assert(json.contains(""""errors":["bad"]"""))
    assert(json.contains(""""bad":-1.00"""))
  }

  test("clean runs keep the exact legacy JSON shape (no errors key)") {
    val json = Bench.renderJson(
      Seq(Bench.Headline.head -> 0.50, "qxx_other" -> 0.25),
      Set.empty, "sf0.1")
    assert(!json.contains("errors"))
    assert(json.contains(""""value":0.500"""))
    assert(json.startsWith("""{"metric":"headline_total""""))
  }
}
