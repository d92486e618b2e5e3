package graft

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.operators.StarSchema

/** Star-schema build: date dimension, cube rollups, sentinel rewrite —
  * reproducing the reference's RDS tests (tests/aggregation_tests.py:433-455)
  * on its 5-row fact fixture (FIXTURES.md §5), plus cube-total invariants.
  */
class StarSchemaSpec extends SparkSuite {
  import spark.implicits._

  private def fact = Seq(
    ("2016-09-03", 0, "AA", 111111L, 1L, 30.8),
    ("2016-11-13", 0, "ZZ", 999999L, 33L, 1353.0),
    ("2016-05-22", 0, "AA", 111111L, 10L, 410.0),
    ("2014-10-21", 0, "ZZ", 999999L, 4L, 25.2),
    ("2014-10-03", 0, "AA", 111111L, 2L, 1113.8))
    .toDF("d", "risk", "country", "asn", "count", "count_amplified")
    .select(to_date($"d").as("date"), $"risk", $"country", $"asn",
      $"count", $"count_amplified")

  test("dim_date derives calendar attributes; ISO week, Monday start " +
      "(reference main.py:390-401)") {
    val dd = StarSchema.dimDate(fact).orderBy($"date").collect()
    assert(dd.length === 5) // distinct dates
    val first = dd(0) // 2014-10-03, a Friday
    assert(first.getDate(0) === Date.valueOf("2014-10-03"))
    assert(first.getInt(1) === 10)   // month
    assert(first.getInt(2) === 2014) // year
    assert(first.getInt(3) === 4)    // quarter
    assert(first.getInt(4) === 40)   // ISO week
    assert(first.getDate(5) === Date.valueOf("2014-09-29")) // Monday
    assert(first.getDate(6) === Date.valueOf("2014-10-05")) // Sunday
  }

  test("cube rollups: all 8 grouping sets, grand total present, totals " +
      "equal sum of leaves (reference main.py:402-407)") {
    for (g <- StarSchema.Granularities) {
      val cube = StarSchema.cubeRollup(fact, g)
      // grand total row: all three keys NULL
      val grand = cube.where($"date".isNull && $"country".isNull &&
        $"risk".isNull).collect()
      assert(grand.length === 1, s"granularity $g")
      assert(grand(0).getAs[Long]("count") === 50L)
      assert(math.abs(grand(0).getAs[Double]("count_amplified")
        - 2932.8) < 1e-9)
      // leaves sum to the grand total
      val leaves = cube.where($"date".isNotNull && $"country".isNotNull &&
        $"risk".isNotNull).agg(sum($"count")).collect()(0).getLong(0)
      assert(leaves === 50L)
    }
  }

  test("sentinel rewrite: NULL risk→100, NULL country→'T', NULL date " +
      "survives (reference main.py:408-421)") {
    val out = StarSchema.sentinelRewrite(
      StarSchema.cubeRollup(fact, "year"))
    assert(out.where($"risk".isNull || $"country".isNull).count() === 0)
    assert(out.where($"date".isNull).count() > 0) // date NULLs left alone
    // the all-NULL grouping row became (NULL date, 'T', 100)
    assert(out.where($"date".isNull && $"country" === "T" &&
      $"risk" === 100 && $"count" === 50).count() === 1)
  }

  test("buildCubes produces the four granularity tables " +
      "(reference main.py:379-384)") {
    val cubes = StarSchema.buildCubes(fact)
    assert(cubes.keySet === Set("week", "month", "quarter", "year"))
    // week-truncated dates differ from month-truncated ones
    val weekDates = cubes("week").where($"date".isNotNull)
      .select($"date").distinct().count()
    val yearDates = cubes("year").where($"date".isNotNull)
      .select($"date").distinct().count()
    assert(weekDates === 5 && yearDates === 2)
  }
}
