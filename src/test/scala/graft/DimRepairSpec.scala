package graft

import org.apache.spark.sql.functions._

import graft.operators.DimRepair

/** Anti-join dimension repair (reference main.py:425-496). */
class DimRepairSpec extends SparkSuite {
  import spark.implicits._

  private def fact = Seq(
    ("US", 100L), ("PE", 200L), ("XX", 300L), (null, 400L),
    ("XX", 500L), ("US", 100L))
    .toDF("country", "asn")

  test("missing countries: NOT EXISTS + NULL filter, placeholder rows " +
      "unioned (reference main.py:425-454)") {
    val dim = Seq(("US", "United States", "us", "r", "c"),
      ("PE", "Peru", "pe", "r", "c"))
      .toDF("id", "name", "slug", "region", "continent")
    val missing = DimRepair.missingCountries(fact, dim).collect()
    assert(missing.map(_.getString(0)).toSeq === Seq("XX")) // NULL excluded
    val repaired = DimRepair.repairCountries(fact, dim)
    assert(repaired.count() === 3)
    assert(repaired.where($"id" === "XX" && $"name" === "unknown")
      .count() === 1)
  }

  test("missing asns: first-wins dedup per asn, NULL country → 'XY' " +
      "(reference main.py:457-496)") {
    val dim = Seq((100L, "t", "US")).toDF("number", "title", "country")
    val multi = Seq(("US", 300L), ("PE", 300L), (null, 400L))
      .toDF("country", "asn")
    val got = DimRepair.missingAsns(multi, dim)
      .orderBy($"asn").collect()
    // asn 300: two countries → deterministic winner = lowest ('PE')
    // asn 400: NULL country → 'XY'
    assert(got.map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((300L, "PE"), (400L, "XY")))
    val repaired = DimRepair.repairAsns(multi, dim)
    assert(repaired.count() === 3)
    assert(repaired.where($"title" === "unknown").count() === 2)
  }
}
