package graft

import org.apache.spark.sql.functions._

import graft.operators.RiskAggregation

/** SQL registration of the native expressions + the skew-safe distinct. */
class ExtensionsSkewSpec extends SparkSuite {

  test("native functions are callable from SQL after register()") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT rolling_hash('ab') AS rh,
        |       fvec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |                array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)))
        |         AS dot,
        |       simhash64(array('a', 'b')) AS sh,
        |       size(minhash_sig(array('a', 'b', 'c', 'd'), 2, 16)) AS ms,
        |       size(minhash_bands(array('a', 'b', 'c', 'd'), 2, 16, 4))
        |         AS mb
        |""".stripMargin).collect()(0)
    assert(r.getLong(0) === 97L * 257L + 98L)
    assert(r.getDouble(1) === 11.0)
    assert(r.getInt(3) === 16)
    assert(r.getInt(4) === 4)
    // the full kernel surface is SQL-reachable, incl. repetition_stats
    val rep = spark.sql(
      "SELECT repetition_stats(array('a', 'a', 'b')) AS st").collect()(0)
    assert(rep.getStruct(0).length > 0)
  }

  test("skew-safe salted distinct count equals the plain plan") {
    import spark.implicits._
    // skewed: user 7 contributes 500 distinct ips to one group
    val rows = (1 to 500).map(i => ("hot", s"ip$i")) ++
      Seq(("cold", "ip1"), ("cold", "ip2"), ("hot", "ip1"))
    val df = rows.toDF("grp", "ip")
    val salted = RiskAggregation
      .skewSafeDistinctCount(df, Seq("grp"), "ip", salts = 8)
      .orderBy($"grp").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(salted.toSeq === Seq(("cold", 2L), ("hot", 500L)))
  }
}
