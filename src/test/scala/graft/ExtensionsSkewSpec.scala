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

  test("bucketed as-of join equals the join+argmax plan on a planted " +
      "hot key") {
    import spark.implicits._
    import graft.operators.Joins
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // hot key: 200 left × 300 right rows on user 7 (the join+argmax plan
    // materializes 60k pairs for it; the bucketed plan must not), plus
    // cold keys covering the edges: no right match at all, right rows
    // only AFTER the left time, ties on equal rightTime, empty buckets
    // between activity, and an exact bucket-boundary timestamp.
    val hotLeft = (1 to 200).map(i =>
      (100L + i, 7L, ts(f"2024-${i % 12 + 1}%02d-15 12:00:00")))
    val left = (hotLeft ++ Seq(
      (1L, 1L, ts("2024-03-10 00:00:00")),   // match in earlier bucket
      (2L, 2L, ts("2024-03-10 00:00:00")),   // right rows only later
      (3L, 3L, ts("2024-03-10 00:00:00")),   // no right rows at all
      (4L, 4L, ts("2024-03-10 12:00:00")),   // tie on equal rightTime
      (5L, 5L, ts("2024-02-29 00:00:00")))). // exact bucket boundary
      toDF("event_id", "user_id", "ts")
    val hotRight = (1 to 300).map(i =>
      (7L, 9000L + i, java.sql.Date.valueOf(
        f"2024-${i % 12 + 1}%02d-${i % 28 + 1}%02d")))
    val right = (hotRight ++ Seq(
      (1L, 11L, java.sql.Date.valueOf("2024-01-05")),
      (1L, 12L, java.sql.Date.valueOf("2024-01-06")),
      (2L, 21L, java.sql.Date.valueOf("2024-06-01")),
      (4L, 41L, java.sql.Date.valueOf("2024-03-10")),
      (4L, 42L, java.sql.Date.valueOf("2024-03-10")),  // tie → max key
      (5L, 51L, java.sql.Date.valueOf("2024-02-29")))).
      toDF("user_id", "o_orderkey", "o_orderdate")
    def run(f: (org.apache.spark.sql.DataFrame,
        org.apache.spark.sql.DataFrame) => org.apache.spark.sql.DataFrame) =
      f(left, right).orderBy($"event_id").collect().map(_.toSeq).toSeq
    val plain = run(Joins.asOf(_, _, "user_id", "ts", "o_orderdate",
      "event_id", "o_orderkey", Seq("o_orderkey", "o_orderdate")))
    // small bucket width → the hot key spans many buckets, exercising
    // both the in-bucket and the carry path
    val bucketed = run(Joins.asOfBucketed(_, _, "user_id", "ts",
      "o_orderdate", "event_id", "o_orderkey",
      Seq("o_orderkey", "o_orderdate"), bucketSeconds = 7L * 86400))
    assert(bucketed === plain)
    assert(plain.size === 200 + 3) // users 2 (only-later) and 3 (none) drop
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
