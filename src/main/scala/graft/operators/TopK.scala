package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.AggBridge

/** Scale-safe per-group top-k (SURVEY.md serving-index shape; reference
  * main.py:533-546 builds serving indexes to avoid exactly the full-scan
  * ranking this replaces).
  *
  * `Window.partitionBy(group)` over a LOW-cardinality group funnels the
  * whole fact through ≤ |groups| reducer tasks — a scale-killer on a raw
  * fact table (round-2 verdict, q21). The two-phase shape instead runs a
  * bounded-state aggregate: the partial (map-side) phase keeps a k-element
  * bounded priority queue per group per task, so only `n_tasks · k` rows
  * per group ever cross the shuffle, and the final merge is k-bounded too.
  * Catalyst's own `CollectTopK` (the aggregate behind the pandas-on-Spark
  * nsmallest/nlargest) provides the heap; this wrapper turns it into a
  * ranked, exploded top-k relation.
  */
object TopK {

  /** Aggregate column: bounded top-`num` collect of `e` by the natural
    * ordering of its type (struct = field-by-field). `reverse = true`
    * keeps the SMALLEST `num` values, output sorted ascending.
    */
  def collect_top_k(e: Column, num: Int, reverse: Boolean): Column =
    AggBridge.collectTopK(e, num, reverse)

  /** Top `k` rows per group, ranked 1..k in ascending `sortKey` order
    * (encode DESC by negating the component; pack tie-breakers into the
    * struct so the order is total — trailing payload fields must never
    * decide order).
    *
    * Output columns: `groupCols ++ payload-col-names ++ rank` (rank is
    * INT, 1-based), exactly matching the
    * `row_number() OVER (PARTITION BY group ORDER BY sortKey) <= k` window
    * formulation — but with bounded state and full map-side parallelism.
    */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], sortKey: Column,
      payload: Seq[Column], k: Int): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val packed = struct(sortKey.as("__key"), struct(payload: _*).as("__p"))
    df.groupBy(groupCols.map(col): _*)
      .agg(collect_top_k(packed, k, reverse = true).as("__top"))
      .select(groupCols.map(col) :+ posexplode(col("__top")): _*)
      .withColumn("rank", (col("pos") + 1).cast("int"))
      .select(groupCols.map(col) ++
        Seq(col("col.__p.*"), col("rank")): _*)
  }
}
