package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.aggregate.CollectTopK

/** Bridge to `private[sql]` aggregate expressions. Lives under
  * `org.apache.spark.sql` purely for access; no Spark internals are
  * modified.
  */
object AggBridge {

  /** Catalyst's bounded top-k collect (the aggregate behind pandas-on-Spark
    * nsmallest/nlargest): a k-element BoundedPriorityQueue per group per
    * task in the partial phase, so only n_tasks·k rows per group cross the
    * shuffle. `reverse = true` keeps the smallest `num` values and emits
    * them ascending.
    */
  def collectTopK(e: Column, num: Int, reverse: Boolean): Column =
    // `new`: the case-class companion is private[aggregate]
    ColumnBridge.column(
      new CollectTopK(ColumnBridge.expression(e), num, reverse, 0, 0)
        .toAggregateExpression())
}
