package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.SparkSession

/** Bridge to register expression-backed SQL functions on a LIVE session
  * (`SparkSessionExtensions` only applies at session build time;
  * `sessionState` is `private[sql]`). Lives under `org.apache.spark.sql`
  * purely for access.
  */
object FunctionRegistryBridge {
  def register(spark: org.apache.spark.sql.SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[SparkSession].sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
