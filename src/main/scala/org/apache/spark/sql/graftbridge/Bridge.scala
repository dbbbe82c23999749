package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to `private[sql]` Spark internals needed to expose custom
  * Catalyst expressions as user-facing `Column`s (the supported extension
  * path in Spark 4's split Column API).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def functionRegistry(spark: SparkSession): FunctionRegistry =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sessionState.functionRegistry
  /** `sessionUUID` is private[sql]; session-keyed caches need it (unique
    * for the JVM's life, unlike identityHashCode which GC can reuse).
    */
  def sessionUUID(spark: SparkSession): String =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sessionUUID

  /** Table-function registry access for runtime TVF registration (the
    * `graft_ann_search` surface) — `sessionState` is private[sql].
    */
  def tableFunctionRegistry(spark: SparkSession)
      : org.apache.spark.sql.catalyst.analysis.TableFunctionRegistry =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.tableFunctionRegistry
}
