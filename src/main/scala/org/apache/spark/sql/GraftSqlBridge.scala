package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into the `private[sql]` Column <-> Expression
  * conversions, so graft's native Catalyst expressions (e.g.
  * `graft.expressions.CosineSimilarity`) can be exposed as plain
  * `Column`s without registering SQL functions. Same technique Spark's
  * own connector modules use (they live under `org.apache.spark.sql.*`
  * for exactly this reason).
  */
object GraftSqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register graft's SQL functions on an ALREADY-RUNNING session (the
    * `spark.sql.extensions=graft.GraftExtensions` conf only applies to
    * sessions built with it). */
  def registerFunctions(spark: SparkSession): Unit = {
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.createOrReplaceTempFunction(
        "cosine_sim",
        (children: Seq[Expression]) => graft.expressions.CosineSimilarity(children.head, children(1)),
        "scala_udf")
  }
}
