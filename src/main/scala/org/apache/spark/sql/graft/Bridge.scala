package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 moved Column↔Expression conversion behind `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`). This bridge lives in
  * the sql package hierarchy to re-export the two conversions the engine
  * needs: reading a user filter's Expression tree for file skipping, and
  * wrapping custom Catalyst Expressions as Columns.
  */
object Bridge {
  def expr(c: Column): Expression = ExpressionUtils.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Run `body` with adaptive execution disabled on the CALLING THREAD
    * only (thread-local SQLConf override; a clone of the session conf,
    * so every other setting is inherited). For a plan with no join or
    * aggregate, AQE cannot improve any exchange — a pure repartition's
    * output partitioning is user-fixed and exempt from coalescing — yet
    * it still splits the write into per-stage jobs, re-optimizes and
    * re-codegens between them. The engine's staging writes use this for
    * exactly those plans (see LakeTable.stageFiles); concurrent queries
    * on other threads are untouched.
    */
  def withAdaptiveDisabled[T](spark: org.apache.spark.sql.SparkSession)(body: => T): T = {
    val base = spark.sessionState.conf
    if (!base.adaptiveExecutionEnabled) body
    else {
      val cloned = base.clone()
      cloned.setConfString("spark.sql.adaptive.enabled", "false")
      org.apache.spark.sql.internal.SQLConf.withExistingConf(cloned)(body)
    }
  }
}
