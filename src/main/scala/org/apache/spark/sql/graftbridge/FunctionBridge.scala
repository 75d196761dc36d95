package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.SparkSession

/** `SparkSession.sessionState` is private[sql]; this shim exposes temp-
  * function registration so graft can register its native Catalyst
  * expressions (e.g. `shadow_extract`) for `spark.sql(...)` users. */
object FunctionBridge {
  def registerTempFunction(spark: org.apache.spark.sql.SparkSession, name: String,
                           builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[SparkSession].sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
