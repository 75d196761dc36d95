package org.apache.spark.sql.graftbridge

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.classic.SparkSession
import org.apache.spark.sql.types.StructType

/** `SparkSession.internalCreateDataFrame` is private[sql]; this shim lets
  * graft hand already-built InternalRows (UnsafeRow emission from the
  * engine's span accumulator) straight to the planner with no object
  * round-trip. */
object DataFrameBridge {
  def fromInternalRows(spark: org.apache.spark.sql.SparkSession,
                       rdd: RDD[InternalRow], schema: StructType): DataFrame =
    spark.asInstanceOf[SparkSession].internalCreateDataFrame(rdd, schema)
}
