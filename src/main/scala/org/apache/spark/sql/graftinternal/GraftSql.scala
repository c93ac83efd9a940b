package org.apache.spark.sql.graftinternal

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/**
 * Bridge into Spark's private[sql] API (this package is under
 * org.apache.spark.sql, so private[sql] members are visible).
 *
 * Why it exists: `Dataset.localCheckpoint` truncates the logical plan but
 * COPIES the source plan's statistics into the new LogicalRDD
 * (`LogicalRDD.rewriteStatsAndConstraints`, ExistingRDD.scala:200,263).
 * In an iterative BSP loop whose step joins the state with itself, the
 * inherited sizeInBytes estimate SQUARES every superstep — the BigInt bit
 * length doubles per iteration, planning time grows exponentially, and
 * around superstep ~25 Catalyst dies with "BigInteger would overflow
 * supported range". Rebuilding the DataFrame from the already-materialized
 * internal RDD resets statistics to defaults and keeps every superstep's
 * planning cost constant.
 */
object GraftSql {
  def fromInternalRdd(spark: SparkSession, rdd: RDD[InternalRow], schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)

  /** Column ↔ Expression bridge (`ExpressionUtils` is private[sql]; needed
   * to register graft's custom Catalyst aggregate, functions.TopKStructs,
   * without a whole SparkSessionExtensions round-trip). */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
  def expression(c: org.apache.spark.sql.Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
