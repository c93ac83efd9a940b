package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.graftinternal.GraftSql

/**
 * Lineage barrier for iterative loops.
 *
 * `cut` materializes the DataFrame (localCheckpoint, cached at
 * MEMORY_AND_DISK) and rebuilds it from the checkpointed internal RDD so
 * that NEITHER the logical plan NOR the plan statistics survive the
 * barrier. Plain `localCheckpoint` truncates only the plan; Spark 4 copies
 * the source statistics into the new LogicalRDD, and in a loop whose step
 * references the state twice the inherited sizeInBytes estimate squares
 * per iteration — exponential planning time, then
 * "BigInteger would overflow supported range" (see GraftSql docs).
 *
 * Every iterative driver in this engine MUST cut lineage through this
 * helper (or write a parquet checkpoint) once per superstep.
 */
object Lineage {
  def cut(df: DataFrame): DataFrame = {
    val ckpt = df.localCheckpoint(eager = true)
    GraftSql.fromInternalRdd(df.sparkSession, ckpt.queryExecution.toRdd, ckpt.schema)
  }
}
