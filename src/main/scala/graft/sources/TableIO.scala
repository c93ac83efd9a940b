package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * The single seam for state-table I/O: superstep checkpoints
 * (`graft.core.Superstep.writeCheckpoint`/resume) and any other engine
 * table read/write go through here, so the storage format is one runtime
 * conf away instead of hardcoded at every call site.
 *
 * `graft.table.format` (session conf, default `"parquet"`) names any
 * DataSourceV2 format. On a cluster that ships the Iceberg runtime jar,
 * setting it to `"iceberg"` (plus the usual catalog conf) yields the
 * north-star layout — every superstep a committed table snapshot alongside
 * its `manifest.json` lineage. No Iceberg jar exists in this sandbox
 * (SURVEY.md §7.0), so parquet-dir + manifest is the tested default; the
 * seam keeps the engine itself format-agnostic either way.
 */
object TableIO {
  val FormatKey = "graft.table.format"

  def format(spark: SparkSession): String =
    spark.conf.get(FormatKey, "parquet")

  /** Overwrite `path` with `df` in the configured table format. */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").format(format(df.sparkSession)).save(path)

  /** Read a table previously written by [[write]]. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.format(format(spark)).load(path)
}
