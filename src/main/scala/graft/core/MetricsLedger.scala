package graft.core

/**
 * Process-wide ledger of the last observed superstep count per named query.
 *
 * The driver contract (`SparkEntry.queries`) returns bare DataFrames, so an
 * iterative algorithm's `Result.metrics` would otherwise be dropped on the
 * floor; the north rule's "iterations-to-convergence" metric then only
 * exists in logs. Query lambdas record `metrics.size` here and `Bench`
 * snapshots the ledger into `bench_out.json` — making convergence round
 * counts a recorded artifact.
 */
object MetricsLedger {
  private val m = new java.util.concurrent.ConcurrentHashMap[String, Int]()

  def record(name: String, supersteps: Int): Unit = m.put(name, supersteps)

  def snapshot: Map[String, Int] = {
    import scala.jdk.CollectionConverters._
    m.asScala.toMap
  }

  def clear(): Unit = m.clear()
}
