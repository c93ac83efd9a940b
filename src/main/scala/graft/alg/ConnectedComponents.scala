package graft.alg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.core.{Adjacency, Graph, StepResult, Superstep}

/**
 * Weakly connected components — HashMin label propagation with a delta
 * frontier, matching the reference's hybrid CC exactly
 * (`/root/reference/src/alg/totem_cc_hybrid.cu:392-463`):
 * labels init to the vertex's own (global) id; an active vertex pushes its
 * label to neighbors; a neighbor keeps min(old,new) and re-activates on
 * change; converged when nothing changed. Final label = min vertex id in the
 * component (`totem_cc_unittest.cu:103-143`) — exact parity by construction
 * since both run min over the same id space.
 *
 * The frontier Dataset is the reference's sparse frontier
 * (`totem_alg.h:361-377`); only changed vertices generate messages, so late
 * supersteps touch a vanishing fraction of edges.
 */
object ConnectedComponents {

  final case class Result(components: DataFrame, metrics: Seq[graft.core.StepMetrics])

  /** `edges` may be directed; WCC symmetrizes internally. */
  def run(edges: DataFrame,
          checkpointDir: Option[String] = None,
          resume: Boolean = false,
          maxSupersteps: Int = 200,
          verbose: Boolean = false): Result = {
    val und = Graph.undirected(edges)
    val adj = Adjacency.build(und).persist(StorageLevel.MEMORY_AND_DISK)
    val degs = Graph.outDegrees(und).persist(StorageLevel.MEMORY_AND_DISK)

    // state: (vid, comp, changed)
    val init = Graph.vertices(und)
      .select(col(Graph.VID), col(Graph.VID).as("comp"), lit(true).as("changed"))

    val outcome = Superstep.run(init,
      Superstep.Config(maxSupersteps = maxSupersteps, checkpointDir = checkpointDir,
        resume = resume, verbose = verbose)) { (state, _) =>
      val delta = state.filter(col("changed"))
      // edges traversed this superstep = Σ deg(active) — the metric the
      // reference reports per traversal (`totem_benchmark_binary.cu:133-156`)
      val trv = delta.join(degs, Seq(Graph.VID), "left")
        .agg(sum(coalesce(col("deg"), lit(0L)))).collect()(0) match {
        case r if r.isNullAt(0) => 0L
        case r => r.getLong(0)
      }
      val msgs = adj.join(delta, adj(Graph.SRC) === delta(Graph.VID))
        .select(explode(col("nbrs")).as(Graph.VID), col("comp"))
        .groupBy(Graph.VID).agg(min("comp").as("cand"))
      val next = state.select(col(Graph.VID), col("comp"))
        .join(msgs, Seq(Graph.VID), "left")
        .select(col(Graph.VID),
          least(col("comp"), coalesce(col("cand"), col("comp"))).as("comp"),
          (col("cand").isNotNull && col("cand") < col("comp")).as("changed"))
      val remaining = next.filter(col("changed")).isEmpty
      StepResult(next, trv, converged = remaining)
    }
    adj.unpersist(blocking = false); degs.unpersist(blocking = false)
    Result(outcome.state.select(col(Graph.VID), col("comp").as("component")), outcome.metrics)
  }

  /** Per-component vertex counts + biggest component — `component_set_t`
   * analog (`totem_graph.h:175-182`, `totem_components.cu:105-155`). */
  def componentSizes(components: DataFrame): DataFrame =
    components.groupBy("component").agg(count(lit(1)).as("n_vertices"))
      .orderBy(col("n_vertices").desc, col("component"))
}
