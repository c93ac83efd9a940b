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

  /** `edges` may be directed; WCC symmetrizes internally.
   *
   * `denseThreshold`: the sparse/dense frontier switch of the reference's
   * hybrid kernels (`totem_bfs_hybrid.cu:128-145`, threshold
   * `totem_alg.h:37`) — when the changed set exceeds this fraction of V,
   * messages are pushed from the FULL state instead of filtering the delta:
   * same fixpoint (a vertex whose comp did not change this round offers
   * nothing its neighbors have not already seen), but the plan skips the
   * filter + small-side rebuild that stops paying once the frontier is most
   * of the graph. `denseThreshold >= 1.0` disables the switch. */
  def run(edges: DataFrame,
          checkpointDir: Option[String] = None,
          resume: Boolean = false,
          maxSupersteps: Int = 200,
          denseThreshold: Double = 0.1,
          verbose: Boolean = false): Result = {
    val und = Graph.undirected(edges)
    val adj = Adjacency.build(und).persist(StorageLevel.MEMORY_AND_DISK)
    val degs = Graph.outDegrees(und).persist(StorageLevel.MEMORY_AND_DISK)
    // V and ΣE from the (cached, loop-reused) degree table in ONE job — on a
    // symmetrized graph every vertex has an out-edge, so rows(degs) = V
    val ve = degs.agg(count(lit(1)), sum("deg")).collect()(0)
    val totalV = ve.getLong(0)
    val totalEdges = if (ve.isNullAt(1)) 0L else ve.getLong(1)

    // state: (vid, comp, changed)
    val init = Graph.vertices(und)
      .select(col(Graph.VID), col(Graph.VID).as("comp"), lit(true).as("changed"))

    val outcome = Superstep.run(init,
      Superstep.Config(maxSupersteps = maxSupersteps, checkpointDir = checkpointDir,
        resume = resume, verbose = verbose)) { (state, _) =>
      val delta = state.filter(col("changed"))
      // edges traversed + frontier size in ONE tiny job — the metric the
      // reference reports per traversal (`totem_benchmark_binary.cu:133-156`)
      val stats = delta.join(degs, Seq(Graph.VID), "left")
        .agg(sum(coalesce(col("deg"), lit(0L))), count(lit(1))).collect()(0)
      val deltaCount = stats.getLong(1)
      val dense = deltaCount > denseThreshold * totalV
      val trv = if (dense) totalEdges
      else if (stats.isNullAt(0)) 0L else stats.getLong(0)
      val pushFrom = if (dense) state else delta
      val msgs = adj.join(pushFrom, adj(Graph.SRC) === pushFrom(Graph.VID))
        .select(explode(col("nbrs")).as(Graph.VID), col("comp"))
        .groupBy(Graph.VID).agg(min("comp").as("cand"))
      val next = state.select(col(Graph.VID), col("comp"))
        .join(msgs, Seq(Graph.VID), "left")
        .select(col(Graph.VID),
          least(col("comp"), coalesce(col("cand"), col("comp"))).as("comp"),
          (col("cand").isNotNull && col("cand") < col("comp")).as("changed"))
      // materialize ONCE, probe the materialized frame (the isEmpty would
      // otherwise execute the full join-aggregate plan a second time when
      // Superstep re-materializes the state)
      val cut = graft.core.Lineage.cut(next)
      val remaining = cut.filter(col("changed")).isEmpty
      StepResult(cut, trv, converged = remaining)
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
