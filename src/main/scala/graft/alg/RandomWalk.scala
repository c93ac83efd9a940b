package graft.alg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.core.Graph

/**
 * Deterministic graph random walks — the sampling primitive a graph-
 * embedding training pipeline (DeepWalk/node2vec-style corpus generation)
 * needs, made REPRODUCIBLE: instead of an RNG, step `i` of walk `w` at
 * vertex `v` moves to the out-neighbor `u` minimizing
 * `md5(seed|w|i|u)` — a keyed hash argmin. Per (walk, step) the choice is
 * uniform over neighbors in distribution (hash family statistics) yet a
 * pure function of (seed, walk, step, neighbor), so runs are replayable
 * across engines and resumable mid-corpus; the same trick as the
 * cross-engine md5 MinHash/SimHash families in [[graft.dedup]].
 *
 * Scale shape: all walks advance together — one superstep per step, each a
 * state⋈edges join + per-walk argmin aggregate (map-side combined), state
 * is O(walks), never a driver-side loop over individual walks. Walks
 * stop at sinks (no out-neighbors).
 */
object RandomWalk {

  /** Walks of `length` steps from every vertex of `starts` (one walk per
   * start, walk id = start vid). Returns (walk, step, vid): step 0 is the
   * start itself; a walk that hits a sink has no rows past it. */
  def walks(edges: DataFrame, starts: DataFrame, length: Int,
            seed: Long = 42L): DataFrame = {
    val e = edges.select(col(Graph.SRC), col(Graph.DST)).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // each step frame is cut (materialized) once; the result is the lazy
    // union of the already-materialized steps — no re-materialization
    val frames = Seq.newBuilder[DataFrame]
    var state = graft.core.Lineage.cut(starts.select(col(Graph.VID).as("walk"),
      lit(0).as("step"), col(Graph.VID).as(Graph.VID)))
    frames += state
    for (i <- 1 to length) {
      val next = state.join(e.hint("shuffle_hash"), state(Graph.VID) === e(Graph.SRC))
        .select(col("walk"),
          struct(md5(concat_ws("|", lit(seed), col("walk"), lit(i), col(Graph.DST)))
            .as("h"), col(Graph.DST).as("v")).as("cand"))
        .groupBy("walk")
        .agg(min("cand").as("cand"))
        .select(col("walk"), lit(i).as("step"), col("cand.v").as(Graph.VID))
      state = graft.core.Lineage.cut(next)
      frames += state
    }
    e.unpersist(blocking = false)
    frames.result().reduce(_.unionByName(_))
  }

  /** Walks from every vertex of the graph. */
  def walksFromAll(edges: DataFrame, length: Int, seed: Long = 42L): DataFrame =
    walks(edges, Graph.vertices(edges), length, seed)
}
