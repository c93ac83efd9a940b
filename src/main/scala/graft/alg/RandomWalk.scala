package graft.alg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.core.{Adjacency, Graph}

/**
 * Deterministic graph random walks — the sampling primitive a graph-
 * embedding training pipeline (DeepWalk/node2vec-style corpus generation)
 * needs, made REPRODUCIBLE: step `i` of walk `w` at a vertex of degree `d`
 * moves to the `idx`-th smallest distinct out-neighbor, where
 * `idx = hash48(seed|w|i) mod d` and hash48 is the first 48 bits of the
 * md5 hex — a keyed-hash index, uniform over neighbors up to a 2^-48·d
 * modulo bias, and a pure function of (seed, walk, step), so runs are
 * replayable across engines and resumable mid-corpus (the same
 * cross-engine md5 trick as the MinHash/SimHash families in
 * [[graft.dedup]]).
 *
 * Scale shape: the walk step is a join + element lookup, NOT an
 * aggregation — state (O(walks)) joins a positional adjacency
 * (sorted neighbor arrays, chunked at `chunkSize` so no task ever owns a
 * whole super-hub row) and projects `element_at(nbrs, idx)`. Per step the
 * plan touches O(walks) rows, not O(frontier edges); an argmin-over-
 * neighbors formulation was measured to lose whole-stage codegen to a
 * SortAggregate over every frontier edge (min over a struct is not
 * hash-aggregable), which is why the index form is used. All walks
 * advance together, one superstep per step; walks stop at sinks.
 */
object RandomWalk {

  /** Walks of `length` steps from every vertex of `starts` (one walk per
   * start, walk id = start vid). Returns (walk, step, vid): step 0 is the
   * start itself; a walk that hits a sink has no rows past it. */
  def walks(edges: DataFrame, starts: DataFrame, length: Int,
            seed: Long = 42L, chunkSize: Int = Adjacency.DefaultChunk): DataFrame = {
    // positional adjacency: per src, neighbors sorted ascending, chunked by
    // rank — the per-src window is partitioned (never a global sort), a
    // one-time build cost like the CSR build, reused by every step
    val e = edges.select(col(Graph.SRC), col(Graph.DST)).distinct()
    val byRank = Window.partitionBy(Graph.SRC).orderBy(Graph.DST)
    val perSrc = Window.partitionBy(Graph.SRC)
    val adj = e
      .select(col(Graph.SRC), col(Graph.DST),
        (row_number().over(byRank).cast("long") - 1L).as("rn"),
        count(lit(1)).over(perSrc).as("deg"))
      .groupBy(col(Graph.SRC), (col("rn") / chunkSize).cast("long").as("chunk"))
      // a chunk holds a CONTIGUOUS sorted rank range, so re-sorting its
      // values reconstructs position order without carrying rn
      .agg(first("deg").as("deg"), sort_array(collect_list(col(Graph.DST))).as("nbrs"))
      .repartition(col(Graph.SRC))
      .persist(StorageLevel.MEMORY_AND_DISK)
    adj.count() // build once (init-time, like Adjacency.build)

    val frames = Seq.newBuilder[DataFrame]
    var state = graft.core.Lineage.cut(starts.select(col(Graph.VID).as("walk"),
      lit(0).as("step"), col(Graph.VID).as(Graph.VID)))
    frames += state
    for (i <- 1 to length) {
      // 48-bit keyed hash of (seed, walk, step): conv(hex,16,10) mirrors the
      // oracle's per-digit parse exactly
      val keyed = state.select(col("walk"), col(Graph.VID),
        conv(substring(md5(concat_ws("|", lit(seed), col("walk"), lit(i))), 1, 12),
          16, 10).cast("long").as("__h"))
      val next = keyed.hint("shuffle_hash")
        .join(adj, keyed(Graph.VID) === adj(Graph.SRC))
        .withColumn("__i", pmod(col("__h"), col("deg")))
        // non-hub vertices have exactly one chunk; hubs fan out deg/chunkSize
        // rows and the filter keeps the one holding position __i
        .filter(col("chunk") === (col("__i") / chunkSize).cast("long"))
        .select(col("walk"), lit(i).as("step"),
          element_at(col("nbrs"), (pmod(col("__i"), lit(chunkSize)) + 1).cast("int"))
            .as(Graph.VID))
      state = graft.core.Lineage.cut(next)
      frames += state
    }
    adj.unpersist(blocking = false)
    frames.result().reduce(_.unionByName(_))
  }

  /** Walks from every vertex of the graph. */
  def walksFromAll(edges: DataFrame, length: Int, seed: Long = 42L): DataFrame =
    walks(edges, Graph.vertices(edges), length, seed)
}
