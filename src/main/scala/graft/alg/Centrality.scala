package graft.alg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.core.{Adjacency, Graph}
import scala.collection.mutable.ArrayBuffer

/**
 * Brandes-style centrality (unweighted): betweenness and stress —
 * the reference's two-phase forward-BFS / backward-accumulation scheme
 * (`/root/reference/src/alg/totem_betweenness.cu:518-756`,
 * `totem_stress.cu:314`): forward pass counts shortest paths (sigma) level
 * by level; backward pass accumulates dependencies per level descending.
 *
 * Each BFS level is one persisted DataFrame (the per-level frontier list the
 * reference keeps on the GPU); the backward pass joins successive levels —
 * O(diameter) jobs per source, every join shuffle-bounded by the level
 * sizes. Exact over the given sources; pass a sample for the reference's
 * CENTRALITY_APPROX mode (`totem_alg.h:88-90`).
 */
object Centrality {

  /** Per-source forward structure: levels(i) = (vid, sigma) at depth i. */
  private def forward(adj: DataFrame, source: Long): ArrayBuffer[DataFrame] = {
    val spark = adj.sparkSession
    import spark.implicits._
    val levels = ArrayBuffer[DataFrame]()
    var frontier = Seq((source, 1L)).toDF(Graph.VID, "sigma")
      .persist(StorageLevel.MEMORY_AND_DISK)
    var visited = frontier.select(Graph.VID)
      .persist(StorageLevel.MEMORY_AND_DISK)
    levels += frontier
    var done = false
    while (!done) {
      val next = adj.join(frontier, adj(Graph.SRC) === frontier(Graph.VID))
        .select(explode(col("nbrs")).as(Graph.VID), col("sigma"))
        .join(visited.withColumnRenamed(Graph.VID, "__v"),
          col(Graph.VID) === col("__v"), "left_anti")
        .groupBy(Graph.VID).agg(sum("sigma").as("sigma"))
        .transform(graft.core.Lineage.cut)
      if (next.isEmpty) done = true
      else {
        levels += next
        visited = visited.unionByName(next.select(Graph.VID))
          .transform(graft.core.Lineage.cut)
        frontier = next
      }
    }
    levels
  }

  /**
   * Backward accumulation. `stress = false`: betweenness dependencies
   * δ(v) = Σ_{w ∈ succ(v)} σ(v)/σ(w) · (1 + δ(w));
   * `stress = true`: δ(v) = Σ_{w ∈ succ(v)} σ(v) · (1 + δ(w)/σ(w))
   * (path COUNTS through v rather than fractions).
   * Returns (vid, score) for non-source vertices of this source's DAG.
   */
  private def backward(adj: DataFrame, levels: ArrayBuffer[DataFrame],
                       source: Long, stress: Boolean): DataFrame = {
    val spark = adj.sparkSession
    var delta: DataFrame = null // (vid, sigma, delta) of the level below
    var acc: DataFrame = null   // accumulated per-vertex scores
    for (l <- levels.indices.reverse) {
      val cur = levels(l)
      val withDelta =
        if (delta == null) cur.withColumn("delta", lit(0.0))
        else {
          // v in level l, w in level l+1 along an edge (v,w)
          val contrib = adj.join(cur, adj(Graph.SRC) === cur(Graph.VID))
            .select(cur(Graph.VID).as("v"), col("sigma").as("sv"),
              explode(col("nbrs")).as("w"))
            .join(delta.select(col(Graph.VID).as("w"), col("sigma").as("sw"),
              col("delta").as("dw")), Seq("w"))
            .groupBy(col("v").as(Graph.VID))
            .agg(sum(
              if (stress) col("sv") * (lit(1.0) + col("dw") / col("sw"))
              else (col("sv") / col("sw")) * (lit(1.0) + col("dw"))
            ).as("delta"))
          cur.join(contrib, Seq(Graph.VID), "left")
            .select(col(Graph.VID), col("sigma"),
              coalesce(col("delta"), lit(0.0)).as("delta"))
        }
      val scored = withDelta
        .filter(col(Graph.VID) =!= source)
        .select(col(Graph.VID), col("delta").as("score"))
      acc = if (acc == null) scored else acc.unionByName(scored)
      delta = withDelta.select(col(Graph.VID), col("sigma"), col("delta"))
        .transform(graft.core.Lineage.cut)
    }
    acc.groupBy(Graph.VID).agg(sum("score").as("score"))
  }

  private def perSource(edges: DataFrame, sources: Seq[Long], stress: Boolean): DataFrame = {
    val adj = Adjacency.build(edges).persist(StorageLevel.MEMORY_AND_DISK)
    val parts = sources.map { s =>
      val levels = forward(adj, s)
      val out = backward(adj, levels, s, stress)
      levels.foreach(_.unpersist(blocking = false))
      out
    }
    val all = parts.reduce(_ unionByName _)
      .groupBy(Graph.VID).agg(sum("score").as("score"))
    val verts = Graph.vertices(edges)
    val res = verts.join(all, Seq(Graph.VID), "left")
      .select(col(Graph.VID), coalesce(col("score"), lit(0.0)).as("score"))
    adj.unpersist(blocking = false)
    res
  }

  /** Betweenness centrality over the given sources (all vertices = exact;
   * directed semantics: paths follow stored edges). Scores are the raw
   * dependency sums, like the reference's per-source benchmark mode. */
  def betweenness(edges: DataFrame, sources: Seq[Long]): DataFrame =
    perSource(edges, sources, stress = false)
      .withColumnRenamed("score", "betweenness")

  /** Per-edge backward accumulation for one source: emits every BFS-DAG
   * edge's dependency c(v→w) = σ(v)/σ(w) · (1 + δ(w)) — the same contrib
   * rows [[backward]] aggregates per vertex, kept keyed by the edge. The
   * (v, w) frame is persisted per level because it feeds BOTH the edge
   * emission and the vertex-delta rollup the next level up. */
  private def backwardEdges(adj: DataFrame, levels: ArrayBuffer[DataFrame],
                            source: Long): DataFrame = {
    var delta: DataFrame = null
    var acc: DataFrame = null
    val cache = ArrayBuffer[DataFrame]()
    for (l <- levels.indices.reverse) {
      val cur = levels(l)
      if (delta == null) {
        delta = cur.withColumn("delta", lit(0.0))
          .transform(graft.core.Lineage.cut)
      } else {
        val pair = adj.join(cur, adj(Graph.SRC) === cur(Graph.VID))
          .select(cur(Graph.VID).as("v"), col("sigma").as("sv"),
            explode(col("nbrs")).as("w"))
          .join(delta.select(col(Graph.VID).as("w"), col("sigma").as("sw"),
            col("delta").as("dw")), Seq("w"))
          .select(col("v"), col("w"),
            ((col("sv") / col("sw")) * (lit(1.0) + col("dw"))).as("c"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        cache += pair
        val contrib = pair.groupBy(col("v").as(Graph.VID))
          .agg(sum("c").as("delta"))
        val withDelta = cur.join(contrib, Seq(Graph.VID), "left")
          .select(col(Graph.VID), col("sigma"),
            coalesce(col("delta"), lit(0.0)).as("delta"))
        val scored = pair.select(col("v").as(Graph.SRC),
          col("w").as(Graph.DST), col("c").as("score"))
        acc = if (acc == null) scored else acc.unionByName(scored)
        delta = withDelta.transform(graft.core.Lineage.cut)
      }
    }
    val out =
      if (acc == null)
        delta.sparkSession.emptyDataFrame
          .select(lit(0L).as(Graph.SRC), lit(0L).as(Graph.DST),
            lit(0.0).as("score")).limit(0)
      else acc.groupBy(Graph.SRC, Graph.DST).agg(sum("score").as("score"))
          .transform(graft.core.Lineage.cut)
    cache.foreach(_.unpersist(blocking = false))
    out
  }

  /**
   * Edge betweenness over the given sources — the Girvan–Newman primitive
   * (iteratively removing the highest-betweenness edge splits communities).
   * A stored edge (v, w) scores Σ_s σ_s(v)/σ_s(w) · (1 + δ_s(w)) over the
   * sources whose BFS DAG it lies on; edges on no sampled shortest path
   * score 0. Same per-level join structure (and cost) as [[betweenness]];
   * the only extra state is the per-level (v, w, c) frame, cached for its
   * two readers and released per source.
   */
  def edgeBetweenness(edges: DataFrame, sources: Seq[Long]): DataFrame = {
    val adj = Adjacency.build(edges).persist(StorageLevel.MEMORY_AND_DISK)
    val parts = sources.map { s =>
      val levels = forward(adj, s)
      val out = backwardEdges(adj, levels, s)
      levels.foreach(_.unpersist(blocking = false))
      out
    }
    val all = parts.reduce(_ unionByName _)
      .groupBy(Graph.SRC, Graph.DST).agg(sum("score").as("edge_betweenness"))
    val base = edges.select(col(Graph.SRC), col(Graph.DST))
      .filter(col(Graph.SRC) =!= col(Graph.DST)).distinct()
    val res = base.join(all, Seq(Graph.SRC, Graph.DST), "left")
      .select(col(Graph.SRC), col(Graph.DST),
        coalesce(col("edge_betweenness"), lit(0.0)).as("edge_betweenness"))
    adj.unpersist(blocking = false)
    res
  }

  /** Stress centrality (shortest-path counts through each vertex). */
  def stress(edges: DataFrame, sources: Seq[Long]): DataFrame =
    perSource(edges, sources, stress = true)
      .select(col(Graph.VID), round(col("score")).cast("long").as("stress"))

  /**
   * Multi-source BFS (batched): one iterative job carrying (root, vid, dist)
   * — sources share every superstep's join, the scalable form of looped
   * single-source BFS. With sources = all vertices this is unweighted APSP
   * (the reference's `totem_apsp.cu:193-308`, practical only on small V —
   * output is O(V²); for sampled landmark sets it scales).
   */
  def multiSourceBfs(edges: DataFrame, sources: Seq[Long]): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val adj = Adjacency.build(edges).persist(StorageLevel.MEMORY_AND_DISK)
    var state = sources.map(s => (s, s, 0)).toDF("root", Graph.VID, "dist")
      .persist(StorageLevel.MEMORY_AND_DISK)
    var frontier = state
    var level = 0
    while (!frontier.isEmpty) {
      level += 1
      val next = adj.join(frontier, adj(Graph.SRC) === frontier(Graph.VID))
        .select(col("root"), explode(col("nbrs")).as(Graph.VID))
        .distinct()
        .join(state.select(col("root").as("__r"), col(Graph.VID).as("__v")),
          col("root") === col("__r") && col(Graph.VID) === col("__v"), "left_anti")
        .select(col("root"), col(Graph.VID), lit(level).as("dist"))
        .transform(graft.core.Lineage.cut)
      state = state.unionByName(next)
        .transform(graft.core.Lineage.cut)
      frontier = next
    }
    adj.unpersist(blocking = false)
    state
  }
}
