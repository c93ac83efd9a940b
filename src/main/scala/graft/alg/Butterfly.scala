package graft.alg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.core.Graph

/**
 * Butterfly counting — the bipartite 4-cycle (2×2 biclique) census, the
 * bipartite analogue of [[TriangleCount]] (Sanei-Mehri et al. 2018,
 * "Butterfly Counting in Bipartite Networks"). A link-graph extension
 * beyond the reference: Totem's nearest relative is the sorted-neighbour
 * wedge machinery of `totem_clustering.cu:368-431`, reused here in
 * relational form over a two-mode (e.g. page–resource, part–supplier)
 * edge table.
 *
 * A butterfly is a left pair (u₁, u₂) plus a right pair (w₁, w₂) with all
 * four edges present. With c(u₁,u₂) = |N(u₁) ∩ N(u₂)| (common RIGHT
 * neighbors), the per-pair butterfly count is C(c, 2), so
 *
 *   B           = Σ_{u₁<u₂} C(c(u₁,u₂), 2)
 *   b(u)        = Σ_{u'}    C(c(u,u'),  2)   (per-left-vertex; Σ b(u) = 2B)
 *
 * Plan: one wedge self-join pivoting at the RIGHT side (u₁—w—u₂, u₁<u₂)
 * with map-side combining into the per-pair aggregate — O(Σ_w deg(w)²)
 * wedge rows, never an explicit 4-cycle enumeration. The caller orients the
 * table so the RIGHT side is the one with the smaller Σ deg² (the standard
 * side choice); at web scale `maxPivotDegree` drops right-side hub pivots
 * above the cap before the self-join — the same skew valve as
 * [[LinkPrediction]] (a hub shared by millions generates deg² wedge rows);
 * the default Int.MaxValue keeps the census exact for oracle comparison.
 */
object Butterfly {

  /** Per-pair counts (a, b, c, butterflies) over left pairs a < b with
   * c ≥ 2 common right neighbors — the shared wedge aggregate. */
  def pairs(edges: DataFrame, maxPivotDegree: Int = Int.MaxValue): DataFrame = {
    val e = edges.select(col(Graph.SRC), col(Graph.DST)).distinct()
    val nbr = e.select(col(Graph.DST).as("w"), col(Graph.SRC).as("x"))
    val pivots =
      if (maxPivotDegree == Int.MaxValue) nbr
      else nbr.join(
        nbr.groupBy("w").agg(count(lit(1)).as("__wd"))
          .filter(col("__wd") <= maxPivotDegree).drop("__wd"),
        Seq("w"))
    val wedges = pivots
      .join(pivots.select(col("w"), col("x").as("y")), Seq("w"))
      .filter(col("x") < col("y"))
    wedges.groupBy(col("x").as("a"), col("y").as("b"))
      .agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2)
      .select(col("a"), col("b"), col("c"),
        // C(c,2) in exact integer arithmetic (c(c−1) is even; >>1 avoids the
        // double-typed `/` which loses bits past 2^53 on hub pairs)
        shiftright(col("c") * (col("c") - lit(1L)), 1).as("butterflies"))
  }

  /** Per-LEFT-vertex butterfly participation (vid, butterflies) — every
   * distinct left vertex appears, zero-count ones included (stable row set
   * for the driver hash). */
  def perVertex(edges: DataFrame, maxPivotDegree: Int = Int.MaxValue): DataFrame = {
    val e = edges.select(col(Graph.SRC), col(Graph.DST)).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val bf = pairs(e, maxPivotDegree)
    val perV = bf.select(col("a").as(Graph.VID), col("butterflies"))
      .unionByName(bf.select(col("b").as(Graph.VID), col("butterflies")))
      .groupBy(Graph.VID).agg(sum("butterflies").as("butterflies"))
    val out = e.select(col(Graph.SRC).as(Graph.VID)).distinct()
      .join(perV.hint("shuffle_hash"), Seq(Graph.VID), "left")
      .select(col(Graph.VID), coalesce(col("butterflies"), lit(0L)).as("butterflies"))
    // e stays persisted for the one read of the returned plan (it feeds both
    // the wedge sides and the left-vertex frame); LRU evicts after
    out
  }

  /** Total butterfly count B — one row (butterflies, wedges): B plus the
   * number of c ≥ 2 wedge pairs, the two numbers a bipartite clustering
   * summary reports. */
  def total(edges: DataFrame, maxPivotDegree: Int = Int.MaxValue): DataFrame =
    pairs(edges, maxPivotDegree)
      .agg(coalesce(sum("butterflies"), lit(0L)).as("butterflies"),
        count(lit(1)).as("wedge_pairs"))
}
