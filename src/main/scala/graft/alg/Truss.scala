package graft.alg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.core.Graph

/**
 * k-truss decomposition — the edge-centric cohesion analog of the
 * reference's vertex-centric p-core peeling (`totem_pcores.cu:212-304`,
 * re-expressed over triangle support instead of weighted degree; the
 * reference itself has no truss kernel, this is a link-graph extension):
 * the k-truss is the maximal subgraph in which EVERY edge participates in
 * at least k−2 triangles of that subgraph (Cohen, "Trusses: cohesive
 * subgraphs for social network analysis", 2008).
 *
 * Spark-first formulation: iterate — per round, enumerate triangles of the
 * surviving canonical edge set with the same degree-oriented wedge join as
 * [[TriangleCount]] (per-vertex fan-out bounded by min(deg, sqrt(2E)), the
 * bound that keeps the join balanced on power-law web graphs), aggregate
 * per-edge support with a map-side-combined groupBy, drop edges below
 * k−2, and cut lineage. Peeling is monotone, so rounds ≤ initial edge
 * count and in practice O(support diameter) — each round is one bounded
 * self-join + one shuffle agg, never an all-pairs product, so the shape
 * holds at 100 TB exactly like the triangle counter's.
 */
object Truss {

  /** Canonical edges (a, b) with a < b of the k-truss subgraph of the
   * simple undirected graph. k ≥ 2; the 2-truss is the (self-loop-free,
   * deduped) graph itself. */
  def kTruss(edges: DataFrame, k: Int, maxRounds: Int = 1000): DataFrame = {
    require(k >= 2, s"k-truss needs k >= 2, got $k")
    var e = graft.core.Lineage.cut(TriangleCount.canonical(edges))
    var n = e.count()
    var changed = k > 2 // the 2-truss peels nothing
    var round = 0
    while (changed && round < maxRounds) {
      // per-round orientation: support peeling changes degrees, so the
      // wedge-bounding orientation is recomputed on the surviving edges
      val oriented = TriangleCount.orient(e).persist(StorageLevel.MEMORY_AND_DISK)
      val tris = TriangleCount.trianglesOfOriented(oriented)
      // triangle rows are (pivot, v1, v2) — the degree-ordered pivot may be
      // the LARGER id, so each side is re-canonicalized before counting
      val sides = tris.select(col("a").as("x"), col("b").as("y"))
        .union(tris.select(col("a").as("x"), col("c").as("y")))
        .union(tris.select(col("b").as("x"), col("c").as("y")))
      val supp = sides
        .select(least(col("x"), col("y")).as("a"), greatest(col("x"), col("y")).as("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("supp"))
      val kept = e.join(supp, Seq("a", "b"), "left")
        .filter(coalesce(col("supp"), lit(0L)) >= k - 2)
        .select("a", "b")
      val cut = graft.core.Lineage.cut(kept)
      val m = cut.count()
      oriented.unpersist(blocking = false)
      graft.core.Lineage.release(e)
      changed = m != n
      e = cut; n = m; round += 1
    }
    e
  }

  /** Vertices of the k-truss: (vid), every endpoint of a surviving edge. */
  def kTrussVertices(edges: DataFrame, k: Int): DataFrame = {
    val t = kTruss(edges, k)
    t.select(col("a").as(Graph.VID))
      .union(t.select(col("b").as(Graph.VID)))
      .distinct()
  }
}
