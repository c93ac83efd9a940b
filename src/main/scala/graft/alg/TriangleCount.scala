package graft.alg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.core.Graph

/**
 * Triangle counting / local clustering coefficient — same results as the
 * reference's sorted-neighbours merge-intersection variant
 * (`/root/reference/src/alg/totem_clustering.cu:368-431`): per vertex v,
 * T(v) = number of triangles incident to v; CC(v) = 2·T(v)/(d(d-1)), 0 when
 * d<2 (d = distinct-neighbor degree on the undirected simple graph).
 *
 * Spark-first formulation: instead of merge-scanning sorted CSR rows, orient
 * each undirected edge from the lower-(degree,id) endpoint to the higher —
 * every triangle then has exactly one "pivot" vertex with two out-edges, so
 * the wedge self-join fans out per-vertex at most min(deg, sqrt(2E)) — the
 * standard bound that keeps the join balanced on power-law graphs (the same
 * skew the reference attacks with degree-sectioned kernels). Results are
 * identical to id-sorted intersection: both enumerate each triangle once.
 */
object TriangleCount {

  /** (vid, tri_count) for every vertex of the simple undirected graph
   * (vertices in no triangle included with 0). */
  def perVertex(edges: DataFrame): DataFrame = {
    val canon = canonical(edges).persist(StorageLevel.MEMORY_AND_DISK)
    val tris = triangles(canon).persist(StorageLevel.MEMORY_AND_DISK)
    val counts = tris.select(col("a").as(Graph.VID))
      .union(tris.select(col("b").as(Graph.VID)))
      .union(tris.select(col("c").as(Graph.VID)))
      .groupBy(Graph.VID).agg(count(lit(1)).as("tri_count"))
    val verts = canon.select(col("a").as(Graph.VID))
      .union(canon.select(col("b").as(Graph.VID))).distinct()
    val out = verts.join(counts, Seq(Graph.VID), "left")
      .select(col(Graph.VID), coalesce(col("tri_count"), lit(0L)).as("tri_count"))
    out
  }

  /** Total triangle count of the simple undirected graph. */
  def total(edges: DataFrame): Long = triangles(canonical(edges)).count()

  /** Canonicalized simple edge set: (a,b) with a<b, self-loops dropped,
   * deduped — the analog of requiring sorted unique neighbours. */
  def canonical(edges: DataFrame): DataFrame =
    edges.select(
      least(col(Graph.SRC), col(Graph.DST)).as("a"),
      greatest(col(Graph.SRC), col(Graph.DST)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()

  /** Degree-ordered orientation of the canonical edge set: each undirected
   * edge as (u, v) with u the lower-(deg, id) endpoint. NOT persisted — the
   * plan references it three times (two wedge sides + closing probe), so
   * callers that execute it should cache it for the read
   * ([[triangles]] does; [[Truss.kTruss]] manages its own per-round copy). */
  private[alg] def orient(canon: DataFrame): DataFrame = {
    // undirected degree for orientation
    val deg = canon.select(col("a").as(Graph.VID))
      .union(canon.select(col("b").as(Graph.VID)))
      .groupBy(Graph.VID).agg(count(lit(1)).as("deg"))
    // total order: (deg, vid); orient edge toward the larger endpoint
    val withDeg = canon
      .join(deg.select(col(Graph.VID).as("a"), col("deg").as("da")), "a")
      .join(deg.select(col(Graph.VID).as("b"), col("deg").as("db")), "b")
    withDeg.select(
      when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
        struct(col("a").as("u"), col("b").as("v")))
        .otherwise(struct(col("b").as("u"), col("a").as("v"))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
  }

  /** Distinct triangles (a,b,c) of the canonical edge set, each exactly once.
   * Degree-ordered orientation bounds wedge fan-out under skew. */
  def triangles(canon: DataFrame): DataFrame = {
    val oriented = orient(canon).persist(StorageLevel.MEMORY_AND_DISK)
    trianglesOfOriented(oriented)
  }

  /** Triangle enumeration over an already-materialized orientation —
   * the loop body form used by [[Truss.kTruss]], which persists and
   * releases the oriented frame itself once per peel round. */
  private[alg] def trianglesOfOriented(oriented: DataFrame): DataFrame = {
    // wedges at the pivot u: pairs of out-neighbors (v1 < v2 in orientation
    // order ⇒ compare (deg,id) — but out-edges already point "up", so any
    // consistent pair ordering works; order by v id for determinism)
    val e1 = oriented.select(col("u"), col("v").as("v1"))
    val e2 = oriented.select(col("u"), col("v").as("v2"))
    val wedges = e1.join(e2, "u").filter(col("v1") < col("v2"))
    // close the wedge: the third edge may be oriented either way between
    // v1,v2 — oriented edges are unique per unordered pair, canonical probe:
    val closing = oriented.select(
      least(col("u"), col("v")).as("x"), greatest(col("u"), col("v")).as("y"))
    val tri = wedges
      .join(closing,
        least(col("v1"), col("v2")) === col("x") &&
          greatest(col("v1"), col("v2")) === col("y"))
      .select(col("u").as("a"), col("v1").as("b"), col("v2").as("c"))
    tri
  }

  /** Local clustering coefficient per vertex —
   * CC(v) = 2·T(v)/(d(d-1)), 0 if d<2 (`totem_clustering.cu:368-431`). */
  def clusteringCoefficient(edges: DataFrame): DataFrame = {
    val canon = canonical(edges)
    val deg = canon.select(col("a").as(Graph.VID))
      .union(canon.select(col("b").as(Graph.VID)))
      .groupBy(Graph.VID).agg(count(lit(1)).as("deg"))
    perVertex(edges).join(deg, Seq(Graph.VID), "left")
      .select(col(Graph.VID),
        when(col("deg") >= 2,
          lit(2.0) * col("tri_count") / (col("deg") * (col("deg") - 1)))
          .otherwise(lit(0.0)).as("coefficient"))
  }
}
