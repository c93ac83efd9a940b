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

  /** Directed triad census over the CLOSED triads — the 7
   * Holland–Leinhardt classes where all three dyads are connected:
   * `030T` (transitive), `030C` (3-cycle), `120D`/`120U`/`120C` (one
   * mutual dyad, two asymmetric arcs), `210` (two mutual), `300` (all
   * mutual). The classic web/social-graph motif profile: feed-forward vs
   * cyclic closure and reciprocity structure (the reference counts only
   * undirected triangles, `totem_clustering.cu:368-431` — this extends
   * the same enumeration with direction classes).
   *
   * Naming convention for the one-mutual classes (documented because the
   * literature draws them in both orientations): let z be the vertex
   * OUTSIDE the mutual dyad — `120D` = z sends to both endpoints ("down"
   * into the dyad), `120U` = z receives from both, `120C` = one each (a
   * path through the dyad).
   *
   * Plan shape: one dyad-code aggregation (`bit_or` of direction bits —
   * map-side combinable), the degree-oriented wedge join of [[triangles]]
   * (fan-out bounded by min(deg, sqrt 2E) under skew), then three
   * pair-keyed hash joins against the dyad table and one 7-group
   * aggregate. No window, no cartesian; all 7 rows always present.
   */
  def directedCensus(edges: DataFrame): DataFrame = {
    val ss = edges.sparkSession
    import ss.implicits._
    val directed = edges.select(col(Graph.SRC), col(Graph.DST))
      .filter(col(Graph.SRC) =!= col(Graph.DST)).distinct()
    // dyad code per unordered pair p<q: 1 = p→q only, 2 = q→p only, 3 = mutual
    val dyads = directed.select(
        least(col(Graph.SRC), col(Graph.DST)).as("p"),
        greatest(col(Graph.SRC), col(Graph.DST)).as("q"),
        when(col(Graph.SRC) < col(Graph.DST), lit(1)).otherwise(lit(2)).as("m"))
      .groupBy("p", "q").agg(bit_or(col("m")).as("code"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // triangles of the underlying undirected simple graph, triple sorted x<y<z
    val tri = triangles(dyads.select(col("p").as("a"), col("q").as("b")))
      .select(least(col("a"), col("b"), col("c")).as("x"),
        (col("a") + col("b") + col("c")
          - least(col("a"), col("b"), col("c"))
          - greatest(col("a"), col("b"), col("c"))).as("y"),
        greatest(col("a"), col("b"), col("c")).as("z"))
    val coded = tri
      .join(dyads.select(col("p").as("x"), col("q").as("y"), col("code").as("cxy")), Seq("x", "y"))
      .join(dyads.select(col("p").as("x"), col("q").as("z"), col("code").as("cxz")), Seq("x", "z"))
      .join(dyads.select(col("p").as("y"), col("q").as("z"), col("code").as("cyz")), Seq("y", "z"))
    val mutuals = (col("cxy") === 3).cast("int") + (col("cxz") === 3).cast("int") +
      (col("cyz") === 3).cast("int")
    // 3-cycle: x→y→z→x is codes (1,2,1) in (cxy,cxz,cyz); x→z→y→x is (2,1,2)
    val cyc030 = (col("cxy") === 1 && col("cxz") === 2 && col("cyz") === 1) ||
      (col("cxy") === 2 && col("cxz") === 1 && col("cyz") === 2)
    // one-mutual classes: out-arrow count of the vertex outside the mutual dyad
    val thirdOut =
      when(col("cxy") === 3, (col("cxz") === 2).cast("int") + (col("cyz") === 2).cast("int"))
        .when(col("cxz") === 3, (col("cxy") === 2).cast("int") + (col("cyz") === 1).cast("int"))
        .otherwise((col("cxy") === 1).cast("int") + (col("cxz") === 1).cast("int"))
    val typ = when(mutuals === 3, "300")
      .when(mutuals === 2, "210")
      .when(mutuals === 1,
        when(thirdOut === 2, "120D").when(thirdOut === 0, "120U").otherwise("120C"))
      .otherwise(when(cyc030, "030C").otherwise("030T"))
    val counts = coded.groupBy(typ.as("triad_type")).agg(count(lit(1)).as("n"))
    Seq("030T", "030C", "120D", "120U", "120C", "210", "300").toDF("triad_type")
      .join(counts, Seq("triad_type"), "left")
      .select(col("triad_type"), coalesce(col("n"), lit(0L)).as("n"))
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
