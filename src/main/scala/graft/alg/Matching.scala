package graft.alg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.{Graph, StepResult, Superstep}

/**
 * Maximal matching by parallel mutual-minimum rounds over a fixed
 * deterministic edge order (the edge analog of [[Independent]]'s Luby MIS;
 * an extension — the reference inventory has no matching kernel). Each
 * round selects every live edge that is the strict minimum, under a global
 * total order on edges, among all live edges incident to either of its
 * endpoints; matched endpoints and their incident edges leave the live set.
 *
 * Because the per-vertex order is the restriction of one global order, the
 * globally smallest live edge is always a mutual minimum — every round
 * makes progress, and the fixpoint equals the sequential greedy matching
 * over the edge order (spec-checked against a driver-side greedy oracle).
 *
 * Determinism / oracle: the edge key packs a multiplicative hash with the
 * canonical endpoint pair as tiebreak into one BIGINT using plain integer
 * arithmetic, so DuckDB computes the identical order. Domain: vid < 2^21
 * (hash * 2^42 + a * 2^21 + b stays under 2^63); beyond that widen to a
 * (hash, a, b) lexicographic min.
 *
 * Scale shape: a round is one union + min-aggregate over live edge
 * endpoints (one Exchange, map-side combined) and two small joins — no
 * windows, no driver-side loops; the live set shrinks geometrically like a
 * peeling round in [[Cores]].
 */
object Matching {

  final case class Result(matching: DataFrame, mates: DataFrame,
      metrics: Seq[graft.core.StepMetrics])

  /** Global edge order key over canonical endpoints a < b. */
  private[graft] def edgeKey(a: Column, b: Column): Column =
    (a * lit(2654435761L) + b * lit(2097593L) + lit(104729L)) % lit(2097143L) *
      lit(4398046511104L) + a * lit(2097152L) + b

  /**
   * `edges` may be directed or carry duplicates; canonicalized internally
   * (self-loops dropped — a self-loop cannot be matched). Returns the
   * matched pairs `(a, b)` and a per-vertex view `(vid, mate)` with
   * mate = -1 for unmatched vertices.
   */
  def run(edges: DataFrame,
          maxSupersteps: Int = 100,
          verbose: Boolean = false): Result = {
    val ce = edges.filter(col(Graph.SRC) =!= col(Graph.DST))
      .select(least(col(Graph.SRC), col(Graph.DST)).as("a"),
        greatest(col(Graph.SRC), col(Graph.DST)).as("b"))
      .distinct()
    val verts = Graph.vertices(edges)

    // state: (a, b, pk, m) — m=true once matched; live = !m
    val init = ce.select(col("a"), col("b"), edgeKey(col("a"), col("b")).as("pk"),
      lit(false).as("m"))

    var carriedLive: Option[Long] = None
    val outcome = Superstep.run(init,
      Superstep.Config(maxSupersteps = maxSupersteps, verbose = verbose)) { (state, _) =>
      val liveBefore = carriedLive.getOrElse(state.filter(!col("m")).count())
      val live = state.filter(!col("m"))
      // per-vertex minimum live incident edge key
      val vmin = live.select(col("a").as(Graph.VID), col("pk"))
        .union(live.select(col("b").as(Graph.VID), col("pk")))
        .groupBy(Graph.VID).agg(min("pk").as("__mn"))
      // mutual minima — the selected edges of this round
      val sel = live
        .join(vmin.select(col(Graph.VID).as("__va"), col("__mn").as("__mna"))
          .hint("shuffle_hash"), col("a") === col("__va"))
        .join(vmin.select(col(Graph.VID).as("__vb"), col("__mn").as("__mnb"))
          .hint("shuffle_hash"), col("b") === col("__vb"))
        .filter(col("pk") === col("__mna") && col("pk") === col("__mnb"))
        .select(col("a"), col("b"))
      val matchedV = sel.select(col("a").as(Graph.VID))
        .union(sel.select(col("b").as(Graph.VID))).distinct()
        .select(col(Graph.VID), lit(true).as("__hit"))
      // selected edges flip to matched; other edges touching a matched
      // vertex die; the rest stay live
      val next = state.filter(col("m")).unionByName(
        live
          .join(sel.select(col("a").as("__sa"), col("b").as("__sb"),
            lit(true).as("__sel")).hint("shuffle_hash"),
            col("a") === col("__sa") && col("b") === col("__sb"), "left")
          .join(matchedV.select(col(Graph.VID).as("__ha"), col("__hit").as("__hita"))
            .hint("shuffle_hash"), col("a") === col("__ha"), "left")
          .join(matchedV.select(col(Graph.VID).as("__hb"), col("__hit").as("__hitb"))
            .hint("shuffle_hash"), col("b") === col("__hb"), "left")
          .filter(col("__sel").isNotNull ||
            (col("__hita").isNull && col("__hitb").isNull))
          .select(col("a"), col("b"), col("pk"),
            col("__sel").isNotNull.as("m")))
      val cut = graft.core.Lineage.cut(next)
      val liveAfter = cut.filter(!col("m")).count()
      carriedLive = Some(liveAfter)
      StepResult(cut, liveBefore, converged = liveAfter == 0L)
    }

    val matching = outcome.state.filter(col("m")).select(col("a"), col("b"))
    Result(matching, matesView(verts, matching), outcome.metrics)
  }

  /**
   * 2-approximate minimum vertex cover: the matched endpoints of the
   * maximal matching. Every edge has a matched endpoint (else the matching
   * was not maximal), and any cover must pick ≥1 endpoint per matched edge,
   * so |cover| = 2·|M| ≤ 2·OPT — the textbook guarantee, at the cost of one
   * extra join over [[run]]. Returns (vid, in_cover) for every vertex.
   */
  def vertexCover(edges: DataFrame, maxSupersteps: Int = 100): DataFrame =
    run(edges, maxSupersteps).mates
      .select(col(Graph.VID), (col("mate") =!= lit(-1L)).as("in_cover"))

  private def matesView(verts: DataFrame, matching: DataFrame): DataFrame = {
    verts
      .join(matching.select(col("a").as(Graph.VID), col("b").as("__mate1")),
        Seq(Graph.VID), "left")
      .join(matching.select(col("b").as(Graph.VID), col("a").as("__mate2")),
        Seq(Graph.VID), "left")
      .select(col(Graph.VID),
        coalesce(col("__mate1"), col("__mate2"), lit(-1L)).as("mate"))
  }
}
