package graft.alg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Graph

/**
 * Louvain-style modularity community detection (Blondel et al. 2008,
 * public), as a synchronous BSP kernel: repeated local-move rounds (every
 * vertex evaluates the modularity gain of adopting each neighboring
 * community and takes the argmax) followed by graph contraction onto the
 * found communities, repeated per level. Complements the engine's
 * LabelRank/majority-LPA family with the modularity objective the
 * reference's own `Partitioning.modularity` metric evaluates.
 *
 * Determinism contract (cross-engine, same family as LabelRank's pruned
 * comparator):
 *  - scores are ROUNDED to 9 dp before comparison; ties break to the
 *    SMALLEST candidate community id (`min(struct(-score, cand))`);
 *  - simultaneous moves oscillate on symmetric graphs (two adjacent
 *    vertices can swap communities forever), so rounds alternate a PARITY
 *    GATE: round r only lets vertices with vid % 2 == r % 2 move — the
 *    standard Jacobi-style schedule for synchronous Louvain.
 *
 * Representation invariant ("sym" frames): each undirected edge {u,v}, u≠v
 * appears as BOTH (u,v,w) and (v,u,w); a contracted community's internal
 * mass appears as ONE self row (v,v,w) whose weight is already 2× the
 * internal undirected weight (exactly what contracting the two directed
 * rows of each internal edge produces). Under this invariant
 * k_v = Σ_(v,·) w including self rows, and 2m = Σ all w — no special
 * cases. Self rows are EXCLUDED from candidate scoring (a self-loop stays
 * internal to whatever community v picks, so it cancels across candidates)
 * but still count in k_v and the community totals.
 *
 * Scale shape per round: one small aggregation for community totals, one
 * edge-sized groupBy for neighbor-community weights, one argmax
 * aggregation (`min(struct)`) keyed on vid — LabelRank-class cost, no
 * windows, no driver loops beyond the O(1) per-level stats collect.
 */
object Louvain {

  /** Symmetric weighted frame (src, dst, w) from a directed edge table:
   * both directions, distinct, self-loops dropped, unit weights. */
  def symmetrize(edges: DataFrame): DataFrame =
    edges.select(col(Graph.SRC), col(Graph.DST))
      .union(edges.select(col(Graph.DST).as(Graph.SRC), col(Graph.SRC).as(Graph.DST)))
      .filter(col(Graph.SRC) =!= col(Graph.DST))
      .distinct()
      .withColumn("w", lit(1.0))

  /**
   * Fixed number of synchronous local-move rounds over a symmetric
   * weighted frame (see invariant above). Returns (vid, comm); every
   * vertex starts in its own singleton community.
   */
  def localMoves(sym: DataFrame, rounds: Int): DataFrame = {
    val deg = sym.groupBy(col(Graph.SRC).as(Graph.VID))
      .agg(sum("w").as("deg")).persist()
    val noSelf = sym.filter(col(Graph.SRC) =!= col(Graph.DST))
    val twoM = sym.agg(sum("w")).collect()(0).getDouble(0)
    // each round references state several times (totals, neighbor weights,
    // scoring, update) — without a lineage barrier the logical plan grows
    // ~4^rounds; cut once per round like every iterative driver here
    var state = graft.core.Lineage.cut(
      deg.select(col(Graph.VID), col(Graph.VID).as("comm")))
    for (r <- 0 until rounds) {
      val next = graft.core.Lineage.cut(moveRound(noSelf, state, deg, twoM, r))
      graft.core.Lineage.release(state)
      state = next
    }
    deg.unpersist()
    state
  }

  private def moveRound(noSelf: DataFrame, state: DataFrame, deg: DataFrame,
                        twoM: Double, r: Int): DataFrame = {
    // community totals a_c = Σ k_v over members
    val a = state.join(deg, Graph.VID)
      .groupBy(col("comm").as("cand")).agg(sum("deg").as("a"))
    // weight from each vertex into each neighboring community
    val ev = noSelf
      .join(state.select(col(Graph.VID).as("__d"), col("comm").as("cand")),
        col(Graph.DST) === col("__d"))
      .groupBy(col(Graph.SRC).as(Graph.VID), col("cand"))
      .agg(sum("w").as("e"))
    // explicit stay candidate (e = 0 merges with any intra-community mass)
    val stay = state.select(col(Graph.VID), col("comm").as("cand"), lit(0.0).as("e"))
    val cand = ev.union(stay).groupBy(Graph.VID, "cand").agg(sum("e").as("e"))
    val scored = cand
      .join(state, Graph.VID).join(deg, Graph.VID).join(a, "cand")
      // leaving-own-community correction: own k_v is not part of a_c
      .withColumn("__aAdj",
        col("a") - when(col("cand") === col("comm"), col("deg")).otherwise(lit(0.0)))
      .withColumn("__score",
        round(col("e") - col("deg") * col("__aAdj") / lit(twoM), 9))
    // argmax ΔQ with lowest-cand tiebreak = bounded top-1 under ascending
    // (-score, cand): the custom TopKStructs aggregate keeps the groupBy on
    // the ObjectHashAggregate path (min(struct) is not hash-aggregable and
    // would sort every candidate row per round)
    val best = scored.groupBy(Graph.VID)
      .agg(graft.functions.TopKStructs.topK(
        -col("__score"), col("cand"), col("__score"), 1).as("b"))
      .select(col(Graph.VID), element_at(col("b"), 1).getField("l").as("__new"))
    state.join(best, Graph.VID)
      .select(col(Graph.VID),
        when(pmod(col(Graph.VID), lit(2L)) === lit(r % 2), col("__new"))
          .otherwise(col("comm")).as("comm"))
  }

  /** Contract a symmetric weighted frame onto a community mapping,
   * PRESERVING the representation invariant: cross-community directed rows
   * stay paired, internal mass lands on one (c, c) self row at 2× the
   * undirected internal weight automatically. */
  private def contractSym(sym: DataFrame, mapping: DataFrame): DataFrame = {
    val m = mapping.select(col(Graph.VID), col("comm"))
    sym
      .join(m.select(col(Graph.VID).as(Graph.SRC), col("comm").as("__cs")), Graph.SRC)
      .join(m.select(col(Graph.VID).as(Graph.DST), col("comm").as("__cd")), Graph.DST)
      .groupBy(col("__cs").as(Graph.SRC), col("__cd").as(Graph.DST))
      .agg(sum("w").as("w"))
  }

  case class Result(communities: DataFrame, levels: Int)

  /**
   * Full multilevel run: local moves, contract onto the found communities,
   * repeat until a level stops merging (or `maxLevels`). Output:
   * (vid, community) over the ORIGINAL vertex ids.
   */
  def run(edges: DataFrame, roundsPerLevel: Int = 6, maxLevels: Int = 3): Result = {
    var sym = symmetrize(edges).persist()
    // NOT vertices(sym): symmetrize drops self-loops, and a self-loop-only
    // vertex must still appear in the output with its own community
    var global = Graph.vertices(edges)
      .select(col(Graph.VID), col(Graph.VID).as("comm")).persist()
    var level = 0
    var done = false
    while (level < maxLevels && !done) {
      val state = localMoves(sym, roundsPerLevel) // a cut (materialized) frame
      val nNodes = state.count()
      val nComms = state.select("comm").distinct().count()
      // re-map original vertices through this level's assignment; LEFT join:
      // symmetrize() drops self-loops, so a vertex whose only edges are
      // self-loops never enters the level state — it keeps its own community
      // (coalesce) instead of silently vanishing from the output
      val g2 = global
        .join(state.select(col(Graph.VID).as("comm"), col("comm").as("__c2")),
          Seq("comm"), "left")
        .select(col(Graph.VID), coalesce(col("__c2"), col("comm")).as("comm"))
        .persist()
      g2.count()
      global.unpersist(); global = g2
      if (nComms == nNodes) done = true
      else {
        val s2 = contractSym(sym, state).persist()
        s2.count()
        sym.unpersist(); sym = s2
      }
      graft.core.Lineage.release(state)
      level += 1
    }
    sym.unpersist()
    Result(global, level)
  }
}
