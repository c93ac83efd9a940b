package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Spinner-style balanced k-way partitioning by label propagation
 * (Martella / Logothetis / Loukas / Siganos, "Spinner: Scalable Graph
 * Partitioning in the Cloud", ICDE 2017 — public). This is the
 * ALGORITHMIC counterpart of the reference's partition-assignment goal
 * (`/root/reference/src/totem/totem_partition.cu:264-397` assigns vertices
 * to processors balancing EDGE mass): where [[Partitioning.edgeBalancedBuckets]]
 * balances edge mass by degree order alone, Spinner additionally minimizes
 * the EDGE CUT — vertices migrate toward the partition holding most of
 * their neighbors, dampened by a load penalty so no partition exceeds its
 * edge-mass capacity.
 *
 * Per-round score of vertex v for candidate partition p:
 *   score(v,p) = w(v,p)/deg(v) + balanceWeight * (1 - load(p)/capacity)
 * where w(v,p) = #neighbors of v in p, load(p) = Σ deg over members of p,
 * capacity = capacityFactor * totalDeg / k — the paper's LPA affinity term
 * plus its linear load penalty (§3.2 of the paper, re-derived here).
 *
 * Determinism contract (cross-engine, the Louvain family idiom):
 *  - scores are ROUNDED to 9 dp; ties break to the SMALLEST partition id;
 *  - synchronous moves oscillate on symmetric structures, so rounds
 *    alternate the parity gate (round r moves only vid % 2 == r % 2);
 *  - init is part = vid % k (fixed, SQL-expressible).
 *
 * Scale shape per round: one k-row load aggregate (broadcast), one
 * edge-sized groupBy for neighbor-partition weights, one bounded top-1
 * aggregate keyed on vid — no windows, no driver loops; the only collect
 * is the O(1) total-degree stat.
 */
object Spinner {

  /** Symmetric unit frame (src, dst): both directions, distinct, no
   * self-loops — partitioning treats the link graph as undirected. */
  private def symmetrize(edges: DataFrame): DataFrame =
    Graph.undirected(edges).filter(col(Graph.SRC) =!= col(Graph.DST))

  /**
   * Run `rounds` synchronous Spinner rounds; returns (vid, part) with
   * part in [0, k). Isolated vertices don't appear (they have no edges to
   * place); callers can union them in with part = vid % k.
   */
  def partition(edges: DataFrame, k: Int, rounds: Int,
                capacityFactor: Double = 1.05,
                balanceWeight: Double = 1.0): DataFrame = {
    require(k > 0, "k must be positive")
    // cut: every round's moveRound re-reads the symmetrized table — uncut,
    // that re-ran the upstream edge derivation once per round
    val sym = Lineage.cut(symmetrize(edges))
    val deg = sym.groupBy(col(Graph.SRC).as(Graph.VID))
      .agg(count(lit(1)).cast("double").as("deg")).persist()
    // empty graph (nothing but self-loops, or no edges at all): nothing to
    // place — return the empty (vid, part) frame instead of NPE on a null sum
    val totalRow = deg.agg(sum("deg")).collect()(0)
    if (totalRow.isNullAt(0)) {
      // release the freshly cut sym too — the normal epilogue's discipline
      deg.unpersist(blocking = false); Lineage.release(sym)
      return deg.select(col(Graph.VID), lit(0).as("part")).limit(0)
    }
    val totalDeg = totalRow.getDouble(0)
    val capacity = capacityFactor * totalDeg / k
    // per-round state is referenced by totals, weights, scoring and the
    // update — cut once per round so the logical plan stays linear
    var state = Lineage.cut(
      deg.select(col(Graph.VID), (col(Graph.VID) % k).as("part")))
    for (r <- 0 until rounds) {
      val next = Lineage.cut(moveRound(sym, state, deg, capacity, balanceWeight, r))
      Lineage.release(state)
      state = next
    }
    deg.unpersist()
    Lineage.release(sym)
    state
  }

  private def moveRound(sym: DataFrame, state: DataFrame, deg: DataFrame,
                        capacity: Double, bw: Double, r: Int): DataFrame = {
    // load(p) = Σ deg over members — k rows, broadcast into the score join
    val load = state.join(deg, Graph.VID)
      .groupBy(col("part").as("cand")).agg(sum("deg").as("load"))
    // w(v,p) = #neighbors of v currently in p
    val ev = sym
      .join(state.select(col(Graph.VID).as("__d"), col("part").as("cand")),
        col(Graph.DST) === col("__d"))
      .groupBy(col(Graph.SRC).as(Graph.VID), col("cand"))
      .agg(count(lit(1)).cast("double").as("w"))
    // explicit stay candidate (w = 0 merges with any same-part mass)
    val stay = state.select(col(Graph.VID), col("part").as("cand"), lit(0.0).as("w"))
    val cand = ev.union(stay).groupBy(Graph.VID, "cand").agg(sum("w").as("w"))
    val scored = cand
      .join(deg, Graph.VID)
      .join(broadcast(load), "cand")
      .withColumn("__score",
        round(col("w") / col("deg") +
          lit(bw) * (lit(1.0) - col("load") / lit(capacity)), 9))
    // argmax score, smallest-cand tiebreak — bounded top-1 keeps the
    // groupBy hash-aggregable (same rationale as Louvain.moveRound)
    val best = scored.groupBy(Graph.VID)
      .agg(graft.functions.TopKStructs.topK(
        -col("__score"), col("cand"), col("__score"), 1).as("b"))
      .select(col(Graph.VID), element_at(col("b"), 1).getField("l").as("__new"))
    state.join(best, Graph.VID)
      .select(col(Graph.VID),
        when(pmod(col(Graph.VID), lit(2L)) === lit(r % 2), col("__new"))
          .otherwise(col("part")).as("part"))
  }

  /** Fraction of (symmetrized, self-loop-free) edge slots whose endpoints
   * land in different partitions — the objective Spinner minimizes. */
  def edgeCutFraction(edges: DataFrame, parts: DataFrame): Double = {
    val sym = symmetrize(edges)
    val joined = sym
      .join(parts.select(col(Graph.VID).as(Graph.SRC), col("part").as("__ps")), Graph.SRC)
      .join(parts.select(col(Graph.VID).as(Graph.DST), col("part").as("__pd")), Graph.DST)
    val row = joined.agg(
      sum(when(col("__ps") =!= col("__pd"), 1L).otherwise(0L)).as("cut"),
      count(lit(1)).as("all")).collect()(0)
    if (row.isNullAt(0) || row.getLong(1) == 0L) 0.0
    else row.getLong(0).toDouble / row.getLong(1)
  }
}
