package graft.alg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.{Graph, Lineage}

/**
 * Bounded two-iteration SimRank (Jeh & Widom, "SimRank: A Measure of
 * Structural-Context Similarity", KDD 2002) — "two pages are similar if
 * they are referenced by similar pages", the recursive refinement of
 * co-citation. A link-graph extension beyond the reference (Totem ships no
 * similarity measures; the closest relative here is
 * [[LinkPrediction.cocitationTopK]], whose score IS SimRank's first
 * iteration up to the c/(|I(a)||I(b)|) normalization).
 *
 * Semantics (s0 = identity, in-neighbor sets I(·)):
 *
 *   s1(a,b) = c · |I(a) ∩ I(b)| / (|I(a)|·|I(b)|)
 *   s2(a,b) = c / (|I(a)|·|I(b)|) · Σ_{i∈I(a), j∈I(b)} s1(i,j)
 *
 * Full SimRank iterates over ALL O(V²) pairs — impossible at web scale.
 * The published scale path (Lizorkin et al., VLDB 2008: select essential
 * node pairs) bounds iteration 2 to a CANDIDATE set; here the top
 * `candidates` pairs by s1 under the total order (s1 desc, a, b) — any
 * pair outside it keeps its (already exact) s1. Σ still reads the FULL s1
 * table, so bounded s2 values are exact, not approximations.
 *
 * Plan shape, per stage:
 *  - s1 = the [[LinkPrediction]] grouped-array wedge expansion at the
 *    shared citer (ordered index pairs off each pivot's sorted out-list —
 *    no self-join, only the a<b half generated); `maxPivotDegree` is the
 *    Dean–Henzinger hub valve at scale, Int.MaxValue = the exact oracle
 *    mode (the Butterfly contract).
 *  - s2 = candidate pairs × in-neighbor pairs: O(candidates · d²) rows
 *    through one hash join against the s1 lookup and one map-side-combined
 *    sum — bounded by the candidate cut, never O(V²).
 *
 * Cross-engine exactness (the Dsir nano-unit discipline): s1 is stored as
 * `floor(c·cnt/(da·db)·1e9)` — floor of a positive double is bit-identical
 * in any IEEE engine (no HALF_UP-vs-multiply divergence, the q_pca_cov
 * lesson) — so the candidate cut, the Σ (a BIGINT sum, order-free), and
 * the final `c·Σ/(da·db)/1e9` double are all bit-identical to an oracle
 * computing the same expressions.
 *
 * @return top `k` rows (a, b, s1_nano: BIGINT, simrank2: DOUBLE) by
 *         (simrank2 desc, a, b), a < b.
 */
object SimRank {

  def simrank2TopK(edges: DataFrame, k: Int,
                   c: Double = 0.8,
                   candidates: Int = 2000,
                   maxPivotDegree: Int = Int.MaxValue): DataFrame = {
    // cut: the simple edge set feeds the in-neighbor table's three readers
    // (wedge pivots, both expansion joins) and the degree pass
    val e = Lineage.cut(edges.select(col(Graph.SRC), col(Graph.DST))
      .filter(col(Graph.SRC) =!= col(Graph.DST)).distinct())
    val ina = e.select(col(Graph.DST).as("v"), col(Graph.SRC).as("i"))
    val deg = ina.groupBy("v").agg(count(lit(1)).as("d"))

    // s1: shared-citer wedge count via grouped sorted arrays (i < j ⟺ a < b).
    // Uncapped = the exact oracle mode ONLY: one aggregation row buffers a
    // whole pivot out-list, so a hub makes that row arbitrarily large —
    // warn loudly rather than OOM an executor at scale.
    if (maxPivotDegree == Int.MaxValue)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        "simrank2TopK: running UNCAPPED (maxPivotDegree=Int.MaxValue) — set " +
          "maxPivotDegree (the Dean-Henzinger hub valve) for any at-scale run")
    val piv =
      if (maxPivotDegree == Int.MaxValue) ina
      else {
        val fan = ina.groupBy("i").agg(count(lit(1)).as("__fan"))
        ina.join(fan.filter(col("__fan") <= maxPivotDegree).select("i"), Seq("i"))
      }
    val grouped = piv.groupBy(col("i").as("w"))
      .agg(sort_array(collect_list(col("v"))).as("ns"))
    val cnt = grouped
      .select(posexplode(col("ns")).as(Seq("p", "a")), col("ns"))
      .select(col("a"), explode(slice(col("ns"), col("p") + 2, size(col("ns")))).as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("cnt"))
    val s1 = Lineage.cut(cnt
      .join(deg.select(col("v").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("d").as("db")), "b")
      .select(col("a"), col("b"), col("da"), col("db"),
        floor(lit(c) * col("cnt") / (col("da") * col("db")) * lit(1e9)).as("nano")))

    // candidate cut: TakeOrdered under a total order — no window, no global sort
    val top = Lineage.cut(
      s1.orderBy(col("nano").desc, col("a"), col("b")).limit(candidates))

    // s2: expand candidates over both in-neighbor lists, look up s1 of each
    // (i, j) pair (diagonal s1 = 1 ⇒ 1e9 nano-units), BIGINT-sum per pair
    val exp = top.select(col("a"), col("b"))
      .join(ina.select(col("v").as("a"), col("i").as("ia")), "a")
      .join(ina.select(col("v").as("b"), col("i").as("ib")), "b")
    val lut = s1.select(col("a").as("la"), col("b").as("lb"), col("nano").as("ln"))
    val contrib = exp
      // shuffle_hash on the O(pairs) lookup side: sort-merge would sort the
      // O(candidates·d²) expansion, the plan's largest frame
      .join(lut.hint("shuffle_hash"), least(col("ia"), col("ib")) === col("la") &&
        greatest(col("ia"), col("ib")) === col("lb"), "left")
      .select(col("a"), col("b"),
        when(col("ia") === col("ib"), lit(1000000000L))
          .otherwise(coalesce(col("ln"), lit(0L))).as("cn"))
    val sums = contrib.groupBy("a", "b").agg(sum("cn").as("sumn"))

    top.join(sums, Seq("a", "b"))
      .select(col("a"), col("b"), col("nano").as("s1_nano"),
        (lit(c) * col("sumn") / (col("da") * col("db")) / lit(1e9)).as("simrank2"))
      .orderBy(col("simrank2").desc, col("a"), col("b"))
      .limit(k)
  }
}
