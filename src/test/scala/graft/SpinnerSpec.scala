package graft

import org.apache.spark.sql.functions._
import graft.core.Spinner

class SpinnerSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference of the synchronous parity-gated Spinner round —
   * mirrors the documented determinism contract exactly. */
  private def refSpinner(pairs: Seq[(Long, Long)], k: Int, rounds: Int,
                         cf: Double = 1.05, bw: Double = 1.0): Map[Long, Long] = {
    val sym = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .filter(p => p._1 != p._2).distinct
    val vids = sym.map(_._1).distinct.sorted
    val deg = sym.groupBy(_._1).map { case (v, es) => v -> es.size.toDouble }
    val totalDeg = deg.values.sum
    val capacity = cf * totalDeg / k
    var part = vids.map(v => v -> (v % k)).toMap
    for (r <- 0 until rounds) {
      val load = vids.groupBy(part).map { case (p, vs) => p -> vs.map(deg).sum }
      part = vids.map { v =>
        val w = sym.filter(_._1 == v).map(p => part(p._2))
          .groupBy(identity).map { case (p, os) => p -> os.size.toDouble }
        val cands = (w.keySet + part(v)).toSeq
        val best = cands.map { p =>
          val s = BigDecimal(
            w.getOrElse(p, 0.0) / deg(v) + bw * (1.0 - load.getOrElse(p, 0.0) / capacity))
            .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
          (-s, p)
        }.min._2
        v -> (if (v % 2 == r % 2) best else part(v))
      }.toMap
    }
    part
  }

  private def got(pairs: Seq[(Long, Long)], k: Int, rounds: Int): Map[Long, Long] =
    Spinner.partition(pairs.toDF("src", "dst"), k, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("rounds match the driver-side reference exactly") {
    // two triangles + bridge
    val g = Seq((0L, 1L), (1L, 2L), (0L, 2L), (3L, 4L), (4L, 5L), (3L, 5L), (2L, 3L))
    for (r <- 1 to 4) assert(got(g, 2, r) == refSpinner(g, 2, r), s"rounds=$r")
    // modular pseudo-random graph, k = 4
    val g2 = (0L until 160L).map(i => (i % 40, (i * 7 + 3) % 40)).filter(p => p._1 != p._2)
    for (r <- 1 to 3) assert(got(g2, 4, r) == refSpinner(g2, 4, r), s"g2 rounds=$r")
  }

  test("separates two cliques and cuts fewer edges than the vid % k init") {
    // two 8-cliques joined by one bridge, k = 2. NOTE the deliberately
    // ASYMMETRIC vertex ids: clique A (0..7) starts parity-split 4/4,
    // clique B (odd ids 9,11..23) starts wholly in part 1 — two
    // structurally identical cliques with IDENTICAL init patterns would
    // mirror each other forever under a deterministic schedule (Spinner's
    // paper breaks that symmetry with random init; our init is vid % k).
    // The affinity term coalesces each clique; the balance term keeps the
    // cliques apart — the converged cut is exactly the bridge edge.
    val cliqueA = for (i <- 0 until 8; j <- i + 1 until 8) yield (i.toLong, j.toLong)
    val cliqueB = for (i <- 0 until 8; j <- i + 1 until 8)
      yield (9L + 2 * i, 9L + 2 * j)
    val edges = (cliqueA ++ cliqueB :+ (7L, 9L)).toDF("src", "dst")
    val parts = Spinner.partition(edges, k = 2, rounds = 6)
    val m = parts.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val c1 = (0L until 8L).map(m).toSet
    val c2 = (0 until 8).map(i => m(9L + 2 * i)).toSet
    assert(c1.size == 1, s"clique A split: $c1")
    assert(c2.size == 1, s"clique B split: $c2")
    assert(c1 != c2, "balance term failed to separate the cliques")
    assert(m.values.forall(p => p >= 0 && p < 2))
    val init = parts.select(col("vid"), (col("vid") % 2).as("part"))
    val cutInit = Spinner.edgeCutFraction(edges, init)
    val cutSpin = Spinner.edgeCutFraction(edges, parts)
    assert(cutSpin < cutInit, s"spinner $cutSpin vs init $cutInit")
    // converged: only the bridge is cut (2 of 2·(2·28+1) directed slots)
    assert(math.abs(cutSpin - 2.0 / 114.0) < 1e-12, s"cut $cutSpin")
  }

  test("conductance closed form on the converged two-clique partition") {
    val cliqueA = for (i <- 0 until 8; j <- i + 1 until 8) yield (i.toLong, j.toLong)
    val cliqueB = for (i <- 0 until 8; j <- i + 1 until 8)
      yield (9L + 2 * i, 9L + 2 * j)
    val edges = (cliqueA ++ cliqueB :+ (7L, 9L)).toDF("src", "dst")
    val parts = Spinner.partition(edges, k = 2, rounds = 6)
    val rows = graft.core.Partitioning.conductance(edges, parts).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // per side: vol = 56 clique slots + 1 bridge slot, cut = the bridge slot;
    // φ = 1 / min(57, 114 − 57) on both sides
    assert(rows.length == 2)
    rows.foreach { case (_, cut, vol, phi) =>
      assert(cut == 1L && vol == 57L)
      assert(math.abs(phi - BigDecimal(1.0 / 57.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
    }
    // the lone-part guard: everything in one part → φ = 0, not a div-by-zero
    val one = parts.select(col("vid"), lit(0L).as("part"))
    val lone = graft.core.Partitioning.conductance(edges, one).collect()
    assert(lone.length == 1 && lone(0).getDouble(3) == 0.0)
  }

  test("partitioning-invariant and deterministic") {
    val g = (0L until 200L).map(i => (i % 50, (i * 11 + 2) % 50)).filter(p => p._1 != p._2)
    val df = g.toDF("src", "dst")
    val a = Spinner.partition(df, 4, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Spinner.partition(df.repartition(17), 4, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }
}
