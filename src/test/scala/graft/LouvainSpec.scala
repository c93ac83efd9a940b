package graft

import org.apache.spark.sql.functions._
import graft.alg.Louvain

class LouvainSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference of the synchronous parity-gated local-move
   * schedule (unit weights, no self-loops) — mirrors the documented
   * determinism contract exactly. */
  private def refLocalMoves(pairs: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val sym = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .filter(p => p._1 != p._2).distinct
    val vids = sym.map(_._1).distinct.sorted
    val deg = sym.groupBy(_._1).map { case (v, es) => v -> es.size.toDouble }
    val twoM = sym.size.toDouble
    var comm = vids.map(v => v -> v).toMap
    for (r <- 0 until rounds) {
      val a = vids.groupBy(comm).map { case (c, vs) => c -> vs.map(deg).sum }
      comm = vids.map { v =>
        val ev = sym.filter(_._1 == v).map(p => comm(p._2))
          .groupBy(identity).map { case (c, os) => c -> os.size.toDouble }
        val cands = (ev.keySet + comm(v)).toSeq
        val best = cands.map { c =>
          val e = ev.getOrElse(c, 0.0)
          val aAdj = a.getOrElse(c, 0.0) - (if (c == comm(v)) deg(v) else 0.0)
          val s = BigDecimal(e - deg(v) * aAdj / twoM)
            .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
          (-s, c)
        }.min._2
        v -> (if (v % 2 == r % 2) best else comm(v))
      }.toMap
    }
    comm
  }

  private def got(pairs: Seq[(Long, Long)], rounds: Int): Map[Long, Long] =
    Louvain.localMoves(Louvain.symmetrize(pairs.toDF("src", "dst")), rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("local moves match the driver-side reference, round by round") {
    // two triangles + bridge
    val g = Seq((0L, 1L), (1L, 2L), (0L, 2L), (3L, 4L), (4L, 5L), (3L, 5L), (2L, 3L))
    for (r <- 1 to 4) assert(got(g, r) == refLocalMoves(g, r), s"rounds=$r")
    // modular pseudo-random graph
    val g2 = (0L until 120L).map(i => (i % 30, (i * 7 + 3) % 30)).filter(p => p._1 != p._2)
    for (r <- 1 to 3) assert(got(g2, r) == refLocalMoves(g2, r), s"g2 rounds=$r")
  }

  test("multilevel run finds planted clique communities") {
    // four 5-cliques in a ring, one bridge edge between consecutive cliques
    def clique(base: Long) =
      for (i <- 0 until 5; j <- i + 1 until 5) yield (base + i, base + j)
    val bridges = Seq((4L, 5L), (9L, 10L), (14L, 15L), (19L, 0L))
    val edges = ((0L until 4L).flatMap(c => clique(c * 5)) ++ bridges).toDF("src", "dst")
    val res = Louvain.run(edges, roundsPerLevel = 6, maxLevels = 3)
    val comm = res.communities.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every clique ends up in ONE community, and distinct cliques differ
    val byClique = (0L until 4L).map(c => (0 until 5).map(i => comm(c * 5 + i)).toSet)
    assert(byClique.forall(_.size == 1), s"split clique: $byClique")
    assert(byClique.flatten.toSet.size == 4, s"merged cliques: $byClique")
    // the result is a good modularity partition of this graph
    val mapping = res.communities.select(col("vid"), col("comm").as("part"))
    val q = graft.core.Partitioning.modularity(
      edges.union(edges.select(col("dst").as("src"), col("src").as("dst"))), mapping)
    assert(q > 0.5, s"modularity $q")
  }

  test("local moves are partitioning-invariant and deterministic") {
    val g = (0L until 200L).map(i => (i % 50, (i * 11 + 2) % 50)).filter(p => p._1 != p._2)
    val df = g.toDF("src", "dst")
    val a = Louvain.localMoves(Louvain.symmetrize(df), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Louvain.localMoves(Louvain.symmetrize(df.repartition(17)), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("self-loop-only vertices keep their own community in the output") {
    // symmetrize() drops self-loops, so vertex 1 never enters the level
    // state — it must still appear in the final mapping, as its own comm
    val e = Seq((1L, 1L), (2L, 3L)).toDF("src", "dst")
    val m = Louvain.run(e, roundsPerLevel = 2, maxLevels = 2)
      .communities.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m.keySet == Set(1L, 2L, 3L))
    assert(m(1L) == 1L)
    assert(m(2L) == m(3L))
  }
}
