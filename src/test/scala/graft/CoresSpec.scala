package graft

import org.apache.spark.sql.functions._
import graft.alg.Cores
import graft.gen.GraphGen

/** Full core decomposition (h-operator iteration) vs exact sequential
 * peeling; the fixed-threshold kCore/pCores peeling suites live in
 * TraversalSpec. */
class CoresSpec extends SparkSpec {
  import spark.implicits._

  /** Exact coreness by sequential peeling (Batagelj-Zaversnik semantics):
   * raise k only when no vertex of degree ≤ k remains; removals cascade at
   * the current k. */
  private def peelCoreness(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val und = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .filter { case (a, b) => a != b }.distinct
    val adj = scala.collection.mutable.Map[Long, scala.collection.mutable.Set[Long]]()
    und.foreach { case (a, b) =>
      adj.getOrElseUpdate(a, scala.collection.mutable.Set[Long]()) += b
    }
    val core = scala.collection.mutable.Map[Long, Long]()
    var k = 0L
    while (adj.nonEmpty) {
      val ready = adj.keys.filter(v => adj(v).size <= k).toList
      if (ready.isEmpty) k += 1
      else ready.foreach { v =>
        core(v) = k
        adj(v).foreach(u => if (adj.contains(u)) adj(u) -= v)
        adj -= v
      }
    }
    core.toMap
  }

  test("clique: every vertex has coreness n-1") {
    val r = Cores.coreness(GraphGen.complete(spark, 6))
    assert(toMap[Long](r.coreness).values.toSet == Set(5L))
    assert(r.metrics.last.converged)
  }

  test("chain and star: coreness 1 everywhere") {
    assert(toMap[Long](Cores.coreness(GraphGen.chain(spark, 12)).coreness)
      .values.toSet == Set(1L))
    assert(toMap[Long](Cores.coreness(GraphGen.star(spark, 9)).coreness)
      .values.toSet == Set(1L))
  }

  test("clique with a pendant path: core separates from tendril") {
    // K5 on 0..4 plus path 4-10-11: clique coreness 4, path vertices 1
    val edges = (for (i <- 0 until 5; j <- i + 1 until 5) yield (i.toLong, j.toLong))
      .toSeq ++ Seq((4L, 10L), (10L, 11L))
    val r = toMap[Long](Cores.coreness(edges.toDF("src", "dst")).coreness)
    for (v <- 0 until 5) assert(r(v.toLong) == 4L)
    assert(r(10L) == 1L && r(11L) == 1L)
  }

  test("h-operator fixpoint equals exact peeling on RMAT") {
    val edges = GraphGen.rmat(spark, 7, 4, seed = 19).cache()
    val es = edges.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val oracle = peelCoreness(es)
    val res = Cores.coreness(edges)
    assert(res.metrics.last.converged, "h-operator must reach its fixpoint")
    val actual = toMap[Long](res.coreness)
    assert(actual.keySet == oracle.keySet)
    oracle.foreach { case (v, c) =>
      assert(actual(v) == c, s"vid=$v: ${actual(v)} vs peel oracle $c")
    }
  }

  test("capped rounds give a monotone upper bound (values only decrease)") {
    val edges = GraphGen.rmat(spark, 6, 4, seed = 23).cache()
    val exact = toMap[Long](Cores.coreness(edges).coreness)
    val capped = toMap[Long](Cores.coreness(edges, maxRounds = 1).coreness)
    exact.foreach { case (v, c) => assert(capped(v) >= c, s"vid=$v") }
    // round 1 from c0=deg IS the degree h-index — spot-check a star center:
    // 8 leaves of value 1 → h = 1
    val star = toMap[Long](Cores.coreness(GraphGen.star(spark, 9), maxRounds = 1).coreness)
    assert(star(0L) == 1L)
  }
}
