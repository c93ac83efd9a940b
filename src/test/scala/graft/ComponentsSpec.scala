package graft

import org.apache.spark.sql.functions._
import graft.alg.ConnectedComponents
import graft.gen.GraphGen
import graft.oracle.Reference

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("4-component chain: labels = min vid per component (reference unittest)") {
    // totem_cc_unittest.cu:103-143 semantics on chain_4_comp_40_nodes-style input
    val edges = GraphGen.disconnectedChains(spark, 4, 10)
    val comp = toMap[Long](ConnectedComponents.run(edges).components)
    assert(comp.size == 40)
    for (v <- 0 until 40) assert(comp(v.toLong) == (v / 10) * 10L)
  }

  test("single chain is one component labeled 0") {
    val comp = toMap[Long](ConnectedComponents.run(GraphGen.chain(spark, 25)).components)
    assert(comp.values.forall(_ == 0L))
  }

  test("matches union-find oracle on RMAT graph (treated undirected)") {
    val edges = GraphGen.rmat(spark, 7, 4, seed = 7).cache()
    val es = edges.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val touched = (es.map(_._1) ++ es.map(_._2)).toSet.toSeq.sorted
    val idMap = touched.zipWithIndex.map { case (g, i) => g -> i.toLong }.toMap
    val inv = idMap.map(_.swap)
    val oracle = Reference.wcc(touched.size, es.map { case (s, d) => (idMap(s), idMap(d)) })
    val actual = toMap[Long](ConnectedComponents.run(edges).components)
    touched.foreach { g =>
      assert(actual(g) == inv(oracle(idMap(g).toInt)),
        s"vid=$g: ${actual(g)} vs ${inv(oracle(idMap(g).toInt))}")
    }
  }

  test("component sizes aggregate (component_set_t analog)") {
    val edges = GraphGen.disconnectedChains(spark, 3, 5)
    val sizes = ConnectedComponents.componentSizes(
      ConnectedComponents.run(edges).components).collect()
    assert(sizes.length == 3)
    assert(sizes.forall(_.getLong(1) == 5L))
  }

  test("warm start from a snapshot reaches the identical fixpoint on a grown graph") {
    val old = GraphGen.rmat(spark, 7, 4, seed = 11).cache()
    // recrawl adds bridges that merge previously separate components
    val extra = Seq((1L, 100L), (3L, 77L), (0L, 5L)).toDF("src", "dst")
    val full = old.union(extra)
    val prev = ConnectedComponents.run(old).components
    val warm = ConnectedComponents.run(full, warmStart = Some(prev))
    val cold = ConnectedComponents.run(full)
    assert(toMap[Long](warm.components) == toMap[Long](cold.components))
  }

  test("warm start from the exact fixpoint converges in one superstep") {
    val edges = GraphGen.rmat(spark, 6, 4, seed = 3).cache()
    val cold = ConnectedComponents.run(edges)
    val warm = ConnectedComponents.run(edges, warmStart = Some(cold.components))
    assert(toMap[Long](warm.components) == toMap[Long](cold.components))
    assert(warm.metrics.size == 1, s"expected 1 superstep, got ${warm.metrics.size}")
    assert(warm.metrics.last.converged)
  }

  test("warm start superstep count tracks the extension, not the diameter") {
    // snapshot covers chain 0..19; the recrawl appends 20..24 — warm-started
    // HashMin only needs label 0 to cross the 5 new hops (+1 quiet step),
    // while a cold start walks the full 25-vertex label diameter
    val prev = ConnectedComponents.run(GraphGen.chain(spark, 20)).components
    val full = GraphGen.chain(spark, 25)
    val warm = ConnectedComponents.run(full, warmStart = Some(prev))
    val cold = ConnectedComponents.run(full)
    assert(toMap[Long](warm.components) == toMap[Long](cold.components))
    assert(warm.metrics.size <= 7, s"warm took ${warm.metrics.size} supersteps")
    assert(cold.metrics.size >= 20, s"cold took ${cold.metrics.size} supersteps")
  }

  test("directed edges are symmetrized (weak connectivity)") {
    val edges = Seq((0L, 1L), (2L, 1L)).toDF("src", "dst")
    val comp = toMap[Long](ConnectedComponents.run(edges).components)
    assert(comp.values.toSet == Set(0L))
  }
}
