package graft

import org.apache.spark.sql.functions._
import graft.alg.LabelPropagation
import graft.gen.GraphGen
import graft.oracle.Reference

class LabelPropagationSpec extends SparkSpec {
  import spark.implicits._

  private def check(edges: org.apache.spark.sql.DataFrame, v: Int): Unit = {
    val es = edges.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val expected = Reference.labelRank(v, es)
    val actual = toMap[Long](LabelPropagation.labelRank(edges).labels)
    (0 until v).foreach { i =>
      assert(actual(i.toLong) == expected(i), s"vid=$i: ${actual(i.toLong)} vs ${expected(i)}")
    }
  }

  test("matches dense-matrix oracle exactly on 4-component chains (reference fixture shape)") {
    // totem_label_propagation_unittest.cu:86-101 uses chain_4_comp_40_nodes
    check(GraphGen.disconnectedChains(spark, 4, 10), 40)
  }

  // NOTE: no complete-graph case here on purpose: on K_n every non-self
  // label ties at exactly (1 + (n-2)/(n-1))/(n-1) and the argmax winner is
  // decided by floating-point summation ORDER — the same implementation-
  // order divergence the reference documents for its own CPU-vs-GPU float
  // runs (totem_page_rank_unittest.cu:18-21). Parity is asserted on graphs
  // whose argmax is order-stable (incl. the reference's own LP fixture).

  test("matches oracle on star") {
    check(GraphGen.star(spark, 9), 9)
  }

  test("matches oracle on grid") {
    check(GraphGen.grid(spark, 4, 5), 20)
  }

  test("matches oracle on random undirected graph") {
    val und = graft.core.Graph.undirected(GraphGen.uniform(spark, 30, 60, seed = 3))
    val vmax = und.agg(greatest(max("src"), max("dst"))).collect()(0).getLong(0).toInt + 1
    // oracle needs the dense id universe including isolated ids
    val es = und.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val expected = Reference.labelRank(vmax, es)
    val actual = toMap[Long](LabelPropagation.labelRank(und).labels)
    es.flatMap(e => Seq(e._1, e._2)).distinct.foreach { i =>
      assert(actual(i) == expected(i.toInt), s"vid=$i: ${actual(i)} vs ${expected(i.toInt)}")
    }
  }

  test("communities are within components (property)") {
    val edges = GraphGen.disconnectedChains(spark, 3, 7)
    val labels = toMap[Long](LabelPropagation.labelRank(edges).labels)
    labels.foreach { case (v, l) => assert(l / 7 == v / 7, s"label $l escaped component of $v") }
  }

  test("majority LPA converges to one label per clique component") {
    val edges = GraphGen.complete(spark, 6)
    val labels = toMap[Long](LabelPropagation.majorityLpa(edges, iterations = 8).labels)
    assert(labels.values.toSet.size == 1)
  }
}
