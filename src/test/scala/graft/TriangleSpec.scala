package graft

import graft.alg.TriangleCount
import graft.gen.GraphGen
import graft.oracle.Reference

class TriangleSpec extends SparkSpec {
  import spark.implicits._

  test("complete graph: coefficient 1.0 everywhere (reference unittest)") {
    // totem_clustering_unittest.cu:76-116
    val cc = toMap[Double](TriangleCount.clusteringCoefficient(GraphGen.complete(spark, 7)))
    assert(cc.size == 7)
    cc.values.foreach(v => assert(math.abs(v - 1.0) < 1e-12))
  }

  test("chain and grid: coefficient 0.0 (no triangles)") {
    toMap[Double](TriangleCount.clusteringCoefficient(GraphGen.chain(spark, 10)))
      .values.foreach(v => assert(v == 0.0))
    toMap[Double](TriangleCount.clusteringCoefficient(GraphGen.grid(spark, 3, 4)))
      .values.foreach(v => assert(v == 0.0))
    assert(TriangleCount.total(GraphGen.chain(spark, 10)) == 0L)
  }

  test("K4 total = 4 triangles; per-vertex = 3") {
    val k4 = GraphGen.complete(spark, 4)
    assert(TriangleCount.total(k4) == 4L)
    toMap[Long](TriangleCount.perVertex(k4)).values.foreach(t => assert(t == 3L))
  }

  test("matches oracle per-vertex counts on RMAT graph") {
    val edges = GraphGen.rmat(spark, 7, 8, seed = 11).cache()
    val es = edges.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val vmax = es.flatMap(e => Seq(e._1, e._2)).max.toInt + 1
    val expected = Reference.triangles(vmax, es)
    val actual = toMap[Long](TriangleCount.perVertex(edges))
    actual.foreach { case (v, t) =>
      assert(t == expected(v.toInt), s"vid=$v: $t vs ${expected(v.toInt)}")
    }
    // vertices absent from actual (isolated after canonicalization) have 0
    assert(expected.zipWithIndex.filter(x => !actual.contains(x._2.toLong)).forall(_._1 == 0L))
  }

  test("matches oracle clustering coefficient on uniform graph") {
    val edges = GraphGen.uniform(spark, 40, 300, seed = 5).cache()
    val es = edges.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val vmax = es.flatMap(e => Seq(e._1, e._2)).max.toInt + 1
    val expected = Reference.clusteringCoefficient(vmax, es)
    val actual = toMap[Double](TriangleCount.clusteringCoefficient(edges))
    actual.foreach { case (v, c) =>
      assert(math.abs(c - expected(v.toInt)) < 1e-12, s"vid=$v: $c vs ${expected(v.toInt)}")
    }
  }

  test("self-loops and duplicate edges are ignored (simple-graph semantics)") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (0L, 0L), (0L, 1L), (1L, 0L))
      .toDF("src", "dst")
    assert(TriangleCount.total(edges) == 1L)
  }
}
