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

  private def census(es: Seq[(Long, Long)]): Map[String, Long] =
    TriangleCount.directedCensus(es.toDF("src", "dst")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("directedCensus: hand gadget with one triangle of each of the 7 closed classes") {
    // disjoint vertex decades, one closed triad per class, drawn from the
    // Holland–Leinhardt diagrams with the scaladoc's D/U/C convention
    val es = Seq(
      (1L, 2L), (1L, 3L), (2L, 3L),                       // 030T transitive
      (11L, 12L), (12L, 13L), (13L, 11L),                 // 030C cycle
      (21L, 22L), (22L, 21L), (23L, 21L), (23L, 22L),     // 120D: 23 sends to both
      (31L, 32L), (32L, 31L), (31L, 33L), (32L, 33L),     // 120U: 33 receives from both
      (41L, 42L), (42L, 41L), (43L, 41L), (42L, 43L),     // 120C: path through the dyad
      (51L, 52L), (52L, 51L), (52L, 53L), (53L, 52L), (51L, 53L), // 210
      (61L, 62L), (62L, 61L), (62L, 63L), (63L, 62L), (61L, 63L), (63L, 61L)) // 300
    val got = census(es)
    assert(got == Map("030T" -> 1L, "030C" -> 1L, "120D" -> 1L, "120U" -> 1L,
      "120C" -> 1L, "210" -> 1L, "300" -> 1L))
  }

  test("directedCensus: all-mutual K4 is four 300s; a DAG has no mutual classes") {
    val k4 = (for (i <- 0L until 4L; j <- 0L until 4L if i != j) yield (i, j))
    assert(census(k4) ==
      Map("030T" -> 0L, "030C" -> 0L, "120D" -> 0L, "120U" -> 0L,
        "120C" -> 0L, "210" -> 0L, "300" -> 4L))
    // DAG orientation of K4 (i→j for i<j): every triangle transitive
    val dag = (for (i <- 0L until 4L; j <- i + 1 until 4L) yield (i, j))
    assert(census(dag)("030T") == 4L)
    assert(census(dag).filter(_._1 != "030T").values.forall(_ == 0L))
  }

  test("directedCensus: matches a driver-side brute force on a pseudo-random digraph") {
    val es = (0 until 1500).map(i => ((i * 37L + 11) % 100, (i * 53L + 29) % 100))
      .filter(e => e._1 != e._2)
    val set = es.toSet
    val verts = set.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    def code(p: Long, q: Long): Int =
      (if (set((p, q))) 1 else 0) | (if (set((q, p))) 2 else 0)
    val want = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    for {
      i <- verts.indices; j <- i + 1 until verts.size; k <- j + 1 until verts.size
      x = verts(i); y = verts(j); z = verts(k)
      cxy = code(x, y); cxz = code(x, z); cyz = code(y, z)
      if cxy > 0 && cxz > 0 && cyz > 0
    } {
      val m = Seq(cxy, cxz, cyz).count(_ == 3)
      val t =
        if (m == 3) "300"
        else if (m == 2) "210"
        else if (m == 1) {
          val out =
            if (cxy == 3) (if (cxz == 2) 1 else 0) + (if (cyz == 2) 1 else 0)
            else if (cxz == 3) (if (cxy == 2) 1 else 0) + (if (cyz == 1) 1 else 0)
            else (if (cxy == 1) 1 else 0) + (if (cxz == 1) 1 else 0)
          if (out == 2) "120D" else if (out == 0) "120U" else "120C"
        }
        else if ((cxy, cxz, cyz) == ((1, 2, 1)) || (cxy, cxz, cyz) == ((2, 1, 2))) "030C"
        else "030T"
      want(t) += 1
    }
    val got = census(es)
    Seq("030T", "030C", "120D", "120U", "120C", "210", "300").foreach { t =>
      assert(got(t) == want(t), s"$t: ${got(t)} vs ${want(t)}")
    }
    assert(got.values.sum ==
      TriangleCount.total(es.toDF("src", "dst")))
  }
}
