package graft

import graft.alg.{TriangleCount, Truss}
import graft.gen.GraphGen

class TrussSpec extends SparkSpec {
  import spark.implicits._

  private def edgeSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  /** Driver-side peeling oracle over an explicit edge list. */
  private def trussOracle(edges: Set[(Long, Long)], k: Int): Set[(Long, Long)] = {
    var e = edges
    var changed = true
    while (changed && e.nonEmpty) {
      val adj = (e.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) })
        .groupMap(_._1)(_._2).map { case (v, ns) => v -> ns.toSet }
      val supp = e.iterator.map { case (a, b) =>
        (a, b) -> (adj(a) & adj(b)).size
      }.toMap
      val kept = e.filter(supp(_) >= k - 2)
      changed = kept != e
      e = kept
    }
    e
  }

  test("K5: 5-truss is K5 itself; 6-truss is empty") {
    val k5 = GraphGen.complete(spark, 5)
    assert(edgeSet(Truss.kTruss(k5, 5)).size == 10)
    assert(Truss.kTruss(k5, 6).isEmpty)
  }

  test("2-truss is the canonical simple graph (no peeling)") {
    val g = Seq((0L, 1L), (1L, 2L), (1L, 0L), (2L, 2L)).toDF("src", "dst")
    assert(edgeSet(Truss.kTruss(g, 2)) == Set((0L, 1L), (1L, 2L)))
  }

  test("bridge between two K4s is peeled out of the 4-truss") {
    // K4 on {0..3}, K4 on {10..13}, bridge 3-10 (in no triangle)
    val k4a = for (i <- 0 to 3; j <- (i + 1) to 3) yield (i.toLong, j.toLong)
    val k4b = k4a.map { case (a, b) => (a + 10, b + 10) }
    val g = (k4a ++ k4b :+ (3L, 10L)).toDF("src", "dst")
    val t = edgeSet(Truss.kTruss(g, 4))
    assert(t == (k4a ++ k4b).toSet)
    val vids = Truss.kTrussVertices(g, 4).collect().map(_.getLong(0)).toSet
    assert(vids == ((0 to 3) ++ (10 to 13)).map(_.toLong).toSet)
  }

  test("cascading peel: triangle chain collapses under k=4") {
    // triangles sharing single edges only: each edge has support <= 1,
    // so the 4-truss (support >= 2) must peel everything in cascades
    val g = Seq((0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L), (3L, 0L))
      .toDF("src", "dst")
    assert(Truss.kTruss(g, 4).isEmpty)
  }

  test("matches the driver-side peeling oracle on a random graph") {
    val edges = GraphGen.uniform(spark, 30, 220, seed = 7).cache()
    val canon = edgeSet(TriangleCount.canonical(edges))
    for (k <- Seq(3, 4, 5)) {
      assert(edgeSet(Truss.kTruss(edges, k)) == trussOracle(canon, k), s"k=$k")
    }
  }
}
