package graft

import org.apache.spark.sql.functions._
import graft.alg.Katz
import graft.gen.GraphGen

class KatzSpec extends SparkSpec {
  import spark.implicits._

  private def scoresOf(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
    df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("hand-unrolled 2 rounds on a directed chain") {
    // 0→1→2, α=0.5. x1 = α·indeg = (0, .5, .5);
    // x2(v) = α·Σ_{u→v}(1+x1(u)): x2(1)=.5·(1+0)=.5, x2(2)=.5·(1+.5)=.75.
    val edges = Seq((0L, 1L), (1L, 2L)).toDF("src", "dst")
    val s = scoresOf(Katz.run(edges, rounds = 2, alpha = 0.5).scores)
    assert(math.abs(s(0L)) < 1e-12)
    assert(math.abs(s(1L) - 0.5) < 1e-12)
    assert(math.abs(s(2L) - 0.75) < 1e-12)
  }

  test("directed star: center stays 0, leaves fixed at alpha") {
    // center has no in-edges → 0 forever; each leaf's only walk is the one
    // edge from the zero-score center → α every round.
    val edges = (1L to 6L).map(i => (0L, i)).toDF("src", "dst")
    val s = scoresOf(Katz.run(edges, rounds = 5, alpha = 0.1).scores)
    assert(math.abs(s(0L)) < 1e-12)
    (1L to 6L).foreach(i => assert(math.abs(s(i) - 0.1) < 1e-12, s"leaf $i"))
  }

  test("matches a driver-side dense iteration on a skewed graph") {
    val edges = GraphGen.rmat(spark, 6, 8, seed = 7)
    val e = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
    val verts = e.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    val idx = verts.zipWithIndex.toMap
    val alpha = 0.1; val rounds = 5
    var x = Array.fill(verts.length)(0.0)
    for (_ <- 1 to rounds) {
      val nx = Array.fill(verts.length)(0.0)
      e.foreach { case (u, v) => nx(idx(v)) += alpha * (1.0 + x(idx(u))) }
      x = nx
    }
    val s = scoresOf(Katz.run(edges, rounds = rounds, alpha = alpha).scores)
    verts.foreach { v =>
      assert(math.abs(s(v) - x(idx(v))) < 1e-9, s"vertex $v")
    }
  }

  test("records one metrics row per round") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L)).toDF("src", "dst")
    val r = Katz.run(edges, rounds = 4, alpha = 0.2)
    assert(r.metrics.size == 4)
    assert(r.metrics.forall(_.edgesTraversed == 3L))
  }
}
