package graft

import org.apache.spark.sql.functions._
import graft.alg.Eigen
import graft.gen.GraphGen

class EigenSpec extends SparkSpec {
  import spark.implicits._

  private def scoresOf(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
    df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("directed cycle: uniform 1/sqrt(n) at every round") {
    val n = 5
    val edges = (0 until n).map(i => (i.toLong, ((i + 1) % n).toLong)).toDF("src", "dst")
    val s = scoresOf(Eigen.run(edges, rounds = 3).scores)
    val want = 1.0 / math.sqrt(n.toDouble)
    (0L until n.toLong).foreach(v => assert(math.abs(s(v) - want) < 1e-12, s"vid $v"))
  }

  test("directed star collapses to the zero vector once the source drains") {
    // 0→{1..6}: round 1 gives leaves 1/sqrt(6), center 0; round 2 scatters
    // only the center's 0 → zero raw vector → the norm guard yields all-0.
    val edges = (1L to 6L).map(i => (0L, i)).toDF("src", "dst")
    val r1 = scoresOf(Eigen.run(edges, rounds = 1).scores)
    assert(math.abs(r1(0L)) < 1e-12)
    (1L to 6L).foreach(i => assert(math.abs(r1(i) - 1.0 / math.sqrt(6.0)) < 1e-12))
    val r2 = scoresOf(Eigen.run(edges, rounds = 2).scores)
    (0L to 6L).foreach(i => assert(math.abs(r2(i)) < 1e-12, s"vid $i"))
  }

  test("matches a driver-side dense power iteration on a skewed graph") {
    val edges = GraphGen.rmat(spark, 6, 8, seed = 11)
    val e = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
    val verts = e.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    val idx = verts.zipWithIndex.toMap
    val rounds = 5
    var x = Array.fill(verts.length)(1.0)
    for (_ <- 1 to rounds) {
      val m = Array.fill(verts.length)(0.0)
      e.foreach { case (u, v) => m(idx(v)) += x(idx(u)) }
      val nrm = math.sqrt(m.map(d => d * d).sum)
      x = if (nrm > 0) m.map(_ / nrm) else m
    }
    val s = scoresOf(Eigen.run(edges, rounds = rounds).scores)
    verts.foreach(v => assert(math.abs(s(v) - x(idx(v))) < 1e-9, s"vertex $v"))
  }

  test("records one metrics row per round; deterministic across runs") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (0L, 2L)).toDF("src", "dst")
    val r = Eigen.run(edges, rounds = 4)
    assert(r.metrics.size == 4)
    assert(r.metrics.forall(_.edgesTraversed == 4L))
    val again = scoresOf(Eigen.run(edges, rounds = 4).scores)
    assert(scoresOf(r.scores) == again)
  }
}
