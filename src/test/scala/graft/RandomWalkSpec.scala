package graft

import graft.alg.RandomWalk
import graft.gen.GraphGen

class RandomWalkSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Int, Long)] =
    df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

  test("chain: the walk follows the only edge and stops at the sink") {
    val chain = Seq((0L, 1L), (1L, 2L), (2L, 3L)).toDF("src", "dst")
    val w = rows(RandomWalk.walks(chain, Seq(0L).toDF("vid"), length = 8))
    assert(w == Set((0L, 0, 0L), (0L, 1, 1L), (0L, 2, 2L), (0L, 3, 3L)))
  }

  test("same seed is bit-identical; the hash family actually varies choices") {
    val g = GraphGen.uniform(spark, 20, 120, seed = 3).cache()
    val a = rows(RandomWalk.walksFromAll(g, length = 5, seed = 7))
    val b = rows(RandomWalk.walksFromAll(g, length = 5, seed = 7))
    assert(a == b)
    val c = rows(RandomWalk.walksFromAll(g, length = 5, seed = 8))
    assert(a != c) // a 20-vertex graph with branching: some walk must differ
  }

  test("matches the driver-side md5-argmin oracle") {
    val g = GraphGen.uniform(spark, 15, 80, seed = 5).cache()
    val adj = g.select("src", "dst").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
      .groupMap(_._1)(_._2)
    val verts = adj.keySet ++ adj.values.flatten
    val seed = 42L
    val expected = scala.collection.mutable.Set[(Long, Int, Long)]()
    for (w <- verts) {
      var cur = w
      expected += ((w, 0, w))
      var step = 1
      var alive = true
      while (alive && step <= 6) {
        adj.get(cur) match {
          case Some(nbrs) =>
            cur = nbrs.minBy(u => (md5hex(s"$seed|$w|$step|$u"), u))
            expected += ((w, step, cur))
            step += 1
          case None => alive = false
        }
      }
    }
    assert(rows(RandomWalk.walksFromAll(g, length = 6, seed = seed)) == expected.toSet)
  }
}
