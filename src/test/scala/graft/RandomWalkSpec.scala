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

  test("matches the driver-side hash-index oracle") {
    val g = GraphGen.uniform(spark, 15, 80, seed = 5).cache()
    val adj = g.select("src", "dst").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
      .groupMap(_._1)(_._2)
      .view.mapValues(_.sorted.toIndexedSeq).toMap
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
            val h = BigInt(md5hex(s"$seed|$w|$step").take(12), 16)
            cur = nbrs((h % nbrs.size).toInt)
            expected += ((w, step, cur))
            step += 1
          case None => alive = false
        }
      }
    }
    assert(rows(RandomWalk.walksFromAll(g, length = 6, seed = seed)) == expected.toSet)
  }

  test("hub chunking: the indexed neighbor is correct across chunk boundaries") {
    // star hub with 10 spokes, chunkSize=4 -> 3 chunks; every walk from the
    // hub must land on the hash-indexed spoke regardless of which chunk
    // holds it
    val hub = (1 to 10).map(i => (0L, i.toLong)).toDF("src", "dst")
    val seed = 7L
    val h = BigInt(md5hex(s"$seed|0|1").take(12), 16)
    val want = (1 to 10).map(_.toLong).sorted.apply((h % 10).toInt)
    val got = RandomWalk.walks(hub, Seq(0L).toDF("vid"), length = 1,
      seed = seed, chunkSize = 4)
      .filter("step = 1").collect().map(_.getLong(2)).toSeq
    assert(got == Seq(want))
  }
}
