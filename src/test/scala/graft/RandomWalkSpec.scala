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

  test("biased walks match a driver-side node2vec inverse-CDF oracle") {
    val g = GraphGen.uniform(spark, 15, 80, seed = 5).cache()
    val edges = g.select("src", "dst").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val adj = edges.groupMap(_._1)(_._2).view.mapValues(_.toSeq.sorted).toMap
    val verts = edges.flatMap(e => Seq(e._1, e._2))
    val (p, q, seed, len) = (2.0, 0.5, 42L, 5)
    val expected = scala.collection.mutable.Set[(Long, Int, Long)]()
    for (w <- verts) {
      var prev = w; var cur = w
      expected += ((w, 0, w))
      var step = 1; var alive = true
      while (alive && step <= len) {
        adj.get(cur) match {
          case Some(nbrs) =>
            val wts = nbrs.map { n =>
              if (n == prev) 1.0 / p
              else if (edges.contains((prev, n))) 1.0 else 1.0 / q
            }
            val tot = wts.sum // exact: dyadic weights
            val h = BigInt(md5hex(s"$seed|$w|$step").take(12), 16).toLong
            val t = (h.toDouble / 281474976710656.0) * tot
            var cum = 0.0; var pick = -1
            for (j <- nbrs.indices if pick < 0) {
              cum += wts(j); if (cum > t) pick = j
            }
            prev = cur; cur = nbrs(pick)
            expected += ((w, step, cur))
            step += 1
          case None => alive = false
        }
      }
    }
    val got = rows(RandomWalk.biasedWalks(g, graft.core.Graph.vertices(g),
      length = len, p = p, q = q, seed = seed))
    assert(got == expected.toSet)
  }

  test("biased walks: hand-checkable weight logic on a 4-vertex gadget") {
    // 0 -> 1; from 1: neighbors {0 (return, w=1/p), 2 (local: 0->2 edge,
    // w=1), 3 (explore, w=1/q)}. With p=2, q=0.5: wts (0.5, 1, 2), tot 3.5,
    // ascending-neighbor cums: 0:0.5, 2:1.5, 3:3.5.
    val g = Seq((0L, 1L), (0L, 2L), (1L, 0L), (1L, 2L), (1L, 3L)).toDF("src", "dst")
    val out = RandomWalk.biasedWalks(g, Seq(0L).toDF("vid"), length = 2,
      p = 2.0, q = 0.5, seed = 11L).collect()
      .map(r => (r.getInt(1), r.getLong(2))).toMap
    // step 1 from 0 is uniform over {1, 2}
    val h1 = BigInt(md5hex("11|0|1").take(12), 16).toLong
    val t1 = (h1.toDouble / 281474976710656.0) * 2.0
    val s1 = if (t1 < 1.0) 1L else 2L
    assert(out(1) == s1)
    if (s1 == 1L) {
      val h2 = BigInt(md5hex("11|0|2").take(12), 16).toLong
      val t2 = (h2.toDouble / 281474976710656.0) * 3.5
      val s2 = if (t2 < 0.5) 0L else if (t2 < 1.5) 2L else 3L
      assert(out(2) == s2)
    }
  }

  test("biased walks: determinism and p/q validation") {
    val g = GraphGen.uniform(spark, 12, 50, seed = 9).cache()
    val v = graft.core.Graph.vertices(g)
    val a = rows(RandomWalk.biasedWalks(g, v, length = 4, seed = 3L))
    val b = rows(RandomWalk.biasedWalks(g, v, length = 4, seed = 3L))
    assert(a == b)
    intercept[IllegalArgumentException] {
      RandomWalk.biasedWalks(g, v, length = 2, p = 3.0, q = 0.5)
    }
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

  test("contextPairs: hand oracle on a fixed walk, window clipping at the ends") {
    // one hand-built walk 10 -> 11 -> 12 -> 13, window 2
    val walks = Seq((5L, 0, 10L), (5L, 1, 11L), (5L, 2, 12L), (5L, 3, 13L))
      .toDF("walk", "step", "vid")
    val got = RandomWalk.contextPairs(walks, window = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    val seq = IndexedSeq(10L, 11L, 12L, 13L)
    val want = (for {
      i <- seq.indices; j <- seq.indices
      if i != j && math.abs(i - j) <= 2
    } yield (5L, seq(i), seq(j), j - i)).toSet
    assert(got == want)
    assert(got.size == 10) // 2*(2+3+3+2)/2 ordered pairs
  }

  test("contextPairs: matches a driver-side expansion of real walks and is symmetric") {
    val g = GraphGen.uniform(spark, 15, 80, seed = 5).cache()
    val walks = RandomWalk.walksFromAll(g, length = 6, seed = 42L).cache()
    val window = 3
    val got = RandomWalk.contextPairs(walks, window).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .groupBy(identity).view.mapValues(_.length).toMap
    val byWalk = walks.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toIndexedSeq).toMap
    val want = (for {
      (w, seq) <- byWalk.toSeq
      i <- seq.indices; j <- seq.indices
      if i != j && math.abs(i - j) <= window
    } yield (w, seq(i), seq(j), j - i)).groupBy(identity).view.mapValues(_.length).toMap
    assert(got == want)
    // the aggregated pair census is symmetric: every (i,j) has its (j,i)
    val census = got.toSeq.groupBy { case ((_, c, x, _), _) => (c, x) }
      .view.mapValues(_.map(_._2).sum).toMap
    assert(census.forall { case ((c, x), n) => census.get((x, c)).contains(n) })
  }

  test("contextPairs: a single-row walk (start at a sink) yields no pairs") {
    val walks = Seq((9L, 0, 9L)).toDF("walk", "step", "vid")
    assert(RandomWalk.contextPairs(walks, window = 3).count() == 0L)
  }

  private def negRows(df: org.apache.spark.sql.DataFrame): Set[(Long, Int, Int, Long)] =
    df.collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3))).toSet

  test("negativeSamples: exact driver-side integer inverse-CDF, one neg per draw") {
    val g = GraphGen.uniform(spark, 15, 80, seed = 5).cache()
    val walks = RandomWalk.walksFromAll(g, length = 6, seed = 42L).cache()
    val (k, power, seed) = (3, 0.75, 7L)
    val got = negRows(RandomWalk.negativeSamples(walks, k, power, seed, buckets = 64))

    val rows = walks.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val freq = rows.groupBy(_._3).view.mapValues(_.length).toMap
    val wts = freq.toSeq.sortBy(_._1)
      .map { case (v, f) => v -> math.floor(math.pow(f.toDouble, power) * 1e6 + 0.5).toLong }
    val his = wts.scanLeft(0L)(_ + _._2).tail
    val iv = wts.map(_._1).zip(wts.map(_._2)).zip(his)
      .map { case ((v, w), hi) => (v, hi - w, hi) }
    val total = his.last
    val want = (for {
      (wk, st, _) <- rows; slot <- 1 to k
      t = (BigInt(md5hex(s"$seed|$wk|$st|$slot").take(12), 16) % total).toLong
      (v, lo, hi) <- iv if lo <= t && t < hi
    } yield (wk, st, slot, v)).toSet
    assert(got == want)
    // exactly one negative per (walk, step, slot) draw
    assert(got.size == rows.length * k)
  }

  test("negativeSamples: bucket count is an execution detail — results identical") {
    val g = GraphGen.uniform(spark, 12, 50, seed = 9).cache()
    val walks = RandomWalk.walksFromAll(g, length = 4, seed = 1L).cache()
    val a = negRows(RandomWalk.negativeSamples(walks, k = 2, seed = 3L, buckets = 5))
    val b = negRows(RandomWalk.negativeSamples(walks, k = 2, seed = 3L, buckets = 1024))
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("negativeSamples: draws skew toward high-frequency vertices, seed varies them") {
    // star: every walk from a spoke visits the hub, so the hub dominates
    // the unigram table and must dominate the noise draws
    val hub = ((1 to 10).map(i => (i.toLong, 0L)) :+ (0L, 1L)).toDF("src", "dst")
    val walks = RandomWalk.walksFromAll(hub, length = 3, seed = 2L).cache()
    val negs = RandomWalk.negativeSamples(walks, k = 4, seed = 11L).collect()
      .map(_.getLong(3))
    val hubShare = negs.count(v => v == 0L || v == 1L).toDouble / negs.length
    assert(hubShare > 0.5, s"hubShare=$hubShare")
    val other = negRows(RandomWalk.negativeSamples(walks, k = 4, seed = 12L))
    assert(other != negRows(RandomWalk.negativeSamples(walks, k = 4, seed = 11L)))
  }

  test("negativeSamples: empty walk table yields an empty frame") {
    val empty = Seq.empty[(Long, Int, Long)].toDF("walk", "step", "vid")
    assert(RandomWalk.negativeSamples(empty, k = 2).count() == 0L)
  }
}
