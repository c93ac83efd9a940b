package graft

import org.apache.spark.sql.functions._
import graft.ann.KMeans

class KMeansSpec extends SparkSpec {
  import spark.implicits._

  // 4 well-separated blobs in 4d: blob b at 10·e_b plus small hash jitter
  private lazy val blobs = {
    val rows = (0 until 80).map { i =>
      val b = i % 4
      val v = Array.tabulate(4) { d =>
        val base = if (d == b) 10f else 0f
        base + (graft.gen.GraphGen.mix64(3L, i.toLong, d.toLong) % 100L).toFloat / 100f
      }
      (i.toLong, v)
    }
    rows.toDF("vec_id", "embedding").cache()
  }

  test("separated blobs: every blob lands in one cluster, deterministic") {
    val m = KMeans.run(blobs, k = 4, iters = 3)
    val got = m.assignments.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // points of the same blob share a cluster; different blobs differ
    val byBlob = got.groupBy { case (vid, _) => vid % 4 }.map {
      case (b, m2) => b -> m2.values.toSet
    }
    byBlob.values.foreach(s => assert(s.size == 1, s"blob split across clusters: $byBlob"))
    assert(byBlob.values.flatten.toSet.size == 4, s"blobs merged: $byBlob")
    // determinism: a second run is identical
    val again = KMeans.run(blobs, k = 4, iters = 3)
      .assignments.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(again == got)
  }

  test("exact parity with a driver-side Lloyd reference (same rounding path)") {
    def round9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    def round6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val pts = blobs.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)
    def dot(a: Array[Double], b: Array[Double]) =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
    var centers = pts.take(4).zipWithIndex.map { case ((_, e), i) => i -> e }
    def assignAll() = pts.map { case (vid, e) =>
      val best = centers.map { case (cid, c) =>
        (round9(dot(e, e) - 2 * dot(e, c) + dot(c, c)), cid)
      }.min
      (vid, best._2, best._1)
    }
    for (_ <- 1 to 3) {
      val a = assignAll()
      val byC = a.groupBy(_._2)
      centers = centers.map { case (cid, old) =>
        byC.get(cid) match {
          case Some(members) =>
            val es = members.map(m => pts(m._1.toInt)._2)
            cid -> Array.tabulate(old.length)(d => round6(es.map(_(d)).sum / es.length))
          case None => cid -> old
        }
      }
    }
    val want = assignAll().map { case (vid, cid, d2) => (vid, cid, d2) }.sortBy(_._1)
    val got = KMeans.run(blobs, k = 4, iters = 3).assignments
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).sortBy(_._1)
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(g._1 == w._1 && g._2 == w._2, s"assignment mismatch: $g vs $w")
      assert(math.abs(g._3 - w._3) < 1e-9, s"dist mismatch: $g vs $w")
    }
  }

  test("emptied cluster keeps its previous center") {
    // 3 initial centers but only 2 real blobs: ids 0,1 in blob A, id 2 a
    // lone outlier that gets absorbed — its center must persist unchanged
    val pts = Seq(
      (0L, Array(0f, 0f)), (1L, Array(0.1f, 0f)), (2L, Array(0.2f, 0f)),
      (3L, Array(10f, 10f)), (4L, Array(10.1f, 10f))
    ).toDF("vec_id", "embedding")
    val m = KMeans.run(pts, k = 3, iters = 2)
    assert(m.centers.length == 3)
    // cluster 2 (init = point 2 at (0.2, 0)) empties once 0-2 collapse onto
    // a nearer center; whatever happens, centers stay finite and k-sized
    m.centers.foreach { case (_, c) => c.foreach(x => assert(!x.isNaN && !x.isInfinite)) }
    val cids = m.assignments.select("cid").distinct().collect().map(_.getInt(0)).toSet
    assert(cids.subsetOf(Set(0, 1, 2)))
  }

  test("clusterSample: per-cluster cap, determinism, members come from the cluster") {
    val m = KMeans.run(blobs, k = 4, iters = 3)
    val s1 = KMeans.clusterSample(m.assignments, perCluster = 5).collect()
    assert(s1.length == 20) // 4 clusters × 5 (each blob has 20 members)
    val counts = s1.groupBy(_.getInt(1)).view.mapValues(_.length).toMap
    assert(counts.values.forall(_ == 5))
    val s2 = KMeans.clusterSample(m.assignments, perCluster = 5).collect()
    assert(s1.map(_.toString).sorted.sameElements(s2.map(_.toString).sorted))
    // sampled (vid, cid) pairs are real assignments
    val asg = m.assignments.collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    s1.foreach(r => assert(asg.contains((r.getLong(0), r.getInt(1)))))
  }
}
