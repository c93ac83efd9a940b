package graft

import org.apache.spark.sql.functions._
import graft.ann.{Pca, Quantize}

class PcaQuantizeSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random vectors with correlated dims
  private lazy val vecs = {
    val rows = (0 until 60).map { i =>
      val a = (graft.gen.GraphGen.mix64(7L, i.toLong, 0L) % 1000L).toFloat / 1000f
      val b = (graft.gen.GraphGen.mix64(7L, i.toLong, 1L) % 1000L).toFloat / 1000f
      (i.toLong, Array(a, 0.5f * a + 0.1f * b, b, -b))
    }
    rows.toDF("vec_id", "embedding").cache()
  }

  test("covariance matches a driver-side micro-unit replay") {
    val got = Pca.covariance(vecs).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val data = vecs.collect().map(_.getSeq[Float](1).toArray)
    val u = data.map(_.map(x => math.floor(x.toDouble * 1e6 + 0.5).toLong))
    val n = u.length.toDouble
    val d = u.head.length
    for (i <- 0 until d; j <- i until d) {
      val sxy = u.map(r => r(i) * r(j)).sum
      val si = u.map(_(i)).sum
      val sj = u.map(_(j)).sum
      // bit-exact: same exact BIGINTs, same division order, no rounding
      val want = (sxy.toDouble / n - (si.toDouble / n) * (sj.toDouble / n)) / 1e12
      assert(got((i.toLong, j.toLong)) == want, s"cov($i,$j)")
    }
    assert(got.size == d * (d + 1) / 2)
  }

  test("topComponent: diagonal and correlated 2x2 hand cases") {
    val diag = Pca.topComponent(Array((0, 0, 4.0), (0, 1, 0.0), (1, 1, 1.0)))
    assert(math.abs(diag(0) - 1.0) < 1e-9 && math.abs(diag(1)) < 1e-9)
    val corr = Pca.topComponent(Array((0, 0, 2.0), (0, 1, 1.0), (1, 1, 2.0)))
    val r = 1.0 / math.sqrt(2.0)
    assert(math.abs(corr(0) - r) < 1e-9 && math.abs(corr(1) - r) < 1e-9)
  }

  test("project: literal-folded dot product, no shuffle in the plan") {
    val p = Pca.project(Seq((1L, Array(1f, 2f, 3f))).toDF("vec_id", "embedding"),
      Array(0.5, 0.25, -1.0))
    val row = p.collect().head
    assert(row.getLong(0) == 1L)
    assert(math.abs(row.getDouble(1) - (0.5 + 0.5 - 3.0)) < 1e-12)
    val plan = p.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"projection should be narrow:\n$plan")
  }

  test("quantize codes: hand case, constant dim, bounds") {
    val pts = Seq(
      (0L, Array(0f, 5f)), (1L, Array(1f, 5f)), (2L, Array(0.5f, 5f)))
      .toDF("vec_id", "embedding")
    val got = Quantize.codes(pts).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got((0L, 0L)) == 0L)    // min -> 0
    assert(got((1L, 0L)) == 255L)  // max -> 255
    assert(got((2L, 0L)) == 128L)  // floor(0.5*255+0.5)
    Seq(0L, 1L, 2L).foreach(v => assert(got((v, 1L)) == 0L)) // constant dim
  }

  test("coreset: farthest-point sweep hand case and driver replay") {
    import graft.ann.Coreset
    // a line of points: 0@(0,0), 1@(1,0), 2@(10,0), 3@(10.5,0)
    val line = Seq(
      (0L, Array(0f, 0f)), (1L, Array(1f, 0f)),
      (2L, Array(10f, 0f)), (3L, Array(10.5f, 0f))).toDF("vec_id", "embedding")
    val cs = Coreset.centers(line, k = 3)
    // first = min id; second = farthest (3 @ 10.5); third = next-farthest (1)
    assert(cs.map(_._1).toSeq == Seq(0L, 3L, 1L))
    val asg = Coreset.assign(line, cs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(asg == Map(0L -> 0L, 1L -> 1L, 2L -> 3L, 3L -> 3L))

    // driver replay on the pseudo-random corpus: same rounded-distance,
    // argmax-tie and assignment-tie rules as the DuckDB oracle
    val k = 4
    val got = Coreset.centers(vecs, k).map(_._1).toSeq
    val data = vecs.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var pp = 0.0; var pc = 0.0; var cc = 0.0
      for (i <- a.indices) { pp += a(i) * a(i); pc += a(i) * b(i); cc += b(i) * b(i) }
      BigDecimal(pp - 2.0 * pc + cc).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val want = scala.collection.mutable.ArrayBuffer(data.keys.min)
    while (want.size < k) {
      val next = data.keys.toSeq
        .map(v => (v, want.map(c => d2(data(v), data(c))).min))
        .minBy { case (v, md) => (-md, v) }._1
      want += next
    }
    assert(got == want.toSeq)
  }

  test("encode packs the same codes; decode error bounded by half a step") {
    val codes = Quantize.codes(vecs).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val packed = Quantize.encode(vecs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    codes.foreach { case ((vid, i), q) => assert(packed(vid)(i.toInt) == q) }

    val cb = Quantize.codebook(vecs)
    val approx = Quantize.decode(Quantize.encode(vecs), cb).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val ranges = cb.orderBy("i").collect().map(r => r.getDouble(2) - r.getDouble(1))
    vecs.collect().foreach { r =>
      val vid = r.getLong(0); val x = r.getSeq[Float](1)
      x.indices.foreach { i =>
        val step = ranges(i) / 255.0
        assert(math.abs(x(i).toDouble - approx(vid)(i)) <= step / 2 + 1e-9,
          s"vec $vid dim $i")
      }
    }
  }
}
