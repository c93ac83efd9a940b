package graft

import org.apache.spark.sql.functions._
import graft.ann.{KMeans, Pq}

class PqSpec extends SparkSpec {
  import spark.implicits._

  // 8-dim vectors, two blobs PER 4-dim subspace, blob membership chosen
  // independently per subspace (i%2 for sub 0, i/2%2 for sub 1)
  private lazy val vecs = {
    val rows = (0 until 40).map { i =>
      val b0 = i % 2; val b1 = (i / 2) % 2
      val jit = (d: Int) =>
        (graft.gen.GraphGen.mix64(5L, i.toLong, d.toLong) % 100L).toFloat / 1000f
      val v = Array.tabulate(8) { d =>
        val blob = if (d < 4) b0 else b1
        (if (blob == 1) 10f else 0f) + jit(d)
      }
      (i.toLong, v)
    }
    rows.toDF("vec_id", "embedding").cache()
  }

  test("m=1 PQ is exactly the plain k-means assignment") {
    val pq = Pq.codes(vecs, m = 1, k = 3, iters = 2).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    val km = KMeans.run(vecs, k = 3, iters = 2).assignments.collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getDouble(2)))
    assert(pq.toSet == km.toSet)
  }

  test("subspaces quantize independently: codes follow the per-subspace blob") {
    val got = Pq.codes(vecs, m = 2, k = 2, iters = 3).collect()
      .map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    // within one subspace, same blob -> same code, different blob -> different
    def blob(sub: Int, i: Long) = if (sub == 0) i % 2 else (i / 2) % 2
    for (sub <- 0 to 1) {
      val bycode = (0L until 40L).groupBy(i => got((sub, i)))
      assert(bycode.size == 2, s"sub $sub: expected 2 codes, got $bycode")
      bycode.values.foreach { ids =>
        assert(ids.map(i => blob(sub, i)).toSet.size == 1,
          s"sub $sub mixed blobs in one code")
      }
    }
    // and the two subspaces' codes are NOT the same partition of ids
    // (blob assignments are independent by construction)
    val part0 = (0L until 40L).groupBy(i => got((0, i))).values.map(_.toSet).toSet
    val part1 = (0L until 40L).groupBy(i => got((1, i))).values.map(_.toSet).toSet
    assert(part0 != part1)
  }

  test("encode packs per-subspace codes in subspace order") {
    val exploded = Pq.codes(vecs, m = 2, k = 2, iters = 2).collect()
      .map(r => ((r.getLong(1), r.getInt(0)), r.getLong(2))).toMap
    val packed = Pq.encode(vecs, m = 2, k = 2, iters = 2).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    packed.foreach { case (vid, cs) =>
      assert(cs.length == 2)
      assert(cs(0) == exploded((vid, 0)) && cs(1) == exploded((vid, 1)))
    }
    intercept[IllegalArgumentException] { Pq.codes(vecs, m = 3, k = 2, iters = 1) }
  }
}
