package graft

import org.apache.spark.sql.functions._
import graft.ann.FeatureProp
import graft.gen.GraphGen

/** Graph-regularized feature smoothing (GNN mean aggregator): hand oracles,
 * driver-side multi-round reference, and the quantization/degeneracy
 * contracts the cross-engine oracle relies on. */
class FeaturePropSpec extends SparkSpec {
  import spark.implicits._

  private def feats(rows: (Long, Seq[Double])*) =
    rows.toSeq.toDF("vec_id", "embedding")

  /** exploded() result as (vid, pos) -> micro-units. */
  private def micro(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Long] =
    df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("one round on a path: hand-computed means, ends pull toward the middle") {
    // path 1-2-3 (undirected), alpha=0.5, vectors chosen so the micro math
    // is exact by eye
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val f = feats(1L -> Seq(0.0, 1.0), 2L -> Seq(2.0, 3.0), 3L -> Seq(4.0, 5.0))
    val got = micro(FeatureProp.exploded(edges, f, "vec_id", "embedding",
      alpha = 0.5, rounds = 1).select("vid", "pos", "uv"))
    // v1: 0.5*self + 0.5*mean(v2) ; v2: 0.5*self + 0.5*mean(v1,v3) ; v3: sym
    assert(got((1L, 1L)) == 1000000L) // 0.5*0 + 0.5*2 = 1.0
    assert(got((1L, 2L)) == 2000000L) // 0.5*1 + 0.5*3 = 2.0
    assert(got((2L, 1L)) == 2000000L) // 0.5*2 + 0.5*((0+4)/2) = 2.0
    assert(got((2L, 2L)) == 3000000L)
    assert(got((3L, 1L)) == 3000000L)
    assert(got((3L, 2L)) == 4000000L)
  }

  test("alpha=0 is the identity; isolated and feature-less-neighbor vertices keep self") {
    val edges = Seq((1L, 2L), (2L, 9L)).toDF("src", "dst") // 9 has no features
    val f = feats(1L -> Seq(1.0), 2L -> Seq(5.0), 7L -> Seq(9.0)) // 7 isolated
    val id = micro(FeatureProp.exploded(edges, f, "vec_id", "embedding",
      alpha = 0.0, rounds = 3).select("vid", "pos", "uv"))
    assert(id == Map((1L, 1L) -> 1000000L, (2L, 1L) -> 5000000L, (7L, 1L) -> 9000000L))
    // with alpha=1, vertex 2's only FEATURED neighbor is 1 (9 is excluded
    // from both the mean and the degree), so v2 becomes exactly v1
    val a1 = micro(FeatureProp.exploded(edges, f, "vec_id", "embedding",
      alpha = 1.0, rounds = 1).select("vid", "pos", "uv"))
    assert(a1((2L, 1L)) == 1000000L)
    assert(a1((7L, 1L)) == 9000000L) // isolated: no neighbors, keeps self
  }

  test("ragged vectors: per-position mean is over contributing neighbors only") {
    val edges = Seq((1L, 2L), (1L, 3L)).toDF("src", "dst")
    val f = feats(1L -> Seq(0.0, 0.0), 2L -> Seq(10.0, 8.0), 3L -> Seq(10.0))
    val got = micro(FeatureProp.exploded(edges, f, "vec_id", "embedding",
      alpha = 1.0, rounds = 1).select("vid", "pos", "uv"))
    assert(got((1L, 1L)) == 10000000L) // mean(10, 10)
    assert(got((1L, 2L)) == 8000000L)  // only v2 carries position 2 — not /2
    assert(!got.contains((3L, 2L)))    // v3 stays 1-dimensional
  }

  test("matches a driver-side reference over random data for 3 rounds") {
    val edges = GraphGen.uniform(spark, 20, 90, seed = 11).cache()
    val dim = 4
    val f = (0L until 20L).map { i =>
      i -> (0 until dim).map(d => (GraphGen.mix64(5L, i, d.toLong) % 1000L) / 250.0)
    }
    val fDf = feats(f: _*)
    val alpha = 0.25
    val got = micro(FeatureProp.exploded(edges, fDf, "vec_id", "embedding",
      alpha = alpha, rounds = 3).select("vid", "pos", "uv"))

    // driver-side reference in the same micro-unit arithmetic
    val und = edges.select("src", "dst").collect()
      .flatMap(r => Seq((r.getLong(0), r.getLong(1)), (r.getLong(1), r.getLong(0))))
      .filter { case (a, b) => a != b }.distinct
      .filter { case (a, b) => a < 20 && b < 20 }
    val nbrs = und.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var state: Map[Long, IndexedSeq[Long]] = f.map { case (i, v) =>
      i -> v.map(x => math.floor(x * 1e6 + 0.5).toLong).toIndexedSeq
    }.toMap
    for (_ <- 1 to 3) {
      state = state.map { case (v, vec) =>
        v -> (nbrs.get(v) match {
          case Some(ns) if ns.nonEmpty =>
            vec.indices.map { d =>
              val s = ns.map(n => state(n)(d)).sum
              math.floor((1.0 - alpha) * vec(d) + alpha * (s.toDouble / ns.length) + 0.5).toLong
            }
          case _ => vec
        })
      }
    }
    val want = for ((v, vec) <- state; d <- vec.indices)
      yield (v, (d + 1).toLong) -> vec(d)
    assert(got == want.toMap)
  }

  test("smooth() rebuilds ordered arrays consistent with exploded micro-units") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val f = feats(1L -> Seq(0.25, -1.5), 2L -> Seq(1.0, 2.0), 3L -> Seq(-0.5, 0.75))
    val arr = FeatureProp.smooth(edges, f, "vec_id", "embedding", alpha = 0.5, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val exp = micro(FeatureProp.exploded(edges, f, "vec_id", "embedding",
      alpha = 0.5, rounds = 2).select("vid", "pos", "uv"))
    for (((v, p), uv) <- exp)
      assert(arr(v)((p - 1).toInt) == uv.toDouble / 1e6)
    assert(arr.values.forall(_.length == 2))
  }
}
