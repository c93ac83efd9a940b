package graft

import graft.alg.Butterfly

class ButterflySpec extends SparkSpec {
  import spark.implicits._

  private def k(nl: Int, nr: Int): Seq[(Long, Long)] =
    for (u <- 0 until nl; w <- 0 until nr) yield (u.toLong, 100L + w)

  test("complete bipartite closed forms: K22 = 1, K33 = 9, per-vertex 2B/n") {
    val b22 = Butterfly.total(k(2, 2).toDF("src", "dst")).collect()(0)
    assert(b22.getLong(0) == 1L && b22.getLong(1) == 1L)
    // K33: C(3,2)² = 9 butterflies; per left vertex 2B/3 = 6
    val b33 = Butterfly.total(k(3, 3).toDF("src", "dst")).collect()(0)
    assert(b33.getLong(0) == 9L)
    val pv = Butterfly.perVertex(k(3, 3).toDF("src", "dst")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(pv == Map(0L -> 6L, 1L -> 6L, 2L -> 6L))
  }

  test("wedge-only graphs have zero butterflies; zero-count vertices appear") {
    // u0 shares w0 with u1, w1 with u2 — wedges but no 4-cycle
    val e = Seq((0L, 100L), (1L, 100L), (0L, 101L), (2L, 101L)).toDF("src", "dst")
    val t = Butterfly.total(e).collect()(0)
    assert(t.getLong(0) == 0L && t.getLong(1) == 0L)
    val pv = Butterfly.perVertex(e).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pv.length == 3 && pv.forall(_._2 == 0L))
  }

  test("matches a driver-side quadruple-loop census on a hashed bipartite graph") {
    val es = (0L until 600L).map(i => ((i * 17 + 3) % 40, 100L + (i * 31 + 7) % 25)).distinct
    val adj = es.groupBy(_._1).map { case (u, ps) => u -> ps.map(_._2).toSet }
    val lefts = adj.keys.toSeq.sorted
    var total = 0L
    val perV = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for (i <- lefts.indices; j <- i + 1 until lefts.size) {
      val c = (adj(lefts(i)) & adj(lefts(j))).size.toLong
      val bf = c * (c - 1) / 2
      total += bf
      perV(lefts(i)) += bf; perV(lefts(j)) += bf
    }
    val df = es.toDF("src", "dst")
    val t = Butterfly.total(df).collect()(0)
    assert(t.getLong(0) == total)
    val got = Butterfly.perVertex(df).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == perV.toMap)
  }

  test("pivot cap drops hub pivots only (under-counts, never over)") {
    val df = (k(4, 4) :+ (0L, 200L) :+ (1L, 200L) :+ (2L, 200L) :+ (3L, 200L))
      .toDF("src", "dst")
    // full: K45 → C(4,2)·C(5,2) = 60; capped at 4 the 200-hub (deg 4) stays,
    // capping at 3 drops all five right vertices (every deg = 4) → 0
    assert(Butterfly.total(df).collect()(0).getLong(0) == 60L)
    assert(Butterfly.total(df, maxPivotDegree = 3).collect()(0).getLong(0) == 0L)
    val partial = Butterfly.total(df, maxPivotDegree = 4).collect()(0).getLong(0)
    assert(partial == 60L) // all pivots exactly at the cap → exact
  }
}
