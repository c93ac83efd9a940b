package graft

import org.apache.spark.sql.functions._
import graft.alg.SimRank

class SimRankSpec extends SparkSpec {
  import spark.implicits._

  private def df(e: Seq[(Long, Long)]) = e.toDF("src", "dst")

  /** Driver-side reference: exact s1 for every co-cited pair, exact s2
   * over the top-`cand` s1 pairs — the operator's nano-unit arithmetic
   * replayed with plain Scala doubles (same expression order). */
  private def brute(edges: Seq[(Long, Long)], c: Double, cand: Int, k: Int) = {
    val e = edges.filter(p => p._1 != p._2).distinct
    val ina = e.groupBy(_._2).map { case (v, es) => v -> es.map(_._1).toSet }
    val verts = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    val s1 = (for {
      a <- verts; b <- verts if a < b
      ia = ina.getOrElse(a, Set.empty[Long]); ib = ina.getOrElse(b, Set.empty[Long])
      cnt = (ia & ib).size if cnt > 0
    } yield (a, b) -> (math.floor(c * cnt / (ia.size.toLong * ib.size) * 1e9).toLong,
      ia.size.toLong, ib.size.toLong)).toMap
    val top = s1.toSeq.sortBy { case ((a, b), (n, _, _)) => (-n, a, b) }.take(cand)
    val s2 = top.map { case ((a, b), (nano, da, db)) =>
      val sumn = (for (i <- ina(a).toSeq; j <- ina(b).toSeq) yield
        if (i == j) 1000000000L
        else s1.get((math.min(i, j), math.max(i, j))).map(_._1).getOrElse(0L)).sum
      (a, b, nano, c * sumn / (da * db) / 1e9)
    }
    s2.sortBy { case (a, b, _, s) => (-s, a, b) }.take(k)
  }

  test("hand gadget: two pages fully co-cited by two independent citers") {
    // 1→3, 2→3, 1→4, 2→4: s1(3,4) = 0.8·2/(2·2) = 0.4;
    // s2(3,4) = 0.2·(s1(1,1) + 2·s1(1,2) + s1(2,2)) = 0.2·(1 + 0 + 1) = 0.4
    val r = SimRank.simrank2TopK(df(Seq((1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L))), k = 10)
      .collect()
    assert(r.length == 1)
    assert(r(0).getLong(0) == 3L && r(0).getLong(1) == 4L)
    assert(r(0).getLong(2) == 400000000L)
    assert(r(0).getDouble(3) == 0.4)
  }

  test("matches the driver-side reference on a modular digraph") {
    val edges = for (x <- 0L until 120L; s <- 1L to 3L)
      yield (x % 40, (x * s + 7) % 23 + 40)
    val got = SimRank.simrank2TopK(df(edges), k = 30, candidates = 500)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val want = brute(edges, 0.8, 500, 30)
    assert(got.toSeq == want.toSeq) // bit-exact: same nano floors, same double ops
  }

  test("candidate bound: s2 computed only for the top-s1 cut, still exact there") {
    val edges = for (x <- 0L until 120L; s <- 1L to 3L)
      yield (x % 40, (x * s + 7) % 23 + 40)
    val got = SimRank.simrank2TopK(df(edges), k = 5, candidates = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val want = brute(edges, 0.8, 5, 5)
    assert(got.toSeq == want.toSeq)
  }

  test("hub pivot cap drops directory-page wedges, never invents pairs") {
    // vertex 0 cites everything (a directory page); capped run must score
    // pairs using only the non-hub citers
    val hub = (1L to 20L).map(v => (0L, v + 100L))
    val organic = Seq((1L, 101L), (2L, 101L), (1L, 102L), (2L, 102L))
    val all = hub ++ organic
    val capped = SimRank.simrank2TopK(df(all), k = 400, maxPivotDegree = 5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val exact = SimRank.simrank2TopK(df(all), k = 400)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(capped.keySet.subsetOf(exact.keySet))
    // the organically co-cited pair survives the cap (citers 1, 2 kept);
    // its s1 count drops from 3 shared citers {0,1,2} to 2 — same degrees
    assert(capped.contains((101L, 102L)))
    assert(capped((101L, 102L)) < exact((101L, 102L)))
  }
}
