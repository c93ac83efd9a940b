package graft

import org.apache.spark.sql.functions._
import graft.alg.Independent
import graft.gen.GraphGen

class IndependentSpec extends SparkSpec {
  import spark.implicits._

  /** driver-side priority key — must mirror Independent.priorityKey */
  private def key(v: Long): Long =
    (v * 2654435761L + 104729L) % 1000000007L * 8589934592L + v

  /** sequential greedy MIS over the priority order — the fixpoint the
   * parallel rounds must reproduce exactly */
  private def greedyMis(edges: Seq[(Long, Long)]): Set[Long] = {
    val nbrs = (edges ++ edges.map(_.swap)).filter(e => e._1 != e._2)
      .groupBy(_._1).map { case (v, es) => v -> es.map(_._2).toSet }
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct.sortBy(key)
    var mis = Set.empty[Long]
    verts.foreach { v =>
      if (!nbrs.getOrElse(v, Set.empty).exists(mis.contains)) mis += v
    }
    mis
  }

  private def misOf(edges: Seq[(Long, Long)]): (Set[Long], Set[Long]) = {
    val df = edges.toDF("src", "dst")
    val r = Independent.mis(df)
    val rows = r.members.collect().map(x => (x.getLong(0), x.getBoolean(1)))
    (rows.filter(_._2).map(_._1).toSet, rows.map(_._1).toSet)
  }

  test("triangle: exactly the min-priority vertex") {
    val edges = Seq((0L, 1L), (1L, 2L), (0L, 2L))
    val (mis, all) = misOf(edges)
    assert(all == Set(0L, 1L, 2L))
    assert(mis == Set(Seq(0L, 1L, 2L).minBy(key)))
  }

  test("path of 2: one endpoint in, one out") {
    val (mis, _) = misOf(Seq((7L, 8L)))
    assert(mis.size == 1)
    assert(mis == Set(Seq(7L, 8L).minBy(key)))
  }

  test("matches sequential greedy on a skewed rmat graph") {
    val df = GraphGen.rmat(spark, 7, 8, seed = 11)
    val edges = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val r = Independent.mis(df)
    val got = r.members.collect().filter(_.getBoolean(1)).map(_.getLong(0)).toSet
    assert(got == greedyMis(edges))
  }

  test("independence and maximality on a dense uniform graph") {
    val df = GraphGen.uniform(spark, 64, 600, seed = 5)
    val edges = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      .filter(e => e._1 != e._2)
    val r = Independent.mis(df)
    val rows = r.members.collect().map(x => (x.getLong(0), x.getBoolean(1)))
    val mis = rows.filter(_._2).map(_._1).toSet
    val und = edges ++ edges.map(_.swap)
    // independence: no edge inside the set
    assert(!und.exists(e => mis.contains(e._1) && mis.contains(e._2)))
    // maximality: every outside vertex has a member neighbor
    val nbrs = und.groupBy(_._1).map { case (v, es) => v -> es.map(_._2).toSet }
    rows.filter(!_._2).foreach { case (v, _) =>
      assert(nbrs.getOrElse(v, Set.empty).exists(mis.contains), s"vertex $v")
    }
  }

  test("deterministic across runs") {
    val df = GraphGen.rmat(spark, 6, 6, seed = 3)
    val a = Independent.mis(df).members.collect().map(r => (r.getLong(0), r.getBoolean(1))).toSet
    val b = Independent.mis(df).members.collect().map(r => (r.getLong(0), r.getBoolean(1))).toSet
    assert(a == b)
  }

  test("coloring is proper and dense from 0") {
    val df = GraphGen.uniform(spark, 48, 300, seed = 9)
    val edges = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      .filter(e => e._1 != e._2)
    val r = Independent.coloring(df)
    val colors = r.colors.collect().map(x => (x.getLong(0), x.getInt(1))).toMap
    // proper: no monochromatic edge
    edges.foreach { case (u, v) =>
      assert(colors(u) != colors(v), s"edge ($u,$v) monochromatic")
    }
    // every vertex colored; colors dense 0..numColors-1
    assert(colors.values.forall(_ >= 0))
    assert(colors.values.max == r.numColors - 1)
    assert((0 until r.numColors).forall(c => colors.values.exists(_ == c)))
  }

  test("capped innerRounds coincides with fixpoint phases when cap is generous") {
    val df = GraphGen.uniform(spark, 40, 200, seed = 13)
    val free = Independent.coloring(df)
    val capped = Independent.coloring(df, innerRounds = 12)
    val a = free.colors.collect().map(x => (x.getLong(0), x.getInt(1))).toSet
    val b = capped.colors.collect().map(x => (x.getLong(0), x.getInt(1))).toSet
    assert(a == b)
  }

  test("chain coloring uses at most 2 colors plus proper check") {
    val edges = (0L until 10L).map(i => (i, i + 1)).toDF("src", "dst")
    val r = Independent.coloring(edges)
    assert(r.numColors <= 3) // greedy on a path is 2 or rarely 3 by priority order
    val colors = r.colors.collect().map(x => (x.getLong(0), x.getInt(1))).toMap
    (0L until 10L).foreach(i => assert(colors(i) != colors(i + 1)))
  }
}
