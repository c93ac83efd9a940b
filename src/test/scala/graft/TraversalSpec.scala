package graft

import org.apache.spark.sql.functions._
import graft.alg.{Traversals, Cores}
import graft.gen.GraphGen
import graft.oracle.Reference

class TraversalSpec extends SparkSpec {
  import spark.implicits._

  test("BFS levels match oracle on RMAT") {
    val edges = GraphGen.rmat(spark, 7, 4, seed = 9).cache()
    val es = edges.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val vmax = es.flatMap(e => Seq(e._1, e._2)).max.toInt + 1
    val src = es.head._1
    val expected = Reference.bfs(vmax, es, src.toInt)
    val actual = toMap[Int](Traversals.bfs(edges, src).state)
    (0 until vmax).foreach { i =>
      if (expected(i) >= 0) assert(actual.get(i.toLong).contains(expected(i)), s"vid=$i")
      else assert(!actual.contains(i.toLong), s"vid=$i should be unreached")
    }
  }

  test("BFS tree: parents are valid predecessors, source is own parent") {
    val edges = GraphGen.chain(spark, 12)
    val tree = toMap[Long](Traversals.bfsTree(edges, 3L).state)
    assert(tree(3L) == 3L)
    assert(tree(4L) == 3L && tree(2L) == 3L)
    assert(tree(0L) == 1L && tree(11L) == 10L)
  }

  test("SSSP matches Dijkstra oracle on weighted uniform graph") {
    val base = GraphGen.uniform(spark, 30, 120, seed = 21)
    val edges = base.withColumn("weight",
      (pmod(xxhash64(col("src"), col("dst")), lit(10L)) + 1).cast("double")).cache()
    val wes = edges.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val vmax = wes.flatMap(e => Seq(e._1, e._2)).max.toInt + 1
    val src = wes.head._1
    val expected = Reference.sssp(vmax, wes, src.toInt)
    val actual = toMap[Double](Traversals.sssp(edges, src).state)
    (0 until vmax).foreach { i =>
      if (expected(i).isInfinite) assert(!actual.contains(i.toLong))
      else assert(math.abs(actual(i.toLong) - expected(i)) < 1e-9, s"vid=$i")
    }
  }

  test("st-connectivity with early exit") {
    val edges = GraphGen.disconnectedChains(spark, 2, 8)
    assert(Traversals.stConnected(edges, 0L, 7L))
    assert(!Traversals.stConnected(edges, 0L, 9L))
    assert(Traversals.stConnected(edges, 5L, 5L))
  }

  test("closeness on a star: hub highest") {
    val edges = GraphGen.star(spark, 8)
    val c = toMap[Double](Traversals.closeness(edges, Seq(0L, 1L)))
    assert(c(0L) > c(1L))
    assert(math.abs(c(0L) - 1.0) < 1e-12) // hub reaches all at distance 1
  }

  test("k-core peels chain tails; p-core reports last surviving threshold") {
    // two triangles sharing a path: core-2 keeps triangles, drops the path? —
    // use a clique + pendant: K4 plus pendant vertex 4 attached to 0
    val k4 = GraphGen.complete(spark, 4)
    val edges = k4.union(Seq((0L, 4L), (4L, 0L)).toDF("src", "dst"))
    val core2 = Cores.kCore(edges, 2).collect().map(_.getLong(0)).toSet
    assert(core2 == Set(0L, 1L, 2L, 3L))
    val p = toMap[Int](Cores.pCores(edges, 1, 1, 4))
    assert(p(4L) == 1 && p(0L) == 3 && p(1L) == 3) // K4 survives p=3 (deg 3)
  }
}
