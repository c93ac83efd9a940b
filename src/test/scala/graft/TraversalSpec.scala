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

  test("double-sweep diameter: exact on a path, tie-breaks deterministic") {
    // undirected path 1-2-3-4-5: sweep 1 from vid 1 finds 5 (d=4); sweep 2
    // from 5 finds 1 at distance 4 = the true diameter
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }.toDF("src", "dst")
    val r1 = Traversals.doubleSweepDiameter(path).collect()(0)
    assert((r1.getLong(0), r1.getLong(1), r1.getLong(2)) == (5L, 1L, 4L))
    // star around 0: all eccentricities ≤ 2; both sweeps end at leaves,
    // min-id ties — sweep 1 from 0 picks leaf 1, sweep 2 picks leaf 2
    val star = (1L to 6L).flatMap(l => Seq((0L, l), (l, 0L))).toDF("src", "dst")
    val r2 = Traversals.doubleSweepDiameter(star).collect()(0)
    assert((r2.getLong(0), r2.getLong(1), r2.getLong(2)) == (1L, 2L, 2L))
  }

  test("double-sweep diameter lower-bounds and usually matches exact on RMAT") {
    val edges = graft.core.Graph.undirected(GraphGen.rmat(spark, 6, 4, seed = 11)).cache()
    val es = edges.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val vmax = es.flatMap(e => Seq(e._1, e._2)).max.toInt + 1
    // exact diameter of the component containing min vid (what the double
    // sweep explores), via per-source reference BFS
    val comp = Reference.bfs(vmax, es, es.map(_._1).min.toInt)
    val inComp = (0 until vmax).filter(comp(_) >= 0)
    val exact = inComp.map { s =>
      val d = Reference.bfs(vmax, es, s); inComp.map(d(_)).max
    }.max
    val lb = Traversals.doubleSweepDiameter(edges).collect()(0).getLong(2)
    assert(lb <= exact && lb >= exact - 1, s"lb=$lb exact=$exact")
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

  test("eccentricity: chain ends vs middle; sampled max lower-bounds diameter") {
    val chain = graft.gen.GraphGen.chain(spark, 5)
    val ecc = toMap[Int](Traversals.eccentricity(chain, Seq(0L, 2L, 4L)))
    assert(ecc(0L) == 4 && ecc(2L) == 2 && ecc(4L) == 4)
  }

  test("harmonic centrality: exact closed forms on chain, complete, disconnected") {
    import spark.implicits._
    // chain 0-1-2-3-4 from root 0: 1 + 1/2 + 1/3 + 1/4
    val chain = graft.gen.GraphGen.chain(spark, 5)
    val h = toMap[Double](Traversals.harmonic(chain, Seq(0L, 2L)))
    assert(math.abs(h(0L) - (1.0 + 0.5 + 1.0 / 3 + 0.25)) < 1e-12)
    assert(math.abs(h(2L) - (1.0 + 1.0 + 0.5 + 0.5)) < 1e-12)
    // complete graph: n-1 from any root
    val k6 = graft.gen.GraphGen.complete(spark, 6)
    assert(toMap[Double](Traversals.harmonic(k6, Seq(3L)))(3L) == 5.0)
    // root with no outgoing reach: 0.0 (disconnected-robust, no poisoning)
    val disc = Seq((0L, 1L), (5L, 6L)).toDF("src", "dst")
    val hd = toMap[Double](Traversals.harmonic(disc, Seq(0L, 5L)))
    assert(hd(0L) == 1.0 && hd(5L) == 1.0)
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
    val p = toMap[Double](Cores.pCores(edges, 1, 1, 4))
    assert(p(4L) == 1.0 && p(0L) == 3.0 && p(1L) == 3.0) // K4 survives p=3 (deg 3)
  }

  test("weighted p-core peels on the SUM OF WEIGHTS (reference totem_pcores semantics)") {
    // 4-cycle with heavy edges (w=2 each: weighted deg 4) plus a pendant on a
    // light edge (w=0.5): hand oracle for thresholds 1,2,3,4:
    //   pendant 4: wdeg 0.5 -> survives nothing -> pcore 0
    //   vertex 0 : 2+2+0.5 = 4.5, but once 4 peels, 0 has 4.0 -> survives p=4
    //   1,2,3    : wdeg 4.0 -> pcore 4
    // unweighted for contrast: cycle degrees 2 (+1 pendant edge on 0)
    val cyc = Seq((0L, 1L, 2.0), (1L, 2L, 2.0), (2L, 3L, 2.0), (3L, 0L, 2.0), (0L, 4L, 0.5))
    val edges = cyc.toDF("src", "dst", "weight")
    val pw = toMap[Double](Cores.pCores(edges, 1, 1, 5, weighted = true))
    assert(pw(4L) == 0.0, s"pendant got ${pw(4L)}")
    assert(pw(0L) == 4.0 && pw(1L) == 4.0 && pw(2L) == 4.0 && pw(3L) == 4.0, pw.toString)
    val pu = toMap[Double](Cores.pCores(edges, 1, 1, 5, weighted = false))
    assert(pu(4L) == 1.0 && pu(0L) == 2.0 && pu(1L) == 2.0, pu.toString)
    // weighted kCore directly: threshold 4 keeps only the cycle
    val k4 = Cores.kCore(edges, 4.0, weighted = true).collect().map(_.getLong(0)).toSet
    assert(k4 == Set(0L, 1L, 2L, 3L))
  }
}
