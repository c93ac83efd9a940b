package graft

import org.apache.spark.sql.functions._
import graft.alg.Centrality
import graft.gen.GraphGen
import graft.oracle.Reference

class CentralitySpec extends SparkSpec {
  import spark.implicits._

  test("betweenness on a chain: middle vertices dominate (exact oracle)") {
    val edges = GraphGen.chain(spark, 7) // undirected, both dirs
    val sources = (0 until 7).toSeq
    val expected = Reference.betweenness(7, edges.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq, sources)
    val actual = toMap[Double](Centrality.betweenness(edges, sources.map(_.toLong)))
    (0 until 7).foreach { i =>
      assert(math.abs(actual(i.toLong) - expected(i)) < 1e-9, s"vid=$i: ${actual(i.toLong)} vs ${expected(i)}")
    }
    assert(actual(3L) > actual(1L) && actual(1L) > actual(0L))
  }

  test("betweenness matches oracle on random graph, sampled sources") {
    val edges = graft.core.Graph.undirected(GraphGen.uniform(spark, 20, 60, seed = 8)).cache()
    val es = edges.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val vmax = es.flatMap(e => Seq(e._1, e._2)).max.toInt + 1
    val sources = es.map(_._1).distinct.sorted.take(5)
    val expected = Reference.betweenness(vmax, es, sources.map(_.toInt))
    val actual = toMap[Double](Centrality.betweenness(edges, sources))
    actual.foreach { case (vid, s) =>
      assert(math.abs(s - expected(vid.toInt)) < 1e-9, s"vid=$vid: $s vs ${expected(vid.toInt)}")
    }
  }

  test("duplicate sources count in full (sampling with replacement)") {
    // batched with multiplicity scaling: Seq(s, s, t) must equal the
    // per-source-loop composition 2×(from s) + 1×(from t)
    val edges = graft.core.Graph.undirected(GraphGen.uniform(spark, 12, 30, seed = 3)).cache()
    val s = edges.select(min(col("src"))).collect()(0).getLong(0)
    val t = edges.select(max(col("src"))).collect()(0).getLong(0)
    assert(s != t)
    val fromS = toMap[Double](Centrality.betweenness(edges, Seq(s)))
    val fromT = toMap[Double](Centrality.betweenness(edges, Seq(t)))
    val dup = toMap[Double](Centrality.betweenness(edges, Seq(s, s, t)))
    dup.foreach { case (vid, sc) =>
      assert(math.abs(sc - (2 * fromS(vid) + fromT(vid))) < 1e-9, s"vid=$vid")
    }
    val dupE = Centrality.edgeBetweenness(edges, Seq(s, s)).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val oneE = Centrality.edgeBetweenness(edges, Seq(s)).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    dupE.foreach { case (e, sc) =>
      assert(math.abs(sc - 2 * oneE(e)) < 1e-9, s"edge=$e")
    }
  }

  test("stress matches oracle on random graph") {
    val edges = graft.core.Graph.undirected(GraphGen.uniform(spark, 15, 40, seed = 12)).cache()
    val es = edges.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val vmax = es.flatMap(e => Seq(e._1, e._2)).max.toInt + 1
    val sources = es.map(_._1).distinct.sorted.take(4)
    val expected = Reference.stress(vmax, es, sources.map(_.toInt))
    val actual = toMap[Long](Centrality.stress(edges, sources))
    actual.foreach { case (vid, s) =>
      assert(s == expected(vid.toInt), s"vid=$vid: $s vs ${expected(vid.toInt)}")
    }
  }

  private def edgeBc(edges: org.apache.spark.sql.DataFrame, sources: Seq[Long]) =
    Centrality.edgeBetweenness(edges, sources).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

  test("edge betweenness: path and star closed forms") {
    // path 0-1-2 (undirected), all sources: every directed edge scores 2
    val path = GraphGen.chain(spark, 3)
    edgeBc(path, Seq(0L, 1L, 2L)).values.foreach(v => assert(math.abs(v - 2.0) < 1e-12))
    // star center 0 with 4 leaves, all sources: every directed edge scores 4
    val star = graft.core.Graph.undirected(
      (1L to 4L).map(i => (0L, i)).toDF("src", "dst"))
    val got = edgeBc(star, Seq(0L, 1L, 2L, 3L, 4L))
    assert(got.size == 8)
    got.values.foreach(v => assert(math.abs(v - 4.0) < 1e-12))
  }

  test("edge betweenness: per-vertex rollup equals vertex betweenness") {
    // δ_s(v) = Σ_{w∈succ} c_s(v,w) exactly, so summing a vertex's OUTGOING
    // edge scores reproduces the (oracle-checked) vertex betweenness
    val edges = graft.core.Graph.undirected(GraphGen.uniform(spark, 20, 60, seed = 8)).cache()
    val sources = edges.collect().map(_.getLong(0)).distinct.sorted.take(5).toSeq
    val byEdge = edgeBc(edges, sources)
    val rollup = byEdge.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val vertex = toMap[Double](Centrality.betweenness(edges, sources))
    // source vertices differ by construction: vertex betweenness never
    // accumulates δ_s(s), but s's outgoing DAG edges do carry it
    vertex.filter(kv => !sources.contains(kv._1)).foreach { case (vid, b) =>
      assert(math.abs(rollup.getOrElse(vid, 0.0) - b) < 1e-9,
        s"vid=$vid rollup ${rollup.getOrElse(vid, 0.0)} vs $b")
    }
    // edges never on a sampled shortest path exist in the output with 0.0
    assert(byEdge.size == edges.count())
  }

  test("multi-source BFS equals per-source BFS") {
    val edges = GraphGen.grid(spark, 3, 4)
    val sources = Seq(0L, 5L)
    val multi = Centrality.multiSourceBfs(edges, sources).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    sources.foreach { s =>
      val single = toMap[Int](graft.alg.Traversals.bfs(edges, s).state)
      single.foreach { case (vid, d) =>
        assert(multi((s, vid)) == d, s"root=$s vid=$vid")
      }
    }
  }
}
