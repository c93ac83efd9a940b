package graft

import org.apache.spark.sql.functions._
import graft.alg.Anf
import graft.core.Graph

class AnfSpec extends SparkSpec {
  import spark.implicits._

  private def edgesOf(pairs: (Long, Long)*) = pairs.toDF("src", "dst")

  test("exactNeighborhood on a directed path counts balls per hop") {
    // 1 -> 2 -> 3: balls B(1,h) = {1}, {1,2}, {1,2,3}; B(2,h) = {2}, {2,3}; B(3,h) = {3}
    val e = edgesOf((1L, 2L), (2L, 3L))
    val nf = Anf.exactNeighborhood(e, maxH = 4).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(nf == Map(0 -> 3L, 1 -> 5L, 2 -> 6L, 3 -> 6L, 4 -> 6L)) // padded flat tail
  }

  test("HyperANF tracks the exact neighborhood function within tolerance") {
    val e = Graph.undirected(
      gen.GraphGen.uniform(spark, vertexCount = 400, edgeCount = 1600, seed = 7))
    val exact = Anf.exactNeighborhood(e, maxH = 4).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val res = Anf.run(e, m = 64, maxH = 4, relTol = 0.0)
    val est = res.neighborhood.collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(est.keySet == exact.keySet)
    for ((h, n) <- exact) {
      val rel = math.abs(est(h) - n) / n.toDouble
      assert(rel <= 0.15, s"h=$h exact=$n est=${est(h)} relerr=$rel")
    }
  }

  test("HyperBall harmonic tracks the exact scores within HLL tolerance") {
    val e = Graph.undirected(
      gen.GraphGen.uniform(spark, vertexCount = 300, edgeCount = 1200, seed = 5))
    val verts = Graph.vertices(e).collect().map(_.getLong(0)).toSeq.sorted
    val exact = graft.alg.Traversals.harmonic(e, verts).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val est = Anf.harmonicApprox(e, m = 64, maxH = 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(est.keySet == exact.keySet)
    val rels = exact.collect { case (v, x) if x > 0 =>
      math.abs(est(v) - x) / x }
    assert(rels.sum / rels.size <= 0.15,
      f"mean relative error ${rels.sum / rels.size}%.3f exceeds the HLL bound")
    assert(rels.max <= 0.5, f"worst relative error ${rels.max}%.3f")
    // determinism: same data, same hashes, same estimates
    val again = Anf.harmonicApprox(e, m = 64, maxH = 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(again == est)
    // isolated vertices (no in-ball growth) score exactly 0
    val iso = edgesOf((1L, 2L))
    val h = Anf.harmonicApprox(iso, m = 16, maxH = 3).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(h(1L) == 0.0, "source with empty in-ball must score 0")
    assert(h(2L) > 0.0)
  }

  test("relTol stops at the ball fixpoint before maxH on a low-diameter graph") {
    val e = Graph.undirected(
      gen.GraphGen.uniform(spark, vertexCount = 200, edgeCount = 1200, seed = 11))
    val res = Anf.run(e, m = 64, maxH = 20, relTol = 1e-3)
    assert(res.metrics.size < 20, s"ran ${res.metrics.size} supersteps, expected early stop")
    // the estimate sequence is monotone non-decreasing (balls only grow)
    val ests = res.neighborhood.orderBy("h").collect().map(_.getDouble(1))
    assert(ests.zip(ests.tail).forall { case (a, b) => b >= a - 1e-9 })
  }

  test("effective diameter of a directed path is near its length") {
    // 0 -> 1 -> ... -> 9: N(h) grows linearly to N(9) = 55; the exact 0.9
    // quantile lands at h where N(h) >= 49.5, i.e. between 7 and 8
    val e = edgesOf((0L to 8L).map(i => (i, i + 1)): _*)
    val res = Anf.run(e, m = 64, maxH = 15, relTol = 1e-6, quantile = 0.9)
    assert(res.effectiveDiameter >= 5.5 && res.effectiveDiameter <= 9.5,
      s"effective diameter ${res.effectiveDiameter} out of range for a 9-hop path")
  }

  test("determinism: same graph, same estimates") {
    val e = Graph.undirected(
      gen.GraphGen.uniform(spark, vertexCount = 100, edgeCount = 400, seed = 3))
    val a = Anf.run(e, m = 64, maxH = 3, relTol = 0.0).neighborhood.collect()
      .map(r => (r.getInt(0), r.getDouble(1))).sortBy(_._1).toSeq
    val b = Anf.run(e, m = 64, maxH = 3, relTol = 0.0).neighborhood.collect()
      .map(r => (r.getInt(0), r.getDouble(1))).sortBy(_._1).toSeq
    assert(a == b)
  }

  test("resume keeps hop labels correct: parity with an uninterrupted run") {
    val e = Graph.undirected(
      gen.GraphGen.uniform(spark, vertexCount = 200, edgeCount = 600, seed = 11))
    val full = Anf.run(e, m = 64, maxH = 4, relTol = 0.0)
    val dir = java.nio.file.Files.createTempDirectory("anf_resume").toString
    // interrupted run: stops after 2 supersteps, each checkpointed
    Anf.run(e, m = 64, maxH = 2, relTol = 0.0, checkpointDir = Some(dir))
    val resumed = Anf.run(e, m = 64, maxH = 4, relTol = 0.0,
      checkpointDir = Some(dir), resume = true)
    // the pre-resume N(1..2) are rebuilt from the retained checkpoints, so
    // the hop-indexed curve and the interpolated diameter match exactly
    def curve(r: Anf.Result) = r.neighborhood.collect()
      .map(x => (x.getInt(0), x.getDouble(1))).sortBy(_._1).toSeq
    assert(curve(resumed) == curve(full))
    assert(resumed.effectiveDiameter == full.effectiveDiameter)
  }
}
