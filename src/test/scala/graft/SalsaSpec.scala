package graft

import org.apache.spark.sql.functions._
import graft.alg.{Hits, Salsa}
import graft.gen.GraphGen

class SalsaSpec extends SparkSpec {
  import spark.implicits._

  private def scoresOf(df: org.apache.spark.sql.DataFrame): Map[Long, (Double, Double)] =
    df.collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap

  test("directed star: hub mass on the center, auth split 1/n per leaf") {
    val n = 9
    val edges = (1L until n.toLong).map(i => (0L, i)).toDF("src", "dst")
    val s = scoresOf(Salsa.run(edges).scores)
    assert(math.abs(s(0L)._1 - 1.0) < 1e-12)
    assert(math.abs(s(0L)._2) < 1e-12)
    (1 until n).foreach { i =>
      assert(math.abs(s(i.toLong)._2 - 1.0 / (n - 1)) < 1e-12, s"leaf $i auth")
      assert(math.abs(s(i.toLong)._1) < 1e-12, s"leaf $i hub")
    }
  }

  test("hand-unrolled 1 round on a directed chain") {
    // 0→1→2, all degrees 1. a_raw = (0,1,1) → auth = (0,.5,.5);
    // h_raw(u) = Σ a_raw(v)/indeg(v) = (1,1,0) → hub = (.5,.5,0)
    val s = scoresOf(Salsa.run(Seq((0L, 1L), (1L, 2L)).toDF("src", "dst"),
      rounds = 1).scores)
    assert(math.abs(s(0L)._1 - 0.5) < 1e-12 && math.abs(s(0L)._2) < 1e-12)
    assert(math.abs(s(1L)._1 - 0.5) < 1e-12 && math.abs(s(1L)._2 - 0.5) < 1e-12)
    assert(math.abs(s(2L)._1) < 1e-12 && math.abs(s(2L)._2 - 0.5) < 1e-12)
  }

  test("no TKC effect: K22 + K11, SALSA splits authority evenly, HITS does not") {
    // the Lempel-Moran motivating case: a dense 2x2 clique next to a lone
    // link. SALSA's degree-normalized walk reaches the (1/3,1/3,1/3)
    // authority fixpoint in one round; HITS concentrates authority on the
    // dense clique (tyranny of the majority)
    val edges = Seq((0L, 10L), (0L, 11L), (1L, 10L), (1L, 11L), (20L, 30L))
      .toDF("src", "dst")
    val s = scoresOf(Salsa.run(edges).scores)
    Seq(10L, 11L, 30L).foreach { v =>
      assert(math.abs(s(v)._2 - 1.0 / 3) < 1e-12, s"salsa auth $v")
    }
    Seq(0L, 1L, 20L).foreach { v =>
      assert(math.abs(s(v)._1 - 1.0 / 3) < 1e-12, s"salsa hub $v")
    }
    val h = scoresOf(Hits.run(edges).scores)
    assert(h(30L)._2 < h(10L)._2 / 4,
      "HITS must starve the small clique (the effect SALSA removes)")
  }

  test("both score vectors are L1 distributions on a skewed graph") {
    val s = Salsa.run(GraphGen.rmat(spark, 6, 8, seed = 11)).scores
    val n = s.agg(sum("hub"), sum("auth"), min("hub"), min("auth")).collect()(0)
    assert(math.abs(n.getDouble(0) - 1.0) < 1e-9)
    assert(math.abs(n.getDouble(1) - 1.0) < 1e-9)
    assert(n.getDouble(2) >= 0.0 && n.getDouble(3) >= 0.0)
  }

  test("per-superstep intermediates are released (no block-manager leak)") {
    val edges = GraphGen.rmat(spark, 6, 8, seed = 3).cache()
    edges.count()
    val before = spark.sparkContext.getPersistentRDDs.size
    Salsa.run(edges, rounds = 4).scores.count()
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after - before <= 3, s"persistent RDDs grew $before -> $after")
  }

  test("checkpointed run resumes mid-iteration to the same scores") {
    val edges = GraphGen.rmat(spark, 6, 8, seed = 5).cache()
    val dir = java.nio.file.Files.createTempDirectory("salsackpt").toString
    val expected = scoresOf(Salsa.run(edges, rounds = 4).scores)
    Salsa.run(edges, rounds = 2, checkpointDir = Some(dir))
    val resumed = scoresOf(
      Salsa.run(edges, rounds = 4, checkpointDir = Some(dir), resume = true).scores)
    expected.foreach { case (vid, (h, a)) =>
      assert(math.abs(resumed(vid)._1 - h) < 1e-12, s"vid=$vid hub")
      assert(math.abs(resumed(vid)._2 - a) < 1e-12, s"vid=$vid auth")
    }
  }
}
