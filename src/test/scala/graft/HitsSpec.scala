package graft

import org.apache.spark.sql.functions._
import graft.alg.Hits
import graft.gen.GraphGen

class HitsSpec extends SparkSpec {
  import spark.implicits._

  private def scoresOf(df: org.apache.spark.sql.DataFrame): Map[Long, (Double, Double)] =
    df.collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap

  test("directed star: center is the only hub, leaves split authority evenly") {
    val n = 9
    val edges = (1L until n.toLong).map(i => (0L, i)).toDF("src", "dst")
    val s = scoresOf(Hits.run(edges).scores)
    assert(math.abs(s(0L)._1 - 1.0) < 1e-12, "center hub must be 1")
    assert(math.abs(s(0L)._2) < 1e-12, "center has no authority")
    val leafAuth = 1.0 / math.sqrt((n - 1).toDouble)
    (1 until n).foreach { i =>
      assert(math.abs(s(i.toLong)._2 - leafAuth) < 1e-12, s"leaf $i auth")
      assert(math.abs(s(i.toLong)._1) < 1e-12, s"leaf $i hub must be 0")
    }
  }

  test("complete bipartite: hubs and authorities split evenly") {
    // {0,1} → {2,3}: exact fixed point reached in one round
    val edges = Seq((0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L)).toDF("src", "dst")
    val s = scoresOf(Hits.run(edges).scores)
    val half = 1.0 / math.sqrt(2.0)
    Seq(0L, 1L).foreach { v =>
      assert(math.abs(s(v)._1 - half) < 1e-12, s"source $v hub")
      assert(math.abs(s(v)._2) < 1e-12, s"source $v auth must be 0")
    }
    Seq(2L, 3L).foreach { v =>
      assert(math.abs(s(v)._2 - half) < 1e-12, s"target $v auth")
      assert(math.abs(s(v)._1) < 1e-12, s"target $v hub must be 0")
    }
  }

  test("hand-unrolled 1 round on a directed chain") {
    // 0→1→2. Round 1: a_raw = (0,1,1); h_raw(u) = Σ_{u→v} a_raw(v):
    // h_raw = (1,1,0). Norms √2 each → hub=(1,1,0)/√2, auth=(0,1,1)/√2.
    val edges = Seq((0L, 1L), (1L, 2L)).toDF("src", "dst")
    val s = scoresOf(Hits.run(edges, rounds = 1).scores)
    val r2 = 1.0 / math.sqrt(2.0)
    assert(math.abs(s(0L)._1 - r2) < 1e-12 && math.abs(s(0L)._2) < 1e-12)
    assert(math.abs(s(1L)._1 - r2) < 1e-12 && math.abs(s(1L)._2 - r2) < 1e-12)
    assert(math.abs(s(2L)._1) < 1e-12 && math.abs(s(2L)._2 - r2) < 1e-12)
  }

  test("both score vectors are L2-normalized on a skewed graph") {
    val s = Hits.run(GraphGen.rmat(spark, 6, 8, seed = 11)).scores
    val n = s.agg(sum(col("hub") * col("hub")), sum(col("auth") * col("auth")))
      .collect()(0)
    assert(math.abs(n.getDouble(0) - 1.0) < 1e-9)
    assert(math.abs(n.getDouble(1) - 1.0) < 1e-9)
  }

  test("per-superstep intermediates are released (no block-manager leak)") {
    // Hits cuts two intermediates per superstep (authed, raw) and must
    // release them deterministically — 4 rounds would otherwise leave 8
    // localCheckpoint block sets behind until GC
    val edges = GraphGen.rmat(spark, 6, 8, seed = 3).cache()
    edges.count()
    val before = spark.sparkContext.getPersistentRDDs.size
    Hits.run(edges, rounds = 4).scores.count()
    val after = spark.sparkContext.getPersistentRDDs.size
    // the caller-owned outcome state may remain; async unpersists may lag
    assert(after - before <= 3, s"persistent RDDs grew $before -> $after")
  }

  test("checkpointed run resumes mid-iteration to the same scores") {
    val edges = GraphGen.rmat(spark, 6, 8, seed = 5).cache()
    val dir = java.nio.file.Files.createTempDirectory("hitsckpt").toString
    val expected = scoresOf(Hits.run(edges, rounds = 4).scores)
    Hits.run(edges, rounds = 2, checkpointDir = Some(dir))
    val resumed = scoresOf(
      Hits.run(edges, rounds = 4, checkpointDir = Some(dir), resume = true).scores)
    expected.foreach { case (vid, (h, a)) =>
      assert(math.abs(resumed(vid)._1 - h) < 1e-12, s"vid=$vid hub")
      assert(math.abs(resumed(vid)._2 - a) < 1e-12, s"vid=$vid auth")
    }
  }

  test("metrics record one step per round, 2E traversals each") {
    val edges = GraphGen.chain(spark, 10)
    val e = edges.count()
    val r = Hits.run(edges, rounds = 3)
    assert(r.metrics.size == 3)
    assert(r.metrics.forall(_.edgesTraversed == 2 * e)) // two scatters/round
  }
}
