package graft

import org.apache.spark.sql.functions._
import graft.alg.{DeltaStepping, Traversals}
import graft.gen.GraphGen

class DeltaSteppingSpec extends SparkSpec {
  import spark.implicits._

  private def distsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
    df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("weighted chain closed form") {
    val edges = Seq((0L, 1L, 5.0), (1L, 2L, 1.0), (2L, 3L, 2.0))
      .toDF("src", "dst", "weight")
    val d = distsOf(DeltaStepping.run(edges, source = 0L, delta = 2.0).state)
    assert(d == Map(0L -> 0.0, 1L -> 5.0, 2L -> 6.0, 3L -> 8.0))
  }

  test("heavy shortcut is corrected by the later light path") {
    // 0→2 (w=10) arrives first through the bucket-0 scatter; the light path
    // 0→1→2 (w=2) must overwrite it — the schedule-independence contract.
    val edges = Seq((0L, 2L, 10.0), (0L, 1L, 1.0), (1L, 2L, 1.0))
      .toDF("src", "dst", "weight")
    val d = distsOf(DeltaStepping.run(edges, source = 0L, delta = 1.0).state)
    assert(d == Map(0L -> 0.0, 1L -> 1.0, 2L -> 2.0))
  }

  test("matches Bellman-Ford sssp exactly on a skewed weighted graph") {
    val edges = GraphGen.rmat(spark, 7, 8, seed = 3)
      .withColumn("weight", ((col("src") * 7 + col("dst")) % 11 + 1).cast("double"))
    val source = edges.agg(min("src")).collect()(0).getLong(0)
    val bf = distsOf(Traversals.sssp(edges, source).state)
    // small delta (many buckets, Dijkstra-like) and huge delta (one bucket,
    // Bellman-Ford-like) both land on the identical fixpoint
    val fine = distsOf(DeltaStepping.run(edges, source, delta = 2.0).state)
    val coarse = distsOf(DeltaStepping.run(edges, source, delta = 1e9).state)
    assert(fine == bf)
    assert(coarse == bf)
  }

  test("only reached vertices appear; deterministic across runs") {
    val edges = Seq((0L, 1L, 1.0), (2L, 3L, 1.0)).toDF("src", "dst", "weight")
    val r1 = distsOf(DeltaStepping.run(edges, source = 0L, delta = 3.0).state)
    assert(r1 == Map(0L -> 0.0, 1L -> 1.0))
    val r2 = distsOf(DeltaStepping.run(edges, source = 0L, delta = 3.0).state)
    assert(r1 == r2)
  }

  test("bucket order defers far vertices: fewer relaxation rounds touch them") {
    // a wide-weight fan where Bellman-Ford re-relaxes the far hub once per
    // improvement; here the far hub's bucket runs only after near ones
    // settle, so the run still converges and stays exact
    val edges = Seq(
      (0L, 1L, 1.0), (0L, 2L, 9.0), (1L, 2L, 1.0), (2L, 4L, 1.0),
      (0L, 3L, 20.0), (2L, 3L, 2.0)).toDF("src", "dst", "weight")
    val d = distsOf(DeltaStepping.run(edges, source = 0L, delta = 3.0).state)
    assert(d == Map(0L -> 0.0, 1L -> 1.0, 2L -> 2.0, 3L -> 4.0, 4L -> 3.0))
  }
}
