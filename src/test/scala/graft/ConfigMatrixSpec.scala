package graft

import org.apache.spark.sql.functions._
import graft.gen.GraphGen

/**
 * The configuration matrix from SURVEY.md §5 — the Spark analog of the
 * reference's platform/partitioning test matrix
 * (`totem_common_unittest.h:65-247`): results must be invariant to PHYSICAL
 * choices — shuffle partition count, adjacency chunk size, partitioning
 * bucket layout — exactly as the reference demands CPU/GPU/hybrid agreement.
 */
class ConfigMatrixSpec extends SparkSpec {
  import spark.implicits._

  private lazy val edges = GraphGen.rmat(spark, 7, 8, seed = 99).cache()

  test("PageRank invariant to adjacency chunk size (skew-split transparency)") {
    val base = toMap[Double](graft.alg.PageRank.run(edges, chunkSize = 4096).ranks)
    val tiny = toMap[Double](graft.alg.PageRank.run(edges, chunkSize = 4).ranks)
    assert(base.keySet == tiny.keySet)
    base.foreach { case (v, r) =>
      assert(math.abs(r - tiny(v)) < 1e-12, s"vid=$v: $r vs ${tiny(v)}")
    }
  }

  test("PageRank invariant to shuffle partition count") {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "3")
      val p3 = toMap[Double](graft.alg.PageRank.run(edges).ranks)
      spark.conf.set("spark.sql.shuffle.partitions", "17")
      val p17 = toMap[Double](graft.alg.PageRank.run(edges).ranks)
      p3.foreach { case (v, r) => assert(math.abs(r - p17(v)) < 1e-12) }
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  test("WCC and triangle counts invariant to input partitioning") {
    val rep = edges.repartition(13)
    assert(toMap[Long](graft.alg.ConnectedComponents.run(edges).components) ==
      toMap[Long](graft.alg.ConnectedComponents.run(rep).components))
    assert(toMap[Long](graft.alg.TriangleCount.perVertex(edges)) ==
      toMap[Long](graft.alg.TriangleCount.perVertex(rep)))
  }

  test("BFS and WCC invariant to the sparse/dense frontier switch") {
    // denseThreshold=0.0 forces dense (bottom-up / full-state push) from
    // superstep 1; 1.0 forces pure sparse; default 0.1 crosses over mid-run.
    val und = graft.core.Graph.undirected(edges).cache()
    val src = und.agg(min("src")).collect()(0).getLong(0)
    val sparse = toMap[Int](graft.alg.Traversals.bfs(und, src, denseThreshold = 1.0).state)
    val dense = toMap[Int](
      graft.alg.Traversals.bfs(und, src, denseThreshold = 0.0, denseMinV = 0L).state)
    val auto = toMap[Int](graft.alg.Traversals.bfs(und, src, denseMinV = 0L).state)
    assert(sparse == dense)
    assert(sparse == auto)
    val wccSparse = toMap[Long](graft.alg.ConnectedComponents.run(edges, denseThreshold = 1.0).components)
    val wccDense = toMap[Long](graft.alg.ConnectedComponents.run(edges, denseThreshold = 0.0).components)
    assert(wccSparse == wccDense)
  }

  test("parquet-checkpointed run equals in-memory run (PageRank)") {
    val dir = java.nio.file.Files.createTempDirectory("prckpt").toString
    val mem = toMap[Double](graft.alg.PageRank.run(edges).ranks)
    val ck = toMap[Double](graft.alg.PageRank.run(edges, checkpointDir = Some(dir)).ranks)
    mem.foreach { case (v, r) => assert(math.abs(r - ck(v)) < 1e-12, s"vid=$v") }
    // and the manifests exist for all 5 supersteps
    (1 to 5).foreach { ss =>
      assert(java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$dir/superstep=$ss/manifest.json")))
    }
  }
}
