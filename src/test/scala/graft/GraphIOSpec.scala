package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.GraphIO
import graft.gen.GraphGen

class GraphIOSpec extends SparkSpec {

  test("text graph round-trip (reference edge-list format)") {
    val dir = Files.createTempDirectory("graphio").toString
    val edges = GraphGen.uniform(spark, 20, 50, seed = 4)
    GraphIO.writeText(edges, s"$dir/g", directed = true)
    val back = GraphIO.readText(spark, s"$dir/g")
    assert(back.directed)
    assert(back.edgeCount == edges.count())
    val a = edges.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val b = back.edges.select("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(a == b)
  }

  test("text parser handles header flags and comments") {
    val dir = Files.createTempDirectory("graphio2").toString
    Files.writeString(java.nio.file.Path.of(s"$dir/g.txt"),
      "# NODES: 3\n# EDGES: 2\n# UNDIRECTED\n0 1\n1 2 5.5\n")
    val g = GraphIO.readText(spark, s"$dir/g.txt")
    assert(!g.directed && g.vertexCount == 3 && g.edgeCount == 2)
    val rows = g.edges.orderBy("src").collect()
    assert(rows.length == 2)
    assert(rows(1).getDouble(2) == 5.5)
    assert(rows(0).isNullAt(2)) // unweighted edge -> null weight
  }

  test("vertex-value list reads positional vids, even multi-partition") {
    val dir = Files.createTempDirectory("graphio-vals").toString
    val n = 500
    // format: `# NODES: n Y` then n value lines (line i -> vid i), then edges
    val values = (0 until n).map(i => s"${i * 1.5}")
    val edgeLines = (0 until n - 1).map(i => s"$i ${i + 1}")
    Files.writeString(java.nio.file.Path.of(s"$dir/g.txt"),
      (Seq(s"# NODES: $n Y", s"# EDGES: ${n - 1}", "# DIRECTED") ++ values ++ edgeLines)
        .mkString("\n") + "\n")
    val g = GraphIO.readText(spark, s"$dir/g.txt")
    assert(g.vertexCount == n && g.values.isDefined)
    val got = g.values.get.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.size == n)
    (0 until n).foreach { i =>
      assert(got(i.toLong) == i * 1.5, s"vid $i: ${got(i.toLong)}")
    }
    // dense 0..n-1, no partition-offset contamination
    assert(got.keys.min == 0L && got.keys.max == (n - 1).toLong)
  }

  test("parquet round-trip with bucketing column") {
    val dir = Files.createTempDirectory("graphio3").toString
    val edges = GraphGen.chain(spark, 10)
    GraphIO.writeParquet(edges, s"$dir/g", buckets = 4)
    val back = GraphIO.readParquet(spark, s"$dir/g")
    assert(back.count() == edges.count())
    assert(back.columns.contains("bucket"))
  }

  test("packed adjacency: delta-varint round-trip, compression, loud truncation") {
    import graft.sources.PackedAdjacency
    // unit level: gaps encode/decode exact, including 0-gap (consecutive
    // ids) and multi-byte varints (gap > 127)
    val nbrs = IndexedSeq(0L, 1L, 2L, 300L, 16384L, Long.MaxValue - 1)
    assert(PackedAdjacency.decodeGaps(PackedAdjacency.encodeGaps(nbrs), nbrs.length)
      .toSeq == nbrs)
    // round-trip on a skewed graph equals the distinct edge set
    val edges = GraphGen.rmat(spark, 8, 8, seed = 21)
    val back = PackedAdjacency.unpack(PackedAdjacency.pack(edges))
    val want = edges.select("src", "dst").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = back.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
    // compression: consecutive-id locality (the web-graph case) packs to
    // ~1 byte/edge vs 8 raw
    val local = spark.range(1000).selectExpr("id % 10 AS src", "id AS dst")
    val (srcs, e, packedBytes, rawBytes) =
      PackedAdjacency.stats(PackedAdjacency.pack(local))
    assert(srcs == 10 && e == 1000)
    assert(packedBytes < rawBytes / 4, s"packed=$packedBytes raw=$rawBytes")
    // parquet sink/source round-trip
    val dir = java.nio.file.Files.createTempDirectory("packed").toString
    PackedAdjacency.write(edges, s"$dir/adj")
    assert(PackedAdjacency.read(spark, s"$dir/adj").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == want)
    // a truncated cell fails loudly
    val enc = PackedAdjacency.encodeGaps(IndexedSeq(5L, 1000L))
    intercept[IllegalArgumentException] {
      PackedAdjacency.decodeGaps(enc.dropRight(1), 2)
    }
    intercept[IllegalArgumentException] { PackedAdjacency.decodeGaps(enc, 1) }
  }

  test("alters: sorted adjacency, degree renumbering, weights, bidirectional") {
    val edges = GraphGen.star(spark, 5)
    val adj = graft.core.Graph.sortedAdjacency(edges)
    val hub = adj.filter(col("src") === 0L).collect()(0).getSeq[Long](2)
    assert(hub == hub.sorted)
    // degree renumbering: hub (deg 4) becomes id 0 under desc
    val ren = graft.core.Graph.sortVerticesByDegree(edges, descending = true)
    val deg0 = graft.core.Graph.outDegrees(ren).filter(col("vid") === 0L)
      .collect()(0).getLong(1)
    assert(deg0 == 4L)
    val w = graft.core.Graph.withRandomWeights(edges, seed = 1, vertexCount = 5)
    assert(w.agg(min("weight")).collect()(0).getDouble(0) >= 0.0)
    assert(w.agg(max("weight")).collect()(0).getDouble(0) < 5.0)
    val bi = graft.core.Graph.bidirectional(GraphGen.chain(spark, 3).limit(2))
    assert(bi.count() == 4)
    // every edge's reverse_id resolves to an existing edge_id
    val ids = bi.select("edge_id").collect().map(_.getLong(0)).toSet
    bi.select("reverse_id").collect().foreach(r => assert(ids.contains(r.getLong(0))))
  }
}
