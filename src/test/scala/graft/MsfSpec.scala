package graft

import org.apache.spark.sql.functions._
import graft.alg.Msf
import graft.gen.GraphGen

class MsfSpec extends SparkSpec {
  import spark.implicits._

  /** driver-side edge key — must mirror Msf.edgeKey */
  private def key(w: Long, a: Long, b: Long): Long =
    w * 4398046511104L + a * 2097152L + b

  /** sequential Kruskal with union-find over the (w, a, b) order — the
   * unique MSF the parallel Boruvka must reproduce exactly */
  private def kruskal(edges: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] = {
    val ce = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2), e._3))
      .groupBy(e => (e._1, e._2)).map(_._2.minBy(_._3)).toSeq
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    var f = Set.empty[(Long, Long, Long)]
    ce.sortBy { case (a, b, w) => key(w, a, b) }.foreach { case (a, b, w) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { parent(ra) = rb; f += ((a, b, w)) }
    }
    f
  }

  private def forestOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def weighted(edges: Seq[(Long, Long)]): Seq[(Long, Long, Long)] =
    edges.map { case (s, d) =>
      (s, d, (math.min(s, d) * 7 + math.max(s, d) * 13) % 1000)
    }

  test("triangle keeps the two lightest edges") {
    val e = Seq((0L, 1L, 5L), (1L, 2L, 3L), (0L, 2L, 9L))
    val r = Msf.run(e.toDF("src", "dst", "weight"))
    assert(forestOf(r.forest) == Set((0L, 1L, 5L), (1L, 2L, 3L)))
  }

  test("disconnected components each get their own tree") {
    val e = Seq((0L, 1L, 1L), (1L, 2L, 2L), (0L, 2L, 3L),
      (10L, 11L, 4L), (11L, 12L, 5L), (10L, 12L, 6L))
    val r = Msf.run(e.toDF("src", "dst", "weight"))
    assert(forestOf(r.forest) ==
      Set((0L, 1L, 1L), (1L, 2L, 2L), (10L, 11L, 4L), (11L, 12L, 5L)))
  }

  test("parallel edges keep the minimum weight; self-loops ignored") {
    val e = Seq((0L, 1L, 9L), (1L, 0L, 2L), (1L, 1L, 1L))
    val r = Msf.run(e.toDF("src", "dst", "weight"))
    assert(forestOf(r.forest) == Set((0L, 1L, 2L)))
  }

  test("matches sequential Kruskal on a skewed rmat graph") {
    val df = GraphGen.rmat(spark, 7, 8, seed = 33)
    val edges = weighted(df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq)
    val a = least(col("src"), col("dst")); val b = greatest(col("src"), col("dst"))
    val in = df.select(col("src"), col("dst"), ((a * 7 + b * 13) % 1000).as("weight"))
    assert(forestOf(Msf.run(in).forest) == kruskal(edges))
  }

  test("spanning + acyclic on a dense uniform graph (chain-heavy contraction)") {
    val df = GraphGen.uniform(spark, 128, 900, seed = 41)
    val a = least(col("src"), col("dst")); val b = greatest(col("src"), col("dst"))
    val in = df.select(col("src"), col("dst"), ((a * 7 + b * 13) % 1000).as("weight"))
    val forest = forestOf(Msf.run(in).forest)
    val edges = weighted(df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq)
    assert(forest == kruskal(edges))
    // structural: |forest| = V - #components of the input graph
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (x, y, _) => val (rx, ry) = (find(x), find(y))
      if (rx != ry) parent(rx) = ry }
    val nComp = verts.map(find).distinct.size
    assert(forest.size == verts.size - nComp)
  }

  test("deterministic across runs and records phase metrics") {
    val df = GraphGen.uniform(spark, 64, 300, seed = 55)
    val a = least(col("src"), col("dst")); val b = greatest(col("src"), col("dst"))
    val in = df.select(col("src"), col("dst"), ((a * 7 + b * 13) % 1000).as("weight"))
    val r1 = Msf.run(in); val r2 = Msf.run(in)
    assert(forestOf(r1.forest) == forestOf(r2.forest))
    // the phase that empties the live set reports convergence directly —
    // no trailing zero-edge sentinel phase (the live set IS the state)
    assert(r1.metrics.last.converged && r1.metrics.last.edgesTraversed > 0L)
    assert(r1.metrics.count(_.converged) == 1)
    assert(r1.metrics.size >= 2)
  }
}
