package graft

import graft.alg.StronglyConnected
import graft.gen.GraphGen

class SccSpec extends SparkSpec {
  import spark.implicits._

  private def labelsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Driver-side Tarjan (iterative), labels = min vid per SCC. */
  private def tarjan(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val verts = edges.flatMap(p => Seq(p._1, p._2)).distinct
    val adj = edges.filter(p => p._1 != p._2).distinct
      .groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2).toList }
    var counter = 0
    val index = scala.collection.mutable.Map[Long, Int]()
    val low = scala.collection.mutable.Map[Long, Int]()
    val onStack = scala.collection.mutable.Set[Long]()
    val stack = scala.collection.mutable.Stack[Long]()
    val label = scala.collection.mutable.Map[Long, Long]()
    // explicit work stack: (vertex, iterator over remaining neighbors)
    def visit(root: Long): Unit = {
      val work = scala.collection.mutable.Stack[(Long, Iterator[Long])]()
      def push(v: Long): Unit = {
        index(v) = counter; low(v) = counter; counter += 1
        stack.push(v); onStack += v
        work.push((v, adj.getOrElse(v, Nil).iterator))
      }
      push(root)
      while (work.nonEmpty) {
        val (v, it) = work.top
        var descended = false
        while (it.hasNext && !descended) {
          val w = it.next()
          if (!index.contains(w)) { push(w); descended = true }
          else if (onStack(w)) low(v) = math.min(low(v), index(w))
        }
        if (!descended) {
          work.pop()
          if (work.nonEmpty) {
            val p = work.top._1
            low(p) = math.min(low(p), low(v))
          }
          if (low(v) == index(v)) {
            var members = List.empty[Long]
            var w = -1L
            while (w != v) { w = stack.pop(); onStack -= w; members ::= w }
            val m = members.min
            members.foreach(label(_) = m)
          }
        }
      }
    }
    verts.foreach(v => if (!index.contains(v)) visit(v))
    label.toMap
  }

  test("two 3-cycles joined by a bridge edge") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L),
      (3L, 4L), (4L, 5L), (5L, 3L)).toDF("src", "dst")
    val got = labelsOf(StronglyConnected.run(edges))
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 3L, 4L -> 3L, 5L -> 3L))
  }

  test("DAG chain: every vertex is its own SCC (pure trim path)") {
    val edges = (0L until 6L).map(i => (i, i + 1)).toDF("src", "dst")
    val got = labelsOf(StronglyConnected.run(edges))
    assert(got == (0L to 6L).map(v => v -> v).toMap)
  }

  test("cycle with in/out spokes and a self-loop") {
    // 10→0, 0→1→2→0 (SCC), 2→20; 30→30 alone
    val edges = Seq((10L, 0L), (0L, 1L), (1L, 2L), (2L, 0L), (2L, 20L),
      (30L, 30L)).toDF("src", "dst")
    val got = labelsOf(StronglyConnected.run(edges))
    assert(got == Map(10L -> 10L, 0L -> 0L, 1L -> 0L, 2L -> 0L,
      20L -> 20L, 30L -> 30L))
  }

  test("matches Tarjan on skewed random digraphs") {
    for (seed <- Seq(3, 17)) {
      val edges = GraphGen.rmat(spark, 6, 4, seed = seed)
      val e = edges.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val want = tarjan(e)
      val got = labelsOf(StronglyConnected.run(edges))
      assert(got == want, s"seed $seed")
    }
  }

  test("matches Tarjan on the driver-style block digraph") {
    // forward random DAG edges + back edges confined to blocks of 8 —
    // the q_scc graph shape at miniature scale
    val rnd = new scala.util.Random(99)
    val fwd = Seq.fill(120) { val a = rnd.nextInt(64); val b = rnd.nextInt(64)
      (math.min(a, b).toLong, math.max(a, b).toLong) }.filter(p => p._1 != p._2)
    val back = Seq.fill(12) { val blk = rnd.nextInt(8) * 8
      val a = blk + rnd.nextInt(8); val b = blk + rnd.nextInt(8)
      (math.max(a, b).toLong, math.min(a, b).toLong) }.filter(p => p._1 != p._2)
    val e = (fwd ++ back).distinct
    val want = tarjan(e)
    val got = labelsOf(StronglyConnected.run(e.toDF("src", "dst")))
    assert(got == want)
  }
}
