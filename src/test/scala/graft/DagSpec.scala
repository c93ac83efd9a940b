package graft

import graft.alg.Dag

class DagSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("condensation collapses cycles and keeps the inter-component edge") {
    // two 3-cycles joined by one edge: {0,1,2} → {5,6,7}
    val e = Seq((0L, 1L), (1L, 2L), (2L, 0L), (5L, 6L), (6L, 7L), (7L, 5L), (2L, 5L))
      .toDF("src", "dst")
    val scc = graft.alg.StronglyConnected.run(e)
    assert(pairs(Dag.condensation(e, scc)) == Set((0L, 5L)))
  }

  test("layers = longest path: chain, diamond with a long arm") {
    val chain = Seq((0L, 1L), (1L, 2L), (2L, 3L)).toDF("src", "dst")
    assert(pairs(Dag.layers(chain).layers) ==
      Set((0L, 0L), (1L, 1L), (2L, 2L), (3L, 3L)))
    // 0→1→2→3 plus shortcut 0→3: layer(3) is the LONGEST path, 3 not 1
    val d = Seq((0L, 1L), (1L, 2L), (2L, 3L), (0L, 3L)).toDF("src", "dst")
    val ld = pairs(Dag.layers(d).layers).toMap
    assert(ld == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("a cyclic input throws instead of returning a wrong fixpoint") {
    val cyc = Seq((0L, 1L), (1L, 0L)).toDF("src", "dst")
    intercept[IllegalStateException] { Dag.layers(cyc, maxSupersteps = 5) }
  }

  test("topoLayers matches a driver-side longest-path reference") {
    // deterministic sparse digraph with mixed SCC sizes (same family as the
    // q_scc fixture): multiplicative-hash edges over 60 vertices
    val es = (0L until 400L).map(i => ((i * 13 + 5) % 60, (i * 29 + 11) % 60))
      .filter(p => p._1 != p._2).distinct
    val got = pairs(Dag.topoLayers(es.toDF("src", "dst"))).toMap

    // reference: boolean transitive closure (60 vertices), min-mutual SCC
    // labels, condensation, memoized longest path
    val vs = es.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    val idx = vs.zipWithIndex.toMap
    val n = vs.size
    val reach = Array.fill(n, n)(false)
    es.foreach { case (a, b) => reach(idx(a))(idx(b)) = true }
    for (k <- 0 until n; i <- 0 until n if reach(i)(k); j <- 0 until n)
      if (reach(k)(j)) reach(i)(j) = true
    val label = vs.map { v =>
      val i = idx(v)
      val mutual = vs.filter(w => w == v || (reach(i)(idx(w)) && reach(idx(w))(i)))
      v -> mutual.min
    }.toMap
    val cond = es.map { case (a, b) => (label(a), label(b)) }
      .filter(p => p._1 != p._2).distinct
    val memo = scala.collection.mutable.Map[Long, Long]()
    def depth(c: Long): Long = memo.getOrElseUpdate(c, {
      val ins = cond.filter(_._2 == c).map(_._1)
      if (ins.isEmpty) 0L else ins.map(depth).max + 1L
    })
    val ref = label.values.toSeq.distinct.map(c => c -> depth(c)).toMap
    assert(got == ref)
  }
}
