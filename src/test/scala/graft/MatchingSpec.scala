package graft

import org.apache.spark.sql.functions._
import graft.alg.Matching
import graft.gen.GraphGen

class MatchingSpec extends SparkSpec {
  import spark.implicits._

  /** driver-side edge key — must mirror Matching.edgeKey */
  private def key(a: Long, b: Long): Long =
    (a * 2654435761L + b * 2097593L + 104729L) % 2097143L * 4398046511104L +
      a * 2097152L + b

  /** sequential greedy matching over the global edge order */
  private def greedy(edges: Seq[(Long, Long)]): Set[(Long, Long)] = {
    val ce = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    var used = Set.empty[Long]
    var m = Set.empty[(Long, Long)]
    ce.sortBy { case (a, b) => key(a, b) }.foreach { case (a, b) =>
      if (!used(a) && !used(b)) { m += ((a, b)); used ++= Set(a, b) }
    }
    m
  }

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("single edge matches it") {
    val r = Matching.run(Seq((3L, 9L)).toDF("src", "dst"))
    assert(pairs(r.matching) == Set((3L, 9L)))
    val mates = r.mates.collect().map(x => (x.getLong(0), x.getLong(1))).toMap
    assert(mates == Map(3L -> 9L, 9L -> 3L))
  }

  test("triangle matches exactly one edge — the key-minimal one") {
    val edges = Seq((0L, 1L), (1L, 2L), (0L, 2L))
    val r = Matching.run(edges.toDF("src", "dst"))
    val m = pairs(r.matching)
    assert(m.size == 1)
    assert(m == Set(edges.minBy { case (a, b) => key(a, b) }))
    val mates = r.mates.collect().map(x => (x.getLong(0), x.getLong(1))).toMap
    assert(mates.count(_._2 == -1L) == 1)
  }

  test("matches sequential greedy on a skewed rmat graph") {
    val df = GraphGen.rmat(spark, 7, 8, seed = 21)
    val edges = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs(Matching.run(df).matching) == greedy(edges))
  }

  test("validity and maximality on a dense uniform graph") {
    val df = GraphGen.uniform(spark, 64, 500, seed = 17)
    val edges = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      .filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    val m = pairs(Matching.run(df).matching)
    // validity: matched pairs are edges, vertex-disjoint
    assert(m.subsetOf(edges.toSet))
    val touched = m.toSeq.flatMap(e => Seq(e._1, e._2))
    assert(touched.distinct.size == touched.size)
    // maximality: no edge with both endpoints unmatched
    val used = touched.toSet
    assert(!edges.exists(e => !used(e._1) && !used(e._2)))
  }

  test("self-loops and duplicate directions are ignored") {
    val edges = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L)).toDF("src", "dst")
    val r = Matching.run(edges)
    assert(pairs(r.matching) == Set((1L, 2L)))
  }

  test("deterministic across runs") {
    val df = GraphGen.uniform(spark, 32, 200, seed = 29)
    assert(pairs(Matching.run(df).matching) == pairs(Matching.run(df).matching))
  }

  test("vertex cover: covers every edge, size = 2·|matching|") {
    val df = GraphGen.uniform(spark, 64, 400, seed = 31)
    val cover = Matching.vertexCover(df).collect()
      .filter(_.getBoolean(1)).map(_.getLong(0)).toSet
    val m = pairs(Matching.run(df).matching)
    assert(cover.size == 2 * m.size)
    val edges = df.collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter(e => e._1 != e._2)
    assert(edges.forall(e => cover(e._1) || cover(e._2)))
  }
}
