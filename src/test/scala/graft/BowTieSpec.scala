package graft

import graft.alg.BowTie
import graft.gen.GraphGen

class BowTieSpec extends SparkSpec {
  import spark.implicits._

  // hand-built bow tie exercising every region:
  //   CORE  = 3-cycle {10,11,12}
  //   IN    = 0 -> 1 -> 10 (chain into the core)
  //   OUT   = 12 -> 20 -> 21
  //   TUBE  = 1 -> 30 -> 20 (IN-to-OUT path bypassing the core)
  //   TENDRIL = 1 -> 40 (off IN) and 41 -> 20 (into OUT)
  //   DISC  = 50 -> 51 (separate component)
  private val handEdges = Seq(
    (10L, 11L), (11L, 12L), (12L, 10L),
    (0L, 1L), (1L, 10L),
    (12L, 20L), (20L, 21L),
    (1L, 30L), (30L, 20L),
    (1L, 40L), (41L, 20L),
    (50L, 51L))

  test("decompose: every region classified per Broder on a hand gadget") {
    val regions = BowTie.decompose(handEdges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = Map(
      10L -> BowTie.Core, 11L -> BowTie.Core, 12L -> BowTie.Core,
      0L -> BowTie.In, 1L -> BowTie.In,
      20L -> BowTie.Out, 21L -> BowTie.Out,
      30L -> BowTie.Tube,
      40L -> BowTie.Tendril, 41L -> BowTie.Tendril,
      50L -> BowTie.Disc, 51L -> BowTie.Disc)
    assert(regions == expected)
  }

  test("summary counts match decompose") {
    val counts = BowTie.summary(handEdges.toDF("src", "dst"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map(BowTie.Core -> 3L, BowTie.In -> 2L, BowTie.Out -> 2L,
      BowTie.Tube -> 1L, BowTie.Tendril -> 2L, BowTie.Disc -> 2L))
  }

  test("fully cyclic graph is all CORE; DAG chain has a 1-vertex core") {
    val cyc = Seq((0L, 1L), (1L, 2L), (2L, 0L)).toDF("src", "dst")
    assert(BowTie.decompose(cyc).collect().forall(_.getString(1) == BowTie.Core))
    // chain 0->1->2: all SCCs trivial; largest = min id = vertex 0,
    // everything downstream of it is OUT
    val chain = Seq((0L, 1L), (1L, 2L)).toDF("src", "dst")
    val m = BowTie.decompose(chain).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m == Map(0L -> BowTie.Core, 1L -> BowTie.Out, 2L -> BowTie.Out))
  }

  test("rmat graph: regions partition the vertex set and sizes are stable") {
    val e = GraphGen.rmat(spark, scale = 7, edgeFactor = 4, seed = 11L)
    val d = BowTie.decompose(e)
    val n = graft.core.Graph.vertices(e).count()
    assert(d.count() == n)
    assert(d.select("vid").distinct().count() == n)
    // deterministic: second run identical
    val a = d.collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    val b = BowTie.decompose(e).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(a == b)
  }
}
