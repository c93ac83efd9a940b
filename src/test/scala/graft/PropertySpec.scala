package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.oracle.Reference

/**
 * ScalaCheck property tests (SURVEY.md §5): invariants that must hold on
 * ARBITRARY graphs, checked engine-vs-oracle and engine-vs-math. Graphs are
 * drawn from a ScalaCheck generator with fixed seeds (deterministic CI; the
 * scalatestplus bridge isn't in the offline cache, so sampling is manual).
 */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val graphGen: Gen[Seq[(Long, Long)]] = for {
    v <- Gen.choose(4, 18)
    e <- Gen.choose(v, 4 * v)
    edges <- Gen.listOfN(e, for {
      s <- Gen.choose(0, v - 1)
      d <- Gen.choose(0, v - 1) if s != d
    } yield (s.toLong, d.toLong))
  } yield edges

  private def samples(n: Int): Seq[Seq[(Long, Long)]] =
    (1 to n).flatMap(i =>
      graphGen.apply(Gen.Parameters.default, Seed(42L + i)))
      .filter(_.nonEmpty)

  test("property: PageRank matches oracle; ranks positive and bounded") {
    samples(5).foreach { es =>
      val touched = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
      val idMap = touched.zipWithIndex.map { case (g, i) => g -> i.toLong }.toMap
      val expected = Reference.pageRank(touched.size, es.map { case (s, d) => (idMap(s), idMap(d)) })
      val actual = toMap[Double](graft.alg.PageRank.run(es.toDF("src", "dst")).ranks)
      touched.foreach { g =>
        assert(math.abs(actual(g) - expected(idMap(g).toInt)) <= 1e-9,
          s"vid=$g on edges=$es")
      }
      assert(actual.values.forall(r => r > 0 && r < 1.0))
    }
  }

  test("property: WCC label equals min vertex id of its component") {
    samples(5).foreach { es =>
      val touched = es.flatMap(e => Seq(e._1, e._2)).distinct
      val idMap = touched.sorted.zipWithIndex.map { case (g, i) => g -> i.toLong }.toMap
      val inv = idMap.map(_.swap)
      val oracle = Reference.wcc(touched.size, es.map { case (s, d) => (idMap(s), idMap(d)) })
      val actual = toMap[Long](graft.alg.ConnectedComponents.run(es.toDF("src", "dst")).components)
      touched.foreach(g => assert(actual(g) == inv(oracle(idMap(g).toInt)), s"vid=$g"))
      actual.groupBy(_._2).foreach { case (label, members) =>
        assert(members.keySet.min == label, s"label $label not minimal in component")
      }
    }
  }

  test("property: triangle counts match oracle; incidence divisible by 3") {
    samples(5).foreach { es =>
      val vmax = es.flatMap(e => Seq(e._1, e._2)).max.toInt + 1
      val expected = Reference.triangles(vmax, es)
      val actual = toMap[Long](graft.alg.TriangleCount.perVertex(es.toDF("src", "dst")))
      actual.foreach { case (vid, t) =>
        assert(t == expected(vid.toInt), s"vid=$vid on edges=$es")
      }
      assert(actual.values.sum % 3 == 0)
    }
  }
}
