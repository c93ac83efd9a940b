package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Ranking

/**
 * Direct unit coverage for the distributed ordering primitives (they are
 * otherwise exercised indirectly via shufflePositions / degree-sorted
 * partitioning parity tests). Uses small bucket counts so several range
 * partitions are non-empty and the broadcast prefix-sum path is real, and
 * re-executes the returned frame to pin the frozen-exchange contract: the
 * offsets job and the caller's action must read the SAME range placement.
 */
class RankingSpec extends SparkSpec {
  import spark.implicits._

  private def input = {
    // deterministic pseudo-random values with duplicate keys (tiebreak = id)
    (0L until 500L).map(i => (i, graft.gen.GraphGen.mix64(7L, i) % 50L))
      .toDF("id", "v")
  }

  test("globalRank matches a global window over multiple range buckets") {
    val df = input
    val got = Ranking.globalRank(df, Seq(col("v"), col("id")), "rank", buckets = 8)
    val want = df.withColumn("rank",
      row_number().over(Window.orderBy(col("v"), col("id"))).cast("long") - 1L)
    val g = got.select("id", "rank").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w = want.select("id", "rank").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(g == w)
    // rank is a 0-based permutation
    assert(g.values.toSeq.sorted == (0L until 500L))
  }

  test("globalRunningSum matches a global window and is stable across re-execution") {
    val df = input.withColumn("w", (col("v") % 7L + 1L))
    val got = Ranking.globalRunningSum(df, Seq(col("v"), col("id")), col("w"), "rs", buckets = 8)
    val want = df.withColumn("rs",
      sum(col("w")).over(Window.orderBy(col("v"), col("id"))).cast("long"))
    val w = want.select("id", "rs").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // execute the SAME returned frame twice: the frozen range exchange must
    // give identical results on both actions (no boundary re-sampling)
    val g1 = got.select("id", "rs").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val g2 = got.select("id", "rs").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(g1 == w)
    assert(g2 == w)
  }

  test("globalRank on an empty frame returns empty without failing") {
    val empty = Seq.empty[(Long, Long)].toDF("id", "v")
    assert(Ranking.globalRank(empty, Seq(col("v"), col("id")), "rank", buckets = 4).count() == 0L)
  }
}
