package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TopKStructs

/** Custom Catalyst aggregate: bounded top-k vs the collect-sort-slice
 * formulation it replaces (exact, including in-array order). */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def data: DataFrame = {
    val rows = for {
      g <- 0 until 40
      i <- 0 until (g % 7) * 29 + 3
    } yield (g.toLong,
      ((i * 2654435761L + g * 97L) % 13L).toDouble / 7.0, // duplicate np values → tie stress
      (i * 31 + g) % 1000L,
      i.toDouble)
    rows.toDF("vid", "np", "l", "p")
      // l unique within a group (the LabelRank contract: one row per label)
      .groupBy("vid", "l").agg(min("np").as("np"), min("p").as("p"))
  }

  private def viaAgg(df: DataFrame, k: Int) = df.groupBy("vid")
    .agg(TopKStructs.topK(col("np"), col("l"), col("p"), k).as("topk"))

  private def viaSort(df: DataFrame, k: Int) = df.groupBy("vid")
    .agg(collect_list(struct(col("np"), col("l"), col("p"))).as("all"))
    .select(col("vid"), slice(array_sort(col("all")), 1, k).as("topk"))

  private def topkMap(df: DataFrame) = df.collect().map { r =>
    r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)
      .map(x => (x.getDouble(0), x.getLong(1), x.getDouble(2)))
  }.toMap

  test("bounded top-k equals sort-then-slice, including in-array order") {
    val df = data.cache()
    assert(topkMap(viaAgg(df, 16)) == topkMap(viaSort(df, 16)))
    assert(topkMap(viaAgg(df, 1)) == topkMap(viaSort(df, 1)))
    df.unpersist()
  }

  test("merge + serialize path: partitioning-invariant") {
    val df = data
    val a = topkMap(viaAgg(df.repartition(17), 16))
    val b = topkMap(viaAgg(df.repartition(2), 16))
    assert(a == b && a.nonEmpty)
    // groups smaller than k return everything, sorted
    assert(a.forall { case (_, xs) =>
      xs == xs.sortBy(t => (t._1, t._2)) && xs.size <= 16 })
  }
}
