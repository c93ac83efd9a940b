package graft

import org.apache.spark.sql.functions._
import graft.text.Curation

class PackSpec extends SparkSpec {
  import spark.implicits._

  private def assignments(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Long)] =
    df.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("contiguous-greedy fold matches a hand trace in one bucket") {
    val docs = Seq((1L, 500L), (2L, 600L), (3L, 900L), (4L, 100L),
      (5L, 2048L), (6L, 10L)).toDF("id", "tokens")
    // buckets=1: id order; 500+600+900=2000 fits, +100 overflows -> bin 1,
    // the exactly-cap doc overflows bin 1 -> bin 2, the 10 overflows -> bin 3
    val got = assignments(
      Curation.packSequences(docs, col("id"), col("tokens"), capTokens = 2048, buckets = 1))
    assert(got == Map(1L -> (0L, 0L), 2L -> (0L, 0L), 3L -> (0L, 0L),
      4L -> (0L, 1L), 5L -> (0L, 2L), 6L -> (0L, 3L)))
  }

  test("oversize document gets its own bin and does not poison the next") {
    val docs = Seq((1L, 100L), (2L, 5000L), (3L, 100L)).toDF("id", "tokens")
    val got = assignments(
      Curation.packSequences(docs, col("id"), col("tokens"), capTokens = 2048, buckets = 1))
    assert(got == Map(1L -> (0L, 0L), 2L -> (0L, 1L), 3L -> (0L, 2L)))
  }

  test("invariants on a hashed corpus: caps, contiguity, determinism, partitioning") {
    val docs = (0L until 400L).map(i => (i, 50L + (i * 37) % 500)).toDF("id", "tokens")
    val cap = 1024L
    val packed = Curation.packSequences(docs, col("id"), col("tokens"), cap, buckets = 8)
      .persist()
    // every multi-doc bin respects the cap (single-doc bins may be oversize)
    val stats = Curation.packedBinStats(packed,
      docs.select(col("id"), col("tokens")), cap).collect()
    stats.foreach { r =>
      val (nDocs, seqTokens) = (r.getLong(2), r.getLong(3))
      assert(nDocs == 1L || seqTokens <= cap,
        s"multi-doc bin over cap: $r")
    }
    // greedy tightness: consecutive bins couldn't merge — bin b's first doc
    // would overflow bin b-1 (checked via per-bin totals + first-doc tokens)
    val byBin = packed.join(docs, Seq("id")).collect()
      .map(r => ((r.getLong(1), r.getLong(2)), (r.getLong(0), r.getLong(3))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1)).toMap
    for (((bkt, bin), docsIn) <- byBin if bin > 0) {
      val prevTotal = byBin((bkt, bin - 1)).map(_._2).sum
      assert(prevTotal + docsIn.head._2 > cap,
        s"bin ($bkt,$bin) head could have fit in the previous bin")
    }
    // bins contiguous from 0 per bucket
    for ((bkt, bins) <- packed.collect().map(r => (r.getLong(1), r.getLong(2)))
           .groupBy(_._1).view.mapValues(_.map(_._2).distinct.sorted.toList).toMap)
      assert(bins == (0L to bins.max).toList,
        s"bucket $bkt bins not contiguous: ${bins.mkString(",")}")
    // deterministic + invariant to input partitioning
    val again = assignments(Curation.packSequences(
      docs.repartition(7), col("id"), col("tokens"), cap, buckets = 8))
    assert(assignments(packed) == again)
    packed.unpersist()
  }
}
