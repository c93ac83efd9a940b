package graft

import org.apache.spark.sql.functions._
import graft.text.Curation

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(n: Int, keys: Int) =
    (0 until n).map(i => (i.toLong, s"host${i % keys}")).toDF("doc_id", "source")

  test("capPerKey keeps at most k per key and exactly k when the key is big enough") {
    val df = corpus(200, 4) // 50 docs/key
    val got = Curation.capPerKey(df, col("source"), col("doc_id"), k = 7)
    val sizes = got.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes.values.toSet == Set(7L))
    // keys smaller than k survive whole
    val small = corpus(6, 3) // 2 docs/key
    assert(Curation.capPerKey(small, col("source"), col("doc_id"), k = 7)
      .count() == 6)
  }

  test("two-phase salted cap selects exactly the same rows as one global window") {
    val df = corpus(500, 3)
    def ids(salts: Int) =
      Curation.capPerKey(df, col("source"), col("doc_id"), k = 11, salts = salts)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids(64) == ids(1)) // phase-1 pruning loses none of the global top-k
    assert(ids(5) == ids(1)) // salt count is a performance knob, not semantics
  }

  test("capPerKey is the k smallest (md5, id) per key — deterministic sample") {
    val df = corpus(90, 1)
    val got = Curation.capPerKey(df, col("source"), col("doc_id"), k = 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val want = df.select(col("doc_id"), md5(col("doc_id").cast("string")).as("h"))
      .collect().map(r => (r.getString(1), r.getLong(0)))
      .sortBy(identity).take(10).map(_._2).toSet
    assert(got == want)
  }

  test("hashSample: deterministic, partitioning-invariant, roughly proportional") {
    val df = corpus(2000, 1)
    val a = Curation.hashSample(df, col("doc_id"), 0.25)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Curation.hashSample(df.repartition(13), col("doc_id"), 0.25)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
    assert(math.abs(a.size - 500) < 120) // binomial(2000, .25) within ~5 sigma
    // monotone: a smaller fraction selects a subset
    val c = Curation.hashSample(df, col("doc_id"), 0.1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(c.subsetOf(a))
    assert(Curation.hashSample(df, col("doc_id"), 0.0).count() == 0)
    assert(Curation.hashSample(df, col("doc_id"), 1.0).count() == 2000)
  }
}
