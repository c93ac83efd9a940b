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

  test("temperatureMix: corpus-derived rates, rarest key kept whole, driver parity") {
    // skewed mixture: 400 / 100 / 25 docs per language
    val rows = (0 until 525).map { i =>
      (i.toLong, if (i < 400) "en" else if (i < 500) "de" else "mi")
    }.toDF("doc_id", "lang")
    val tau = 0.3
    val got = Curation.temperatureMix(rows, col("lang"), col("doc_id"), tau)
    val rates = got.select("lang", "mix_rate").distinct().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    def rate(n: Long): Double =
      BigDecimal(math.pow(n / 25.0, tau - 1.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_EVEN).toDouble
    assert(rates("mi") == 1.0)
    assert(rates("en") == rate(400) && rates("de") == rate(100))
    // driver-side parity of the kept set: hashPosition(id) < floor(rate·2³²)
    val pos = rows.select(col("doc_id"),
        Curation.hashPosition(col("doc_id")).as("p"), col("lang"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val want = pos.collect { case (id, p, l)
      if p < (rates(l) * 4294967296.0).toLong => id }.toSet
    val ids = got.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == want)
    assert(pos.count(_._3 == "mi") == 25 && ids.count(_ >= 500) == 25)
    // partitioning-invariant
    val again = Curation.temperatureMix(rows.repartition(7), col("lang"),
      col("doc_id"), tau).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == ids)
  }

  test("prioritySample: exact-k, matches the driver-side A-Res top-k, deterministic") {
    val rows = (0 until 200).map(i => (i.toLong, (i % 13 + 1).toDouble))
    val df = rows.toDF("doc_id", "w")
    val got = Curation.prioritySample(df, col("doc_id"), col("w"), k = 40)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got.size == 40)
    // driver-side oracle: same md5-derived u, same key u^(1/w)
    def u(id: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.take(8)
      (java.lang.Long.parseLong(hex, 16) + 1L).toDouble / 4294967296.0
    }
    val want = rows.map { case (id, w) => (id, math.pow(u(id), 1.0 / w)) }
      .sortBy { case (id, k) => (-k, id) }.take(40).map(_._1).toSet
    assert(got == want)
    val again = Curation.prioritySample(df.repartition(7), col("doc_id"), col("w"), k = 40)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == again, "partitioning must not change the sample")
  }

  test("shufflePositions: exact md5 permutation, no global window, invariant") {
    val df = (0L until 997L).toDF("doc_id")
    def md5hex(id: Long): String = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val want = (0L until 997L).sortBy(id => (md5hex(id), id)).zipWithIndex
      .map { case (id, pos) => id -> pos.toLong }.toMap
    val got = Curation.shufflePositions(df, col("doc_id"), buckets = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
    // a permutation: every position exactly once; partitioning-invariant
    assert(got.values.toSeq.sorted == (0L until 997L))
    val again = Curation.shufflePositions(df.repartition(11), col("doc_id"), buckets = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == want, "bucket count and input partitioning must not matter")
  }

  test("prioritySample: weight dominance and k >= n degeneracy") {
    // one row with overwhelming weight has key u^(1/w) ~ 1 — always sampled
    val df = ((0 until 50).map(i => (i.toLong, 1.0)) :+ (99L, 1e12))
      .toDF("doc_id", "w")
    val got = Curation.prioritySample(df, col("doc_id"), col("w"), k = 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got.contains(99L))
    val all = Curation.prioritySample(df, col("doc_id"), col("w"), k = 1000)
    assert(all.count() == 51)
  }

  test("groupSplit: sides are group-pure, deterministic, edge fractions") {
    val df = (0L until 2000L).map(i => (i, s"src${i % 7}")).toDF("doc_id", "source")
    val got = Curation.groupSplit(df, col("source"), 0.25)
    // every group lands entirely on one side
    val sides = got.groupBy("source").agg(countDistinct("split").as("k"))
      .collect().map(_.getLong(1))
    assert(sides.forall(_ == 1L))
    // deterministic across invocations; both sides non-empty at 7 groups
    assert(got.collect().toSet == Curation.groupSplit(df, col("source"), 0.25).collect().toSet)
    val bySide = got.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySide.getOrElse("holdout", 0L) > 0 && bySide.getOrElse("train", 0L) > 0)
    // fraction edges: 0 -> all train, 1 -> all holdout
    assert(Curation.groupSplit(df, col("source"), 0.0)
      .filter(col("split") === "holdout").count() == 0)
    assert(Curation.groupSplit(df, col("source"), 1.0)
      .filter(col("split") === "train").count() == 0)
  }

  test("C4 line and document rules on hand documents") {
    val docs = Seq(
      // 1 good line of 5: short, few words, no terminal, javascript
      (0L, "This is a good long sentence here.\nshort one.\nno terminal punctuation on this line\n" +
        "tiny.\nthis javascript line is long enough to pass."),
      // 3 good lines -> document kept
      (1L, "One decent sentence with enough words here.\nAnother decent sentence with enough words!\n" +
        "A third keeper line with plenty of words?"),
      // 3 good lines but lorem ipsum -> dropped
      (2L, "One decent sentence with enough words here.\nAnother decent sentence with enough words!\n" +
        "we include lorem ipsum boilerplate in this line."),
      // 3 good lines but a brace -> dropped
      (3L, "One decent sentence with enough words here.\nAnother decent sentence with enough words!\n" +
        "var f = function() { return 1; } and padding.")
    ).toDF("doc_id", "text")
    val got = docs.select(col("doc_id"), Curation.c4Stats(col("text")).as("c"))
      .select(col("doc_id"), col("c.n_lines"), col("c.n_kept"), col("c.keep"), col("c.clean"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3), r.getString(4))))
      .toMap
    assert(got(0L) == ((5L, 1L, false, "This is a good long sentence here.")))
    assert(got(1L)._1 == 3L && got(1L)._2 == 3L && got(1L)._3)
    assert(got(1L)._4.linesIterator.size == 3)
    assert(got(2L)._2 == 3L && !got(2L)._3, "lorem ipsum drops the doc")
    // the brace line itself passes the LINE rule (ends in '.'), but the
    // document rule rejects the page: has_brace
    assert(got(3L)._2 == 3L && !got(3L)._3)
  }

  test("temperatureMix: empty corpus returns empty; NULL key is a real stratum") {
    val empty = Seq.empty[(Long, String)].toDF("id", "lang")
    val e = Curation.temperatureMix(empty, col("lang"), col("id"), tau = 0.5)
    assert(e.columns.contains("mix_rate") && e.count() == 0)
    // NULL is the rarest stratum (10 of 40): rate 1.0, every row must
    // survive — a plain === join would silently drop them all
    val withNull = (0 until 40)
      .map(i => (i.toLong, if (i % 4 == 0) null else "en"))
      .toDF("id", "lang")
    val kept = Curation.temperatureMix(withNull, col("lang"), col("id"), tau = 0.5)
    assert(kept.filter(col("lang").isNull).count() == 10L)
  }

  test("profile: exact interpolated quantiles per key; approx shares the shape") {
    val df = ((1 to 10).map(v => ("a", v.toDouble)) ++ Seq(("b", 7.0)))
      .toDF("k", "v")
    val got = Curation.profile(df, col("k"), col("v")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    // p*(n-1) linear interpolation on 1..10: p50=5.5, p90=9.1, p99=9.91
    assert(got("a") == ((10L, 5.5, 9.1, 9.91)))
    assert(got("b") == ((1L, 7.0, 7.0, 7.0)))
    val approx = Curation.profile(df, col("k"), col("v"), exact = false)
    assert(approx.columns.toSeq == Seq("key", "n", "p50", "p90", "p99"))
    assert(approx.count() == 2)
  }

  test("chunkWindows: overlap windows, clipped tail, empty docs dropped") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "only one"),                               // 2 tokens
      (3L, "   "),                                    // 0 tokens
      (4L, "")).toDF("doc_id", "text")
    val got = Curation.chunkWindows(docs, col("doc_id"), col("text"),
        window = 4, stride = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set(
      (1L, 0L, 0L, 4L), (1L, 1L, 3L, 4L), (1L, 2L, 6L, 4L), (1L, 3L, 9L, 1L),
      (2L, 0L, 0L, 2L)))
  }

  test("chunkWindows: stride == window partitions exactly; coverage is total") {
    val docs = Seq((1L, (1 to 9).map(_.toString).mkString(" "))).toDF("doc_id", "text")
    val got = Curation.chunkWindows(docs, col("doc_id"), col("text"),
        window = 4, stride = 4).collect()
      .map(r => (r.getLong(2), r.getLong(3))).sortBy(_._1)
    assert(got.toSeq == Seq((0L, 4L), (4L, 4L), (8L, 1L)))
    assert(got.map(_._2).sum == 9L) // no gap, no overlap
    intercept[IllegalArgumentException] {
      Curation.chunkWindows(docs, col("doc_id"), col("text"), window = 2, stride = 3)
    }
  }
}
