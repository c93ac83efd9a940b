package graft

import org.apache.spark.sql.functions._
import graft.text.Dsir
import java.security.MessageDigest

class DsirSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** driver-side DSIR reference: same features, buckets, smoothing, rounding. */
  private def reference(docs: Seq[(Long, String, Boolean)], buckets: Int,
                        lambda: Double): Map[Long, (Long, Double)] = {
    val hexLen = (math.log(buckets) / math.log(16)).round.toInt
    def feats(text: String): Seq[String] = {
      val t = "[^ \\t\\n\\r]+".r.findAllIn(text.toLowerCase).toSeq
      t ++ t.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
    }
    val occ = docs.flatMap { case (id, text, tgt) =>
      feats(text).map(f => (id, tgt, md5hex(f).take(hexLen)))
    }
    val cr = occ.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val ct = occ.filter(_._2).groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val tr = cr.values.sum; val tt = ct.values.sum
    val lamB = lambda * buckets
    def nanos(x: Double) = BigDecimal(x).setScale(9,
      BigDecimal.RoundingMode.HALF_UP).bigDecimal.movePointRight(9).longValueExact
    val ratio = cr.keys.map { b =>
      b -> nanos(math.log((ct.getOrElse(b, 0L) + lambda) / (tt + lamB)) -
        math.log((cr(b) + lambda) / (tr + lamB)))
    }.toMap
    occ.groupBy(_._1).view.mapValues { rows =>
      (rows.size.toLong, rows.map(r => ratio(r._3)).sum / 1e9)
    }.toMap
  }

  private val corpus = Seq(
    (1L, "the cat sat on the mat", true),
    (2L, "the dog sat on the log", true),
    (3L, "der hund sitzt auf dem baum", false),
    (4L, "the cat and the dog sat", false),
    (5L, "xyzzy plugh quux", false),
    (6L, "the the the cat cat", true))

  private def df = corpus.toDF("doc_id", "text", "tgt")

  test("importanceWeights matches the driver-side DSIR reference exactly") {
    val got = Dsir.importanceWeights(df, "doc_id", "text", col("tgt"),
        buckets = 256, lambda = 0.5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val want = reference(corpus, buckets = 256, lambda = 0.5)
    assert(got == want)
  }

  test("target-vocabulary documents outweigh off-distribution ones") {
    val w = Dsir.importanceWeights(df, "doc_id", "text", col("tgt"), buckets = 4096)
      .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getLong(1))).toMap
    // doc 4 shares the English target vocabulary; docs 3 and 5 do not.
    // Same length: the raw log-likelihood-ratio sums compare directly.
    assert(w(4L)._1 > w(3L)._1, s"target-like should beat German: $w")
    // Different lengths: the weight is a SUM over occurrences (Xie et al.'s
    // log p(doc) − log q(doc)), so normalize per feature to compare.
    def mean(id: Long) = w(id)._1 / w(id)._2
    assert(mean(4L) > mean(5L), s"target-like should beat nonsense: $w")
  }

  test("weights are partitioning-invariant") {
    val a = Dsir.importanceWeights(df, "doc_id", "text", col("tgt"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val b = Dsir.importanceWeights(df.repartition(7), "doc_id", "text", col("tgt"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(a == b)
  }

  test("docs with no tokens drop; n_feats = unigrams + bigrams") {
    val d2 = (corpus :+ (7L, "   ", false)).toDF("doc_id", "text", "tgt")
    val got = Dsir.importanceWeights(d2, "doc_id", "text", col("tgt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!got.contains(7L))
    assert(got(5L) == 3L + 2L) // 3 unigrams + 2 bigrams
    assert(got(1L) == 6L + 5L)
  }

  test("resample is deterministic Gumbel top-k with id tie-break") {
    val w = Dsir.importanceWeights(df, "doc_id", "text", col("tgt"))
    val got = Dsir.resample(w, "doc_id", "logweight", k = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    // driver-side recomputation of the same deterministic draw
    val weights = w.collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    def rnd6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = weights.toSeq.map { case (id, lw) =>
      val h = java.lang.Long.parseLong(md5hex(id.toString).take(8), 16)
      (rnd6(lw - math.log(-math.log((h + 0.5) / 4294967296.0))), id)
    }.sortBy { case (key, id) => (-key, id) }.take(3).map(_._2)
    assert(got == want)
    assert(Dsir.resample(w.repartition(5), "doc_id", "logweight", k = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSeq == want)
  }

  test("buckets must be a power of 16") {
    intercept[IllegalArgumentException] {
      Dsir.importanceWeights(df, "doc_id", "text", col("tgt"), buckets = 1000)
    }
  }
}
