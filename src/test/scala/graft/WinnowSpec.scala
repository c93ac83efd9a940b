package graft

import org.apache.spark.sql.functions._
import graft.dedup.Winnow

class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  /** Driver-side reference: robust winnowing over md5-hex k-gram hashes of
   * the whitespace-normalized text — independent of the Spark plan. */
  private def reference(text: String, k: Int, w: Int): Set[(Long, String)] = {
    val t = text.toLowerCase.replaceAll("\\s+", " ")
    if (t.length < k) return Set.empty
    val md = java.security.MessageDigest.getInstance("MD5")
    val hs = (0 to t.length - k).map { i =>
      md.digest(t.substring(i, i + k).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    }
    val m = hs.length
    (1 to math.max(m - w + 1, 1)).map { j =>
      // rightmost minimum in window j..min(j+w-1, m) (1-based)
      val win = (j to math.min(j + w - 1, m)).map(p => (hs(p - 1), p))
      val minH = win.map(_._1).min
      val p = win.filter(_._1 == minH).map(_._2).max
      (p.toLong, minH)
    }.toSet
  }

  test("matches the driver-side reference on mixed documents") {
    val texts = Seq(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "aaaaaaaaaaaaaaaa", // degenerate: all grams equal — rightmost ties
      3L -> "short", // < k chars: no fingerprints
      4L -> "exactly8!", // barely ≥ k: fewer grams than the window
      5L -> "Spaced   OUT\t\ttext  with   runs of whitespace here")
    val got = Winnow.fingerprints(docs(texts: _*), k = 8, w = 4).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getString(2)))).toSeq
      .groupBy(_._1).map { case (id, xs) => id -> xs.map(_._2).toSet }
    val want = texts.map { case (id, t) => id -> reference(t, 8, 4) }
      .filter(_._2.nonEmpty).toMap
    assert(got == want)
  }

  test("coverage: every w-window of grams contains a selected position") {
    val text = "a quick winnowing coverage property check over a longer body of text"
    val sel = Winnow.fingerprints(docs(1L -> text), k = 8, w = 4).collect()
      .map(_.getLong(1)).toSet
    val m = text.toLowerCase.replaceAll("\\s+", " ").length - 7
    for (j <- 1 to m - 3)
      assert((j to j + 3).exists(p => sel.contains(p.toLong)),
        s"window at $j has no fingerprint")
  }

  test("locality: a shared substring of length ≥ w+k−1 shares a fingerprint") {
    val shared = "common stretch of text" // 22 ≥ 8+4−1
    val a = s"prefix only in doc A then $shared and an A tail"
    val b = s"completely different lead-in: $shared; unrelated ending"
    val fp = Winnow.fingerprints(docs(1L -> a, 2L -> b), k = 8, w = 4)
      .groupBy("fp").agg(countDistinct("doc_id").as("n"))
      .filter(col("n") === 2).count()
    assert(fp >= 1, "no shared fingerprint across the shared substring")
  }

  test("identical documents produce identical fingerprint sets") {
    val t = "identical content fingerprints exactly alike in every way"
    val out = Winnow.fingerprints(docs(1L -> t, 2L -> t), k = 8, w = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val byDoc = out.groupBy(_._1).map { case (id, xs) =>
      id -> xs.map(x => (x._2, x._3)).toSet }
    assert(byDoc(1L) == byDoc(2L))
  }
}
