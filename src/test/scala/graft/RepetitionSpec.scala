package graft

import org.apache.spark.sql.functions._
import graft.text.Repetition

class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("dupLineFraction / dupLineCharFraction: hand-computed examples") {
    val df = docs(
      1L -> "aaa\nbbb\naaa\n\n  \nccc", // 4 non-empty lines, 1 repeat
      2L -> "unique\nlines\nonly",
      3L -> "", // empty doc
      4L -> "xx\nxx\nxx\nyyyy") // lines: 2+2+2+4 chars, repeats carry 4
    val got = df.select(col("doc_id"),
      round(Repetition.dupLineFraction(col("text")), 6).as("lf"),
      round(Repetition.dupLineCharFraction(col("text")), 6).as("cf"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(got(1L) == ((0.25, 0.25))) // 1 of 4 lines dup; 3 of 12 chars dup
    assert(got(2L) == ((0.0, 0.0)))
    assert(got(3L) == ((0.0, 0.0)))
    assert(got(4L) == ((0.5, 4.0 / 10)))
  }

  test("dupNgramFraction: repeats beyond first occurrence, null for short docs") {
    val df = docs(
      1L -> "a b a b a", // 2-grams: "a b","b a","a b","b a" -> 2 distinct of 4
      2L -> "w x y z", // all 2-grams distinct
      3L -> "solo") // fewer than 2 tokens -> null
    val got = df.select(col("doc_id"),
      Repetition.dupNgramFraction(col("text"), 2).as("f"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got(1L).contains(0.5))
    assert(got(2L).contains(0.0))
    assert(got(3L).isEmpty)
  }

  test("topNgram: count-desc then gram-asc tie break; char fraction over joined tokens") {
    val df = docs(
      1L -> "B A b a c c", // lowercased 2-grams: "b a","a b","b a","a c","c c" -> "b a" wins at 2
      2L -> "t t s s") // "t t","t s","s s" all cnt=1 -> tie breaks to "s s"
    val got = Repetition.topNgram(df, "doc_id", "text", 2)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getDouble(3)))).toMap
    // doc 1: joined tokens "b a b a c c" = 11 chars; "b a" covers 2*3 = 6
    assert(got(1L) == (("b a", 2L, math.rint(6.0 / 11 * 1e6) / 1e6)))
    assert(got(2L)._1 == "s s")
    // a doc shorter than n tokens is absent
    assert(Repetition.topNgram(docs(9L -> "solo"), "doc_id", "text", 2).count() == 0)
  }

  test("gopherStats: each rule flips keep independently") {
    val good = (("the quick brown fox and the lazy dog walk that bridge with style is fine " * 5).trim)
    val df = docs(
      1L -> good, // 75 words, stopwords present, alphabetic
      2L -> Seq.fill(60)("12345").mkString(" "), // no alpha, no stopwords
      3L -> "the and of short", // < 50 words
      4L -> (("a b " * 40).trim + " the and")) // mean word len 1.09 < 3
    val got = df.select(col("doc_id"), Repetition.gopherStats(col("text")).as("g"))
      .select(col("doc_id"), col("g.n_words"), col("g.mean_word_len"),
        col("g.alpha_frac"), col("g.stop_hits"), col("g.keep"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4), r.getBoolean(5)))).toMap
    assert(got(1L)._5, s"good doc should keep: ${got(1L)}")
    assert(got(1L)._1 == 75L && got(1L)._3 == 1.0 && got(1L)._4 >= 2L)
    assert(!got(2L)._5 && got(2L)._3 == 0.0 && got(2L)._4 == 0L)
    assert(!got(3L)._5 && got(3L)._1 == 4L)
    assert(!got(4L)._5 && got(4L)._2 < 3.0)
  }

  test("corpusTopNgrams: global counts, doc frequency, deterministic ties") {
    val df = docs(
      1L -> "x y z x y z",  // "x y" ×2, "y z" ×2, "z x" ×1
      2L -> "x y a b",
      3L -> "A B x y")      // lowercases to "a b", "b x", "x y"
    val got = Repetition.corpusTopNgrams(df, "doc_id", "text", n = 2, k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // ("a b", 2) ties ("y z", 2) on cnt; gram asc breaks it
    assert(got.toSeq == Seq(("x y", 4L, 3L), ("a b", 2L, 2L), ("y z", 2L, 1L)))
    val cut = Repetition.corpusTopNgrams(df, "doc_id", "text", n = 2, k = 2)
      .collect().map(_.getString(0))
    assert(cut.toSeq == Seq("x y", "a b"))
  }

  test("measures are partitioning-invariant (pure per-row expressions)") {
    val df = (0L until 64L).map(i => (i, s"tok$i x y tok${i % 7} " * 3)).toDF("doc_id", "text")
    def run(d: org.apache.spark.sql.DataFrame) = d.select(col("doc_id"),
      Repetition.dupNgramFraction(col("text"), 3).as("f"),
      Repetition.gopherStats(col("text")).getField("n_words").as("w"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    assert(run(df) == run(df.repartition(17)))
  }
}
