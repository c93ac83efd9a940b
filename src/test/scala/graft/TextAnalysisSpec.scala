package graft

import org.apache.spark.sql.functions._
import graft.text.TextAnalysis

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("token count: whitespace runs, empty strings") {
    val df = Seq("a b c", "  a   b  ", "", "one", "\t x \n y \r").toDF("text")
    val got = df.select(TextAnalysis.tokenCount(col("text"))).collect().map(_.getInt(0)).toSeq
    assert(got == Seq(3, 2, 0, 1, 2))
  }

  test("subword count splits letters/digits/punct") {
    val got = Seq("ab12-cd!").toDF("text")
      .select(TextAnalysis.subwordCount(col("text"))).collect()(0).getInt(0)
    // "ab","1","2","-","cd","!"
    assert(got == 6)
  }

  test("unigram LM scoring: hand-computed log-probs, buckets, threshold edge") {
    // corpus counts: a=2, b=2, c=1 of 5 total
    val docs = Seq((0L, "a a b"), (1L, "b c")).toDF("doc_id", "text")
    // nano-unit discipline: lp_nano = floor(ln(cnt/total)·1e9),
    // avg = Σnano / (n·1e9)
    def nano(x: Double) = math.floor(math.log(x) * 1e9)
    val lpA = nano(2.0 / 5); val lpC = nano(1.0 / 5)
    val want0 = (lpA * 3) / (3 * 1e9)      // ≈ -0.916290732
    val want1 = (lpA + lpC) / (2 * 1e9)    // ≈ -1.263142423
    // headThreshold exactly at doc 0's score: >= is head (boundary is head)
    val got = TextAnalysis.unigramLogProb(docs, "doc_id", "text",
        headThreshold = want0, middleThreshold = -1.0)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getString(3)))).toMap
    assert(got(0L) == ((3L, want0, "head")))
    assert(got(1L) == ((2L, want1, "tail")))
    // middle band
    val mid = TextAnalysis.unigramLogProb(docs, "doc_id", "text",
        headThreshold = -0.5, middleThreshold = -1.0)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(mid == Map(0L -> "middle", 1L -> "tail"))
  }

  test("unigram LM terciles: nearest-rank cuts split a 6-doc corpus 2/2/2") {
    // six docs with strictly ordered scores: rarer vocabulary -> lower
    // avg_logprob; nearest-rank cuts are the 2nd and 4th smallest scores
    val docs = Seq(
      (0L, "a a a a"), (1L, "a a a b"), (2L, "a a b b"),
      (3L, "a b b c"), (4L, "b b c c"), (5L, "c c d d"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.unigramLogProbTerciles(docs, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getDouble(2), r.getString(3)))).toMap
    val byScore = got.toSeq.sortBy(_._2._1).map(_._1)
    // ascending score order -> tail, tail, middle, middle, head, head
    val buckets = byScore.map(got(_)._2)
    assert(buckets == Seq("tail", "tail", "middle", "middle", "head", "head"),
      s"got $buckets for score order $byScore")
    // cuts ARE corpus scores: the 2nd and 4th smallest (boundary docs
    // land at the low side: score <= cut)
    assert(got(byScore(1))._2 == "tail" && got(byScore(3))._2 == "middle")

    // sketch path (10^12 shape): same schema, same row count, buckets
    // still monotone in the score
    val approx = TextAnalysis.unigramLogProbTerciles(docs, "doc_id", "text",
        exact = false)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(2), r.getString(3)))).toMap
    assert(approx.size == 6)
    val rankOf = Map("tail" -> 0, "middle" -> 1, "head" -> 2)
    val ordered = approx.toSeq.sortBy(_._2._1).map(r => rankOf(r._2._2))
    assert(ordered == ordered.sorted, s"sketch buckets not monotone: $ordered")
  }

  test("language id picks marker-dominant language; CJK shortcut; und fallback") {
    val df = Seq(
      ("the cat and the dog is here", "en"),
      ("der hund und die katze ist nicht da", "de"),
      ("le chat et la maison est dans les bois", "fr"),
      ("el gato es de los bosques por la casa", "es"),
      ("你好世界", "zh"),
      ("zzz qqq www", "und")
    ).toDF("text", "want")
    df.select(TextAnalysis.langId(col("text")).as("got"), col("want")).collect()
      .foreach(r => assert(r.getString(0) == r.getString(1), r.toString))
  }

  test("quality score in [0,1]; garbage scores below clean prose") {
    val clean = "the quick brown fox jumps over the lazy dog and runs far away to the hills"
    val garbage = "@@@@ #### !!!! %%%% ^^^^ &&&& **** (((("
    val df = Seq(clean, garbage).toDF("text")
    val s = df.select(TextAnalysis.qualityScore(col("text"))).collect().map(_.getDouble(0))
    assert(s.forall(x => x >= 0.0 && x <= 1.0))
    assert(s(0) > s(1))
  }

  test("char entropy: closed forms, repetition ordering, empty text") {
    val df = Seq("aaaa", "ab", "abcd", "", "aabb").toDF("text")
    val got = df.select(round(TextAnalysis.charEntropy(col("text")), 9))
      .collect().map(_.getDouble(0)).toSeq
    // uniform over k symbols -> log2(k); constant -> 0; empty -> 0
    assert(got(0) == 0.0 && got(3) == 0.0)
    assert(math.abs(got(1) - 1.0) < 1e-9 && math.abs(got(4) - 1.0) < 1e-9)
    assert(math.abs(got(2) - 2.0) < 1e-9)
    // driver-side oracle on arbitrary text, any order of accumulation
    val s = "the quick brown fox the quick"
    val hand = {
      val m = s.groupBy(identity).view.mapValues(_.length.toDouble / s.length)
      -m.values.map(p => p * math.log(p) / math.log(2)).sum
    }
    val e = Seq(s).toDF("text")
      .select(TextAnalysis.charEntropy(col("text"))).collect()(0).getDouble(0)
    assert(math.abs(e - hand) < 1e-9)
    // repetitive text scores strictly below diverse text of the same length
    val rep = "spam spam spam spam spam spam "
    val div = "all unique wording every place "
    val Seq(er, ed) = Seq(rep, div).toDF("text")
      .select(TextAnalysis.charEntropy(col("text"))).collect().map(_.getDouble(0)).toSeq
    assert(er < ed)
  }

  test("fingerprint invariant to case/punctuation/whitespace") {
    val df = Seq("Hello, World!", "hello   world", "HELLO WORLD").toDF("text")
    val fps = df.select(TextAnalysis.fingerprint(col("text"))).collect().map(_.getString(0))
    assert(fps.toSet.size == 1)
  }

  test("char shingles and word shingles") {
    val sh = Seq("abcde").toDF("text")
      .select(TextAnalysis.shingles(col("text"), 3)).collect()(0).getSeq[String](0)
    assert(sh == Seq("abc", "bcd", "cde"))
    val ws = Seq("a b c d").toDF("text")
      .select(TextAnalysis.wordShingles(col("text"), 2)).collect()(0).getSeq[String](0)
    assert(ws == Seq("a b", "b c", "c d"))
    val short = Seq("ab").toDF("text")
      .select(TextAnalysis.shingles(col("text"), 3)).collect()(0).getSeq[String](0)
    assert(short.isEmpty)
  }

  test("tfidf top terms: hand oracle, smoothing, tie-break, rank cap") {
    val docs = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    val got = TextAnalysis.tfidfTopTerms(docs, "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4))
    // N=2; df(a)=2, df(b)=df(c)=1; idf(a)=ln(3/3)+1=1, idf(b/c)=ln(1.5)+1
    // micro-unit quantization: tfidf = tf·floor(idf·1e6)/1e6
    val idfBC = math.floor((math.log(1.5) + 1.0) * 1e6) / 1e6
    assert(got.toSeq == Seq(
      (1L, "a", 2.0, 1), (1L, "b", idfBC, 2),
      (2L, "c", idfBC, 1), (2L, "a", 1.0, 2)))
  }

  test("runs over the driver documents table") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = docs.select(col("doc_id"),
      TextAnalysis.tokenCount(col("text")).as("tokens"),
      TextAnalysis.langId(col("text")).as("lang_pred"),
      TextAnalysis.qualityScore(col("text")).as("quality"),
      TextAnalysis.fingerprint(col("text")).as("fp"))
    assert(out.count() == docs.count())
    assert(out.filter(col("tokens") <= 0).count() == 0)
  }
}
