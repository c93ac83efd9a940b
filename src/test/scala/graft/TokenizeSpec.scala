package graft

import org.apache.spark.sql.functions._
import graft.text.Tokenize

class TokenizeSpec extends SparkSpec {
  import spark.implicits._

  // ---- in-memory reference BPE trainer (Sennrich et al. 2016) ----
  private def refTrain(corpus: Seq[String], n: Int): Seq[(String, String, Long)] = {
    var wf: Map[Vector[String], Long] = corpus
      .flatMap(_.toLowerCase.split("[ \t\n\r]+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, g) => w.map(_.toString).toVector -> g.size.toLong }
    val out = Seq.newBuilder[(String, String, Long)]
    var i = 0
    var go = true
    while (i < n && go) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((syms, f) <- wf; j <- 0 until syms.size - 1)
        counts((syms(j), syms(j + 1))) = counts.getOrElse((syms(j), syms(j + 1)), 0L) + f
      if (counts.isEmpty) go = false
      else {
        val ((a, b), c) = counts.minBy { case ((x, y), n) => (-n, x, y) }
        out += ((a, b, c))
        wf = wf.toSeq.map { case (syms, f) => (foldMerge(syms, a, b), f) }
          .groupBy(_._1).map { case (k, g) => k -> g.map(_._2).sum }
        i += 1
      }
    }
    out.result()
  }
  private def foldMerge(syms: Vector[String], a: String, b: String): Vector[String] =
    syms.foldLeft(Vector.empty[String]) { (acc, s) =>
      if (acc.nonEmpty && acc.last == a && s == b) acc.init :+ (a + b)
      else acc :+ s
    }

  private val corpus = Seq(
    "low low low low low lower lower newest newest newest newest newest newest",
    "widest widest widest new new low",
    "the cat sat on the mat the cat")

  test("wordFreq counts lowercased whitespace tokens") {
    val wf = Tokenize.wordFreq(corpus.toDF("text"), "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wf("low") == 6L && wf("newest") == 6L && wf("the") == 3L && wf("new") == 2L)
  }

  test("charPairCounts matches a hand count and orders (cnt desc, pair asc)") {
    val wf = Tokenize.wordFreq(corpus.toDF("text"), "text")
    val got = Tokenize.charPairCounts(wf, 5)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // hand: 'es'/'st' appear in newest(6)+widest(3)=9; 'we' in lower(2)+newest(6)+... etc.
    val all = corpus.flatMap(_.toLowerCase.split("\\s+")).filter(_.nonEmpty)
      .flatMap(w => w.sliding(2).filter(_.length == 2))
      .groupBy(identity).map { case (p, g) => (p, g.size.toLong) }
    val expectTop = all.toSeq.sortBy { case (p, c) => (-c, p) }.take(5)
    assert(got.toSeq == expectTop)
  }

  test("applyMerge folds greedily left-to-right without overlap") {
    val df = Seq((Seq("a", "a", "a"), 1L), (Seq("a", "b", "a", "b"), 2L))
      .toDF("syms", "f")
    val m = Tokenize.applyMerge(df, "a", "a")
      .collect().map(r => r.getSeq[String](0)).toSet
    assert(m.contains(Seq("aa", "a")))
    val m2 = Tokenize.applyMerge(df, "a", "b")
      .collect().map(r => r.getSeq[String](0)).toSet
    assert(m2.contains(Seq("ab", "ab")))
  }

  test("bpeTrain reproduces the reference trainer's merge sequence") {
    val got = Tokenize.bpeTrain(corpus.toDF("text"), "text", nMerges = 8)
      .map(m => (m.a, m.b, m.cnt))
    val want = refTrain(corpus, 8)
    assert(got == want)
    // the canonical Sennrich toy outcome: 'es' then 'est' dominate
    assert(got.head._3 >= got(1)._3)
  }

  test("encode applies the merge chain like the reference tokenizer") {
    val df = corpus.toDF("text").withColumn("doc_id",
      monotonically_increasing_id())
    val merges = Tokenize.bpeTrain(df, "text", nMerges = 6)
    val got = Tokenize.encode(df, "doc_id", "text",
        merges).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // driver reference: fold each word through the same merges
    val refMerges = merges.map(m => (m.a, m.b))
    def tokWord(w: String): Int =
      refMerges.foldLeft(w.map(_.toString).toVector) { case (syms, (a, b)) =>
        foldMerge(syms, a, b)
      }.size
    val ids = df.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    for ((id, text) <- ids) {
      val ws = text.toLowerCase.split("[ \t\n\r]+").filter(_.nonEmpty)
      assert(got(id) == ((ws.length.toLong, ws.map(tokWord).sum.toLong)),
        s"doc $id")
    }
    // merges strictly reduce (or preserve) token counts vs raw chars
    val raw = ids.map { case (_, t) =>
      t.toLowerCase.split("[ \t\n\r]+").filter(_.nonEmpty).map(_.length).sum }.sum
    assert(got.values.map(_._2).sum < raw)
  }

  test("bpeTrain is partitioning-invariant and stops when no pairs remain") {
    val tiny = Seq("a b c").toDF("text")
    // single-char words only -> zero pairs -> empty merge list
    assert(Tokenize.bpeTrain(tiny, "text", 3).isEmpty)
    val df = corpus.toDF("text")
    val a = Tokenize.bpeTrain(df.repartition(7), "text", 4)
    val b = Tokenize.bpeTrain(df.coalesce(1), "text", 4)
    assert(a == b)
  }
}
