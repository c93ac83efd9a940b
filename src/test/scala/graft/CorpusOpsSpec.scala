package graft

import org.apache.spark.sql.functions._
import graft.text.{Decontaminate, Privacy, UrlOps}
import graft.dedup.Dedup

class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  test("PII stats and redaction: counts, placeholders, ordering") {
    val df = Seq(
      (1L, "mail a.b+c@foo-bar.co.uk now, or call 555-123-4567; host 192.168.0.1."),
      (2L, "no pii here at all"),
      (3L, "two mails x@y.io and z@w.org, ip 10.0.0.255"),
      (4L, "dashed-but-not-phone 12-345-6789 and 1234-567-8901")).toDF("id", "text")
    val got = df.select(col("id"), Privacy.piiStats(col("text")).as("p"),
        Privacy.redactPii(col("text")).as("r"))
      .collect().map(r => r.getLong(0) ->
        ((r.getStruct(1).getLong(0), r.getStruct(1).getLong(1),
          r.getStruct(1).getLong(2)), r.getString(2))).toMap
    assert(got(1L)._1 == ((1L, 1L, 1L)))
    assert(got(1L)._2 == "mail <EMAIL> now, or call <PHONE>; host <IP>.")
    assert(got(2L)._1 == ((0L, 0L, 0L)) && got(2L)._2 == "no pii here at all")
    assert(got(3L)._1 == ((2L, 1L, 0L)))
    assert(got(3L)._2 == "two mails <EMAIL> and <EMAIL>, ip <IP>")
    // \b anchors: wrong-width dash groups are not phones
    assert(got(4L)._1._3 == 0L)
  }

  test("decontamination flags exactly the docs sharing a benchmark n-gram") {
    val docs = Seq(
      (0L, "alpha beta gamma delta"),     // benchmark
      (1L, "x y alpha beta gamma z"),     // shares 3-gram "alpha beta gamma"
      (2L, "beta gamma alpha"),           // same words, no shared 3-gram
      (3L, "totally different words here")).toDF("doc_id", "text")
    val bench = docs.filter(col("doc_id") === 0L)
    def run(bcast: Boolean) =
      Decontaminate.flagContaminated(docs, bench, "doc_id", "text", 3, bcast)
        .select("doc_id", "contaminated").collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val expected = Map(0L -> true, 1L -> true, 2L -> false, 3L -> false)
    assert(run(bcast = true) == expected)
    assert(run(bcast = false) == expected) // broadcast is a perf knob only
  }

  test("flagContaminated keeps the id when the caller's idCol is itself 'id'") {
    // drop("id") by name would remove BOTH sides' id columns after the join
    val docs = Seq((0L, "alpha beta gamma delta"), (1L, "zz yy xx ww"))
      .toDF("id", "text")
    val bench = docs.filter(col("id") === 0L)
    val out = Decontaminate.flagContaminated(docs, bench, "id", "text", 3)
    assert(out.columns.toSeq == Seq("id", "text", "contaminated"))
    val m = out.collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(m == Map(0L -> true, 1L -> false))
  }

  test("url normalization: case, fragments, default ports, root slash") {
    val cases = Seq(
      "HTTPS://WWW.Example.COM/Path/File?Q=Mixed#Frag" ->
        "https://www.example.com/Path/File?Q=Mixed",
      "http://a.com:80/x" -> "http://a.com/x",
      "https://a.com:443/x" -> "https://a.com/x",
      "https://a.com:8443/x" -> "https://a.com:8443/x", // non-default kept
      "http://a.com:443/x" -> "http://a.com:443/x",     // wrong-scheme port kept
      "https://a.com/" -> "https://a.com",
      "https://a.com:8443/" -> "https://a.com:8443",
      "https://a.com" -> "https://a.com",
      "https://a.com/#top" -> "https://a.com")
    val got = cases.map(_._1).toDF("u")
      .select(UrlOps.normalizeUrl(col("u"))).collect().map(_.getString(0))
    cases.map(_._2).zip(got).foreach { case (e, g) => assert(g == e, s"$g vs $e") }
  }

  test("latest snapshot keeps the max-ts row per normalized url, ties by id") {
    val pages = Seq(
      (1L, "https://A.com/p#x", 10L, "v1"),
      (2L, "https://a.com/p", 30L, "v3"),      // winner for a.com/p
      (3L, "https://a.COM:443/p#y", 20L, "v2"),
      (4L, "https://b.com/q", 5L, "w1"),
      (5L, "https://b.com/q#z", 5L, "w2"))     // ts tie -> max id wins
      .toDF("doc_id", "url", "warc_ts", "payload")
    val got = UrlOps.latestSnapshot(pages, "url", "warc_ts", "doc_id")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getString(4)))).toMap
    assert(got == Map(
      "https://a.com/p" -> ((2L, "v3")),
      "https://b.com/q" -> ((5L, "w2"))))
  }

  test("weighted/stratified sampling: deterministic, floor-thresholded, stratum rates") {
    import graft.text.Curation
    val df = (0L until 2000L).map(i => (i, s"src${i % 4}")).toDF("id", "source")
    // weight 1.0 keeps everything, 0.0 keeps nothing
    assert(Curation.sampleByWeight(df, col("id"), lit(1.0)).count() == 2000)
    assert(Curation.sampleByWeight(df, col("id"), lit(0.0)).count() == 0)
    // per-row weight agrees with constant-fraction hashSample on each stratum
    val strat = Curation.stratifiedSample(df, col("source"), col("id"),
      Map("src0" -> 1.0, "src1" -> 0.5), default = 0.25)
    val bySrc = strat.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("src0") == 500)
    def expect(src: String, f: Double) =
      Curation.hashSample(df.filter(col("source") === src), col("id"), f)
        .count()
    assert(bySrc("src1") == expect("src1", 0.5))
    assert(bySrc.getOrElse("src2", 0L) == expect("src2", 0.25))
    assert(bySrc.getOrElse("src3", 0L) == expect("src3", 0.25))
    // deterministic: same ids survive under different partitioning
    val a = strat.select("id").collect().map(_.getLong(0)).toSet
    val b = Curation.stratifiedSample(df.repartition(13), col("source"),
      col("id"), Map("src0" -> 1.0, "src1" -> 0.5), default = 0.25)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("paragraph dedup keeps the globally first occurrence and reassembles in order") {
    val docs = Seq(
      (1L, "boiler\nunique one\nboiler"),   // in-doc repeat also deduped
      (2L, "unique two\nboiler"),           // boiler first seen in doc 1
      (3L, "boiler"),                       // fully deduplicated
      (4L, " \n\nunique four\n ")).toDF("doc_id", "text") // blank paras dropped
    val got = Dedup.dedupParagraphs(docs).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got == Map(
      1L -> (("boiler\nunique one", 2L)),
      2L -> (("unique two", 1L)),
      3L -> (("", 0L)),
      4L -> (("unique four", 1L))))
  }

  test("substring dedup removes every non-first duplicated token window") {
    val docs = Seq(
      (0L, "A B C D E x y z"),        // winner of "a b c d e" (lowercased)
      (1L, "p q a b c d e r"),        // loser at s=3 -> removes tokens 3..7
      (2L, "m n o m n o m n o m n o"),// in-doc period-3 repeats
      (3L, ""),                       // no tokens
      (4L, "a b c d e")               // fully removed (loser of doc 0)
    ).toDF("doc_id", "text")
    val got = Dedup.dedupSubstrings(docs, n = 5).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got == Map(
      0L -> ((8L, 0L, "a b c d e x y z")),
      1L -> ((8L, 5L, "p q r")),
      // windows repeat with period 3: losers at s=4..8 cover positions
      // 4..12, only the first period survives
      2L -> ((12L, 9L, "m n o")),
      3L -> ((0L, 0L, "")),
      4L -> ((5L, 5L, ""))))
    // deterministic under different physical partitioning
    val again = Dedup.dedupSubstrings(docs.repartition(7), n = 5).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(again == got)
  }

  test("resolveRedirects: chains, branches into cycles, long-chain doubling") {
    // a→b→c→d (terminal), e→c (merging chain), x↔y (2-cycle), z→x (enters
    // the cycle), lone urls resolve to themselves
    val edges = Seq(
      ("a", "b"), ("b", "c"), ("c", "d"), ("e", "c"),
      ("x", "y"), ("y", "x"), ("z", "x")).toDF("src_url", "dst_url")
    val urls = Seq("a", "b", "c", "d", "e", "x", "y", "z", "solo").toDF("url")
    val got = UrlOps.resolveRedirects(edges, urls, doublings = 3)
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got("a") == (("d", 3L, true)))
    assert(got("b") == (("d", 2L, true)))
    assert(got("c") == (("d", 1L, true)))
    assert(got("d") == (("d", 0L, true)))
    assert(got("e") == (("d", 2L, true)))
    assert(got("solo") == (("solo", 0L, true)))
    // cycle members and anyone whose chain enters one: canonical unresolved
    Seq("x", "y", "z").foreach(u => assert(got(u) == ((u, -1L, false)), u))

    // a 20-hop chain: doublings=5 (reach 2^5-1 = 31) resolves every
    // position with its TRUE distance to the terminal (doubling only adds
    // spans where a jump exists, so hops are exact, not walked-rounds)
    val long = (0 until 20).map(i => (s"n$i", s"n${i + 1}")).toDF("src_url", "dst_url")
    val lu = (0 to 20).map(i => s"n$i").toDF("url")
    val deep = UrlOps.resolveRedirects(long, lu, doublings = 5)
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getLong(2)))).toMap
    (0 to 20).foreach { i =>
      assert(deep(s"n$i") == (("n20", (20 - i).toLong)), s"n$i")
    }
    // duplicate src edges: min(dst) wins deterministically
    val dup = Seq(("p", "q"), ("p", "b2")).toDF("src_url", "dst_url")
    val pd = UrlOps.resolveRedirects(dup, Seq("p").toDF("url"), doublings = 2)
      .collect()(0)
    assert(pd.getString(1) == "b2" && pd.getLong(2) == 1L)
  }

  test("suffixBlock: label-boundary suffixes, longest match, case folding") {
    val hosts = Seq(
      (1L, "A.B.Example.ORG"),   // blocked by example.org AND b.example.org
      (2L, "example.org"),       // exact entry
      (3L, "notexample.org"),    // NOT blocked: label boundary
      (4L, "b.example.com"),     // sibling TLD, unblocked
      (5L, "x.y.ads.net"))       // blocked by the TLD-less suffix ads.net
      .toDF("doc_id", "host")
    val bl = Seq("Example.org", "b.example.org", "ads.net").toDF("suffix")
    val got = UrlOps.suffixBlock(hosts, col("doc_id"), col("host"), bl)
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(2), Option(r.getString(3))))).toMap
    assert(got == Map(
      1L -> ((true, Some("b.example.org"))),  // longest of the nested matches
      2L -> ((true, Some("example.org"))),
      3L -> ((false, None)),
      4L -> ((false, None)),
      5L -> ((true, Some("ads.net")))))
  }
}
