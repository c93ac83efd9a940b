package graft

import org.apache.spark.sql.functions._
import graft.dedup.{Dedup, MinHash, SimHash}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy dog"),      // exact dup of 0
    (2L, "the quick brown fox jumped over the lazy dog"),     // near dup of 0
    (3L, "completely different content about spark engines"),
    (4L, "the quick brown fox jumps over the lazy cat"),      // near dup of 0
    (5L, "zzz qqq xxx unrelated noise tokens www yyy")
  ).toDF("doc_id", "text").cache()

  test("exact dedup keeps min id per identical text") {
    val kept = Dedup.dedupExact(docs).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L, 2L, 3L, 4L, 5L))
    val groups = Dedup.exactGroups(docs).filter(col("n_docs") > 1).collect()
    assert(groups.length == 1 && groups(0).getLong(2) == 0L)
  }

  test("ngram jaccard finds near-duplicate pairs above threshold only") {
    val pairs = Dedup.ngramJaccardPairs(docs, n = 4, threshold = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L))) // identical
    assert(pairs.contains((0L, 2L)) || pairs.contains((0L, 4L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("jaccard value is exact for identical docs") {
    val j = Dedup.ngramJaccardPairs(docs, n = 4, threshold = 0.5)
      .filter(col("id_a") === 0 && col("id_b") === 1)
      .collect()(0).getDouble(2)
    assert(j == 1.0)
  }

  test("minhash LSH finds the same near-dups as exact jaccard (high threshold)") {
    val pairs = MinHash.nearDupPairs(docs, k = 64, bands = 16, n = 4, threshold = 0.6)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("minhash estimated jaccard = 1 for identical docs") {
    val est = MinHash.nearDupPairs(docs, k = 64, bands = 16, n = 4, threshold = 0.6)
      .filter(col("id_a") === 0 && col("id_b") === 1)
      .collect()(0).getDouble(2)
    assert(est == 1.0)
  }

  test("incremental minhash: new-vs-all pairs exactly, old×old never emitted") {
    // new batch = even ids; expected = brute force over md5 signatures
    val isNew = col("doc_id") % 2 === 0
    val k = 8
    val oldSigs = MinHash.md5Signatures(docs.filter(!isNew), k, n = 4)
    val newSigs = MinHash.md5Signatures(docs.filter(isNew), k, n = 4)
    val got = MinHash.incrementalNearDupPairs(oldSigs, newSigs, bands = 4,
        threshold = 0.5, maxBucket = 1000000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    val sigs = MinHash.md5Signatures(docs, k, n = 4).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val expect = (for {
      a <- sigs.keys; b <- sigs.keys
      if a != b && a % 2 == 0 && (b % 2 == 1 || a < b)
      eqs = sigs(a).zip(sigs(b)).count { case (x, y) => x == y }
      if (0 until 4).exists(band =>
        sigs(a)(2 * band) == sigs(b)(2 * band) &&
        sigs(a)(2 * band + 1) == sigs(b)(2 * band + 1))
      est = eqs.toDouble / k if est >= 0.5
    } yield (a, b, est)).toSet
    assert(got == expect)
    assert(got.nonEmpty)                         // 0-1 exact dups cross the split
    assert(got.forall { case (a, _, _) => a % 2 == 0 })  // id_a always new
    // first-crawl path: empty old store degenerates to within-batch pairs
    val empty = oldSigs.limit(0)
    val first = MinHash.incrementalNearDupPairs(empty, newSigs, bands = 4,
        threshold = 0.5, maxBucket = 1000000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(first == expect.collect { case (a, b, _) if b % 2 == 0 => (a, b) })
  }

  test("simhash: identical docs at hamming 0; near dups within 10; unrelated far") {
    val fp = SimHash.fingerprints(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(0L) == fp(1L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(fp(0L), fp(2L)) < ham(fp(0L), fp(5L)))
    val pairs = SimHash.nearDupPairs(docs, maxDistance = 3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
  }

  test("groupsFromPairs groups transitive near-dups with min-id keeper") {
    val pairs = Seq((0L, 1L, 1.0), (1L, 2L, 0.9)).toDF("id_a", "id_b", "jaccard")
    val groups = Dedup.groupsFromPairs(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(groups(0L) == 0L && groups(1L) == 0L && groups(2L) == 0L)
  }

  test("nearDupClusters: transitive closure, singleton self-clusters, keeper flags") {
    // A~B and B~C but not A~C: one cluster via transitivity; 3 and 5 singletons
    val pairs = Seq((0L, 1L), (1L, 2L), (0L, 4L)).toDF("id_a", "id_b")
    val rows = Dedup.nearDupClusters(docs, pairs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(rows.size == 6)
    Seq(0L, 1L, 2L, 4L).foreach(d => assert(rows(d)._1 == 0L, s"doc $d"))
    assert(rows(3L) == (3L, true) && rows(5L) == (5L, true))
    assert(rows(0L)._2 && !rows(1L)._2 && !rows(2L)._2 && !rows(4L)._2)
  }

  test("dedupFuzzy keeps one representative per near-dup cluster") {
    // at threshold 0.5 docs 0/1/2/4 are mutual near-dups (q_ngram_jaccard
    // config); 3 and 5 are unrelated -> 3 survivors, min ids
    val kept = Dedup.dedupFuzzy(docs, n = 5, threshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L, 3L, 5L))
  }

  test("prefix-filtered jaccard equals the exhaustive all-pairs computation") {
    // exactness of the PPJoin-style candidate stage: same pair set and same
    // jaccard values as brute force on the real documents table
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val got = Dedup.ngramJaccardPairs(real, n = 5, threshold = 0.4)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val sh = real.select(col("doc_id"),
        explode(graft.text.TextAnalysis.shingles(col("text"), 5)).as("sh"))
      .distinct().collect().groupBy(_.getLong(0))
      .map { case (k, v) => k -> v.map(_.getString(1)).toSet }
    val ids = sh.keys.toSeq.sorted
    val want = (for {
      i <- ids.indices; j <- (i + 1) until ids.size
      a = sh(ids(i)); b = sh(ids(j))
      inter = (a & b).size
      jac = inter.toDouble / (a.size + b.size - inter) if jac >= 0.4
    } yield ((ids(i), ids(j)), jac)).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (k, v) => assert(math.abs(v - want(k)) < 1e-12, s"$k") }
    // both physical verify strategies (bitmap / string-array) are exact:
    // force the array path and compare
    val arr = Dedup.ngramJaccardPairs(real, n = 5, threshold = 0.4, bitmapMaxUniverse = 0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(arr.keySet == want.keySet)
    arr.foreach { case (k, v) => assert(math.abs(v - want(k)) < 1e-12, s"array path $k") }
  }

  test("banded md5 simhash pairs are complete for d <= bands-1 (vs brute force)") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val fp = SimHash.md5Fingerprints(real).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ids = fp.keys.toSeq.sorted
    val brute = (for {
      i <- ids.indices; j <- (i + 1) until ids.size
      h = java.lang.Long.bitCount(fp(ids(i)) ^ fp(ids(j))) if h <= 3
    } yield (ids(i), ids(j), h.toLong)).toSet
    val banded = SimHash.md5NearDupPairs(real, maxDistance = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(banded == brute)
  }

  test("nearDupPairs enforces the pigeonhole recall contract") {
    intercept[IllegalArgumentException] {
      SimHash.nearDupPairs(docs, maxDistance = 10) // needs bands >= 11
    }
    // and the generalized banding accepts a wide-distance query when bands allow
    val wide = SimHash.nearDupPairs(docs, maxDistance = 10, bands = 16)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(wide.contains((0L, 1L)))
  }

  test("works on the driver documents table") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val exact = Dedup.exactGroups(real, "doc_id", "text")
    assert(exact.count() > 0)
    val sh = SimHash.fingerprints(real, "doc_id", "text")
    assert(sh.count() == real.count())
  }

  test("incremental minhash: both stores empty returns an empty typed frame") {
    val none = MinHash.md5Signatures(docs, 8, n = 4).limit(0)
    val out = MinHash.incrementalNearDupPairs(none, none, bands = 4, threshold = 0.5)
    assert(out.columns.toSeq == Seq("id_a", "id_b", "est_jaccard"))
    assert(out.count() == 0)
  }
}
