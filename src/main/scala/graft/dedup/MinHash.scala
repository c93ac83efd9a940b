package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.text.TextAnalysis

/**
 * MinHash + LSH near-duplicate detection:
 * shingle → k minhashes → b bands of r rows → band-bucket join → verify.
 *
 * Two hash families:
 *  - [[signatures]]: xxhash64(i, shingle) — fast 64-bit numeric minhash for
 *    production runs;
 *  - [[md5Signatures]]: lexicographic min of md5(i || '|' || shingle) hex —
 *    byte-identical in any engine with md5 (used by the DuckDB-checked
 *    oracle queries; slower, same statistics).
 *
 * Candidate pairs never come from a cross join: documents sharing a band
 * signature land in the same bucket, pairs are generated per bucket, then
 * verified by estimated Jaccard = fraction of equal minhash components.
 */
object MinHash {

  /** Distinct (id, sh) shingle rows with normalization hoisted into a
   * projection (inside the shingle lambda it re-executes per element). */
  private def shingleRows(docs: DataFrame, n: Int, id: String, text: String): DataFrame =
    docs.select(col(id), TextAnalysis.normalizeForShingles(col(text)).as("__t"))
      .select(col(id), explode(TextAnalysis.rawShingles(col("__t"), n)).as("sh"))
      .distinct()

  /** (id, sig: array<long>) — k numeric minhashes over char n-gram shingles. */
  def signatures(docs: DataFrame, k: Int = 128, n: Int = 5,
                 id: String = "doc_id", text: String = "text"): DataFrame = {
    val sh = shingleRows(docs, n, id, text)
    val minhashes = (0 until k).map(i => min(xxhash64(lit(i), col("sh"))).as(s"h$i"))
    sh.groupBy(id).agg(minhashes.head, minhashes.tail: _*)
      .select(col(id), array((0 until k).map(i => col(s"h$i")): _*).as("sig"))
  }

  /** Candidate pairs from banding: b bands of r rows (k = b*r); pair emitted
   * once if ANY band matches. Bucket size capped to avoid quadratic blowup
   * on degenerate buckets (cap hits are counted upstream, not silent). */
  def candidatePairs(sigs: DataFrame, bands: Int, rows: Int,
                     id: String = "doc_id", maxBucket: Int = 2000): DataFrame = {
    val banded = sigs.select(col(id), posexplode(
      array((0 until bands).map(b =>
        xxhash64(concat_ws(",", (0 until rows).map(r => col("sig")(b * rows + r).cast("string")): _*))): _*))
      .as(Seq("band", "bkey")))
    val buckets = banded.groupBy("band", "bkey").agg(count(lit(1)).as("bn"))
      .filter(col("bn") <= maxBucket && col("bn") > 1)
    val inBucket = banded.join(buckets, Seq("band", "bkey"), "left_semi")
    inBucket.select(col("band"), col("bkey"), col(id).as("id_a"))
      .join(inBucket.select(col("band"), col("bkey"), col(id).as("id_b")), Seq("band", "bkey"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** End-to-end: near-dup pairs with estimated Jaccard ≥ threshold. */
  def nearDupPairs(docs: DataFrame, k: Int = 128, bands: Int = 32, n: Int = 5,
                   threshold: Double = 0.7,
                   id: String = "doc_id", text: String = "text"): DataFrame = {
    require(k % bands == 0, "k must be divisible by bands")
    val rows = k / bands
    val sigs = signatures(docs, k, n, id, text).persist(StorageLevel.MEMORY_AND_DISK)
    val pairs = candidatePairs(sigs, bands, rows, id)
    val withA = pairs.join(sigs.select(col(id).as("id_a"), col("sig").as("sig_a")), "id_a")
    val withB = withA.join(sigs.select(col(id).as("id_b"), col("sig").as("sig_b")), "id_b")
    withB.select(col("id_a"), col("id_b"),
      (size(filter(zip_with(col("sig_a"), col("sig_b"), (a, b) => a === b),
        x => x)).cast("double") / lit(k)).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
  }

  /**
   * Incremental (recrawl) near-dup detection: pairs between a NEW document
   * batch and an already-signed corpus, plus within the new batch — old×old
   * pairs are NEVER regenerated. This is the production shape: a pipeline
   * persists the signature store (id, sig), not the text, and each crawl
   * increment only pays O(new) signature computation plus the bucket joins
   * its own bands touch. `oldSigs` must come from the same (k, shingle-n,
   * hash-family) configuration.
   *
   * Pair orientation: id_a is always from the new batch; for new×new pairs
   * id_a < id_b (emitted once). Banding is complete (a pair with any equal
   * band is a candidate) up to `maxBucket`, as in [[candidatePairs]].
   *
   * Pass `k` (the signature width both stores were signed with) whenever
   * the caller knows it — it always does in the production shape, since it
   * configured the signing. With `k = 0` the width is derived from a
   * one-row probe of the store, and when the store is an unmaterialized
   * signing plan (as in the verify harness, which rebuilds it in-query)
   * that probe costs a FULL extra signature pass over the old corpus
   * before the real one (measured: the round-3 q_dedup_incremental ran
   * 12-13 s cold vs ~6 s with the probe eliminated).
   */
  def incrementalNearDupPairs(oldSigs: DataFrame, newSigs: DataFrame,
                              bands: Int, threshold: Double,
                              id: String = "doc_id",
                              maxBucket: Int = 2000,
                              k: Int = 0): DataFrame = {
    require(k >= 0, s"k must be >= 0 (0 = derive by probe), got $k")
    val rowsOpt =
      if (k > 0) {
        require(k % bands == 0, s"k=$k must be divisible by bands=$bands")
        Some(k / bands)
      } else bandRows(oldSigs, newSigs, bands)
    if (rowsOpt.isEmpty)
      // both stores empty (first-ever increment with nothing crawled): no
      // pairs by definition — typed empty frame instead of a .head crash
      return newSigs.select(col(id).as("id_a"), col(id).as("id_b"),
        lit(0.0).as("est_jaccard")).limit(0)
    val rows = rowsOpt.get
    val kk = bands * rows
    val all = oldSigs.select(col(id), col("sig"), lit(false).as("is_new"))
      .unionByName(newSigs.select(col(id), col("sig"), lit(true).as("is_new")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val banded = all.select(col(id), col("is_new"), posexplode(
      array((0 until bands).map(b =>
        xxhash64(concat_ws(",", (0 until rows).map(r =>
          col("sig")(b * rows + r).cast("string")): _*))): _*))
      .as(Seq("band", "bkey")))
    val buckets = banded.groupBy("band", "bkey").agg(count(lit(1)).as("bn"))
      .filter(col("bn") <= maxBucket && col("bn") > 1)
    val inBucket = banded.join(buckets, Seq("band", "bkey"), "left_semi")
    // probe from the new side only: old×old never meets
    val cand = inBucket.filter(col("is_new"))
      .select(col("band"), col("bkey"), col(id).as("id_a"))
      .join(inBucket.select(col("band"), col("bkey"), col(id).as("id_b"),
        col("is_new").as("__bn")), Seq("band", "bkey"))
      .filter(col("id_a") =!= col("id_b") && (!col("__bn") || col("id_a") < col("id_b")))
      .select("id_a", "id_b").distinct()
    val withA = cand.join(all.select(col(id).as("id_a"), col("sig").as("sig_a")), "id_a")
    val withB = withA.join(all.select(col(id).as("id_b"), col("sig").as("sig_b")), "id_b")
    withB.select(col("id_a"), col("id_b"),
      (size(filter(zip_with(col("sig_a"), col("sig_b"), (a, b) => a === b),
        x => x)).cast("double") / lit(kk)).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
  }

  /** k/bands from a one-row probe (both stores must agree on k);
   * None when both stores are empty. Fallback path — see the `k`
   * parameter of [[incrementalNearDupPairs]] for why callers that know
   * the width should pass it. */
  private def bandRows(oldSigs: DataFrame, newSigs: DataFrame, bands: Int): Option[Int] = {
    // array<...> length is not in the schema; contract: caller guarantees
    // equal k. Derive rows from a one-row probe of the old store.
    val k = oldSigs.select(size(col("sig"))).limit(1).collect()
      .headOption.map(_.getInt(0))
      .orElse(newSigs.select(size(col("sig"))).limit(1).collect()
        .headOption.map(_.getInt(0)))
    k.map { kk =>
      require(kk % bands == 0, s"k=$kk must be divisible by bands=$bands")
      kk / bands
    }
  }

  /** Cross-engine-exact md5 variant: (id, sig: array<string>). Used by the
   * DuckDB-checked oracle query — min is lexicographic over hex strings,
   * identical in Spark and DuckDB. */
  def md5Signatures(docs: DataFrame, k: Int, n: Int,
                    id: String = "doc_id", text: String = "text"): DataFrame = {
    val sh = shingleRows(docs, n, id, text)
    val minhashes = (0 until k).map(i =>
      min(md5(concat(lit(i.toString), lit("|"), col("sh")))).as(s"h$i"))
    sh.groupBy(id).agg(minhashes.head, minhashes.tail: _*)
      .select(col(id), array((0 until k).map(i => col(s"h$i")): _*).as("sig"))
  }
}
