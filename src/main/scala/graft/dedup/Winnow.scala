package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.text.TextAnalysis

/**
 * Winnowing document fingerprints (Schleimer, Wilkerson, Aiken, "Winnowing:
 * Local Algorithms for Document Fingerprinting", SIGMOD 2003 — the MOSS
 * algorithm; public). Selects, from every window of `w` consecutive k-gram
 * hashes, the minimum hash (ties to the RIGHTMOST position — the paper's
 * "robust winnowing", which makes the selected set a deterministic function
 * of the content). Guarantees: any shared substring of length ≥ w + k − 1
 * yields a shared fingerprint (no false negatives at that match scale), and
 * fingerprint density is ~2/(w+1) of positions — the LOCAL-selection
 * property that makes the scheme usable for partial-overlap detection where
 * MinHash (whole-document resemblance, [[MinHash]]) and the rolling-hash
 * modulo sampler ([[graft.text.TextAnalysis]] fingerprint) are not.
 *
 * Extends the reference's analytics surface like the rest of the dedup
 * family (the reference under `/root/reference/src` is a native graph
 * engine with no text ops).
 *
 * Scale shape: ONE narrow codegen'd pass — normalization and the gram-hash
 * array are pre-projected attributes (the O(L²) lambda-nesting trap
 * documented at [[TextAnalysis.normalizeForShingles]]), window selection is
 * per-document array work, and no shuffle happens at all until a caller
 * aggregates the emitted (doc, pos, fp) rows. Per-doc cost O(L·w); at
 * 10^12 documents the pass is embarrassingly parallel with zero exchange.
 *
 * Cross-engine determinism: the gram hash is the md5 hex STRING (the
 * [[MinHash.md5Signatures]] device) — lexicographic min is byte-identical
 * in any engine with md5, no numeric-overflow caveats.
 */
object Winnow {

  /**
   * Distinct selected fingerprints `(id, pos, fp)`: `pos` is the 1-based
   * gram position in the whitespace-normalized text, `fp` the md5 hex of
   * the k-gram starting there. Documents shorter than `k` normalized chars
   * emit nothing; documents with fewer than `w` grams winnow their single
   * short window (the whole document).
   */
  def fingerprints(docs: DataFrame, k: Int = 8, w: Int = 4,
                   id: String = "doc_id", text: String = "text",
                   spread: Boolean = true): DataFrame = {
    require(k >= 1 && w >= 1, "k and w must be positive")
    // guard on the NORMALIZED length (hs nonempty ⟺ length ≥ k): a guard
    // on size(hs) would push below the projection and re-run the whole
    // md5-gram transform once more per row just to test emptiness.
    // `spread` key-repartitions before the CPU-heavy gram pass: the hash +
    // window fold is interpreted higher-order-function work (O(L·w) per
    // doc), and a compact parquet source can be a single row group = a
    // single task. One exchange of the normalized text buys full-core
    // parallelism; callers whose input is already well-partitioned (the
    // 10^12-doc path) pass spread = false.
    val normed = docs
      .select(col(id), TextAnalysis.normalizeForShingles(col(text)).as("__t"))
      .filter(length(col("__t")) >= k)
    // explicit partition count: a bare repartition(col) is AQE-coalescible
    // (bytes-tiny + CPU-heavy is exactly the shape AQE's advisory-size
    // heuristic gets wrong), a user-pinned count is not
    val cores = docs.sparkSession.sparkContext.defaultParallelism
    val grams = (if (spread) normed.repartition(cores, col(id)) else normed)
      .select(col(id), transform(TextAnalysis.rawShingles(col("__t"), k),
        s => md5(s)).as("hs"))
      .select(col(id), col("hs"), size(col("hs")).as("m"))
    // per window j (1-based): a left-to-right fold that keeps h <= acc.h,
    // so among equal hashes the LAST (rightmost) position wins — robust
    // winnowing. `hs`/`m` are attributes and `j`/`i` lambda variables, so
    // every read inside the nested lambdas is O(1) (no re-evaluation).
    val selected = transform(
      sequence(lit(1), greatest(col("m") - lit(w - 1), lit(1))),
      j => aggregate(
        sequence(j, least(j + lit(w - 1), col("m"))),
        struct(lit(null).cast("string").as("h"), lit(null).cast("long").as("p")),
        (acc, i) => {
          val h = element_at(col("hs"), i.cast("int"))
          when(acc.getField("h").isNull || h <= acc.getField("h"),
            struct(h.as("h"), i.cast("long").as("p"))).otherwise(acc)
        }))
    // the selected position is monotone non-decreasing as the window
    // slides (the rightmost-min can only stay or move right), so repeats
    // are ADJACENT runs — a linear keep-if-differs-from-predecessor pass
    // dedupes exactly. array_distinct on array<struct> would fall off
    // Spark's hash-set fast path (structs lack typeWithProperEquals) into
    // O(windows²) pairwise scans per document.
    // when/otherwise, not ||: OR operands are not guaranteed lazy under
    // codegen, and element_at(s, 0) (first window's "predecessor") throws
    val deduped = TextAnalysis.bindOnce(selected)(s =>
      filter(s, (x, i) => when(i === 0, lit(true))
        .otherwise(x.getField("p") =!= element_at(s, i).getField("p"))))
    grams
      .select(col(id), explode(deduped).as("__s"))
      .select(col(id), col("__s.p").as("pos"), col("__s.h").as("fp"))
  }
}
