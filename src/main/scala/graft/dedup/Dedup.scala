package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.text.TextAnalysis

/**
 * Deduplication operators for web-scale training-data pipelines: exact,
 * character-n-gram Jaccard, MinHash+LSH, SimHash, embedding-cosine near-dup.
 *
 * Shared conventions: input is a documents table with an id column and a
 * text column; "pair" outputs are (id_a, id_b, score) with id_a < id_b;
 * "dedup" outputs keep the minimum id per duplicate group (deterministic
 * keeper). Everything is shuffle-bounded: candidate generation always goes
 * through a bucket-join (hash, band, or plane signature), never a cross
 * join, so cost is O(Σ bucket²) with explicitly capped bucket sizes.
 */
object Dedup {

  /** Exact duplicate groups by content hash: (hash, n_docs, keeper). */
  def exactGroups(docs: DataFrame, id: String = "doc_id", text: String = "text"): DataFrame =
    docs.groupBy(md5(col(text)).as("hash"))
      .agg(count(lit(1)).as("n_docs"), min(col(id)).as("keeper"))

  /** Exact dedup: one row per distinct text, the minimum id survives. */
  def dedupExact(docs: DataFrame, id: String = "doc_id", text: String = "text"): DataFrame = {
    val keepers = exactGroups(docs, id, text).select(col("keeper").as(id))
    docs.join(keepers, Seq(id), "left_semi")
  }

  /**
   * Character n-gram Jaccard similarity, EXACT, via prefix filtering
   * (Chaudhuri et al. SSJoin / Xiao et al. PPJoin): J = |A∩B| / |A∪B| over
   * DISTINCT shingle sets.
   *
   * Candidate generation: order every document's shingles by global
   * (frequency, shingle) — rarest first — and emit only the PREFIX of
   * length |A| - ⌈t·|A|⌉ + 1. Two sets with J ≥ t must share a prefix
   * shingle under any consistent total order (if all prefix shingles were
   * disjoint, the overlap would be too small), so recall is 100%. Because
   * hot stopword-shingles sort LAST they almost never enter a prefix —
   * this is what kills the O(Σ freq²)-pairs blowup of a naive
   * shared-shingle join at web scale. Candidates are then verified with
   * the exact intersection over the full (sorted-array) shingle sets.
   *
   * `maxShingleFreq` remains a candidate-stage safety cap (a pair whose
   * ONLY shared prefix shingle is hotter than the cap is dropped); at
   * verify scale it never binds, so the DuckDB oracle (exhaustive join)
   * still matches exactly.
   */
  def ngramJaccardPairs(docs: DataFrame, n: Int = 5, threshold: Double = 0.7,
                        maxShingleFreq: Int = 1000,
                        id: String = "doc_id", text: String = "text",
                        bitmapMaxUniverse: Long = BitmapMaxUniverse): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // normalization hoisted into a projection: nested in the shingle lambda
    // it would re-execute per array element (O(L²) per document).
    // Dedup is PER DOCUMENT, so array_distinct BEFORE the explode does it
    // as a narrow per-row pass — a global .distinct() here shuffled the
    // full pre-dedup corpus (O(Σ L) rows) for nothing (measured: the
    // largest single stage of the join at sf0.1)
    val sh = docs.select(col(id), TextAnalysis.normalizeForShingles(col(text)).as("__t"))
      .select(col(id),
        explode_outer(array_distinct(TextAnalysis.rawShingles(col("__t"), n))).as("sh"))
      .filter(col("sh").isNotNull)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val freq = sh.groupBy("sh").agg(count(lit(1)).as("f"))
    // per-document rank in global (f, sh) order; window is per-doc (bounded
    // by document length), not global
    val ranked = sh.join(freq, "sh")
      .withColumn("r", row_number().over(Window.partitionBy(id).orderBy(col("f"), col("sh"))))
    val sizes = sh.groupBy(id).agg(count(lit(1)).as("sz"))
    val prefix = ranked.join(sizes, id)
      .filter(col("r") <= col("sz") - ceil(lit(threshold) * col("sz")) + 1)
      .filter(col("f") <= maxShingleFreq)
    // PPJoin POSITIONAL filter (Xiao et al.), applied per joined row BEFORE
    // the distinct: a shared prefix shingle at ranks (ra, rb) bounds the
    // overlap by 1 + min(|A|-ra, |B|-rb) (everything shared sorts at or
    // after it), and J ≥ t needs overlap ≥ t/(1+t)·(|A|+|B|). For the FIRST
    // common shingle the bound ≥ the true overlap, so no qualifying pair is
    // lost — but corpus-wide stopword-ish shingles (late ranks everywhere)
    // stop producing candidates, which is what kills the near-all-pairs
    // blowup on vocabulary-heavy corpora.
    val alpha = lit(threshold / (1.0 + threshold))
    val cand = prefix.select(col(id).as("ia"), col("sh"), col("r").as("ra"), col("sz").as("na"))
      .join(prefix.select(col(id).as("ib"), col("sh"), col("r").as("rb"), col("sz").as("nb")), "sh")
      .filter(col("ia") < col("ib"))
      // LENGTH filter (safe: J = |∩|/|∪| ≤ min(|A|,|B|)/max(|A|,|B|), so
      // J ≥ t forces the set sizes within a factor t of each other) —
      // prunes before the positional bound on corpora where prefix
      // selectivity is weak (vocabulary-limited: everyone shares prefixes)
      .filter(least(col("na"), col("nb")) + lit(1e-9)
        >= lit(threshold) * greatest(col("na"), col("nb")))
      .filter(lit(1) + least(col("na") - col("ra"), col("nb") - col("rb")) + lit(1e-9)
        >= alpha * (col("na") + col("nb")))
      .select("ia", "ib").distinct()
    // verify: exact |A∩B| on the candidates only. Two physical strategies,
    // same exact semantics (an AQE-style adaptive choice):
    //  - small shingle UNIVERSE (vocabulary-limited corpora — where, notably,
    //    candidate pruning is weakest and candidate counts largest): encode
    //    each doc's set as a fixed-width bitmap over dense shingle ids;
    //    |A∩B| = Σ bit_count(a & b) via zip_with — pure codegen'd integer
    //    ops, ~50× cheaper per pair than hashing string arrays;
    //  - huge universe (real web text): per-pair array_intersect on the
    //    string sets (candidates are few there — discriminative shingles
    //    make the prefix filter selective).
    val universe = freq.count()
    if (universe <= bitmapMaxUniverse) {
      val width = ((universe + 63) / 64).toInt
      val sid = sh.join(
        graft.core.Ranking.globalRank(freq.select("sh"), Seq(col("sh")), "sid", buckets = 32),
        "sh").select(col(id), col("sid"))
      // bitmap build via the BitmapOr typed aggregate: O(1) per shingle
      // row into one mutable width-long buffer. The former declarative
      // fold (collect_list + aggregate-with-transform) copied the whole
      // accumulator array per element — O(setSize × width) churn per doc,
      // a GCLocker OOM at the bench 10× corpus (width grows with the
      // universe, so the fold was effectively quadratic in corpus scale).
      val bm = sid.groupBy(id).agg(count(lit(1)).as("sz"),
        graft.functions.BitmapOr.agg(col("sid"), width).as("bm"))
      cand
        .join(bm.select(col(id).as("ia"), col("bm").as("ba"), col("sz").as("na")), "ia")
        .join(bm.select(col(id).as("ib"), col("bm").as("bb"), col("sz").as("nb")), "ib")
        .withColumn("inter",
          expr("aggregate(zip_with(ba, bb, (x, y) -> bit_count(x & y)), 0, (acc, v) -> acc + v)"))
        .select(col("ia").as("id_a"), col("ib").as("id_b"),
          (col("inter").cast("double") / (col("na") + col("nb") - col("inter"))).as("jaccard"))
        .filter(col("jaccard") >= threshold)
    } else {
      val sets = sh.groupBy(id).agg(collect_list("sh").as("set"), count(lit(1)).as("sz"))
      cand
        .join(sets.select(col(id).as("ia"), col("set").as("sa"), col("sz").as("na")), "ia")
        .join(sets.select(col(id).as("ib"), col("set").as("sb"), col("sz").as("nb")), "ib")
        // one intersection per candidate: a single-select formula would
        // evaluate array_intersect twice per row (codegen subexpression
        // elimination is not guaranteed across a projection's outputs)
        .select(col("ia"), col("ib"), col("na"), col("nb"),
          size(array_intersect(col("sa"), col("sb"))).cast("double").as("inter"))
        .select(col("ia").as("id_a"), col("ib").as("id_b"),
          (col("inter") / (col("na") + col("nb") - col("inter"))).as("jaccard"))
        .filter(col("jaccard") >= threshold)
    }
  }

  /** Universe cap for the bitmap verify path: 2^18 ids = 4 KiB/doc bitmap.
   * Vocabulary-limited corpora are exactly where candidate pruning is
   * weakest and candidate counts largest, and there the AND-popcount scan
   * (≤ 4096 long words/pair) stays far cheaper than hashing string arrays
   * — measured on the bench 10× leg: forcing the string path at a 20k
   * universe made the verify 2-3× SLOWER despite the smaller per-pair
   * footprint. The build side is the O(1)/row [[graft.functions.BitmapOr]]
   * aggregate, so the only width-proportional cost left is the per-pair
   * scan. The switch is execution-only: both paths produce identical
   * pairs. */
  final val BitmapMaxUniverse = 1L << 18

  /** Near-duplicate groups from a pair table: connected components over the
   * pair graph (HashMin), then keeper = min id per group. */
  def groupsFromPairs(pairs: DataFrame): DataFrame = {
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
    graft.alg.ConnectedComponents.run(edges).components
      .select(col("vid").as("doc_id"), col("component").as("group_id"))
  }

  /**
   * Full-corpus near-duplicate clustering — the canonicalization stage of a
   * fuzzy-dedup pipeline (pairs → transitive closure → one keeper per
   * cluster): every document gets a cluster id = the minimum doc id of its
   * connected component in the near-dup pair graph (HashMin WCC, so the
   * cluster id IS the keeper id); documents in no pair are their own
   * singleton cluster. `pairs` can come from ANY candidate generator
   * ([[ngramJaccardPairs]], MinHash LSH band pairs, SimHash banded pairs,
   * embedding-cosine pairs) — the contract is just (id_a, id_b).
   *
   * Returns (id, cluster, is_keeper). Scale shape: the pair graph is tiny
   * relative to the corpus (near-dup rate ≪ 1), so the WCC runs on the
   * pairs only and the corpus joins in once at the end — no per-superstep
   * touch of the full document table.
   */
  def nearDupClusters(docs: DataFrame, pairs: DataFrame,
                      id: String = "doc_id"): DataFrame = {
    // materialize the candidate pairs ONCE: the WCC consumes its edge table
    // several times (adjacency build, degrees), and re-running an expensive
    // candidate generator (PPJoin, LSH banding) per consumer is exactly the
    // recompute a 100 TB pipeline cannot afford
    val edges = graft.core.Lineage.cut(
      pairs.select(col("id_a").as("src"), col("id_b").as("dst")))
    val comp = graft.alg.ConnectedComponents.run(edges).components
    docs.select(col(id))
      .join(comp.select(col("vid").as(id), col("component")), Seq(id), "left")
      .select(col(id),
        coalesce(col("component"), col(id)).as("cluster"))
      .withColumn("is_keeper", col(id) === col("cluster"))
  }

  /** End-to-end fuzzy dedup: n-gram-Jaccard candidate pairs at `threshold`
   * → [[nearDupClusters]] → keep only each cluster's keeper row. */
  def dedupFuzzy(docs: DataFrame, n: Int = 5, threshold: Double = 0.7,
                 maxShingleFreq: Int = 1000,
                 id: String = "doc_id", text: String = "text"): DataFrame = {
    val pairs = ngramJaccardPairs(docs, n, threshold, maxShingleFreq, id, text)
    val keepers = nearDupClusters(docs, pairs, id)
      .filter(col("is_keeper")).select(col(id))
    docs.join(keepers, Seq(id), "left_semi")
  }

  /**
   * CORPUS-LEVEL paragraph dedup (CCNet-style, Wenzek et al. 2019, public):
   * split every document on newlines, keep only the globally FIRST
   * occurrence of each distinct trimmed non-empty paragraph (first =
   * minimum (id, position) — deterministic), and reassemble each document
   * from its surviving paragraphs in original order. Boilerplate repeated
   * across a crawl (navigation, cookie banners, license footers) survives
   * exactly once in the whole corpus.
   *
   * Output: (id, text_kept, n_kept) for every input document — text_kept is
   * "" when every paragraph of the document occurred earlier elsewhere.
   *
   * Scale design: the winner per paragraph is a packed-BIGINT min
   * grouped by the paragraph hash — a map-side-combinable hash aggregation, so
   * the exchange carries one candidate per (task, paragraph), never a
   * paragraph's full occurrence list; no windows. Reassembly sorts only
   * WITHIN one document (array_sort over its kept positions). Joining back
   * on the 128-bit content hash (md5) rather than the paragraph text keeps
   * the shuffled rows narrow; a hash collision would need 2^64 paragraphs.
   */
  def dedupParagraphs(docs: DataFrame, id: String = "doc_id",
                      text: String = "text"): DataFrame = {
    val paras = docs.select(col(id).as("id"),
        posexplode(filter(transform(split(col(text), "\n"), p => trim(p)),
          p => length(p) > 0)).as(Seq("pos", "para")))
      .withColumn("h", md5(col("para")))
    // winner key packed into ONE BIGINT (id * 2^20 + pos) so the census is a
    // hash aggregate, not a SortAggregate — min(struct) is not
    // hash-aggregable; same encoding + domain bounds as [[dedupSubstrings]]
    // (pos < 2^20 paragraphs per document, id < 2^43)
    val pkey = col("id") * lit(1048576L) + col("pos")
    // the packed key is globally unique per occurrence, so the semi-join
    // needs no hash column at all — winner keys ARE the kept occurrences
    val winners = paras.groupBy(col("h")).agg(min(pkey).as("wk"))
    val kept = paras.join(winners.select(col("wk")), pkey === col("wk"), "left_semi")
    val rebuilt = kept.groupBy(col("id"))
      .agg(array_sort(collect_list(struct(col("pos"), col("para")))).as("ps"))
      .select(col("id"),
        array_join(transform(col("ps"), p => p("para")), "\n").as("text_kept"),
        size(col("ps")).cast("long").as("n_kept"))
    docs.select(col(id).as("id")).join(rebuilt, Seq("id"), "left")
      .select(col("id").as(id),
        coalesce(col("text_kept"), lit("")).as("text_kept"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }

  /**
   * Exact substring dedup at token-window granularity, after Lee et al.
   * 2021 ("Deduplicating Training Data Makes Language Models Better",
   * arXiv:2107.06499, public): any `n`-token window whose text occurs more
   * than once ACROSS THE CORPUS (including repeats within one document) is
   * removed from every occurrence except the globally first. The reference
   * engine has no text layer (Totem is graph-only); this is a
   * training-data-pipeline extension per the graft brief. Lee et al. build
   * a corpus-wide suffix array; at the fixed-window granularity the same
   * "no exact n-token span survives twice" guarantee reduces to a
   * hash census over all windows — the shape below.
   *
   * Deterministic contract (shared verbatim with the DuckDB oracle):
   *  - tokens = whitespace runs of the LOWERCASED text (the corpus
   *    tokenizer used by [[graft.text.Repetition]]);
   *  - window start s is 1-based and covers tokens [s, s+n-1]; its identity
   *    is md5 of the tokens joined by one space (128 bits — a collision
   *    needs ~2^64 distinct windows);
   *  - the surviving occurrence per window text = lexicographically
   *    smallest (id, s);
   *  - a token is removed iff ANY losing occurrence covers its position;
   *    kept tokens are re-joined by single spaces. (As in Lee et al.,
   *    removal can butt-splice previously distant tokens; downstream
   *    training treats the seam as a document boundary.)
   *
   * Output: (id, n_tokens, n_removed, text_kept) — one row per input doc,
   * `text_kept = ""` when everything was removed.
   *
   * Scale design: one explode yields O(total tokens) occurrence rows; the
   * census is a map-side-combinable `groupBy(h).agg(count, min(struct))`,
   * so the exchange carries one candidate per (task, window) — the same
   * shape as [[dedupParagraphs]]. Loser spans expand to at most n×losers
   * position rows (n is a small constant), and the rebuild is a token-level
   * anti-join + in-document array_sort: no global windows, no driver
   * collect, nothing quadratic in document length.
   */
  def dedupSubstrings(docs: DataFrame, n: Int = 8, id: String = "doc_id",
                      text: String = "text"): DataFrame = {
    require(n >= 2, s"window must span at least 2 tokens, got $n")
    val toks = docs.select(col(id).as("id"),
      regexp_extract_all(lower(col(text)), lit("[^ \\t\\n\\r]+"), lit(0)).as("t"))
    // docs shorter than n tokens have no windows (sequence() would descend
    // on a negative span, so the filter is load-bearing, not an optimization)
    val occ = toks.filter(size(col("t")) >= n)
      .select(col("id"), explode(transform(
        sequence(lit(1), size(col("t")) - (n - 1)),
        s => struct(s.as("s"), md5(concat_ws(" ", slice(col("t"), s, lit(n)))).as("h"))))
      .as("o"))
      .select(col("id"), col("o.s").as("s"), col("o.h").as("h"))
    // winner key packed into ONE BIGINT (id * 2^20 + s): min(struct) is not
    // hash-aggregable (it plans a SortAggregate over every occurrence row —
    // two extra per-task sorts); min(BIGINT) keeps the census a pure
    // HashAggregate. Order-isomorphic to (id, s) while s < 2^20 (1M tokens
    // per document) and id < 2^43, both documented domain bounds; the DuckDB
    // oracle uses the same encoding, so the contract is shared verbatim.
    val key = col("id") * lit(1048576L) + col("s")
    val census = occ.groupBy(col("h"))
      .agg(count(lit(1)).as("c"), min(key).as("wkey"))
    val losers = occ.join(census, Seq("h"))
      .filter(col("c") >= 2 && key =!= col("wkey"))
    val removed = losers
      .select(col("id"), explode(sequence(col("s"), col("s") + (n - 1))).as("p"))
      .distinct()
    val tokens = toks
      .select(col("id"), posexplode(col("t")).as(Seq("p0", "tok")))
      .select(col("id"), (col("p0") + 1).as("p"), col("tok"))
    val rebuilt = tokens.join(removed, Seq("id", "p"), "left_anti")
      .groupBy(col("id"))
      .agg(array_sort(collect_list(struct(col("p"), col("tok")))).as("ps"))
      .select(col("id"),
        array_join(transform(col("ps"), x => x("tok")), " ").as("text_kept"),
        size(col("ps")).cast("long").as("n_kept"))
    toks.select(col("id"), size(col("t")).cast("long").as("n_tokens"))
      .join(rebuilt, Seq("id"), "left")
      .select(col("id").as(id), col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("text_kept"), lit("")).as("text_kept"))
  }
}
