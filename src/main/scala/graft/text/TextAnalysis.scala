package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis column functions for large-scale training-data pipelines:
 * token counting, language id, quality scoring, fingerprinting. All are
 * pure `Column` expressions (codegen'd built-ins, no UDFs) so they run
 * inside whole-stage codegen and push down through the pipeline. Each has an
 * exactly-matching ANSI-SQL formulation (used as DuckDB oracles) — the
 * formulas below are part of the contract.
 */
object TextAnalysis {

  private def allMatches(text: Column, pattern: String): Column =
    regexp_extract_all(text, lit(pattern), lit(0))

  /** Whitespace tokens: count of maximal non-space runs — identical to
   * len(regexp_extract_all(text, '\S+')) in DuckDB; robust to empty strings
   * and repeated whitespace. */
  def tokenCount(text: Column): Column =
    size(allMatches(text, "[^ \\t\\n\\r]+"))

  /** BPE-ish subword count estimate: letter runs + single digits +
   * punctuation — the usual pre-tokenizer regex shape. */
  def subwordCount(text: Column): Column =
    size(allMatches(text, "[A-Za-z]+|[0-9]|[^A-Za-z0-9 \\t\\n\\r]"))

  // Stopword marker sets per language — tiny on purpose: the heuristic is
  // the capability under test, not linguistic accuracy.
  val LangMarkers: Seq[(String, String)] = Seq(
    "en" -> "(the|and|of|to|is|that|with)",
    "de" -> "(der|die|das|und|ist|nicht|mit)",
    "fr" -> "(le|la|les|et|est|que|dans)",
    "es" -> "(el|la|los|de|que|es|por)")

  private def markerHits(text: Column, markers: String): Column =
    size(allMatches(lower(text), "\\b" + markers + "\\b"))

  /**
   * N-gram/stopword language id: per-language marker-hit counts; winner =
   * greatest (hits, lang) struct — hit-ties break to the DESCENDING lang
   * string (struct compare; the DuckDB oracle replicates via greatest(row)).
   * "und" when nothing matches; any CJK char ≥ U+4E00 → "zh".
   */
  def langId(text: Column): Column = {
    val scores = LangMarkers.map { case (lang, m) =>
      struct(markerHits(text, m).as("hits"), lit(lang).as("lang"))
    }
    val best = greatest(scores: _*)
    when(text.rlike("[\\u4e00-\\u9fff]"), lit("zh"))
      .otherwise(when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und")))
  }

  /**
   * Quality score in [0,1]: weighted blend of length band (50..5000 chars),
   * alphanumeric ratio, mean-word-length band (3..12), stopword presence.
   * Deterministic arithmetic only — same formula in the DuckDB oracle.
   */
  def qualityScore(text: Column): Column = {
    val chars = length(text)
    val words = tokenCount(text)
    val alpha = length(regexp_replace(text, "[^A-Za-z0-9 ]", ""))
    val alphaRatio = when(chars > 0, alpha.cast("double") / chars).otherwise(lit(0.0))
    val meanWord = when(words > 0, chars.cast("double") / words).otherwise(lit(0.0))
    val lenScore = when(chars >= 50 && chars <= 5000, lit(1.0))
      .when(chars > 5000, lit(0.5)).otherwise(chars.cast("double") / 50.0)
    val wordScore = when(meanWord >= 3 && meanWord <= 12, lit(1.0)).otherwise(lit(0.5))
    val stopScore = when(markerHits(text, LangMarkers.head._2) > 0, lit(1.0)).otherwise(lit(0.5))
    round(lit(0.4) * lenScore + lit(0.3) * alphaRatio +
      lit(0.2) * wordScore + lit(0.1) * stopScore, 6)
  }

  /** Shannon entropy (bits/char) of the character distribution — the
   * compression-ratio-style gibberish/repetition signal (low entropy =
   * boilerplate or character spam, high = encrypted/binary junk; used as a
   * band-pass filter alongside the Gopher rules). Delegates to the native
   * codegen'd [[graft.functions.CharEntropy]] expression — one compiled
   * pass per row, no UDF, no shuffle; every pure-Column formulation
   * measured 1000× slower (see the expression's scaladoc). Summation-order
   * float drift vs an engine that groups by char is below the round(6) the
   * callers apply. */
  def charEntropy(text: Column): Column =
    graft.functions.CharEntropy(text)

  /** Document fingerprint: md5 of the lowercased text with all
   * non-alphanumerics removed — stable under formatting/punctuation noise.
   * (Rolling-hash analog of the reference's hash utilities,
   * `totem_hash_table.cu:87-300`.) */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), "[^a-z0-9]", ""))

  /** Character n-gram shingles of the whitespace-normalized lowercase text.
   * Empty array when the text is shorter than n. */
  /** Whitespace normalization used by character shingles. Hoist this into a
   * projection and shingle the RESULT with [[rawShingles]] in hot paths: an
   * expression nested inside the `transform` lambda re-executes per array
   * element (no subexpression elimination across lambda scopes), turning
   * shingling O(L) into O(L·len(regex output)) per document. */
  def normalizeForShingles(text: Column): Column =
    regexp_replace(lower(text), "\\s+", " ")

  /** Evaluate `c` ONCE per row and hand it to `f` as a bound lambda
   * VARIABLE (an O(1) read): `element_at(transform(array(c), f), 1)`. The
   * outer single-element `transform` evaluates its input exactly once;
   * inner lambdas then read the binding instead of re-executing the
   * expression per output element — Catalyst does no subexpression
   * elimination across lambda scopes, so nesting a tokenizer/normalizer
   * expression directly inside a shingle lambda is O(L²) per document
   * (the round-3 q_dsir lesson). Use this wherever a derived array feeds
   * a higher-order function and can't be pre-projected as an attribute. */
  def bindOnce(c: Column)(f: Column => Column): Column =
    element_at(transform(array(c), x => f(x)), 1)

  /** Character n-gram shingles of an ALREADY-normalized column (pass an
   * attribute, not an expression — see [[normalizeForShingles]]). */
  def rawShingles(norm: Column, n: Int): Column = {
    val cnt = length(norm) - (n - 1)
    // sequence(1, 0) would yield a DESCENDING [1,0] — guard short texts
    when(cnt >= 1, transform(sequence(lit(1), cnt), i => norm.substr(i, lit(n))))
      .otherwise(array().cast("array<string>"))
  }

  /** Convenience one-shot form, O(L) in the normalization via
   * [[bindOnce]]. */
  def shingles(text: Column, n: Int): Column =
    bindOnce(normalizeForShingles(text))(t => rawShingles(t, n))

  /** Lowercased whitespace tokens — the tokenizer shared by the word-gram
   * family (identical to regexp_extract_all(lower(text), '\S+') in
   * DuckDB). Pre-project this once when several gram levels are built from
   * the same document (see [[rawWordShingles]]). */
  def tokens(text: Column): Column =
    allMatches(lower(text), "[^ \\t\\n\\r]+")

  /** Word n-gram shingles of an ALREADY-evaluated token array: pass an
   * attribute or a lambda variable, not a regex expression — an expression
   * nested inside the `transform` lambda re-executes per output element
   * (no subexpression elimination across lambda scopes), which turns
   * shingling O(L) into O(L²) per document. */
  def rawWordShingles(toks: Column, n: Int): Column = {
    val cnt = size(toks) - (n - 1)
    when(cnt >= 1, transform(sequence(lit(1), cnt), i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Word n-gram shingles. One-shot form, still O(L): [[bindOnce]] keeps
   * the tokenizer out of the shingle lambda. */
  def wordShingles(text: Column, n: Int): Column =
    bindOnce(tokens(text))(ts => rawWordShingles(ts, n))

  /**
   * CCNet-style unigram-LM quality scoring (Wenzek et al. 2020 use a KenLM
   * 5-gram; the unigram model is the same pipeline shape with the LM
   * training step kept in-engine): train token log-probabilities ON the
   * corpus itself, score every document by its mean token log-prob (a
   * monotone proxy for perplexity: ppl = exp(−avg_logprob)), and bucket
   * head / middle / tail at the given thresholds — in production the
   * thresholds come from `stat_approx_quantile`-style sketches of a prior
   * run (CCNet cuts at the 33rd/67th percentile); they are explicit
   * parameters here so the cut is deterministic and cross-engine checkable.
   *
   * Scale shape: token explode → one (term) hash aggregate (map-side
   * combinable) for the model; corpus total folded back as a one-row
   * broadcast; scoring is a term-keyed join of tokens against the model —
   * the vocabulary can outgrow a broadcast at corpus scale, so the shuffle
   * join is the default and AQE upgrades small vocabularies — then one
   * per-doc hash aggregate. No windows, no UDFs.
   *
   * Cross-engine exactness (the SimRank floor discipline): per-token
   * log-probs quantize to integer NANO-units — floor(ln(cnt/total)·10⁹),
   * one value per DISTINCT model count — the per-doc sum is an exact
   * BIGINT (order-independent), and avg_logprob = Σnano/(n·10⁹) is one
   * double division both engines evaluate identically. This replaces the
   * old round-9-then-round-6-after-division form whose sum order and
   * rounding boundaries were engine luck (the q_pca_cov class).
   *
   * Output: (id, n_tokens, avg_logprob, ppl_bucket).
   */
  /** The scoring half of [[unigramLogProb]]: (idCol, n_tokens,
   * avg_logprob) in the nano-unit discipline above. */
  private def unigramScores(docs: org.apache.spark.sql.DataFrame, idCol: String,
                            textCol: String): org.apache.spark.sql.DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
      explode(allMatches(lower(col(textCol)), "[^ \\t\\n\\r]+")).as("term"))
    val freq = toks.groupBy("term").agg(count(lit(1)).as("cnt"))
    val total = freq.select(sum("cnt").as("total"))
    toks
      .join(freq, "term")
      .crossJoin(broadcast(total))
      .select(col("id"),
        floor(log(col("cnt") * lit(1.0) / col("total")) * lit(1e9))
          .cast("long").as("__lpn"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"), sum("__lpn").as("__sn"))
      // one exact-integer division pair: n·10⁹ stays an exact double for
      // any document under ~9M tokens
      .select(col("id").as(idCol), col("n_tokens"),
        (col("__sn") / (col("n_tokens") * lit(1e9))).as("avg_logprob"))
  }

  def unigramLogProb(docs: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
                     headThreshold: Double, middleThreshold: Double): org.apache.spark.sql.DataFrame = {
    require(headThreshold > middleThreshold,
      "bucket thresholds must satisfy headThreshold > middleThreshold")
    unigramScores(docs, idCol, textCol)
      .select(col(idCol), col("n_tokens"), col("avg_logprob"),
        when(col("avg_logprob") >= headThreshold, lit("head"))
          .when(col("avg_logprob") >= middleThreshold, lit("middle"))
          .otherwise(lit("tail")).as("ppl_bucket"))
  }

  /**
   * [[unigramLogProb]] with the tercile thresholds derived IN-PLAN from
   * the score distribution — the production claim ("CCNet cuts at the
   * 33rd/67th percentile of a prior run") as a tested path instead of
   * pinned constants.
   *
   * `exact = true`: the cuts are NEAREST-RANK order statistics — the
   * floor(n/3)-th and floor(2n/3)-th smallest avg_logprob — computed
   * DISTRIBUTED via [[graft.core.Ranking.globalRank]] (range repartition +
   * per-partition windows + a broadcast prefix-sum of partition totals)
   * and one conditional-max aggregate over the ranked rows: no global
   * sort, no single-point k-row heap, no task ever holds more than its
   * sort range — the exact path scales as far as the sketch path does.
   * Deterministic regardless of tie placement because the value at global
   * rank k−1 under any total order extending value order IS the k-th
   * order statistic.
   * Nearest-rank rather than interpolated percentile on purpose: the cut
   * is then one of the rounded-6 scores itself, so any engine comparing
   * the same doubles buckets identically — interpolation arithmetic
   * (a + d·(b−a) vs (1−d)·a + d·b) differs by ulps across engines.
   * One O(1) driver count supplies n.
   *
   * `exact = false` (the 10^12-document path): one
   * `approx_percentile(score, [0.33, 0.67], 10000)` sketch aggregate —
   * the [[graft.text.Curation.profile]] `exact=false` discipline; cut
   * values are then sketch-dependent, so this path is rows-only
   * checkable.
   *
   * Buckets are a function of the score alone (ties share a bucket):
   * score ≤ c33 → tail, ≤ c67 → middle, else head. Degenerate corpora
   * (n < 3 docs) have k = 0 ranks → null cuts → every doc lands in
   * "head".
   */
  def unigramLogProbTerciles(docs: org.apache.spark.sql.DataFrame, idCol: String,
                             textCol: String,
                             exact: Boolean = true): org.apache.spark.sql.DataFrame = {
    // lineage-cut, not persist: a cache-manager entry would never be
    // unregistered here (the returned plan still reads `scored`), pinning
    // storage for the session AND letting later identical plans silently
    // read this call's cache; cut blocks are weak-keyed and GC-reclaimed
    val scored = graft.core.Lineage.cut(unigramScores(docs, idCol, textCol))
    val cuts =
      if (exact) {
        val n = scored.count()
        // 0-based global value rank; rank k−1 holds the k-th smallest.
        // n < 3 ⇒ the target ranks are −1 ⇒ no match ⇒ null cuts (the
        // documented degenerate-corpus behavior).
        val ranked = graft.core.Ranking.globalRank(scored,
          Seq(col("avg_logprob"), col(idCol)), "__r")
        ranked.agg(
          max(when(col("__r") === lit(n / 3 - 1), col("avg_logprob"))).as("c33"),
          max(when(col("__r") === lit(2 * n / 3 - 1), col("avg_logprob"))).as("c67"))
      } else
        scored.agg(
          round(approx_percentile(col("avg_logprob"), lit(0.33), lit(10000)), 6).as("c33"),
          round(approx_percentile(col("avg_logprob"), lit(0.67), lit(10000)), 6).as("c67"))
    scored.crossJoin(broadcast(cuts))
      .select(col(idCol), col("n_tokens"), col("avg_logprob"),
        when(col("avg_logprob") <= col("c33"), lit("tail"))
          .when(col("avg_logprob") <= col("c67"), lit("middle"))
          .otherwise(lit("head")).as("ppl_bucket"))
  }

  /**
   * Top-k terms per document by smoothed TF-IDF
   * (tf · (ln((N+1)/(df+1)) + 1), the sklearn smoothing) over lowercased
   * whitespace tokens — the keyword/topic-signal extractor of a curation
   * pipeline. Scale shape: two term-keyed aggregates (both map-side
   * combinable), a term-keyed join of tf against (term, df) — the vocabulary
   * can outgrow a broadcast at corpus scale, so the shuffle join is the
   * default and AQE upgrades small vocabularies to broadcast — the corpus
   * count folded in as a one-row broadcast cross join,
   * and a per-document window for the rank — never global.
   *
   * Cross-engine exactness (the SimRank floor discipline): the idf is
   * quantized per DISTINCT df to integer micro-units —
   * idf_micro = floor((ln((N+1)/(df+1)) + 1)·10⁶) — so the score
   * tf·idf_micro is an exact integer product (< 2⁵³), the rank orders on
   * that integer, and the emitted tfidf = tf·idf_micro/10⁶ is one double
   * division both engines evaluate identically. The only residual engine
   * freedom is the last ulp of ln, amplified to ~1e-10 at the floor — a
   * per-distinct-df exposure, not the per-row round-after-multiply
   * boundary luck of round(tf·idf, 6) (the q_pca_cov class).
   * Output: (id, term, tfidf, rnk ≤ k).
   */
  def tfidfTopTerms(docs: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
                    k: Int): org.apache.spark.sql.DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
      explode(allMatches(lower(col(textCol)), "[^ \\t\\n\\r]+")).as("term"))
    val tf = toks.groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.select(count(lit(1)).as("n"))
    val scored = tf
      .join(dfreq, "term")
      .crossJoin(broadcast(n))
      .select(col("id"), col("term"),
        (col("tf") * floor((log((col("n") + 1.0) / (col("df") + 1.0)) + 1.0)
          * lit(1000000.0)).cast("long")).as("__tfm"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("__tfm").desc, col("term"))
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select(col("id").as(idCol), col("term"),
        (col("__tfm") / lit(1e6)).as("tfidf"), col("rnk"))
  }
}
