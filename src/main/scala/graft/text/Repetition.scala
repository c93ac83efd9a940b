package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Repetition / quality-rule curation operators (Gopher-style) for web-scale
 * training corpora: repeated-line fractions, duplicated-n-gram fractions,
 * most-frequent-n-gram mass, and a rule-based keep/drop quality gate. These
 * are the standard pre-training filters that run BEFORE dedup at corpus
 * scale (cf. the Gopher / MassiveText filtering rules, Rae et al. 2021,
 * public), complementing [[TextAnalysis.qualityScore]]'s continuous score
 * with hard structural rules.
 *
 * Scale design:
 *  - the per-document measures ([[dupLineFraction]], [[dupLineCharFraction]],
 *    [[dupNgramFraction]], [[gopherStats]]) are pure `Column` array
 *    expressions — codegen'd, zero shuffle, O(doc length) per row;
 *  - [[topNgram]] needs per-document gram frequencies, which the array API
 *    can only do in O(L²) per row — so it uses the distributed shape instead:
 *    explode → two key-partitioned aggregations (no windows, no skewed
 *    single-task stage; the widest key is one document's distinct grams).
 *
 * Every measure has an exactly-matching ANSI-SQL formulation used as its
 * DuckDB oracle; the formulas (tokenizer regex, join-with-single-space gram
 * text, rounding) are part of the contract.
 */
object Repetition {

  /** Trimmed non-empty lines of a document. */
  def nonEmptyLines(text: Column): Column =
    filter(transform(split(text, "\n"), l => trim(l)), l => length(l) > 0)

  /** Fraction of non-empty lines that are repeats of an earlier line
   * (1 - distinct/total); 0.0 for empty documents. */
  def dupLineFraction(text: Column): Column = {
    val ls = nonEmptyLines(text)
    when(size(ls) > 0,
      lit(1.0) - size(array_distinct(ls)).cast("double") / size(ls))
      .otherwise(lit(0.0))
  }

  /** Fraction of line CHARACTERS contained in repeated line occurrences
   * (total line chars minus each distinct line counted once, over total);
   * 0.0 for empty documents. */
  def dupLineCharFraction(text: Column): Column = {
    val ls = nonEmptyLines(text)
    val chars = aggregate(ls, lit(0L), (acc, l) => acc + length(l))
    val dchars = aggregate(array_distinct(ls), lit(0L), (acc, l) => acc + length(l))
    when(chars > 0, (chars - dchars).cast("double") / chars).otherwise(lit(0.0))
  }

  /** Word n-grams of the lowercased token stream, joined by single spaces —
   * the gram vocabulary shared by [[dupNgramFraction]] and [[topNgram]].
   * O(L) per doc (tokenize-once, see [[TextAnalysis.wordShingles]]). */
  def wordGrams(text: Column, n: Int): Column = TextAnalysis.wordShingles(text, n)

  /** Fraction of word n-grams that are repeats of an earlier occurrence;
   * null when the document has fewer than n tokens (callers filter).
   * The gram array is evaluated ONCE via [[TextAnalysis.bindOnce]] (three
   * references otherwise re-run the shingler per use). */
  def dupNgramFraction(text: Column, n: Int): Column =
    TextAnalysis.bindOnce(wordGrams(text, n))(g =>
      when(size(g) > 0,
        lit(1.0) - size(array_distinct(g)).cast("double") / size(g)))

  /**
   * Most frequent word n-gram per document and the fraction of the token
   * stream's characters it covers: `cnt * length(gram) / length(tokens
   * joined by ' ')`. Ties break deterministically to the lexicographically
   * SMALLEST gram (count desc, gram asc — encoded as `min(struct(-cnt,
   * gram))`, no window). Documents with fewer than n tokens are absent.
   *
   * Output: (id, gram, cnt, char_frac) with char_frac rounded to 6 dp.
   */
  def topNgram(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    // tokenize once into an attribute; joined_len and the gram explode both
    // read it (two regex runs per doc otherwise)
    val grams = df.select(col(idCol).as("id"),
        TextAnalysis.tokens(col(textCol)).as("__toks"))
      .select(
        col("id"),
        length(array_join(col("__toks"), " ")).as("joined_len"),
        explode(TextAnalysis.rawWordShingles(col("__toks"), n)).as("gram"))
    grams
      .groupBy(col("id"), col("joined_len"), col("gram"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("id"), col("joined_len"))
      .agg(min(struct((-col("cnt")).as("neg"), col("gram").as("gram"))).as("top"))
      .select(col("id"), col("top.gram").as("gram"), (-col("top.neg")).as("cnt"),
        round((-col("top.neg")) * length(col("top.gram")).cast("double") /
          col("joined_len"), 6).as("char_frac"))
  }

  /** Stopword markers for the ≥2-stopwords rule (the English marker set of
   * [[TextAnalysis.LangMarkers]] — same contract as the oracle). */
  private val StopPattern = "\\b" + TextAnalysis.LangMarkers.head._2 + "\\b"

  /**
   * Gopher-style structural quality stats + keep flag, all from the
   * lowercased token stream:
   *  - n_words; keep requires 50 ≤ n_words ≤ 100000;
   *  - mean_word_len = token chars / n_words; keep requires 3 ≤ · ≤ 10;
   *  - alpha_frac = fraction of tokens containing a latin letter;
   *    keep requires ≥ 0.8;
   *  - stop_hits = stopword occurrences; keep requires ≥ 2.
   * Returns a struct column (n_words, mean_word_len, alpha_frac, stop_hits,
   * keep); fractions rounded to 6 dp for cross-engine hashing.
   */
  def gopherStats(text: Column): Column = {
    val stopHits = size(regexp_extract_all(lower(text), lit(StopPattern), lit(0))).cast("long")
    // tokenize ONCE (bindOnce): n_words, token chars and alpha_frac all
    // read the bound token array instead of re-running the tokenizer regex
    // per measure
    TextAnalysis.bindOnce(TextAnalysis.tokens(text))(toks => {
      val nWords = size(toks).cast("long")
      val tokChars = aggregate(toks, lit(0L), (acc, t) => acc + length(t))
      val meanLen = when(nWords > 0, round(tokChars.cast("double") / nWords, 6)).otherwise(lit(0.0))
      val alphaFrac = when(nWords > 0,
        round(size(filter(toks, t => t.rlike("[a-z]"))).cast("double") / nWords, 6))
        .otherwise(lit(0.0))
      val keep = nWords.between(50L, 100000L) &&
        meanLen.between(3.0, 10.0) && alphaFrac >= 0.8 && stopHits >= 2L
      struct(nWords.as("n_words"), meanLen.as("mean_word_len"),
        alphaFrac.as("alpha_frac"), stopHits.as("stop_hits"), keep.as("keep"))
    })
  }

  /**
   * CORPUS-level most-frequent word n-grams — the boilerplate/template
   * miner of a curation pipeline (the global sibling of the per-document
   * [[topNgram]]): repeated navigation chrome, cookie banners, and licence
   * blurbs surface as corpus-wide heavy hitters long before any similarity
   * join sees them. Output: (gram, cnt, n_docs) — total occurrences and
   * document frequency — top `k` by (cnt desc, gram asc), a total order, so
   * the cut boundary is deterministic cross-engine.
   *
   * Scale shape: explode → `groupBy(gram, id).count` (map-side combinable;
   * also what makes the doc-frequency exact without a count-distinct
   * shuffle) → `groupBy(gram).agg(sum, count)` → global top-k via
   * `orderBy().limit(k)`, which Spark executes as TakeOrdered (per-partition
   * heaps + driver merge of k rows), never a full sort.
   */
  def corpusTopNgrams(df: DataFrame, idCol: String, textCol: String,
                      n: Int, k: Int): DataFrame =
    df.select(col(idCol).as("id"), TextAnalysis.tokens(col(textCol)).as("__toks"))
      .select(col("id"), explode(TextAnalysis.rawWordShingles(col("__toks"), n)).as("gram"))
      .groupBy(col("gram"), col("id")).agg(count(lit(1)).as("c"))
      .groupBy(col("gram"))
      .agg(sum(col("c")).as("cnt"), count(lit(1)).as("n_docs"))
      .orderBy(col("cnt").desc, col("gram").asc)
      .limit(k)
}
