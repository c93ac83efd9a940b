package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Tokenizer-training preparation: the corpus-side inner loop of BPE
 * (byte-pair encoding) training — adjacent-symbol pair frequency mining and
 * greedy merge application. An LLM-pipeline extension beyond the reference
 * inventory (the reference has no text stack); the algorithm is the
 * published BPE procedure (Sennrich et al. 2016, "Neural Machine
 * Translation of Rare Words with Subword Units").
 *
 * Scale shape: the corpus is scanned ONCE into a distinct-word frequency
 * table ([[wordFreq]] — one map-side-combinable count per word; vocabulary
 * is millions of rows where the corpus is trillions of tokens). Every
 * merge iteration then runs on that compact table: pair counting is one
 * explode + hash aggregate weighted by word frequency, merge application
 * is a pure per-row array fold — no window, no join, no driver data beyond
 * the single argmax pair per iteration (the same O(1) driver probe as a
 * superstep convergence check).
 *
 * Determinism / oracle: pair ranking orders by (count desc, pair asc) — a
 * total order, DuckDB-expressible; [[bpeTrain]]'s merge sequence is
 * spec-checked against an in-memory reference trainer.
 */
object Tokenize {

  /** Whitespace-token frequency table (w, f) — one corpus scan, map-side
   * combined. Lowercased like the rest of the text stack. */
  def wordFreq(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(regexp_extract_all(lower(col(textCol)),
        lit("[^ \\t\\n\\r]+"), lit(0))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("f"))

  /** Character-pair counts over a (w, f) word-frequency table: the first
   * BPE iteration's statistics. Returns (pair, cnt) for the top `k` pairs
   * by (cnt desc, pair asc) — compiles to TakeOrderedAndProject. */
  def charPairCounts(wf: DataFrame, k: Int): DataFrame =
    wf.select(explode(when(length(col("w")) >= 2,
          transform(sequence(lit(1), length(col("w")) - 1),
            i => col("w").substr(i, lit(2))))
        .otherwise(array().cast("array<string>"))).as("pair"),
        col("f"))
      .groupBy("pair").agg(sum("f").as("cnt"))
      .orderBy(col("cnt").desc, col("pair").asc)
      .limit(k)

  /** (w, f) → (syms, f) with syms = the word's single-character symbols —
   * the initial BPE state. */
  def toSymbols(wf: DataFrame): DataFrame =
    wf.select(filter(split(col("w"), ""), s => length(s) > 0).as("syms"),
      col("f"))

  /** Adjacent-symbol pair counts over a (syms, f) table, weighted by f.
   * Returns (a, b, cnt) — every iteration's statistics. */
  def pairCounts(syms: DataFrame): DataFrame =
    syms.select(explode(when(size(col("syms")) >= 2,
          transform(sequence(lit(0), size(col("syms")) - 2),
            i => struct(element_at(col("syms"), i + 1).as("a"),
              element_at(col("syms"), i + 2).as("b"))))
        .otherwise(array().cast("array<struct<a:string,b:string>>"))).as("p"),
        col("f"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum("f").as("cnt"))

  /** Apply one merge (a, b) → a+b to every symbol array: the standard
   * greedy left-to-right non-overlapping replacement, as a pure per-row
   * fold (after a merge the accumulator's tail is the MERGED token, so an
   * overlapping second application cannot fire — "aaa" under (a,a) becomes
   * [aa, a], exactly the reference behavior). Rewrites `syms` in place;
   * every other column rides along (so a (w, syms) vocabulary keeps its
   * word key through [[encode]]'s merge chain). */
  def applyMerge(syms: DataFrame, a: String, b: String): DataFrame = {
    val merged = a + b
    syms.withColumn("syms",
      aggregate(col("syms"), array().cast("array<string>"),
        (acc, s) => when(size(acc) > 0 &&
            element_at(acc, -1) === lit(a) && s === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(merged))))
          .otherwise(concat(acc, array(s)))))
  }

  /**
   * Apply a learned merge sequence to a corpus — the ENCODE side of BPE.
   * The merge chain folds over the distinct-word VOCABULARY (never the
   * corpus); documents then join their words against the tokenized vocab.
   * Returns one row per document: (id, n_words, n_tokens, tokens —
   * the per-word subword arrays flattened in word order is deliberately
   * NOT materialized; downstream packing only needs counts).
   *
   * Scale shape: one corpus scan into (id, w) pairs, |merges| vocabulary
   * folds (each a lineage-cut projection over millions of rows, not
   * trillions), one w-keyed join back, one per-doc aggregate.
   */
  def encode(df: DataFrame, idCol: String, textCol: String,
             merges: Seq[Merge]): DataFrame = {
    val words = df.select(col(idCol).as("id"),
      explode(regexp_extract_all(lower(col(textCol)),
        lit("[^ \\t\\n\\r]+"), lit(0))).as("w"))
    val vocab0 = words.select("w").distinct()
      .withColumn("syms", filter(split(col("w"), ""), s => length(s) > 0))
    val vocab = merges.foldLeft(graft.core.Lineage.cut(vocab0)) { (v, m) =>
      val next = graft.core.Lineage.cut(applyMerge(v, m.a, m.b))
      graft.core.Lineage.release(v)
      next
    }
    words.join(vocab.select(col("w"), size(col("syms")).as("__nt")), "w")
      .groupBy("id")
      .agg(count(lit(1)).as("n_words"), sum("__nt").as("n_tokens"))
  }

  /** Learned merge, in rank order. */
  final case class Merge(rank: Int, a: String, b: String, cnt: Long)

  /**
   * Train `nMerges` BPE merges over a corpus. One corpus scan builds the
   * word-frequency table; each iteration is one distributed pair-count
   * aggregate (argmax collected — a single row) plus one fold projection.
   * The symbols table is lineage-cut every iteration ([[graft.core.Lineage]])
   * so the loop's plan depth stays constant like any superstep loop.
   * Ties break (cnt desc, a asc, b asc) — deterministic across engines and
   * partitionings.
   */
  def bpeTrain(df: DataFrame, textCol: String, nMerges: Int): Seq[Merge] = {
    var syms = graft.core.Lineage.cut(toSymbols(wordFreq(df, textCol)))
    val out = Seq.newBuilder[Merge]
    var i = 0
    var exhausted = false
    while (i < nMerges && !exhausted) {
      val top = pairCounts(syms)
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc).limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val r = top(0)
        val (a, b, c) = (r.getString(0), r.getString(1), r.getLong(2))
        out += Merge(i, a, b, c)
        val next = graft.core.Lineage.cut(applyMerge(syms, a, b)) // eager
        graft.core.Lineage.release(syms)
        syms = next
        i += 1
      }
    }
    graft.core.Lineage.release(syms)
    out.result()
  }
}
