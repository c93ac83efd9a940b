package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Benchmark decontamination for training corpora: flag every training
 * document that shares at least one word n-gram with a held-out benchmark
 * set, so evaluation data never leaks into the training mix (the standard
 * n-gram-overlap decontamination of GPT-3 / PaLM / Llama data pipelines,
 * all public).
 *
 * Scale design: the benchmark side is SMALL by definition (eval suites are
 * thousands of documents, the corpus is billions), so its distinct-gram set
 * broadcasts and the whole pass is a map-side broadcast semi-join over the
 * corpus — no shuffle of the 100 TB side at all. For an unusually large
 * benchmark set, pass `broadcastBench = false` and the same plan degrades
 * gracefully to a shuffled semi-join keyed on the gram (corpus side still
 * shuffles only (id, gram) pairs, never text).
 *
 * Gram semantics (tokenizer regex, lowercase, single-space join) are shared
 * with [[Repetition.wordGrams]] so the DuckDB oracle formulation is the
 * same as every other gram operator in the engine.
 */
object Decontaminate {

  /** Distinct word n-grams of `textCol`, one row per (id, gram). */
  private def grams(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("id"),
        explode(array_distinct(Repetition.wordGrams(col(textCol), n))).as("gram"))

  /**
   * Every document of `docs` annotated with a `contaminated` flag: true iff
   * the document shares ≥1 word n-gram with any `benchmark` document.
   * Output: all columns of `docs` plus `contaminated: boolean`.
   */
  def flagContaminated(docs: DataFrame, benchmark: DataFrame,
                       idCol: String, textCol: String, n: Int,
                       broadcastBench: Boolean = true): DataFrame = {
    val bgrams = benchmark.select(
      explode(array_distinct(Repetition.wordGrams(col(textCol), n))).as("gram")).distinct()
    val bside = if (broadcastBench) broadcast(bgrams) else bgrams
    val hit = grams(docs, idCol, textCol, n)
      .join(bside, "gram")
      .select(col("id")).distinct()
      .withColumn("contaminated", lit(true))
    // drop the join-side column BY REFERENCE: drop("id") would remove BOTH
    // columns named "id" when the caller's idCol is itself "id"
    docs.join(hit, docs(idCol) === hit("id"), "left")
      .drop(hit("id"))
      .withColumn("contaminated", coalesce(col("contaminated"), lit(false)))
  }
}
