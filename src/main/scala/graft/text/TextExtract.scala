package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Deterministic HTML→text extraction.
 *
 * The reference has no HTML pipeline (Totem consumes edge lists), so per
 * SURVEY.md §7.0 this is defined as a pure, byte-stable function used by BOTH
 * the corpus generator and the engine — the north rule's "byte-identical
 * per-url text" invariant then holds by construction and is asserted in
 * tests.
 *
 * Two implementations that agree EXACTLY (same java.util.regex engine):
 *  - [[extract]]: plain Scala, used by the generator and the test oracle;
 *  - [[extractCol]]: a Column expression (chained regexp_replace — Catalyst
 *    codegen, no UDF) used in distributed plans.
 */
object TextExtract {

  // Order matters and is part of the contract:
  // 1. drop script/style subtrees, 2. strip remaining tags,
  // 3. decode the fixed entity set, 4. collapse whitespace, trim.
  private val ScriptStyle = "(?is)<(script|style)\\b[^>]*>.*?</\\1>"
  private val Tags = "(?s)<[^>]*>"
  private val Entities: Seq[(String, String)] = Seq(
    "&nbsp;" -> " ", "&amp;" -> "&", "&lt;" -> "<", "&gt;" -> ">",
    "&quot;" -> "\"", "&#39;" -> "'")
  private val Spaces = "\\s+"

  def extract(html: String): String = {
    var s = html.replaceAll(ScriptStyle, " ")
    s = s.replaceAll(Tags, " ")
    Entities.foreach { case (e, r) => s = s.replace(e, r) }
    s.replaceAll(Spaces, " ").trim
  }

  /** Same pipeline as a codegen-friendly Column expression over a string or
   * binary html column. */
  def extractCol(html: Column): Column = {
    val str = html.cast("string")
    var s = regexp_replace(str, ScriptStyle, " ")
    s = regexp_replace(s, Tags, " ")
    Entities.foreach { case (e, r) =>
      s = regexp_replace(s, java.util.regex.Pattern.quote(e), r)
    }
    trim(regexp_replace(s, Spaces, " "))
  }
}
