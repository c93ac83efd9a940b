package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.text.TextAnalysis

/**
 * SimHash near-duplicate detection: 64-bit fingerprint = sign bits of the
 * per-bit sum of token hashes; near-dups = pairs within Hamming distance k,
 * found via 4×16-bit band buckets (any pair at distance ≤ 3 shares at least
 * one intact band — pigeonhole), verified with bit_count(a XOR b).
 * All bit arithmetic is codegen'd built-ins (xxhash64, shiftright, bit_count).
 */
object SimHash {

  /** (id, simhash: long) from whitespace tokens. */
  def fingerprints(docs: DataFrame, id: String = "doc_id", text: String = "text"): DataFrame = {
    val toks = docs.select(col(id),
      explode(regexp_extract_all(lower(col(text)), lit("[^ \\t\\n\\r]+"), lit(0))).as("tok"))
    val hashed = toks.select(col(id), xxhash64(col("tok")).as("h"))
    // per-bit vote: +1 if bit set else -1; sum over tokens; sign → bit
    val bitCols = (0 until 64).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)).as(s"b$b")
    }
    hashed.groupBy(id).agg(bitCols.head, bitCols.tail: _*)
      .select(col(id),
        (0 until 64).map(b =>
          when(col(s"b$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_.bitwiseOR(_)).as("simhash"))
  }

  /** Pairs with Hamming distance ≤ maxDistance (≤ 15 supported by 4-band
   * scheme... guaranteed complete only for maxDistance ≤ 3; larger distances
   * may miss pairs that differ in every band — documented recall tradeoff). */
  def nearDupPairs(docs: DataFrame, maxDistance: Int = 3,
                   id: String = "doc_id", text: String = "text",
                   maxBucket: Int = 10000): DataFrame = {
    val fp = fingerprints(docs, id, text).persist(StorageLevel.MEMORY_AND_DISK)
    val banded = fp.select(col(id), col("simhash"), posexplode(
      array((0 until 4).map(b =>
        shiftright(col("simhash"), b * 16).bitwiseAND(lit(0xffffL))): _*))
      .as(Seq("band", "bkey")))
    val buckets = banded.groupBy("band", "bkey").agg(count(lit(1)).as("bn"))
      .filter(col("bn") > 1 && col("bn") <= maxBucket)
    val inB = banded.join(buckets, Seq("band", "bkey"), "left_semi")
    inB.select(col("band"), col("bkey"), col(id).as("id_a"), col("simhash").as("ha"))
      .join(inB.select(col("band"), col("bkey"), col(id).as("id_b"), col("simhash").as("hb")),
        Seq("band", "bkey"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDistance)
  }
}
