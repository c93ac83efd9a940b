package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/**
 * SimHash near-duplicate detection: 64-bit fingerprint = sign bits of the
 * per-bit sum of token hashes; near-dups = pairs within Hamming distance k,
 * found via band buckets (pigeonhole: a pair at distance ≤ bands-1 shares at
 * least one intact band), verified with bit_count(a XOR b).
 * All bit arithmetic is codegen'd built-ins (xxhash64/md5, shiftright,
 * bit_count, conv).
 *
 * Two hash families, mirroring [[MinHash]]:
 *  - [[fingerprints]]: xxhash64 token hash — the fast production family;
 *  - [[md5Fingerprints]]: 64 bits taken from the md5 hex digits —
 *    reproducible in any engine with md5+substring (used by the
 *    DuckDB-checked oracle queries; same statistics, slower).
 */
object SimHash {

  private val TokenPattern = "[^ \\t\\n\\r]+"

  /** (id, simhash: long) from whitespace tokens, xxhash64 family. */
  def fingerprints(docs: DataFrame, id: String = "doc_id", text: String = "text"): DataFrame = {
    val toks = docs.select(col(id),
      explode(regexp_extract_all(lower(col(text)), lit(TokenPattern), lit(0))).as("tok"))
    val hashed = toks.select(col(id), xxhash64(col("tok")).as("h"))
    aggregateBits(hashed, id, b => shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1L)
  }

  /** (id, simhash: long), md5 family: token hash = the 64 bits of the first
   * 16 md5 hex digits (digit j, 1-based from the left, carries bits
   * 63-4(j-1) .. 60-4(j-1)). Cross-engine exact: any engine with
   * md5 + substring + integer shifts reproduces it bit for bit. */
  def md5Fingerprints(docs: DataFrame, id: String = "doc_id", text: String = "text"): DataFrame = {
    val toks = docs.select(col(id),
      explode(regexp_extract_all(lower(col(text)), lit(TokenPattern), lit(0))).as("tok"))
    // project the 16 digit values ONCE per token (md5 evaluated once)
    val digits = toks.select(col(id) +:
      (1 to 16).map(j => conv(substring(md5(col("tok")), j, 1), 16, 10).cast("int").as(s"d$j")): _*)
    aggregateBits(digits, id,
      b => shiftright(col(s"d${(63 - b) / 4 + 1}"), b % 4).bitwiseAND(lit(1)) === 1)
  }

  /** per-bit vote: +1 if bit set else -1; sum over tokens; sign → bit. */
  private def aggregateBits(rows: DataFrame, id: String, bit: Int => Column): DataFrame = {
    val votes = (0 until 64).map(b => sum(when(bit(b), 1).otherwise(-1)).as(s"b$b"))
    rows.groupBy(id).agg(votes.head, votes.tail: _*)
      .select(col(id),
        (0 until 64).map(b =>
          when(col(s"b$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_.bitwiseOR(_)).as("simhash"))
  }

  /** Render a fingerprint as its 64-char bit string, MSB (bit 63) first —
   * the cross-engine comparison form (`bin` of a negative long is already
   * the 64-char two's-complement string; positives are left-padded). */
  def toBitString(simhash: Column): Column = lpad(bin(simhash), 64, "0")

  /** Pairs with Hamming distance ≤ maxDistance from the xxhash64 family.
   * Pigeonhole-complete iff maxDistance ≤ bands-1 (enforced): a pair that
   * differs in at most bands-1 bits leaves at least one band intact. */
  def nearDupPairs(docs: DataFrame, maxDistance: Int = 3,
                   id: String = "doc_id", text: String = "text",
                   maxBucket: Int = 10000, bands: Int = 4): DataFrame =
    pairsFromFingerprints(fingerprints(docs, id, text), maxDistance, id, maxBucket, bands)

  /** md5-family variant of [[nearDupPairs]] — the oracle-checkable path. */
  def md5NearDupPairs(docs: DataFrame, maxDistance: Int = 3,
                      id: String = "doc_id", text: String = "text",
                      maxBucket: Int = 10000, bands: Int = 4): DataFrame =
    pairsFromFingerprints(md5Fingerprints(docs, id, text), maxDistance, id, maxBucket, bands)

  /** Banded bucket join over any (id, simhash) table: `bands` segments of
   * ⌈64/bands⌉ bits; candidate pairs share a segment, verified exactly with
   * bit_count(xor). Output: (id_a, id_b, hamming: long). */
  def pairsFromFingerprints(fingerprints: DataFrame, maxDistance: Int, id: String,
                            maxBucket: Int, bands: Int): DataFrame = {
    require(bands >= 2 && bands <= 64, s"bands=$bands out of range")
    require(maxDistance < bands,
      s"recall guarantee needs bands > maxDistance (got bands=$bands, maxDistance=$maxDistance)")
    val w = (64 + bands - 1) / bands
    val fp = fingerprints.persist(StorageLevel.MEMORY_AND_DISK)
    val segs = (0 until bands).map { b =>
      val lo = b * w
      val width = math.min(w, 64 - lo)
      shiftrightunsigned(col("simhash"), lo).bitwiseAND(lit((1L << width) - 1))
    }
    val banded = fp.select(col(id), col("simhash"),
      posexplode(array(segs: _*)).as(Seq("band", "bkey")))
    val buckets = banded.groupBy("band", "bkey").agg(count(lit(1)).as("bn"))
      .filter(col("bn") > 1 && col("bn") <= maxBucket)
    val inB = banded.join(buckets, Seq("band", "bkey"), "left_semi")
    inB.select(col("band"), col("bkey"), col(id).as("id_a"), col("simhash").as("ha"))
      .join(inB.select(col("band"), col("bkey"), col(id).as("id_b"), col("simhash").as("hb")),
        Seq("band", "bkey"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDistance)
  }
}
