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
   * Character n-gram Jaccard similarity for candidate pairs sharing ≥ 1
   * shingle: J = |A∩B| / |A∪B| over DISTINCT shingle sets.
   * `maxShingleFreq` drops shingles present in more documents than the cap
   * (stopword-shingles would otherwise create O(n²) candidate pairs — the
   * standard frequency-cap trick; dropped shingles are logged upstream).
   */
  def ngramJaccardPairs(docs: DataFrame, n: Int = 5, threshold: Double = 0.7,
                        maxShingleFreq: Int = 1000,
                        id: String = "doc_id", text: String = "text"): DataFrame = {
    val sh = docs.select(col(id), explode_outer(TextAnalysis.shingles(col(text), n)).as("sh"))
      .filter(col("sh").isNotNull)
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val sizes = sh.groupBy(id).agg(count(lit(1)).as("sz"))
    val kept = sh.join(
      sh.groupBy("sh").agg(count(lit(1)).as("f")).filter(col("f") <= maxShingleFreq),
      "sh")
    val inter = kept.select(col(id).as("ia"), col("sh"))
      .join(kept.select(col(id).as("ib"), col("sh")), "sh")
      .filter(col("ia") < col("ib"))
      .groupBy("ia", "ib").agg(count(lit(1)).as("inter"))
    val out = inter
      .join(sizes.select(col(id).as("ia"), col("sz").as("sa")), "ia")
      .join(sizes.select(col(id).as("ib"), col("sz").as("sb")), "ib")
      .select(col("ia").as("id_a"), col("ib").as("id_b"),
        (col("inter").cast("double") / (col("sa") + col("sb") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
    out
  }

  /** Near-duplicate groups from a pair table: connected components over the
   * pair graph (HashMin), then keeper = min id per group. */
  def groupsFromPairs(pairs: DataFrame): DataFrame = {
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
    graft.alg.ConnectedComponents.run(edges).components
      .select(col("vid").as("doc_id"), col("component").as("group_id"))
  }
}
