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
                        id: String = "doc_id", text: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sh = docs.select(col(id), explode_outer(TextAnalysis.shingles(col(text), n)).as("sh"))
      .filter(col("sh").isNotNull)
      .distinct()
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
    val cand = prefix.select(col(id).as("ia"), col("sh"))
      .join(prefix.select(col(id).as("ib"), col("sh")), "sh")
      .filter(col("ia") < col("ib"))
      .select("ia", "ib").distinct()
    // verify: exact |A∩B| on the candidates only
    val sets = sh.groupBy(id).agg(collect_list("sh").as("set"), count(lit(1)).as("sz"))
    cand
      .join(sets.select(col(id).as("ia"), col("set").as("sa"), col("sz").as("na")), "ia")
      .join(sets.select(col(id).as("ib"), col("set").as("sb"), col("sz").as("nb")), "ib")
      .select(col("ia").as("id_a"), col("ib").as("id_b"),
        (size(array_intersect(col("sa"), col("sb"))).cast("double")
          / (col("na") + col("nb") - size(array_intersect(col("sa"), col("sb")))))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Near-duplicate groups from a pair table: connected components over the
   * pair graph (HashMin), then keeper = min id per group. */
  def groupsFromPairs(pairs: DataFrame): DataFrame = {
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
    graft.alg.ConnectedComponents.run(edges).components
      .select(col("vid").as("doc_id"), col("component").as("group_id"))
  }
}
