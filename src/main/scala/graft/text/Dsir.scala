package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
 * arXiv:2302.03169): select raw web documents whose hashed-n-gram
 * distribution looks like a small TARGET set (e.g. a high-quality or
 * in-language subset). The published recipe, kept exactly:
 *
 *  1. features  = unigrams + bigrams of whitespace tokens, hashed into
 *                 `buckets` buckets;
 *  2. models    = bag-of-buckets unigram models p (target) and q (raw),
 *                 add-λ smoothed: p[h] = (c_t[h]+λ) / (T_t+λB);
 *  3. weight    = per document, log p(doc) − log q(doc)
 *               = Σ_{feature occurrences} (ln p[h] − ln q[h]);
 *  4. resample  = Gumbel top-k on the log-weights (sampling without
 *                 replacement ∝ exp(weight)); the Gumbel draw is the usual
 *                 g = −ln(−ln u) with u a DETERMINISTIC per-doc hash
 *                 uniform (same md5 family as [[Curation.hashSample]]), so
 *                 the "random" resample is reproducible across engines,
 *                 runs, and partitionings.
 *
 * Cross-engine contract (DuckDB oracle): the bucket id is the first
 * `hexLen` hex chars of md5(feature) — a string key, byte-identical in any
 * engine with md5, no numeric hash conversion needed; per-bucket log-ratios
 * are quantized to integer nano-units so the per-doc sum is EXACT (see
 * the note inside [[importanceWeights]]).
 *
 * Scale shape (the 100 TB read): the corpus is scanned twice (once to fit
 * the models, once to score) — DSIR's own two passes; both are
 * explode → ONE map-side-combinable hash aggregate, output bounded by B
 * buckets, never by the vocabulary. The model table (≤ B rows) broadcasts
 * back for scoring, so scoring is a broadcast join + per-doc partial
 * aggregate: no shuffled join against a corpus-sized side anywhere. The
 * resample is a TakeOrdered top-k (per-partition heaps + driver merge of
 * k·parts rows), never a global sort.
 */
object Dsir {

  /** Bucket id: first `hexLen` hex chars of md5(feature) → 16^hexLen
   * buckets as STRING keys (cross-engine exact; see object doc). */
  private def bucket(feature: Column, hexLen: Int): Column =
    substring(md5(feature), 1, hexLen)

  private def hexLenFor(buckets: Int): Int = {
    val l = (math.log(buckets) / math.log(16)).round.toInt
    require(l >= 1 && l <= 8 && math.pow(16, l).toInt == buckets,
      s"buckets must be a power of 16 (16, 256, 4096, 65536, ...), got $buckets")
    l
  }

  /** (id, tgt, b): one row per unigram/bigram OCCURRENCE with its hash
   * bucket; `tgt` marks rows from the target subset. */
  private def occurrences(docs: DataFrame, idCol: String, textCol: String,
                          isTarget: Column, hexLen: Int): DataFrame = {
    // tokenize ONCE into a materialized attribute, then derive both gram
    // levels from it — unigrams ARE the token array (concat_ws of a 1-slice
    // is the token itself), bigrams come from rawWordShingles over the
    // attribute; nesting the tokenizer inside the shingle lambda instead
    // re-ran it per token position (O(L²) per doc, the round-3 #1 headline
    // cost)
    docs.select(col(idCol).as("id"), isTarget.as("tgt"),
        TextAnalysis.tokens(col(textCol)).as("__toks"))
      .select(col("id"), col("tgt"),
        explode(concat(col("__toks"),
          TextAnalysis.rawWordShingles(col("__toks"), 2))).as("f"))
      .select(col("id"), col("tgt"), bucket(col("f"), hexLen).as("b"))
  }

  /**
   * Per-document DSIR importance log-weight against the target subset
   * selected by `isTarget` (a boolean Column over `docs`' columns).
   * Output: (idCol, n_feats, logweight) — one row per document with ≥ 1
   * token; higher = more target-like.
   */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
                        isTarget: Column, buckets: Int = 4096,
                        lambda: Double = 0.5): DataFrame = {
    require(lambda > 0, s"smoothing lambda must be positive, got $lambda")
    val hexLen = hexLenFor(buckets)
    val occ = occurrences(docs, idCol, textCol, isTarget, hexLen)
    // pass 1: both models in ONE map-side-combinable aggregate — raw count
    // + conditional target count per bucket (the target is a subset of raw,
    // so one scan fits both). The result is bounded by B buckets, so it is
    // COLLECTED (O(B) driver rows, the temperatureMix discipline) and the
    // log-ratios computed locally — deriving totals from the uncollected
    // frame would re-run the corpus aggregation a second time (Catalyst
    // does not share the subplan), i.e. a third corpus scan.
    val model = occ.groupBy("b").agg(
        count(lit(1)).as("cr"),
        sum(when(col("tgt"), 1L).otherwise(0L)).as("ct"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val tr = model.map(_._2).sum; val tt = model.map(_._3).sum
    val lamB = lambda * buckets
    // Per-bucket log-ratio quantized to integer NANO-units (1e-9): the
    // per-doc weight is then an EXACT integer sum — order-independent and
    // engine-independent. Summing 9-decimal-rounded doubles instead puts
    // every per-doc sum on the 1e-9 lattice, where a final round at 1e-6
    // sits exactly on a .5 boundary for ~1/1000 documents and FP
    // accumulation order decides the digit (observed: one corpus doc
    // flipped between engines). logweight = nanos / 1e9 with NO post-sum
    // rounding: both engines divide the same exact integer by the same
    // constant and emit bit-identical doubles.
    def nanos(x: Double) = BigDecimal(x).setScale(9,
      BigDecimal.RoundingMode.HALF_UP).bigDecimal.movePointRight(9).longValueExact
    val ratio = model.toSeq.map { case (b, cr, ct) =>
      (b, nanos(math.log((ct + lambda) / (tt + lamB)) -
        math.log((cr + lambda) / (tr + lamB))))
    }
    val spark = docs.sparkSession
    import spark.implicits._
    val ratioDf = ratio.toDF("b", "ratio_nanos")
    // pass 2: score — every observed bucket exists in the raw model by
    // construction, so the inner broadcast join loses nothing
    occ.join(broadcast(ratioDf), "b")
      .groupBy("id")
      .agg(count(lit(1)).as("n_feats"),
        (sum("ratio_nanos") / 1e9).as("logweight"))
      .withColumnRenamed("id", idCol)
  }

  /**
   * Gumbel top-k resample over importance log-weights: keeps k rows,
   * sampled without replacement with probability ∝ exp(weightCol), via the
   * Gumbel-max trick with a deterministic per-id hash uniform
   * u = (hashPosition + 0.5) / 2^32 ∈ (0,1). Output adds `gumbel_key`
   * (rounded 6); ties break on id. TakeOrdered plan — no global sort.
   */
  def resample(weights: DataFrame, idCol: String, weightCol: String,
               k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val u = (conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("long").cast("double") + 0.5) / 4294967296.0
    weights
      .withColumn("gumbel_key", round(col(weightCol) - log(-log(u)), 6))
      .orderBy(col("gumbel_key").desc, col(idCol))
      .limit(k)
  }
}
