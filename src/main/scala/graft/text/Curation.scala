package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Corpus-curation operators for web-scale training-data pipelines: per-key
 * (domain/host/source) document capping and deterministic hash sampling.
 * Both are standard curation steps over a crawl-derived corpus — a handful
 * of mega-domains otherwise dominate the token budget (the same power-law
 * skew `totem_graph.h`-style degree distributions show for link graphs).
 *
 * Scale notes:
 *  - [[capPerKey]] keeps the k rows with the smallest deterministic hash
 *    per key. A single `row_number() over (partition by key)` would sort a
 *    mega-domain's entire row set in one task, so the cap runs in TWO
 *    bounded phases: phase 1 partitions each key into `salts` hash
 *    sub-groups and keeps the per-sub-group top-k (the global per-key top-k
 *    rows each survive their own sub-group); phase 2 re-ranks the at most
 *    salts*k survivors per key. The widest window any task ever sorts is
 *    max(rows/salt-group) in phase 1 — 1/salts of the hottest domain — and
 *    salts*k rows in phase 2.
 *  - [[hashSample]] is a pure filter (codegen'd, no shuffle): deterministic
 *    Bernoulli by hash threshold, the idiom for a reproducible corpus
 *    subsample that is stable under re-runs and cluster re-partitioning.
 *
 * Determinism / oracle contract: ordering uses the hex md5 of the id
 * (lexicographic), which is byte-identical across engines (same cross-engine
 * family as `MinHash.md5Signatures`), with the id itself as tie-break.
 */
object Curation {

  /** Cross-engine deterministic rank: hex md5 of the id's string form. */
  def hashRank(id: Column): Column = md5(id.cast("string"))

  /**
   * At most `k` rows per `key`, chosen as the k smallest (md5(id), id) —
   * a deterministic uniform sample without replacement per key.
   *
   * @param salts phase-1 fan-out; bounds the widest per-task sort at
   *              (hottest key)/salts rows. 1 degenerates to a single window
   *              (the small-data path; the spec checks both agree).
   */
  def capPerKey(df: DataFrame, key: Column, id: Column, k: Int,
                salts: Int = 64): DataFrame = {
    require(k > 0 && salts > 0, s"k and salts must be positive, got k=$k salts=$salts")
    val h = hashRank(id)
    val ranked =
      if (salts == 1) df
      else {
        // phase 1: per (key, hash-salt) top-k — the per-key global top-k
        // rows are each top-k of their own sub-group, so none is lost
        val salt = pmod(xxhash64(id), lit(salts.toLong))
        val w1 = Window.partitionBy(key, salt).orderBy(h.asc, id.asc)
        df.withColumn("__r1", row_number().over(w1))
          .filter(col("__r1") <= k).drop("__r1")
      }
    // phase 2: exact per-key top-k over <= salts*k survivors per key
    val w2 = Window.partitionBy(key).orderBy(h.asc, id.asc)
    ranked.withColumn("__r2", row_number().over(w2))
      .filter(col("__r2") <= k).drop("__r2")
  }

  /** Position of the id's hash in [0, 2^32) — the shared deterministic
   * uniform variate behind every sampling operator here. */
  def hashPosition(id: Column): Column =
    conv(substring(hashRank(id), 1, 8), 16, 10).cast("long")

  /**
   * Deterministic Bernoulli sample: keeps a row iff the first 8 hex chars
   * of md5(id) (as a 32-bit value) fall under `fraction` of the hash space.
   * Same rows survive on every engine, every run, every partitioning.
   */
  def hashSample(df: DataFrame, id: Column, fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction must be in [0,1], got $fraction")
    df.filter(hashPosition(id) < lit((fraction * 4294967296.0).toLong))
  }

  /**
   * Deterministic PER-ROW weighted Bernoulli: keeps a row iff its hash
   * position falls under `weight`·2^32 (floor semantics — the threshold is
   * truncated to a long on both engines, so the boundary row set is exact).
   * `weight` is any Column in [0,1] — a quality score, a per-language
   * mixture rate, an upsampling temperature — making this the one-pass
   * quality-weighted subsample of a training corpus. Pure codegen'd filter:
   * no shuffle, stable under re-runs and re-partitioning.
   */
  def sampleByWeight(df: DataFrame, id: Column, weight: Column): DataFrame =
    df.filter(hashPosition(id) < (weight * lit(4294967296.0)).cast("long"))

  /**
   * Deterministic stratified sample: one keep-fraction per `key` value
   * (source / language / quality bucket), `default` for unlisted keys —
   * the mixture re-weighting step that turns a raw crawl into a training
   * mix with target per-source proportions.
   */
  def stratifiedSample(df: DataFrame, key: Column, id: Column,
                       fractions: Map[String, Double],
                       default: Double = 0.0): DataFrame = {
    require((default +: fractions.values.toSeq).forall(f => f >= 0.0 && f <= 1.0),
      "every fraction must be in [0,1]")
    val w = fractions.foldLeft(lit(default)) { case (acc, (k, f)) =>
      when(key === lit(k), lit(f)).otherwise(acc)
    }
    sampleByWeight(df, id, w)
  }

  /**
   * Temperature-based mixture sampling (the mT5/XLM-R multilingual rule,
   * Xue et al. 2021 §3.1): target sampling probability per key (language /
   * source) p_k ∝ (n_k/N)^τ with τ < 1 flattening the head — realized as a
   * deterministic per-row keep rate, since a filter can only DOWN-sample:
   * rate_k = (n_k/n_min)^(τ−1), which is 1 for the rarest key and shrinks
   * the dominant keys toward the tempered mixture. Unlike
   * [[stratifiedSample]] the rates are computed FROM the corpus (one k-row
   * aggregate), not supplied.
   *
   * Scale shape: ONE map-side-combined groupBy(key) over the corpus,
   * collected — k = #distinct keys (languages / sources) is small by
   * contract, so this is O(k) driver data, the same class as the
   * bucket-offset collects in [[graft.core.Ranking]] (deriving n_min from
   * an uncollected counts frame would re-run the corpus aggregation a
   * second time). Rates are then computed ON A k-ROW LOCAL FRAME with the
   * engine's own pow/round expressions (cross-engine oracle parity),
   * broadcast-joined back, and fed to the pure codegen'd
   * [[sampleByWeight]] filter — two corpus scans total, no wide shuffle.
   * Rates are rounded to 1e-6 BEFORE thresholding so pow() ulp differences
   * cannot flip a row between engines. Keys compare by their string form.
   *
   * Returns the kept rows with a `mix_rate` column (the rounded keep rate).
   */
  def temperatureMix(df: DataFrame, key: Column, id: Column,
                     tau: Double): DataFrame = {
    require(tau > 0.0 && tau <= 1.0, s"tau must be in (0,1], got $tau")
    val spark = df.sparkSession
    import spark.implicits._
    val counts = df.groupBy(key.cast("string").as("__mk"))
      .agg(count(lit(1)).as("__n")).as[(String, Long)].collect()
    // empty corpus (everything filtered upstream): no rates to compute —
    // return the empty frame with the output schema instead of empty.min
    if (counts.isEmpty) return df.withColumn("mix_rate", lit(0.0)).limit(0)
    val nMin = counts.iterator.map(_._2).min
    val rates = counts.toSeq.toDF("__mk", "__n")
      .select(col("__mk"),
        round(pow(col("__n").cast("double") / lit(nMin.toDouble), lit(tau - 1.0)), 6)
          .as("mix_rate"))
    // null-safe equality: a NULL key is a real stratum (it was counted
    // above) — plain === would silently drop those rows from the output
    sampleByWeight(df.join(broadcast(rates), key.cast("string") <=> col("__mk")),
      id, col("mix_rate")).drop("__mk")
  }

  /**
   * Weighted sample WITHOUT replacement of exactly `k` rows (Efraimidis &
   * Spirakis 2006 "A-Res" priority sampling): each row draws the
   * deterministic uniform u = (hashPosition+1)/2³² ∈ (0,1] and is ranked by
   * the key u^(1/w) — the top k keys are a weight-proportional sample, the
   * exact fixed-size counterpart of the Bernoulli [[sampleByWeight]] (which
   * cannot hit a row budget). `weight` must be positive (a token count, a
   * quality score, an upsampling temperature).
   *
   * Scale/plan shape: `orderBy(key desc).limit(k)` compiles to
   * TakeOrderedAndProject — a per-partition top-k heap with a driver merge
   * of partitions·k rows, never a global sort/window. Deterministic across
   * engines, runs, and partitionings (same md5 family as [[hashSample]];
   * ties break on the id).
   */
  def prioritySample(df: DataFrame, id: Column, weight: Column, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val u = (hashPosition(id) + lit(1L)).cast("double") / lit(4294967296.0)
    val key = pow(u, lit(1.0) / weight.cast("double"))
    df.withColumn("__pkey", key)
      .orderBy(col("__pkey").desc, id.asc)
      .limit(k)
      .drop("__pkey")
  }

  /**
   * Deterministic global shuffle for training-data ordering: assigns every
   * row a 0-based `shuffle_pos` = its global rank under (md5(id), id) — a
   * reproducible random permutation of the corpus that is identical across
   * runs, engines, and partitionings. Training pipelines need exactly this
   * (fixed data order ⇒ reproducible training runs, resumable epoch
   * offsets); a `Window.orderBy` with no partition would funnel the corpus
   * through ONE task, so the rank comes from [[graft.core.Ranking]]'s
   * range-repartition + broadcast prefix-sum (no single-task stage,
   * O(n log n) shuffle).
   */
  def shufflePositions(df: DataFrame, id: Column,
                       posName: String = "shuffle_pos",
                       buckets: Int = 256): DataFrame =
    graft.core.Ranking.globalRank(
      df.withColumn("__srank", hashRank(id)),
      Seq(col("__srank").asc, id.asc), posName, buckets).drop("__srank")

  /**
   * Leakage-safe train/holdout split: the side is decided by the hash of a
   * GROUP key (host, domain, source, dedup-cluster id), never the row id,
   * so documents sharing a group — the rows most likely to be near
   * duplicates of each other — can never straddle the split. This is the
   * standard guard against train→eval contamination that a row-level
   * Bernoulli split cannot give. Deterministic (same md5 family as
   * [[hashSample]]), partitioning-invariant, pure codegen'd projection: no
   * shuffle, no state, safe at any corpus size. P(holdout) ≈
   * `holdoutFraction` per GROUP — row shares skew with group sizes, which
   * is inherent to any group-keyed split.
   */
  def groupSplit(df: DataFrame, groupKey: Column,
                 holdoutFraction: Double): DataFrame = {
    require(holdoutFraction >= 0.0 && holdoutFraction <= 1.0,
      s"holdoutFraction must be in [0,1], got $holdoutFraction")
    df.withColumn("split",
      when(hashPosition(groupKey) <
             lit((holdoutFraction * 4294967296.0).toLong), lit("holdout"))
        .otherwise(lit("train")))
  }

  /** C4 line-keep rule (Raffel et al. 2020, §2.2 "Colossal Clean Crawled
   * Corpus" heuristics): a line survives iff it ends in a terminal
   * punctuation mark (. ! ? "), has at least `minWords` words, and does not
   * mention javascript. Pure codegen'd boolean — usable standalone as a
   * filter predicate over pre-split lines. */
  def c4LineKeep(line: Column, minWords: Int = 5): Column =
    rtrim(line).rlike("[.!?\"]$") &&
      size(regexp_extract_all(line, lit("[^ \\t]+"), lit(0))) >= minWords &&
      !lower(line).contains("javascript")

  /**
   * C4 document cleaning: split on newlines, keep lines by [[c4LineKeep]],
   * and apply the document-level rules — drop documents with fewer than
   * `minKeptLines` surviving lines ("fewer than 3 sentences"), any
   * "lorem ipsum" placeholder text, or a curly brace (code). Returns a
   * struct (n_lines, n_kept, has_lorem, has_brace, keep, clean) where
   * `clean` is the kept lines re-joined — everything is array/lambda
   * Column expressions inside whole-stage codegen: per-document work only,
   * no shuffle, no UDF, applied in the same scan as the rest of the
   * quality columns.
   */
  def c4Stats(text: Column, minWords: Int = 5, minKeptLines: Int = 3): Column = {
    val lines = split(text, "\n")
    val kept = filter(lines, l => c4LineKeep(l, minWords))
    val hasLorem = lower(text).contains("lorem ipsum")
    val hasBrace = text.contains("{")
    struct(
      size(lines).cast("long").as("n_lines"),
      size(kept).cast("long").as("n_kept"),
      hasLorem.as("has_lorem"),
      hasBrace.as("has_brace"),
      (size(kept) >= minKeptLines && !hasLorem && !hasBrace).as("keep"),
      array_join(kept, "\n").as("clean"))
  }

  /**
   * Sequence packing — assign documents to training sequences ("bins") of
   * at most `capTokens` tokens, the batching step every LLM training
   * pipeline runs between curation and tokenized-shard writing. Documents
   * are first scattered into `buckets` deterministic hash buckets
   * ([[hashPosition]] mod buckets), then packed CONTIGUOUS-GREEDY in id
   * order within each bucket: a document that would overflow the open bin
   * closes it and starts the next (an oversize document > capTokens gets a
   * bin of its own). Returns one row per document: (id, bucket, bin) with
   * bin numbering starting at 0 per bucket — (bucket, bin) is the global
   * sequence key.
   *
   * Scale shape: packing is inherently sequential, so the parallelism unit
   * is the bucket — size `buckets` to the cluster (e.g. 10⁵ buckets over
   * 10¹² docs keeps ~10⁷ docs per sequential scan) and each bucket is
   * packed by a STREAMING O(1)-memory fold: one shuffle to co-locate each
   * bucket (`repartition(bucket)` + in-partition sort), then a single
   * `mapPartitions` pass that never materializes the bucket. The fold is
   * the one genuinely order-dependent scan in this library, which is why
   * it is per-partition imperative code rather than a window: a window
   * cannot express the data-dependent running-sum reset, and a
   * `collect_list` per bucket would materialize the whole bucket in one
   * row. Deterministic and partitioning-invariant: bucket membership and
   * in-bucket order depend only on ids.
   *
   * `id` must cast to long (the cross-engine in-bucket order key).
   */
  def packSequences(df: DataFrame, id: Column, tokens: Column,
                    capTokens: Long, buckets: Int): DataFrame = {
    require(capTokens > 0, s"capTokens must be positive, got $capTokens")
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(id.cast("long").as("id"), tokens.cast("long").as("tokens"))
      .withColumn("bucket", pmod(hashPosition(col("id")), lit(buckets.toLong)))
      .repartition(col("bucket"))
      .sortWithinPartitions(col("bucket"), col("id"))
      .as[(Long, Long, Long)]
      .mapPartitions { it =>
        // several buckets can share a partition (hash of bucket id); the
        // (bucket, id) sort makes each a contiguous run — reset on change
        var curBucket = -1L; var bin = 0L; var acc = 0L
        var first = true
        it.map { case (docId, t, b) =>
          if (first || b != curBucket) {
            curBucket = b; bin = 0L; acc = t; first = false
          } else if (acc + t > capTokens) {
            bin += 1; acc = t
          } else acc += t
          (docId, b, bin)
        }
      }
      .toDF("id", "bucket", "bin")
  }

  /**
   * Per-key distribution profile of a numeric column — the curation
   * diagnostic behind length-filter thresholds (what ARE this source's
   * p50/p90/p99 token counts?). `exact = true` uses the exact interpolated
   * percentile (the p·(n−1) linear-interpolation definition DuckDB's
   * `quantile_cont` shares — oracle-replayable), which buffers each
   * group's values in the aggregate: right for profiling runs and modest
   * group sizes. At the full 10^12-document scale pass `exact = false` for
   * `approx_percentile` (GK sketch, bounded memory) — same output shape.
   */
  def profile(df: DataFrame, key: Column, value: Column,
              ps: Seq[Double] = Seq(0.5, 0.9, 0.99),
              exact: Boolean = true): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1), s"bad quantiles $ps")
    val qs = ps.map { p =>
      val c = if (exact) percentile(value, lit(p))
              else approx_percentile(value, lit(p), lit(10000))
      round(c, 6).as(s"p${(p * 100).round}")
    }
    df.groupBy(key.as("key"))
      .agg(count(lit(1)).as("n"), qs: _*)
  }

  /**
   * Sliding-window chunking of long documents — the context-window prep
   * step between cleaning and packing: a document of n tokens becomes
   * windows of `window` tokens starting every `stride` tokens (overlap =
   * window − stride), the last window clipped to the document end. Emits
   * (id, chunk_id, start_tok, len); empty documents produce no chunks.
   *
   * One narrow pass: token count via [[TextAnalysis.tokenCount]], then a
   * `sequence`+`explode` fan-out of O(n/stride) rows per document — no
   * join, no shuffle, codegen throughout.
   */
  def chunkWindows(df: DataFrame, id: Column, text: Column,
                   window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    df.select(id.as("id"), TextAnalysis.tokenCount(text).cast("long").as("n"))
      .filter(col("n") > 0)
      .select(col("id"), col("n"),
        explode(sequence(lit(0L), col("n") - 1, lit(stride.toLong))).as("start_tok"))
      .select(col("id"),
        (col("start_tok") / lit(stride.toLong)).cast("long").as("chunk_id"),
        col("start_tok"),
        least(lit(window.toLong), col("n") - col("start_tok")).as("len"))
  }

  /** Per-sequence utilization of a [[packSequences]] assignment joined back
   * to the token counts: (bucket, bin, n_docs, seq_tokens, fill). */
  def packedBinStats(packed: DataFrame, tokens: DataFrame,
                     capTokens: Long): DataFrame =
    packed.join(tokens, Seq("id"))
      .groupBy("bucket", "bin")
      .agg(count(lit(1)).as("n_docs"), sum("tokens").as("seq_tokens"))
      .withColumn("fill", round(col("seq_tokens") / lit(capTokens.toDouble), 6))
}
