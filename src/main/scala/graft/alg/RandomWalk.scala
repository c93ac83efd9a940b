package graft.alg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.core.{Adjacency, Graph}

/**
 * Deterministic graph random walks — the sampling primitive a graph-
 * embedding training pipeline (DeepWalk/node2vec-style corpus generation)
 * needs, made REPRODUCIBLE: step `i` of walk `w` at a vertex of degree `d`
 * moves to the `idx`-th smallest distinct out-neighbor, where
 * `idx = hash48(seed|w|i) mod d` and hash48 is the first 48 bits of the
 * md5 hex — a keyed-hash index, uniform over neighbors up to a 2^-48·d
 * modulo bias, and a pure function of (seed, walk, step), so runs are
 * replayable across engines and resumable mid-corpus (the same
 * cross-engine md5 trick as the MinHash/SimHash families in
 * [[graft.dedup]]).
 *
 * Scale shape: the walk step is a join + element lookup, NOT an
 * aggregation — state (O(walks)) joins a positional adjacency
 * (sorted neighbor arrays, chunked at `chunkSize` so no task ever owns a
 * whole super-hub row) and projects `element_at(nbrs, idx)`. Per step the
 * plan touches O(walks) rows, not O(frontier edges); an argmin-over-
 * neighbors formulation was measured to lose whole-stage codegen to a
 * SortAggregate over every frontier edge (min over a struct is not
 * hash-aggregable), which is why the index form is used. All walks
 * advance together, one superstep per step; walks stop at sinks.
 */
object RandomWalk {

  /** Walks of `length` steps from every vertex of `starts` (one walk per
   * start, walk id = start vid). Returns (walk, step, vid): step 0 is the
   * start itself; a walk that hits a sink has no rows past it. */
  def walks(edges: DataFrame, starts: DataFrame, length: Int,
            seed: Long = 42L, chunkSize: Int = Adjacency.DefaultChunk): DataFrame = {
    // positional adjacency: per src, neighbors sorted ascending, chunked by
    // rank — the per-src window is partitioned (never a global sort), a
    // one-time build cost like the CSR build, reused by every step
    val e = edges.select(col(Graph.SRC), col(Graph.DST)).distinct()
    val byRank = Window.partitionBy(Graph.SRC).orderBy(Graph.DST)
    val perSrc = Window.partitionBy(Graph.SRC)
    val adj = e
      .select(col(Graph.SRC), col(Graph.DST),
        (row_number().over(byRank).cast("long") - 1L).as("rn"),
        count(lit(1)).over(perSrc).as("deg"))
      .groupBy(col(Graph.SRC), (col("rn") / chunkSize).cast("long").as("chunk"))
      // a chunk holds a CONTIGUOUS sorted rank range, so re-sorting its
      // values reconstructs position order without carrying rn
      .agg(first("deg").as("deg"), sort_array(collect_list(col(Graph.DST))).as("nbrs"))
      .repartition(col(Graph.SRC))
      .persist(StorageLevel.MEMORY_AND_DISK)
    adj.count() // build once (init-time, like Adjacency.build)

    val frames = Seq.newBuilder[DataFrame]
    var state = graft.core.Lineage.cut(starts.select(col(Graph.VID).as("walk"),
      lit(0).as("step"), col(Graph.VID).as(Graph.VID)))
    frames += state
    for (i <- 1 to length) {
      // 48-bit keyed hash of (seed, walk, step): conv(hex,16,10) mirrors the
      // oracle's per-digit parse exactly
      val keyed = state.select(col("walk"), col(Graph.VID),
        conv(substring(md5(concat_ws("|", lit(seed), col("walk"), lit(i))), 1, 12),
          16, 10).cast("long").as("__h"))
      val next = keyed.hint("shuffle_hash")
        .join(adj, keyed(Graph.VID) === adj(Graph.SRC))
        .withColumn("__i", pmod(col("__h"), col("deg")))
        // non-hub vertices have exactly one chunk; hubs fan out deg/chunkSize
        // rows and the filter keeps the one holding position __i
        .filter(col("chunk") === (col("__i") / chunkSize).cast("long"))
        .select(col("walk"), lit(i).as("step"),
          element_at(col("nbrs"), (pmod(col("__i"), lit(chunkSize)) + 1).cast("int"))
            .as(Graph.VID))
      state = graft.core.Lineage.cut(next)
      frames += state
    }
    adj.unpersist(blocking = false)
    frames.result().reduce(_.unionByName(_))
  }

  /** Walks from every vertex of the graph. */
  def walksFromAll(edges: DataFrame, length: Int, seed: Long = 42L): DataFrame = {
    // cut: the adjacency build and the every-vertex start set otherwise
    // each re-execute the upstream edge derivation; both are forced
    // eagerly inside walks(), so owned blocks release on return
    val (e0, ownE) = Graph.ensureCut(edges)
    try walks(e0, Graph.vertices(e0), length, seed)
    finally if (ownE) graft.core.Lineage.release(e0)
  }

  /**
   * Second-order biased walks (node2vec, Grover & Leskovec 2016): at step
   * `i` a walk at `cur` that arrived from `prev` weights each out-neighbor
   * `n` by 1/p if n = prev (return), 1 if (prev, n) is an edge (stay
   * local), 1/q otherwise (explore). The choice is the deterministic
   * inverse-CDF draw: t = hash48(seed|walk|i)/2^48 · Σw, pick the first
   * neighbor (ascending) whose running weight exceeds t. Step 1 has
   * prev = start, so every candidate is "local" and the draw is uniform.
   *
   * Determinism across engines: p and q MUST be powers of two (default
   * p = 2, q = 0.5 — a locally-biased walk), so every weight, running sum,
   * and total is an exact dyadic double — summation order cannot matter —
   * and the only rounded value, t, is computed by the identical expression
   * on both sides. t < Σw always holds (h ≤ 2^48−1 keeps the product a
   * half-ulp below the total), so a walk only halts at a sink.
   *
   * Scale shape: per step the plan touches O(frontier out-edges) rows —
   * inherent to node2vec, which must score every neighbor against prev's
   * adjacency. The membership probe rides the grouped SORTED out-list
   * (`array_contains` against a per-vertex adjacency array — the
   * LinkPrediction wedge device): the build side is V grouped rows,
   * persisted already hash-partitioned on its key, so each step pays one
   * candidate-stream shuffle on `prev` and ZERO build-side shuffle —
   * replacing the edge-keyed (prev, nbr) join that re-shuffled E build
   * rows every step. The array lives only on the join's build side and is
   * dropped in the join projection, so hub out-lists are never copied per
   * candidate row. The running sum stays a per-walk window, never global.
   */
  def biasedWalks(edges: DataFrame, starts: DataFrame, length: Int,
                  p: Double = 2.0, q: Double = 0.5, seed: Long = 42L): DataFrame = {
    def isPow2(x: Double) = { val l = math.log(x) / math.log(2); l == math.rint(l) }
    require(isPow2(p) && isPow2(q), s"p and q must be powers of two, got p=$p q=$q")
    val e = edges.select(col(Graph.SRC), col(Graph.DST)).distinct()
      .repartition(col(Graph.SRC))
      .persist(StorageLevel.MEMORY_AND_DISK)
    e.count()
    // grouped sorted adjacency for the membership probe: V rows, built once,
    // persisted in the groupBy's own HashPartitioning(p2) so the per-step
    // join never re-shuffles it
    val grouped = e.groupBy(col(Graph.SRC).as("p2"))
      .agg(sort_array(collect_list(col(Graph.DST))).as("pns"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    grouped.count()

    val frames = Seq.newBuilder[DataFrame]
    var state = graft.core.Lineage.cut(starts.select(col(Graph.VID).as("walk"),
      col(Graph.VID).as("prev"), col(Graph.VID).as(Graph.VID)))
    frames += state.select(col("walk"), lit(0).as("step"), col(Graph.VID))
    val byNbr = Window.partitionBy(col("walk")).orderBy(col("nbr"))
    val whole = Window.partitionBy(col("walk"))
    for (i <- 1 to length) {
      val cand = state.hint("shuffle_hash")
        .join(e, state(Graph.VID) === e(Graph.SRC))
        .select(col("walk"), col("prev"), state(Graph.VID).as("cur"),
          e(Graph.DST).as("nbr"))
      val weighted = cand.hint("shuffle_hash")
        .join(grouped, cand("prev") === grouped("p2"), "left")
        // array_contains(null, _) is null → falls through to 1/q, matching
        // the old left-join-miss behavior for a prev with no out-edges
        .select(col("walk"), col("prev"), col("cur"), col("nbr"),
          when(col("nbr") === col("prev"), lit(1.0 / p))
            .when(array_contains(col("pns"), col("nbr")), lit(1.0))
            .otherwise(lit(1.0 / q)).as("wt"))
      val h = conv(substring(md5(concat_ws("|", lit(seed), col("walk"), lit(i))), 1, 12),
        16, 10).cast("long")
      val next = weighted
        .withColumn("cum", sum(col("wt")).over(byNbr))
        .withColumn("t", (h.cast("double") / lit(281474976710656.0)) *
          sum(col("wt")).over(whole))
        .filter(col("cum") > col("t") && col("cum") - col("wt") <= col("t"))
        .select(col("walk"), col("cur").as("prev"), col("nbr").as(Graph.VID))
      state = graft.core.Lineage.cut(next)
      frames += state.select(col("walk"), lit(i).as("step"), col(Graph.VID))
    }
    e.unpersist(blocking = false); grouped.unpersist(blocking = false)
    frames.result().reduce(_.unionByName(_))
  }

  /**
   * Negative sampling for the skip-gram objective (word2vec's unigram^0.75
   * noise distribution, Mikolov et al. 2013) — `k` noise vertices per walk
   * position, drawn ∝ corpusFrequency^power where the corpus is the walk
   * table itself. Completes the embedding-training data path:
   * [[walks]] → [[contextPairs]] → negativeSamples.
   *
   * Determinism and cross-engine exactness: weights are quantized to
   * integer micro-units once (`floor(freq^power·1e6 + 0.5)` — the one
   * float expression, same pow-then-round discipline as temperatureMix),
   * after which EVERYTHING is exact integer arithmetic: the cumulative
   * interval table is a BIGINT running sum in vid order
   * ([[graft.core.Ranking.globalRunningSum]] — range-partitioned, no
   * global window), the draw is `t = hash48(seed|walk|step|slot) mod Σw`,
   * and the picked vertex is the one whose [lo, hi) interval contains t.
   *
   * Scale shape: the interval lookup is a BUCKETED equi-join, not a range
   * join — each vocabulary interval explodes into the ⌈w/bucketWidth⌉+1
   * buckets it overlaps (≤ `buckets` rows even for a vertex holding all
   * the mass) and each draw probes exactly one bucket; the filter
   * `lo ≤ t < hi` finishes the pick. Bucketing is an execution detail
   * only — results are bucket-count-invariant — so the DuckDB oracle uses
   * a plain range join. Bucket width uses `div` (integer division), never
   * double division, so the math stays exact past 2^53.
   */
  def negativeSamples(walks: DataFrame, k: Int, power: Double = 0.75,
                      seed: Long = 42L, buckets: Int = 1024): DataFrame = {
    require(k >= 1 && buckets >= 1)
    val spark = walks.sparkSession
    val w = walks.groupBy(col(Graph.VID))
      .agg(count(lit(1)).as("freq"))
      .select(col(Graph.VID),
        floor(pow(col("freq").cast("double"), lit(power)) * 1e6 + 0.5)
          .cast("long").as("w"))
    val cum = graft.core.Ranking
      .globalRunningSum(w, Seq(col(Graph.VID).asc), col("w"), "hi")
      .withColumn("lo", col("hi") - col("w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totalRow = cum.agg(coalesce(max("hi"), lit(0L))).collect()(0)
    val total = totalRow.getLong(0)
    if (total <= 0L) {
      cum.unpersist(blocking = false)
      return walks.select(col("walk"), col("step"), lit(1).as("slot"),
        col(Graph.VID).as("neg")).limit(0)
    }
    val bw = (total + buckets - 1) / buckets
    val index = cum.withColumn("b",
      explode(sequence(expr(s"lo div $bw"), expr(s"(hi - 1) div $bw"))))
    val draws = walks.select(col("walk"), col("step"))
      .withColumn("slot", explode(sequence(lit(1), lit(k))))
      .withColumn("t", pmod(
        conv(substring(md5(concat_ws("|", lit(seed), col("walk"), col("step"),
          col("slot"))), 1, 12), 16, 10).cast("long"), lit(total)))
      .withColumn("b", expr(s"t div $bw"))
    val out = draws.hint("shuffle_hash").join(index, "b")
      .filter(col("lo") <= col("t") && col("t") < col("hi"))
      .select(col("walk"), col("step"), col("slot"), col(Graph.VID).as("neg"))
    cum.unpersist(blocking = false)
    out
  }

  /**
   * Skip-gram training pairs from a walk corpus — the step that turns
   * [[walks]]/[[biasedWalks]] output into what an embedding trainer
   * (DeepWalk/node2vec, word2vec objective) actually consumes: every
   * (center, context) vertex pair whose positions in the same walk are at
   * most `window` apart, with the signed `offset` (context − center
   * position) kept for position-weighted objectives.
   *
   * Scale shape: ONE walk-keyed aggregation folds each walk into its
   * ordered step sequence (bounded at length+1 elements — walks are short
   * by construction, so the collect_list is O(length), never a hub-sized
   * array), then pair generation is a pure codegen'd array expression +
   * explode: per walk O(length·window) output rows and zero further
   * shuffle. The walk² self-join formulation this replaces would shuffle
   * the corpus twice and produce length² candidates per walk before the
   * window filter.
   */
  def contextPairs(walks: DataFrame, window: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    // struct sort key = (step, vid); steps are unique per walk so this is
    // exactly the step order, and sink-halted walks just yield fewer pairs
    walks.groupBy(col("walk"))
      .agg(array_sort(collect_list(struct(col("step"), col(Graph.VID)))).as("seq"))
      .select(col("walk"), explode(expr(
        s"""flatten(transform(sequence(0, size(seq) - 1), i ->
              transform(
                filter(sequence(greatest(0, i - $window),
                                least(size(seq) - 1, i + $window)), j -> j != i),
                j -> struct(seq[i].vid AS center, seq[j].vid AS context,
                            j - i AS offset))))""")).as("pr"))
      .select(col("walk"), col("pr.center"), col("pr.context"), col("pr.offset"))
  }
}
