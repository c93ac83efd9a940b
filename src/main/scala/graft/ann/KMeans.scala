package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/**
 * Deterministic Lloyd k-means over an embedding column — the clustering
 * primitive a training-data curation pipeline needs (semantic bucketing,
 * cluster-balanced sampling, per-cluster dedup budgets). Extends the
 * reference's analytics surface the same way the ANN family does: the
 * reference (a native graph engine, see `/root/reference/src/totem`) has no
 * vector ops; this follows its determinism discipline instead — every
 * result is a pure function of (input, k, iters), no RNG.
 *
 * Scale shape (the 100 TB path, same layout as Spark MLlib's KMeans):
 * centers live on the DRIVER (k × dim doubles — O(1) data, like the
 * bucket-offset collects in [[graft.core.Ranking]]) and are folded into the
 * assignment projection as literals, so the assign step is ONE codegen'd
 * narrow pass over the points — no join, no shuffle. The update step is a
 * posexplode + groupBy(cid, pos) aggregate whose map-side partial
 * aggregation collapses each partition to ≤ k·dim rows before the exchange;
 * shuffle volume is O(partitions · k · dim), independent of n.
 *
 * Cross-engine determinism (the DuckDB oracle replays the exact float
 * path): squared distance uses the dot-product decomposition
 * ‖p−c‖² = p·p − 2 p·c + c·c with ordered left-to-right sums (the same
 * contract as [[Ann.cosine]], hash-verified by q_ann_topk), distances are
 * rounded to 9 decimals with cid as tiebreak, and centroid coordinates are
 * rounded to 6 decimals each iteration so both engines iterate from
 * IDENTICAL centers.
 */
object KMeans {

  /** Ordered-sum dot product of two double-array columns (left to right —
   * bitwise-reproducible across engines that sum in element order).
   * Shared with [[Coreset]], which uses the same distance contract. */
  private[ann] def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  final case class Model(
      /** (vec_id, cid, dist2): every point, its cluster, rounded ‖p−c‖². */
      assignments: DataFrame,
      /** cid -> centroid (rounded), post final update. */
      centers: Array[(Int, Array[Double])],
      iterations: Int)

  /**
   * Lloyd's algorithm, `iters` fixed iterations. Initial centers are the
   * embeddings of the `k` smallest ids (deterministic, oracle-replayable —
   * k-means++ would need an RNG order the SQL oracle cannot replay).
   * Assignment i uses centers i−1; the returned assignments are those of
   * the FINAL iteration (centers updated `iters` times, assigned once more
   * only implicitly by the caller if wanted).
   */
  def run(points: DataFrame, k: Int, iters: Int,
          id: String = "vec_id", vec: String = "embedding"): Model = {
    val p = points
      .select(col(id), transform(col(vec), _.cast("double")).as("e"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // deterministic init: k lowest ids (tiny collect, O(k·dim) driver data)
    var centers: Array[(Int, Array[Double])] =
      p.orderBy(col(id)).limit(k).collect()
        .zipWithIndex
        .map { case (r, i) => i -> r.getSeq[Double](1).toArray }

    var assigned: DataFrame = null
    for (_ <- 1 to iters) {
      assigned = assign(p, id, centers)
      // element-wise mean per cluster: explode to (cid, pos, val); the
      // partial aggregate caps the exchange at partitions · k · dim rows
      val means = assigned
        .select(col("cid"), posexplode(col("e")))
        .groupBy(col("cid"), col("pos"))
        .agg(round(avg(col("col")), 6).as("v"))
        .groupBy(col("cid"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("v")))),
          s => s.getField("v")).as("ctr"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
        .toMap
      // an emptied cluster keeps its previous center (deterministic; the
      // oracle mirrors with COALESCE over a left join)
      centers = centers.map { case (cid, old) => cid -> means.getOrElse(cid, old) }
    }
    Model(assign(p, id, centers).drop("e"), centers, iters)
  }

  /** One codegen'd pass: argmin over k literal centers, no join. `least`
   * over (dist2, cid) structs = lexicographic min = cid tiebreak. */
  private def assign(p: DataFrame, id: String,
                     centers: Array[(Int, Array[Double])]): DataFrame = {
    val selfDot = dot(col("e"), col("e"))
    val scored = centers.map { case (cid, ctr) =>
      val c = lit(ctr)
      val cc = ctr.map(x => x * x).sum // driver-side constant, ordered sum
      struct(round(selfDot - lit(2.0) * dot(col("e"), c) + lit(cc), 9).as("dist2"),
        lit(cid).as("cid"))
    }
    val best = if (scored.length == 1) scored.head else least(scored: _*)
    p.select(col(id), best.as("best"), col("e"))
      .select(col(id), col("best.cid").as("cid"), col("best.dist2").as("dist2"), col("e"))
  }

  /**
   * Cluster-balanced deterministic sample: the `perCluster` points of each
   * cluster with the smallest md5(id) — the curation move that keeps a
   * training mix from collapsing onto its densest semantic modes. Hash
   * order, not distance order, so the sample is unbiased WITHIN a cluster.
   */
  def clusterSample(assignments: DataFrame, perCluster: Int,
                    id: String = "vec_id"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cid")).orderBy(md5(col(id).cast("string")), col(id))
    assignments.select(col(id), col("cid"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= perCluster)
  }
}
