package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Product quantization — the last rung of the vector-index compression
 * ladder (brute → LSH → IVF → scalar → PQ): split each d-dim vector into
 * `m` contiguous subvectors, k-means each subspace independently, and
 * store per-subspace centroid ids. An m×log2(k)-bit code replaces the
 * vector (m=4, k=8 → 12 bits vs 2048 for float32×64), and asymmetric
 * distance scans need only m table lookups per candidate.
 *
 * Deterministic like [[KMeans]] (whose Lloyd loop this reuses per
 * subspace — same smallest-id seeding, same rounded-double contract, so
 * the same SQL oracle machinery replays every subspace exactly).
 *
 * Scale shape: m independent KMeans runs over SLICED projections of one
 * corpus — each is the KMeans plan (driver-held centers folded into a
 * narrow codegen'd assign pass; update shuffle O(partitions·k·subDim));
 * the final union is concatenation, no extra shuffle. The slice projection
 * prunes to the subvector before anything else touches the row.
 */
object Pq {

  /** Per-subspace PQ assignments (sub, vec_id, code, dist2): subspace
   * `sub` covers dims [sub·d/m, (sub+1)·d/m); `code` is the centroid id
   * in that subspace's codebook; dist2 the rounded ‖p_sub − c‖². */
  def codes(points: DataFrame, m: Int, k: Int, iters: Int,
            id: String = "vec_id", vec: String = "embedding"): DataFrame = {
    require(m > 0 && k > 0 && iters > 0, s"need positive m/k/iters, got $m/$k/$iters")
    val head = points.select(size(col(vec)).as("d")).limit(1).collect()
    require(head.nonEmpty, "PQ needs a non-empty corpus to size subspaces")
    val dim = head(0).getInt(0)
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val sub = dim / m
    (0 until m).map { s =>
      val sliced = points.select(col(id),
        slice(col(vec), s * sub + 1, sub).as(vec))
      KMeans.run(sliced, k, iters, id, vec).assignments
        .select(lit(s).as("sub"), col(id),
          col("cid").cast("long").as("code"), col("dist2"))
    }.reduce(_.unionByName(_))
  }

  /** Packed form (id, codes: array<long>) — codes(i) = subspace i's
   * centroid id; the persistence layout of a PQ index. */
  def encode(points: DataFrame, m: Int, k: Int, iters: Int,
             id: String = "vec_id", vec: String = "embedding"): DataFrame =
    codes(points, m, k, iters, id, vec)
      .groupBy(id).agg(array_sort(collect_list(struct(col("sub"), col("code"))))
        .as("sc"))
      .select(col(id), transform(col("sc"), x => x("code")).as("codes"))
}
