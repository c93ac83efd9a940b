package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/**
 * Gonzalez greedy k-center — the coreset-selection primitive of a
 * data-pruning pipeline: pick k maximally-spread representatives (each new
 * center is the point FARTHEST from the chosen set — a 2-approximation of
 * the optimal k-center radius), then assign every vector to its nearest
 * representative. Where [[KMeans]] finds density modes, the k-center sweep
 * finds COVERAGE — the standard seed step for diversity-preserving corpus
 * pruning and for IVF/PQ codebooks that must not ignore sparse regions.
 *
 * Deterministic and oracle-replayable like [[KMeans]]: the first center is
 * the minimum id; distances use the same ordered-sum p·p − 2p·c + c·c
 * decomposition rounded to 9 decimals (see [[KMeans.dot]]), argmax ties
 * break on the smaller id, and assignment ties on the smaller center id.
 *
 * Scale shape: chosen centers live on the DRIVER (k × dim doubles) and fold
 * into each round's scan as literals, so every round is ONE codegen'd
 * narrow pass ending in a TakeOrdered(1) — no join, no shuffle of the
 * corpus; k rounds = k passes (k is small by construction). Assignment is
 * the same one-pass argmin as k-means.
 */
object Coreset {

  private def d2(e: Column, ctr: Array[Double]): Column = {
    val cc = ctr.map(x => x * x).sum // driver-side constant, ordered sum
    round(KMeans.dot(e, e) - lit(2.0) * KMeans.dot(e, lit(ctr)) + lit(cc), 9)
  }

  /** The k chosen centers in selection order: (vec_id, coordinates). */
  def centers(points: DataFrame, k: Int, id: String = "vec_id",
              vec: String = "embedding"): Array[(Long, Array[Double])] = {
    require(k > 0, s"k must be positive, got $k")
    val p = points.select(col(id).cast("long").as("id"),
        transform(col(vec), _.cast("double")).as("e"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val first = p.orderBy("id").limit(1).collect()
    require(first.nonEmpty, "k-center needs a non-empty corpus")
    val chosen = scala.collection.mutable.ArrayBuffer[(Long, Array[Double])](
      first(0).getLong(0) -> first(0).getSeq[Double](1).toArray)
    while (chosen.size < k) {
      val ds = chosen.map(c => d2(col("e"), c._2)).toSeq
      val md = if (ds.length == 1) ds.head else least(ds: _*)
      val next = p.select(col("id"), col("e"), md.as("md"))
        .orderBy(col("md").desc, col("id")).limit(1).collect()(0)
      chosen += next.getLong(0) -> next.getSeq[Double](1).toArray
    }
    p.unpersist(blocking = false)
    chosen.toArray
  }

  /** Nearest-representative assignment (vec_id, center_id, dist2) — one
   * codegen'd argmin pass over the literal-folded centers, ties to the
   * smaller center id. */
  def assign(points: DataFrame, centers: Array[(Long, Array[Double])],
             id: String = "vec_id", vec: String = "embedding"): DataFrame = {
    require(centers.nonEmpty, "no centers")
    val e = transform(col(vec), _.cast("double"))
    val scored = centers.map { case (cid, ctr) =>
      struct(d2(e, ctr).as("dist2"), lit(cid).as("center_id"))
    }
    val best = if (scored.length == 1) scored.head else least(scored.toSeq: _*)
    points.select(col(id), best.as("b"))
      .select(col(id), col("b.center_id").as("center_id"),
        col("b.dist2").as("dist2"))
  }
}
