package graft.ann

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/**
 * IVF (inverted-file) approximate nearest neighbour over an embedding
 * column — the coarse-quantizer companion to [[Ann.lshTopK]] (the brief's
 * "IVF or LSH-bucketed variant as the scale path"; this engine ships both):
 *
 *  1. TRAIN: deterministic Lloyd k-means on a bounded driver-side sample
 *     (the standard IVF recipe — faiss trains its quantizer on a sample
 *     too; the sample is capped, so driver memory is O(sampleN·dim)
 *     regardless of corpus size);
 *  2. ASSIGN: every corpus vector to its max-cosine centroid. Relationally:
 *     corpus ⋈ broadcast(centroid table) → per-row best centroid via
 *     max(struct(sim, -cid)). The nlist-way row expansion lives only inside
 *     the task pipeline — Catalyst's partial aggregation collapses it
 *     map-side, so the shuffle stays corpus-sized; compute is the inherent
 *     IVF corpus×nlist distance evaluation;
 *  3. PROBE: each query scores the centroid table (broadcast, tiny), keeps
 *     its `nprobe` best lists, and joins the assignment table on the list
 *     id — a bucket join exactly like the LSH path, touching
 *     O(corpus · nprobe / nlist) candidates per query.
 *
 * Determinism: centroid init is an id-ordered stride over the sample, all
 * ties break on (-sim, cid) structs — same data in, same lists out.
 */
object Ivf {

  /** Lloyd k-means (cosine/spherical: vectors and centroids L2-normalized,
   * assignment by max dot product) on an id-ordered sample collected to the
   * driver. Returns nlist centroid vectors. */
  def trainCentroids(corpus: DataFrame, nlist: Int, sampleN: Int = 4096,
                     iters: Int = 10,
                     id: String = "vec_id", vec: String = "embedding"): Array[Array[Double]] = {
    val sample: Array[Array[Double]] = corpus
      .orderBy(col(id)).limit(sampleN)
      .select(col(vec)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
      .map(normalize)
    require(sample.length >= nlist, s"sample ${sample.length} < nlist $nlist")
    val dim = sample.head.length
    // init: even stride over the id-ordered sample
    var cents = Array.tabulate(nlist)(i => sample((i * sample.length) / nlist).clone())
    for (_ <- 1 to iters) {
      val sums = Array.fill(nlist, dim)(0.0)
      val counts = new Array[Long](nlist)
      sample.foreach { x =>
        val c = nearest(x, cents)
        var d = 0
        while (d < dim) { sums(c)(d) += x(d); d += 1 }
        counts(c) += 1
      }
      cents = Array.tabulate(nlist) { c =>
        if (counts(c) == 0) cents(c) // empty list keeps its centroid
        else normalize(sums(c))
      }
    }
    cents
  }

  private def normalize(x: Array[Double]): Array[Double] = {
    val n = math.sqrt(x.map(v => v * v).sum)
    if (n == 0) x else x.map(_ / n)
  }

  private def nearest(x: Array[Double], cents: Array[Array[Double]]): Int = {
    var best = 0; var bestDot = Double.MinValue
    var c = 0
    while (c < cents.length) {
      var dot = 0.0; var d = 0
      while (d < x.length) { dot += x(d) * cents(c)(d); d += 1 }
      if (dot > bestDot) { bestDot = dot; best = c }
      c += 1
    }
    best
  }

  /** Centroid table (cid, cvec) — tiny, always broadcast. */
  private def centroidDf(corpus: DataFrame, cents: Array[Array[Double]]): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    cents.zipWithIndex.map { case (c, i) => (i, c.map(_.toFloat).toSeq) }
      .toSeq.toDF("cid", "cvec")
  }

  /** Inverted lists: every corpus vector labeled with its max-cosine
   * centroid id. One broadcast join + map-side-combined min/max aggregate —
   * one corpus-sized shuffle. */
  def assign(corpus: DataFrame, cents: Array[Array[Double]],
             id: String = "vec_id", vec: String = "embedding"): DataFrame = {
    val scored = corpus.join(broadcast(centroidDf(corpus, cents)))
      .select(col(id), col(vec),
        struct(Ann.cosine(col(vec), col("cvec")).as("sim"), (-col("cid")).as("nc")).as("s"))
    scored.groupBy(col(id), col(vec))
      .agg(max("s").as("best"))
      .select(col(id), col(vec), (-col("best.nc")).as("cid"))
  }

  /** IVF approximate top-k: (query_id, vec_id, sim, rank). */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nlist: Int = 16, nprobe: Int = 4, sampleN: Int = 4096,
              id: String = "vec_id", vec: String = "embedding",
              qid: String = "query_id", qvec: String = "q_embedding"): DataFrame = {
    val cents = trainCentroids(corpus, nlist, sampleN, id = id, vec = vec)
    val lists = assign(corpus, cents, id, vec).persist(StorageLevel.MEMORY_AND_DISK)
    val cdf = centroidDf(corpus, cents)
    // per-query nprobe best lists (query side is small: window is per-query)
    val wq = Window.partitionBy(qid).orderBy(col("csim").desc, col("cid"))
    val probes = queries.join(broadcast(cdf))
      .select(col(qid), col(qvec), col("cid"),
        Ann.cosine(col(qvec), col("cvec")).as("csim"))
      .withColumn("pr", row_number().over(wq)).filter(col("pr") <= nprobe)
      .select(col(qid), col(qvec), col("cid"))
    val scored = probes.join(lists, "cid")
      .select(col(qid), col(id), round(Ann.cosine(col(qvec), col(vec)), 9).as("sim"))
    val w = Window.partitionBy(qid).orderBy(col("sim").desc, col(id))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
