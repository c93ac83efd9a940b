package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Distributed PCA over an embedding column — the whitening/compression
 * primitive of a large-scale vector curation pipeline (SemDeDup-style
 * pipelines center+rotate before cosine bucketing; IVF/PQ indexes train on
 * the top principal subspace). Extends the reference's analytics surface
 * the way the ANN family does (the reference, a native graph engine under
 * `/root/reference/src/totem`, has no vector ops); determinism discipline
 * matches it: results are a pure function of the input.
 *
 * Scale shape: the covariance estimate is ONE pass — elements are
 * quantized to integer micro-units (×1e6, the same exact-sum device as
 * the feature-smoothing and DSIR ops), the d and d·(d+1)/2 moment groups
 * are hash-aggregated with map-side combine, so the exchange carries
 * O(partitions · d²) rows no matter how many vectors flow in. BIGINT
 * moment sums are exact and ORDER-FREE, which is what lets a SQL oracle
 * reproduce the doubles bit-for-bit; at 10^12-vector scale the same plan
 * runs with double sums (the micro-unit scale exists for cross-engine
 * verification, and overflows past ~1e18 total mass — document'd cap).
 *
 * The d×d eigen step is DRIVER-side power iteration (d² doubles — O(1)
 * data like the k-means centers); the projection back onto the corpus is
 * a codegen'd narrow pass with the component folded in as literals.
 */
object Pca {

  /** Upper-triangle covariance entries (i, j, cov), 0-based dims, i ≤ j.
   * cov = E[xy] − E[x]E[y] over micro-unit-exact sums: with
   * u = floor(x·1e6 + 0.5), cov = (Σuᵢuⱼ/n − (Σuᵢ/n)(Σuⱼ/n))/1e12 —
   * every double derived from exact BIGINTs in a FIXED operation order, so
   * any engine replaying the same divisions reproduces the exact bit
   * pattern. Deliberately NOT rounded: a post-division round(…, 6) sits on
   * a .5 representation boundary for ~1/1000 values and Spark's
   * BigDecimal HALF_UP disagrees with other engines' multiply-by-1e6
   * rounding there (the q_pca_cov round-3 lesson; same nano-unit
   * discipline as [[graft.text.Dsir]]). */
  def covariance(points: DataFrame, id: String = "vec_id",
                 vec: String = "embedding"): DataFrame = {
    val u = points.select(
      transform(col(vec), v => floor(v.cast("double") * lit(1e6) + lit(0.5))
        .cast("long")).as("u"))
    val el = u.select(col("u"), posexplode(col("u")).as(Seq("i", "ui")))
    // ONE corpus pass: first moments ride the diagonal groups of the pair
    // aggregate (sum(ui) where i=j, count = per-dim n), so the moment table
    // never re-reads the input; d(d+1)/2 groups, map-side combined
    val m = el.select(col("i"), col("ui"), posexplode(col("u")).as(Seq("j", "uj")))
      .filter(col("j") >= col("i"))
      .groupBy("i", "j").agg(
        sum(col("ui") * col("uj")).as("sxy"),
        sum(when(col("i") === col("j"), col("ui"))).as("sdiag"),
        count(lit(1)).as("cnt"))
      .persist()
    val m1 = m.filter(col("i") === col("j"))
      .select(col("i").as("k"), col("sdiag").as("s"), col("cnt").as("n"))
    val n = col("n").cast("double")
    m.join(broadcast(m1.select(col("k").as("i"), col("s").as("si"), col("n"))), Seq("i"))
      .join(broadcast(m1.select(col("k").as("j"), col("s").as("sj"))), Seq("j"))
      .select(col("i").cast("long").as("i"), col("j").cast("long").as("j"),
        ((col("sxy").cast("double") / n
          - (col("si").cast("double") / n) * (col("sj").cast("double") / n))
          / lit(1e12)).as("cov"))
  }

  /** Top principal component of a collected upper-triangle covariance
   * (from [[covariance]]): deterministic power iteration from the uniform
   * start vector, `iters` fixed steps, sign-normalized so the
   * largest-magnitude coordinate is positive. Driver-side: d×d doubles. */
  def topComponent(cov: Array[(Int, Int, Double)], iters: Int = 50): Array[Double] = {
    require(cov.nonEmpty, "empty covariance")
    val d = cov.iterator.map(c => math.max(c._1, c._2)).max + 1
    val m = Array.ofDim[Double](d, d)
    cov.foreach { case (i, j, v) => m(i)(j) = v; m(j)(i) = v }
    var x = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    for (_ <- 0 until iters) {
      val y = Array.tabulate(d)(i => {
        var acc = 0.0; var j = 0
        while (j < d) { acc += m(i)(j) * x(j); j += 1 }
        acc
      })
      val norm = math.sqrt(y.map(v => v * v).sum)
      x = if (norm == 0.0) x else y.map(_ / norm)
    }
    val lead = x.indices.maxBy(i => (math.abs(x(i)), -i))
    if (x(lead) < 0) x.map(v => -v) else x
  }

  /** Projection of every vector onto a fixed component — the component is
   * folded in as literals, so this is one narrow codegen'd pass (no join,
   * no shuffle). Ordered left-to-right sum, same contract as
   * [[Ann.cosine]]. */
  def project(points: DataFrame, component: Array[Double],
              id: String = "vec_id", vec: String = "embedding"): DataFrame = {
    val proj: Column = component.zipWithIndex.map { case (w, i) =>
      element_at(col(vec), i + 1).cast("double") * lit(w)
    }.reduce(_ + _)
    points.select(col(id), proj.as("projection"))
  }
}
