package graft.alg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.core.Graph

/**
 * p-core / k-core decomposition — iterative peeling of vertices whose
 * (weighted) degree is below the threshold, reference semantics
 * (`/root/reference/src/alg/totem_pcores.cu:212-304`): p steps from `start`
 * by `step`; a vertex's output is the last p-round it survived. The
 * reference peels on the SUM OF EDGE WEIGHTS (its `pcores` kernel
 * accumulates `weights[e]`, not edge counts); `weighted = true` reproduces
 * that, `weighted = false` is classic k-core on edge counts.
 */
object Cores {

  /** Vertices of the k-core subgraph ((weighted) undirected degree ≥ k
   * after iterated peeling). Returns (vid). */
  def kCore(edges: DataFrame, k: Double, maxRounds: Int = 1000,
            weighted: Boolean = false): DataFrame = {
    val und =
      if (weighted) {
        val w = edges.select(col(Graph.SRC), col(Graph.DST), col("weight").cast("double"))
        w.union(w.select(col(Graph.DST).as(Graph.SRC), col(Graph.SRC).as(Graph.DST), col("weight")))
          .distinct()
      } else Graph.undirected(edges)
    val degExpr = if (weighted) sum("weight") else count(lit(1)).cast("double")
    var e = und.persist(StorageLevel.MEMORY_AND_DISK)
    var changed = true
    var round = 0
    while (changed && round < maxRounds) {
      val deg = e.groupBy(col(Graph.SRC).as(Graph.VID)).agg(degExpr.as("deg"))
      val keep = deg.filter(col("deg") >= k).select(Graph.VID)
      val pruned = Graph.subgraph(e, keep)
        .transform(graft.core.Lineage.cut)
      changed = pruned.count() != e.count()
      e.unpersist(blocking = false)
      graft.core.Lineage.release(e)
      e = pruned
      round += 1
    }
    e.select(col(Graph.SRC).as(Graph.VID)).distinct()
  }

  /** p-core decomposition: (vid, pcore) where pcore = highest threshold at
   * which the vertex still survived peeling (`totem_pcores.cu:212-304`:
   * thresholds run start, start+step, ... ≤ maxP over weighted degrees). */
  def pCores(edges: DataFrame, start: Double, step: Double, maxP: Double,
             weighted: Boolean = false): DataFrame = {
    var result = Graph.vertices(edges).select(col(Graph.VID), lit(0.0).as("pcore"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var p = start
    while (p <= maxP) {
      val survivors = kCore(edges, p, weighted = weighted)
      if (survivors.isEmpty) { p = maxP + step }
      else {
        val updated = result
          .join(survivors.withColumn("__s", lit(true)), Seq(Graph.VID), "left")
          .select(col(Graph.VID),
            when(col("__s").isNotNull, lit(p)).otherwise(col("pcore")).as("pcore"))
          .transform(graft.core.Lineage.cut)
        result.unpersist(blocking = false)
        graft.core.Lineage.release(result)
        result = updated
      }
      p += step
    }
    result
  }
}
