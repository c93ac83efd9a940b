package graft.alg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.core.Graph

/**
 * p-core / k-core decomposition — iterative peeling of vertices whose
 * (weighted) degree is below the threshold, reference semantics
 * (`/root/reference/src/alg/totem_pcores.cu:212-304`): p steps from `start`
 * by `step`; a vertex's output is the last p-round it survived.
 * With unit weights and a single round this is classic k-core.
 */
object Cores {

  /** Vertices of the k-core subgraph (undirected degree ≥ k after iterated
   * peeling). Returns (vid). */
  def kCore(edges: DataFrame, k: Int, maxRounds: Int = 1000): DataFrame = {
    val und = Graph.undirected(edges)
    var e = und.persist(StorageLevel.MEMORY_AND_DISK)
    var changed = true
    var round = 0
    while (changed && round < maxRounds) {
      val deg = e.groupBy(col(Graph.SRC).as(Graph.VID)).agg(count(lit(1)).as("deg"))
      val keep = deg.filter(col("deg") >= k).select(Graph.VID)
      val pruned = Graph.subgraph(e, keep)
        .transform(graft.core.Lineage.cut)
      changed = pruned.count() != e.count()
      e.unpersist(blocking = false)
      e = pruned
      round += 1
    }
    e.select(col(Graph.SRC).as(Graph.VID)).distinct()
  }

  /** p-core decomposition: (vid, pcore) where pcore = highest threshold at
   * which the vertex still survived peeling. */
  def pCores(edges: DataFrame, start: Int, step: Int, maxP: Int): DataFrame = {
    val spark = edges.sparkSession
    var result = Graph.vertices(edges).select(col(Graph.VID), lit(0).as("pcore"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var p = start
    while (p <= maxP) {
      val survivors = kCore(edges, p)
      if (survivors.isEmpty) { p = maxP + step }
      else {
        val updated = result
          .join(survivors.withColumn("__s", lit(true)), Seq(Graph.VID), "left")
          .select(col(Graph.VID),
            when(col("__s").isNotNull, lit(p)).otherwise(col("pcore")).as("pcore"))
          .transform(graft.core.Lineage.cut)
        result.unpersist(blocking = false)
        result = updated
      }
      p += step
    }
    result
  }
}
