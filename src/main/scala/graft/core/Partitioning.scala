package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Degree-aware partitioning — the Spark analog of Totem's alpha/lambda
 * degree-sorted partition assignment
 * (`/root/reference/src/totem/totem_partition.cu:264-397`): vertices are
 * sorted by degree and assigned to buckets until each bucket holds its
 * *edge-count* share (fractions measured in edges, not vertices —
 * `totem_attributes.h:59-74`).
 *
 * On Spark this is a physical-layout choice, not a Catalyst rule: the
 * bucket id drives `repartition(numBuckets, col("bucket"))` so that every
 * task owns roughly the same number of EDGES even under power-law skew.
 */
object Partitioning {

  /**
   * Assign each vertex a bucket in [0, numBuckets) such that buckets carry
   * (approximately) equal out-edge mass. Descending-degree order mirrors
   * Totem's HIGH partitioning (`totem_partition.cu:264-397`); the running
   * cumulative-degree sum is the direct analog of its "assign vertices until
   * the partition holds its edge fraction" loop.
   *
   * Returns (vid, deg, bucket).
   */
  def edgeBalancedBuckets(edges: DataFrame, numBuckets: Int): DataFrame = {
    val deg = Graph.outDegrees(edges)
    // coalesce: sum over zero rows is null — an empty snapshot is a
    // legitimate incremental-pipeline input, not a crash
    val total = deg.agg(coalesce(sum("deg"), lit(0L)))
      .collect()(0).getLong(0).toDouble max 1.0
    // distributed running sum in (deg desc, vid) order — range-partitioned
    // per-bucket windows + broadcast prefix-sum offsets (Ranking), never a
    // single-task global window
    Ranking.globalRunningSum(deg, Seq(col("deg").desc, col(Graph.VID)), col("deg"), "cum")
      .withColumn("bucket",
        least(floor((col("cum") - col("deg")) / lit(total) * numBuckets),
          lit(numBuckets - 1)).cast("int"))
      .select(col(Graph.VID), col("deg"), col("bucket"))
  }

  /**
   * Sort-free variant: bucket by hash of vid but give the top-K hubs
   * dedicated buckets — approximates edge balance without any global order.
   * Cheaper than [[edgeBalancedBuckets]] (which is itself distributed via
   * range-partitioned running sums) when an approximate balance suffices.
   */
  def hubIsolatedBuckets(edges: DataFrame, numBuckets: Int, hubDegree: Long): DataFrame = {
    val deg = Graph.outDegrees(edges)
    // disjoint ranges: hubs own [0, hubB), non-hubs hash over the REMAINING
    // [hubB, numBuckets) — hashing non-hubs over the full range would pile a
    // regular share on top of every hub bucket, defeating the isolation
    val hubB = numBuckets / 4 max 1
    val rest = numBuckets - hubB
    val nonHub =
      if (rest > 0)
        lit(hubB) + pmod(xxhash64(col(Graph.VID), lit(1L)), lit(rest))
      else pmod(xxhash64(col(Graph.VID), lit(1L)), lit(numBuckets)) // no room to isolate
    deg.withColumn("bucket",
      when(col("deg") >= hubDegree,
        pmod(xxhash64(col(Graph.VID)), lit(hubB)).cast("int"))
        .otherwise(nonHub.cast("int")))
      .select(col(Graph.VID), col("deg"), col("bucket"))
  }

  /** Salting column for skewed join/group keys: spreads one hot key over
   * `factor` sub-keys. Pair with a second-level aggregation to recombine.
   * (Totem's analog: splitting a super-vertex across virtual warps.) */
  def salt(key: Column, factor: Int): Column =
    concat(key.cast("string"), lit("#"), pmod(spark_partition_id(), lit(factor)).cast("string"))

  /** Per-partition conductance φ(S) = cut(S) / min(vol(S), vol(V∖S)) of a
   * vertex→part assignment — the partition-quality dual of [[modularity]]
   * (low conductance = few escaping edges relative to the smaller side's
   * edge mass; the objective bounded by Cheeger's inequality). `parts` has
   * columns (vid, part); the graph is treated as undirected (both directed
   * slots of every edge counted, self-loops dropped — the [[Spinner]]
   * convention, so this scores its output directly). Vertices without a
   * part assignment are excluded (inner joins). One edge-sized double join
   * + one k-row aggregate; no windows, no collects beyond the k-row result.
   *
   * Returns (part, cut, vol, conductance) with conductance rounded to 6 dp
   * (cross-engine float contract); a part holding all edge mass (vol =
   * total) reports conductance 0. */
  def conductance(edges: DataFrame, parts: DataFrame): DataFrame = {
    val sym = Graph.undirected(edges).filter(col(Graph.SRC) =!= col(Graph.DST))
    val tagged = sym
      .join(parts.select(col(Graph.VID).as(Graph.SRC), col("part").as("__ps")), Graph.SRC)
      .join(parts.select(col(Graph.VID).as(Graph.DST), col("part").as("__pd")), Graph.DST)
    val byPart = tagged.groupBy(col("__ps").as("part"))
      .agg(sum(when(col("__ps") =!= col("__pd"), 1L).otherwise(0L)).as("cut"),
        count(lit(1)).as("vol"))
    // total vol via a window-free broadcast: one 1-row cross join
    val total = byPart.agg(sum("vol").as("__tot"))
    byPart.crossJoin(broadcast(total))
      .select(col("part"), col("cut"), col("vol"),
        when(col("vol") === col("__tot"), lit(0.0)) // lone part: no outside
          .otherwise(round(col("cut") / least(col("vol"), col("__tot") - col("vol")), 6))
          .as("conductance"))
  }

  /** Newman-Girvan modularity Q of a vertex→part assignment —
   * `partition_modularity` (`totem_partition.cu:109-140`).
   * `parts` has columns (vid, part). Expects a symmetrized edge table. */
  def modularity(edges: DataFrame, parts: DataFrame): Double = {
    val m = edges.count().toDouble // directed edge slots (2|E| for undirected)
    val e2 = edges
      .join(parts.select(col(Graph.VID).as("__v1"), col("part").as("p1")), col(Graph.SRC) === col("__v1"))
      .join(parts.select(col(Graph.VID).as("__v2"), col("part").as("p2")), col(Graph.DST) === col("__v2"))
    val within = e2.filter(col("p1") === col("p2")).count().toDouble / m
    val degByPart = edges.groupBy(col(Graph.SRC)).agg(count(lit(1)).as("d"))
      .join(parts.withColumnRenamed(Graph.VID, Graph.SRC), Graph.SRC)
      .groupBy("part").agg(sum("d").as("dp"))
    val expect = degByPart.select(sum(pow(col("dp") / m, 2))).collect()(0).getDouble(0)
    within - expect
  }
}
