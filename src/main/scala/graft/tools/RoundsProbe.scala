package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: print supersteps-to-fixpoint for the round-unrolled oracle
 * queries (MIS / coloring / matching) on the driver graphs, so the unroll
 * depth in SparkEntry's DuckDB SQL can be set with explicit margin instead
 * of guessed. Usage: runMain graft.tools.RoundsProbe /root/testdata/sf0.01 */
object RoundsProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-rounds-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val eMOD = li.select((col("l_orderkey") % 500).as("src"),
        (col("l_partkey") % 500).as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
    val ePS = li.select(col("l_partkey").as("src"),
      (lit(1000000L) + col("l_suppkey")).as("dst")).distinct()

    val mis = graft.alg.Independent.mis(eMOD)
    println(s"PROBE mis(eMOD) supersteps=${mis.metrics.size}")

    val colMod = graft.alg.Independent.coloring(eMOD)
    println(s"PROBE coloring(eMOD) supersteps=${colMod.metrics.size} colors=${colMod.numColors}")

    val colPs = graft.alg.Independent.coloring(ePS)
    println(s"PROBE coloring(ePS) supersteps=${colPs.metrics.size} colors=${colPs.numColors}")

    val colPsCapped = graft.alg.Independent.coloring(ePS, innerRounds = 3)
    println(s"PROBE coloring(ePS,cap3) supersteps=${colPsCapped.metrics.size} " +
      s"colors=${colPsCapped.numColors}")

    val m = graft.alg.Matching.run(eMOD)
    println(s"PROBE matching(eMOD) supersteps=${m.metrics.size} " +
      s"pairs=${m.matching.count()}")

    val mPs = graft.alg.Matching.run(ePS)
    println(s"PROBE matching(ePS) supersteps=${mPs.metrics.size} " +
      s"pairs=${mPs.matching.count()}")

    val aC = least(col("src"), col("dst")); val bC = greatest(col("src"), col("dst"))
    val wMod = eMOD.select(col("src"), col("dst"), ((aC * 7 + bC * 13) % 1000).as("weight"))
    val msf = graft.alg.Msf.run(wMod)
    println(s"PROBE msf(eMOD) phases=${msf.metrics.size} " +
      s"forest=${msf.forest.count()}")

    spark.stop()
  }
}
