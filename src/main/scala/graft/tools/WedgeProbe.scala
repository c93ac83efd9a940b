package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch perf probe: the cocitation/coupling wedge count two ways on the
 * dense eMOD graph (the q_cocitation shape — Σ fanout² ≈ 62M wedge rows):
 *
 *   A. the shipped plan — prefix self-join on the pivot, filter a < b,
 *      groupBy pair (LinkPrediction.pivotOverlapTopK's candidate stage);
 *   B. grouped-array expansion — collect each pivot's sorted out-list
 *      once, explode ordered index pairs (i < j) directly, groupBy pair
 *      (no join, no post-generation halving).
 *
 * Both must report identical pair totals; wall time decides whether the
 * array form replaces the join in pivotOverlapTopK.
 */
object WedgeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark-local")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"WEDGE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val e = graft.core.Lineage.cut(
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select((col("l_orderkey") % 500).as("src"), (col("l_partkey") % 500).as("dst"))
        .filter(col("src") =!= col("dst")).distinct())
    println(s"edges = ${e.count()}")

    for (pass <- 1 to 2) {
      println(s"--- pass $pass ---")
      val joinCnt = e.select(col("src").as("w"), col("dst").as("a"))
        .join(e.select(col("src").as("w"), col("dst").as("b")), Seq("w"))
        .filter(col("a") < col("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("c"))
      val ja = time("A self-join")(joinCnt.agg(sum("c"), count(lit(1))).collect()(0))
      println(s"  A wedges=${ja.getLong(0)} pairs=${ja.getLong(1)}")

      val grouped = e.groupBy(col("src").as("w"))
        .agg(sort_array(collect_list(col("dst"))).as("ns"))
      val arrCnt = grouped
        .select(posexplode(col("ns")).as(Seq("i", "a")), col("ns"))
        .select(col("a"), explode(slice(col("ns"), col("i") + 2, size(col("ns")))).as("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("c"))
      val jb = time("B grouped-array")(arrCnt.agg(sum("c"), count(lit(1))).collect()(0))
      println(s"  B wedges=${jb.getLong(0)} pairs=${jb.getLong(1)}")
    }
    spark.stop()
  }
}
