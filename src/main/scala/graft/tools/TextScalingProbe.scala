package graft.tools

import org.apache.spark.sql.SparkSession

/** Builder-side probe for the text 10× scaling leg in isolation (the full
  * [[graft.Bench]] main wraps it in the whole headline suite): prints the
  * leg JSON for a given sf dir. Usage: runMain graft.tools.TextScalingProbe
  * [sfDir] */
object TextScalingProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", graft.Bench.localDir)
      .config("spark.sql.inMemoryColumnarStorage.batchSize", "512")
      .config("spark.network.timeout", "600s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (full, compact) = graft.Bench.textScalingLeg(spark, sfDir)
    println("TEXT_SCALING_FULL=" + full)
    println("TEXT_SCALING_COMPACT=" + compact)
    spark.stop()
  }
}
