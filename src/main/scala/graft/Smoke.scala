package graft

import org.apache.spark.sql.SparkSession

/** Tiny smoke main mirroring the driver's t1 check: SparkEntry.entry must
 * return rows > 0. Usage: runMain graft.Smoke */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.network.timeout", "600s") // survive hypervisor stalls
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.entry(spark)
    val rows = df.count()
    df.show(10, truncate = false)
    println(s"ENTRY_ROWS=$rows")
    spark.stop()
    if (rows <= 0) sys.exit(1)
  }
}
