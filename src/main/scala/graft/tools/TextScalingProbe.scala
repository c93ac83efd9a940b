package graft.tools


/** Builder-side probe for the text 10× scaling leg in isolation (the full
  * [[graft.Bench]] main wraps it in the whole headline suite): prints the
  * leg JSON for a given sf dir. Usage: runMain graft.tools.TextScalingProbe
  * [sfDir] */
object TextScalingProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = graft.Bench.probeSession(32)
    val (full, compact) = graft.Bench.textScalingLeg(spark, sfDir)
    println("TEXT_SCALING_FULL=" + full)
    println("TEXT_SCALING_COMPACT=" + compact)
    spark.stop()
  }
}
