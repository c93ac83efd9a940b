package graft.tools


/** Builder-side micro-bench: time named SparkEntry queries on an sf dir,
  * interleaved passes, best-of-N — the headline-bench methodology without
  * the full suite. Usage:
  *   runMain graft.tools.QueryTime <sfDir> <q1,q2,...> [passes=3]
  */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(',').toSeq
    val passes = if (args.length > 2) args(2).toInt else 3
    val spark = graft.Bench.probeSession(32)
    // shared JIT/parquet warm-up (the Bench main's discipline)
    try graft.SparkEntry.queries("q_out_degree")(spark, sfDir).count()
    catch { case _: Throwable => }
    val acc = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    for (_ <- 1 to passes; q <- names) {
      val t0 = System.nanoTime()
      val ok = try { graft.SparkEntry.queries(q)(spark, sfDir).count(); true }
        catch { case e: Throwable => System.err.println(s"$q FAILED: $e"); false }
      if (ok) acc(q) :+= (System.nanoTime() - t0) / 1e9
    }
    names.foreach { q =>
      val rs = acc(q)
      if (rs.nonEmpty)
        println(f"QT $q%-28s best=${rs.min}%7.3f s runs=${rs.map(r => f"$r%.3f").mkString(",")}")
      else println(s"QT $q FAILED")
    }
    spark.stop()
  }
}
