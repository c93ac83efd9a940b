package graft.tools

import org.apache.spark.sql.SparkSession

/**
 * Time individual SparkEntry queries in one JVM — the A/B harness for
 * isolating a code change's effect from host drift (run variant A and B
 * interleaved in the same session, compare medians).
 *
 * Usage: sbt "runMain graft.tools.QueryBench q_wcc,q_bfs [repeats]"
 * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
 *      SPARK_GRAFT_CPUS (default 32).
 */
object QueryBench {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("q_pagerank").split(",").map(_.trim).toSeq
    val repeats = args.lift(1).map(_.toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", "/dev/shm/graft-spark-local")
      .config("spark.network.timeout", "600s")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // shared JIT/parquet warm-up so run 1 isn't charged harness cost
    graft.SparkEntry.queries("q_out_degree")(s, sfDir).count()
    for (r <- 1 to repeats; name <- names) {
      val fn = graft.SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val rows = fn(s, sfDir).collect()
      val sec = (System.nanoTime() - t0) / 1e9
      // order-insensitive content hash: catches run-to-run nondeterminism
      // (e.g. float-summation-order tie flips) across repeats
      val h = rows.map(_.toString).sorted.mkString("\n").hashCode
      val steps = graft.core.MetricsLedger.snapshot.get(name)
        .map(n => s" supersteps=$n").getOrElse("")
      println(f"QBENCH $name run=$r sec=$sec%.2f rows=${rows.length} hash=$h$steps")
    }
    s.stop()
  }
}
