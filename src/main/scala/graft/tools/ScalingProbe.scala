package graft.tools

import org.apache.spark.sql.SparkSession

/** Quick iteration harness for the two-parallelism scaling experiment —
 * runs only Bench's part 2 (PageRank on the cached RMAT parquet at
 * local[8] vs local[32]) with per-superstep metrics printed.
 * Usage: runMain graft.tools.ScalingProbe [scale] [edgeFactor] */
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    val scale = args.lift(0).map(_.toInt).getOrElse(20)
    val ef = args.lift(1).map(_.toInt).getOrElse(16)
    val coresN = args.lift(2).map(_.toInt).getOrElse(8)
    val cores4N = args.lift(3).map(_.toInt).getOrElse(32)
    val path = s"/tmp/graft_bench_rmat_s$scale"

    // shuffle partitions are a property of the DATA (sized so a partition
    // fits in memory), not of the core count — fixing them across the two
    // parallelism levels isolates the resource-scaling effect, exactly as a
    // cluster keeps partitioning fixed while executors scale N -> 4N
    val parts = args.lift(4).map(_.toInt)
    def session(cores: Int): SparkSession = {
      val s = SparkSession.builder().master(s"local[$cores]")
        .appName(s"scaling-$cores")
        .config("spark.sql.shuffle.partitions", parts.getOrElse(cores))
        // shuffle to tmpfs: a single box's /tmp disk does NOT scale with
        // cores the way per-executor NVMe scales with executors on a
        // cluster; shm removes that artifact from the scaling measurement
        .config("spark.local.dir", "/dev/shm/graft-spark-local")
        .config("spark.sql.inMemoryColumnarStorage.compressed",
          sys.props.getOrElse("graft.cache.compressed", "true"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }

    if (!new java.io.File(path + "/_SUCCESS").exists()) {
      val s = session(32)
      graft.gen.GraphGen.rmat(s, scale, ef, seed = 1985)
        .write.mode("overwrite").parquet(path)
      s.stop()
    }

    val results = Seq(coresN, cores4N).map { cores =>
      val s = session(cores)
      val edges = s.read.parquet(path)
      // warm-up
      graft.alg.PageRank.run(edges)
      val res = graft.alg.PageRank.run(edges, verbose = true)
      val algExec = res.metrics.map(_.wallMs).sum / 1000.0
      val trv = res.metrics.map(_.edgesTraversed).sum
      val g = trv / algExec / 1e9
      println(f"[scaling] cores=$cores alg_exec=${algExec}%.2fs gteps=$g%.5f")
      s.stop()
      g
    }
    println(f"[scaling] efficiency=${(results(1) / results(0)) / 4.0}%.3f")
  }
}
