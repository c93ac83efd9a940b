package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import java.util.concurrent.atomic.LongAdder

/**
 * Tuning harness for the north rule's two-cluster-size scaling leg: runs the
 * SAME 5-round PageRank on the SAME pre-generated RMAT graph under a matrix
 * of config variants and core counts, reporting per-run GTEPS plus total
 * shuffle bytes/records (the bandwidth evidence — this host's single socket
 * is the bottleneck at 32 cores, see BASELINE.md).
 *
 * Usage: sbt "runMain graft.tools.ScalingProbe [scale] [cores,cores,...] [variant,...]"
 * Variants: base | zstd | nocomp | snappy | cache_uncomp | noaqe, with
 * suffixes _part2x (2×cores shuffle partitions) / _fp (fixed data-sized 32);
 * prefix wcc_/wccnj_ runs WCC (pointer jumping on/off) instead of PageRank.
 */
object ScalingProbe {

  private final class ShuffleMeter extends SparkListener {
    val bytes = new LongAdder; val records = new LongAdder
    val readBytes = new LongAdder
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        bytes.add(m.shuffleWriteMetrics.bytesWritten)
        records.add(m.shuffleWriteMetrics.recordsWritten)
        readBytes.add(m.shuffleReadMetrics.totalBytesRead)
      }
    }
    def reset(): Unit = { bytes.reset(); records.reset(); readBytes.reset() }
  }

  private def session(cores: Int, variant: String): SparkSession = {
    // codec/config selection matches on the BASE name with the _part2x/_fp
    // suffixes stripped (a suffixed variant like zstd_fp must select zstd,
    // not silently fall through to the default codec while its output rows
    // are labeled zstd_fp); unknown bases are rejected loudly.
    val base = variant.stripSuffix("_part2x").stripSuffix("_fp")
    val b = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-probe-$variant-$cores")
      .config("spark.sql.shuffle.partitions",
        if (variant.endsWith("_part2x")) cores * 2
        else if (variant.endsWith("_fp")) 32 // fixed, data-sized (cluster-faithful)
        else cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", base != "noaqe")
      .config("spark.local.dir", graft.Bench.localDir)
      // the sandbox host occasionally stalls the whole VM for >2 min; do not
      // let the heartbeat receiver kill the local executor over it
      .config("spark.network.timeout", "600s")
      // the chunked adjacency caches rows carrying up-to-4096-long arrays;
      // at the default 10000-row columnar batch a single cache batch is a
      // ~300 MB humongous allocation (measured: GCLocker retry storms, then
      // heap exhaustion on rmat s24 at 16g). 512 rows ≈ 16 MB batches keep
      // the cache G1-friendly at any graph scale; plan shape is unaffected
      .config("spark.sql.inMemoryColumnarStorage.batchSize", "512")
    base match {
      case "zstd"   => b.config("spark.io.compression.codec", "zstd")
      case "snappy" => b.config("spark.io.compression.codec", "snappy")
      case "nocomp" => b.config("spark.shuffle.compress", "false")
        .config("spark.shuffle.spill.compress", "false")
      case "cache_uncomp" => b.config("spark.sql.inMemoryColumnarStorage.compressed", "false")
      case "base" | "noaqe" =>
      case other => throw new IllegalArgumentException(
        s"unknown probe variant base '$other' (from '$variant')")
    }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val scale = args.headOption.map(_.toInt).getOrElse(22)
    val coreSets = args.lift(1).getOrElse("8,32").split(",").map(_.trim.toInt).toSeq
    val variants = args.lift(2).getOrElse("base").split(",").map(_.trim).toSeq
    val path = s"/tmp/graft_bench_rmat_s$scale"

    if (!new java.io.File(path + "/_SUCCESS").exists()) {
      val s = session(32, "base")
      graft.gen.GraphGen.rmat(s, scale, 16, seed = 1985).write.mode("overwrite").parquet(path)
      s.stop()
    }

    val sb = new StringBuilder("variant,cores,run,gteps,wall_sec,shuf_write_mb,shuf_records\n")
    for (v <- variants; c <- coreSets) {
      val s = session(c, v.stripPrefix("wcc_").stripPrefix("wccnj_"))
      val meter = new ShuffleMeter
      s.sparkContext.addSparkListener(meter)
      val edges = s.read.parquet(path)
      def once(): (Double, Double, Int) =
        if (v.startsWith("wcc")) {
          // WCC leg: wall + supersteps (pointer jumping on unless wccnj_*)
          val t0 = System.nanoTime()
          val res = graft.alg.ConnectedComponents.run(edges, pointerJump = !v.startsWith("wccnj"))
          res.components.count()
          val wall = (System.nanoTime() - t0) / 1e9
          (res.metrics.map(_.edgesTraversed).sum / wall / 1e9, wall, res.metrics.size)
        } else {
          val res = graft.alg.PageRank.run(edges)
          val trv = res.metrics.map(_.edgesTraversed).sum
          val wall = res.metrics.map(_.wallMs).sum / 1000.0
          (trv / wall / 1e9, wall, res.metrics.size)
        }
      once() // warm-up (JIT + page cache), then 3 measured
      for (r <- 1 to 3) {
        meter.reset()
        val (gteps, wall, steps) = once()
        val line = f"$v,$c,$r,$gteps%.5f,$wall%.2f," +
          f"${meter.bytes.sum() / 1e6}%.1f,${meter.records.sum()},steps=$steps"
        println("PROBE " + line)
        sb.append(line).append('\n')
      }
      s.stop()
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/probe_out.csv"), sb.toString)
    println("PROBE done")
  }
}
