package graft.tools

/**
 * Engine-independent memory-bandwidth scaling probe (STREAM-triad shape:
 * a[i] = b[i] + s·c[i] over arrays far larger than LLC) at the bench's
 * parallelism levels. Purpose: pin the 8→32-core scaling ceiling of the
 * north-rule leg to the HOST, not the engine — if raw DRAM triad bandwidth
 * itself stops scaling past 8 threads on this single-socket box, then no
 * shuffle-bound Spark job can scale there either, and the compute-bound 2→8
 * leg is the honest proxy for N→4N executors (each real executor brings its
 * own DRAM channels). Levels are interleaved round-robin and reported
 * best-of-N, the same throttle-phase discipline as `graft.Bench`.
 *
 * Usage: sbt "runMain graft.tools.MemBandwidthProbe [threads,threads,...] [runs]"
 * Prints MEMBW,<threads>,<run>,<GB/s>,<wall_s> per run plus a summary line.
 * Traffic counted at the STREAM convention: 24 bytes per element per pass
 * (two reads + one write; write-allocate RFO traffic not counted, so the
 * absolute number is conservative — the RATIO between levels is the point).
 */
object MemBandwidthProbe {

  /** Interleaved best-of-`runs` triad bandwidth (GB/s) per thread level.
   * `n` = doubles per array (3 arrays held live); arrays are allocated,
   * measured, and released inside the call so embedders (graft.Bench runs
   * this to stamp its scaling JSON with the host's own DRAM curve) don't
   * carry the working set past it. */
  def measure(levels: Seq[Int], runs: Int,
              n: Int = 96 * 1024 * 1024,
              report: String => Unit = _ => ()): Map[Int, Double] = {
    val a = new Array[Double](n)
    val b = new Array[Double](n)
    val c = new Array[Double](n)
    java.util.Arrays.fill(b, 1.5)
    java.util.Arrays.fill(c, 2.5)
    val reps = 8

    def triad(threads: Int): (Double, Double) = {
      val chunk = n / threads
      val t0 = System.nanoTime()
      val ts = (0 until threads).map { t =>
        val lo = t * chunk
        val hi = if (t == threads - 1) n else lo + chunk
        new Thread(() => {
          var r = 0
          while (r < reps) {
            var i = lo
            while (i < hi) { a(i) = b(i) + 3.0 * c(i); i += 1 }
            r += 1
          }
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join())
      val sec = (System.nanoTime() - t0) / 1e9
      (reps.toDouble * n * 24.0 / sec / 1e9, sec)
    }

    triad(levels.max) // warm-up: JIT + page-in (the fill only touched b/c)
    val acc = scala.collection.mutable.Map[Int, Vector[Double]]().withDefaultValue(Vector.empty)
    for (r <- 1 to runs; lvl <- levels) {
      val (gbs, wall) = triad(lvl)
      report(f"MEMBW,$lvl,$r,$gbs%.2f,$wall%.2f")
      acc(lvl) = acc(lvl) :+ gbs
    }
    levels.map(l => l -> acc(l).max).toMap
  }

  def main(args: Array[String]): Unit = {
    val levels = args.headOption.getOrElse("2,8,32").split(",").map(_.trim.toInt).toSeq
    val runs = args.lift(1).map(_.toInt).getOrElse(4)
    val best = measure(levels, runs, report = println)
    def eff(lo: Int, hi: Int): String =
      if (best.contains(lo) && best.contains(hi))
        f"${(best(hi) / best(lo)) / (hi.toDouble / lo)}%.3f"
      else "n/a"
    println(levels.map(l => f"best[$l]=${best(l)}%.2f GB/s").mkString("MEMBW_SUMMARY ", " ", "") +
      s" eff_2_8=${eff(2, 8)} eff_8_32=${eff(8, 32)}")
  }
}
