package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import java.nio.file.{Files, Paths, Path}
import scala.collection.mutable.ArrayBuffer

/** One superstep's ledger row — the analog of Totem's per-phase timers
 * (`/root/reference/src/totem/totem.h:22-37`, `totem_engine.cu:166-186`)
 * plus the north rule's per-partition lineage + edge-traversal metrics. */
final case class StepMetrics(
    superstep: Int,
    wallMs: Long,
    stateRows: Long,
    edgesTraversed: Long,
    converged: Boolean) {
  /** Billion traversed edges / sec, Totem's exec_rate
   * (`totem_benchmark_print.cu:85-104`). */
  def gteps: Double = if (wallMs <= 0) 0.0 else edgesTraversed / (wallMs / 1000.0) / 1e9
}

/** What a superstep returns to the driver loop. */
final case class StepResult(state: DataFrame, edgesTraversed: Long, converged: Boolean)

/**
 * BSP driver loop — the Spark-native `engine_execute`
 * (`/root/reference/src/totem/totem_engine.cu:214-234`). Each superstep is
 * one Spark job: join/aggregate/update, then a lineage barrier. The barrier
 * (persist-and-materialize or checkpoint-to-parquet) replaces Totem's
 * `grooves_synchronize` and is MANDATORY for plan-growth control: a
 * 25-iteration loop of joins would otherwise blow up the optimizer.
 *
 * With a `checkpointDir`, every superstep writes its state table plus a
 * `manifest.json` carrying lineage (parent superstep, input fingerprint) and
 * metrics (wall ms, per-partition row counts, edges traversed, GTEPS), and a
 * crashed run resumes from the last complete superstep.
 */
object Superstep {

  final case class Config(
      maxSupersteps: Int = 100,
      checkpointDir: Option[String] = None,
      /** checkpoint to parquet every k supersteps (1 = each); in between,
       * persist + localCheckpoint keeps lineage short without disk I/O. */
      checkpointEvery: Int = 1,
      resume: Boolean = false,
      /** record per-partition row counts in the manifest (extra tiny job). */
      partitionLineage: Boolean = true,
      verbose: Boolean = false)

  final case class Outcome(state: DataFrame, metrics: Seq[StepMetrics]) {
    def supersteps: Int = metrics.size
  }

  /**
   * Run `step(state, superstep)` until it reports convergence or
   * `maxSupersteps`. `superstep` is 1-based, matching the engine counter
   * (`totem_engine.cuh:189-216`).
   */
  def run(initial: DataFrame, cfg: Config)(step: (DataFrame, Int) => StepResult): Outcome = {
    val spark = initial.sparkSession
    val metrics = ArrayBuffer[StepMetrics]()

    var (state, startStep) = cfg.checkpointDir match {
      case Some(dir) if cfg.resume =>
        latestComplete(dir) match {
          case Some((ss, path)) =>
            metrics ++= readLedger(dir, ss)
            (graft.sources.TableIO.read(spark, path), ss + 1)
          case None => (materialize(initial), 1)
        }
      case _ => (materialize(initial), 1)
    }

    var superstep = startStep
    var done = false
    while (!done && superstep <= cfg.maxSupersteps) {
      val t0 = System.nanoTime()
      val res = step(state, superstep)
      val doParquet = cfg.checkpointDir.isDefined && (superstep % cfg.checkpointEvery == 0)
      val (newState, rows, perPart) =
        if (doParquet) {
          val out = writeCheckpoint(res.state, cfg, superstep)
          // a step that cut its own state leaves checkpoint blocks behind;
          // the parquet copy supersedes them
          if (res.state ne state) Lineage.release(res.state)
          out
        } else {
          // steps that probe convergence materialize (Lineage.cut) their own
          // state first — don't execute the step plan a second time here
          val s = if (Lineage.isCut(res.state)) res.state else materialize(res.state)
          // the row count is ledger-only; skip the extra per-superstep job
          // unless someone reads it (manifest path counts via partitions)
          val rows = if (cfg.verbose) s.count() else -1L
          (s, rows, Map.empty[Int, Long])
        }
      val wallMs = (System.nanoTime() - t0) / 1000000
      val m = StepMetrics(superstep, wallMs, rows, res.edgesTraversed, res.converged)
      metrics += m
      if (doParquet) writeManifest(cfg.checkpointDir.get, m, perPart, cfg)
      if (cfg.verbose)
        println(f"[superstep $superstep%3d] rows=$rows%,d trvEdges=${res.edgesTraversed}%,d " +
          f"wall=${wallMs}ms gteps=${m.gteps}%.4f converged=${res.converged}")
      // free the previous superstep's cache (unpersist covers cache-manager
      // entries from parquet re-reads; release covers localCheckpoint blocks)
      if (state ne newState) {
        state.unpersist(blocking = false)
        Lineage.release(state)
      }
      state = newState
      done = res.converged
      superstep += 1
    }
    Outcome(state, metrics.toSeq)
  }

  /** Force + truncate lineage — the cheap intra-run barrier (localCheckpoint
   * caches at MEMORY_AND_DISK itself; an extra persist would double-cache). */
  private def materialize(df: DataFrame): DataFrame = Lineage.cut(df)

  private def writeCheckpoint(df: DataFrame, cfg: Config, superstep: Int): (DataFrame, Long, Map[Int, Long]) = {
    val dir = cfg.checkpointDir.get
    val path = s"$dir/superstep=$superstep/data"
    graft.sources.TableIO.write(df, path)
    val spark = df.sparkSession
    val re = graft.sources.TableIO.read(spark, path).persist(StorageLevel.MEMORY_AND_DISK)
    val perPart: Map[Int, Long] =
      if (cfg.partitionLineage)
        re.groupBy(spark_partition_id().as("pid")).count()
          .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      else Map.empty
    val rows = if (cfg.partitionLineage) perPart.values.sum else re.count()
    (re, rows, perPart)
  }

  private def writeManifest(dir: String, m: StepMetrics, perPart: Map[Int, Long], cfg: Config): Unit = {
    val pp = perPart.toSeq.sortBy(_._1)
      .map { case (p, n) => s"""{"partition":$p,"rows":$n}""" }.mkString("[", ",", "]")
    // the parent is the previous CHECKPOINTED superstep: with
    // checkpointEvery > 1 the intermediate steps were only localCheckpoint'ed
    // and have no data dir — recording N-1 would point lineage at a path
    // that never existed
    val parentStep = m.superstep - cfg.checkpointEvery
    val parent = if (parentStep < 1) "null" else s""""$dir/superstep=$parentStep/data""""
    val json =
      s"""{"superstep":${m.superstep},"status":"complete","wall_ms":${m.wallMs},
         |"state_rows":${m.stateRows},"edges_traversed":${m.edgesTraversed},
         |"gteps":${m.gteps},"converged":${m.converged},
         |"lineage":{"parent":$parent,"data":"$dir/superstep=${m.superstep}/data"},
         |"partitions":$pp}""".stripMargin.replace("\n", "")
    val p = Paths.get(s"$dir/superstep=${m.superstep}/manifest.json")
    Files.createDirectories(p.getParent)
    Files.writeString(p, json)
  }

  /** Latest superstep whose manifest says complete (crash-safe resume point). */
  def latestComplete(dir: String): Option[(Int, String)] = {
    val root = Paths.get(dir)
    if (!Files.exists(root)) return None
    import scala.jdk.CollectionConverters._
    // Files.list holds an open directory stream — close it or leak an fd
    // per resume probe
    val listing = Files.list(root)
    val steps =
      try {
        listing.iterator().asScala
          .filter(p => p.getFileName.toString.startsWith("superstep="))
          .flatMap { p =>
            val ss = p.getFileName.toString.stripPrefix("superstep=").toIntOption
            val mf = p.resolve("manifest.json")
            ss.filter(_ => Files.exists(mf) &&
              Files.readString(mf).contains(""""status":"complete""""))
              .map(s => (s, p.resolve("data").toString))
          }.toSeq
      } finally listing.close()
    steps.sortBy(_._1).lastOption
  }

  private def readLedger(dir: String, upTo: Int): Seq[StepMetrics] =
    (1 to upTo).flatMap { ss =>
      val mf = Paths.get(s"$dir/superstep=$ss/manifest.json")
      if (!Files.exists(mf)) None
      else {
        val s = Files.readString(mf)
        def num(k: String): Option[Long] =
          ("\"" + k + "\":(-?[0-9]+)").r.findFirstMatchIn(s).map(_.group(1).toLong)
        for {
          wall <- num("wall_ms"); rows <- num("state_rows"); trv <- num("edges_traversed")
        } yield StepMetrics(ss, wall, rows, trv, s.contains("\"converged\":true"))
      }
    }
}
