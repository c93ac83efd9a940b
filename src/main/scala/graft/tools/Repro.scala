package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch repro harness for debugging — not part of the library surface. */
object Repro {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val edges = graft.core.Graph.undirected(
      graft.gen.GraphGen.uniform(spark, 60, 500, seed = 17))
    try {
      val res = graft.alg.PageRank.runUntilConverged(edges, tol = 1e-6, maxIter = 40, verbose = true)
      println(s"DONE iters=${res.metrics.size} converged=${res.metrics.last.converged}")
    } catch {
      case e: Throwable => println("REPRO-FAILURE:"); e.printStackTrace(System.out)
    }
    spark.stop()
  }
}
