package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.{Adjacency, Graph}

/** Plan-hygiene tool: prints the formatted physical plans of the hot paths
 * (PageRank superstep, triangle join, parquet scan pruning) so shuffle
 * placement / codegen spans / pushed filters can be eyeballed per round.
 * Usage: runMain graft.tools.Explain */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val edges = graft.gen.GraphGen.rmat(spark, 14, 8, seed = 3).cache()
    edges.count()

    println("==== PageRank superstep: state ⋈ adjacency -> explode -> agg ====")
    val adj = Adjacency.build(edges).persist()
    adj.count()
    val state = Graph.vertices(edges).select(col("vid"), lit(0.1).as("stored"))
      .persist()
    state.count()
    val msgs = adj.join(state.hint("shuffle_hash"), adj("src") === state("vid"))
      .select(explode(col("nbrs")).as("vid"), col("stored"))
      .groupBy("vid").agg(sum("stored").as("mbox"))
    msgs.explain("formatted")

    println("==== ngram-jaccard bitmap verify (candidates ⋈ bitmaps, zip_with/bit_count) ====")
    graft.dedup.Dedup.ngramJaccardPairs(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
      n = 5, threshold = 0.5).explain("formatted")

    println("==== Triangle wedge join ====")
    graft.alg.TriangleCount.triangles(graft.alg.TriangleCount.canonical(edges))
      .explain("formatted")

    println("==== Parquet scan pruning (documents: 2 columns of 5) ====")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("lang") === "en")
      .select(col("doc_id"), length(col("text")))
      .explain("formatted")

    spark.stop()
  }
}
