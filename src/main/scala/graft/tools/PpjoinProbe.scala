package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.storage.StorageLevel
import graft.text.TextAnalysis

/** Scratch perf probe: per-stage wall time of the exact PPJoin behind
 * q_ngram_jaccard (same config as SparkEntry), to localize the cost —
 * shingle build, frequency/rank, prefix, candidate self-join, verify. */
object PpjoinProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = 5; val threshold = 0.7; val maxShingleFreq = 1000
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark-local")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PPJOIN $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    for (pass <- 1 to 2) {
      println(s"--- pass $pass ---")
      val sh = docs.select(col("doc_id"),
          TextAnalysis.normalizeForShingles(col("text")).as("__t"))
        .select(col("doc_id"),
          explode_outer(array_distinct(TextAnalysis.rawShingles(col("__t"), n))).as("sh"))
        .filter(col("sh").isNotNull)
        .persist(StorageLevel.MEMORY_AND_DISK)
      time("shingle build (distinct + persist)") { sh.count() }
      val freq = sh.groupBy("sh").agg(count(lit(1)).as("f"))
      val universe = time("freq + universe count") { freq.count() }
      println(s"PPJOIN universe=$universe (bitmap cap=${graft.dedup.Dedup.BitmapMaxUniverse})")
      val ranked = sh.join(freq, "sh")
        .withColumn("r", row_number().over(
          Window.partitionBy("doc_id").orderBy(col("f"), col("sh"))))
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
      val prefix = ranked.join(sizes, "doc_id")
        .filter(col("r") <= col("sz") - ceil(lit(threshold) * col("sz")) + 1)
        .filter(col("f") <= maxShingleFreq)
        .persist(StorageLevel.MEMORY_AND_DISK)
      time("rank + prefix") { println(s"  prefix rows=${prefix.count()}") }
      val alpha = lit(threshold / (1.0 + threshold))
      val cand = prefix.select(col("doc_id").as("ia"), col("sh"), col("r").as("ra"), col("sz").as("na"))
        .join(prefix.select(col("doc_id").as("ib"), col("sh"), col("r").as("rb"), col("sz").as("nb")), "sh")
        .filter(col("ia") < col("ib"))
        .filter(least(col("na"), col("nb")) + lit(1e-9)
          >= lit(threshold) * greatest(col("na"), col("nb")))
        .filter(lit(1) + least(col("na") - col("ra"), col("nb") - col("rb")) + lit(1e-9)
          >= alpha * (col("na") + col("nb")))
        .select("ia", "ib").distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
      time("candidate self-join") { println(s"  cand rows=${cand.count()}") }
      val full = time("full query (library path)") {
        graft.dedup.Dedup.ngramJaccardPairs(docs, n, threshold, maxShingleFreq).count()
      }
      println(s"  pairs=$full")
      sh.unpersist(); prefix.unpersist(); cand.unpersist()
    }
    spark.stop()
  }
}
