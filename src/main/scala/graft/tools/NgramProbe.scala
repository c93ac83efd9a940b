package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch perf probe: end-to-end q_ngram_jaccard / q_minhash_sig shapes. */
object NgramProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark-local")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $name: ${(System.nanoTime() - t0) / 1e9}%.2f s -> $r")
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    t("ngram_jaccard")(graft.dedup.Dedup.ngramJaccardPairs(docs, n = 5,
      threshold = 0.5, maxShingleFreq = 1000).count())
    spark.stop()
  }
}
