package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: isolate where charEntropy's per-row cost goes. */
object EntropyProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val docs = s.read.parquet("/root/testdata/sf0.1/documents.parquet").cache()
    docs.count()
    def t(name: String)(c: org.apache.spark.sql.Column): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        docs.select(sum(c)).collect()
        println(f"$name run=$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    val chars = filter(split(col("text"), ""), c => length(c) > 0)
    val cs = array_sort(transform(chars, c => ascii(c)))
    val len = size(chars)
    val shifted = concat(array(lit(-1)), slice(cs, lit(1), len - 1))
    val flags = zip_with(cs, shifted, (a, b) => a =!= b)
    val starts = filter(zip_with(flags, sequence(lit(1), len), (f, i) => when(f, i)),
      x => x.isNotNull)
    val ends = concat(slice(starts, lit(2), size(starts) - 1), array(len + 1))
    val runs = zip_with(starts, ends, (st, en) => (en - st).cast("double"))
    t("cs sort")(size(cs).cast("double"))
    t("shifted")(size(shifted).cast("double"))
    t("flags")(size(flags).cast("double"))
    t("starts")(size(starts).cast("double"))
    t("ends")(size(ends).cast("double"))
    t("runs")(size(runs).cast("double"))
    t("full entropy")(graft.text.TextAnalysis.charEntropy(col("text")))
    s.stop()
  }
}
