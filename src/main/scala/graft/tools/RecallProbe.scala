package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Measure LSH top-k recall vs brute force on the driver embeddings table
 * for a sweep of plane counts — the tuning evidence behind the
 * `q_ann_lsh_recall` floor. Hyperplane count trades bucket selectivity
 * (scale) against recall: planes ≈ log2(N / target_bucket_size), so a tiny
 * verify corpus needs few planes where a 10^9-vector corpus needs ~20.
 *
 * Usage: sbt "runMain graft.tools.RecallProbe [sfDir] [planes,planes,...]"
 */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    // entries are planes:radius[:tables] (LSH) or ivfNLIST:NPROBE (IVF) —
    // mode is decided PER ENTRY by its own "ivf" prefix, so mixed sweeps
    // like "4:2,4:2:2,ivf16:4" run each entry with the right algorithm
    val planeSet = args.lift(1).getOrElse("3:1,4:1,4:2,5:2,6:2,8:2")
      .split(",").map(_.trim).map { entry =>
        val ivf = entry.startsWith("ivf")
        val a = entry.stripPrefix("ivf").split(":")
        (ivf, a(0).toInt, a.lift(1).map(_.toInt).getOrElse(1),
          a.lift(2).map(_.toInt).getOrElse(1))
      }.toSeq
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val emb = s.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    val brute = graft.ann.Ann.bruteForceTopK(emb, queries, k = 10)
      .select(col("query_id"), col("vec_id")).cache()
    brute.count()
    for ((ivf, p, r, t) <- planeSet) {
      val approx = (if (ivf)
        graft.ann.Ivf.ivfTopK(emb, queries, k = 10, nlist = p, nprobe = r)
      else graft.ann.Ann.lshTopK(emb, queries, k = 10, planes = p,
        probeRadius = r, tables = t))
        .select(col("query_id"), col("vec_id"))
      val per = brute.join(approx, Seq("query_id", "vec_id"))
        .groupBy("query_id").agg(count(lit(1)).as("n"))
        .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
      val ns = (0L to 4L).map(q => per.getOrElse(q, 0L))
      val label = if (ivf) s"ivf nlist=$p nprobe=$r"
        else s"lsh planes=$p radius=$r tables=$t"
      println(s"RECALL $label per_query=${ns.mkString(",")} min=${ns.min} mean=${ns.sum / 5.0}")
    }
    s.stop()
  }
}
