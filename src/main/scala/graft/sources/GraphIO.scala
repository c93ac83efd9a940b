package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Graph sources/sinks.
 *
 * Text format = the reference's edge-list format
 * (`/root/reference/src/totem/totem_graph.h:5-31`, parser
 * `totem_graph.cu:30-251`): `# NODES: n[ Y]`, `# EDGES: m`,
 * `# DIRECTED|UNDIRECTED` header lines, optional vertex-value list (when Y),
 * then src-sorted `src dst [weight]` lines.
 *
 * Binary format = Parquet (the reference's `graph_store_binary`
 * (`totem_graph.cu:881-921`) serialized its CSR; the columnar equivalent of
 * a serialized edge table is Parquet, which also gives dictionary/delta
 * compression the reference got from 32-bit id packing).
 */
object GraphIO {

  final case class TextGraph(edges: DataFrame, vertexCount: Long, edgeCount: Long,
                             directed: Boolean, values: Option[DataFrame])

  /** Parse the reference text format. Distributed: the header (first ~3
   * lines + optional value list) is parsed driver-side; edge lines parse in
   * parallel with codegen'd splits — no UDF, no collect of the data. */
  def readText(spark: SparkSession, path: String): TextGraph = {
    val raw = spark.read.text(path)
    val header = raw.limit(64).collect().map(_.getString(0))
      .filter(_.trim.startsWith("#"))
    def headerVal(key: String): Option[String] =
      header.find(_.toUpperCase.contains(key)).map(_.split(":").last.trim)
    val nodesLine = headerVal("NODES").getOrElse(
      throw new IllegalArgumentException(s"missing # NODES header in $path"))
    val hasValues = nodesLine.toUpperCase.endsWith("Y")
    val vertexCount = nodesLine.split("\\s+")(0).toLong
    val edgeCount = headerVal("EDGES").map(_.split("\\s+")(0).toLong).getOrElse(0L)
    val directed = !header.exists(_.toUpperCase.contains("UNDIRECTED"))

    val data = raw.filter(!trim(col("value")).startsWith("#") && trim(col("value")) =!= "")
      .select(split(trim(col("value")), "\\s+").as("f"))
    // vertex-value list rows have exactly 1 field; edge rows 2..3. The value
    // list is POSITIONAL (line i ↦ vid i, `totem_graph.cu:30-251`), so vids
    // must be file-order indices: zipWithIndex over the filtered lines
    // (deterministic — Hadoop text splits enumerate in file-offset order).
    // monotonically_increasing_id would bake partition offsets into the ids
    // on any multi-partition read.
    val values =
      if (hasValues) Some {
        import org.apache.spark.sql.Row
        import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
        val rdd = spark.sparkContext.textFile(path)
          .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
          .filter(_.split("\\s+").length == 1)
          .zipWithIndex()
          .map { case (l, i) => Row(i, l.toDouble) }
        spark.createDataFrame(rdd, StructType(Seq(
          StructField("vid", LongType), StructField("value", DoubleType))))
      }
      else None
    val edges = data.filter(size(col("f")) >= 2)
      .select(col("f")(0).cast("long").as("src"), col("f")(1).cast("long").as("dst"),
        when(size(col("f")) > 2, col("f")(2).cast("double")).as("weight"))
    TextGraph(edges, vertexCount, edgeCount, directed, values)
  }

  /** Write the reference text format. Note: emitting one header-carrying
   * file forces a single writer — small/interop graphs only; the scale
   * path is [[writeParquet]]. */
  def writeText(edges: DataFrame, path: String, directed: Boolean = true): Unit = {
    val spark = edges.sparkSession
    import spark.implicits._
    val v = graft.core.Graph.vertices(edges).agg(coalesce(max("vid"), lit(-1L)))
      .collect()(0).getLong(0) + 1
    val e = edges.count()
    val hasW = edges.columns.contains("weight")
    val header = Seq(s"# NODES: $v", s"# EDGES: $e",
      if (directed) "# DIRECTED" else "# UNDIRECTED").toDF("line")
    val body = (if (hasW)
      edges.select(concat_ws(" ", col("src"), col("dst"), col("weight")).as("line"))
    else edges.select(concat_ws(" ", col("src"), col("dst")).as("line")))
    header.union(body.orderBy(split(col("line"), " ")(0).cast("long"),
      split(col("line"), " ")(1).cast("long")))
      .coalesce(1).write.mode("overwrite").text(path)
  }

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Scale path: edge table partitioned by src-hash bucket so downstream
   * state⋈adjacency joins can reuse the layout (the analog of storing the
   * partitioned CSR, `totem_partition.cu:492-541`). */
  def writeParquet(edges: DataFrame, path: String, buckets: Int = 0): Unit = {
    val out = if (buckets > 0)
      edges.withColumn("bucket", pmod(xxhash64(col("src")), lit(buckets)).cast("int"))
        .repartition(buckets, col("bucket"))
    else edges
    out.write.mode("overwrite").parquet(path)
  }
}
