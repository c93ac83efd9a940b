package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Scalar quantization of an embedding column — the index-compression
 * primitive behind every large-scale vector store (an int8 code book cuts
 * a 10^12-vector corpus' footprint 4× vs float32 before IVF/HNSW build).
 * Per-dimension min/max codebook + affine 8-bit codes; deterministic
 * (min/max are order-free, the code arithmetic is a fixed IEEE754
 * expression both engines evaluate identically).
 *
 * Scale shape: the codebook is a d-group aggregate (map-side combined,
 * exchange carries O(partitions · d) rows), broadcast back; encoding is
 * then one narrow codegen'd pass — no shuffle of the corpus itself.
 */
object Quantize {

  /** Per-dimension codebook (i, mn, mx), 0-based dims. */
  def codebook(points: DataFrame, vec: String = "embedding"): DataFrame =
    points.select(posexplode(col(vec)).as(Seq("i", "x")))
      .groupBy("i").agg(
        min(col("x").cast("double")).as("mn"),
        max(col("x").cast("double")).as("mx"))

  /** 8-bit codes (vec_id, i, q): q = floor((x−mn)/(mx−mn)·255 + 0.5),
   * 0 when the dimension is constant. Exploded long-form output so the
   * codes are oracle-comparable row-by-row; [[encode]] returns the packed
   * array form a store would persist. */
  def codes(points: DataFrame, id: String = "vec_id",
            vec: String = "embedding"): DataFrame = {
    val el = points.select(col(id), posexplode(col(vec)).as(Seq("i", "x")))
      .select(col(id), col("i"), col("x").cast("double").as("x"))
    el.join(broadcast(codebook(points, vec)), Seq("i"))
      .select(col(id), col("i").cast("long").as("i"),
        when(col("mx") === col("mn"), lit(0L))
          .otherwise(floor((col("x") - col("mn")) / (col("mx") - col("mn"))
            * lit(255.0) + lit(0.5)).cast("long")).as("q"))
  }

  /** Packed codes (id, codes: array<long>) — one row per vector, the
   * persistence form; same affine map as [[codes]] but computed without
   * exploding (zip the vector against the broadcast codebook arrays). */
  def encode(points: DataFrame, id: String = "vec_id",
             vec: String = "embedding"): DataFrame = {
    val cb = codebook(points, vec).orderBy("i").collect()
      .map(r => (r.getDouble(1), r.getDouble(2)))
    val mns = array(cb.map(c => lit(c._1)): _*)
    val mxs = array(cb.map(c => lit(c._2)): _*)
    points.select(col(id),
      zip_with(col(vec),
        zip_with(mns, mxs, (a, b) => struct(a.as("mn"), b.as("mx"))),
        (x, c) => when(c("mx") === c("mn"), lit(0L))
          .otherwise(floor((x.cast("double") - c("mn")) / (c("mx") - c("mn"))
            * lit(255.0) + lit(0.5)).cast("long"))).as("codes"))
  }

  /** Dequantized vectors (id, approx: array<double>) from [[encode]]'s
   * packed codes and the codebook: x̂ = mn + q/255·(mx−mn). */
  def decode(encoded: DataFrame, cb: DataFrame, id: String = "vec_id",
             codesCol: String = "codes"): DataFrame = {
    val book = cb.orderBy("i").collect().map(r => (r.getDouble(1), r.getDouble(2)))
    val mns = array(book.map(c => lit(c._1)): _*)
    val mxs = array(book.map(c => lit(c._2)): _*)
    encoded.select(col(id),
      zip_with(col(codesCol),
        zip_with(mns, mxs, (a, b) => struct(a.as("mn"), b.as("mx"))),
        (q, c) => c("mn") + q.cast("double") / lit(255.0) * (c("mx") - c("mn")))
        .as("approx"))
  }
}
