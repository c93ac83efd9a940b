package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftinternal.GraftSql
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Bounded-memory heavy hitters — Misra-Gries "frequent items" with the
 * mergeable-summaries combine (Agarwal et al. 2012), as a first-class
 * Catalyst aggregate (the second custom aggregate after
 * [[TopKStructs]]; same ObjectHashAggregate execution).
 *
 * Why: "top URLs / hosts / users by frequency" over a web-scale stream is
 * THE query an exact `groupBy(key).count()` cannot answer cheaply when the
 * key universe is huge — the exact plan shuffles one row per distinct key.
 * This sketch keeps at most `capacity` counters at EVERY stage (per-task
 * partial, shuffled payload, final merge), so the full aggregation is one
 * map-side pass plus a single O(parts·capacity) merge — no key-space
 * shuffle at all.
 *
 * Guarantees (classic MG): emitted `cnt` is a LOWER bound of the true
 * count, and `true − max_error ≤ cnt ≤ true` where `max_error` (emitted
 * alongside) accumulates every decrement this summary absorbed — at most
 * N/(capacity+1) over N rows. Every key whose true count exceeds
 * `max_error` is guaranteed present. With `capacity` ≥ the distinct-key
 * count seen by every partial, no decrement ever fires: the result is the
 * EXACT count table (max_error = 0) — the regime the DuckDB oracle pins.
 * In the approximate regime the surviving counter VALUES are
 * arrival-order-dependent (inherent to MG), but always within the bound.
 *
 * Update is amortized O(1): the O(capacity) decrement-all on a miss at
 * full capacity is paid for by the ≥capacity preceding inserts/hits
 * (the textbook argument); merge is O(capacity log capacity) for the
 * (capacity+1)-th-count cut.
 */
case class HeavyHittersAgg(
    key: Expression, capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HeavyHittersAgg.Buf] {

  require(capacity >= 1, s"capacity must be >= 1, got $capacity")

  import HeavyHittersAgg.Buf

  override def children: Seq[Expression] = Seq(key)
  override def nullable: Boolean = false
  override def dataType: DataType = HeavyHittersAgg.resultType
  override def prettyName: String = "heavy_hitters"

  // analysis-time type gate: update() casts straight to UTF8String, so a
  // non-string key would otherwise fail mid-job with ClassCastException
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (key.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"heavy_hitters requires a STRING key, got ${key.dataType.catalogString}" +
        " — cast(... as string) first")

  override def createAggregationBuffer(): Buf = new Buf

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = key.eval(input)
    if (v != null) {
      val k = v.asInstanceOf[UTF8String].toString
      val cur = buf.counts.getOrElse(k, 0L)
      if (cur > 0L) buf.counts(k) = cur + 1L
      else if (buf.counts.size < capacity) buf.counts(k) = 1L
      else { // decrement-all: the miss and one unit of every counter cancel
        buf.err += 1L
        val dead = mutable.ArrayBuffer[String]()
        buf.counts.mapValuesInPlace { (_, c) => c - 1L }
        buf.counts.foreach { case (kk, c) => if (c <= 0L) dead += kk }
        dead.foreach(buf.counts.remove)
      }
    }
    buf
  }

  override def merge(buf: Buf, other: Buf): Buf = {
    other.counts.foreach { case (k, c) =>
      buf.counts(k) = buf.counts.getOrElse(k, 0L) + c
    }
    buf.err += other.err
    if (buf.counts.size > capacity) {
      // mergeable-summaries cut: subtract the (capacity+1)-th largest count
      val sorted = buf.counts.values.toArray
      java.util.Arrays.sort(sorted)
      val d = sorted(sorted.length - capacity - 1)
      buf.err += d
      val dead = mutable.ArrayBuffer[String]()
      buf.counts.mapValuesInPlace { (_, c) => c - d }
      buf.counts.foreach { case (k, c) => if (c <= 0L) dead += k }
      dead.foreach(buf.counts.remove)
    }
    buf
  }

  override def eval(buf: Buf): Any = {
    // deterministic emission order: (cnt desc, key asc)
    val items = buf.counts.toArray.sortBy { case (k, c) => (-c, k) }
      .map { case (k, c) =>
        new GenericInternalRow(Array[Any](UTF8String.fromString(k), c))
      }
    new GenericInternalRow(Array[Any](
      new GenericArrayData(items.toArray[Any]), buf.err))
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val enc = buf.counts.toSeq.map { case (k, c) =>
      (k.getBytes(StandardCharsets.UTF_8), c)
    }
    val bb = ByteBuffer.allocate(4 + 8 + enc.map(_._1.length + 12).sum)
    bb.putInt(enc.size); bb.putLong(buf.err)
    enc.foreach { case (b, c) => bb.putInt(b.length); bb.put(b); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new Buf
    buf.err = bb.getLong
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len); bb.get(b)
      buf.counts(new String(b, StandardCharsets.UTF_8)) = bb.getLong
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HeavyHittersAgg =
    copy(key = newChildren(0))
}

object HeavyHittersAgg {

  /** counts: key → MG counter; err: total decrements absorbed (the
   * summary-wide undercount bound). */
  final class Buf {
    val counts: mutable.HashMap[String, Long] = mutable.HashMap.empty
    var err: Long = 0L
  }

  val resultType: DataType = StructType(Seq(
    StructField("items", ArrayType(StructType(Seq(
      StructField("key", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))), containsNull = false),
      nullable = false),
    StructField("max_error", LongType, nullable = false)))

  /** Column-level entry: struct(items: array<struct<key,cnt>> sorted
   * (cnt desc, key asc), max_error: long). */
  def heavyHitters(key: Column, capacity: Int): Column =
    GraftSql.column(HeavyHittersAgg(
      GraftSql.expression(key), capacity).toAggregateExpression())
}
