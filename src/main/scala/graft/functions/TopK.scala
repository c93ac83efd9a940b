package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftinternal.GraftSql
import org.apache.spark.sql.types._

/**
 * Bounded top-k aggregate over (np: double, l: long, p: double) input rows:
 * keeps the k smallest entries under the ascending (np, l) order and emits
 * them as a SORTED `array<struct<np,l,p>>`.
 *
 * Why a custom Catalyst aggregate — SURVEY §4's one deferred extension
 * seam ("a TypedImperativeAggregate for argmax-with-tiebreak over label
 * maps if the built-in form proves slow"), now with the measured
 * justification: the built-in formulation of the pruned-LabelRank top-16 —
 * `collect_list` every support entry, then `array_sort` + `slice` —
 * buffers O(support) structs per vertex BEFORE pruning. On the
 * near-complete derived graph the engine benches, a hub vertex's
 * collect_list buffer is the whole label universe, and
 * q_label_prop_pruned_full is the most expensive headline query. This
 * aggregate caps the state at k entries at EVERY stage: the per-task
 * partial buffer, the shuffled payload (24 bytes/entry serialized), and
 * the merge — Totem's bounded outbox slot, expressed as a first-class
 * Catalyst aggregate. It runs inside ObjectHashAggregateExec, keeping the
 * map-side-combine → Exchange → final-merge plan shape of every other
 * scatter-reduce in the engine.
 *
 * Exactness: l is unique within a group (one row per candidate label), so
 * ascending (np, l) is a STRICT total order and insertion-pruning is
 * exactly sort-then-slice — parity-tested against the collect_list
 * formulation in LabelPropagationSpec and pinned cross-engine by the
 * q_label_prop_pruned DuckDB oracle.
 */
case class TopKStructs(
    np: Expression, l: Expression, p: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Double, Long, Double)]] {

  require(k >= 1, s"k must be >= 1, got $k")

  private type Buf = ArrayBuffer[(Double, Long, Double)]

  override def children: Seq[Expression] = Seq(np, l, p)
  override def nullable: Boolean = false
  override def dataType: DataType = TopKStructs.resultType
  override def prettyName: String = "topk_structs"

  override def createAggregationBuffer(): Buf = new Buf

  /** Keeps `buf` sorted ascending by (np, l); O(k) per row with k a small
   * constant (16 in the pruned LabelRank), so update stays branch-cheap. */
  private def insert(buf: Buf, t: (Double, Long, Double)): Unit = {
    var i = buf.length
    while (i > 0 && {
        val e = buf(i - 1)
        e._1 > t._1 || (e._1 == t._1 && e._2 > t._2)
      }) i -= 1
    if (i < k) {
      buf.insert(i, t)
      if (buf.length > k) buf.remove(buf.length - 1)
    }
  }

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v1 = np.eval(input); val v2 = l.eval(input); val v3 = p.eval(input)
    if (v1 != null && v2 != null && v3 != null)
      insert(buf, (v1.asInstanceOf[Double], v2.asInstanceOf[Long],
        v3.asInstanceOf[Double]))
    buf
  }

  override def merge(buf: Buf, other: Buf): Buf = {
    other.foreach(insert(buf, _)); buf
  }

  override def eval(buf: Buf): Any =
    new GenericArrayData(buf.map(t =>
      new GenericInternalRow(Array[Any](t._1, t._2, t._3))).toArray[Any])

  override def serialize(buf: Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.length * 24)
    bb.putInt(buf.length)
    buf.foreach { t => bb.putDouble(t._1); bb.putLong(t._2); bb.putDouble(t._3) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new Buf
    var i = 0
    while (i < n) { buf += ((bb.getDouble, bb.getLong, bb.getDouble)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKStructs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKStructs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKStructs =
    copy(np = newChildren(0), l = newChildren(1), p = newChildren(2))
}

object TopKStructs {

  val resultType: DataType = ArrayType(StructType(Seq(
    StructField("np", DoubleType, nullable = false),
    StructField("l", LongType, nullable = false),
    StructField("p", DoubleType, nullable = false))), containsNull = false)

  /** Column-level entry: bounded top-k by ascending (np, l), emitted as a
   * sorted array<struct<np,l,p>>. */
  def topK(np: Column, l: Column, p: Column, k: Int): Column =
    GraftSql.column(TopKStructs(
      GraftSql.expression(np), GraftSql.expression(l), GraftSql.expression(p),
      k).toAggregateExpression())
}
