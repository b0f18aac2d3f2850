package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Ascending, BoundReference, Descending, Expression, InterpretedOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded-heap per-group top-k — the scale answer to
  * `row_number().over(partitionBy(g).orderBy(o)) <= k`.
  *
  * The window spelling SORTS every group in full: with few huge groups
  * each whole group funnels through one task, and even with many
  * groups the shuffle carries every row. This aggregate keeps a k-row
  * heap in the aggregation buffer, so it is PARTIAL-AGGREGABLE: each
  * map task reduces its slice to ≤ k rows per group before the
  * exchange, the shuffle carries O(groups·k) rows instead of O(n), and
  * merge is heap-union. One ordinary aggregate shuffle, no window, no
  * full sort — the same regime shift as map-side combine for sums.
  *
  * `child` is a STRUCT; rows compare by its fields IN DECLARED ORDER
  * (so put the sort keys first and include a unique tiebreaker before
  * any payload — with a total order the result is deterministic and
  * engine-comparable). `reverse = false` keeps the k SMALLEST structs,
  * `true` the k largest; mixed per-key directions are encoded by the
  * caller (negate a numeric key). Eval returns `array<struct>` sorted
  * best-first.
  */
case class TopKAgg(child: Expression, k: Int, reverse: Boolean = false,
                   mutableAggBufferOffset: Int = 0,
                   inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.PriorityQueue[InternalRow]]
  with UnaryLike[Expression] {

  require(k > 0, "graft_topk_agg needs a positive k")

  private def structType: StructType = child.dataType.asInstanceOf[StructType]

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_topk_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case st: StructType
        if org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(st) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an orderable struct input, got ${other.catalogString}")
  }

  // "better-first" comparator over the struct's own field order
  @transient private lazy val better: Ordering[InternalRow] = {
    val dir = if (reverse) Descending else Ascending
    new InterpretedOrdering(structType.fields.zipWithIndex.map {
      case (f, i) => SortOrder(BoundReference(i, f.dataType, f.nullable), dir)
    }.toIndexedSeq)
  }
  // heap keeps the WORST kept row on top so inserts evict in O(log k)
  @transient private lazy val worstFirst: Ordering[InternalRow] = better

  override def createAggregationBuffer(): scala.collection.mutable.PriorityQueue[InternalRow] =
    scala.collection.mutable.PriorityQueue.empty[InternalRow](worstFirst)

  private def insert(buf: scala.collection.mutable.PriorityQueue[InternalRow],
                     row: InternalRow): Unit =
    if (buf.size < k) buf.enqueue(row)
    else if (better.lt(row, buf.head)) { buf.dequeue(); buf.enqueue(row) }

  override def update(buf: scala.collection.mutable.PriorityQueue[InternalRow],
                      input: InternalRow): scala.collection.mutable.PriorityQueue[InternalRow] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[InternalRow].copy())
    buf
  }

  override def merge(buf: scala.collection.mutable.PriorityQueue[InternalRow],
                     other: scala.collection.mutable.PriorityQueue[InternalRow]): scala.collection.mutable.PriorityQueue[InternalRow] = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: scala.collection.mutable.PriorityQueue[InternalRow]): Any =
    new GenericArrayData(
      buf.toArray.sorted(better).map(_.asInstanceOf[Any]))

  @transient private lazy val proj =
    UnsafeProjection.create(structType.fields.map(_.dataType))

  override def serialize(buf: scala.collection.mutable.PriorityQueue[InternalRow]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    // one scratch buffer for the whole group: serialize runs once per
    // group per exchange, so a per-row allocation here churns
    // groups×k 4KB arrays through the young gen for nothing
    val scratch = new Array[Byte](4096)
    out.writeInt(buf.size)
    buf.foreach { r =>
      val u = proj(r)
      out.writeInt(u.getSizeInBytes)
      u.writeToStream(out, scratch)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.PriorityQueue[InternalRow] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val arr = new Array[Byte](len)
      in.readFully(arr)
      val u = new UnsafeRow(structType.length)
      u.pointTo(arr, len)
      buf.enqueue(u)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(n: Int): TopKAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): TopKAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): TopKAgg =
    copy(child = c)
}
