package graft.functions

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable quantile and heavy-hitter sketch aggregates (Datasketches
  * KLL and frequent-items), completing the sketch triple next to the
  * HLL distinct sketches in [[graft.ops.Sketches]].
  *
  * Shape: `TypedImperativeAggregate` — the same implementation tier
  * Spark's own `hll_sketch_agg` uses. The sketch OBJECT lives in the
  * aggregation buffer and serializes only at partial-result exchange
  * (shuffle) or spill, so per-row update cost is the sketch update
  * itself, not a serialize round-trip (which is why these are not
  * `Aggregator`+udaf over a binary buffer).
  *
  * Why at 100 TB: exact quantiles are a full sort per group and exact
  * heavy-hitters a full count per distinct item — neither composes
  * across shards or days. A KLL sketch is a few KB with a PROVEN
  * normalized-rank-error bound (~1.65% at the default k=200); a
  * frequent-items sketch bounds estimate error by n/maxMapSize and
  * finds every item above that threshold (no false negatives at
  * NO_FALSE_POSITIVES). Both union losslessly w.r.t. their error
  * bounds, so per-day sketches persisted in a TxTable answer
  * arbitrary-range questions without rescanning the lake.
  */
case class KllDoublesAgg(child: Expression, k: Int = 200,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kll_sketch_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: NumericType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a numeric input, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch,
                      input: InternalRow): KllDoublesSketch = {
    // any numeric input (SQL callers pass ints/decimals without casting;
    // Decimal is not a java.lang.Number)
    child.eval(input) match {
      case null =>
      case d: org.apache.spark.sql.types.Decimal => buf.update(d.toDouble)
      case n: Number => buf.update(n.doubleValue())
    }
    buf
  }

  override def merge(buf: KllDoublesSketch,
                     other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other)
    buf
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] =
    buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(n: Int): KllDoublesAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllDoublesAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): KllDoublesAgg =
    copy(child = c)
}

/** Union of serialized KLL sketches (binary column → binary) — the
  * rollup half of the shard → union → query decomposition. Mixed-k
  * inputs are fine: KLL merge degrades to the smaller k.
  */
case class KllMergeAgg(child: Expression, k: Int = 200,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kll_union_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a serialized KLL sketch (binary), got ${other.catalogString}")
  }

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch,
                      input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      buf.merge(KllDoublesSketch.heapify(
        Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buf
  }

  override def merge(buf: KllDoublesSketch,
                     other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other)
    buf
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] =
    buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(n: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllMergeAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): KllMergeAgg =
    copy(child = c)
}

/** Quantile extraction from a serialized KLL sketch: values at the
  * given probabilities, as array<double>; null for an empty sketch.
  * Per-GROUP rows only (one sketch per group), so a non-codegen eval
  * is off the hot path by construction.
  */
case class KllQuantilesExpr(child: Expression, probs: Seq[Double])
  extends UnaryExpression with CodegenFallback {

  require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0),
    s"quantile probabilities must be in [0, 1], got $probs")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_kll_quantiles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a serialized KLL sketch (binary), got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val sk = KllDoublesSketch.heapify(
      Memory.wrap(input.asInstanceOf[Array[Byte]]))
    if (sk.isEmpty) null
    else new GenericArrayData(probs.map(sk.getQuantile).toArray)
  }

  override protected def withNewChildInternal(c: Expression): KllQuantilesExpr =
    copy(child = c)
}

/** Frequent-items sketch over a string column (Datasketches
  * `ItemsSketch[String]`): the mergeable heavy-hitters primitive —
  * which tokens/domains/users dominate a 100 TB corpus, without a
  * full count per distinct item. `maxMapSize` (power of 2) bounds
  * memory and sets the error floor: estimates are exact within
  * n·(3.5/maxMapSize).
  */
case class FreqItemsAgg(child: Expression, maxMapSize: Int = 1024,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]]
  with UnaryLike[Expression] {

  require(maxMapSize >= 8 && Integer.bitCount(maxMapSize) == 1,
    s"maxMapSize must be a power of 2 >= 8, got $maxMapSize")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_freq_items_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(buf: ItemsSketch[String],
                      input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: ItemsSketch[String],
                     other: ItemsSketch[String]): ItemsSketch[String] = {
    buf.merge(other)
    buf
  }

  override def eval(buf: ItemsSketch[String]): Any =
    buf.toByteArray(new ArrayOfStringsSerDe())

  override def serialize(buf: ItemsSketch[String]): Array[Byte] =
    buf.toByteArray(new ArrayOfStringsSerDe())
  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), new ArrayOfStringsSerDe())

  override def withNewMutableAggBufferOffset(n: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): FreqItemsAgg =
    copy(child = c)
}

/** Union of serialized frequent-items sketches. */
case class FreqMergeAgg(child: Expression, maxMapSize: Int = 1024,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]]
  with UnaryLike[Expression] {

  require(maxMapSize >= 8 && Integer.bitCount(maxMapSize) == 1,
    s"maxMapSize must be a power of 2 >= 8, got $maxMapSize")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_freq_union_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a serialized frequent-items sketch (binary), got ${other.catalogString}")
  }

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(buf: ItemsSketch[String],
                      input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null)
      buf.merge(ItemsSketch.getInstance(
        Memory.wrap(v.asInstanceOf[Array[Byte]]), new ArrayOfStringsSerDe()))
    buf
  }

  override def merge(buf: ItemsSketch[String],
                     other: ItemsSketch[String]): ItemsSketch[String] = {
    buf.merge(other)
    buf
  }

  override def eval(buf: ItemsSketch[String]): Any =
    buf.toByteArray(new ArrayOfStringsSerDe())

  override def serialize(buf: ItemsSketch[String]): Array[Byte] =
    buf.toByteArray(new ArrayOfStringsSerDe())
  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), new ArrayOfStringsSerDe())

  override def withNewMutableAggBufferOffset(n: Int): FreqMergeAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): FreqMergeAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): FreqMergeAgg =
    copy(child = c)
}

/** Heavy hitters from a serialized frequent-items sketch: up to `k`
  * items under NO_FALSE_POSITIVES (every returned item's true count
  * provably exceeds the error threshold), ordered by estimate
  * descending, as array<struct<item, estimate, lower, upper>>.
  */
case class FreqTopItemsExpr(child: Expression, k: Int)
  extends UnaryExpression with CodegenFallback {

  require(k > 0, s"k must be positive, got $k")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("estimate", LongType, nullable = false),
    StructField("lower", LongType, nullable = false),
    StructField("upper", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_freq_top_items"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a serialized frequent-items sketch (binary), got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val sk = ItemsSketch.getInstance(
      Memory.wrap(input.asInstanceOf[Array[Byte]]), new ArrayOfStringsSerDe())
    val rows = sk.getFrequentItems(ErrorType.NO_FALSE_POSITIVES)
      .sortBy(-_.getEstimate).take(k)
      .map(r => InternalRow(UTF8String.fromString(r.getItem),
        r.getEstimate, r.getLowerBound, r.getUpperBound))
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(c: Expression): FreqTopItemsExpr =
    copy(child = c)
}
