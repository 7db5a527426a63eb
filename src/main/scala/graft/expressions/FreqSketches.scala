package graft.expressions

import org.apache.datasketches.frequencies.LongsSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** Mergeable frequent-items ("heavy hitters") sketches over LONG items —
  * DataSketches' Misra–Gries/space-saving variant (Anderson et al., "A
  * high-performance algorithm for identifying frequent items in data
  * streams", IMC 2017), the third store-and-merge sketch family next to
  * the HLL cardinality and KLL quantile workflows in
  * [[graft.operators.Sketches]]: build a bounded-size sketch per shard/day,
  * merge any grouping later, and read off every item whose count exceeds
  * εN — the boilerplate-token / dominant-domain / hot-key detector a
  * 100 TB profiling pass runs without a full (item, count) shuffle.
  *
  * Error contract (DETERMINISTIC, unlike HLL/KLL's probabilistic ones):
  * with map size M the sketch guarantees |estimate − true| ≤ ε·N with
  * ε ≈ 3.5/M, and `getLowerBound/getUpperBound` ALWAYS bracket the true
  * count — merging preserves the guarantee. The per-item bracket booleans
  * in q112 are therefore hard invariants, not confidence assertions; the
  * estimates themselves remain merge-tree-specific (never hash-compare).
  * Items are LONGS: hash wider values first (the 64-bit collision caveat
  * of [[graft.operators.Similarity.sparseCosinePairs]] applies — a
  * collision can only MERGE two items' counts, which keeps upper bounds
  * valid and perturbs lower bounds with ~1e-13-per-corpus odds). */
case class FreqSketchAgg(
    child: Expression, maxMapSize: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongsSketch] with UnaryLike[Expression] {

  override def prettyName: String = "graft_freq_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def createAggregationBuffer(): LongsSketch = new LongsSketch(maxMapSize)

  override def update(buffer: LongsSketch, input: InternalRow): LongsSketch = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: LongsSketch, other: LongsSketch): LongsSketch =
    buffer.merge(other)

  override def eval(buffer: LongsSketch): Any = buffer.toByteArray

  override def serialize(buffer: LongsSketch): Array[Byte] = buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): LongsSketch =
    LongsSketch.getInstance(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FreqSketchAgg =
    copy(child = newChild)
}

/** Union of serialized frequency sketches (the group-later half). */
case class FreqMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongsSketch] with UnaryLike[Expression] {

  override def prettyName: String = "graft_freq_merge"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  // merging into a larger map never degrades the per-input guarantees;
  // 1024 matches FreqSketchAgg's q112 call site
  override def createAggregationBuffer(): LongsSketch = new LongsSketch(1024)

  override def update(buffer: LongsSketch, input: InternalRow): LongsSketch = {
    val v = child.eval(input)
    if (v != null)
      buffer.merge(LongsSketch.getInstance(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buffer
  }

  override def merge(buffer: LongsSketch, other: LongsSketch): LongsSketch =
    buffer.merge(other)

  override def eval(buffer: LongsSketch): Any = buffer.toByteArray

  override def serialize(buffer: LongsSketch): Array[Byte] = buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): LongsSketch =
    LongsSketch.getInstance(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FreqMergeAgg =
    copy(child = newChild)
}

/** Scalar: `[estimate, lower_bound, upper_bound]` for one item from a
  * serialized frequency sketch. The bounds are the sketch's deterministic
  * guarantee: lower ≤ true count ≤ upper, always. One call per probed
  * item (q112 probes the exact top-k), never per row — `CodegenFallback`. */
case class FreqBoundsLong(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "graft_freq_bounds"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(sketchBytes: Any, item: Any): Any = {
    val s = LongsSketch.getInstance(Memory.wrap(sketchBytes.asInstanceOf[Array[Byte]]))
    val v = item.asInstanceOf[Long]
    new GenericArrayData(Array(s.getEstimate(v), s.getLowerBound(v), s.getUpperBound(v)))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FreqBoundsLong =
    copy(left = newLeft, right = newRight)
}
