package graft.expressions

import org.apache.datasketches.frequencies.LongsSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
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

  // a clean analysis error instead of a runtime CCE in update() (ADVICE r6)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BIGINT argument (hash wider values first), " +
        s"got ${child.dataType.sql}")

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

/** Mutable holder so [[FreqMergeAgg]]'s buffer adopts its FIRST input
  * sketch's maxMapSize instead of a hardcoded default (ADVICE r6): the
  * ε ≈ 3.5/M guarantee is governed by the SMALLEST map involved, so a
  * fixed-1024 buffer would silently widen the error bounds of inputs built
  * with a larger map. `s == null` means "no input seen yet". */
final class FreqMergeBuffer(var s: LongsSketch)

/** Union of serialized frequency sketches (the group-later half). The
  * merge buffer adopts the first input sketch's maxMapSize (uniform-size
  * inputs keep their ε; mixed sizes degrade to the smallest, which no
  * buffer sizing can avoid). A group with no non-null input evaluates to
  * NULL, and [[FreqBoundsLong]] propagates that NULL. */
case class FreqMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FreqMergeBuffer] with UnaryLike[Expression] {

  override def prettyName: String = "graft_freq_merge"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BINARY sketch argument, got ${child.dataType.sql}")

  override def createAggregationBuffer(): FreqMergeBuffer = new FreqMergeBuffer(null)

  override def update(buffer: FreqMergeBuffer, input: InternalRow): FreqMergeBuffer = {
    val v = child.eval(input)
    if (v != null) {
      // getInstance heapifies OUR bytes into a writable copy — safe to adopt
      val in = LongsSketch.getInstance(Memory.wrap(v.asInstanceOf[Array[Byte]]))
      if (buffer.s == null) buffer.s = in else buffer.s.merge(in)
    }
    buffer
  }

  override def merge(buffer: FreqMergeBuffer, other: FreqMergeBuffer): FreqMergeBuffer = {
    if (other.s != null) {
      if (buffer.s == null) buffer.s = other.s else buffer.s.merge(other.s)
    }
    buffer
  }

  override def eval(buffer: FreqMergeBuffer): Any =
    if (buffer.s == null) null else buffer.s.toByteArray

  override def serialize(buffer: FreqMergeBuffer): Array[Byte] =
    if (buffer.s == null) Array.emptyByteArray else buffer.s.toByteArray
  override def deserialize(bytes: Array[Byte]): FreqMergeBuffer =
    if (bytes.isEmpty) new FreqMergeBuffer(null)
    else new FreqMergeBuffer(LongsSketch.getInstance(Memory.wrap(bytes)))

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
