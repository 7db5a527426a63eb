package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter build + membership test over LONG keys, via the
  * `org.apache.spark.util.sketch.BloomFilter` Spark itself ships (the same
  * implementation Spark's internal runtime-filter injection uses) — the
  * join-pruning primitive [[graft.operators.Joins.bloomPrunedJoin]] is
  * built on (north-star extension: at 100 TB the dominant join cost is
  * shuffling big-side rows that will never match; a KB–MB bloom of the
  * small side's keys, tested BEFORE the exchange, drops them at scan
  * time).
  *
  * Same execution shape as the [[KllSketches]] family: a
  * `TypedImperativeAggregate` whose partial state IS the filter, so the
  * build is one map-side-combined pass over the key column and shuffled
  * volume is filters, never keys. All buffers are created with identical
  * (expectedItems, fpp) sizing, which is what `mergeInPlace` requires.
  *
  * Contract: NO false negatives, ever (the bloom property the exact-join
  * oracle q129 leans on — pruning can only drop rows the join would drop
  * anyway); false positives at ~`fpp` cost nothing but wasted shuffle.
  * Keys are LONGS by design, like every hash in this library: pre-hash
  * strings with `xxhash64`/the md5-60 pattern so engines agree. */
case class BloomFilterAgg(
    child: Expression, expectedItems: Long, fpp: Double,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter] with UnaryLike[Expression] {

  require(expectedItems > 0, "graft_bloom_agg: expectedItems must be > 0")
  require(fpp > 0.0 && fpp < 1.0, "graft_bloom_agg: fpp must be in (0, 1)")

  override def prettyName: String = "graft_bloom_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BIGINT key (pre-hash strings), got ${child.dataType.sql}")

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  override def update(buffer: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) buffer.putLong(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: BloomFilter, other: BloomFilter): BloomFilter = {
    buffer.mergeInPlace(other)
    buffer
  }

  override def eval(buffer: BloomFilter): Any = serialize(buffer)

  override def serialize(buffer: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    buffer.writeTo(out)
    out.toByteArray
  }
  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomFilterAgg =
    copy(child = newChild)
}

/** `graft_bloom_might_contain(bloom, key)` — membership test against a
  * PLAN-CONSTANT serialized bloom (a `lit(bytes)` the caller embeds; the
  * same foldability contract as Spark's internal `might_contain`). The
  * filter deserializes once per task and the per-row test is two hash
  * probes, codegen'd, so the pruning predicate rides inside
  * WholeStageCodegen next to the scan it guards — visible in `.explain`
  * as a filter BELOW the join's exchange. */
case class BloomMightContainLong(bloom: Expression, value: Expression)
    extends BinaryExpression {

  override def left: Expression = bloom
  override def right: Expression = value
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult =
    if (!bloom.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable BINARY bloom (embed the built filter with lit())")
    else if (bloom.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a BINARY bloom, got ${bloom.dataType.sql}")
    else if (value.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a BIGINT key, got ${value.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val filter: BloomFilter = {
    val bytes = bloom.eval().asInstanceOf[Array[Byte]]
    if (bytes == null) null
    else BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  }

  override def nullSafeEval(bloomBytes: Any, v: Any): Any =
    filter.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the deserialized filter rides the reference array (BloomFilterImpl is
    // Serializable), exactly like Spark's internal BloomFilterMightContain
    val bf = ctx.addReferenceObj("bloomFilter", filter, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, (_, v) => s"${ev.value} = $bf.mightContainLong($v);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContainLong =
    copy(bloom = newLeft, value = newRight)
}
