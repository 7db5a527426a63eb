package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Plan-time hyperplane matrix for [[LshBucketsLong]]: the seeded ±1
  * Rademacher planes ([[graft.operators.Similarity.hyperplanes]] — a pure
  * function of (seed, nTables, bits, dim)) flattened to one primitive long
  * array, indexed [(t·bits + j)·dim + pos].
  *
  * Why an expression and not the relational explode: the former
  * formulation exploded every vector into dim rows, broadcast-joined the
  * plane table (fan-out ×nTables·bits per (row, pos) — 25M intermediate
  * rows on a 2.7k-vector corpus at the 24-table dial) and collapsed it
  * back through TWO hash-agg exchanges. The bucket signature is a pure
  * function of one row against a plan-time-constant matrix, so it belongs
  * in a projection: zero shuffle, tight primitive-long loops inside
  * WholeStageCodegen (guide §2.4 — remove shuffles outright; §1.2 step 2).
  * The matrix is nTables·bits·dim longs (24·8·48 ≈ 9k at the widest dial —
  * the SAME rows the join broadcast anyway). */
final class PlaneMatrix(
    val nTables: Int, val bits: Int, val dim: Int, val flat: Array[Long])
  extends Serializable {
  require(nTables > 0 && bits > 0 && dim > 0, "plane matrix must be non-empty")
  require(flat.length == nTables * bits * dim, "plane matrix must be dense")

  /** Bucket per table: bit j of table t's bucket = [Σ_pos w(t,j,pos)·v(pos)
    * ≥ 0] — exact integer sums, bit-identical to the relational
    * sum(when(s ≥ 0, 1<<j)) aggregation this replaces. */
  def buckets(v: ArrayData): ArrayData = {
    if (v.numElements() != dim)
      throw QDotLong.dimMismatch(v.numElements(), dim)
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var b = 0L
      var j = 0
      while (j < bits) {
        var s = 0L
        var i = 0
        val off = (t * bits + j) * dim
        while (i < dim) { s += flat(off + i) * v.getLong(i); i += 1 }
        if (s >= 0L) b += (1L << j)
        j += 1
      }
      out(t) = b
      t += 1
    }
    new GenericArrayData(out)
  }
}

/** Native Catalyst expression: all `nTables` sign-LSH bucket signatures of
  * a quantized vector (`array<bigint>`) against a plan-time-constant
  * hyperplane matrix, as `array<bigint>` indexed by table — the bucketing
  * pass as ONE codegen'd projection instead of a dim-explode + broadcast
  * join + two hash-agg exchanges (see [[PlaneMatrix]]). Null-intolerant:
  * a null vector yields null (these corpora carry no null embeddings; the
  * empty-corpus case short-circuits upstream). */
case class LshBucketsLong(left: Expression, right: Expression,
    matrix: PlaneMatrix) extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_lsh_buckets"

  override def nullSafeEval(v: Any, planes: Any): Any =
    matrix.buckets(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("planeMatrix", matrix, classOf[PlaneMatrix].getName)
    nullSafeCodeGen(ctx, ev, (v, _) => s"${ev.value} = $m.buckets($v);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LshBucketsLong =
    copy(left = newLeft, right = newRight)
}

object LshBucketsLong {
  /** Build a [[PlaneMatrix]] from a FOLDABLE `array<struct<t bigint,
    * j bigint, pos bigint, w bigint>>` expression (the registry path: the
    * localized plane table as a typedLit). Evaluated once at plan time;
    * (t, j, pos) must cover the full dense grid. */
  def planeMatrixOf(e: Expression, fn: String): PlaneMatrix = {
    require(e.foldable, s"$fn: the plane matrix must be a foldable " +
      s"literal array, got: $e")
    val ad = e.eval().asInstanceOf[ArrayData]
    require(ad != null && ad.numElements() > 0, s"$fn: empty plane matrix")
    val n = ad.numElements()
    var maxT = -1L
    var maxJ = -1L
    var maxP = -1L
    val rows = (0 until n).map { i =>
      val r = ad.getStruct(i, 4)
      val (t, j, p, w) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      if (t > maxT) maxT = t
      if (j > maxJ) maxJ = j
      if (p > maxP) maxP = p
      (t, j, p, w)
    }
    val (nT, nB, nD) = ((maxT + 1).toInt, (maxJ + 1).toInt, (maxP + 1).toInt)
    require(n == nT * nB * nD,
      s"$fn: plane matrix must be the dense (t, j, pos) grid - got $n rows " +
        s"for $nT tables x $nB bits x $nD dims")
    val flat = new Array[Long](n)
    rows.foreach { case (t, j, p, w) =>
      flat(((t * nB + j) * nD + p).toInt) = w
    }
    new PlaneMatrix(nT, nB, nD, flat)
  }
}
