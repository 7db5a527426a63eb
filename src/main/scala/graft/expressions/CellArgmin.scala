package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Plan-time centroid matrix for [[CellArgminLong]]: the localized centroid
  * set flattened to primitive arrays, sorted by centroid id ascending so a
  * strict-improvement scan reproduces `min(struct(d2, cent_id))` exactly
  * (equal d² keeps the earlier = lowest id — the broadcast-join + min-struct
  * tie rule this expression replaces).
  *
  * Why an expression and not the join: the old formulation expanded every
  * corpus row × every centroid through a broadcast join and collapsed it
  * back with a hash aggregate — a full corpus-cardinality EXCHANGE per
  * assignment pass (and per Lloyd round). The argmin is a pure function of
  * one row against a plan-time-constant matrix, so it belongs in a
  * projection: zero shuffle, tight primitive-long loops inside
  * WholeStageCodegen (guide §2.4 — remove shuffles outright; §4 — codegen
  * expressions in the hot path). The matrix is ≤ √N rows · dim longs (IVF)
  * or m·kCents·dsub longs (PQ) — the SAME frame the join broadcast anyway. */
final class CellMatrix(
    val ids: Array[Long], val flat: Array[Long], val ccs: Array[Long],
    val dim: Int) extends Serializable {
  require(ids.length > 0, "centroid matrix must be non-empty")
  require(dim > 0, "centroid dimension must be positive")

  /** Exact-integer argmin cell: d² = vv − 2·v·c + c·c over longs, ties to
    * the lowest centroid id (ids are sorted ascending, strict `<` keeps the
    * first minimum). Bit-identical to the min(struct(d2, cent_id)) agg. */
  def argmin(v: ArrayData, vv: Long): Long = {
    if (v.numElements() != dim)
      throw QDotLong.dimMismatch(v.numElements(), dim)
    var best = 0L
    var bestId = 0L
    var k = 0
    while (k < ids.length) {
      var dot = 0L
      var i = 0
      val off = k * dim
      while (i < dim) { dot += v.getLong(i) * flat(off + i); i += 1 }
      val d2 = vv - 2L * dot + ccs(k)
      if (k == 0 || d2 < best) { best = d2; bestId = ids(k) }
      k += 1
    }
    bestId
  }
}

/** Per-subspace codebook matrices for [[CodeArgminLong]]: one [[CellMatrix]]
  * per PQ subspace index (0..m−1, dense). */
final class CodeMatrix(val subs: Array[CellMatrix]) extends Serializable {
  require(subs.nonEmpty && subs.forall(_ != null),
    "codebook matrix must cover every subspace 0..m-1 densely")
  def argmin(sub: Int, v: ArrayData, vv: Long): Long = {
    if (sub < 0 || sub >= subs.length)
      throw CellArgminLong.subOutOfRange(sub, subs.length)
    subs(sub).argmin(v, vv)
  }
}

/** Native Catalyst expression: exact-integer argmin cell assignment of a
  * quantized vector (`array<bigint>`, with its precomputed self-dot) against
  * a plan-time-constant centroid matrix — the IVF coarse-assignment loop as
  * ONE codegen'd projection instead of a broadcast join + corpus-wide
  * hash-agg exchange (see [[CellMatrix]]). Null-intolerant: a null vector or
  * norm yields null (the corpora these paths run on carry no null
  * embeddings; the empty-corpus case short-circuits upstream). */
case class CellArgminLong(left: Expression, right: Expression,
    matrix: CellMatrix) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_cell_argmin"

  override def nullSafeEval(v: Any, vv: Any): Any =
    matrix.argmin(v.asInstanceOf[ArrayData], vv.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("cellMatrix", matrix, classOf[CellMatrix].getName)
    nullSafeCodeGen(ctx, ev, (v, vv) => s"${ev.value} = $m.argmin($v, $vv);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CellArgminLong =
    copy(left = newLeft, right = newRight)
}

object CellArgminLong {
  def subOutOfRange(sub: Int, m: Int): IllegalArgumentException =
    new IllegalArgumentException(
      s"graft_code_argmin: subspace index $sub outside the trained books " +
        s"(m=$m) - batch vectors must share the index's dimensionality")

  /** Build a [[CellMatrix]] from a FOLDABLE `array<struct<cent_id bigint,
    * cv array<bigint>, cc bigint>>` expression (the registry path: the
    * caller passes the localized centroid set as a typedLit). Evaluated
    * once at plan time. */
  def cellMatrixOf(e: Expression, fn: String): CellMatrix = {
    require(e.foldable, s"$fn: the centroid matrix must be a foldable " +
      s"literal array, got: $e")
    val ad = e.eval().asInstanceOf[ArrayData]
    require(ad != null && ad.numElements() > 0, s"$fn: empty centroid matrix")
    val n = ad.numElements()
    val entries = (0 until n).map { i =>
      val row = ad.getStruct(i, 3)
      (row.getLong(0), row.getArray(1).toLongArray(), row.getLong(2))
    }.sortBy(_._1)
    val dim = entries.head._2.length
    require(entries.forall(_._2.length == dim),
      s"$fn: centroid vectors must share one dimension")
    val flat = new Array[Long](n * dim)
    entries.zipWithIndex.foreach { case ((_, cv, _), k) =>
      System.arraycopy(cv, 0, flat, k * dim, dim)
    }
    new CellMatrix(entries.map(_._1).toArray, flat, entries.map(_._3).toArray, dim)
  }

  /** Build a [[CodeMatrix]] from a FOLDABLE `array<struct<sub int, cent_id
    * bigint, cv array<bigint>, cc bigint>>` expression; subspace indexes
    * must cover 0..m−1 densely (they do by construction — posexplode of the
    * static slice array). */
  def codeMatrixOf(e: Expression, fn: String): CodeMatrix = {
    require(e.foldable, s"$fn: the codebook matrix must be a foldable " +
      s"literal array, got: $e")
    val ad = e.eval().asInstanceOf[ArrayData]
    require(ad != null && ad.numElements() > 0, s"$fn: empty codebook matrix")
    val n = ad.numElements()
    val entries = (0 until n).map { i =>
      val row = ad.getStruct(i, 4)
      (row.getInt(0), row.getLong(1), row.getArray(2).toLongArray(), row.getLong(3))
    }
    val bySub = entries.groupBy(_._1)
    val m = bySub.keys.max + 1
    require(bySub.keys.min == 0 && bySub.size == m,
      s"$fn: subspace indexes must cover 0..${m - 1} densely, got ${bySub.keys.toSeq.sorted}")
    val subs = (0 until m).map { s =>
      val es = bySub(s).map(t => (t._2, t._3, t._4)).sortBy(_._1)
      val dim = es.head._2.length
      require(es.forall(_._2.length == dim),
        s"$fn: codebook vectors of subspace $s must share one dimension")
      val flat = new Array[Long](es.length * dim)
      es.zipWithIndex.foreach { case ((_, cv, _), k) =>
        System.arraycopy(cv, 0, flat, k * dim, dim)
      }
      new CellMatrix(es.map(_._1).toArray, flat, es.map(_._3).toArray, dim)
    }.toArray
    new CodeMatrix(subs)
  }
}

/** [[CellArgminLong]]'s per-subspace sibling: argmin code of a sub-vector
  * against ITS subspace's codebook — children (sub int, sv array<bigint>,
  * svv bigint), the PQ code-assignment loop as one codegen'd projection. */
case class CodeArgminLong(first: Expression, second: Expression,
    third: Expression, matrix: CodeMatrix) extends TernaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_code_argmin"

  override def nullSafeEval(sub: Any, v: Any, vv: Any): Any =
    matrix.argmin(sub.asInstanceOf[Int], v.asInstanceOf[ArrayData],
      vv.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("codeMatrix", matrix, classOf[CodeMatrix].getName)
    nullSafeCodeGen(ctx, ev, (sub, v, vv) =>
      s"${ev.value} = $m.argmin($sub, $v, $vv);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): CodeArgminLong =
    copy(first = newFirst, second = newSecond, third = newThird)
}
