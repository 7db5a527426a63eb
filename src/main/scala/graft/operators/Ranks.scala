package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The repo's shared two-level rank machinery (VERDICT r9 §next-2): global
  * order statistics — positions, running sums, running maxes — over a frame
  * that may be data-sized, WITHOUT a single-partition `Window.orderBy`.
  *
  * Shape: rows are keyed by an order-consistent BUCKET expression; one
  * window over the bucket-COUNT-sized frame computes cross-bucket offsets,
  * and per-bucket windows (parallel across buckets, spillable within)
  * finish the job. A global sort of N rows becomes a |buckets|-row window
  * plus embarrassingly parallel in-bucket work — the difference between a
  * stage that serializes on one task at 100 TB and one that scales with
  * the cluster. Sum, count (row_number) and max all decompose this way
  * (offset ⊕ in-bucket running value), which covers every call site in the
  * repo: prefix counts ([[Stats]]), global positions ([[Layout.zoneMap]],
  * [[Joins.sortedNeighborhoodPairs]], [[Stats.concentration]]), quantile
  * ranks ([[Profile.equalFrequencyBins]], `TableCleaner.BinnedColumn`),
  * and skew ranks ([[Profile.keySkew]]).
  *
  * Bucket choice: the bucket expression MUST be order-consistent with the
  * in-bucket order columns (v₁ < v₂ ⟹ bucket(v₁) ≤ bucket(v₂)) and SHOULD
  * split the frame into ~10²–10⁶ cells. [[floorDiv]] handles fixed-width
  * long keys; [[withRangeBucket]] derives a data-adaptive equi-width bucket
  * for numeric columns (two cheap extremes of the LEVEL table, not the
  * rows); a `substring` prefix works for strings (binary collation makes
  * prefix order consistent with full-string order). A degenerate bucket
  * expression (all rows in one cell) silently degrades to the global sort
  * this object exists to avoid — it stays correct, just serial. */
object Ranks {

  /** Exact floor division of a long column by a positive long constant.
    * SQL `/` on longs promotes to DOUBLE: beyond 2⁵³ the quotient can be
    * off by one — fatal for bucket keys, where two engines disagreeing on
    * a boundary row breaks join/offset alignment (ADVICE r9 §2). Uses
    * integral `div` with a sign correction, so it is exact over the full
    * 64-bit range and floors (not truncates) for negative x. */
  def floorDiv(x: Column, w: Long): Column = {
    require(w >= 1, s"floorDiv width must be positive, got $w")
    val q = call_function("div", x, lit(w))
    when(x % w < 0, q - 1).otherwise(q)
  }

  /** Append a data-adaptive order-consistent bucket column for a NUMERIC
    * column: equi-width cells over the observed [min, max] (one extra agg
    * over `df` itself — call on the LEVEL table, where that scan is
    * |levels|-sized, not on raw rows). All-equal (or all-null) ranges
    * degrade to one bucket. The mapping x ↦ ⌊(x−lo)/(hi−lo)·cells⌋ is
    * monotone under IEEE-754 round-to-nearest (subtraction, multiplication
    * and division by non-negative constants are non-decreasing), so bucket
    * order is consistent with value order for any distribution — the
    * property a FIXED bucket width cannot promise without knowing the
    * data's range. A NaN anywhere in the column makes max() return NaN
    * and every row's cell arithmetic go NaN — all rows collapse into one
    * shared bucket: correct (trivially order-consistent) but serial, so
    * scrub NaNs upstream if the column can carry them (RanksSpec pins
    * this degenerate). */
  def withRangeBucket(df: DataFrame, valueCol: String, bucketName: String,
      cells: Int = 4096): DataFrame = {
    require(cells >= 1, "cells must be positive")
    val v = col(valueCol).cast("double")
    val mm = df.agg(min(v).as("__rk_lo"), max(v).as("__rk_hi"))
    df.crossJoin(broadcast(mm))
      .withColumn(bucketName,
        when(col("__rk_hi") <= col("__rk_lo"), lit(0L))
          .otherwise(least(
            floor((v - col("__rk_lo"))
              / (col("__rk_hi") - col("__rk_lo")) * lit(cells.toLong)),
            lit(cells - 1L))).cast("long"))
      .drop("__rk_lo", "__rk_hi")
  }

  /** The core pass: append, in ONE two-level sweep, any combination of a
    * global 1-based position (`posCol`, via per-bucket `row_number`),
    * running sums (`sums`: srcCol → outCol), and running maxes
    * (`maxes`: srcCol → outCol), as if `df` were ordered globally by
    * (`order`*) — optionally per partition group (`partCols`, by NAME:
    * the grouped variants' shape). Sums and maxes are over rows strictly
    * before this one (`inclusive=false`, the "count below" shape) or up
    * to and including it (`inclusive=true`, the CDF shape); the position
    * is always inclusive. Null sources contribute nothing (SQL sum/max).
    * `descBuckets=true` flips the CROSS-BUCKET order for descending
    * sweeps — the in-bucket `order` columns must then carry their own
    * `.desc`, consistently (so an exclusive descending max is a SUFFIX
    * max: the [[Ops.skylinePerGroup]] dominance test).
    *
    * Empty-prefix semantics: sums default to 0 over an empty prefix;
    * `nullEmptySums=true` yields NULL instead when NO non-null source
    * value precedes (the "no information yet" shape [[Stats.kaplanMeier]]
    * needs to distinguish log-survival 0 from not-yet-started). Maxes are
    * always NULL over an empty prefix — `greatest` of the two levels
    * skips the absent one, so no flag is needed.
    *
    * `bucket` must be order-consistent with the head of `order`; ties
    * beyond `order` are deterministic only if `order` is a total order —
    * pass enough columns to make it one (the call sites all do). A NULL
    * bucket is allowed and its rows SURVIVE (null-safe join): they form
    * their own cell, placed where Spark's null ordering puts it — first
    * under ascending buckets, last under `descBuckets` — consistent with
    * the null placement of the in-bucket `order` columns. */
  def twoLevel(df: DataFrame, bucket: Column, order: Seq[Column],
      sums: Seq[(String, String)] = Nil, posCol: Option[String] = None,
      inclusive: Boolean = false, descBuckets: Boolean = false,
      partCols: Seq[String] = Nil, maxes: Seq[(String, String)] = Nil,
      nullEmptySums: Boolean = false): DataFrame = {
    require(sums.nonEmpty || posCol.nonEmpty || maxes.nonEmpty,
      "nothing to compute")
    val tagged = df.withColumn("__rk_b", bucket)
    val bKey = if (descBuckets) col("__rk_b").desc else col("__rk_b").asc
    val joinKeys = partCols :+ "__rk_b"
    val wb = Window.partitionBy(partCols.map(col): _*).orderBy(bKey)
      .rowsBetween(Window.unboundedPreceding, -1)
    val bAggs = sums.zipWithIndex.map { case ((src, _), i) =>
      sum(col(src)).as(s"__rk_s$i") } ++
      maxes.zipWithIndex.map { case ((src, _), i) =>
        max(col(src)).as(s"__rk_m$i") } ++
      posCol.map(_ => count(lit(1)).as("__rk_bn"))
    val buckets = tagged.groupBy(joinKeys.map(col): _*)
      .agg(bAggs.head, bAggs.tail: _*)
    // offsets stay UN-coalesced here (null = empty/all-null prefix); the
    // combine step below decides 0-vs-null per output family
    val offs: Seq[(String, String, Column => Column)] =
      sums.indices.map(i => (s"__rk_s$i", s"__rk_o$i",
        (c: Column) => sum(c).over(wb))) ++
      maxes.indices.map(i => (s"__rk_m$i", s"__rk_om$i",
        (c: Column) => max(c).over(wb))) ++
      posCol.map(_ => ("__rk_bn", "__rk_off",
        (c: Column) => sum(c).over(wb))).toSeq
    val withOffs = offs.foldLeft(buckets) { case (b, (s, o, f)) =>
      b.withColumn(o, f(col(s)))
    }.select((joinKeys ++ offs.map(_._2)).map(col): _*)
    val hi = if (inclusive) 0L else -1L
    val wInBase = Window.partitionBy(joinKeys.map(col): _*).orderBy(order: _*)
    val wIn = wInBase.rowsBetween(Window.unboundedPreceding, hi)
    // NULL-SAFE join back to the offsets (ADVICE r10): a plain equi-join
    // silently dropped any row whose bucket (or partition key) evaluates
    // to null. groupBy and Window already treat null as an ordinary group,
    // so <=> makes null-bucket rows first-class: they sort where Spark's
    // null ordering puts them (FIRST under asc, LAST under desc — which
    // matches the null placement of the in-bucket `order` columns, so the
    // order-consistency contract extends to nulls for free).
    val offsR = withOffs.select(
      (joinKeys.map(k => col(k).as(s"__rkj_$k")) ++ offs.map(o => col(o._2))): _*)
    val cond = joinKeys.map(k => col(k) <=> col(s"__rkj_$k")).reduce(_ && _)
    val joined = tagged.join(offsR, cond)
      .drop(joinKeys.map(k => s"__rkj_$k"): _*)
    val withSums = sums.zipWithIndex.foldLeft(joined) {
      case (d, ((src, out), i)) =>
        val inSum = sum(col(src)).over(wIn)
        val total = coalesce(col(s"__rk_o$i"), lit(0L)) +
          coalesce(inSum, lit(0L))
        d.withColumn(out,
          if (nullEmptySums)
            when(col(s"__rk_o$i").isNull && inSum.isNull,
              lit(null).cast("long")).otherwise(total)
          else total)
    }
    val withMaxes = maxes.zipWithIndex.foldLeft(withSums) {
      case (d, ((src, out), i)) =>
        d.withColumn(out, greatest(col(s"__rk_om$i"), max(col(src)).over(wIn)))
    }
    posCol.fold(withMaxes) { p =>
      withMaxes.withColumn(p,
        coalesce(col("__rk_off"), lit(0L)) + row_number().over(wInBase))
    }.drop("__rk_b" +: offs.map(_._2): _*)
  }

  /** Append a global 1-based position `posCol` to `df`, as if ordered by
    * (`order`*) — bucket offsets + per-bucket `row_number`, no
    * single-partition sort. See [[twoLevel]] for the bucket contract. */
  def positions(df: DataFrame, bucket: Column, order: Seq[Column],
      posCol: String): DataFrame =
    twoLevel(df, bucket, order, posCol = Some(posCol))

  /** Append running SUMS of `sums` (srcCol → outCol) to `df`, as if
    * ordered globally by (`order`*). See [[twoLevel]]. */
  def runningSums(df: DataFrame, bucket: Column, order: Seq[Column],
      sums: Seq[(String, String)], inclusive: Boolean = false): DataFrame =
    twoLevel(df, bucket, order, sums = sums, inclusive = inclusive)
}
