package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Interval-set algebra over keyed integer intervals (✚ extension
  * surface) — the temporal bookkeeping a pipeline needs around
  * [[Joins.rangeJoin]]/[[Joins.intervalOverlapJoin]] (which MATCH against
  * intervals) and the q146 SCD2 builder (which EMITS them): collapsing a
  * key's overlapping validity/activity spans into their union, and
  * measuring true coverage without double-counting overlap.
  *
  * Everything is exact long arithmetic on half-open [lo, hi) bounds —
  * no floats anywhere, so results are engine- and partitioning-exact. */
object Intervals {

  /** Union (merge) of possibly-overlapping half-open intervals [lo, hi)
    * per key, via the classic sweep: within each key order by (lo, hi);
    * an interval starts a new merged run iff its lo exceeds the running
    * max hi of all earlier intervals; run ids are the prefix count of
    * such starts; one hash-agg collapses each run to its span. Abutting
    * intervals (lo = prev hi) merge — the half-open reading. Null or
    * empty (hi ≤ lo) intervals drop.
    *
    * Scale shape: ONE shuffle (partition by key), two windows inside the
    * key partition (running max, prefix count), one map-side-combined
    * agg — parallel across keys, spillable within, the
    * [[Grouping.medianByWindow]] discipline. A key's interval count never
    * sits in memory at once. Output: (key, merged_lo, merged_hi,
    * n_source) — `n_source` = how many input intervals collapsed into
    * the run. */
  def mergeIntervals(df: DataFrame, keyCol: String, loCol: String,
      hiCol: String): DataFrame = {
    val in = df
      .filter(col(keyCol).isNotNull && col(loCol).isNotNull && col(hiCol).isNotNull)
      .select(col(keyCol).as("k"),
        col(loCol).cast(LongType).as("lo"), col(hiCol).cast(LongType).as("hi"))
      .filter(col("hi") > col("lo"))
    val byK = Window.partitionBy(col("k")).orderBy(col("lo"), col("hi"))
    val prevMax = max(col("hi")).over(byK.rowsBetween(Window.unboundedPreceding, -1))
    val flagged = in.withColumn("new_run",
      when(prevMax.isNull || col("lo") > prevMax, lit(1L)).otherwise(lit(0L)))
    val runs = flagged.withColumn("run",
      sum(col("new_run")).over(byK.rowsBetween(Window.unboundedPreceding, 0)))
    runs.groupBy(col("k"), col("run"))
      .agg(min(col("lo")).as("merged_lo"), max(col("hi")).as("merged_hi"),
        count(lit(1)).as("n_source"))
      .select(col("k").as(keyCol), col("merged_lo"), col("merged_hi"),
        col("n_source"))
  }

  /** Per-key coverage summary over the merged union: how much of the
    * timeline the key's intervals actually cover (overlap counted once),
    * in how many disjoint runs, against the key's [min lo, max hi) span —
    * gap = span − covered. One extra hash-agg over [[mergeIntervals]].
    * Output: (key, n_runs, covered, span, gap). */
  def coverage(df: DataFrame, keyCol: String, loCol: String,
      hiCol: String): DataFrame =
    mergeIntervals(df, keyCol, loCol, hiCol)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_runs"),
        sum(col("merged_hi") - col("merged_lo")).as("covered"),
        (max(col("merged_hi")) - min(col("merged_lo"))).as("span"))
      .withColumn("gap", col("span") - col("covered"))
}
