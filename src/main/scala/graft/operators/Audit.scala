package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed table reconciliation (✚ extension surface) — the "did the
  * backfill change anything it shouldn't have" audit between two
  * versions of a keyed table: which keys appeared, vanished, changed
  * payload, or carried over bit-identical. The companion to the q145
  * upsert compactor (which PRODUCES new versions) and the q149
  * expectation battery (which checks ONE version against rules).
  *
  * Comparison is column-by-column null-safe equality (`<=>`) over the
  * common non-key columns — no row hashing, so no cross-engine hash or
  * float-formatting contract to uphold, and a mismatch is attributable
  * to a column. */
object Audit {

  /** Per-key diff status between `a` (old) and `b` (new) on `keys`:
    * `only_a` (deleted), `only_b` (inserted), `changed` (any common
    * non-key column differs under null-safe equality), `same`. Keys must
    * be unique per side (compact first — [[Ops]] dropDuplicates or the
    * q145 upsert compactor); duplicate keys would cross-product in the
    * join. Columns existing on one side only are ignored (schema drift
    * is a schema diff, not a row diff).
    *
    * Scale shape: ONE full-outer sort-merge join on the key columns —
    * both sides shuffle-partitioned by key, payload columns compared
    * inside the join row, nothing collected, no window. Output: key
    * columns + `diff_status`. */
  def tableDiff(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "need at least one key column")
    val common = a.columns.toSeq.intersect(b.columns.toSeq).filterNot(keys.contains)
    val aSide = a.select((keys.map(col) :+ lit(1).as("__in_a"))
      ++ common.map(c => col(c).as(s"__a_$c")): _*)
    val bSide = b.select((keys.map(col) :+ lit(1).as("__in_b"))
      ++ common.map(c => col(c).as(s"__b_$c")): _*)
    val joined = aSide.join(bSide, keys, "full_outer")
    val changed = common
      .map(c => !(col(s"__a_$c") <=> col(s"__b_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    joined.select(keys.map(col) :+
      when(col("__in_b").isNull, lit("only_a"))
        .when(col("__in_a").isNull, lit("only_b"))
        .when(changed, lit("changed"))
        .otherwise(lit("same")).as("diff_status"): _*)
  }

  /** The one-line reconciliation scorecard: [[tableDiff]] reduced to
    * counts per status (statuses with zero keys emit no row — group-by
    * semantics, mirrored by the oracle). */
  def diffSummary(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame =
    tableDiff(a, b, keys)
      .groupBy(col("diff_status"))
      .agg(count(lit(1)).as("n_keys"))
}
