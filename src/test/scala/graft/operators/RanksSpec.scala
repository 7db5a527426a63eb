package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** The shared two-level rank machinery: exactness of floorDiv over the
  * full long range, and equivalence of positions/runningSums with the
  * single-partition global window they replace — including bucket-width
  * and partition-order invariance (the q171 pattern). */
class RanksSpec extends SparkTestBase {
  import spark.implicits._

  test("floorDiv: floor semantics for negatives; exact past 2^53") {
    val xs = Seq(-7L, -6L, -1L, 0L, 1L, 5L, 6L, 7L,
      // beyond 2^53 double division is off by one on some of these —
      // the exact integral path must match java.lang.Math.floorDiv
      (1L << 60) + 1L, -(1L << 60) - 1L, Long.MaxValue, Long.MaxValue - 1,
      9007199254740993L, -9007199254740993L)
    for (w <- Seq(1L, 3L, 1L << 40)) {
      val got = xs.toDF("x").select(Ranks.floorDiv(col("x"), w).as("q"))
        .collect().map(_.getLong(0))
      val want = xs.map(x => Math.floorDiv(x, w))
      assert(got.toSeq == want, s"w=$w")
    }
  }

  test("positions: equals global row_number; bucket-width and partition invariant") {
    val rows = (1 to 500).map(i => ((i * 37) % 251).toLong - 100L)
    val df = rows.zipWithIndex.map { case (v, id) => (v, id.toLong) }
      .toDF("v", "id")
    val expected = df
      .withColumn("p", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("v"), col("id"))))
      .select("id", "p").as[(Long, Int)].collect().toMap
    for (w <- Seq(1L, 16L, 1000L); parts <- Seq(1, 7)) {
      val got = Ranks.positions(df.repartition(parts),
          Ranks.floorDiv(col("v"), w), Seq(col("v"), col("id")), "p")
        .select("id", "p").as[(Long, Long)].collect().toMap
      assert(got == expected.map { case (k, v) => (k, v.toLong) },
        s"w=$w parts=$parts")
    }
  }

  test("runningSums: exclusive and inclusive match global windows; multi-column") {
    val df = (1 to 300).map(i => (((i * 53) % 97).toLong, (i % 5).toLong,
      (i % 3).toLong)).toDF("v", "a", "b")
    val wEx = org.apache.spark.sql.expressions.Window.orderBy(col("v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    // dedupe to levels first so the order is total (the call-site shape)
    val lv = df.groupBy("v").agg(sum("a").as("a"), sum("b").as("b"))
    val expected = lv
      .withColumn("ca", coalesce(sum(col("a")).over(wEx), lit(0L)))
      .withColumn("cb", coalesce(sum(col("b")).over(wEx), lit(0L)))
      .select("v", "ca", "cb").as[(Long, Long, Long)].collect().sortBy(_._1)
    val got = Ranks.runningSums(lv.repartition(5), Ranks.floorDiv(col("v"), 10L),
        Seq(col("v")), Seq("a" -> "ca", "b" -> "cb"))
      .select("v", "ca", "cb").as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == expected.toSeq)
    // inclusive shifts by the row's own value
    val gotIn = Ranks.runningSums(lv, Ranks.floorDiv(col("v"), 7L),
        Seq(col("v")), Seq("a" -> "ca"), inclusive = true)
      .select(col("v"), col("ca")).as[(Long, Long)].collect().toMap
    val lvMap = lv.select(col("v"), col("a")).as[(Long, Long)].collect().toMap
    for ((v, ca, _) <- expected)
      assert(gotIn(v) == ca + lvMap(v), s"v=$v")
  }

  test("withRangeBucket: NaN values land in the top cell (order-consistent with Spark's NaN-greatest sort)") {
    val df = (Seq(1.0, 5.0, 9.0, Double.NaN, 3.0)).toDF("x")
    val b = Ranks.withRangeBucket(df, "x", "bkt", cells = 4)
      .select(col("x"), col("bkt")).collect()
      .map(r => r.getDouble(0) -> r.getLong(1))
    // max() returns NaN, so the cell arithmetic goes NaN for EVERY row
    // and all rows collapse into one shared bucket — a correct
    // (single-bucket) degenerate, never an order inversion
    assert(b.map(_._2).distinct.length == 1)
    // without NaN, buckets are monotone and NaN-free values spread
    val clean = Ranks.withRangeBucket(Seq(1.0, 5.0, 9.0).toDF("x"), "x", "bkt", 4)
      .orderBy("x").select("bkt").as[Long].collect()
    assert(clean.toSeq == clean.sorted.toSeq && clean.distinct.length > 1)
  }

  test("withRangeBucket: order-consistent, bounded cells, degenerate range -> one bucket") {
    val df = (1 to 400).map(i => math.sin(i.toDouble) * 1e6).toDF("x")
    val b = Ranks.withRangeBucket(df, "x", "bkt", cells = 32)
      .select(col("x"), col("bkt")).as[(Double, Long)].collect().sortBy(_._1)
    assert(b.map(_._2).distinct.length > 4)           // actually splits
    assert(b.forall { case (_, k) => k >= 0 && k < 32 })
    assert(b.map(_._2).toSeq == b.map(_._2).sorted.toSeq) // monotone in x
    val const = Seq(5.0, 5.0, 5.0).toDF("x")
    assert(Ranks.withRangeBucket(const, "x", "bkt").select("bkt")
      .as[Long].collect().forall(_ == 0L))
  }
}
