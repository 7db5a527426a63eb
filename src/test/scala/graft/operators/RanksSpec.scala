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

  test("maxes: exclusive descending (suffix max) and inclusive match global windows; NULL over empty prefix") {
    val W = org.apache.spark.sql.expressions.Window
    val lv = (1 to 200).map(i => ((i % 4).toLong, ((i * 29) % 83).toLong,
      ((i * 7) % 50).toLong)).toDF("g", "x", "y")
      .groupBy("g", "x").agg(max("y").as("y"))
    // suffix max per group: max y over x' > x (the skyline dominance test)
    val wSuf = W.partitionBy(col("g")).orderBy(col("x").desc)
      .rowsBetween(W.unboundedPreceding, -1)
    val expected = lv.withColumn("m", max(col("y")).over(wSuf))
      .select("g", "x", "m").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    for (w <- Seq(1L, 8L, 1000L)) {
      val got = Ranks.twoLevel(lv.repartition(6),
          Ranks.floorDiv(col("x"), w), Seq(col("x").desc),
          maxes = Seq("y" -> "m"), descBuckets = true, partCols = Seq("g"))
        .select("g", "x", "m").collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
      assert(got == expected, s"w=$w")
      // the global max of each group has an empty prefix -> NULL
      assert(got.count(_._2.isEmpty) == 4)
    }
    // inclusive ascending running max equals the global inclusive window
    val wInc = W.orderBy(col("x"), col("g")).rowsBetween(W.unboundedPreceding, 0)
    val expInc = lv.withColumn("m", max(col("y")).over(wInc))
      .select("g", "x", "m").as[(Long, Long, Long)].collect().toSet
    val gotInc = Ranks.twoLevel(lv, Ranks.floorDiv(col("x"), 16L),
        Seq(col("x"), col("g")), maxes = Seq("y" -> "m"), inclusive = true)
      .select("g", "x", "m").as[(Long, Long, Long)].collect().toSet
    assert(gotInc == expInc)
  }

  test("nullEmptySums: NULL until the first non-null source, then coalesced prefix sums") {
    // terms null for v < 50: the running sum must stay NULL there
    val lv = (1 to 100).map(_.toLong).toDF("v")
      .withColumn("t", when(col("v") >= 50, col("v")))
    val got = Ranks.twoLevel(lv, Ranks.floorDiv(col("v"), 9L), Seq(col("v")),
        sums = Seq("t" -> "s"), inclusive = true, nullEmptySums = true)
      .select("v", "s").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    for (v <- 1L to 49L) assert(got(v).isEmpty, s"v=$v")
    for (v <- 50L to 100L)
      assert(got(v).contains((50L to v).sum), s"v=$v")
    // default (nullEmptySums=false) coalesces the same empty prefix to 0
    val dflt = Ranks.twoLevel(lv, Ranks.floorDiv(col("v"), 9L), Seq(col("v")),
        sums = Seq("t" -> "s"), inclusive = true)
      .filter(col("v") < 50).select("s").as[Long].collect()
    assert(dflt.forall(_ == 0L))
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

  test("twoLevel: null-bucket rows survive the null-safe join and rank where asc null ordering puts them (ADVICE r10)") {
    val df = Seq[(Option[Long], Long)]((None, 1L), (Some(5L), 2L),
      (Some(1L), 3L), (None, 4L), (Some(9L), 5L)).toDF("v", "id")
    // floorDiv(null, w) is null -> these rows used to vanish at the
    // offset equi-join; now they form their own cell, FIRST under asc
    // (Spark's asc null ordering), matching the in-bucket null placement
    val got = Ranks.positions(df.repartition(3),
        Ranks.floorDiv(col("v"), 4L), Seq(col("v"), col("id")), "p")
      .select("id", "p").as[(Long, Long)].collect().toMap
    val expected = df.withColumn("p", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("v"), col("id"))))
      .select("id", "p").as[(Long, Int)].collect()
      .map { case (k, v) => (k, v.toLong) }.toMap
    assert(got.size == 5, "a null-bucket row was dropped")
    assert(got == expected)
    // running sums too: the null cell contributes to later offsets
    val sums = Ranks.runningSums(df.repartition(2),
        Ranks.floorDiv(col("v"), 4L), Seq(col("v"), col("id")),
        Seq("id" -> "c"), inclusive = true)
      .select("id", "c").as[(Long, Long)].collect().toMap
    // global order: (null,1) (null,4) (1,3) (5,2) (9,5); inclusive sums of id
    assert(sums == Map(1L -> 1L, 4L -> 5L, 3L -> 8L, 2L -> 10L, 5L -> 15L))
  }
}
