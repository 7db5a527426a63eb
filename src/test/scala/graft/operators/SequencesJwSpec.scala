package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.expressions.{GraftFunctions, JaroWinklerMicro}
import org.apache.spark.unsafe.types.UTF8String

/** Time-weighted means, incremental transition folds, and the
  * Jaro-Winkler expression. */
class SequencesJwSpec extends SparkTestBase {
  import spark.implicits._

  private def jw(a: String, b: String): Long =
    JaroWinklerMicro.micro(UTF8String.fromString(a), UTF8String.fromString(b))

  test("JaroWinklerMicro: textbook values, empties, boost gating, prefix cap") {
    // martha/marhta: jaro = 17/18, p = 3 -> jw = 17/18 + 0.3/18
    assert(jw("martha", "marhta") == 961111L)
    assert(jw("dixon", "dicksonx") == 813333L)
    assert(jw("dwayne", "duane") == 840000L)
    assert(jw("abc", "abc") == 1000000L)
    assert(jw("", "abc") == 0L && jw("", "") == 0L && jw("a", "b") == 0L)
    // jaro exactly 0.7333 > 0.7 but zero prefix: no boost
    assert(jw("crate", "trace") == 733333L)
    // prefix capped at 4: aaaaax/aaaaay jaro 8/9, jw = 8/9 + 0.4/9
    assert(jw("aaaaax", "aaaaay") == 933333L)
    // boost applies AT jaro = 0.7 exactly (DuckDB semantics)
    assert(jw("dcceca", "ddccd") == 730000L)
  }

  test("graft_jw_micro: registered expression codegens and matches the static path") {
    GraftFunctions.register(spark)
    val df = Seq(("martha", "marhta"), ("crate", "trace"), ("abc", ""),
      ("jellyfish", "smellyfish")).toDF("a", "b")
    val got = df.select(call_function("graft_jw_micro", col("a"), col("b")).as("m"))
      .collect().map(_.getAs[Long]("m")).toSeq
    assert(got == Seq(961111L, 733333L, 0L, 896296L))
    // null propagates
    val n = Seq((Some("x"), Option.empty[String])).toDF("a", "b")
      .select(call_function("graft_jw_micro", col("a"), col("b")).as("m")).collect()(0)
    assert(n.isNullAt(0))
  }

  test("timeWeightedMean: hand-computed hold weighting; burst guard; single-event keys dropped") {
    // u: v=10 holds 5us, v=20 holds 15us -> twm = (50+300)/20 = 17.5
    val ev = Seq(
      (1L, 10L, 0L, 1L), (1L, 20L, 5L, 2L), (1L, 99L, 20L, 3L),
      (2L, 7L, 0L, 4L),                     // single event: no hold
      (3L, 5L, 0L, 5L), (3L, 9L, 0L, 6L)    // same-ts burst: held_us = 0
    ).toDF("u", "v", "t", "id")
    val out = Sequences.timeWeightedMean(ev, "u", "t", "v", "id")
      .collect().map(r => r.getAs[Long]("u") -> r).toMap
    assert(out(1L).getAs[Long]("n_holds") == 2L)
    assert(out(1L).getAs[Long]("held_us") == 20L)
    assert(out(1L).getAs[Long]("twm_micro") == 17500000L)
    assert(!out.contains(2L))
    assert(out(3L).isNullAt(3)) // zero total hold -> null mean
  }

  test("ingestTransitions: fold(hist, batch) equals one-shot over everything") {
    val all = Seq(
      (1L, "a", 10L, 1L), (1L, "b", 20L, 2L), (1L, "a", 30L, 3L), (1L, "c", 40L, 4L),
      (2L, "b", 5L, 5L), (2L, "b", 35L, 6L),
      (3L, "c", 50L, 7L)                    // only appears in the batch
    ).toDF("u", "st", "t", "id")
    val hist = all.filter(col("t") < 25)
    val batch = all.filter(col("t") >= 25)
    val (c0, l0) = Sequences.transitionState(hist, "u", "st", "t", "id")
    // history alone: only 1:a->b
    assert(c0.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      == Set(("a", "b", 1L)))
    val (c1, l1) = Sequences.ingestTransitions(c0, l0, batch, "u", "st", "t", "id")
    val oneShot = Sequences.transitionCounts(all, "u", "st", "t", "id")
      .select(col("from_state"), col("to_state"), col("n_trans"))
    val a = c1.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val b = oneShot.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(a == b)
    // boundary pairs were stitched: 1:b->a counted (20 -> 30 crosses the split)
    assert(a.contains(("b", "a", 1L)))
    // lasts advanced to the batch frontier
    val lasts = l1.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(lasts == Map(1L -> "c", 2L -> "b", 3L -> "c"))
    // a second, empty-delta fold is a no-op on counts
    val (c2, _) = Sequences.ingestTransitions(c1, l1, all.filter(col("t") > 999),
      "u", "st", "t", "id")
    assert(c2.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet == a)
  }

  test("ewmaHalfLife: exact dyadic weights, lookback truncation, null/short keys") {
    // key 1: values 1, 2, 4 (oldest->newest). m=3 weights newest-first are
    // 4/7, 2/7, 1/7 -> ewma = (4*4 + 2*2 + 1*1)/7 = 3 exactly
    val ev = Seq((1L, 10L, 1L, 1.0), (1L, 20L, 2L, 2.0), (1L, 30L, 3L, 4.0),
      (2L, 10L, 4L, 5.0), // single event: ewma = the value itself
      (3L, 10L, 5L, Double.NaN)).toDF("u", "t", "id", "v")
      .filter(!isnan(col("v")))
    val got = Sequences.ewmaHalfLife(ev, "u", "t", "v", "id", lookback = 16)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L) == (3L, 3000000L))
    assert(got(2L) == (1L, 5000000L))
    assert(!got.contains(3L))
    // lookback=2 drops the oldest: weights 2/3, 1/3 -> (4*2+2)/3 = 10/3
    val trunc = Sequences.ewmaHalfLife(ev, "u", "t", "v", "id", lookback = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(trunc(1L) == 3333333L)
    // partition invariance: exact integers shuffle-order independent
    val rep = Sequences.ewmaHalfLife(ev.repartition(7), "u", "t", "v", "id", 16)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(rep == got.map { case (k, v) => k -> v._2 })
  }

  test("periodGrowth: hand MoM/YoY values, zero-base and missing-lag nulls, grouped") {
    // periods 1..3 sum to 100, 110, 99
    val df = Seq((1L, 60L), (1L, 40L), (2L, 110L), (3L, 99L)).toDF("p", "v")
    val got = Sequences.periodGrowth(df, "p", "v", lagShort = 1, lagLong = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(got(1L) == (100L, None, None))
    assert(got(2L) == (110L, Some(100000L), None))        // +10%
    assert(got(3L) == (99L, Some(-100000L), Some(-10000L))) // -10%, -1%
    // a zero-sum base period yields null growth, not a division error
    val z = Seq((1L, 0L), (2L, 5L)).toDF("p", "v")
    val gz = Sequences.periodGrowth(z, "p", "v", lagShort = 1, lagLong = 2)
      .collect()
      .map(r => r.getLong(0) -> r.isNullAt(2)).toMap
    assert(gz(2L)) // base 0 -> null
    // grouped: series are independent per group
    val g = Seq(("a", 1L, 10L), ("a", 2L, 20L), ("b", 1L, 8L), ("b", 2L, 4L))
      .toDF("g", "p", "v")
    val gg = Sequences.periodGrowth(g, "p", "v", Seq("g"), 1, 2)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(gg(("a", 2L)) == Some(1000000L) && gg(("b", 2L)) == Some(-500000L))
  }

  test("periodGrowthDense: calendar gap filled as measured zero; disagrees with positional lag") {
    import java.sql.Date
    // Jan 100, Feb 200, APR 300 — March is a calendar gap
    val df = Seq(
      (Date.valueOf("1995-01-01"), 100L),
      (Date.valueOf("1995-02-01"), 200L),
      (Date.valueOf("1995-04-01"), 300L)).toDF("month", "v")
    def snap(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => r.getDate(0).toString -> (r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    val dense = snap(Sequences.periodGrowthDense(df, "month", "v",
      lagShort = 1, lagLong = 2).collect())
    // the gap month exists as an explicit zero with -100% growth…
    assert(dense("1995-03-01") == (0L, Some(-1000000L)))
    // …and April's lag-1 base is that zero — null growth, NOT +50% vs Feb
    assert(dense("1995-04-01") == (300L, None))
    assert(dense.size == 4)
    val positional = snap(Sequences.periodGrowth(df, "month", "v",
      lagShort = 1, lagLong = 2).collect())
    assert(positional("1995-04-01") == (300L, Some(500000L))) // the quiet lie
    // lag-2 over the dense spine is calendar-exact: Apr vs Feb = +50%
    val d2 = Sequences.periodGrowthDense(df, "month", "v", Nil, 1, 2)
      .collect().map(r => r.getDate(0).toString ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(d2("1995-04-01") == Some(500000L))
    // grouped: spines are computed per group, not globally
    val g = Seq(("a", Date.valueOf("1995-01-01"), 10L),
      ("a", Date.valueOf("1995-03-01"), 20L),
      ("b", Date.valueOf("1995-06-01"), 8L)).toDF("g", "month", "v")
    val gd = Sequences.periodGrowthDense(g, "month", "v", Seq("g"), 1, 2)
      .collect().map(r => (r.getString(0), r.getDate(1).toString)).toSet
    assert(gd == Set(("a", "1995-01-01"), ("a", "1995-02-01"),
      ("a", "1995-03-01"), ("b", "1995-06-01"))) // b has no Jan–May spine
    // a null partCols key is DROPPED, not silently zeroed (the non-null-
    // safe spine join would otherwise report the group's months as 0)
    val gn = Seq((Some("a"), Date.valueOf("1995-01-01"), 10L),
      (None, Date.valueOf("1995-01-01"), 99L)).toDF("g", "month", "v")
    val gnd = Sequences.periodGrowthDense(gn, "month", "v", Seq("g"), 1, 2)
      .collect()
    assert(gnd.length == 1 && gnd.head.getString(0) == "a"
      && gnd.head.getLong(2) == 10L)
  }

  test("prefixState/ingestPrefix: first-k store fold ≡ full recompute; topPaths readout matches") {
    val ev = Seq(
      (1L, 10L, 1L, "a"), (1L, 20L, 2L, "b"), (1L, 30L, 3L, "c"),
      (1L, 40L, 4L, "d"), (2L, 15L, 5L, "a"), (2L, 35L, 6L, "z"),
      (3L, 50L, 7L, "q")).toDF("u", "t", "id", "s")
    val hist = ev.filter(col("t") < 30)
    val batch = ev.filter(col("t") >= 30)
    val folded = Sequences.ingestPrefix(
      Sequences.prefixState(hist, "u", "s", "t", "id", maxLen = 3),
      batch, "u", "s", "t", "id", maxLen = 3)
    val full = Sequences.prefixState(ev, "u", "s", "t", "id", maxLen = 3)
    def set(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(set(folded) == set(full))
    // key 1 capped at its FIRST 3 states: d never enters
    assert(!set(folded).exists { case (u, s, _, _) => u == 1L && s == "d" })
    val gotPaths = Sequences.topPaths(folded, "u", "s", "t", "id", 3, 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val fullPaths = Sequences.topPaths(ev, "u", "s", "t", "id", 3, 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(gotPaths == fullPaths)
    assert(gotPaths == Set(("a>b>c", 1L), ("a>z", 1L), ("q", 1L)))
  }

  test("rollingMedian2: hand-traced trailing medians, window cap, spike robustness") {
    val ev = Seq((1L, 10L, 1L, 1.0), (1L, 20L, 2L, 3.0), (1L, 30L, 3L, 2.0),
      (1L, 40L, 4L, 5.0)).toDF("u", "t", "id", "v")
    val got = Sequences.rollingMedian2(ev, "u", "t", "v", "id", window = 3)
      .collect().map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3))).toMap
    // windows: [1] [1,3] [1,2,3] [2,3,5] -> med2 (in micro): 2, 4, 4, 6
    assert(got == Map(1L -> (1L, 2000000L), 2L -> (2L, 4000000L),
      3L -> (3L, 4000000L), 4L -> (3L, 6000000L)))
    // a huge spike moves the trailing median only one rank, not the level
    val sp = Seq((1L, 10L, 1L, 2.0), (1L, 20L, 2L, 2.0), (1L, 30L, 3L, 999.0))
      .toDF("u", "t", "id", "v")
    val m = Sequences.rollingMedian2(sp, "u", "t", "v", "id", 3)
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(m(3L) == 4000000L) // median of (2, 2, 999) stays 2
  }

  test("topPaths: ordered prefixes, maxLen cap, count + tie-break") {
    val ev = Seq(
      (1L, 10L, 1L, "a"), (1L, 20L, 2L, "b"), (1L, 30L, 3L, "c"),
      (2L, 10L, 4L, "a"), (2L, 20L, 5L, "b"), (2L, 30L, 6L, "c"),
      (3L, 10L, 7L, "a"), (3L, 20L, 8L, "z"),
      // same ts ties break by id: 9 before 10 -> "b>a"
      (4L, 10L, 9L, "b"), (4L, 10L, 10L, "a")).toDF("u", "t", "id", "s")
    val got = Sequences.topPaths(ev, "u", "s", "t", "id", maxLen = 5, topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.head == ("a>b>c", 2L))
    assert(got.toSet == Set(("a>b>c", 2L), ("a>z", 1L), ("b>a", 1L)))
    // ordering after the head: count desc then path asc
    assert(got.toSeq == Seq(("a>b>c", 2L), ("a>z", 1L), ("b>a", 1L)))
    // maxLen=2 truncates user 1/2 to "a>b"
    val cap = Sequences.topPaths(ev, "u", "s", "t", "id", maxLen = 2, topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(cap == Set(("a>b", 2L), ("a>z", 1L), ("b>a", 1L)))
  }

  test("funnelWithin: deadlines, strict-after, closed boundary, greedy-earliest") {
    // within = 100µs. A converts fully (p exactly at the boundary from c);
    // B's click misses the deadline; C never signs up; D's same-ts click
    // fails strict-after but its boundary click converts, purchase then
    // misses by 1; E shows the GREEDY contract: the earliest signup (t=0)
    // misses c@120, even though the second signup (t=50) would have made it
    val ev = Seq(
      ("A", "s", 0L), ("A", "c", 50L), ("A", "p", 150L),
      ("B", "s", 0L), ("B", "c", 101L),
      ("C", "c", 10L),
      ("D", "s", 0L), ("D", "c", 0L), ("D", "c", 100L), ("D", "p", 201L),
      ("E", "s", 0L), ("E", "s", 50L), ("E", "c", 120L)
    ).toDF("k", "st", "t")
    val got = Sequences.funnelWithin(ev, "k", "st", "t",
        Seq("s", "c", "p"), withinUs = 100L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    // delays: step 2 = mean(50 for A, 100 for D) = 75; step 3 = A's 100
    assert(got.toSeq == Seq((1L, "s", 4L, None), (2L, "c", 2L, Some(75L)),
      (3L, "p", 1L, Some(100L))))
    // partition invariance
    val rep = Sequences.funnelWithin(ev.repartition(7), "k", "st", "t",
        Seq("s", "c", "p"), 100L)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(rep.toSeq == Seq((1L, 4L), (2L, 2L), (3L, 1L)))
    // a step nobody reaches still emits its zero row (fixed step list)
    val none = Sequences.funnelWithin(ev, "k", "st", "t",
        Seq("s", "c", "zz"), 100L).collect()
    assert(none.map(_.getLong(2)).toSeq == Seq(4L, 2L, 0L))
    intercept[IllegalArgumentException] {
      Sequences.funnelWithin(ev, "k", "st", "t", Seq("s", "s"), 100L)
    }
  }

  test("retentionCohorts: hand-traced matrix, offset cap, multi-event weeks collapse") {
    // period = 10µs "weeks". u1 first in period 0, active 0/1/3 (two
    // events in period 1 collapse); u2 first in period 0, active 0 only;
    // u3 first in period 1, active 1/2; null user dropped
    val ev = Seq[(Option[Long], Long)](
      (Some(1L), 0L), (Some(1L), 12L), (Some(1L), 15L), (Some(1L), 31L),
      (Some(2L), 5L),
      (Some(3L), 10L), (Some(3L), 29L),
      (None, 3L)).toDF("u", "t")
    val got = Sequences.retentionCohorts(ev, "u", "t", periodUs = 10L)
      .orderBy("cohort", "offset").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (0L, 0L, 2L, 2L, 1000000L),  // cohort 0 = u1, u2
      (0L, 1L, 1L, 2L, 500000L),   // u1 back in period 1
      (0L, 3L, 1L, 2L, 500000L),   // u1 back in period 3
      (1L, 0L, 1L, 1L, 1000000L),  // cohort 1 = u3
      (1L, 1L, 1L, 1L, 1000000L))) // u3 back in period 2
    // the offset cap drops far returns but keeps the cohort row
    val capped = Sequences.retentionCohorts(ev, "u", "t", 10L, maxOffset = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((0L, 0L), (0L, 1L), (1L, 0L), (1L, 1L)))
    // partition invariance
    val rep = Sequences.retentionCohorts(ev.repartition(7), "u", "t", 10L)
      .orderBy("cohort", "offset").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rep == got.map(x => (x._1, x._2, x._3)).toSeq)
    intercept[IllegalArgumentException] {
      Sequences.retentionCohorts(ev, "u", "t", 0L)
    }
  }

  test("retentionCohortsCalendar: month-exact offsets across year/length boundaries") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    // u1: cohort 2023-12, back Jan 31 (offset 1 — a 31-day month away is
    // still ONE calendar month) and Feb 1 (offset 2 — one day later, new
    // month: exactly where a fixed 30-day bucket drifts); two December
    // events collapse. u2: cohort 2024-02 (leap February), back 2024-03
    // (offset 1 despite 29 days). null user/ts dropped.
    val ev = Seq[(Option[Long], Option[Timestamp])](
      (Some(1L), Some(ts("2023-12-05 10:00:00"))),
      (Some(1L), Some(ts("2023-12-20 10:00:00"))),
      (Some(1L), Some(ts("2024-01-31 23:59:59"))),
      (Some(1L), Some(ts("2024-02-01 00:00:01"))),
      (Some(2L), Some(ts("2024-02-10 00:00:00"))),
      (Some(2L), Some(ts("2024-03-10 00:00:00"))),
      (None, Some(ts("2024-01-01 00:00:00"))),
      (Some(3L), None)).toDF("u", "t")
    val got = Sequences.retentionCohortsCalendar(ev, "u", "t")
      .orderBy("cohort_month", "offset").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      ("2023-12-01", 0L, 1L, 1L, 1000000L),
      ("2023-12-01", 1L, 1L, 1L, 1000000L),
      ("2023-12-01", 2L, 1L, 1L, 1000000L),
      ("2024-02-01", 0L, 1L, 1L, 1000000L),
      ("2024-02-01", 1L, 1L, 1L, 1000000L)))
    // the offset cap holds on the month axis too
    val capped = Sequences.retentionCohortsCalendar(ev, "u", "t", maxOffset = 1)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1))).toSet
    assert(capped == Set(("2023-12-01", 0L), ("2023-12-01", 1L),
      ("2024-02-01", 0L), ("2024-02-01", 1L)))
    // partition invariance (integer month index, exact counts)
    val rep = Sequences.retentionCohortsCalendar(ev.repartition(5), "u", "t")
      .orderBy("cohort_month", "offset").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2))).toSeq
    assert(rep == got.map(x => (x._1, x._2, x._3)).toSeq)
  }

  test("periodState/ingestPeriods: fold ≡ full recompute; re-fold idempotent") {
    // period = 10µs; the split at t=20 leaves u1 active in period 1 on
    // BOTH sides (t=12 hist, t=25… no — t=15 hist, t=19 hist, period 2
    // via t=25 batch) and u2's period 2 is touched by hist (t=29) and
    // batch (t=21) — the union+distinct must collapse them
    val ev = Seq[(Option[Long], Long)](
      (Some(1L), 0L), (Some(1L), 12L), (Some(1L), 15L), (Some(1L), 31L),
      (Some(2L), 5L), (Some(2L), 19L), (Some(2L), 21L), (Some(2L), 29L),
      (Some(3L), 25L), (None, 3L)).toDF("u", "t")
    val full = Sequences.retentionCohorts(ev, "u", "t", periodUs = 10L)
      .orderBy("cohort", "offset").collect().map(_.toSeq).toSeq
    val hist = ev.filter(col("t") < 20L)
    val batch = ev.filter(col("t") >= 20L)
    val st0 = Sequences.periodState(hist, "u", "t", 10L)
    val st1 = Sequences.ingestPeriods(st0, batch, "u", "t", 10L)
    val folded = Sequences.retentionFromState(st1, maxOffset = 52)
      .orderBy("cohort", "offset").collect().map(_.toSeq).toSeq
    assert(folded == full)
    // re-folding the same batch is a no-op (order-free set union)
    val st2 = Sequences.ingestPeriods(st1, batch, "u", "t", 10L)
    assert(st2.count() == st1.count())
    val refolded = Sequences.retentionFromState(st2, maxOffset = 52)
      .orderBy("cohort", "offset").collect().map(_.toSeq).toSeq
    assert(refolded == full)
  }

  test("sessionTopPaths: closed gap boundary, per-session prefixes, tie order") {
    // user 1: events at t=0,100 (gap 100 = EXACTLY the gap -> same
    // session), then t=201 (gap 101 > gap -> NEW session) — the closed
    // boundary: sessions are "a>b" and "c"
    val ev = Seq(
      (1L, 0L, 1L, "a"), (1L, 100L, 2L, "b"), (1L, 201L, 3L, "c"),
      // user 2: one session "a>b" (gaps 50, 50)
      (2L, 0L, 4L, "a"), (2L, 50L, 5L, "b"),
      // user 3: same-ts tie breaks by id within the session: "b>a"
      (3L, 0L, 6L, "b"), (3L, 0L, 7L, "a")).toDF("u", "t", "id", "s")
    val got = Sequences.sessionTopPaths(ev, "u", "s", "t", "id",
        gapUs = 100L, maxLen = 5, topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("a>b", 2L), ("b>a", 1L), ("c", 1L)))
    // lifetime topPaths would see user 1 as ONE path "a>b>c" — the two
    // operators answer different questions
    val life = Sequences.topPaths(ev, "u", "s", "t", "id", 5, 10)
      .collect().map(r => r.getString(0)).toSet
    assert(life.contains("a>b>c") && !life.contains("c"))
    // maxLen truncates within the session, not the lifetime
    val capd = Sequences.sessionTopPaths(ev, "u", "s", "t", "id",
        gapUs = 100L, maxLen = 1, topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(capd == Set(("a", 2L), ("b", 1L), ("c", 1L)))
    // partition invariance
    val rep = Sequences.sessionTopPaths(ev.repartition(5), "u", "s", "t",
        "id", gapUs = 100L, maxLen = 5, topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rep.toSeq == got.toSeq)
  }
}
