package graft.operators

import org.apache.spark.sql.functions.{col, lit}
import graft.SparkTestBase

class ProfileSpec extends SparkTestBase {
  import spark.implicits._

  test("profile: exact stats per column, distinct estimate within bound") {
    val df = Seq(
      (1L, Option("a")), (2L, None), (3L, Option("b")), (3L, Option("a"))
    ).toDF("id", "s")
    val p = Profile.profile(df).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.getString(4)), Option(r.getString(5))))).toMap
    val (nr, nn, nd, mn, mx) = p("id")
    assert(nr == 4L && nn == 0L && mn.contains("1") && mx.contains("3"))
    assert(math.abs(nd - 3L) <= 1L) // HLL++ ~5% contract, tiny-n effectively exact
    val (nr2, nn2, nd2, mn2, mx2) = p("s")
    assert(nr2 == 4L && nn2 == 1L && mn2.contains("a") && mx2.contains("b"))
    assert(math.abs(nd2 - 2L) <= 1L)
  }

  test("profile: all-null column yields null min/max, full null count") {
    val df = Seq((1L, Option.empty[String]), (2L, Option.empty[String])).toDF("id", "s")
    val row = Profile.profile(df).filter($"col_name" === "s").head()
    assert(row.getLong(2) == 2L && row.isNullAt(4) && row.isNullAt(5))
  }

  test("histogram: known bins, inclusive hi edge, out-of-range/null sentinels, no lost rows") {
    val df = Seq(Some(0.0), Some(1.0), Some(2.5), Some(5.0), Some(9.9), Some(10.0),
      Some(-1.0), Some(11.0), None).toDF("x")
    val h = Profile.histogram(df, "x", 0.0, 10.0, 4).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    // width 2.5: bins [0,2.5) {0,1}, [2.5,5) {2.5}, [5,7.5) {5}, [7.5,10] {9.9, 10.0}
    assert(h == Map(0L -> 2L, 1L -> 1L, 2L -> 1L, 3L -> 2L, -1L -> 1L, -2L -> 1L, -3L -> 1L))
    assert(h.values.sum == 9L) // every input row is accounted for
    val bounds = Profile.histogram(df, "x", 0.0, 10.0, 4)
      .filter($"bin" === 1L).head()
    assert(bounds.getDouble(1) == 2.5 && bounds.getDouble(2) == 5.0)
    assert(Profile.histogram(df, "x", 0.0, 10.0, 4)
      .filter($"bin" < 0).collect().forall(r => r.isNullAt(1) && r.isNullAt(2)))
    intercept[IllegalArgumentException](Profile.histogram(df, "x", 5.0, 5.0, 4))
  }

  test("equalFrequencyBins: rank-percentile bins, ties share a bin, nulls keep null") {
    val df = Seq(Some(1L), Some(1L), Some(1L), Some(1L), Some(2L), Some(2L),
      Some(3L), Some(3L), None).toDF("x")
    // N=8 non-null; below(1)=0 → bin 0; below(2)=4 → 4·2/8 = 1; below(3)=6 → 1
    val bins = Profile.equalFrequencyBins(df, "x", 2).collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0))) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1))))
    assert(bins.toSet == Set(Some(1L) -> Some(0L), Some(2L) -> Some(1L),
      Some(3L) -> Some(1L), None -> None))
    // finer grain: below(2)=4 → 4·4/8 = 2, below(3)=6 → 3 — every value its
    // own bin once nBins resolves the tie mass
    val b4 = Profile.equalFrequencyBins(df, "x", 4)
      .filter($"x".isNotNull).collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(b4 == Set(1L -> 0L, 2L -> 2L, 3L -> 3L))
    intercept[IllegalArgumentException](Profile.equalFrequencyBins(df, "x", 0))
    intercept[IllegalArgumentException](
      Profile.equalFrequencyBins(df.withColumn("bin", lit(1)), "x", 2))
  }

  test("equalFrequencyBins: bin assignment is partition-independent") {
    val df = (0L until 1000L).map(i => i % 97).toDF("x")
    val a = Profile.equalFrequencyBins(df, "x", 10).groupBy("bin").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Profile.equalFrequencyBins(df.repartition(13), "x", 10).groupBy("bin").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
    assert(a.keySet == (0L until 10L).toSet) // 97 distinct values spread all 10 bins
  }

  test("equalFrequencyBins: continuous doubles (range-bucket path) and strings (prefix path) match brute-force ranks") {
    // continuous: distinct ≈ rows — exactly the shape the r9 single-
    // partition window serialized on; the two-level port must agree with
    // the definition bin = below·nBins div N
    val xs = (1 to 400).map(i => math.sin(i.toDouble) * 100.0)
    val df = xs.toDF("x")
    val got = Profile.equalFrequencyBins(df, "x", 8)
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    val sorted = xs.sorted
    for (x <- xs) {
      val below = sorted.count(_ < x)
      assert(got(x) == below * 8 / 400, s"x=$x")
    }
    // strings, including values sharing the 4-char prefix bucket
    val ss = Seq("alpha", "alphabet", "alps", "beta", "beta", "gamma", "gam")
    val sdf = ss.toDF("s")
    val sg = Profile.equalFrequencyBins(sdf, "s", 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sSorted = ss.sorted
    for (s <- ss.distinct)
      assert(sg(s) == sSorted.count(_ < s) * 3 / ss.size, s"s=$s")
  }

  test("keySkew: heavy-tail key distribution matches the brute-force rank formula") {
    // Zipf-ish counts with many tie runs — exercises the distinct-count-
    // value collapse c·(m·below + m(m+1)/2) against literal per-key ranks
    val keys = (0 until 300).flatMap(i => Seq.fill(300 / (i + 1))(s"k$i"))
    val df = keys.toDF("k")
    val r = Profile.keySkew(df, "k", topN = 5).collect()(0)
    val counts = keys.groupBy(identity).map(_._2.size.toLong).toSeq.sorted
    val n = counts.sum; val m = counts.size.toLong
    val sic = counts.zipWithIndex.map { case (c, i) => (i + 1) * c }.sum
    assert(r.getAs[Long]("n_rows") == n && r.getAs[Long]("n_keys") == m)
    assert(r.getAs[Long]("gini_ppm") == (2 * sic - (m + 1) * n) * 1000000L / (m * n))
    assert(r.getAs[Long]("top_n_rows") == counts.takeRight(5).sum)
  }

  test("profile plans ONE aggregation pass: single exchange, no Expand, no per-column jobs") {
    val df = (0 until 100).map(i => (i.toLong, s"v$i", i % 7)).toDF("a", "b", "c")
    val plan = Profile.profile(df).queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), plan)
    assert("Exchange".r.findAllIn(plan).size == 1, plan) // one SinglePartition gather
  }

  test("keySkew: hand-computed Gini and top-share; null keys count; uniform keys give 0") {
    // counts: a->6, b->2, c->1, null->1  =>  sorted asc (1,1,2,6)
    // gini num = sum((2i-5)c_i) = -3-1+2+18 = 16; den = 4*10 => G = 0.4
    val df = (Seq.fill(6)(Some("a")) ++ Seq.fill(2)(Some("b")) ++
      Seq(Some("c"), Option.empty[String])).toDF("k")
    val r = Profile.keySkew(df, "k", topN = 2).collect()(0)
    assert(r.getAs[Long]("n_rows") == 10L && r.getAs[Long]("n_keys") == 4L)
    assert(r.getAs[Long]("max_count") == 6L)
    assert(r.getAs[Long]("top_n_rows") == 8L)       // a(6) + b(2)
    assert(r.getAs[Long]("top_share_ppm") == 800000L)
    assert(r.getAs[Long]("gini_ppm") == 400000L)
    // perfectly even distribution: Gini exactly 0
    val even = (0 until 12).map(i => s"k${i % 4}").toDF("k")
    val e = Profile.keySkew(even, "k", topN = 2).collect()(0)
    assert(e.getAs[Long]("gini_ppm") == 0L)
    assert(e.getAs[Long]("top_n_rows") == 6L)
    // partitioning-independent (rank-window tie blocks cancel exactly)
    val p = Profile.keySkew(df.repartition(7), "k", topN = 2).collect()(0)
    assert(p.getAs[Long]("gini_ppm") == 400000L && p.getAs[Long]("top_share_ppm") == 800000L)
  }

  test("expect: every rule kind audits correctly; row-local rules share one pass") {
    val df = Seq(
      (Some(1L), Some(10.0), "aa"),
      (Some(1L), Some(200.0), "ab"),  // out of range; dup key with row 1
      (Some(2L), None, "zz"),         // null value passes in_range, fails regex
      (None, Some(5.0), "aa")         // null key: not_null + fk-skip
    ).toDF("k", "v", "s")
    val ref = Seq(1L).toDF("rk")      // key 2 is dangling
    val out = Profile.expect(df, Seq(
        Profile.NotNull("k"),
        Profile.InRange("v", 0, 100),
        Profile.MatchesRegex("s", "a+b?"),
        Profile.Satisfies("v_positive", col("v") > 0),
        Profile.Unique(Seq("k")),
        Profile.ForeignKey(Seq("k"), "ref", ref, Seq("rk"))))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("not_null(k)") == (4L, 1L))
    assert(out("in_range(v,0.0,100.0)") == (4L, 1L))
    assert(out("matches(s)") == (4L, 1L))              // "zz" fails, null s absent
    assert(out("satisfies(v_positive)") == (4L, 1L))   // null v violates (fail-closed)
    assert(out("unique(k)") == (4L, 2L))               // the two k=1 rows
    assert(out("fk(k->ref)") == (3L, 1L))              // null-key row skipped; k=2 dangles
    // all four row-local rules ride ONE aggregation pass over the data —
    // a single agg-gather exchange; the report sort reuses its partition
    val plan = Profile.expect(df, Seq(Profile.NotNull("k"), Profile.InRange("v", 0, 100),
        Profile.MatchesRegex("s", "a+b?"), Profile.Satisfies("p", col("v") > 0)))
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size == 1, plan)
  }
}
