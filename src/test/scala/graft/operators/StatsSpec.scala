package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Exact-sum hypothesis tests: Welch's t and chi-squared independence. */
class StatsSpec extends SparkTestBase {
  import spark.implicits._

  test("welchT: hand-computed t; degenerate sides null; other levels and nulls ignored") {
    val df = Seq(
      ("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(3.0)),
      ("b", Some(5.0)), ("b", Some(5.0)), ("b", Some(5.0)), ("b", Some(5.0)),
      ("c", Some(99.0)),          // other level: ignored
      ("a", None)                 // null value: ignored
    ).toDF("g", "v")
    val r = Stats.welchT(df, "g", "v", "a", "b").collect()(0)
    assert(r.getAs[Long]("n_a") == 3L && r.getAs[Long]("n_b") == 4L)
    assert(r.getAs[Double]("mean_a") == 2.0 && r.getAs[Double]("mean_b") == 5.0)
    // va = 1, vb = 0 -> t = (2-5)/sqrt(1/3)
    val expected = math.round((2.0 - 5.0) / math.sqrt(1.0 / 3.0) * 1e6)
    assert(r.getAs[Long]("t_micro") == expected)
    // both sides constant: se = 0 -> no test
    val const = Seq(("a", 4.0), ("a", 4.0), ("b", 4.0), ("b", 4.0)).toDF("g", "v")
    assert(Stats.welchT(const, "g", "v", "a", "b").collect()(0).isNullAt(4))
    // single-row side: variance undefined -> null
    val single = Seq(("a", 1.0), ("b", 2.0), ("b", 3.0)).toDF("g", "v")
    assert(Stats.welchT(single, "g", "v", "a", "b").collect()(0).isNullAt(4))
    // partitioning-independent (exact conditional sums)
    val p = Stats.welchT(df.repartition(7), "g", "v", "a", "b").collect()(0)
    assert(p.getAs[Long]("t_micro") == expected)
  }

  test("chiSquared: independence gives 0; perfect association gives n; zero cells counted") {
    // independent 2x2 uniform: every cell e = o
    val indep = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")).toDF("u", "w")
    val r0 = Stats.chiSquared(indep, "u", "w").collect()(0)
    assert(r0.getAs[Long]("n_pairs") == 4L && r0.getAs[Long]("dof") == 1L)
    assert(r0.getAs[Long]("chi2_micro") == 0L)
    // perfect 2x2 association: chi2 = n, with the two STRUCTURAL-ZERO
    // off-diagonal cells contributing half of it
    val dep = (Seq.fill(10)(("a", "a")) ++ Seq.fill(10)(("b", "b")) ++
      Seq((null, "a"), ("a", null))).toDF("u", "w")
    val r1 = Stats.chiSquared(dep, "u", "w").collect()(0)
    assert(r1.getAs[Long]("n_pairs") == 20L) // null-sided rows dropped
    assert(r1.getAs[Long]("dof") == 1L)
    assert(r1.getAs[Long]("chi2_micro") == 20L * 1000000L)
    // partitioning-independent (pre-rounded terms, exact long sum)
    val r2 = Stats.chiSquared(dep.repartition(5), "u", "w").collect()(0)
    assert(r2.getAs[Long]("chi2_micro") == r1.getAs[Long]("chi2_micro"))
  }

  test("rocAuc: perfect separation 1.0, reversed 0.0, ties average; bucketWidth-invariant") {
    // positives score strictly above negatives -> AUC = 1
    val perfect = Seq((10L, true), (9L, true), (2L, false), (1L, false)).toDF("s", "y")
    val rp = Stats.rocAuc(perfect, "s", "y", 1L).collect()(0)
    assert(rp.getAs[Long]("n_pos") == 2L && rp.getAs[Long]("n_neg") == 2L)
    assert(rp.getAs[Long]("auc_num2") == 8L && rp.getAs[Long]("auc_micro") == 1000000L)
    val rr = Stats.rocAuc(perfect.withColumn("y", !col("y")), "s", "y", 1L).collect()(0)
    assert(rr.getAs[Long]("auc_micro") == 0L)
    // all scores tied -> AUC exactly 1/2 (the tie-correction half-credit)
    val tied = Seq((5L, true), (5L, true), (5L, false)).toDF("s", "y")
    assert(Stats.rocAuc(tied, "s", "y", 1L).collect()(0).getAs[Long]("auc_micro") == 500000L)
    // the two-level prefix sum is a pure execution choice: any bucketWidth
    // (and any partitioning) yields identical exact statistics
    val mixed = Seq((3L, true), (7L, false), (7L, true), (1L, false), (9L, true),
      (2L, false), (2L, true), (8L, false)).toDF("s", "y").repartition(5)
    val a = Stats.rocAuc(mixed, "s", "y", 1L).collect()(0)
    val b = Stats.rocAuc(mixed, "s", "y", 3L).collect()(0)
    val c = Stats.rocAuc(mixed, "s", "y", 1000000L).collect()(0)
    assert(a.getAs[Long]("auc_num2") == b.getAs[Long]("auc_num2"))
    assert(a.getAs[Long]("auc_num2") == c.getAs[Long]("auc_num2"))
    // one-class input -> null AUC
    val oneClass = Seq((1L, true), (2L, true)).toDF("s", "y")
    assert(Stats.rocAuc(oneClass, "s", "y", 1L).collect()(0).isNullAt(3))
  }

  test("robustOutliers: hand medians/MADs; zero-MAD group flags nothing; integer flag") {
    // group a: 1,2,3,4,100 -> med=3 (med2=6), devs 2,1,0,1,97 -> MAD=1
    // (mad4=4); k=3.5: outlier iff 20*|2x-6| > 35*4 = 140 <=> |2x-6| > 7
    // -> only 100 (d2=194)
    val df = (Seq(("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L), ("a", 100L))
      ++ Seq.fill(4)(("b", 7L))).toDF("g", "v")
    val out = Stats.robustOutliers(df, "g", "v", k10 = 35)
      .collect().map(r => r.getAs[String]("g") ->
        ((r.getAs[Long]("med_x2"), r.getAs[Long]("mad_x4"), r.getAs[Long]("n_outliers")))).toMap
    assert(out("a") == ((6L, 4L, 1L)))
    // group b constant: MAD = 0 -> degenerate, flags nothing
    assert(out("b") == ((14L, 0L, 0L)))
    // even-count median halves survive exactly: 1,2 -> med2 = 3
    val even = Seq(("e", 1L), ("e", 2L)).toDF("g", "v")
    val e = Stats.robustOutliers(even, "g", "v").collect()(0)
    assert(e.getAs[Long]("med_x2") == 3L)
    // partition-independence
    val p = Stats.robustOutliers(df.repartition(7), "g", "v", k10 = 35)
      .collect().map(r => r.getAs[String]("g") -> r.getAs[Long]("n_outliers")).toMap
    assert(p == Map("a" -> 1L, "b" -> 0L))
  }

  test("woeIv: symmetric 2-level feature; pure levels null WoE and zero IV term") {
    // level u: 9 pos 3 neg; level w: 3 pos 9 neg; P = N = 12
    // WoE(u) = ln((9/12)/(3/12)) = ln 3; IV term = (9/12-3/12)*ln3
    val df = (Seq.fill(9)(("u", true)) ++ Seq.fill(3)(("u", false))
      ++ Seq.fill(3)(("w", true)) ++ Seq.fill(9)(("w", false))).toDF("f", "y")
    val out = Stats.woeIv(df, "f", "y").collect()
      .map(r => r.getAs[String]("f") ->
        ((r.getAs[Long]("pos"), r.getAs[Long]("neg"),
          r.getAs[Long]("woe_micro"), r.getAs[Long]("iv_term_micro")))).toMap
    val ln3m = math.round(math.log(3.0) * 1e6)
    val ivm = math.round(0.5 * math.log(3.0) * 1e6)
    assert(out("u") == ((9L, 3L, ln3m, ivm)))
    assert(out("w") == ((3L, 9L, -ln3m, ivm)))
    // a pure level: null WoE, IV term coalesced to 0
    val pure = (Seq.fill(2)(("p", true)) ++ Seq.fill(3)(("q", true))
      ++ Seq.fill(3)(("q", false))).toDF("f", "y")
    val pr = Stats.woeIv(pure, "f", "y").collect()
      .map(r => r.getAs[String]("f") -> r).toMap
    assert(pr("p").isNullAt(3) && pr("p").getAs[Long]("iv_term_micro") == 0L)
  }

  test("psi: identical distributions 0; shifted shares hand-value; one-sided levels flagged null") {
    val a = (Seq.fill(50)("x") ++ Seq.fill(50)("y")).toDF("f")
    val same = Stats.psi(a, a, "f").collect()
    assert(same.forall(r => r.getAs[Long]("psi_term_micro") == 0L && !r.getAs[Boolean]("one_sided")))
    // a: 50/50; b: 80/20 -> term(x) = (0.5-0.8)*ln(0.5/0.8)
    val b = (Seq.fill(80)("x") ++ Seq.fill(20)("y")).toDF("f")
    val out = Stats.psi(a, b, "f").collect().map(r => r.getAs[String]("f") -> r).toMap
    val tx = math.round((0.5 - 0.8) * math.log(0.5 / 0.8) * 1e6)
    val ty = math.round((0.5 - 0.2) * math.log(0.5 / 0.2) * 1e6)
    assert(out("x").getAs[Long]("psi_term_micro") == tx)
    assert(out("y").getAs[Long]("psi_term_micro") == ty)
    // a level only in b: flagged, null term, counts kept
    val c = (Seq.fill(90)("x") ++ Seq.fill(10)("z")).toDF("f")
    val oc = Stats.psi(a, c, "f").collect().map(r => r.getAs[String]("f") -> r).toMap
    assert(oc("z").getAs[Boolean]("one_sided") && oc("z").isNullAt(4))
    assert(oc("y").getAs[Boolean]("one_sided") && oc("y").getAs[Long]("n_a") == 50L)
  }

  test("benford: digits from decimal strings incl. exact powers of ten; non-positive dropped") {
    // 10, 100, 1000 must all land on digit 1 (the double-log trap)
    val v = Seq(10L, 100L, 1000L, 2L, 25L, 300L, 9L, -5L, 0L).toDF("v")
    val out = Stats.benford(v, "v").collect().map(r => r.getAs[Long]("digit") -> r).toMap
    assert(out(1L).getAs[Long]("n") == 3L)
    assert(out(2L).getAs[Long]("n") == 2L)
    assert(out(3L).getAs[Long]("n") == 1L && out(9L).getAs[Long]("n") == 1L)
    assert(!out.contains(0L) && !out.contains(5L)) // -5, 0 dropped; no zero digit
    // share of digit 1 = 3/7; benford(1) = log10(2)
    assert(out(1L).getAs[Long]("share_micro") == math.round(3.0 / 7.0 * 1e6))
    assert(out(1L).getAs[Long]("benford_micro") == math.round(math.log10(2.0) * 1e6))
  }

  test("cohenKappa: perfect 1, independence 0, degenerate single label null") {
    val perfect = Seq(("a", "a"), ("b", "b"), ("a", "a"), ("c", "c")).toDF("x", "y")
    assert(Stats.cohenKappa(perfect, "x", "y").collect()(0)
      .getAs[Long]("kappa_micro") == 1000000L)
    // statistical independence: every (x,y) cell equal -> kappa = 0
    val indep = Seq(("a", "a"), ("a", "b"), ("b", "a"), ("b", "b")).toDF("x", "y")
    val ri = Stats.cohenKappa(indep, "x", "y").collect()(0)
    assert(ri.getAs[Long]("n_rows") == 4L && ri.getAs[Long]("kappa_micro") == 0L)
    // both raters constant: pe = 1 -> undefined
    val const = Seq(("a", "a"), ("a", "a")).toDF("x", "y")
    assert(Stats.cohenKappa(const, "x", "y").collect()(0).isNullAt(2))
    // hand value: 2x2 with known marginals
    // n=10, agree=7, src = 6*5 + 4*5 = 50 -> kappa = (70-50)/(100-50) = 0.4
    val hand = (Seq.fill(4)(("p", "p")) ++ Seq.fill(3)(("q", "q"))
      ++ Seq.fill(2)(("p", "q")) ++ Seq.fill(1)(("q", "p"))).toDF("x", "y")
    assert(Stats.cohenKappa(hand, "x", "y").collect()(0)
      .getAs[Long]("kappa_micro") == 400000L)
  }

  test("ksTest: identical samples 0; disjoint samples 1; hand step value; width-invariant") {
    val a = Seq(1L, 2L, 3L, 4L).toDF("v")
    assert(Stats.ksTest(a, a, "v", 2L).collect()(0).getAs[Long]("ks_micro") == 0L)
    // fully separated: D = 1
    val hi = Seq(10L, 11L, 12L).toDF("v")
    val r = Stats.ksTest(a, hi, "v", 2L).collect()(0)
    assert(r.getAs[Long]("n_a") == 4L && r.getAs[Long]("n_b") == 3L)
    assert(r.getAs[Long]("ks_micro") == 1000000L)
    // hand case: a = {1,2}, b = {2,3}: at v=1 |F| = 1/2, at v=2 F_a=1,
    // F_b=1/2 -> D = 1/2
    val x = Seq(1L, 2L).toDF("v"); val y = Seq(2L, 3L).toDF("v")
    assert(Stats.ksTest(x, y, "v", 1L).collect()(0).getAs[Long]("ks_micro") == 500000L)
    // bucketWidth is an execution choice only
    val big = (1L to 100L).map(i => i % 17).toDF("v")
    val shift = (1L to 100L).map(i => (i % 23) + 3).toDF("v")
    val k1 = Stats.ksTest(big, shift, "v", 1L).collect()(0).getAs[Long]("ks_micro")
    val k2 = Stats.ksTest(big, shift, "v", 1000L).collect()(0).getAs[Long]("ks_micro")
    assert(k1 == k2)
    // empty side -> null
    assert(Stats.ksTest(a, a.filter(col("v") > 99), "v").collect()(0).isNullAt(2))
  }

  test("ksTestByGroup: one pass equals per-group ksTest calls; width-invariant") {
    val a = (Seq.fill(6)(("x", 1L)) ++ Seq.fill(4)(("x", 5L))
      ++ Seq.fill(5)(("y", 2L)) ++ Seq.fill(5)(("y", 8L))).toDF("g", "v")
    val b = (Seq.fill(3)(("x", 4L)) ++ Seq.fill(7)(("x", 6L))
      ++ Seq.fill(5)(("y", 2L)) ++ Seq.fill(5)(("y", 8L))).toDF("g", "v")
    val grouped = Stats.ksTestByGroup(a, b, "g", "v", 2L)
      .collect().map(r => r.getAs[String]("g") -> r.getAs[Long]("ks_micro")).toMap
    Seq("x", "y").foreach { g =>
      val single = Stats.ksTest(a.filter(col("g") === g), b.filter(col("g") === g),
        "v", 2L).collect()(0).getAs[Long]("ks_micro")
      assert(grouped(g) == single, s"group $g")
    }
    assert(grouped("y") == 0L) // identical distributions in group y
    val w2 = Stats.ksTestByGroup(a, b, "g", "v", 1000L)
      .collect().map(r => r.getAs[String]("g") -> r.getAs[Long]("ks_micro")).toMap
    assert(w2 == grouped)
  }

  test("spearman: monotone 1, reversed -1, ties averaged, constant margin null") {
    val mono = Seq((1L, 10L), (2L, 20L), (3L, 90L), (4L, 100L)).toDF("x", "y")
    assert(Stats.spearman(mono, "x", "y", 2L).collect()(0).getAs[Long]("rho_micro") == 1000000L)
    val rev = Seq((1L, 100L), (2L, 90L), (3L, 20L)).toDF("x", "y")
    assert(Stats.spearman(rev, "x", "y", 2L).collect()(0).getAs[Long]("rho_micro") == -1000000L)
    // hand tie case: x = (1,2,2,3), y = (1,2,3,4): classic rho with one tie
    // ranks x: 1, 2.5, 2.5, 4 ; y: 1,2,3,4 -> rho = 0.9486832980505138...
    val tie = Seq((1L, 1L), (2L, 2L), (2L, 3L), (3L, 4L)).toDF("x", "y")
    val rho = Stats.spearman(tie, "x", "y", 2L).collect()(0).getAs[Long]("rho_micro")
    assert(rho == 948683L, s"got $rho")
    // constant margin: undefined
    val const = Seq((5L, 1L), (5L, 2L)).toDF("x", "y")
    assert(Stats.spearman(const, "x", "y").collect()(0).isNullAt(1))
    // partitioning/width invariance
    val big = (1L to 200L).map(i => (i % 13, (i * 7) % 31)).toDF("x", "y")
    val s1 = Stats.spearman(big.repartition(7), "x", "y", 1L).collect()(0).getAs[Long]("rho_micro")
    val s2 = Stats.spearman(big, "x", "y", 1000L).collect()(0).getAs[Long]("rho_micro")
    assert(s1 == s2)
  }

  test("kaplanMeier: textbook curve with censoring; everyone-dies pins 0; all-censored stays 1") {
    // durations: 1 death, 2 censored, 3 death, 4 death, 5 censored
    val obs = Seq((1L, true), (2L, false), (3L, true), (4L, true), (5L, false))
      .toDF("dur", "ev")
    val out = Stats.kaplanMeier(obs, "dur", "ev", 2L)
      .collect().map(r => r.getAs[Long]("dur") -> r).toMap
    assert(out(1L).getAs[Long]("n_risk") == 5L && out(1L).getAs[Long]("surv_micro") == 800000L)
    assert(out(2L).getAs[Long]("surv_micro") == 800000L) // censor: no step
    assert(out(3L).getAs[Long]("n_risk") == 3L && out(3L).getAs[Long]("surv_micro") == 533333L)
    assert(out(4L).getAs[Long]("n_risk") == 2L && out(4L).getAs[Long]("surv_micro") == 266667L)
    assert(out(5L).getAs[Long]("surv_micro") == 266667L)
    // everyone remaining dies: S pinned to exactly 0, log-surv null
    val all = Seq((1L, true), (1L, true)).toDF("dur", "ev")
    val ra = Stats.kaplanMeier(all, "dur", "ev").collect()(0)
    assert(ra.getAs[Long]("surv_micro") == 0L && ra.isNullAt(4))
    // nobody dies: S = 1 everywhere
    val none = Seq((1L, false), (2L, false)).toDF("dur", "ev")
    assert(Stats.kaplanMeier(none, "dur", "ev").collect()
      .forall(_.getAs[Long]("surv_micro") == 1000000L))
    // partitioning/width invariance (rounded terms, exact sums)
    val big = (1L to 60L).map(i => (i % 9, i % 3 != 0)).toDF("dur", "ev")
    val k1 = Stats.kaplanMeier(big.repartition(7), "dur", "ev", 1L)
      .collect().map(r => (r.getAs[Long]("dur"), r.getAs[Long]("surv_micro"))).toSet
    val k2 = Stats.kaplanMeier(big, "dur", "ev", 1000L)
      .collect().map(r => (r.getAs[Long]("dur"), r.getAs[Long]("surv_micro"))).toSet
    assert(k1 == k2)
  }

  test("concentration: equal shares Gini 0; extreme concentration; exact top-decile cut") {
    // 10 keys x value 5 -> Gini = 0, top decile = 1 key = 10% of mass
    val eq = (1 to 10).map(i => (i.toLong, 5L)).toDF("k", "v")
    val re = Stats.concentration(eq, "k", "v", 3L).collect()(0)
    assert(re.getAs[Long]("n_keys") == 10L && re.getAs[Long]("total") == 50L)
    assert(re.getAs[Long]("gini_micro") == 0L)
    assert(re.getAs[Long]("top10_share_micro") == 100000L)
    // one key holds everything: Gini = (n-1)/n = 0.8 over 5 keys
    val one = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L), (5L, 100L)).toDF("k", "v")
    val ro = Stats.concentration(one, "k", "v", 7L).collect()(0)
    assert(ro.getAs[Long]("gini_micro") == 800000L)
    assert(ro.getAs[Long]("top10_share_micro") == 1000000L)
    // multi-row keys pre-aggregate; bucketWidth/partitioning invariance
    val multi = Seq((1L, 3L), (1L, 4L), (2L, 1L), (3L, 9L), (4L, 2L), (5L, 6L))
      .toDF("k", "v").repartition(4)
    val a = Stats.concentration(multi, "k", "v", 1L).collect()(0)
    val b = Stats.concentration(multi, "k", "v", 100L).collect()(0)
    assert(a.getAs[Long]("gini_micro") == b.getAs[Long]("gini_micro"))
    assert(a.getAs[Long]("top10_share_micro") == b.getAs[Long]("top10_share_micro"))
  }

  test("poissonBootstrapMean: deterministic, degenerate-exact on constant data") {
    // constant data: every replicate mean is exactly the value -> zero-width CI
    val const = (1 to 400).map(i => (i.toLong, 100L)).toDF("id", "v")
    val c = Stats.poissonBootstrapMean(const, "id", "v", reps = 64).collect()(0)
    assert(c.getAs[Long]("n_rows") == 400L)
    assert(c.getAs[Long]("mean_micro") == 100000000L)
    assert(c.getAs[Long]("boot_lo_micro") == 100000000L)
    assert(c.getAs[Long]("boot_hi_micro") == 100000000L)
    assert(c.getAs[Long]("boot_se_micro") == 0L)
    // varied data: CI brackets the mean, se positive, fully deterministic
    val varied = (1 to 500).map(i => (i.toLong, (i % 97).toLong)).toDF("id", "v")
    val a = Stats.poissonBootstrapMean(varied, "id", "v", reps = 64).collect()(0)
    val b = Stats.poissonBootstrapMean(varied.repartition(7), "id", "v", reps = 64)
      .collect()(0)
    assert(a.toSeq == b.toSeq, "bootstrap must be a pure function of the data")
    assert(a.getAs[Long]("boot_lo_micro") <= a.getAs[Long]("mean_micro")
      && a.getAs[Long]("mean_micro") <= a.getAs[Long]("boot_hi_micro"))
    assert(a.getAs[Long]("boot_se_micro") > 0L)
  }

  test("averagePrecision: exact PR area, id tie-break, bucket-invariant, no-pos null") {
    val rows = Seq((10L, 1L, true), (9L, 2L, false), (8L, 3L, true),
      (7L, 4L, true), (6L, 5L, false)).toDF("s", "id", "y").repartition(3)
    val r = Stats.averagePrecision(rows, "s", "id", "y", bucketWidth = 2L).collect()(0)
    assert(r.getAs[Long]("n_rows") == 5L && r.getAs[Long]("n_pos") == 3L)
    // terms: 1/1, 2/3, 3/4 pre-rounded micro -> mean rounded
    val expected = math.round((1000000L + math.round(2.0 / 3 * 1e6)
      + 750000L).toDouble / 3)
    assert(r.getAs[Long]("ap_micro") == expected)
    // score ties: id asc decides; pos at id 1 outranks neg at id 2
    val tie = Seq((5L, 1L, true), (5L, 2L, false)).toDF("s", "id", "y")
    assert(Stats.averagePrecision(tie, "s", "id", "y").collect()(0)
      .getAs[Long]("ap_micro") == 1000000L)
    // bucket width cannot change the answer
    val wide = Stats.averagePrecision(rows, "s", "id", "y", bucketWidth = 1000L)
      .collect()(0)
    assert(wide.getAs[Long]("ap_micro") == r.getAs[Long]("ap_micro"))
    // no positives: null AP, counts still reported
    val nop = Seq((1L, 1L, false)).toDF("s", "id", "y")
    val n = Stats.averagePrecision(nop, "s", "id", "y").collect()(0)
    assert(n.getAs[Long]("n_pos") == 0L && n.isNullAt(n.fieldIndex("ap_micro")))
  }

  test("changePointByGroup: finds the level shift, ties to earliest, bucket-invariant") {
    // group "a": level 10 for 3 rows then 50 for 2 -> split at i=3, gap 40
    val rows = Seq(
      ("a", 1L, 1L, 10L), ("a", 2L, 2L, 10L), ("a", 3L, 3L, 10L),
      ("a", 4L, 4L, 50L), ("a", 5L, 5L, 50L),
      // group "b": constant level -> D_i = 0 everywhere, argmax ties to i=1
      ("b", 1L, 6L, 7L), ("b", 2L, 7L, 7L), ("b", 3L, 8L, 7L),
      // group "c": single row -> no valid split, absent from output
      ("c", 1L, 9L, 99L))
      .toDF("g", "o", "id", "v").repartition(5)
    val r = Stats.changePointByGroup(rows, "g", "o", "id", "v", bucketWidth = 2L)
      .collect().map(x => x.getString(0) ->
        (x.getAs[Long]("n"), x.getAs[Long]("split_i"),
         x.getAs[Long]("split_o"), x.getAs[Long]("gap_micro"))).toMap
    assert(r.keySet == Set("a", "b"))
    assert(r("a") == ((5L, 3L, 3L, 40000000L)))
    assert(r("b") == ((3L, 1L, 1L, 0L)))
    // bucket width must not change the answer (two-level prefix correctness)
    val wide = Stats.changePointByGroup(rows, "g", "o", "id", "v", bucketWidth = 1000L)
      .collect().map(x => x.getString(0) -> x.getAs[Long]("split_i")).toMap
    assert(wide == Map("a" -> 3L, "b" -> 1L))
  }

  test("mannWhitney: hand U with ties; all-tied null z; other levels/nulls ignored; width-invariant") {
    // a = [1,2,3,3], b = [3,4,5]: doubled midranks 2,4,8,8 | 8,12,14
    // -> R2a = 22, u2_a = 22 - 4*5 = 2; ties term (t=3) = 24
    val df = Seq(("a", Some(1L)), ("a", Some(2L)), ("a", Some(3L)),
      ("a", Some(3L)), ("b", Some(3L)), ("b", Some(4L)), ("b", Some(5L)),
      ("c", Some(99L)), ("a", None)).toDF("g", "v")
    for (w <- Seq(1L, 1000L)) {
      val r = Stats.mannWhitney(df.repartition(5), "g", "v", "a", "b", w).collect()(0)
      assert(r.getAs[Long]("n_a") == 4L && r.getAs[Long]("n_b") == 3L)
      assert(r.getAs[Long]("u2_a") == 2L)
      assert(r.getAs[Long]("z_micro") == -1834498L, s"w=$w")
    }
    // every value tied: variance 0 -> no test, U still defined
    val tied = Seq(("a", 7L), ("a", 7L), ("b", 7L)).toDF("g", "v")
    val rt = Stats.mannWhitney(tied, "g", "v", "a", "b").collect()(0)
    assert(rt.getAs[Long]("u2_a") == 2L * 4L - 2L * 3L) // R2a = ca·r2 = 8, minus na(na+1)
    assert(rt.isNullAt(rt.fieldIndex("z_micro")))
    // empty side -> null z
    val one = Seq(("a", 1L), ("a", 2L)).toDF("g", "v")
    assert(one.transform(Stats.mannWhitney(_, "g", "v", "a", "b"))
      .collect()(0).isNullAt(3))
  }

  test("mannWhitneyByGroup: one pass equals per-segment mannWhitney calls; null segments dropped") {
    val rows = (1 to 120).map { i =>
      val seg = s"s${i % 3}"
      val g = if (i % 2 == 0) "a" else "b"
      (seg, g, ((i * 31) % 17).toLong)
    }
    val df = (rows :+ (null.asInstanceOf[String], "a", 5L)).toDF("seg", "g", "v")
    val grouped = Stats.mannWhitneyByGroup(df, "seg", "g", "v", "a", "b", 4L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(grouped.keySet == Set("s0", "s1", "s2")) // null segment dropped
    for (s <- Seq("s0", "s1", "s2")) {
      val single = Stats.mannWhitney(df.filter(col("seg") === s), "g", "v",
        "a", "b", 4L).collect()(0)
      assert(grouped(s) == ((single.getLong(0), single.getLong(1),
        single.getLong(2), single.getLong(3))), s"seg=$s")
    }
  }

  test("wilcoxonSignedRank: hand W+ with ties and zero-drop; all-zero null; null pairs ignored") {
    // diffs 2, -1, 3, 3, 0: zero dropped -> n=4; |d| ranks 1(neg), 2(pos),
    // 3.5, 3.5(pos) -> W+ = 9, W2+ = 18; T = 6 -> z = 8/(2*sqrt(7.375))
    val df = Seq((10L, 8L), (4L, 5L), (9L, 6L), (7L, 4L), (5L, 5L))
      .toDF("x", "y")
    for (w <- Seq(1L, 1000L)) {
      val r = Stats.wilcoxonSignedRank(df.repartition(3), "x", "y", w).collect()(0)
      assert(r.getAs[Long]("n_pairs") == 5L)
      assert(r.getAs[Long]("n_nonzero") == 4L)
      assert(r.getAs[Long]("w2_plus") == 18L)
      assert(r.getAs[Long]("z_micro") == 1472919L, s"w=$w")
    }
    // all diffs zero: no test, zero W
    val z = Stats.wilcoxonSignedRank(Seq((3L, 3L), (4L, 4L)).toDF("x", "y"),
      "x", "y").collect()(0)
    assert(z.getAs[Long]("n_pairs") == 2L && z.getAs[Long]("n_nonzero") == 0L)
    assert(z.getAs[Long]("w2_plus") == 0L && z.isNullAt(z.fieldIndex("z_micro")))
    // a null side drops the pair entirely
    val withNull = Seq((Some(4L), Some(1L)), (None, Some(9L)), (Some(2L), None))
      .toDF("x", "y")
    val rn = Stats.wilcoxonSignedRank(withNull, "x", "y").collect()(0)
    assert(rn.getAs[Long]("n_pairs") == 1L && rn.getAs[Long]("n_nonzero") == 1L)
  }

  test("oneWayAnova: hand eta2/F; constant data null F; saturated fit null F; partition-invariant") {
    // a=[1,2,3], b=[5,7]: SST=23.2, terms 331034+496552, F=14.399979
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 5L), ("b", 7L))
      .toDF("g", "v")
    for (parts <- Seq(1, 4)) {
      val r = Stats.oneWayAnova(df.repartition(parts), "g", "v").collect()(0)
      assert(r.getAs[Long]("n_total") == 5L && r.getAs[Long]("k") == 2L)
      assert(r.getAs[Long]("dof_between") == 1L && r.getAs[Long]("dof_within") == 3L)
      assert(r.getAs[Long]("eta2_micro") == 827586L, s"parts=$parts")
      assert(r.getAs[Long]("f_micro") == 14399979L, s"parts=$parts")
    }
    // constant data: SST = 0 -> no effect size, no test
    val const = Seq(("a", 4L), ("a", 4L), ("b", 4L)).toDF("g", "v")
    val rc = Stats.oneWayAnova(const, "g", "v").collect()(0)
    assert(rc.isNullAt(rc.fieldIndex("eta2_micro")) && rc.isNullAt(rc.fieldIndex("f_micro")))
    // one row per group: eta2 = 1 (saturated), F undefined
    val sat = Seq(("a", 1L), ("b", 2L)).toDF("g", "v")
    val rs = Stats.oneWayAnova(sat, "g", "v").collect()(0)
    assert(rs.getAs[Long]("eta2_micro") == 1000000L)
    assert(rs.isNullAt(rs.fieldIndex("f_micro")))
  }

  test("brownForsythe: hand eta2/F on doubled median deviations; equal-spread groups near zero") {
    // a=[1,2,6] med 2 -> z2 = 2,0,8; b=[4,8] med 6 -> z2 = 4,4
    // ANOVA on z2: terms 6061 + 9091, F = 0.046155
    val df = Seq(("a", 1L), ("a", 2L), ("a", 6L), ("b", 4L), ("b", 8L))
      .toDF("g", "v")
    val r = Stats.brownForsythe(df.repartition(3), "g", "v").collect()(0)
    assert(r.getAs[Long]("n_total") == 5L && r.getAs[Long]("k") == 2L)
    assert(r.getAs[Long]("eta2_micro") == 15152L)
    assert(r.getAs[Long]("f_micro") == 46155L)
    // shifting one group far away changes LOCATION, not the BF statistic
    val shifted = df.withColumn("v",
      when(col("g") === "b", col("v") + 1000L).otherwise(col("v")))
    val rs = Stats.brownForsythe(shifted, "g", "v").collect()(0)
    assert(rs.getAs[Long]("eta2_micro") == 15152L)
    assert(rs.getAs[Long]("f_micro") == 46155L)
    // identical in-group deviations everywhere: SST of z2 = 0 -> null
    val flat = Seq(("a", 0L), ("a", 2L), ("b", 5L), ("b", 7L)).toDF("g", "v")
    val rf = Stats.brownForsythe(flat, "g", "v").collect()(0)
    assert(rf.isNullAt(rf.fieldIndex("f_micro")))
  }

  test("friedman: hand chi2 with in-block ties; incomplete blocks dropped; all-tied null") {
    // b1: a1 b2 c3; b2: a2 b2 c4 (tie); b3: a1 b3 c2
    // R2 = (7, 13, 16), terms 2083333+83333+1333333, T=6
    val df = Seq(
      ("b1", "a", 1L), ("b1", "b", 2L), ("b1", "c", 3L),
      ("b2", "a", 2L), ("b2", "b", 2L), ("b2", "c", 4L),
      ("b3", "a", 1L), ("b3", "b", 3L), ("b3", "c", 2L),
      ("b4", "a", 9L), ("b4", "b", 9L)  // incomplete: no c -> dropped
    ).toDF("blk", "trt", "v")
    val r = Stats.friedman(df.repartition(4), "blk", "trt", "v").collect()(0)
    assert(r.getAs[Long]("n_blocks") == 3L && r.getAs[Long]("k") == 3L)
    assert(r.getAs[Long]("dof") == 2L)
    assert(r.getAs[Long]("chi2_micro") == 3499999L)
    assert(r.getAs[Long]("chi2_tie_micro") == 3818181L)
    // every block fully tied: correction hits zero -> degenerate, null
    val flat = Seq(("b1", "a", 5L), ("b1", "b", 5L),
      ("b2", "a", 7L), ("b2", "b", 7L)).toDF("blk", "trt", "v")
    val rf = Stats.friedman(flat, "blk", "trt", "v").collect()(0)
    assert(rf.getAs[Long]("n_blocks") == 2L)
    assert(rf.isNullAt(rf.fieldIndex("chi2_micro")))
    // no complete block at all: empty result
    val none = Seq(("b1", "a", 1L), ("b2", "b", 2L)).toDF("blk", "trt", "v")
    assert(Stats.friedman(none, "blk", "trt", "v").count() == 0L)
  }

  test("cuped: hand theta/adjusted diff/rho2; constant covariate null; unbiased when arms balanced") {
    // units (t, x, y): theta = 2.3, raw diff 26, cuped diff 3, rho2 0.98327
    val df = Seq((false, 10L, 20L), (false, 20L, 40L),
      (true, 20L, 46L), (true, 30L, 66L)).toDF("t", "x", "y")
    val r = Stats.cuped(df.repartition(3), "t", "x", "y").collect()(0)
    assert(r.getAs[Long]("n_treat") == 2L && r.getAs[Long]("n_ctrl") == 2L)
    assert(r.getAs[Long]("theta_micro") == 2300000L)
    assert(r.getAs[Long]("diff_micro") == 26000000L)
    assert(r.getAs[Long]("diff_cuped_micro") == 3000000L)
    assert(r.getAs[Long]("var_reduction_micro") == 983271L)
    // covariate balanced across arms: CUPED diff == raw diff (unbiased)
    val bal = Seq((false, 10L, 20L), (false, 20L, 40L),
      (true, 10L, 25L), (true, 20L, 45L)).toDF("t", "x", "y")
    val rb = Stats.cuped(bal, "t", "x", "y").collect()(0)
    assert(rb.getAs[Long]("diff_micro") == rb.getAs[Long]("diff_cuped_micro"))
    // constant covariate: var(x) = 0 -> no theta, no adjustment, raw diff kept
    val const = Seq((false, 5L, 1L), (true, 5L, 3L)).toDF("t", "x", "y")
    val rc = Stats.cuped(const, "t", "x", "y").collect()(0)
    assert(rc.isNullAt(rc.fieldIndex("theta_micro")))
    assert(rc.isNullAt(rc.fieldIndex("diff_cuped_micro")))
    assert(rc.getAs[Long]("diff_micro") == 2000000L)
    // empty arm: no diffs
    val one = Seq((true, 1L, 2L), (true, 2L, 5L)).toDF("t", "x", "y")
    val ro = Stats.cuped(one, "t", "x", "y").collect()(0)
    assert(ro.isNullAt(ro.fieldIndex("diff_micro")))
  }

  test("kruskalWallis: hand H with tie correction; single-value null; width/partition-invariant") {
    // x=[1,2,3], y=[3,4], z=[5]: doubled rank sums 13, 17, 12; N=6, T=6
    val df = Seq(("x", 1L), ("x", 2L), ("x", 3L), ("y", 3L), ("y", 4L),
      ("z", 5L)).toDF("g", "v")
    for (w <- Seq(1L, 16L, 1000L); parts <- Seq(1, 5)) {
      val r = Stats.kruskalWallis(df.repartition(parts), "g", "v", w).collect()(0)
      assert(r.getAs[Long]("n_groups") == 3L && r.getAs[Long]("n_total") == 6L)
      assert(r.getAs[Long]("dof") == 2L)
      assert(r.getAs[Long]("h_micro") == 3630953L, s"w=$w parts=$parts")
      assert(r.getAs[Long]("h_tie_micro") == 3737746L, s"w=$w parts=$parts")
    }
    // identical-to-scipy spot check without ties: H = 12/(N(N+1))·ΣR²/n − 3(N+1)
    val nt = Seq(("x", 1L), ("x", 2L), ("y", 3L), ("y", 4L)).toDF("g", "v")
    val rn = Stats.kruskalWallis(nt, "g", "v").collect()(0)
    // rank sums 3, 7 -> H = 12/20*(9/2+49/2) - 15 = 2.4 - but quantize-then-sum:
    // terms: 12*2*1^2/20 = 1.2 each -> 1200000+1200000
    assert(rn.getAs[Long]("h_micro") == 2400000L)
    assert(rn.getAs[Long]("h_tie_micro") == 2400000L) // no ties
    // all values tied across all groups: corr = 0 -> degenerate, null H
    val allt = Seq(("x", 5L), ("y", 5L), ("z", 5L)).toDF("g", "v")
    val ra = Stats.kruskalWallis(allt, "g", "v").collect()(0)
    assert(ra.isNullAt(ra.fieldIndex("h_micro")) && ra.isNullAt(ra.fieldIndex("h_tie_micro")))
  }

  test("winsorizedMean: hand bounds and clipped mean; trim 0 is the plain mean; tie boundary") {
    import spark.implicits._
    // group a: 1..10 plus a 1000 outlier; n=11, 10% trim -> k=1,
    // lo = 2nd smallest = 2, hi = 10th = 10; clipped sum 66, mean 6
    val a = ((1 to 10).map(_.toDouble) :+ 1000.0).zipWithIndex
      .map { case (v, i) => ("a", v, i.toLong) }
    val df = a.toDF("g", "v", "id")
    val got = Stats.winsorizedMean(df, "g", "v", "id", trimPct = 10).head()
    assert(got.getLong(1) == 11L && got.getLong(2) == 1L)       // n, k
    assert(got.getLong(3) == 2000000L && got.getLong(4) == 10000000L) // lo, hi
    assert(got.getLong(5) == 66000000L && got.getLong(6) == 6000000L) // sum, mean
    // the raw mean would have been ~95.9 — the clip is what tames the tail
    // trimPct = 0: bounds are min/max, nothing clips — the plain mean
    val plain = Stats.winsorizedMean(df, "g", "v", "id", trimPct = 0).head()
    assert(plain.getLong(2) == 0L && plain.getLong(5) == 1055000000L)
    // tied boundary values clip deterministically (total order by id)
    val t = Seq(("b", 1.0, 1L), ("b", 5.0, 2L), ("b", 5.0, 3L),
      ("b", 5.0, 4L), ("b", 9.0, 5L)).toDF("g", "v", "id")
    val tb = Stats.winsorizedMean(t, "g", "v", "id", trimPct = 20).head()
    assert(tb.getLong(3) == 5000000L && tb.getLong(4) == 5000000L)
    assert(tb.getLong(6) == 5000000L)
    // partition invariance (exact integers end to end)
    val rep = Stats.winsorizedMean(df.repartition(7), "g", "v", "id", 10).head()
    assert(rep.getLong(5) == 66000000L)
    intercept[IllegalArgumentException] {
      Stats.winsorizedMean(df, "g", "v", "id", trimPct = 50)
    }
  }

  test("powerLawAlpha: Clauset discrete MLE, tail filter, degenerate nulls, partition invariance") {
    // counts (4, 2, 1): the 1 falls below x_min = 2; alpha from the
    // SAME quantize-then-sum arithmetic computed locally
    val df = Seq(4L, 2L, 1L).toDF("n")
    val r = Stats.powerLawAlpha(df, "n", xMin = 2L).head()
    val terms = Seq(4L, 2L).map(v => math.round(math.log(v / 1.5) * 1e9))
    val want = math.round((1.0 + 2 * 1e9 / terms.sum.toDouble) * 1e6)
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L)
    assert(r.getLong(2) == terms.sum && r.getLong(3) == want)
    // a pure-Zipf synthetic (n_r ~ r^-2 ranks) lands near alpha ~ 2-3
    val zipf = (1 to 200).map(rk => math.max(1L, (20000 / (rk * rk)).toLong))
      .toDF("n")
    val za = Stats.powerLawAlpha(zipf, "n").head().getLong(3)
    assert(za > 1200000L && za < 4000000L, s"implausible alpha $za")
    // empty tail and all-at-x_min-with-zero-sum degenerate: null alpha
    assert(Stats.powerLawAlpha(Seq(1L).toDF("n"), "n", 2L).head().isNullAt(3))
    val one = Stats.powerLawAlpha(Seq(2L, 2L).toDF("n"), "n", 2L).head()
    assert(one.getLong(3) > 1000000L) // sum > 0 here (ln(2/1.5) > 0)
    // partition invariance (quantize-then-sum, never a raw double sum)
    val big = (1 to 500).map(i => ((i % 37) + 2).toLong).toDF("n")
    val a1 = Stats.powerLawAlpha(big, "n").head().getLong(3)
    val a2 = Stats.powerLawAlpha(big.repartition(11), "n").head().getLong(3)
    assert(a1 == a2)
  }

  test("fleissKappa: textbook value, perfect 1, degenerate null, nᵢ<2 dropped") {
    // 4 items x 3 raters, 2 categories: P̄ = 2/3, Pe = 1/2, κ = 1/3
    val ratings = Seq(
      (1L, "A"), (1L, "A"), (1L, "A"),
      (2L, "A"), (2L, "A"), (2L, "B"),
      (3L, "A"), (3L, "B"), (3L, "B"),
      (4L, "B"), (4L, "B"), (4L, "B")).toDF("item", "cat")
    val r = Stats.fleissKappa(ratings, "item", "cat").collect()(0)
    assert(r.getAs[Long]("n_items") == 4L && r.getAs[Long]("n_ratings") == 12L)
    assert(r.getAs[Long]("pbar_nano") == 666666666L)
    assert(r.getAs[Long]("pe_nano") == 500000000L)
    assert(r.getAs[Long]("kappa_micro") == 333333L)
    // perfect agreement across a 2-category split -> exactly 1
    val perfect = Seq((1L, "A"), (1L, "A"), (2L, "B"), (2L, "B")).toDF("item", "cat")
    assert(Stats.fleissKappa(perfect, "item", "cat").collect()(0)
      .getAs[Long]("kappa_micro") == 1000000L)
    // single category everywhere: Pe = 1 -> null
    val const = Seq((1L, "A"), (1L, "A"), (2L, "A"), (2L, "A")).toDF("item", "cat")
    assert(Stats.fleissKappa(const, "item", "cat").collect()(0).isNullAt(4))
    // a single-rating item contributes to NEITHER P̄ nor the marginals
    val withSingle = ratings.union(Seq((9L, "Z")).toDF("item", "cat"))
    val rs = Stats.fleissKappa(withSingle, "item", "cat").collect()(0)
    assert(rs.getAs[Long]("n_items") == 4L && rs.getAs[Long]("n_ratings") == 12L)
    assert(rs.getAs[Long]("kappa_micro") == 333333L)
    // partition invariance (exact integer path)
    val rp = Stats.fleissKappa(ratings.repartition(7), "item", "cat").collect()(0)
    assert(rp.getAs[Long]("kappa_micro") == 333333L)
  }

  test("conformalThreshold: exact k-th smallest, integer ceil, small-n refusal, tie order") {
    // group a: scores 1..9, alpha 10% -> k = ceil(10*0.9) = 9 -> qhat = 9
    // group b: 3 scores -> k = ceil(4*0.9) = 4 > 3 -> null threshold
    val df = ((1 to 9).map(i => ("a", i.toDouble, i.toLong))
      ++ Seq(("b", 1.0, 101L), ("b", 2.0, 102L), ("b", 3.0, 103L)))
      .toDF("g", "score", "id")
    val got = Stats.conformalThreshold(df, "g", "score", "id", alphaPct = 10)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(got("a") == (9L, 9L, Some(9000000L)))
    assert(got("b") == (3L, 4L, None))
    // alpha 50%: k = ceil(10*0.5) = 5 -> the median-ish 5th smallest
    val a50 = Stats.conformalThreshold(df.filter(col("g") === "a"),
      "g", "score", "id", alphaPct = 50).collect()(0)
    assert(a50.getLong(2) == 5L && a50.getLong(3) == 5000000L)
    // ties: duplicated scores still give the exact positional statistic
    val ties = Seq(("t", 1.0, 1L), ("t", 1.0, 2L), ("t", 2.0, 3L),
      ("t", 2.0, 4L)).toDF("g", "score", "id")
    // k = ceil(5*0.9) = 5 > 4 -> null; at alpha=40 k = ceil(5*0.6) = 3 -> 2.0
    assert(Stats.conformalThreshold(ties, "g", "score", "id", 10)
      .collect()(0).isNullAt(3))
    assert(Stats.conformalThreshold(ties, "g", "score", "id", 40)
      .collect()(0).getLong(3) == 2000000L)
    // partition invariance
    val rep = Stats.conformalThreshold(df.repartition(7), "g", "score", "id", 10)
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(rep == got.view.mapValues(_._3).toMap)
    intercept[IllegalArgumentException] {
      Stats.conformalThreshold(df, "g", "score", "id", 0)
    }
  }

  test("bradleyTerry: two-item MLE ratio, zero-win rest at 0, determinism, round clamp") {
    // A beats B 3x, B beats A 1x: two-item BT MLE has sA/sB = 3 ->
    // shares 750000/250000; the MM update hits the fixed point in round 1
    val ab = (Seq.fill(3)(("A", "B")) ++ Seq.fill(1)(("B", "A"))).toDF("w", "l")
    val r = Stats.bradleyTerry(ab, "w", "l", rounds = 4)
      .orderBy("item").collect()
      .map(x => (x.getString(0), x.getAs[Long]("n_games"),
        x.getAs[Long]("n_wins"), x.getAs[Long]("share_micro")))
    assert(r.toSeq == Seq(("A", 4L, 3L, 750000L), ("B", 4L, 1L, 250000L)))
    // an all-loser rests at exactly 0 strength and share
    val chain = (Seq.fill(2)(("A", "B")) ++ Seq.fill(2)(("B", "C"))).toDF("w", "l")
    val c = Stats.bradleyTerry(chain, "w", "l", rounds = 6)
      .orderBy("item").collect()
      .map(x => (x.getString(0), x.getAs[Long]("strength_micro")))
    assert(c.last == ("C", 0L))
    assert(c(0)._2 > c(1)._2 && c(1)._2 > 0L) // A > B > C
    // strength beats raw win rate: B and D both go 2-2, but B's wins came
    // against the strong A while D's came against the all-loser C (and D
    // lost its real games to A) - BT must rank B far above D. (A graph
    // where D beat ONLY an island all-loser is deliberately avoided:
    // that's the classic non-identifiable BT case.)
    val mixed = (Seq.fill(2)(("A", "B")) ++ Seq.fill(2)(("B", "A"))
      ++ Seq.fill(2)(("A", "C")) ++ Seq.fill(2)(("D", "C"))
      ++ Seq.fill(2)(("A", "D"))).toDF("w", "l")
    val m = Stats.bradleyTerry(mixed, "w", "l", rounds = 8).collect()
      .map(x => x.getString(0) -> x.getAs[Long]("strength_micro")).toMap
    assert(m("B") > m("D"), s"strength must out-rank win-rate: $m")
    // deterministic under repartitioning (pure integer arithmetic)
    val rep = Stats.bradleyTerry(ab.repartition(5), "w", "l", rounds = 4)
      .orderBy("item").collect().map(_.getAs[Long]("strength_micro")).toSeq
    val one = Stats.bradleyTerry(ab, "w", "l", rounds = 4)
      .orderBy("item").collect().map(_.getAs[Long]("strength_micro")).toSeq
    assert(rep == one)
    intercept[IllegalArgumentException] { Stats.bradleyTerry(ab, "w", "l", 0) }
  }

  test("pairState/ingestGames: hygiene, pair-bounded store, fold == full-history BT") {
    // self-play and null rows dropped; wins_i counts the SMALLER item's wins
    val g = Seq(Some("B") -> Some("A"), Some("A") -> Some("B"),
      Some("A") -> Some("B"), Some("A") -> Some("A"),
      None -> Some("B"), Some("A") -> None).toDF("w", "l")
    val st = Stats.pairState(g, "w", "l").collect()
    assert(st.length == 1)
    assert(st(0).getAs[String]("item_i") == "A"
      && st(0).getAs[Long]("n_ij") == 3L && st(0).getAs[Long]("wins_i") == 2L)
    // additive delta fold across a split == pairState over everything,
    // and the store readout == the direct bradleyTerry
    val hist = Seq(("A", "B"), ("B", "A"), ("A", "C"))
    val batch = Seq(("C", "B"), ("A", "B"))
    val all = (hist ++ batch).toDF("w", "l")
    val (h, b) = (hist.toDF("w", "l"), batch.toDF("w", "l"))
    val folded = Stats.ingestGames(Stats.pairState(h, "w", "l"), b, "w", "l")
    val direct = Stats.pairState(all, "w", "l")
    assert(folded.orderBy("item_i", "item_j").collect().map(_.toSeq).toSeq
      == direct.orderBy("item_i", "item_j").collect().map(_.toSeq).toSeq)
    val got = Stats.bradleyTerryFromPairs(folded, rounds = 5)
      .orderBy("item").collect().map(_.toSeq).toSeq
    val exp = Stats.bradleyTerry(all, "w", "l", rounds = 5)
      .orderBy("item").collect().map(_.toSeq).toSeq
    assert(got == exp)
  }

  test("reliabilityBins/calibrationSummary: hand bins, top-bin closure, " +
      "range/null drops, calibrated ECE 0, constant scores, empty input") {
    // bin 2: conf = acc = 0.25 (perfectly calibrated); bin 9 takes both
    // 0.95 and the EXACT 1.0 (closed top); out-of-range and nulls dropped
    val df = Seq(
      (Some(0.25), Some(true)), (Some(0.25), Some(false)),
      (Some(0.25), Some(false)), (Some(0.25), Some(false)),
      (Some(0.95), Some(true)), (Some(1.0), Some(true)),
      (Some(-0.1), Some(true)), (Some(1.5), Some(false)), // out of range
      (None, Some(true)), (Some(0.5), None)               // nulls
    ).toDF("p", "y")
    val bins = Stats.reliabilityBins(df, "p", "y", nBins = 10)
      .orderBy("bin").collect()
    assert(bins.map(_.getAs[Long]("bin")).toSeq == Seq(2L, 9L))
    val b2 = bins(0)
    assert(b2.getAs[Long]("n") == 4L && b2.getAs[Long]("n_pos") == 1L)
    assert(b2.getAs[Long]("conf_micro") == 250000L
      && b2.getAs[Long]("acc_micro") == 250000L)
    val b9 = bins(1)
    assert(b9.getAs[Long]("n") == 2L && b9.getAs[Long]("n_pos") == 2L)
    assert(b9.getAs[Long]("conf_micro") == 975000L
      && b9.getAs[Long]("acc_micro") == 1000000L)
    // summary: ECE = (4·0 + 2·25000)/6; Brier = Σ(p−y)²/6 exactly
    val s = Stats.calibrationSummary(df, "p", "y", nBins = 10).collect()(0)
    assert(s.getAs[Long]("n_rows") == 6L && s.getAs[Long]("n_pos") == 3L)
    assert(s.getAs[Long]("ece_micro") == math.round(2.0 * 25000 / 6))
    val brier = (0.5625 + 3 * 0.0625 + 0.0025 + 0.0) / 6
    assert(s.getAs[Long]("brier_micro") == math.round(brier * 1e6))
    // constant scores, all positive: one bin, ECE = 1 − p
    val const = Seq.fill(5)((0.5, true)).toDF("p", "y")
    val cs = Stats.calibrationSummary(const, "p", "y").collect()(0)
    assert(cs.getAs[Long]("ece_micro") == 500000L
      && cs.getAs[Long]("brier_micro") == 250000L)
    // empty input: zero counts, null statistics
    val e = Stats.calibrationSummary(df.filter(col("p") > 2), "p", "y").collect()(0)
    assert(e.getAs[Long]("n_rows") == 0L && e.isNullAt(2) && e.isNullAt(3))
    // partition-invariant (exact long sums)
    val rep = Stats.calibrationSummary(df.repartition(7), "p", "y").collect()(0)
    assert(rep.getAs[Long]("ece_micro") == s.getAs[Long]("ece_micro")
      && rep.getAs[Long]("brier_micro") == s.getAs[Long]("brier_micro"))
    intercept[IllegalArgumentException] { Stats.reliabilityBins(df, "p", "y", 0) }
  }

  test("calibrationState/ingestCalibration: additive fold ≡ full history, " +
      "order-free, bin-bounded") {
    val h = Seq((0.25, true), (0.25, false), (0.95, true), (0.45, true))
      .toDF("p", "y")
    val b = Seq((0.25, false), (1.0, true), (0.45, false), (0.451, true))
      .toDF("p", "y")
    val full = Stats.reliabilityBins(h.unionByName(b), "p", "y")
      .orderBy("bin").collect().map(_.toSeq).toSeq
    val st = Stats.ingestCalibration(
      Stats.calibrationState(h, "p", "y"), b, "p", "y")
    assert(Stats.reliabilityBinsFromState(st)
      .orderBy("bin").collect().map(_.toSeq).toSeq == full)
    // additive fields commute: folding in the other order is identical
    val stRev = Stats.ingestCalibration(
      Stats.calibrationState(b, "p", "y"), h, "p", "y")
    assert(Stats.reliabilityBinsFromState(stRev)
      .orderBy("bin").collect().map(_.toSeq).toSeq == full)
    // the store is bin-bounded (3 populated bins), never row-sized
    assert(st.count() == 3L)
    // the direct path IS the state readout (one definition, no drift)
    assert(Stats.reliabilityBins(h, "p", "y").orderBy("bin")
      .collect().map(_.toSeq).toSeq
      == Stats.reliabilityBinsFromState(Stats.calibrationState(h, "p", "y"))
        .orderBy("bin").collect().map(_.toSeq).toSeq)
  }

  test("applyCalibration: remap zeroes the fixture's ECE, keeps rows, nulls " +
      "unseen bins, preserves ranking; reserved-name clash rejected") {
    // 5-bin miscalibrated fixture: conf 0.3/0.5/0.7/0.9, acc .6/.2/.8/.7
    // — (0.3, 0.5) and (0.7, 0.9) are adjacent violators, so the isotonic
    // remap pools to 0.4 and 0.75
    val rows = Seq(0.3 -> 12, 0.5 -> 4, 0.7 -> 16, 0.9 -> 14).flatMap {
      case (p, hits) => (1 to 20).map(i => (p, i <= hits))
    }
    val df = rows.toDF("p", "y")
    val remap = Stats.isotonicCalibration(df, "p", "y", nBins = 5)
    assert(remap.orderBy("bin").collect().map(_.getAs[Long]("iso_micro"))
      .toSeq == Seq(400000L, 400000L, 750000L, 750000L))
    val out = Stats.applyCalibration(df, remap, "p", nBins = 5, outCol = "pc")
    assert(out.count() == df.count()) // remap never drops rows
    val before = Stats.calibrationSummary(df, "p", "y", nBins = 5)
      .head().getAs[Long]("ece_micro")
    val after = Stats.calibrationSummary(out, "pc", "y", nBins = 5)
      .head().getAs[Long]("ece_micro")
    assert(before == 225000L && after == 0L, s"ece $before -> $after")
    // monotone: the remapped score is non-decreasing in the original
    val seen = out.select("p", "pc").distinct().orderBy("p")
      .collect().map(_.getAs[Double]("pc")).toSeq
    assert(seen == seen.sorted && seen == Seq(0.4, 0.4, 0.75, 0.75))
    // a score whose bin the fit never saw (bin 0), a null and an
    // out-of-range score all KEEP their rows with a null remap
    val probe = Seq(Some(0.05), None, Some(1.5)).toDF("p")
    val pr = Stats.applyCalibration(probe, remap, "p", nBins = 5, outCol = "pc")
    assert(pr.count() == 3L && pr.filter(col("pc").isNull).count() == 3L)
    intercept[IllegalArgumentException] {
      Stats.applyCalibration(df.withColumn("__cal_bin", lit(1)), remap, "p")
    }
  }

  test("plattCalibration: monotone sigmoid remap fixes a logistic fixture, " +
      "partition-invariant, one-bin degeneracy at the smoothed base rate") {
    // the data IS logistic — rate(s) = σ(6s−3) rounded to counts — so the
    // 2-param fit must land near it and the applied remap must beat the
    // raw scores' ECE (exactly 40000 micro by construction)
    val rows = Seq(0.1 -> 3, 0.3 -> 9, 0.5 -> 20, 0.7 -> 31, 0.9 -> 37)
      .flatMap { case (p, hits) => (1 to 40).map(i => (p, i <= hits)) }
    val df = rows.toDF("p", "y")
    val remap = Stats.plattCalibration(df, "p", "y", nBins = 5, rounds = 8)
    val platt = remap.orderBy("bin").collect()
      .map(_.getAs[Long]("platt_micro")).toSeq
    assert(platt == platt.sorted, s"remap must be monotone: $platt")
    // the fit tracks the generating sigmoid within bin resolution
    val gen = Seq(0.1, 0.3, 0.5, 0.7, 0.9)
      .map(s => math.round(1e6 / (1 + math.exp(-(6 * s - 3)))))
    assert(platt.zip(gen).forall { case (g, e) => math.abs(g - e) < 60000 },
      s"fit $platt vs generator $gen")
    val before = Stats.calibrationSummary(df, "p", "y", nBins = 5)
      .head().getAs[Long]("ece_micro")
    val after = Stats.calibrationSummary(
      Stats.applyCalibration(df, remap, "p", nBins = 5, outCol = "pc",
        remapCol = "platt_micro"), "pc", "y", nBins = 5)
      .head().getAs[Long]("ece_micro")
    assert(before == 40000L && after < before, s"ece $before -> $after")
    // exact integer statistics + quantized rounds → partition-invariant
    val rep = Stats.plattCalibration(df.repartition(7), "p", "y",
        nBins = 5, rounds = 8)
      .orderBy("bin").collect().map(_.toSeq).toSeq
    assert(rep == remap.orderBy("bin").collect().map(_.toSeq).toSeq)
    // one bin: the Hessian is singular, every update skips, and the fit
    // rests at σ(smoothed base-rate logit) = σ(ln((3+1)/(1+1))) = 2/3
    val one = Seq((0.5, true), (0.5, true), (0.5, true), (0.5, false))
      .toDF("p", "y")
    val o = Stats.plattCalibration(one, "p", "y").collect()
    assert(o.length == 1 && o(0).getAs[Long]("platt_micro") == 666667L)
    // empty input → empty remap; bad params rejected
    assert(Stats.plattCalibration(df.filter(col("p") > 2), "p", "y").count() == 0L)
    intercept[IllegalArgumentException] {
      Stats.plattCalibration(df, "p", "y", rounds = 0)
    }
  }

  test("calibrationSummaryByGroup/reliabilityBinsByGroup: one pass ≡ the " +
      "global summary per slice; null groups dropped") {
    val df = Seq(
      ("a", 0.25, true), ("a", 0.25, false), ("a", 0.95, true),
      ("a", 0.95, false), ("b", 0.45, true), ("b", 0.45, true),
      ("b", 1.0, false)).toDF("g", "p", "y")
    val withNull = df.unionByName(
      Seq((Option.empty[String], 0.5, true)).toDF("g", "p", "y"))
    val got = Stats.calibrationSummaryByGroup(withNull, "g", "p", "y")
      .orderBy("g").collect()
    assert(got.map(_.getAs[String]("g")).toSeq == Seq("a", "b")) // null g dropped
    for (r <- got) {
      val slice = Stats.calibrationSummary(
        df.filter(col("g") === r.getAs[String]("g")), "p", "y").head()
      assert(r.getAs[Long]("n_rows") == slice.getAs[Long]("n_rows"))
      assert(r.getAs[Long]("n_pos") == slice.getAs[Long]("n_pos"))
      assert(r.getAs[Long]("ece_micro") == slice.getAs[Long]("ece_micro"))
      assert(r.getAs[Long]("brier_micro") == slice.getAs[Long]("brier_micro"))
    }
    // the grouped bins match the global bins computed per slice
    val gotBins = Stats.reliabilityBinsByGroup(df, "g", "p", "y")
      .select("g", "bin", "n", "n_pos", "conf_micro", "acc_micro")
      .orderBy("g", "bin").collect().map(_.toSeq).toSeq
    val expBins = Seq("a", "b").flatMap { g =>
      Stats.reliabilityBins(df.filter(col("g") === g), "p", "y")
        .orderBy("bin").collect()
        .map(r => g +: r.toSeq)
    }
    assert(gotBins == expBins)
  }

  test("reliabilityBinsQuantile: exact mass balance, rank determinism, score ranges") {
    // 12 rows, 4 bins -> exactly 3 per bin in (p, id) order; duplicate
    // scores split across a bin boundary BY ID (rows 5/6 share p=0.30)
    val df = (1 to 12).map { i =>
      val p = if (i == 6) 0.30 else i / 20.0 // i=6 duplicates i=5's score
      (i.toLong, p, i % 3 == 0)
    }.toDF("id", "p", "y")
    val bins = Stats.reliabilityBinsQuantile(df, "p", "y", "id", nBins = 4)
      .orderBy("bin").collect()
    assert(bins.map(_.getAs[Long]("bin")).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(bins.forall(_.getAs[Long]("n") == 3L)) // equal mass
    // bin ranges are observed data, non-overlapping and ordered
    val ranges = bins.map(r => (r.getAs[Long]("lo_micro"), r.getAs[Long]("hi_micro")))
    assert(ranges.sliding(2).forall { case Array(a, b) => a._2 <= b._1 })
    // the tie at p=0.30: id 5 and id 6 are ranks 5/6 -> both land in bin 1
    assert(ranges(1)._2 == 300000L)
    // hand-check one bin's stats: bin 0 holds p = .05/.10/.15, y at i=3
    assert(bins(0).getAs[Long]("conf_micro") == 100000L)
    assert(bins(0).getAs[Long]("n_pos") == 1L
      && bins(0).getAs[Long]("acc_micro") == 333333L)
    // deterministic under repartitioning (two-level ranks, exact sums)
    val rep = Stats.reliabilityBinsQuantile(df.repartition(7), "p", "y", "id", 4)
      .orderBy("bin").collect().map(_.toSeq).toSeq
    assert(rep == bins.map(_.toSeq).toSeq)
    intercept[IllegalArgumentException] {
      Stats.reliabilityBinsQuantile(df, "p", "y", "id", 0)
    }
  }

  test("isotonicCalibration: hand PAVA pooling, monotone pass-through, weighted pools") {
    // bins (by score decade): bin 1 rate .4 over 5 rows; bin 5 rate 1.0
    // over 1 row; bin 7 rate .4 over 5 rows. The 5→7 violation pools
    // count-weighted: (1·1.0 + 5·.4)/6 = .5 ≥ bin 1's .4, which passes.
    val df = Seq(
      (0.15, true), (0.15, false), (0.15, false), (0.18, false), (0.15, true),
      (0.55, true),
      (0.75, false), (0.78, true), (0.75, false), (0.75, true), (0.75, false)
    ).toDF("p", "y")
    val r = Stats.isotonicCalibration(df, "p", "y", nBins = 10)
      .orderBy("bin").collect()
      .map(x => (x.getAs[Long]("bin"), x.getAs[Long]("acc_micro"),
        x.getAs[Long]("iso_micro")))
    assert(r.toSeq == Seq(
      (1L, 400000L, 400000L),   // monotone start: untouched
      (5L, 1000000L, 500000L),  // violator pair pools, COUNT-weighted
      (7L, 400000L, 500000L)))
    // iso is non-decreasing by construction
    assert(r.map(_._3).toSeq == r.map(_._3).sorted.toSeq)
    // an already-monotone sequence is the identity
    val mono = Seq((0.1, false), (0.1, false), (0.5, true), (0.5, false),
      (0.9, true)).toDF("p", "y")
    val m = Stats.isotonicCalibration(mono, "p", "y").orderBy("bin").collect()
    assert(m.forall(x => x.getAs[Long]("iso_micro") == x.getAs[Long]("acc_micro")))
    // deterministic under repartitioning (exact prefix sums, integer minimax)
    val rep = Stats.isotonicCalibration(df.repartition(7), "p", "y")
      .orderBy("bin").collect().map(_.toSeq).toSeq
    assert(rep == Stats.isotonicCalibration(df, "p", "y")
      .orderBy("bin").collect().map(_.toSeq).toSeq)
    intercept[IllegalArgumentException] {
      Stats.isotonicCalibration(df, "p", "y", 1001)
    }
  }

  test("brierDecomposition: Murphy identity, perfectly-resolved case, empty nulls") {
    // the q240 fixture shape: bin .25 (4 rows, 1 pos), bin .95/1.0 (2 pos)
    val df = Seq((0.25, true), (0.25, false), (0.25, false), (0.25, false),
      (0.95, true), (1.0, true)).toDF("p", "y")
    val r = Stats.brierDecomposition(df, "p", "y", nBins = 10).collect()(0)
    assert(r.getAs[Long]("n_rows") == 6L && r.getAs[Long]("n_pos") == 3L)
    assert(r.getAs[Long]("ybar_micro") == 500000L)
    // hand: bin2 conf=acc=250000 -> rel term 0; bin9 conf 975000 acc 1e6
    // -> rel = 2*(25000)^2/6/1e6; res = (4*(250000-5e5)^2 + 2*(1e6-5e5)^2)/6/1e6
    assert(r.getAs[Long]("rel_micro") == math.round(2.0 * 25000 * 25000 / 6 / 1e6))
    val res = (4.0 * 250000 * 250000 + 2.0 * 500000 * 500000) / 6 / 1e6
    assert(r.getAs[Long]("res_micro") == math.round(res))
    assert(r.getAs[Long]("unc_micro") == 250000L) // .5 * .5
    // Murphy identity vs the direct Brier (quantized bins: exact here)
    val brier = Stats.calibrationSummary(df, "p", "y").collect()(0)
      .getAs[Long]("brier_micro")
    val murphy = r.getAs[Long]("rel_micro") - r.getAs[Long]("res_micro") +
      r.getAs[Long]("unc_micro")
    assert(math.abs(murphy - brier) <= 700L,
      s"identity drift beyond bin quantization: $murphy vs $brier")
    // perfectly resolved (every bin pure): RES == UNC, so Brier == REL
    val pure = Seq((0.1, false), (0.12, false), (0.9, true), (0.93, true))
      .toDF("p", "y")
    val pr = Stats.brierDecomposition(pure, "p", "y").collect()(0)
    assert(pr.getAs[Long]("res_micro") == pr.getAs[Long]("unc_micro"))
    // empty input: zero counts, null statistics
    val e = Stats.brierDecomposition(df.filter(col("p") > 2), "p", "y").collect()(0)
    assert(e.getAs[Long]("n_rows") == 0L && e.isNullAt(2) && e.isNullAt(3))
  }
}
