package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class GroupingSpec extends SparkTestBase {
  import spark.implicits._

  private def animals = Seq(
    ("Falcon", 380.0, 1L), ("Falcon", 370.0, 2L), ("Parrot", 24.0, 3L),
    ("Parrot", 26.0, 4L), ("Goose", 60.0, 5L)
  ).toDF("animal", "max_speed", "n")

  test("agg with (col, method) pairs, aliased <col>_<method>") {
    val out = Grouping.groupby(animals, Seq("animal"))
      .agg(Seq("max_speed" -> "mean", "max_speed" -> "median", "n" -> "sum"))
    assert(out.columns.toSeq == Seq("animal", "max_speed_mean", "max_speed_median", "n_sum"))
    val m = out.collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getLong(3))).toMap
    assert(m("Falcon") == ((375.0, 375.0, 3L)))
    assert(m("Parrot") == ((25.0, 25.0, 7L)))
    assert(m("Goose") == ((60.0, 60.0, 5L)))
  }

  test("default aggs apply to numeric columns only (divergence: ref concatenates strings)") {
    val withStr = animals.withColumn("tag", lit("x"))
    val out = Grouping.groupby(withStr, Seq("animal")).sum()
    assert(out.columns.toSeq == Seq("animal", "max_speed_sum", "n_sum")) // no tag_sum
  }

  test("median is exact (Spark >=3.4 built-in)") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 10.0)).toDF("k", "v")
    val out = Grouping.groupby(df, Seq("k")).median(Seq("v"))
    assert(out.head().getDouble(1) == 2.0)
  }

  test("medianByWindow matches built-in median on odd/even/null cases") {
    val df = Seq(("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(10.0)),
      ("b", Some(4.0)), ("b", Some(8.0)), ("b", None)).toDF("k", "v")
    val g = Grouping.groupby(df, Seq("k"))
    val win = g.medianByWindow("v").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val builtin = g.median(Seq("v")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(win == builtin && win == Map("a" -> 2.0, "b" -> 6.0))
  }

  test("agg Map overload (the reference dict signature)") {
    val out = Grouping.groupby(animals, Seq("animal"))
      .agg(Map("max_speed" -> "mean", "n" -> "sum"))
    assert(out.columns.toSet == Set("animal", "max_speed_mean", "n_sum"))
  }

  test("count and unknown-method error") {
    assert(Grouping.groupby(animals, Seq("animal")).count().count() == 3)
    intercept[IllegalArgumentException] {
      Grouping.groupby(animals, Seq("animal")).agg(Seq("n" -> "frobnicate"))
    }
  }

  test("iterate: per-group flatMapGroups analog of the reference's __iter__ (group.py:29-32)") {
    val out = Grouping.groupby(animals.select("animal", "max_speed"), Seq("animal"))
      .iterate { (keys, rows) =>
        var n = 0; var tot = 0.0
        rows.foreach { r => n += 1; tot += r.getDouble(1) }
        Iterator.single((keys.getString(0), n, tot))
      }.collect().toSet
    assert(out == Set(("Falcon", 2, 750.0), ("Parrot", 2, 50.0), ("Goose", 1, 60.0)))
  }

  test("iterate: multi-key groups with null keys, typed access by name") {
    val df = Seq((Some("a"), Some("x"), 1.0), (Some("a"), Some("x"), 2.0),
      (Some("a"), Some("y"), 3.0), (None, Some("x"), 4.0)).toDF("k1", "k2", "v")
    val out = Grouping.groupby(df, Seq("k1", "k2"))
      .iterate { (keys, rows) =>
        val k1 = if (keys.isNullAt(0)) "<null>" else keys.getAs[String]("k1")
        Iterator.single((s"$k1/" + keys.getAs[String]("k2"), rows.size))
      }
      .collect().toSet
    assert(out == Set(("a/x", 2), ("a/y", 1), ("<null>/x", 1)))
  }

  test("iterate: adversarial key VALUES stay distinct groups (VERDICT r2 #6)") {
    // the r2 string encoding corrupted: keys containing the U+0001 separator,
    // a literal "\u0000" string (collided with the null marker), and trailing
    // empty strings (String.split dropped them). All are honest values now.
    val df = Seq(
      (Some("a\u0001b"), Some("c"), 1L), // separator inside a key value
      (Some("a"), Some("b\u0001c"), 2L), // same joined form, different split
      (Some("\u0000"), Some("x"), 3L),   // literal U+0000 string, NOT null
      (None, Some("x"), 4L),             // actual null
      (Some("t"), Some(""), 5L),         // trailing empty-string key
      (Some("t"), None, 6L)              // trailing null key
    ).toDF("k1", "k2", "v")
    val out = Grouping.groupby(df, Seq("k1", "k2"))
      .iterate { (keys, rows) =>
        val parts = (0 until 2).map(i => if (keys.isNullAt(i)) null else keys.getString(i))
        Iterator.single((parts(0), parts(1), rows.map(_.getLong(2)).sum))
      }
      .collect().toSet
    // six distinct groups, none merged, every key readable verbatim
    assert(out == Set(
      ("a\u0001b", "c", 1L), ("a", "b\u0001c", 2L), ("\u0000", "x", 3L),
      (null, "x", 4L), ("t", "", 5L), ("t", null, 6L)))
  }

  test("corrExact: known r per group; degenerate groups null") {
    import spark.implicits._
    val d = Seq(
      ("a", 1.0, 2.0), ("a", 2.0, 4.0), ("a", 3.0, 6.0),   // perfectly linear: r = 1
      ("b", 1.0, 3.0), ("b", 2.0, 1.0), ("b", 3.0, 2.0),   // r = -0.5
      ("c", 1.0, 7.0), ("c", 2.0, 7.0),                    // zero variance in y -> null
      ("d", 5.0, 5.0)                                      // single row -> null
    ).toDF("k", "x", "y")
    val out = Grouping.groupby(d, Seq("k")).corrExact("x", "y")
      .orderBy("k").collect()
    assert(math.abs(out(0).getDouble(1) - 1.0) < 1e-12)
    assert(math.abs(out(1).getDouble(1) - (-0.5)) < 1e-12)
    assert(out(2).isNullAt(1) && out(3).isNullAt(1))
  }

  test("linregExact: recovers the exact line; degenerate groups null; null pairs skipped") {
    import spark.implicits._
    val d = Seq(
      ("a", Some(1.0), Some(3.0)), ("a", Some(2.0), Some(5.0)),
      ("a", Some(3.0), Some(7.0)),                       // y = 2x + 1 exactly
      ("b", Some(0.0), Some(4.0)), ("b", Some(2.0), Some(0.0)), // y = -2x + 4
      ("b", Some(1.0), None),                            // incomplete pair ignored
      ("c", Some(5.0), Some(1.0)), ("c", Some(5.0), Some(9.0)), // zero x-variance
      ("d", Some(1.0), Some(1.0))                        // single row
    ).toDF("k", "x", "y")
    val out = Grouping.groupby(d, Seq("k")).linregExact("x", "y")
      .orderBy("k").collect()
    assert(out(0).getDouble(1) == 2.0 && out(0).getDouble(2) == 1.0)
    assert(out(1).getDouble(1) == -2.0 && out(1).getDouble(2) == 4.0)
    assert(out(2).isNullAt(1) && out(2).isNullAt(2))     // vertical line: no fit
    assert(out(3).isNullAt(1) && out(3).isNullAt(2))
  }

  test("aggState: shard states fold to exactly the full-scan state; finalize derives mean") {
    import spark.implicits._
    val d1 = Seq(("a", Some(10L)), ("a", None), ("b", Some(7L))).toDF("g", "v")
    val d2 = Seq(("a", Some(30L)), ("b", Some(1L)), ("c", None)).toDF("g", "v")
    val full   = Grouping.aggState(d1.unionByName(d2), Seq("g"), Seq("v"))
    val merged = Grouping.mergeAggStates(Seq("g"),
      Grouping.aggState(d1, Seq("g"), Seq("v")),
      Grouping.aggState(d2, Seq("g"), Seq("v")))
    assert(merged.columns.toSeq == full.columns.toSeq)
    assert(merged.collect().toSet == full.collect().toSet) // fold ≡ rebuild
    val fin = Grouping.finalizeAggState(merged).orderBy("g").collect()
    assert(fin(0).getAs[Double]("v_mean") == 20.0)  // a: (10+30)/2, null skipped
    assert(fin(1).getAs[Double]("v_mean") == 4.0)   // b: (7+1)/2
    assert(fin(2).isNullAt(fin(2).fieldIndex("v_mean"))) // c: no non-null values
    assert(fin(2).getAs[Long]("n_rows") == 1L && fin(2).getAs[Long]("v_n") == 0L)
  }

  test("percentileDisc: value at rank ceil(p*n), nulls skipped, p=0 clamps to min") {
    val df = Seq(("a", Some(10L)), ("a", Some(20L)), ("a", Some(30L)), ("a", Some(40L)),
      ("a", None), ("b", Some(7L))).toDF("g", "v")
    def p(q: Double) = Grouping.groupby(df, Seq("g")).percentileDisc("v", q, "pv")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // n=4: ceil(.5*4)=2 → 20; ceil(.75*4)=3 → 30; ceil(.9*4)=4 → 40; p=0 → rank 1
    assert(p(0.5) == Map("a" -> 20L, "b" -> 7L))
    assert(p(0.75) == Map("a" -> 30L, "b" -> 7L))
    assert(p(0.9) == Map("a" -> 40L, "b" -> 7L))
    assert(p(0.0) == Map("a" -> 10L, "b" -> 7L))
    assert(p(1.0) == Map("a" -> 40L, "b" -> 7L))
    intercept[IllegalArgumentException](Grouping.groupby(df, Seq("g")).percentileDisc("v", 1.5))
  }

  test("percentilesDisc: one pass equals per-p percentileDisc; single agg plan") {
    val df = Seq(("a", Some(10L)), ("a", Some(20L)), ("a", Some(30L)), ("a", Some(40L)),
      ("a", None), ("b", Some(7L))).toDF("g", "v")
    val g = Grouping.groupby(df, Seq("g"))
    val multi = g.percentilesDisc("v", Seq(0.5 -> "p50", 0.9 -> "p90", 1.0 -> "pmax"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    def one(p: Double) = g.percentileDisc("v", p, "x")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(multi.keySet == Set("a", "b"))
    multi.foreach { case (k, (p50, p90, pmax)) =>
      assert(p50 == one(0.5)(k) && p90 == one(0.9)(k) && pmax == one(1.0)(k))
    }
    intercept[IllegalArgumentException](g.percentilesDisc("v", Nil))
    intercept[IllegalArgumentException](g.percentilesDisc("v", Seq(0.5 -> "x", 0.9 -> "x")))
    intercept[IllegalArgumentException](g.percentilesDisc("v", Seq(1.5 -> "x")))
  }

  test("percentileCont: type-7 interpolation matches numpy/pandas hand-values") {
    val df = Seq(("a", Some(10L)), ("a", Some(20L)), ("a", Some(30L)), ("a", Some(40L)),
      ("a", None), ("b", Some(7L))).toDF("g", "v")
    def p(q: Double) = Grouping.groupby(df, Seq("g")).percentileCont("v", q, "pv")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // n=4: h=(n−1)p → p=.5: h=1.5 → 20+0.5·10=25; p=.25: h=0.75 → 17.5;
    // p=1: h=3 → 40 (integral h: no vhi needed); singleton group → itself
    assert(p(0.5) == Map("a" -> 25.0, "b" -> 7.0))
    assert(p(0.25) == Map("a" -> 17.5, "b" -> 7.0))
    assert(p(1.0) == Map("a" -> 40.0, "b" -> 7.0))
    assert(p(0.0) == Map("a" -> 10.0, "b" -> 7.0))
    intercept[IllegalArgumentException](Grouping.groupby(df, Seq("g")).percentileCont("v", -0.1))
  }

  test("modeExact: most frequent value, ties break to the smallest") {
    val df = Seq(("a", Some(3L)), ("a", Some(3L)), ("a", Some(1L)),
      ("b", Some(5L)), ("b", Some(2L)), // tie: 5 and 2 both once → 2 wins
      ("c", None), ("c", Some(9L))).toDF("g", "v")
    val m = Grouping.groupby(df, Seq("g")).modeExact("v", "mv")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m == Map("a" -> 3L, "b" -> 2L, "c" -> 9L))
  }

  test("aggExprs accepts arbitrary Column aggregations") {
    val out = Grouping.groupby(animals, Seq("animal"))
      .aggExprs(countDistinct(col("max_speed")).as("nd"))
    assert(out.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      == Map("Falcon" -> 2L, "Parrot" -> 2L, "Goose" -> 1L))
  }

  test("trimmedMean: hand cut, outlier resistance, small groups untrimmed, tie-invariant") {
    import spark.implicits._
    // group a: 1..10 values with one wild outlier replacing 10 -> 1000
    // n=10, k=1: drop min(1) and max(1000), keep 2..9 -> mean 5.5
    val a = ((1L to 9L) :+ 1000L).map(("a", _)).toDF("g", "v")
    val ra = Grouping.trimmedMean(a, "g", "v").collect()(0)
    assert(ra.getAs[Long]("n_rows") == 10L && ra.getAs[Long]("n_kept") == 8L)
    assert(ra.getAs[Long]("tmean_micro") == 5500000L)
    // n < 10: k = 0, nothing trimmed -> plain mean
    val b = Seq(("b", 3L), ("b", 5L)).toDF("g", "v")
    val rb = Grouping.trimmedMean(b, "g", "v").collect()(0)
    assert(rb.getAs[Long]("n_kept") == 2L && rb.getAs[Long]("tmean_micro") == 4000000L)
    // ties straddling the cut: kept multiset invariant under partitioning
    val t = (Seq.fill(5)(("t", 7L)) ++ Seq.fill(5)(("t", 9L))).toDF("g", "v")
    val r1 = Grouping.trimmedMean(t, "g", "v").collect()(0).getAs[Long]("tmean_micro")
    val r2 = Grouping.trimmedMean(t.repartition(7), "g", "v").collect()(0)
      .getAs[Long]("tmean_micro")
    assert(r1 == r2 && r1 == 8000000L) // drop one 7 and one 9 -> mean 8
    // invalid trim fraction rejected
    intercept[IllegalArgumentException] {
      Grouping.trimmedMean(b, "g", "v", pNum = 1, pDen = 2)
    }
  }
}
