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
}
