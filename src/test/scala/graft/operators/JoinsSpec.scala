package graft.operators

import graft.SparkTestBase

class JoinsSpec extends SparkTestBase {
  import spark.implicits._

  private def left = Seq((1, "a", 10.0), (1, "b", 11.0), (2, "c", 12.0), (4, "d", 13.0))
    .toDF("id", "tag", "x")
  private def right = Seq((1, "R1", 1.0), (2, "R2", 2.0), (2, "R3", 3.0), (3, "R4", 4.0))
    .toDF("id", "name", "x")

  test("inner join: cartesian per duplicate key (lc*rc multiplicity, cjoin.pyx semantics)") {
    val out = Joins.join(left, right, Seq("id"))
    assert(out.count() == 2 * 1 + 1 * 2) // id=1: 2*1, id=2: 1*2
  }

  test("duplicate non-key columns: left wins, right's dropped (join.py:7-13)") {
    val out = Joins.join(left, right, Seq("id"))
    assert(out.columns.toSeq == Seq("id", "tag", "x", "name")) // x from left only
    assert(out.filter($"id" === 1 && $"tag" === "a").head().getDouble(2) == 10.0)
  }

  test("left/right/full/semi/anti/cross row counts") {
    assert(Joins.join(left, right, Seq("id"), "left").count() == 5)  // 4 matched + d
    assert(Joins.join(left, right, Seq("id"), "right").count() == 5) // 4 matched + R4
    assert(Joins.join(left, right, Seq("id"), "full").count() == 6)
    assert(Joins.join(left, right, Seq("id"), "semi").count() == 3)  // a,b,c
    assert(Joins.join(left, right, Seq("id"), "anti").count() == 1)  // d
    assert(Joins.join(left, right, Nil, "cross").count() == 16)
    intercept[IllegalArgumentException] { Joins.join(left, right, Seq("id"), "sideways") }
  }

  test("property: inner-join row count equals sum of lc*rc over shared keys (10 seeded cases)") {
    val rnd = new scala.util.Random(42)
    (1 to 10).foreach { _ =>
      val lk = List.fill(30)(rnd.nextInt(9))
      val rk = List.fill(30)(rnd.nextInt(9))
      val l = lk.zipWithIndex.toDF("k", "lv")
      val r = rk.zipWithIndex.toDF("k", "rv")
      val expected = lk.groupBy(identity).map { case (k, ls) =>
        ls.size.toLong * rk.count(_ == k)
      }.sum
      assert(Joins.join(l, r, Seq("k")).count() == expected)
    }
  }
}
