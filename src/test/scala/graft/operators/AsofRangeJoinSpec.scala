package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class AsofRangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  // trades (left) and quotes (right), keyed by sym, numeric ts
  private lazy val trades = Seq(
    ("a", 3L, 100.0), ("a", 7L, 101.0), ("a", 12L, 102.0),
    ("b", 5L, 200.0), ("c", 9L, 300.0)
  ).toDF("sym", "ts", "price")
  private lazy val quotes = Seq(
    ("a", 2L, 99.5), ("a", 7L, 100.5), ("a", 10L, 101.5),
    ("b", 6L, 199.5)
  ).toDF("sym", "ts", "quote")

  test("asofJoin backward: greatest right ts <= left ts, equal ts matches") {
    val out = Joins.asofJoin(trades, quotes, Seq("sym"), "ts")
      .select("sym", "ts", "ts_r", "quote")
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]), Option(r.get(3)).map(_.asInstanceOf[Double])))
      .toSet
    assert(out == Set(
      ("a", 3L, Some(2L), Some(99.5)),
      ("a", 7L, Some(7L), Some(100.5)), // tie: right row at exactly ts=7 matches
      ("a", 12L, Some(10L), Some(101.5)),
      ("b", 5L, None, None),            // only later quote exists
      ("c", 9L, None, None)))           // key never quoted
  }

  test("asofJoin forward: smallest right ts >= left ts") {
    val out = Joins.asofJoin(trades, quotes, Seq("sym"), "ts", direction = "forward")
      .select("sym", "ts", "ts_r")
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long])))
      .toSet
    assert(out == Set(
      ("a", 3L, Some(7L)), ("a", 7L, Some(7L)), ("a", 12L, None),
      ("b", 5L, Some(6L)), ("c", 9L, None)))
  }

  test("asofJoin nearest: closer of backward/forward, ties resolve backward") {
    val out = Joins.asofJoin(trades, quotes, Seq("sym"), "ts", direction = "nearest")
      .select("sym", "ts", "ts_r")
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long])))
      .toSet
    assert(out == Set(
      ("a", 3L, Some(2L)),  // back 2 (d1) vs fwd 7 (d4)
      ("a", 7L, Some(7L)),  // exact
      ("a", 12L, Some(10L)),// only backward exists
      ("b", 5L, Some(6L)),  // only forward exists
      ("c", 9L, None)))
    // tie: left at 5, rights at 4 and 6 -> backward (4) wins
    import trades.sparkSession.implicits._
    val l = Seq(("k", 5L)).toDF("sym", "ts")
    val r2 = Seq(("k", 4L, 1.0), ("k", 6L, 2.0)).toDF("sym", "ts", "q")
    val tie = Joins.asofJoin(l, r2, Seq("sym"), "ts", direction = "nearest")
      .select("ts_r").head().getLong(0)
    assert(tie == 4L)
    // tolerance composes with nearest
    val tol = Joins.asofJoin(trades, quotes, Seq("sym"), "ts",
        direction = "nearest", tolerance = Some(1L))
      .select("sym", "ts", "ts_r")
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]))).toSet
    assert(tol == Set(
      ("a", 3L, Some(2L)), ("a", 7L, Some(7L)), ("a", 12L, None),
      ("b", 5L, Some(6L)), ("c", 9L, None)))
  }

  test("asofJoin tolerance: matches farther than the bound are nulled") {
    val out = Joins.asofJoin(trades, quotes, Seq("sym"), "ts", tolerance = Some(1L))
      .select("sym", "ts", "ts_r")
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long])))
      .toSet
    // backward distances: (a,3)->2 is 1 (keep), (a,7)->7 is 0 (keep),
    // (a,12)->10 is 2 (drop)
    assert(out == Set(
      ("a", 3L, Some(2L)), ("a", 7L, Some(7L)), ("a", 12L, None),
      ("b", 5L, None), ("c", 9L, None)))
  }

  test("asofJoin plans one shuffle, no nested-loop or cartesian join") {
    val plan = Joins.asofJoin(trades, quotes, Seq("sym"), "ts")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
    assert(!plan.contains("SortMergeJoin")) // union+window, not a join at all
    // nearest evaluates two windows over the SAME key partitioning: still
    // exactly one hash exchange (the second ordering re-sorts in place)
    val near = Joins.asofJoin(trades, quotes, Seq("sym"), "ts", direction = "nearest")
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(near).size == 1, near)
    assert(!near.contains("BroadcastNestedLoopJoin") && !near.contains("SortMergeJoin"))
  }

  test("rangeJoin equals the naive inequality join") {
    val vals = (0 until 200).map(i => (i.toLong, i * 3.0 % 97)).toDF("id", "v")
    val ivs = Seq((1L, 0.0, 10.0), (2L, 5.0, 30.0), (3L, 90.0, 96.0), (4L, 50.0, 50.0))
      .toDF("iv_id", "lo", "hi")
    val got = Joins.rangeJoin(vals, "v", ivs, "lo", "hi", bucketWidth = 7.0)
      .select("id", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = vals.crossJoin(ivs)
      .filter(col("v") >= col("lo") && col("v") <= col("hi"))
      .select("id", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("rangeJoin plans an equi-join on the bucket key, not a cartesian") {
    val vals = (0 until 50).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val ivs = Seq((1L, 0.0, 10.0)).toDF("iv_id", "lo", "hi")
    val plan = Joins.rangeJoin(vals, "v", ivs, "lo", "hi", bucketWidth = 5.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }

  test("intervalJoin equals the naive overlap join, each pair exactly once") {
    // random-ish intervals with heavy mutual overlap and shared ends
    val l = (0 until 120).map(i => (i.toLong, (i * 7 % 50).toDouble, (i * 7 % 50 + i % 13).toDouble))
      .toDF("lid", "a_lo", "a_hi")
    val r = (0 until 80).map(i => (i.toLong, (i * 11 % 60).toDouble, (i * 11 % 60 + i % 9).toDouble))
      .toDF("rid", "b_lo", "b_hi")
    val got = Joins.intervalJoin(l, "a_lo", "a_hi", r, "b_lo", "b_hi", bucketWidth = 6.0)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1)))
    val want = l.crossJoin(r)
      .filter(col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi"))
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got.toSet == want && want.nonEmpty)
    assert(got.length == got.toSet.size) // exactly-once: no dedup pass needed
  }

  test("intervalJoin with equi keys restricts pairs to the key group") {
    val l = Seq(("u1", 0.0, 10.0, 1L), ("u2", 0.0, 10.0, 2L)).toDF("u", "a_lo", "a_hi", "lid")
    val r = Seq(("u1", 5.0, 15.0, 7L)).toDF("u", "b_lo", "b_hi", "rid")
    val out = Joins.intervalJoin(l, "a_lo", "a_hi", r, "b_lo", "b_hi",
        bucketWidth = 4.0, on = Seq("u"))
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(out == Set((1L, 7L)))
  }

  test("intervalJoin: touching endpoints match; inverted/null intervals drop") {
    val l = Seq((1L, Some(0.0), Some(5.0)), (2L, Some(9.0), Some(3.0)), (3L, None, Some(4.0)))
      .toDF("lid", "a_lo", "a_hi")
    val r = Seq((7L, 5.0, 8.0)).toDF("rid", "b_lo", "b_hi")
    val out = Joins.intervalJoin(l, "a_lo", "a_hi", r, "b_lo", "b_hi", bucketWidth = 2.0)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(out == Set((1L, 7L))) // [0,5] touches [5,8]; inverted + null drop
  }

  test("intervalJoin plans an equi-join on the bucket key, not a cartesian") {
    val l = (0 until 50).map(i => (i.toLong, i.toDouble, i + 2.0)).toDF("lid", "a_lo", "a_hi")
    val r = Seq((1L, 0.0, 10.0)).toDF("rid", "b_lo", "b_hi")
    val plan = Joins.intervalJoin(l, "a_lo", "a_hi", r, "b_lo", "b_hi", bucketWidth = 5.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }

  test("argument validation raises") {
    intercept[IllegalArgumentException] {
      Joins.asofJoin(trades, quotes, Seq("sym"), "ts", direction = "sideways")
    }
    intercept[IllegalArgumentException] {
      Joins.rangeJoin(trades, "price", quotes, "lo", "hi", bucketWidth = 0.0)
    }
    intercept[IllegalArgumentException] { // lo/hi clash with a left column name
      Joins.rangeJoin(trades.withColumnRenamed("price", "lo"), "ts",
        quotes.withColumnRenamed("quote", "lo"), "lo", "hi", 1.0)
    }
    intercept[IllegalArgumentException] { // reserved internal name on either side
      Joins.asofJoin(trades.withColumnRenamed("price", "__ts"), quotes, Seq("sym"), "ts")
    }
    intercept[IllegalArgumentException] {
      Joins.asofJoin(trades, quotes.withColumnRenamed("quote", "__m"), Seq("sym"), "ts")
    }
    intercept[IllegalArgumentException] {
      Joins.rangeJoin(trades.withColumnRenamed("price", "__bucket"), "ts",
        quotes, "lo", "hi", 1.0)
    }
    intercept[IllegalArgumentException] {
      Joins.saltedJoin(trades.withColumnRenamed("price", "__graft_salt"),
        quotes, Seq("sym"))
    }
  }

  test("asofJoin: null-ts left rows match nothing in BOTH directions") {
    val l = Seq(("a", Some(5L), 1.0), ("a", None, 2.0)).toDF("sym", "ts", "price")
    def matched(dir: String) =
      Joins.asofJoin(l, quotes, Seq("sym"), "ts", direction = dir)
        .collect().map(r => Option(r.get(1)).map(_.asInstanceOf[Long]) ->
          Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    assert(matched("backward") == Map(Some(5L) -> Some(2L), None -> None))
    assert(matched("forward") == Map(Some(5L) -> Some(7L), None -> None))
  }

  test("asofJoin on empty sides") {
    val empty = Seq.empty[(String, Long, Double)].toDF("sym", "ts", "quote")
    assert(Joins.asofJoin(trades, empty, Seq("sym"), "ts")
      .filter(col("ts_r").isNotNull).count() == 0)
    val emptyL = Seq.empty[(String, Long, Double)].toDF("sym", "ts", "price")
    assert(Joins.asofJoin(emptyL, quotes, Seq("sym"), "ts").count() == 0)
  }
}
