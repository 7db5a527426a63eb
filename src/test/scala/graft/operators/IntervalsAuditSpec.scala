package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Interval-set algebra, keyed table reconciliation, Markov transitions,
  * and k-core peeling. */
class IntervalsAuditSpec extends SparkTestBase {
  import spark.implicits._

  test("mergeIntervals: overlap and abutment merge, gaps split, empties drop") {
    val df = Seq(
      ("u", 0L, 10L), ("u", 5L, 15L),   // overlap -> [0,15)
      ("u", 15L, 20L),                  // abuts   -> [0,20)
      ("u", 30L, 40L),                  // gap     -> new run
      ("u", 33L, 34L),                  // contained
      ("v", 7L, 7L),                    // empty: dropped
      ("v", 1L, 2L)
    ).toDF("k", "lo", "hi")
    val out = Intervals.mergeIntervals(df, "k", "lo", "hi")
      .collect().map(r => (r.getAs[String]("k"), r.getAs[Long]("merged_lo"),
        r.getAs[Long]("merged_hi"), r.getAs[Long]("n_source"))).toSet
    assert(out == Set(("u", 0L, 20L, 3L), ("u", 30L, 40L, 2L), ("v", 1L, 2L, 1L)))
  }

  test("coverage: overlap counted once; gap = span - covered; partition-independent") {
    val df = Seq(("u", 0L, 10L), ("u", 5L, 15L), ("u", 20L, 30L)).toDF("k", "lo", "hi")
    val r = Intervals.coverage(df, "k", "lo", "hi").collect()(0)
    assert(r.getAs[Long]("n_runs") == 2L)
    assert(r.getAs[Long]("covered") == 25L) // [0,15) + [20,30)
    assert(r.getAs[Long]("span") == 30L && r.getAs[Long]("gap") == 5L)
    val p = Intervals.coverage(df.repartition(5), "k", "lo", "hi").collect()(0)
    assert(p.getAs[Long]("covered") == 25L && p.getAs[Long]("n_runs") == 2L)
  }

  test("tableDiff: insert/delete/change/same classified; null-safe compare; one-sided columns ignored") {
    val a = Seq((1L, "x", Some(1.0)), (2L, "y", None), (3L, "z", Some(3.0)))
      .toDF("id", "s", "v")
    val b = Seq((1L, "x", Some(1.0)),          // same (null-safe on v)
      (2L, "y", Some(9.0)),                    // changed: None -> 9.0
      (4L, "w", Some(4.0)))                    // inserted; 3 deleted
      .toDF("id", "s", "v")
    val out = Audit.tableDiff(a, b.withColumn("extra", lit(1)), Seq("id"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("diff_status")).toMap
    assert(out == Map(1L -> "same", 2L -> "changed", 3L -> "only_a", 4L -> "only_b"))
    val sum = Audit.diffSummary(a, b, Seq("id"))
      .collect().map(r => r.getAs[String]("diff_status") -> r.getAs[Long]("n_keys")).toMap
    assert(sum == Map("same" -> 1L, "changed" -> 1L, "only_a" -> 1L, "only_b" -> 1L))
  }

  test("transitionCounts: lead pairing per key, exact row-normalized probabilities") {
    // user 1: a->b->a->b ; user 2: b->b  (ties broken by id)
    val ev = Seq(
      (1L, "a", 10L, 100L), (1L, "b", 20L, 101L), (1L, "a", 30L, 102L), (1L, "b", 40L, 103L),
      (2L, "b", 10L, 200L), (2L, "b", 10L, 201L)
    ).toDF("u", "st", "t", "id")
    val out = Sequences.transitionCounts(ev, "u", "st", "t", "id")
      .collect().map(r => (r.getAs[String]("from_state"), r.getAs[String]("to_state")) ->
        ((r.getAs[Long]("n_trans"), r.getAs[Long]("p_micro")))).toMap
    // from a: 2x a->b (p=1); from b: 1x b->a, 1x b->b (p=1/2 each)
    assert(out(("a", "b")) == ((2L, 1000000L)))
    assert(out(("b", "a")) == ((1L, 500000L)))
    assert(out(("b", "b")) == ((1L, 500000L)))
    assert(out.size == 3)
  }

  test("kCore: triangle+tail peels to the triangle; k above max degree empties; converged early") {
    // triangle 1-2-3 plus a tail 3-4: 2-core = the triangle
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("s", "d")
    val out = Graph.kCore(e, "s", "d", k = 2, rounds = 4)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("deg")).toMap
    assert(out == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // extra rounds past convergence are no-ops
    val more = Graph.kCore(e, "s", "d", k = 2, rounds = 6)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("deg")).toMap
    assert(more == out)
    // k = 3 on a triangle-with-tail: no 3-core survives
    assert(Graph.kCore(e, "s", "d", k = 3, rounds = 3).count() == 0L)
    // duplicate / reversed / self-loop edges are canonicalized first
    val messy = Seq((2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L), (1L, 1L)).toDF("s", "d")
    val m = Graph.kCore(messy, "s", "d", k = 2, rounds = 2)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("deg")).toMap
    assert(m == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }
}
