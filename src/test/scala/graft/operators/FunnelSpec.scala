package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[Sequences.funnelWithin]] at funnel depth ≥ 5 (VERDICT r12 #1): the
  * per-step bands are `localCheckpoint(true)`-pinned, so building + reading
  * an S-step funnel scans the event input exactly S times — the lazy
  * `scanLeft` chain replayed each step's full prefix, S(S+1)/2 scans. The
  * scan count is pinned with a row-read accumulator planted UNDER the
  * funnel's projections (a map barrier no filter pushes through), so every
  * full pass over the input adds exactly n rows. */
case class FunnelEv(k: String, st: String, t: Long)

class FunnelSpec extends SparkTestBase {
  import spark.implicits._

  private type Ev = FunnelEv
  private def Ev(k: String, st: String, t: Long) = FunnelEv(k, st, t)

  test("funnelWithin S=5: correctness + exactly S input scans (pinned bands)") {
    // users A..D walk a 5-step funnel with within=100µs per step:
    //  A converts all 5 (delays 10,20,30,40)
    //  B stalls after step 3 (s4 arrives 101µs after its s3 — misses)
    //  C converts to step 4 (delays 50,50,50), never sees s5
    //  D only signs up
    val rows = Seq(
      Ev("A", "s1", 0L), Ev("A", "s2", 10L), Ev("A", "s3", 30L),
      Ev("A", "s4", 60L), Ev("A", "s5", 100L),
      Ev("B", "s1", 0L), Ev("B", "s2", 40L), Ev("B", "s3", 80L),
      Ev("B", "s4", 181L),
      Ev("C", "s1", 0L), Ev("C", "s2", 50L), Ev("C", "s3", 100L),
      Ev("C", "s4", 150L),
      Ev("D", "s1", 0L))
    val n = rows.length.toLong
    val scans = spark.sparkContext.longAccumulator("funnel-ev-rows-read")
    val ev = rows.toDS().map { e => scans.add(1); e }.toDF("k", "st", "t")
    val steps = Seq("s1", "s2", "s3", "s4", "s5")

    scans.reset()
    val out = Sequences.funnelWithin(ev, "k", "st", "t", steps, withinUs = 100L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    assert(out.toSeq == Seq(
      (1L, "s1", 4L, None),
      (2L, "s2", 3L, Some(33L)),   // mean(10, 40, 50) = 33.33 -> 33
      (3L, "s3", 3L, Some(37L)),   // mean(20, 40, 50) = 36.67 -> 37
      (4L, "s4", 2L, Some(40L)),   // mean(30, 50) = 40
      (5L, "s5", 1L, Some(40L)))) // A's 100 - 60
    // the pinned bands mean the input was scanned once per step — S·n rows
    // read in total, not the lazy chain's S(S+1)/2·n (= 15n at S = 5)
    assert(scans.value == steps.length * n,
      s"expected ${steps.length} input scans (= ${steps.length * n} rows), " +
        s"got ${scans.value} rows read")
  }
}
