package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Market-basket lift: hand-traced support/confidence/lift, the Apriori
  * item prune, presence (not multiplicity) semantics. */
class BasketsSpec extends SparkTestBase {
  import spark.implicits._

  test("pairLift: hand values, min-count prune, duplicate rows collapse") {
    // b1{a,b,c} b2{a,b} b3{a,c} b4{a,d}; a duplicated in b1 (must collapse)
    val rel = Seq((1L, "a"), (1L, "a"), (1L, "b"), (1L, "c"),
      (2L, "a"), (2L, "b"), (3L, "a"), (3L, "c"), (4L, "a"), (4L, "d"))
      .toDF("bk", "it")
    val got = Baskets.pairLift(rel, "bk", "it", minPairCount = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7), r.getLong(8))).toMap
    // N=4, c_a=4, c_b=2, c_c=2; ab=2, ac=2; bc=1 pruned by the pair
    // filter; d (1 basket) pruned by the ITEM filter before pairing
    assert(got.keySet == Set(("a", "b"), ("a", "c")))
    // ab: support 2/4, conf a->b 2/4, conf b->a 2/2, lift 2*4/(4*2)=1
    assert(got(("a", "b")) ==
      (2L, 4L, 2L, 500000L, 500000L, 1000000L, 1000000L))
    assert(got(("a", "c")) ==
      (2L, 4L, 2L, 500000L, 500000L, 1000000L, 1000000L))
    // lift > 1 when the pair beats independence: two perfectly-coupled
    // items in half the baskets
    val coupled = Seq((1L, "x"), (1L, "y"), (2L, "x"), (2L, "y"),
      (3L, "z"), (4L, "z")).toDF("bk", "it")
    val l = Baskets.pairLift(coupled, "bk", "it", 2).collect()
    assert(l.length == 1 && l.head.getLong(8) == 2000000L) // 2*4/(2*2)
    // partition invariance: exact counts + one shared division tree
    val rep = Baskets.pairLift(rel.repartition(5), "bk", "it", 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(8))).toSet
    assert(rep == got.map { case ((a, b), v) => (a, b, v._7) }.toSet)
  }

  test("pairLift: maxBasketItems caps the per-basket fan-out deterministically") {
    // one mega-basket of 40 items, each item frequent (also in its own
    // 2nd basket so the item prune keeps everything)
    val mega = (1 to 40).flatMap(i => Seq((0L, s"i$i"), (i.toLong, s"i$i")))
      .toDF("bk", "it")
    // uncapped (cap above basket size): all C(40,2) pairs co-occur once —
    // none reach minPairCount 2, so the pair filter empties the output,
    // but the intermediate fan-out existed; with minPairCount 1 we see it
    val full = Baskets.pairLift(mega, "bk", "it", minPairCount = 1,
      maxBasketItems = 64)
    assert(full.count() == 40L * 39L / 2L)
    // capped at 8: exactly C(8,2) pairs survive, from the 8 items with
    // the smallest (idHash60, item) — rerunning yields the identical set
    val c1 = Baskets.pairLift(mega, "bk", "it", minPairCount = 1,
      maxBasketItems = 8).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(c1.size == 8 * 7 / 2)
    val c2 = Baskets.pairLift(mega.repartition(7), "bk", "it",
        minPairCount = 1, maxBasketItems = 8).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(c1 == c2) // deterministic under any partitioning
    // marginals stay EXACT under the cap: every reported n_a is the item's
    // true basket count (2), untouched by the co-occurrence sampling
    val marg = Baskets.pairLift(mega, "bk", "it", minPairCount = 1,
      maxBasketItems = 8).select("n_a", "n_b").collect()
    assert(marg.forall(r => r.getLong(0) == 2L && r.getLong(1) == 2L))
  }
}
