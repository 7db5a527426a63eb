package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.storage.StorageLevel

/** Market-basket association mining (Agrawal & Srikant 1994's support /
  * confidence framing; lift per Brin et al. 1997) over a (basket, item)
  * relation — the co-purchase / co-occurrence analytics the reference's
  * groupby+join surface gets composed into by hand. Distinct from
  * [[Lm.pmiCollocations]]: PMI reads ADJACENT token pairs inside
  * documents; this reads UNORDERED item pairs inside baskets, the
  * retail / recommendation shape.
  *
  * For an unordered pair {a, b} (canonical a < b) with basket counts
  * c_a, c_b, c_ab out of N baskets:
  *   support = c_ab/N,  confidence(a→b) = c_ab/c_a,  lift = c_ab·N/(c_a·c_b).
  * All counts are exact longs; each reported ratio is ONE double division
  * of exact integers, micro-quantized — engine-identical (the repo-wide
  * oracle contract). Output per pair: `item_a`, `item_b`, `n_ab`,
  * `n_a`, `n_b`, `support_micro`, `conf_ab_micro`, `conf_ba_micro`,
  * `lift_micro`, ordered nothing (caller sorts/limits).
  *
  * Scale shape — the Apriori downward-closure prune done relationally:
  * items below `minPairCount` baskets can never form a qualifying pair,
  * so the (basket, item) relation is FIRST semi-joined against the
  * frequent-item list (one hash-agg + one broadcastable-or-shuffled
  * join), and only then self-joined per basket (a < b). The per-basket
  * fan-out is C(k, 2) over FREQUENT items only — the cap that keeps a
  * power-law catalog from exploding; the final pair count is again
  * ≥ `minPairCount`-filtered. Everything is basket- or item-keyed
  * equi-joins and map-side-combined counts: no cartesian, no window, no
  * driver state. */
object Baskets {

  /** Persist + force-materialize (the [[Dedup]]/[[Similarity]] pin
    * discipline). */
  private def pin(df: DataFrame): DataFrame = {
    df.persist(StorageLevel.MEMORY_AND_DISK)
    df.count()
    df
  }

  def pairLift(rel: DataFrame, basketCol: String, itemCol: String,
      minPairCount: Long = 2L): DataFrame = {
    require(minPairCount >= 1L, "minPairCount must be >= 1")
    // bi feeds ~6 plan branches (N, item counts, both self-join sides,
    // both count joins): pin it rather than lean on ReuseExchange
    // canonicalization surviving AQE replans; released before return
    // (the result is eager — the Similarity-family contract)
    val bi = pin(rel
      .filter(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .select(col(basketCol).as("__bk"), col(itemCol).as("__it"))
      .distinct()) // presence, not multiplicity — the basket-count model
    val n = bi.agg(countDistinct(col("__bk")).as("__n"))
    val itemCounts = pin(bi.groupBy(col("__it"))
      .agg(count(lit(1)).as("__ic")))
    // downward closure: an item in < minPairCount baskets cannot reach it
    // as a pair — prune BEFORE the per-basket self-join
    val frequent = bi.join(
      itemCounts.filter(col("__ic") >= minPairCount).select(col("__it")),
      Seq("__it"))
    val pairs = frequent.as("l")
      .join(frequent.as("r"), col("l.__bk") === col("r.__bk")
        && col("l.__it") < col("r.__it"))
      .groupBy(col("l.__it").as("item_a"), col("r.__it").as("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairCount)
    val mic = (x: org.apache.spark.sql.Column) =>
      round(x * 1e6).cast(LongType)
    val out = pairs
      .join(itemCounts.select(col("__it").as("item_a"), col("__ic").as("n_a")),
        Seq("item_a"))
      .join(itemCounts.select(col("__it").as("item_b"), col("__ic").as("n_b")),
        Seq("item_b"))
      .crossJoin(broadcast(n))
      .select(col("item_a"), col("item_b"), col("n_ab"), col("n_a"), col("n_b"),
        mic(col("n_ab").cast("double") / col("__n").cast("double"))
          .as("support_micro"),
        mic(col("n_ab").cast("double") / col("n_a").cast("double"))
          .as("conf_ab_micro"),
        mic(col("n_ab").cast("double") / col("n_b").cast("double"))
          .as("conf_ba_micro"),
        mic(col("n_ab").cast("double") * col("__n").cast("double")
          / (col("n_a").cast("double") * col("n_b").cast("double")))
          .as("lift_micro"))
      .localCheckpoint(true)
    itemCounts.unpersist(false)
    bi.unpersist(false)
    out
  }
}
