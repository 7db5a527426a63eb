package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.Text

/** DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS
  * 2023): given a small TARGET corpus (the distribution you want) and a big
  * RAW corpus (the crawl), score every raw document by the log importance
  * ratio of two hashed-n-gram bag models and resample proportionally to the
  * ratio — the principled version of "pick crawl pages that look like the
  * target domain", and the selection method behind several public LLM
  * pretraining datasets. North-star extension surface next to
  * [[Lm.domainKl]] (which audits domain MIX; this SELECTS documents).
  *
  * Features are hashed n-grams: unigrams + bigrams of the normalized
  * tokens, bucketed by the 60-bit md5 hash modulo `buckets` (the same
  * oracle-replayable hash family the suite uses everywhere; DSIR's own
  * implementation also hash-buckets n-grams — collisions are part of the
  * METHOD, not an implementation shortcut). Both corpus models are add-one
  * smoothed over the bucket space:
  *   log w(d) = Σ_b c_d(b) · [ln((ct_b+1)/(Ct+B)) − ln((cr_b+1)/(Cr+B))]
  * with ct/cr the target/raw bucket totals, Ct/Cr their sums, B buckets.
  *
  * Determinism at scale ([[Lm]]'s quantize-then-sum contract): each
  * (doc, bucket) term is ONE fixed-shape double expression — the four-ln
  * tree mirrors q94's — rounded once to integer micro-nats, so the
  * per-document log-weight is an exact long sum, identical on any engine
  * or partitioning. Resampling is Efraimidis–Spirakis in LOG space:
  * A-ES keeps the k largest u^(1/w); with w = exp(logw) spanning thousands
  * of nats, u^(1/w) and ln(u)/w both over/underflow, but the ORDER is
  * preserved by the key ln(−ln u) − logw (ascending), which stays finite
  * because u is capped strictly inside (0, 1) — u is the (idHash60+1)/2^60
  * uniform ([[Ops.sampleWeighted]]'s) capped at 1−2⁻⁵³ (the 60-bit→double
  * cast can round the top hash value to exactly 1.0), so the
  * selected set is a pure function of (id, logw): deterministic,
  * oracle-replayable, and a no-shuffle TakeOrdered.
  *
  * Scale shape: two explode+hash-agg feature passes (shuffled volume is
  * bounded by `buckets` for the models and by per-doc DISTINCT buckets for
  * the doc vectors); the scoring join is keyed on the bucket (≤ B rows on
  * the model side — AQE broadcasts it); the Ct/Cr scalars ride along as
  * broadcast single-row cross joins. No step touches the driver. */
object Dsir {

  /** Hashed n-gram bucket counts per document: unigrams + bigrams of the
    * normalized tokens, md5-60-bit-hashed modulo `buckets`.
    * Output: (id, bucket, c) — one row per distinct bucket per doc. */
  def hashedNgramCounts(df: DataFrame, idCol: String, textCol: String,
      buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val base = Par.spread(df).select(col(idCol).as("id"),
      Text.tokens(Text.normalize(col(textCol))).as("__t"))
    val uni = base.select(col("id"), explode(col("__t")).as("f"))
    val bi = base.filter(size(col("__t")) >= 2)
      .select(col("id"), explode(zip_with(
        slice(col("__t"), lit(1), size(col("__t")) - lit(1)),
        slice(col("__t"), lit(2), size(col("__t")) - lit(1)),
        (a, b) => concat(a, lit(" "), b))).as("f"))
    uni.unionByName(bi)
      .select(col("id"),
        pmod(conv(substring(md5(col("f")), 1, 15), 16, 10).cast(LongType),
          lit(buckets.toLong)).as("bucket"))
      .groupBy("id", "bucket").agg(count(lit(1)).as("c"))
  }

  /** Per-raw-document importance log-weights against the target model.
    * Output: idCol, n_feats (long — n-gram instances), logw_micro (long —
    * 1e6 × ln w(d), exact by the quantize-then-sum contract). Documents
    * with no tokens are absent (no features ⇒ no evidence). */
  def importanceWeights(raw: DataFrame, target: DataFrame,
      idCol: String, textCol: String, buckets: Int = 65536): DataFrame = {
    val fr = hashedNgramCounts(raw, idCol, textCol, buckets)
    val tb = hashedNgramCounts(target, idCol, textCol, buckets)
      .groupBy("bucket").agg(sum(col("c")).as("ct"))
    val rb = fr.groupBy("bucket").agg(sum(col("c")).as("cr"))
    val tTot = tb.agg(coalesce(sum(col("ct")), lit(0L)).as("tot_t"))
    val rTot = rb.agg(coalesce(sum(col("cr")), lit(0L)).as("tot_r"))
    val b = lit(buckets.toLong)
    // q94's four-ln fixed tree, rounded ONCE per (doc, bucket) — buckets
    // absent from the target take the add-one floor via coalesce(ct, 0)
    val term = round((log(coalesce(col("ct"), lit(0L)) + lit(1))
      - log(col("tot_t") + b)
      - log(col("cr") + lit(1))
      + log(col("tot_r") + b)) * col("c") * lit(1000000L)).cast(LongType)
    fr.join(tb, Seq("bucket"), "left")
      .join(rb, Seq("bucket"))
      .crossJoin(broadcast(tTot))
      .crossJoin(broadcast(rTot))
      .select(col("id"), col("c"), term.as("tm"))
      .groupBy("id")
      .agg(sum(col("c")).as("n_feats"), sum(col("tm")).as("logw_micro"))
      .withColumnRenamed("id", idCol)
  }

  /** Resample `k` documents without replacement, inclusion ∝ exp(logw):
    * A-ES in log space (see object doc). `weights` is
    * [[importanceWeights]]' output (or anything with idCol + logw_micro).
    * TakeOrdered — per-partition heaps, never a global sort. */
  def resampleTopK(weights: DataFrame, idCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    // capped strictly below 1.0 (ADVICE r6): at idHash60 = 2^60−1 the
    // 60-bit→double cast rounds (h+1)/2^60 up to exactly 1.0, where
    // log(-log(1.0)) = log(0) goes NULL in Spark (nulls-first ⇒ the row
    // would be unconditionally selected) and errors in DuckDB. least()
    // with the largest double < 1 keeps the inner -log strictly positive;
    // both engines apply the identical cap and identical rounding.
    val u = least(
      (Ops.idHash60(col(idCol)) + lit(1L)).cast("double") / lit(math.pow(2.0, 60)),
      lit(1.0 - math.pow(2.0, -53)))
    weights
      .withColumn("__graft_dsirkey", log(-log(u)) - col("logw_micro") / lit(1000000.0))
      .orderBy(col("__graft_dsirkey").asc, col(idCol))
      .limit(k)
      .drop("__graft_dsirkey")
  }

  /** The composed selection: weigh every raw doc against the target model,
    * keep the importance-resampled top `k`. */
  def select(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, k: Int, buckets: Int = 65536): DataFrame =
    resampleTopK(importanceWeights(raw, target, idCol, textCol, buckets), idCol, k)
}
