package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Ordered-sequence statistics over keyed event streams (✚ extension
  * surface) — the behavioral-modeling sibling of [[Lm]]'s token
  * statistics: where Lm reads documents as bags/sequences of words,
  * these read a user's event history as a sequence of states.
  *
  * All counts are exact longs; probabilities are one fixed shared
  * division tree, micro-quantized (the repo-wide oracle contract). */
object Sequences {

  /** First-order Markov transition matrix over per-key event sequences:
    * order each key's events by (ts, id), pair each state with its
    * successor via a key-partitioned `lead`, count (from, to) pairs, and
    * row-normalize to transition probabilities. The id column breaks
    * timestamp ties deterministically (same contract as the q45 funnel).
    * Output per (from_state, to_state): `n_trans`,
    * `p_micro` = round(n_trans/row_total × 10⁶).
    *
    * Scale shape: ONE shuffle (partition by key), the successor pairing
    * inside the key partition, then a map-side-combined count over the
    * (|states|²)-sized transition domain and a state-keyed join for row
    * totals — never data-sized after the first agg. */
  def transitionCounts(events: DataFrame, keyCol: String, stateCol: String,
      tsCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    val pairs = events
      .filter(col(keyCol).isNotNull && col(stateCol).isNotNull)
      .withColumn("__to", lead(col(stateCol), 1).over(w))
      .filter(col("__to").isNotNull)
      .groupBy(col(stateCol).as("from_state"), col("__to").as("to_state"))
      .agg(count(lit(1)).as("n_trans"))
    val totals = pairs.groupBy(col("from_state"))
      .agg(sum(col("n_trans")).as("row_total"))
    pairs.join(totals, Seq("from_state"))
      .select(col("from_state"), col("to_state"), col("n_trans"),
        round(col("n_trans").cast("double") / col("row_total").cast("double") * 1e6)
          .cast(LongType).as("p_micro"))
  }

  /** Raw (from, to) successor pairs per key — [[transitionCounts]] without
    * the normalization, reused by the incremental fold. `tsCol` must be an
    * integer column (pre-convert timestamps with `unix_micros`). */
  private def successorPairs(events: DataFrame, keyCol: String,
      stateCol: String, tsCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    events
      .filter(col(keyCol).isNotNull && col(stateCol).isNotNull)
      .withColumn("__to", lead(col(stateCol), 1).over(w))
      .filter(col("__to").isNotNull)
      .groupBy(col(stateCol).as("from_state"), col("__to").as("to_state"))
      .agg(count(lit(1)).as("n_trans"))
  }

  /** Standing transition-matrix state from a batch of history: the
    * aggregated (from, to) counts plus each key's LAST event — the only
    * per-key carry the next ingest needs to stitch its first transition.
    * State is (counts, lasts); both are small: |states|² and |keys| rows. */
  def transitionState(events: DataFrame, keyCol: String, stateCol: String,
      tsCol: String, idCol: String): (DataFrame, DataFrame) = {
    val counts = successorPairs(events, keyCol, stateCol, tsCol, idCol)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).desc, col(idCol).desc)
    val lasts = events
      .filter(col(keyCol).isNotNull && col(stateCol).isNotNull)
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select(col(keyCol), col(stateCol), col(tsCol), col(idCol))
    (counts, lasts)
  }

  /** Incremental transition ingest: fold a strictly-later batch into a
    * standing (counts, lasts) state WITHOUT re-reading history. Each key's
    * carried last event seeds its batch sequence, so the boundary
    * transition (last old → first new) is counted exactly once; pairs
    * inside the batch count normally; nothing already-counted is touched.
    * Precondition (the q145-upsert delta contract): every batch event of a
    * key orders (ts, id)-after that key's carried last event. Returns the
    * updated (counts, lasts).
    *
    * Scale shape: the corpus-sized history is NEVER re-scanned — one
    * key-partitioned window over (batch + one carried row per touched
    * key), one map-side-combined count, one |states|²-row merge agg, one
    * keyed window for the new lasts. This is the [[transitionCounts]]
    * throughput shape with the data-sized input replaced by the delta. */
  def ingestTransitions(counts: DataFrame, lasts: DataFrame, batch: DataFrame,
      keyCol: String, stateCol: String, tsCol: String,
      idCol: String): (DataFrame, DataFrame) = {
    val cleanBatch = batch
      .filter(col(keyCol).isNotNull && col(stateCol).isNotNull)
      .select(col(keyCol), col(stateCol), col(tsCol), col(idCol))
    // seed only the keys the batch touches (left_semi: carried rows for
    // untouched keys would add no pair and no new last)
    val seeds = lasts.join(cleanBatch.select(col(keyCol)).distinct(),
      Seq(keyCol), "left_semi")
    val stitched = seeds.unionByName(cleanBatch)
    val newPairs = successorPairs(stitched, keyCol, stateCol, tsCol, idCol)
    val mergedCounts = counts.unionByName(newPairs)
      .groupBy(col("from_state"), col("to_state"))
      .agg(sum(col("n_trans")).as("n_trans"))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).desc, col(idCol).desc)
    val newLasts = lasts.unionByName(cleanBatch)
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select(col(keyCol), col(stateCol), col(tsCol), col(idCol))
    (mergedCounts, newLasts)
  }

  /** Time-weighted mean of an integer-valued measure per key — each
    * event's value HOLDS until the key's next event (the metrics/pricing
    * reading of an event stream; a plain mean over-weights bursts). With
    * hold durations d_i = ts_{i+1} − ts_i (the key's last event holds
    * nothing), twm = Σ v_i·d_i / Σ d_i. The v·d products accumulate in
    * Decimal(38,0) (micro-epoch × value overflows a long at fleet scale);
    * the single final division is the engine-shared double tree,
    * micro-quantized. Keys with fewer than two events emit no row (no
    * hold exists — group-by semantics). Output per key: `n_holds`,
    * `held_us` (= Σd, exact), `twm_micro`.
    *
    * Scale shape: ONE shuffle (partition by key), the successor duration
    * from a key-partitioned `lead`, one map-side-combined agg. */
  def timeWeightedMean(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__t"), col(idCol))
    val dec = DecimalType(38, 0)
    events
      .filter(col(keyCol).isNotNull && col(valueCol).isNotNull)
      .select(col(keyCol), col(valueCol).cast(LongType).as("__v"),
        col(tsCol).cast(LongType).as("__t"), col(idCol))
      .withColumn("__dur", lead(col("__t"), 1).over(w) - col("__t"))
      .filter(col("__dur").isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_holds"),
        sum(col("__dur")).as("held_us"),
        sum(col("__v").cast(dec) * col("__dur").cast(dec)).as("__vd"))
      .select(col(keyCol), col("n_holds"), col("held_us"),
        // all-zero holds (a same-timestamp burst): no weighted mean exists
        when(col("held_us") > 0,
          round(col("__vd").cast("double") / col("held_us").cast("double") * 1e6)
            .cast(LongType)).as("twm_micro"))
  }
}
