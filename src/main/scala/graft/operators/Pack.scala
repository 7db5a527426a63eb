package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data assembly (north-star extension): group
  * documents into fixed-token-budget context bins, the step that turns a
  * curated corpus into model-ready sequences.
  *
  * Packing is greedy-by-running-total WITH boundary straddling: documents
  * are taken in `orderCol` order within each shard and a document is
  * assigned to bin `floor(exclusive_running_tokens / budget)` — so a
  * document that crosses a budget boundary belongs wholly to the bin where
  * it starts, and a bin can overrun by at most one document (the trainer
  * truncates or wraps the tail; this is the standard streaming-packing
  * approximation — exact first-fit packing is inherently sequential and
  * would serialize the corpus through one task). Deterministic: a pure
  * window computation over (shard, order), identical on any engine/cluster
  * PROVIDED `orderCol` is unique within each shard (a doc id, not a
  * timestamp with ties — tied rows make the running sum order-dependent).
  *
  * Scale shape: ONE window per shard — partition by the shard column so no
  * global sort exists; shards (e.g. [[Ops.shardByHash]] output, one per
  * output file) parallelize packing across executors. Skew caveat: one
  * shard = one task's sort; size shards accordingly. */
object Pack {

  /** Assign each row a `bin` within its shard: rows sorted by `orderCol`,
    * bin = exclusive-prefix-sum(tokensCol) / budget (integer floor).
    * Output: input columns + `bin_tokens_before` (the exclusive prefix sum,
    * useful for intra-bin offsets) + `bin`. */
  def packSequences(
      df: DataFrame, shardCol: String, orderCol: String,
      tokensCol: String, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy(col(shardCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("bin_tokens_before",
        coalesce(sum(col(tokensCol)).over(w), lit(0L)))
      .withColumn("bin", floor(col("bin_tokens_before") / lit(budget)))
  }
}
