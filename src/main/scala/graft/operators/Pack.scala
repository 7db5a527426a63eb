package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.Text

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

  /** Sliding-window document chunking (the RAG / long-context preprocessing
    * step): split each document's whitespace tokens into windows of `window`
    * tokens starting every `stride` tokens, one output row per chunk.
    *
    * Chunk starts are 1, 1+stride, 1+2·stride, … up to stop = max(1,
    * n-window+1), PLUS `stop` itself when the stride grid does not land on
    * it — the final chunk is always end-ALIGNED, so no token is ever
    * silently dropped (a strided grid alone leaves up to stride-1 tail
    * tokens chunkless; a ScalaCheck coverage property caught exactly that).
    * Every chunk is full-width except when the document itself is shorter
    * than `window`. With stride ≤ window coverage is complete: consecutive
    * strided chunks abut or overlap, and the tail chunk overlaps the last
    * strided one. Empty/whitespace-only documents yield no chunks.
    *
    * Scale shape: a pure per-row projection + posexplode — no shuffle at
    * all; output order and values are engine-identical (chunk_idx is the
    * position in the per-document start list, and `chunk_hash` is md5 over
    * the space-joined tokens so an oracle can reproduce it bit-for-bit).
    * Output: idCol, chunk_idx, chunk_start (1-based token offset),
    * n_tok, chunk_hash. */
  def chunkSliding(
      df: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window > 0, "window must be positive")
    require(stride > 0, "stride must be positive")
    val toks = Text.tokens(col(textCol))
    val stop = greatest(lit(1), size(col("__toks")) - lit(window) + lit(1))
    df.filter(length(trim(col(textCol))) > 0)
      .select(col(idCol), toks.as("__toks"))
      .select(col(idCol), col("__toks"),
        posexplode(array_distinct(concat(
          sequence(lit(1), stop, lit(stride)), array(stop))))
          .as(Seq("chunk_idx", "chunk_start")))
      .select(
        col(idCol),
        col("chunk_idx").cast(LongType),
        col("chunk_start").cast(LongType),
        slice(col("__toks"), col("chunk_start"), lit(window)).as("__chunk"))
      .select(col(idCol), col("chunk_idx"), col("chunk_start"),
        size(col("__chunk")).cast(LongType).as("n_tok"),
        md5(concat_ws(" ", col("__chunk"))).as("chunk_hash"))
  }

  /** Largest-remainder (Hamilton) apportionment of an integer `budget`
    * across groups proportional to `weightCol` — the exact-integer
    * mixture planner behind "sample B documents across sources pro rata":
    * each group's ideal quota budget·w/W is split into its floor plus a
    * remainder; floors are granted outright and the Σfloor..budget
    * leftover goes to the largest remainders (ties to the smallest group
    * key), so Σalloc = budget EXACTLY and every allocation is within one
    * of its ideal share — no float rounding can gain or lose a unit.
    * All arithmetic is integral: budget·w products and mods run in
    * Decimal(38,0) (a token-mass weight passes 2⁶³ at fleet scale); the
    * final quotient (budget·w − rem)/W is exactly divisible, so the
    * decimal divide is exact. Output per group: the group columns, `w`
    * (summed weight, long), `alloc`. Zero-weight groups keep their rows
    * (rem 0 sorts last — they get leftover only after every positive
    * remainder). Empty/zero-total input yields no rows.
    *
    * Scale shape: one map-side-combined agg to the GROUP table, one
    * broadcast total, one |groups|-sized ranking window — the output is a
    * budget plan keyed by source/domain, orders of magnitude smaller than
    * the data; pair with [[Ops.sampleToBudgets]] to execute the plan. */
  def apportion(df: DataFrame, groupCols: Seq[String], weightCol: String,
      budget: Long): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(budget >= 0, "budget must be >= 0")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val perG = df
      .filter(groupCols.map(c => col(c).isNotNull).reduce(_ && _)
        && col(weightCol).isNotNull && col(weightCol) >= 0)
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col(weightCol).cast(LongType)).as("w"))
    val tot = perG.agg(sum(col("w")).as("wt"))
    val j = perG.crossJoin(broadcast(tot)).filter(col("wt") > 0)
      .withColumn("bw", lit(budget).cast(dec) * col("w").cast(dec))
      .withColumn("rem", pmod(col("bw"), col("wt").cast(dec)))
      .withColumn("fq", ((col("bw") - col("rem")) / col("wt").cast(dec))
        .cast(LongType))
    val leftover = j.agg((lit(budget) - sum(col("fq"))).as("lf"))
    val rk = Window.orderBy(col("rem").desc +: groupCols.map(col(_).asc): _*)
    j.crossJoin(broadcast(leftover))
      .withColumn("__rk", row_number().over(rk))
      .select(groupCols.map(col) ++ Seq(col("w"),
        (col("fq") + when(col("__rk") <= col("lf"), lit(1L)).otherwise(lit(0L)))
          .as("alloc")): _*)
  }

  /** Capacity-capped [[apportion]] (r14 ✚) — Hamilton apportionment that
    * survives SOURCE EXHAUSTION: each group also carries a capacity
    * (Σ `capCol` — pass 1 per row for "can't sample more rows than the
    * group has", or available token mass), and the plan never allocates
    * past it. Semantics are the standard iterative clamp-and-
    * redistribute, defined exactly: each round apportions
    * (budget − Σ caps of already-capped groups) across the UNCAPPED
    * groups by weight (the [[apportion]] integer Hamilton); any group
    * allocated past its cap is clamped to it and marked capped; repeat.
    * A round that caps no new group recomputes the identical allocation,
    * so the fixpoint is idempotent and a fixed `rounds` unroll (each
    * round caps ≥ 1 group or is final — `rounds` ≥ |groups| is always
    * enough) replays on any engine — the q235 MM-round contract. When
    * the budget exceeds Σ all caps, everything is capped and
    * Σ alloc = Σ cap < budget (the infeasibility is visible, not hidden).
    *
    * Scale shape: one map-side-combined agg to the |groups| table, then
    * `rounds` passes over that tiny frame (localCheckpoint-pinned per
    * round — never a rounds-deep lazy plan). Output per group: group
    * cols, `w`, `cap`, `capped`, `alloc`. */
  def apportionCapped(df: DataFrame, groupCols: Seq[String],
      weightCol: String, capCol: String, budget: Long,
      rounds: Int = 8): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(budget >= 0, "budget must be >= 0")
    require(rounds >= 1 && rounds <= 64, "rounds must be in [1, 64]")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    var st = df
      .filter(groupCols.map(c => col(c).isNotNull).reduce(_ && _)
        && col(weightCol).isNotNull && col(weightCol) >= 0
        && col(capCol).isNotNull && col(capCol) >= 0)
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col(weightCol).cast(LongType)).as("w"),
        sum(col(capCol).cast(LongType)).as("cap"))
      .withColumn("capped", lit(false))
      .withColumn("alloc", lit(0L))
      .localCheckpoint(true)
    for (_ <- 1 to rounds) {
      val cb = st.agg(coalesce(sum(when(col("capped"), col("cap"))), lit(0L))
        .as("__cb"))
      val un = st.filter(!col("capped"))
        .select((groupCols.map(col) :+ col("w")): _*)
      val tot = un.agg(sum(col("w")).as("__wt"))
      val j = un.crossJoin(broadcast(cb)).crossJoin(broadcast(tot))
        .filter(col("__wt") > 0)
        .withColumn("__rb", greatest(lit(0L), lit(budget) - col("__cb")))
        .withColumn("__bw", col("__rb").cast(dec) * col("w").cast(dec))
        .withColumn("__rem", pmod(col("__bw"), col("__wt").cast(dec)))
        .withColumn("__fq", ((col("__bw") - col("__rem"))
          / col("__wt").cast(dec)).cast(LongType))
      val leftover = j.agg((max(col("__rb")) - sum(col("__fq"))).as("__lf"))
      val rk = Window.orderBy(
        col("__rem").desc +: groupCols.map(col(_).asc): _*)
      val allocU = j.crossJoin(broadcast(leftover))
        .withColumn("__rk", row_number().over(rk))
        .select((groupCols.map(col) :+
          (col("__fq") + when(col("__rk") <= col("__lf"), lit(1L))
            .otherwise(lit(0L))).as("__au")): _*)
      st = st.join(allocU, groupCols, "left")
        .select((groupCols.map(col) ++ Seq(col("w"), col("cap"),
          (col("capped") || coalesce(col("__au") > col("cap"), lit(false)))
            .as("capped"),
          when(col("capped") || coalesce(col("__au") > col("cap"), lit(false)),
            col("cap")).otherwise(coalesce(col("__au"), lit(0L)))
            .as("alloc"))): _*)
        .localCheckpoint(true)
    }
    st
  }

  /** Neyman-optimal stratified allocation (r14 ✚) — [[apportion]] with
    * the variance-optimal weight N_h·σ_h (Neyman 1934): the allocation
    * that minimizes the stratified-mean estimator's variance for a fixed
    * total budget, so a big AND internally-diverse stratum earns draws
    * while a big-but-constant one needs almost none — the principled
    * upgrade of pro-rata sampling for corpus QA ("how many docs per
    * source do I audit"). σ_h is the exact-sum sample std over the
    * micro-quantized value (Σx, Σx² as exact long/Decimal sums — the
    * [[graft.operators.Stats.welchT]] contract; ONE fixed sqrt expression
    * per stratum, mirrored in DuckDB), and the integer weight
    * w = round(N·σ_micro) feeds the pure-integer largest-remainder
    * machinery, so Σalloc = budget exactly. Single-row and
    * zero-variance strata weight 0 (one draw from a constant stratum
    * already tells you everything — they receive leftovers last, the
    * [[apportion]] zero-weight rule).
    *
    * Scale shape: one map-side-combined agg to the |strata| table; the
    * apportionment windows run on that tiny table. Output per stratum:
    * strata cols, `n_rows`, `sd_micro`, `w`, `alloc`. Pair with
    * [[Ops.sampleKPerGroup]]-style execution per stratum. */
  def neymanAllocation(df: DataFrame, strataCols: Seq[String],
      valueCol: String, budget: Long): DataFrame = {
    require(strataCols.nonEmpty, "need at least one stratum column")
    require(budget >= 0, "budget must be >= 0")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val v = round(col(valueCol).cast("double") * 1e6).cast(LongType)
    val perG = df
      .filter(strataCols.map(c => col(c).isNotNull).reduce(_ && _)
        && col(valueCol).isNotNull)
      .select((strataCols.map(col) :+ v.as("__v")): _*)
      .groupBy(strataCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"), sum(col("__v")).as("__s1"),
        sum(col("__v").cast(dec) * col("__v").cast(dec)).as("__s2"))
    val variance = (col("__s2").cast("double")
      - col("__s1").cast("double") * col("__s1").cast("double")
        / col("n_rows").cast("double")) / (col("n_rows") - 1).cast("double")
    val sd = when(col("n_rows") > 1, sqrt(greatest(lit(0d), variance)))
      .otherwise(lit(0d))
    val strata = perG
      .withColumn("sd_micro", round(sd).cast(LongType))
      .withColumn("w", round(col("n_rows").cast("double") * sd).cast(LongType))
      .select((strataCols.map(col) ++ Seq(col("n_rows"), col("sd_micro"),
        col("w"))): _*)
      .localCheckpoint(true) // tiny; read by the apportionment + the join
    apportion(strata, strataCols, "w", budget)
      .join(strata.drop("w"), strataCols)
      .select((strataCols.map(col) ++ Seq(col("n_rows"), col("sd_micro"),
        col("w"), col("alloc"))): _*)
  }
}
