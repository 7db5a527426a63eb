package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering for write
  * paths. Sorting a table by the bit-interleaving of several columns places
  * rows close in EVERY dimension into the same files, so min/max footer
  * stats prune scans filtered on ANY of the interleaved columns — the
  * standard lakehouse layout trick for multi-predicate workloads, where a
  * lexicographic sort only serves its leading column.
  *
  * The z-value is a statically unrolled sum of shift/mask terms over the low
  * `bits` bits of each dimension — pure integer arithmetic, codegen'd,
  * reproducible on any engine with `>>`/`&` (the DuckDB oracle re-derives it
  * with the identical 2·bits-term expression). Callers map each dimension to
  * a bounded non-negative integer first (bucket id, truncated rank, pmod of
  * a key); values above 2^bits−1 wrap by masking, so pre-bucket
  * deliberately rather than relying on the mask. */
object Layout {

  /** Interleaved (Morton) z-value of N ≥ 2 non-negative integer columns:
    * bit i of dimension j lands at output position N·i + j (dimension 0
    * holds the least-significant lane, matching [[zValue2]]'s layout).
    * `bits · dims` ≤ 62 so the result stays inside a positive BIGINT.
    * Statically unrolled shift/mask sum — codegen'd, engine-portable. */
  def zValueN(dims: Seq[Column], bits: Int): Column = {
    val d = dims.size
    require(d >= 2, s"zValueN needs at least 2 dimensions, got $d")
    require(bits >= 1 && bits * d <= 62,
      s"bits*dims must be in [$d,62], got bits=$bits dims=$d")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      dims.zipWithIndex.foldLeft(acc) { case (a, (c, j)) =>
        a + (shiftright(c.cast("long"), i) % 2L) * lit(1L << (d * i + j))
      }
    }
  }

  /** Interleaved (Morton) z-value of two non-negative integer columns:
    * bit i of `a` lands at position 2i, bit i of `b` at 2i+1.
    * `bits` ≤ 31 per dimension (62-bit result, well inside BIGINT). */
  def zValue2(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    zValueN(Seq(a, b), bits)
  }

  /** Range-repartition + intra-partition sort by the z-value of (a, b):
    * the write-side layout operator. `numFiles` controls output file count
    * (one per partition after a parquet write). The range exchange samples
    * z-value boundaries, so files hold contiguous z-ranges — i.e. rectangles
    * in (a, b) space — which is exactly what makes footer min/max stats
    * selective on both columns. */
  def zorderBy(df: DataFrame, a: Column, b: Column, bits: Int,
      numFiles: Int, zCol: String = "__graft_z"): DataFrame =
    zorderByN(df, Seq(a, b), bits, numFiles, zCol)

  /** N-dimensional [[zorderBy]] — e.g. a lang × source × quality-bucket
    * curation layout, where any single-column predicate should still prune
    * files. Same range-exchange + in-partition sort; cells are N-d boxes. */
  def zorderByN(df: DataFrame, dims: Seq[Column], bits: Int,
      numFiles: Int, zCol: String = "__graft_z"): DataFrame = {
    require(numFiles > 0, "numFiles must be positive")
    require(!df.columns.contains(zCol),
      s"zorderBy reserves the column name $zCol; pass a different zCol")
    df.withColumn(zCol, zValueN(dims, bits))
      .repartitionByRange(numFiles, col(zCol))
      .sortWithinPartitions(col(zCol))
      .drop(zCol)
  }

  /** Rendezvous (highest-random-weight) shard assignment — Thaler &
    * Ravishankar 1998: key k goes to argmax_j md5(k ":" j) over shards
    * j ∈ 0..nShards−1. Unlike `Ops.shardByHash`'s modulo (which remaps
    * ~100% of keys when the shard count changes), HRW moves only ~1/(n+1)
    * of keys on a grow from n to n+1 — the property that matters when the
    * shards are STATEFUL (standing indexes, embedding stores, cache
    * nodes), because every moved key is state that must be rebuilt or
    * shipped. The weight is the md5 hex string compared lexicographically:
    * deterministic, engine-portable (any SQL engine with md5 replays it),
    * and uniform per (key, shard).
    *
    * Scale shape: a pure per-row fold over the literal shard sequence —
    * stateless projection inside WholeStageCodegen, no shuffle, no join,
    * no shard table to broadcast. Cost is O(nShards) hashes per row; for
    * nShards beyond ~10² prefer two-level assignment (HRW over shard
    * GROUPS, then within). Ties (a 128-bit md5 collision across two
    * shards of one key) resolve to the smaller shard id via the strict
    * `>` in the fold. */
  def rendezvousAssign(df: DataFrame, keyCol: String, nShards: Int,
      shardCol: String = "shard"): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val w = (j: Column) =>
      md5(concat(col(keyCol).cast("string"), lit(":"), j.cast("string")))
    df.withColumn(shardCol,
      aggregate(
        sequence(lit(0), lit(nShards - 1)),
        struct(lit("").as("w"), lit(-1).as("j")),
        (acc, j) => when(w(j) > acc.getField("w"),
          struct(w(j).as("w"), j.as("j"))).otherwise(acc))
        .getField("j").cast("long"))
  }
}
