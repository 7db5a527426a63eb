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

  /** Zone map of a table under a chosen physical layout: rows are laid
    * out in (`keyCol`, `idCol`) order (the id breaks key ties so the
    * layout is total), cut into `chunkRows`-row chunks — the model of a
    * parquet row group / Delta file — and each chunk keeps min/max
    * per stat column plus its row count: exactly the footer statistics a
    * lakehouse scan prunes on. Output: `chunk`, `n_rows`,
    * `min_<c>`/`max_<c>` per stat column.
    *
    * Scale shape: the global position uses the [[graft.operators.Stats
    * .rocAuc]] two-level pattern (key-bucket counts + a bucket-frame
    * window + per-bucket row_numbers — no data-sized single-partition
    * sort, which is also why this models the real writer: range
    * partitioning + within-partition sort); the map itself is
    * chunk-count-sized. SIZE `bucketWidth` to the key's actual range
    * (aim for 10²–10⁵ buckets): a width wider than the whole range puts
    * every row in one bucket and the position window degenerates into
    * exactly the global sort this shape exists to avoid (q192 measured
    * 23 s that way at sf0.1). */
  def zoneMap(df: DataFrame, keyCol: String, idCol: String,
      statCols: Seq[String], chunkRows: Long,
      bucketWidth: Long = 1L << 40): DataFrame = {
    require(chunkRows >= 1 && bucketWidth >= 1 && statCols.nonEmpty,
      "need chunkRows >= 1, bucketWidth >= 1, stat columns")
    def floorDiv(x: Column, w: Long): Column = Ranks.floorDiv(x, w)
    // eager-materialize the key projection: without the barrier the
    // optimizer collapses projects and a computed layout key (e.g. a
    // 40-node z-interleave) is re-inlined into the bucket keys and the
    // window SORT comparator — measured 22 s → 1.9 s at sf0.1 for the
    // q192 z-order side; a layout build reads its input exactly once
    // anyway, so the checkpoint costs one narrow pass
    // NOT spread here: the input frame carries the caller's full column
    // set, so a pre-projection repartition would shuffle every column
    // (measured q192 8.6 → 10.4 s); callers that compute an expensive
    // layout key over a single-split scan spread their own NARROW
    // projection first (q192 does)
    val rows = df.filter(col(keyCol).isNotNull && col(idCol).isNotNull)
      .select(Seq(col(keyCol).cast("long").as("__k"), col(idCol).as("__id"))
        ++ statCols.map(c => col(c).cast("long").as(c)): _*)
      .localCheckpoint(true)
    val chunked = Ranks.positions(rows, floorDiv(col("__k"), bucketWidth),
        Seq(col("__k"), col("__id")), "__pos")
      .withColumn("chunk", floorDiv(col("__pos") - 1, chunkRows))
    chunked.groupBy("chunk")
      .agg(count(lit(1)).as("n_rows"),
        statCols.flatMap(c => Seq(min(col(c)).as(s"min_$c"),
          max(col(c)).as(s"max_$c"))): _*)
  }

  /** Pruning answer a range predicate `lo ≤ statCol ≤ hi` gets from a
    * [[zoneMap]]: a chunk must be scanned iff its [min, max] interval
    * overlaps the predicate's. One row: `n_chunks`, `n_scanned`,
    * `rows_total`, `rows_scanned`, `scan_micro` (scanned row fraction —
    * the I/O ratio a layout buys; null on an empty map). */
  def zonesScanned(zm: DataFrame, statCol: String, lo: Long,
      hi: Long): DataFrame = {
    val hit = col(s"max_$statCol") >= lo && col(s"min_$statCol") <= hi
    zm.agg(count(lit(1)).as("n_chunks"),
        count(when(hit, lit(1))).as("n_scanned"),
        coalesce(sum(col("n_rows")), lit(0L)).as("rows_total"),
        coalesce(sum(when(hit, col("n_rows"))), lit(0L)).as("rows_scanned"))
      .select(col("n_chunks"), col("n_scanned"), col("rows_total"),
        col("rows_scanned"),
        when(col("rows_total") > 0,
          round(col("rows_scanned").cast("double")
            / col("rows_total").cast("double") * 1e6).cast("long"))
          .as("scan_micro"))
  }
}
