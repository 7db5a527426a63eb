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
}
