package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Sources & sinks. The reference has only in-memory construction and a
  * console print (`SURVEY.md` §2.1 "Scans/sources/sinks"); at scale the
  * engine needs real connectors — all provided by Spark's DataSource V2
  * readers (vectorized, split by `maxPartitionBytes` across executors,
  * predicate/column pushdown for parquet).
  *
  * Writer-side scale levers exposed here: `partitionBy` (directory-level
  * partition pruning for downstream readers) and `bucketBy` (pre-shuffled
  * co-located layout: joins/aggs on the bucket key skip their exchange).
  */
object Sources {

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def csv(spark: SparkSession, path: String, header: Boolean = true,
      inferSchema: Boolean = true): DataFrame =
    spark.read.option("header", header).option("inferSchema", inferSchema).csv(path)

  def json(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  /** One line per row — the raw-corpus reader for text pipelines. */
  def text(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  /** ORC — the other columnar lakehouse format Spark reads natively
    * (vectorized, predicate/column pushdown like parquet). */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String, partitionBy: Seq[String] = Nil,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).orc(path)
  }

  /** Schema-evolution read: parquet with per-file schema RECONCILIATION
    * (`mergeSchema`) — the 100-TB lake reality where a table's files span
    * schema versions (columns added over months of ingest). Spark unions
    * the footers' schemas; files missing a column yield nulls for it.
    * Off by default on plain `parquet()` because footer merging touches
    * every file's metadata at planning time — reach for this reader only
    * on genuinely evolved tables, and compact to one schema when the
    * listing cost starts to show. Column renames/type changes are NOT
    * reconciled (Spark errors on conflicting types — the safe failure). */
  def parquetEvolved(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", true).parquet(path)

  /** Parquet sink, optionally hive-partitioned by low-cardinality columns so
    * downstream scans prune whole directories. */
  def writeParquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** Bucketed managed table: data pre-shuffled into `buckets` files by key.
    * Joins and aggregations on `bucketCols` then read co-located data and
    * skip the exchange entirely — the "repartition once, join many times"
    * pattern for 100-TB fact tables. */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
      buckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .format("parquet").saveAsTable(table)
  }
}
