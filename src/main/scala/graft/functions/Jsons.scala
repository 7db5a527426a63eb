package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** JSON-string → columns, the analog of the reference's unexported
  * `str_to_table` (`pyarrow_ops/jsons.py:5-8`).
  *
  * Divergence (SURVEY §2.2.9): the reference derives the schema from record 0
  * only (later keys silently dropped). We infer over a bounded row sample (a
  * superset of the reference's single record; see [[InferSampleRows]]) via
  * Spark's JSON reader, or accept an explicit schema for strict parity —
  * the production path at scale. Inference runs one bounded sampling job at
  * plan-build time; per-row parsing is the codegen'd `from_json` expression
  * — no UDF.
  */
object Jsons {

  /** Rows scanned by schema inference. Inference is a CONVENIENCE path: at
    * 100 TB an unbounded `spark.read.json(fullColumn)` is a second full pass
    * over the corpus before the real job starts (VERDICT r2 #5), so the scan
    * is bounded to this many rows — keys appearing only past the sample are
    * missed, which is the documented trade; pass an explicit schema to
    * `strToTable` for the production path (also the only way to get exact
    * types rather than inferred ones). */
  val InferSampleRows: Int = 10000

  /** Infer the struct schema of a JSON string column from a bounded sample
    * (first [[InferSampleRows]] non-null rows — `limit` short-circuits the
    * scan, so the job reads only the partitions it needs). */
  def inferSchema(spark: SparkSession, df: DataFrame, col: String): StructType = {
    val ds = df.select(col).na.drop().limit(InferSampleRows).as[String](Encoders.STRING)
    spark.read.json(ds).schema
  }

  /** Expand a JSON string column into top-level columns, appended after the
    * existing (non-JSON) columns. */
  def strToTable(
      spark: SparkSession,
      df: DataFrame,
      jsonCol: String,
      schema: Option[StructType] = None): DataFrame = {
    val s = schema.getOrElse(inferSchema(spark, df, jsonCol))
    val others = df.columns.filter(_ != jsonCol).map(c => df(c)).toSeq
    df.withColumn("__graft_j", from_json(df(jsonCol), s))
      .select(others :+ col("__graft_j.*"): _*)
  }

  /** Single-field extraction without inference (codegen'd path). */
  def extract(jsonCol: Column, path: String, as: DataType): Column =
    get_json_object(jsonCol, path).cast(as)
}
