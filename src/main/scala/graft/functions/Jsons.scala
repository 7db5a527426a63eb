package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** JSON-string → columns, the analog of the reference's unexported
  * `str_to_table` (`pyarrow_ops/jsons.py:5-8`).
  *
  * Divergence (SURVEY §2.2.9): the reference derives the schema from record 0
  * only (later keys silently dropped). We infer over ALL rows (a superset) via
  * Spark's JSON reader, or accept an explicit schema for strict parity.
  * Inference runs one sampling job at plan-build time; per-row parsing is the
  * codegen'd `from_json` expression — no UDF.
  */
object Jsons {

  /** Infer the struct schema of a JSON string column by scanning it. */
  def inferSchema(spark: SparkSession, df: DataFrame, col: String): StructType = {
    val ds = df.select(col).na.drop().as[String](Encoders.STRING)
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
