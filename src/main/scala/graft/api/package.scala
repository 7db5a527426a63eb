package graft

import org.apache.spark.sql.{Column, DataFrame}

/** Drop-in, reference-flavored free-function surface
  * (`pyarrow_ops/__init__.py:1-4` exports: head, filters, drop_duplicates,
  * groupby, TableCleaner, join). A thin forwarding layer — the engine
  * underneath is the declarative Spark one, so Catalyst still optimizes
  * through these calls. */
package object api {
  import graft.operators.{Grouping, Joins, Ops}

  def head(df: DataFrame, n: Int = 5, maxWidth: Int = 100): Unit =
    Ops.head(df, n, maxWidth)

  def filters(df: DataFrame, preds: Seq[(String, String, Any)]): DataFrame =
    Ops.filters(df, preds)

  def filters(df: DataFrame, pred: (String, String, Any)): DataFrame =
    Ops.filters(df, pred)

  def drop_duplicates(df: DataFrame, on: Seq[String] = Nil, keep: String = "any",
      orderBy: Seq[Column] = Nil): DataFrame =
    Ops.dropDuplicates(df, on, keep, orderBy)

  def groupby(df: DataFrame, by: Seq[String]): Grouping = Grouping.groupby(df, by)
  def groupby(df: DataFrame, by: String): Grouping      = Grouping.groupby(df, by)

  def join(left: DataFrame, right: DataFrame, on: Seq[String],
      how: String = "inner"): DataFrame =
    Joins.join(left, right, on, how)

  type TableCleaner = graft.ml.TableCleaner
}
