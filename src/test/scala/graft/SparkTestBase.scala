package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole forked test JVM — the SAME
  * configuration as the contract mains (GraftSession), so a knob added
  * there applies to the test suite too. */
object SparkTestBase {
  lazy val spark: SparkSession = GraftSession.local("4", "graft-test")
}

trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkTestBase.spark
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** Rows as a sorted set of plain Seqs — order-insensitive comparison. */
  def rowSet(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  def rowList(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq
}
