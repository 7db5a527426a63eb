package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import graft.SparkTestBase

class JsonsSpec extends SparkTestBase {
  import spark.implicits._

  private def df = Seq(
    (1L, """{"a": 1, "b": "x"}"""),
    (2L, """{"a": 2, "b": "y", "c": true}"""),
    (3L, """{"a": 3}""")
  ).toDF("id", "j")

  test("strToTable with inference: schema is the UNION of keys (superset of reference)") {
    val out = Jsons.strToTable(spark, df, "j")
    // divergence from jsons.py:8 (record-0 keys only): 'c' survives here
    assert(out.columns.toSeq == Seq("id", "a", "b", "c"))
    assert(out.filter($"id" === 2).head().getBoolean(3))
    assert(out.filter($"id" === 1).head().isNullAt(3))
  }

  test("strToTable with explicit schema: reference record-0 parity mode") {
    val schema = StructType(Seq(StructField("a", LongType), StructField("b", StringType)))
    val out = Jsons.strToTable(spark, df, "j", Some(schema))
    assert(out.columns.toSeq == Seq("id", "a", "b")) // 'c' dropped like jsons.py
    assert(out.filter($"id" === 3).head().isNullAt(2)) // missing key -> null
  }

  test("extract: single-path codegen'd extraction with cast") {
    val out = df.select(Jsons.extract(col("j"), "$.a", LongType).as("a"))
    assert(out.collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
  }
}
