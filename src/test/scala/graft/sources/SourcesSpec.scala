package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.operators.Joins

class SourcesSpec extends SparkTestBase {
  import spark.implicits._

  test("csv/json/text round-trip through temp files") {
    val dir = Files.createTempDirectory("graft_src").toString
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    df.write.option("header", "true").csv(s"$dir/c")
    df.write.json(s"$dir/j")
    Seq("line one", "line two").toDF("value").write.text(s"$dir/t")
    assert(Sources.csv(spark, s"$dir/c").count() == 2)
    assert(Sources.json(spark, s"$dir/j").select("id", "v").count() == 2)
    assert(Sources.text(spark, s"$dir/t").count() == 2)
  }

  test("orc round-trip with partition pruning and predicate pushdown") {
    val dir = Files.createTempDirectory("graft_orc").toString + "/o"
    val df = Seq((1L, "x", 1.0), (2L, "y", 2.0), (3L, "x", 3.0)).toDF("id", "k", "v")
    Sources.writeOrc(df, dir, partitionBy = Seq("k"))
    val back = Sources.orc(spark, dir).filter(col("k") === "x" && col("v") > 1.5)
    assert(back.count() == 1)
    val plan = back.queryExecution.executedPlan.toString
    assert(!plan.contains("Filter (k"))                       // partition pruned
    assert(plan.contains("GreaterThan(v,1.5)"), s"no pushdown:\n$plan") // ORC pushdown
  }

  test("partitioned parquet write prunes directories on read") {
    val dir = Files.createTempDirectory("graft_part").toString + "/p"
    val df = Seq((1L, "x", 1.0), (2L, "y", 2.0), (3L, "x", 3.0)).toDF("id", "k", "v")
    Sources.writeParquet(df, dir, partitionBy = Seq("k"))
    val back = Sources.parquet(spark, dir).filter(col("k") === "x")
    assert(back.count() == 2)
    // partition filter must prune at planning time (no data filter on k)
    val plan = back.queryExecution.executedPlan.toString
    assert(!plan.contains("Filter (k"))
  }

  test("filter DSL predicates and projections push into the parquet scan") {
    val dir = Files.createTempDirectory("graft_push").toString + "/p"
    val df = (1L to 100L).map(i => (i, i * 2.0, s"s$i")).toDF("id", "v", "s")
    Sources.writeParquet(df, dir)
    val q = graft.operators.Ops.filters(Sources.parquet(spark, dir),
      Seq(("v", ">", 50.0), ("id", "<=", 90L))).select("id", "v")
    val scan = q.queryExecution.executedPlan.toString
    // both DSL predicates reach PushedFilters, and the untouched string
    // column is pruned out of ReadSchema
    assert(scan.contains("GreaterThan(v,50.0)") && scan.contains("LessThanOrEqual(id,90)"),
      s"predicates not pushed:\n$scan")
    assert(scan.contains("ReadSchema: struct<id:bigint,v:double>"),
      s"column not pruned:\n$scan")
  }

  test("bucketed table join avoids the shuffle exchange") {
    // warehouse.dir is a static conf — the shared session's default
    // (./spark-warehouse) is used; tables dropped below
    val facts = (1 to 100).map(i => (i.toLong % 10, i.toLong)).toDF("k", "v")
    Sources.writeBucketed(facts, "facts_a", Seq("k"), buckets = 4)
    Sources.writeBucketed(facts, "facts_b", Seq("k"), buckets = 4)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = Joins.join(spark.table("facts_a"),
        spark.table("facts_b").withColumnRenamed("v", "v2"), Seq("k"))
      val exchanges = j.queryExecution.executedPlan.toString
        .linesIterator.count(_.contains("Exchange hashpartitioning"))
      assert(exchanges == 0, "bucketed join must not shuffle")
      assert(j.count() == 1000) // 10 keys x 10x10 pairs
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS facts_a")
      spark.sql("DROP TABLE IF EXISTS facts_b")
    }
  }

  test("parquetEvolved: files from two schema versions union; old files null the new column") {
    val dir = java.nio.file.Files.createTempDirectory("evolved").toString
    // v1 writer: (id, a); months later v2 adds quality
    Seq((1L, "x"), (2L, "y")).toDF("id", "a")
      .write.mode("append").parquet(dir)
    Seq((3L, "z", 0.9)).toDF("id", "a", "quality")
      .write.mode("append").parquet(dir)
    val evolved = Sources.parquetEvolved(spark, dir)
    assert(evolved.columns.toSet == Set("id", "a", "quality"))
    val rows = evolved.collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap
    assert(rows == Map(1L -> None, 2L -> None, 3L -> Some(0.9)))
    // the plain reader picks ONE footer: whichever schema it lands on,
    // it must NOT see a merged superset unless asked
    assert(Sources.parquet(spark, dir).columns.length <= 3)
  }

  test("saltedJoin: identical results to plain inner join") {
    val skewed = (1 to 500).map(i => (if (i <= 450) 1L else i.toLong, i.toLong)).toDF("k", "v")
    val dim = (1 to 20).map(i => (i.toLong, s"d$i")).toDF("k", "name")
    val plain = Joins.join(skewed, dim, Seq("k"))
    val salted = Joins.saltedJoin(skewed, dim, Seq("k"), saltBuckets = 4)
    assert(salted.count() == plain.count())
    assert(rowSet(salted.select("k", "v", "name")) == rowSet(plain.select("k", "v", "name")))
  }
}
