package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.LongType

import graft.operators.{Grouping, Joins, Ops}
import graft.functions.Jsons

/** Per-group iteration output row (q09_group_iter). */
case class FlagStat(l_returnflag: String, n_rows: Long, sum_qty: Double)

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query takes (spark, sfDir) and reads the TESTDATA.md parquet tables.
  * Each has a DuckDB-runnable ANSI-SQL twin in [[oracleSql]] with IDENTICAL
  * output column names (the driver sorts columns by name before hashing).
  * Determinism rules used throughout (SURVEY §2.2, §7 risk list):
  *  - every query ends in an explicit ORDER BY (hash-stable row order);
  *  - float aggregates are exact-by-construction: sums over integral-valued
  *    doubles (l_quantity), or cents-rounded BIGINT sums (prices), or
  *    min/max/median (order-independent) — never a raw SUM over arbitrary
  *    doubles, whose result depends on partition-level addition order;
  *  - SQL null semantics (not the reference's NaN quirks).
  */
object SparkEntry {

  /** Flagship (the reference's own benchmark pipeline, `compare.py:25-34`):
    * join → drop_duplicates → groupby mean, on real tables.
    * orders ⋈ lineitem on orderkey, dedup to one lineitem per order,
    * per-customer mean quantity. Driver smoke-checks rows>0 on sf0.001. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val o = Tables.orders(spark, dir).withColumnRenamed("o_orderkey", "l_orderkey")
    val l = Tables.lineitem(spark, dir)
    val joined = Joins.join(l, o, Seq("l_orderkey"), "inner", broadcastRight = true)
    val deduped = Ops.dropDuplicates(joined, Seq("l_orderkey"), "first", Seq(col("l_linenumber")))
    Grouping.groupby(deduped, Seq("o_custkey")).agg(Seq("l_quantity" -> "mean"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ----- O1/O2: tuple-predicate filters ---------------------------------
    "q01_filters" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
      Ops.filters(l, Seq(
          ("l_returnflag", "=", "R"),
          ("l_quantity", "<", 10.0),
          ("l_linestatus", "in", Seq("F"))))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber")
    }),
    "q02_filters_notin" -> ((s, d) => {
      val o = Tables.orders(s, d)
      Ops.filters(o, Seq(
          ("o_orderstatus", "not in", Seq("F", "P")),
          ("o_totalprice", ">", 100000.0),
          ("o_orderpriority", "!=", "1-URGENT")))
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey")
    }),
    // ----- O3: keep-aware dedup -------------------------------------------
    // ordering must be a TOTAL order within each key for determinism —
    // (l_linenumber alone is not unique per order in this data).
    "q03_dedup_first" -> ((s, d) => {
      Ops.dropDuplicates(Tables.lineitem(s, d), Seq("l_orderkey"), "first",
          Seq(col("l_linenumber"), col("l_partkey"), col("l_suppkey")))
        .select("l_orderkey", "l_linenumber", "l_partkey")
        .orderBy("l_orderkey")
    }),
    "q04_dedup_last" -> ((s, d) => {
      Ops.dropDuplicates(Tables.lineitem(s, d), Seq("l_orderkey"), "last",
          Seq(col("l_linenumber"), col("l_partkey"), col("l_suppkey")))
        .select("l_orderkey", "l_linenumber", "l_partkey")
        .orderBy("l_orderkey")
    }),
    "q05_dedup_drop" -> ((s, d) => {
      Ops.dropDuplicates(Tables.orders(s, d), Seq("o_custkey"), "drop")
        .select("o_orderkey", "o_custkey")
        .orderBy("o_orderkey")
    }),
    "q06_dedup_any" -> ((s, d) => {
      Ops.dropDuplicates(Tables.lineitem(s, d).select("l_returnflag", "l_linestatus"))
        .orderBy("l_returnflag", "l_linestatus")
    }),
    // ----- O5-O9: groupby + aggs ------------------------------------------
    "q07_groupby_agg" -> ((s, d) => {
      Grouping.groupby(Tables.lineitem(s, d), Seq("l_returnflag", "l_linestatus"))
        .agg(Seq(
          "l_quantity" -> "sum", "l_quantity" -> "mean", "l_quantity" -> "median",
          "l_extendedprice" -> "min", "l_extendedprice" -> "max"))
        .orderBy("l_returnflag", "l_linestatus")
    }),
    "q08_groupby_count" -> ((s, d) => {
      Grouping.groupby(Tables.orders(s, d), Seq("o_orderpriority"))
        .aggExprs(
          count(lit(1)).as("n_orders"),
          countDistinct(col("o_custkey")).as("n_cust"))
        .orderBy("o_orderpriority")
    }),
    "q09_group_iter" -> ((s, d) => {
      import s.implicits._
      Grouping.groupby(Tables.lineitem(s, d).select("l_returnflag", "l_quantity"), Seq("l_returnflag"))
        .iterate { (keys, rows) =>
          var n = 0L; var sq = 0.0
          rows.foreach { r => n += 1; sq += r.getDouble(1) }
          Iterator.single(FlagStat(keys.head, n, sq))
        }
        .toDF().orderBy("l_returnflag")
    }),
    // ----- O10-O15: joins --------------------------------------------------
    "q10_join_inner" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d).withColumnRenamed("c_custkey", "o_custkey")
      Joins.join(o, c, Seq("o_custkey"), "inner", broadcastRight = true)
        .select("o_orderkey", "o_custkey", "o_totalprice", "c_name", "c_mktsegment")
        .orderBy("o_orderkey")
    }),
    "q11_join_multi" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
      val agg = Grouping.groupby(l, Seq("l_partkey", "l_suppkey"))
        .aggExprs(count(lit(1)).as("n_uses"))
      Joins.join(l, agg, Seq("l_partkey", "l_suppkey"))
        .filter(col("n_uses") >= 3)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "n_uses")
        .orderBy("l_orderkey", "l_linenumber")
    }),
    "q12_join_left" -> ((s, d) => {
      val c = Tables.customer(s, d).withColumnRenamed("c_custkey", "custkey")
      val oAgg = Grouping.groupby(
          Tables.orders(s, d).withColumnRenamed("o_custkey", "custkey"), Seq("custkey"))
        .aggExprs(count(lit(1)).as("n_orders"))
      Joins.join(c, oAgg, Seq("custkey"), "left")
        .select("custkey", "c_name", "n_orders")
        .orderBy("custkey")
    }),
    "q13_join_semi" -> ((s, d) => {
      val c = Tables.customer(s, d).withColumnRenamed("c_custkey", "custkey")
      val urgent = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("custkey"))
      Joins.join(c, urgent, Seq("custkey"), "semi")
        .select("custkey", "c_name").orderBy("custkey")
    }),
    "q14_join_anti" -> ((s, d) => {
      val c = Tables.customer(s, d).withColumnRenamed("c_custkey", "custkey")
      val urgent = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("custkey"))
      Joins.join(c, urgent, Seq("custkey"), "anti")
        .select("custkey", "c_name").orderBy("custkey")
    }),
    // ----- sorts / limits / set ops ---------------------------------------
    "q15_topk" -> ((s, d) => {
      Ops.topK(Tables.orders(s, d), 10, Seq(col("o_totalprice").desc, col("o_orderkey")))
        .select("o_orderkey", "o_totalprice")
    }),
    "q16_setops" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val rich = c.filter(col("c_acctbal") > 5000).select("c_custkey")
      val building = c.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val poor = c.filter(col("c_acctbal") < 0).select("c_custkey")
      val auto = c.filter(col("c_mktsegment") === "AUTOMOBILE").select("c_custkey")
      rich.intersect(building).union(poor.except(auto)).orderBy("c_custkey")
    }),
    // ----- window functions ------------------------------------------------
    "q17_window" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w).cast(LongType))
        .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
        .withColumn("run_cnt", count(lit(1)).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select("o_custkey", "o_orderkey", "rn", "prev_price", "run_cnt")
        .orderBy("o_custkey", "rn")
    }),
    // ----- grouping sets ----------------------------------------------------
    "q18_rollup" -> ((s, d) => {
      Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    }),
    "q19_cube" -> ((s, d) => {
      Tables.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
    }),
    // ----- O21: JSON string → columns --------------------------------------
    "q20_json_extract" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("event_id"), Jsons.extract(col("props"), "$.k", LongType).as("k"))
        .orderBy("event_id")
    }),
    "q21_json_expand" -> ((s, d) => {
      val e = Tables.events(s, d).select("event_id", "props")
      Jsons.strToTable(s, e, "props")
        .select(col("event_id"), col("k").cast(LongType).as("k"))
        .orderBy("event_id")
    }),
    // ----- headline agg (bench) --------------------------------------------
    "q22_pricing_summary" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") < to_timestamp(lit("1999-01-01")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100).cast(LongType))
            .as("revenue_cents"),
          avg(col("l_quantity")).as("avg_qty"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "q01_filters" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag FROM lineitem
         WHERE l_returnflag = 'R' AND l_quantity < 10 AND l_linestatus IN ('F')
         ORDER BY l_orderkey, l_linenumber""",
    "q02_filters_notin" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders
         WHERE o_orderstatus NOT IN ('F', 'P') AND o_totalprice > 100000
           AND o_orderpriority <> '1-URGENT'
         ORDER BY o_orderkey""",
    "q03_dedup_first" ->
      """SELECT l_orderkey, l_linenumber, l_partkey FROM (
           SELECT l_orderkey, l_linenumber, l_partkey,
                  row_number() OVER (PARTITION BY l_orderkey
                    ORDER BY l_linenumber, l_partkey, l_suppkey) AS rn
           FROM lineitem) t WHERE rn = 1 ORDER BY l_orderkey""",
    "q04_dedup_last" ->
      """SELECT l_orderkey, l_linenumber, l_partkey FROM (
           SELECT l_orderkey, l_linenumber, l_partkey,
                  row_number() OVER (PARTITION BY l_orderkey
                    ORDER BY l_linenumber DESC, l_partkey DESC, l_suppkey DESC) AS rn
           FROM lineitem) t WHERE rn = 1 ORDER BY l_orderkey""",
    "q05_dedup_drop" ->
      """SELECT o_orderkey, o_custkey FROM (
           SELECT o_orderkey, o_custkey, count(*) OVER (PARTITION BY o_custkey) AS c
           FROM orders) t WHERE c = 1 ORDER BY o_orderkey""",
    "q06_dedup_any" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
         ORDER BY l_returnflag, l_linestatus""",
    "q07_groupby_agg" ->
      """SELECT l_returnflag, l_linestatus,
                sum(l_quantity) AS l_quantity_sum,
                avg(l_quantity) AS l_quantity_mean,
                median(l_quantity) AS l_quantity_median,
                min(l_extendedprice) AS l_extendedprice_min,
                max(l_extendedprice) AS l_extendedprice_max
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q08_groupby_count" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
                count(DISTINCT o_custkey) AS n_cust
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q09_group_iter" ->
      """SELECT l_returnflag, count(*) AS n_rows, sum(l_quantity) AS sum_qty
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q10_join_inner" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, c_name, c_mktsegment
         FROM orders JOIN customer ON o_custkey = c_custkey
         ORDER BY o_orderkey""",
    "q11_join_multi" ->
      """SELECT l.l_orderkey, l.l_linenumber, l.l_partkey, l.l_suppkey, a.n_uses
         FROM lineitem l
         JOIN (SELECT l_partkey, l_suppkey, count(*) AS n_uses
               FROM lineitem GROUP BY l_partkey, l_suppkey) a
           ON l.l_partkey = a.l_partkey AND l.l_suppkey = a.l_suppkey
         WHERE a.n_uses >= 3
         ORDER BY l.l_orderkey, l.l_linenumber""",
    "q12_join_left" ->
      """SELECT c_custkey AS custkey, c_name, n_orders
         FROM customer LEFT JOIN
           (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey) o
           ON c_custkey = o.o_custkey
         ORDER BY custkey""",
    "q13_join_semi" ->
      """SELECT c_custkey AS custkey, c_name FROM customer
         WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
         ORDER BY custkey""",
    "q14_join_anti" ->
      """SELECT c_custkey AS custkey, c_name FROM customer c
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c.c_custkey AND o_orderpriority = '1-URGENT')
         ORDER BY custkey""",
    "q15_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    "q16_setops" ->
      """SELECT c_custkey FROM (
           SELECT c_custkey FROM customer WHERE c_acctbal > 5000
           INTERSECT
           SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
           UNION ALL
           (SELECT c_custkey FROM customer WHERE c_acctbal < 0
            EXCEPT
            SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE')) t
         ORDER BY c_custkey""",
    "q17_window" ->
      """SELECT o_custkey, o_orderkey,
                row_number() OVER w AS rn,
                lag(o_totalprice, 1) OVER w AS prev_price,
                count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_cnt
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
         ORDER BY o_custkey, rn""",
    "q18_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n, sum(l_quantity) AS sum_qty
         FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    "q19_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n
         FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
         ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""",
    "q20_json_extract" ->
      """SELECT event_id, CAST(props->>'$.k' AS BIGINT) AS k FROM events
         ORDER BY event_id""",
    "q21_json_expand" ->
      """SELECT event_id, CAST(props->>'$.k' AS BIGINT) AS k FROM events
         ORDER BY event_id""",
    "q22_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
                sum(l_quantity) AS sum_qty,
                CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
                avg(l_quantity) AS avg_qty,
                count(*) AS n
         FROM lineitem WHERE l_shipdate < TIMESTAMP '1999-01-01'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
  )
}
