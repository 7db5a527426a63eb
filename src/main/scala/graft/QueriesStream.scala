package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.LongType

import graft.operators.{Audit, Bpe, Classify, Dedup, Dsir, Graph, Grouping, Intervals, Joins, Layout, Lm, Ops, Pack, Profile, Search, Sequences, Similarity, Sketches, Stats}
import graft.functions.{Jsons, Multimodal, Pii, Quality, Repetition, Text}
import graft.streaming.Streams

/** [[SparkEntry]] registry slice — streaming twins & table maintenance: foreachBatch gates, upsert/SCD2/diff, expectations, layout.
  * Pure move from SparkEntry.scala (r10 registry split): every entry kept
  * verbatim next to its DuckDB oracle twin. First ids: q145_upsert_compaction, q146_scd2_intervals, q148_key_skew, q149_expectations, q159_table_diff, q192_zone_maps, … */
private[graft] object QueriesStream extends OracleSqlHelpers {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // latest-wins upsert compaction ✚ (r9): the Delta/Hudi merge shape —
    // per-user state folded from a standing half and an ingest half of the
    // event log; a winning 'error' row acts as a tombstone and deletes the
    // user from the compacted state (retractions ride the same merge)
    "q145_upsert_compaction" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select("event_id", "ts", "user_id", "event_type", "value")
        .withColumn("dead", col("event_type") === "error")
      val cut = lit("2024-01-15").cast("timestamp")
      Ops.upsert(ev.filter(col("ts") < cut), ev.filter(col("ts") >= cut),
          Seq("user_id"), "ts", tombstoneCol = Some("dead"))
        .select("user_id", "event_id", "ts", "event_type", "value")
        .orderBy("user_id")
    }),
    // SCD2 interval build ✚ (r9): the event_type changelog per user
    // collapsed to validity intervals (valid_from/valid_to, null = current);
    // consecutive restatements suppressed null-safely
    "q146_scd2_intervals" -> ((s, d) => {
      Ops.scd2FromChangelog(
          Tables.events(s, d).select("user_id", "ts", "event_type"),
          Seq("user_id"), "ts", Seq("event_type"))
        .orderBy("user_id", "valid_from")
    }),
    // key-skew profiler ✚ (r9): the pre-shuffle "will one reducer drown?"
    // diagnostic — hottest-key counts, top-16 share and the Gini of the
    // per-key distribution, all exact longs + integer DIV
    "q148_key_skew" -> ((s, d) => {
      Profile.keySkew(Tables.lineitem(s, d), "l_partkey", topN = 16)
    }),
    // expectation battery ✚ (r9): the dbt-test/Great-Expectations gate —
    // all row-local rules ride ONE aggregation pass; unique adds one keyed
    // hash-agg, the FK one left join against deduplicated reference keys
    "q149_expectations" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
      Profile.expect(l, Seq(
        Profile.NotNull("l_orderkey"),
        Profile.InRange("l_quantity", 1, 45),
        Profile.MatchesRegex("l_returnflag", "[AN]"),
        Profile.Satisfies("discount_le_tax", col("l_discount") <= col("l_tax")),
        Profile.Unique(Seq("l_orderkey", "l_linenumber")),
        Profile.ForeignKey(Seq("l_orderkey"), "orders",
          Tables.orders(s, d), Seq("o_orderkey"))))
    }),
    // keyed table diff ✚ (r9): reconcile orders vs a deterministic "next
    // version" (every 13th key deleted→reinserted negated, every 7th price
    // bumped) — one full-outer join, column-wise null-safe compare
    "q159_table_diff" -> ((s, d) => {
      val a = Tables.orders(s, d)
      val b = a.filter(col("o_orderkey") % 13 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 7 === 0, col("o_totalprice") + 1.0)
            .otherwise(col("o_totalprice")))
        .unionByName(a.filter(col("o_orderkey") % 13 === 0)
          .withColumn("o_orderkey", -col("o_orderkey")))
      Audit.diffSummary(a, b, Seq("o_orderkey"))
        .transform(Ops.sortSmallT(col("diff_status")))
    }),
    // zone maps ✚ (r9): the measured I/O story behind q65's layout — the
    // SAME rows chunked under a natural vs a z-ordered layout, and the
    // chunk-pruning answer a partkey range predicate gets from each
    "q192_zone_maps" -> ((s, d) => {
      // spread the NARROW key projection before the 40-term z-interleave:
      // the single-split scan would otherwise compute it on one core, and
      // spreading inside zoneMap would shuffle the full lineitem width
      val li = graft.operators.Par.spread(Tables.lineitem(s, d)
          .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"))
        .withColumn("idc", col("l_orderkey") * 8 + col("l_linenumber"))
      // bucketWidth sized to each key's RANGE (idc tops out near 8·maxkey,
      // the 20-bit interleave near 2³¹) so the two-level position runs over
      // real buckets — a too-wide width degenerates into one global window
      // (measured: 23 s → the sized widths at sf0.1)
      def scan(df: DataFrame, label: String, width: Long) =
        Layout.zonesScanned(
          Layout.zoneMap(df, "k", "idc", Seq("l_partkey"), chunkRows = 1024L,
            bucketWidth = width),
          "l_partkey", 100L, 199L)
          .select(lit(label).as("layout"), col("n_chunks"), col("n_scanned"),
            col("rows_total"), col("rows_scanned"), col("scan_micro"))
      scan(li.withColumn("k", col("idc")), "natural", 1L << 15)
        .unionByName(scan(li.withColumn("k",
          Layout.zValue2(col("l_partkey"), col("l_suppkey"), bits = 20)),
          "zorder", 1L << 22))
        .transform(Ops.sortSmallT(col("layout")))
    }),
    // native session_window ✚ (r9): the q44 sessions as ONE hash-aggregate
    // GROUP BY key (runs unchanged as a watermarked streaming agg); half-
    // open boundary — an event exactly `gap` later starts a new session
    "q175_session_window" -> ((s, d) => {
      Streams.sessionWindowAgg(Tables.events(s, d), gapMinutes = 30)
        .orderBy(col("user_id"), col("start_us"))
    }),
    // 3-D z-order layout: per coarse z-cell min/max of ALL THREE dimensions
    // — every cell is a 4×4×4 box (64 z-values = 2 low bits per dim), the
    // property that makes parquet footer min/max stats prune scans on ANY
    // of the interleaved columns after a z-sorted write (r4 verdict: 2-D
    // only; now exercises Layout.zValueN)
    "q65_zorder_stats" -> ((s, d) => {
      val l = Tables.lineitem(s, d).select(
        (col("l_partkey") % 16).as("x"), (col("l_suppkey") % 16).as("y"),
        (col("l_orderkey") % 16).as("w"))
      l.withColumn("z", Layout.zValueN(Seq(col("x"), col("y"), col("w")), 4))
        .withColumn("bucket", expr("z DIV 64"))
        .groupBy("bucket").agg(count(lit(1)).as("n"),
          min("x").as("min_x"), max("x").as("max_x"),
          min("y").as("min_y"), max("y").as("max_y"),
          min("w").as("min_w"), max("w").as("max_w"))
        .transform(Ops.sortSmallT(col("bucket")))
    }),
    "q35_sessionize" -> ((s, d) => {
      Streams.sessionizeBatch(Tables.events(s, d), gapMinutes = 30)
        .orderBy("user_id", "session_id")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    // union + (ord DESC, side DESC) window replay; the tombstone filter is
    // the same null-safe NOT coalesce as the engine's
    "q145_upsert_compaction" ->
      """WITH u AS (
           SELECT event_id, ts, user_id, event_type, value,
                  CASE WHEN ts >= TIMESTAMP '2024-01-15' THEN 1 ELSE 0 END AS src
           FROM events),
         r AS (SELECT event_id, ts, user_id, event_type, value,
                      row_number() OVER (PARTITION BY user_id
                                         ORDER BY ts DESC, src DESC) AS rn
               FROM u)
         SELECT user_id, event_id, ts, event_type, value FROM r
         WHERE rn = 1 AND COALESCE(event_type = 'error', FALSE) = FALSE
         ORDER BY user_id""",
    // first-or-changed filter (IS DISTINCT FROM = the engine's null-safe
    // <=> negation), then lead over the survivors
    "q146_scd2_intervals" ->
      """WITH o AS (SELECT user_id, ts, event_type,
                lag(event_type) OVER (PARTITION BY user_id ORDER BY ts) AS prev,
                row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
              FROM events),
         c AS (SELECT user_id, ts, event_type FROM o
               WHERE rn = 1 OR event_type IS DISTINCT FROM prev),
         v AS (SELECT user_id, event_type, ts AS valid_from,
                lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to
              FROM c)
         SELECT user_id, event_type, valid_from, valid_to FROM v
         ORDER BY user_id, valid_from""",
    // rank window over the distinct-key counts; equal-count tie permutations
    // cannot change sum(i*c) within a block, so both engines agree exactly
    "q148_key_skew" ->
      """WITH cnt AS (SELECT l_partkey AS k, CAST(count(*) AS BIGINT) AS c
              FROM lineitem GROUP BY 1),
         r AS (SELECT c, row_number() OVER (ORDER BY c ASC, k ASC NULLS FIRST) AS i
               FROM cnt),
         s AS (SELECT CAST(sum(c) AS BIGINT) AS n_rows,
                      CAST(count(*) AS BIGINT) AS n_keys,
                      max(c) AS max_count,
                      CAST(sum(i * c) AS BIGINT) AS sic
               FROM r),
         t AS (SELECT CAST(sum(c) AS BIGINT) AS top_n_rows FROM
                (SELECT c FROM cnt ORDER BY c DESC, k ASC NULLS LAST LIMIT 16))
         SELECT n_rows, n_keys, max_count, top_n_rows,
                top_n_rows * 1000000 // n_rows AS top_share_ppm,
                (2 * sic - (n_keys + 1) * n_rows) * 1000000
                  // (n_keys * n_rows) AS gini_ppm
         FROM s CROSS JOIN t""",
    // each rule replayed as its aggregate: row-local CASE counts, the
    // unique-key sum over per-key counts, the FK left join on DISTINCT keys
    "q149_expectations" ->
      """WITH loc AS (
           SELECT 'not_null(l_orderkey)' AS rule, CAST(count(*) AS BIGINT) AS checked,
                  CAST(count(CASE WHEN l_orderkey IS NULL THEN 1 END) AS BIGINT) AS violations
           FROM lineitem
           UNION ALL
           SELECT 'in_range(l_quantity,1.0,45.0)', CAST(count(*) AS BIGINT),
                  CAST(count(CASE WHEN l_quantity IS NOT NULL
                                   AND (l_quantity < 1.0 OR l_quantity > 45.0)
                             THEN 1 END) AS BIGINT)
           FROM lineitem
           UNION ALL
           SELECT 'matches(l_returnflag)', CAST(count(*) AS BIGINT),
                  CAST(count(CASE WHEN l_returnflag IS NOT NULL
                                   AND NOT regexp_full_match(l_returnflag, '[AN]')
                             THEN 1 END) AS BIGINT)
           FROM lineitem
           UNION ALL
           SELECT 'satisfies(discount_le_tax)', CAST(count(*) AS BIGINT),
                  CAST(count(CASE WHEN NOT COALESCE(l_discount <= l_tax, FALSE)
                             THEN 1 END) AS BIGINT)
           FROM lineitem),
         u AS (SELECT 'unique(l_orderkey,l_linenumber)' AS rule,
                      CAST(sum(c) AS BIGINT) AS checked,
                      CAST(COALESCE(sum(CASE WHEN c > 1 THEN c END), 0) AS BIGINT) AS violations
               FROM (SELECT CAST(count(*) AS BIGINT) AS c FROM lineitem
                     GROUP BY l_orderkey, l_linenumber)),
         f AS (SELECT 'fk(l_orderkey->orders)' AS rule,
                      CAST(count(*) AS BIGINT) AS checked,
                      CAST(count(CASE WHEN o.o_orderkey IS NULL THEN 1 END) AS BIGINT) AS violations
               FROM lineitem li
               LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
                 ON li.l_orderkey = o.o_orderkey
               WHERE li.l_orderkey IS NOT NULL)
         SELECT rule, checked, violations FROM loc
         UNION ALL SELECT rule, checked, violations FROM u
         UNION ALL SELECT rule, checked, violations FROM f
         ORDER BY rule""",
    // same deterministic "next version" and the full-outer column-wise
    // IS DISTINCT FROM compare
    "q159_table_diff" ->
      """WITH a AS (SELECT * FROM orders),
         b AS (SELECT o_orderkey, o_custkey, o_orderstatus,
                CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1.0
                     ELSE o_totalprice END AS o_totalprice,
                o_orderdate, o_orderpriority
               FROM orders WHERE o_orderkey % 13 <> 0
               UNION ALL
               SELECT -o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                o_orderdate, o_orderpriority
               FROM orders WHERE o_orderkey % 13 = 0),
         j AS (SELECT a.o_orderkey IS NOT NULL AS in_a,
                b.o_orderkey IS NOT NULL AS in_b,
                ((a.o_custkey IS DISTINCT FROM b.o_custkey)
                 OR (a.o_orderstatus IS DISTINCT FROM b.o_orderstatus)
                 OR (a.o_totalprice IS DISTINCT FROM b.o_totalprice)
                 OR (a.o_orderdate IS DISTINCT FROM b.o_orderdate)
                 OR (a.o_orderpriority IS DISTINCT FROM b.o_orderpriority)) AS ch
               FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey)
         SELECT CASE WHEN NOT in_b THEN 'only_a' WHEN NOT in_a THEN 'only_b'
                     WHEN ch THEN 'changed' ELSE 'same' END AS diff_status,
                CAST(count(*) AS BIGINT) AS n_keys
         FROM j GROUP BY 1 ORDER BY 1""",
    // global row_number stands in for the engine's two-level position;
    // the bit-interleave replays Layout.zValue2 (a at even bits, b odd)
    "q192_zone_maps" ->
      """WITH li AS (SELECT l_orderkey * 8 + l_linenumber AS idc,
                l_partkey, l_suppkey FROM lineitem),
         zz AS (SELECT list_sum([ ((l_partkey >> i) & 1) * (1::BIGINT << (2*i))
                  + ((l_suppkey >> i) & 1) * (1::BIGINT << (2*i + 1))
                  for i in range(0, 20)]) AS k, idc, l_partkey FROM li),
         cn AS (SELECT (row_number() OVER (ORDER BY idc, idc) - 1) // 1024 AS chunk,
                       l_partkey FROM li),
         cz AS (SELECT (row_number() OVER (ORDER BY k, idc) - 1) // 1024 AS chunk,
                       l_partkey FROM zz),
         mn AS (SELECT chunk, count(*) AS n_rows, min(l_partkey) AS lo,
                       max(l_partkey) AS hi FROM cn GROUP BY 1),
         mz AS (SELECT chunk, count(*) AS n_rows, min(l_partkey) AS lo,
                       max(l_partkey) AS hi FROM cz GROUP BY 1),
         sn AS (SELECT 'natural' AS layout, count(*) AS n_chunks,
                  CAST(sum(CASE WHEN hi >= 100 AND lo <= 199 THEN 1 ELSE 0 END) AS BIGINT) AS n_scanned,
                  CAST(sum(n_rows) AS BIGINT) AS rows_total,
                  CAST(sum(CASE WHEN hi >= 100 AND lo <= 199 THEN n_rows ELSE 0 END) AS BIGINT) AS rows_scanned
                FROM mn),
         sz AS (SELECT 'zorder' AS layout, count(*) AS n_chunks,
                  CAST(sum(CASE WHEN hi >= 100 AND lo <= 199 THEN 1 ELSE 0 END) AS BIGINT) AS n_scanned,
                  CAST(sum(n_rows) AS BIGINT) AS rows_total,
                  CAST(sum(CASE WHEN hi >= 100 AND lo <= 199 THEN n_rows ELSE 0 END) AS BIGINT) AS rows_scanned
                FROM mz)
         SELECT layout, n_chunks, n_scanned, rows_total, rows_scanned,
                CASE WHEN rows_total > 0
                     THEN CAST(round(rows_scanned::DOUBLE / rows_total::DOUBLE * 1e6)
                               AS BIGINT)
                END AS scan_micro
         FROM (SELECT * FROM sn UNION ALL SELECT * FROM sz) u ORDER BY layout""",
    // the > gap boundary rule (session_window merges diff <= gap — the
    // SAME closed boundary as q44; spec-verified), flag + prefix sum
    "q175_session_window" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS t, event_id FROM events
              WHERE user_id IS NOT NULL AND ts IS NOT NULL),
         f AS (SELECT user_id, t, event_id,
                CASE WHEN lag(t) OVER w IS NULL
                      OR t - lag(t) OVER w > 1800000000 THEN 1 ELSE 0 END AS ns
               FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
         r AS (SELECT user_id, t, sum(ns) OVER (
                 PARTITION BY user_id ORDER BY t, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
               FROM f)
         SELECT user_id, CAST(min(t) AS BIGINT) AS start_us,
                CAST(max(t) AS BIGINT) AS end_us,
                CAST(count(*) AS BIGINT) AS n_events
         FROM r GROUP BY user_id, sid ORDER BY user_id, start_us""",
    "q65_zorder_stats" ->
      """WITH z0 AS (SELECT l_partkey % 16 AS x, l_suppkey % 16 AS y,
                            l_orderkey % 16 AS w FROM lineitem),
         z1 AS (SELECT x, y, w,
                  ((x >> 0) & 1) * 1   + ((y >> 0) & 1) * 2    + ((w >> 0) & 1) * 4
                + ((x >> 1) & 1) * 8   + ((y >> 1) & 1) * 16   + ((w >> 1) & 1) * 32
                + ((x >> 2) & 1) * 64  + ((y >> 2) & 1) * 128  + ((w >> 2) & 1) * 256
                + ((x >> 3) & 1) * 512 + ((y >> 3) & 1) * 1024 + ((w >> 3) & 1) * 2048 AS z
                FROM z0)
         SELECT z // 64 AS bucket, count(*) AS n,
                min(x) AS min_x, max(x) AS max_x, min(y) AS min_y, max(y) AS max_y,
                min(w) AS min_w, max(w) AS max_w
         FROM z1 GROUP BY 1 ORDER BY 1""",
    "q35_sessionize" ->
      """WITH e AS (
           SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
           FROM events),
         flagged AS (
           SELECT user_id, ts_us,
                  CASE WHEN lag(ts_us) OVER w IS NULL
                            OR ts_us - lag(ts_us) OVER w > 1800000000 THEN 1 ELSE 0 END AS is_new
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
         sess AS (
           SELECT user_id, ts_us,
                  sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
           FROM flagged)
         SELECT user_id, CAST(session_id AS BIGINT) AS session_id, count(*) AS n_events,
                min(ts_us) AS start_us, max(ts_us) AS end_us
         FROM sess GROUP BY user_id, session_id ORDER BY user_id, session_id""",
  )
}
