package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.LongType

import graft.operators.{Audit, Bpe, Classify, Dedup, Dsir, Graph, Grouping, Intervals, Joins, Layout, Lm, Ops, Pack, Profile, Search, Sequences, Similarity, Sketches, Stats}
import graft.functions.{Jsons, Multimodal, Pii, Quality, Repetition, Text}
import graft.streaming.Streams

/** [[SparkEntry]] registry slice — graph: PageRank, personalized PR, label propagation, triangles, k-core, HITS, connected components.
  * Pure move from SparkEntry.scala (r10 registry split): every entry kept
  * verbatim next to its DuckDB oracle twin. First ids: q131_triangles, q138_personalized_pagerank, q139_label_propagation, q154_kcore, q191_hits, q41_approx_stats, … */
private[graft] object QueriesGraph extends OracleSqlHelpers {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // triangle counting ✚ on the part co-purchase graph (parts appearing
    // together in ≥2 order lines — min-support 2 keeps the projection
    // sparse; support 1 is 30× denser here). Degree-ordered wedge
    // enumeration (Suri & Vassilvitskii 2011) — π-ordering kills the
    // last-reducer hub problem, total wedge volume O(m^{3/2}); the oracle
    // counts the SAME triangles by the naive a<b<c three-way self-join,
    // which only the sf0.01 edge count makes affordable
    "q131_triangles" -> ((s, d) => {
      val l = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_partkey"))
      val r = l.select(col("l_orderkey"), col("l_partkey").as("p2"))
      val edges = l.join(r, Seq("l_orderkey"))
        .filter(col("l_partkey") < col("p2"))
        .groupBy(col("l_partkey").as("p1"), col("p2"))
        .agg(count(lit(1)).as("n_co"))
        .filter(col("n_co") >= 2)
      Graph.triangles(edges, "p1", "p2")
        .orderBy(col("n_tri").desc, col("node")).limit(20)
    }),
    // personalized PageRank ✚ (Haveliwala 2002) on q93's bipartite
    // customer↔supplier graph, teleporting ONLY to nation-0 suppliers —
    // quality propagation from a trusted seed set, the crawl-curation
    // sibling of global PageRank. Same exact-micro integer contract; the
    // oracle unrolls the identical 5 rounds with the seed-gated base
    "q138_personalized_pagerank" -> ((s, d) => {
      val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      val l = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
      val pairs = o.join(l, o("o_orderkey") === l("l_orderkey"))
        .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
        .distinct()
      val edges = pairs.union(pairs.select(col("dst").as("src"), col("src").as("dst")))
      val seeds = Tables.supplier(s, d).filter(col("s_nationkey") === 0)
        .select((col("s_suppkey") * 2 + 1).as("node"))
      Graph.personalizedPageRank(edges, "src", "dst", seeds, "node", iterations = 5)
        .orderBy(col("rank_micro").desc, col("node")).limit(20)
    }),
    // semi-supervised label propagation ✚: brand labels from the %23 seed
    // parts spread 3 rounds over q131's co-purchase graph (label-once
    // frontier, argmax by count with lexicographic ties — engine-exact;
    // the oracle unrolls the identical rounds)
    "q139_label_propagation" -> ((s, d) => {
      val l = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_partkey"))
      val edges = l.as("a").join(l.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .groupBy(col("a.l_partkey").as("p1"), col("b.l_partkey").as("p2"))
        .agg(count(lit(1)).as("n_co"))
        .filter(col("n_co") >= 2)
        .select("p1", "p2")
      val sym = edges.union(edges.select(col("p2").as("p1"), col("p1").as("p2")))
      val seeds = Tables.part(s, d).filter(col("p_partkey") % 23 === 0)
        .select(col("p_partkey").as("node"), col("p_brand").as("label"))
      Graph.labelPropagation(sym, "p1", "p2", seeds, "node", "label", iterations = 3)
        .orderBy("node")
    }),
    // k-core peeling ✚ (r9): the dense backbone of the q131 co-purchase
    // graph — 4 fixed peel rounds at k=3, pure function of (edges, k,
    // rounds), oracle unrolled round-for-round
    "q154_kcore" -> ((s, d) => {
      val l = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_partkey"))
      val r = l.select(col("l_orderkey"), col("l_partkey").as("p2"))
      val edges = l.join(r, Seq("l_orderkey"))
        .filter(col("l_partkey") < col("p2"))
        .groupBy(col("l_partkey").as("p1"), col("p2"))
        .agg(count(lit(1)).as("n_co"))
        .filter(col("n_co") >= 2)
      Graph.kCore(edges, "p1", "p2", k = 3, rounds = 4)
        .orderBy(col("node"))
    }),
    // HITS ✚ (r9): hubs/authorities on the bipartite user→event-type
    // graph — 3 pure-integer rounds, one final max-normalized report;
    // string nodes, no id remapping
    "q191_hits" -> ((s, d) => {
      Graph.hits(Tables.events(s, d), "user_id", "event_type", iterations = 3)
        .orderBy(col("node"))
    }),
    // ----- ✚ sketch/approx aggregates -------------------------------------
    // Sketch VALUES differ by implementation, so they can't be hash-compared
    // across engines; instead the exact columns are hashed and the sketches
    // are BOUND-ASSERTED (within 5% of the exact answer) as booleans the
    // oracle states as TRUE — the sketches stay exercised, the row is fully
    // hash-checkable, and a sketch regression flips a boolean (VERDICT r2 #2)
    "q41_approx_stats" -> ((s, d) => {
      // three cheap per-group passes joined on the (6-row) group key instead
      // of one mixed agg: countDistinct alongside other aggregates forces an
      // Expand (row duplication) and the exact `median` drags the whole agg
      // into a non-codegen ObjectHashAggregate — measured 0.6s -> 30s at
      // sf0.1 when combined. Split: sketches stay one codegen'd pass, exact
      // distinct is two map-side-combined hash shuffles, exact median uses
      // the windowed scale path (sort parallelizes across groups).
      val li = Tables.lineitem(s, d)
      val base = li.groupBy(col("l_returnflag")).agg(
        count(lit(1)).as("n"),
        approx_count_distinct(col("l_orderkey"), 0.02).as("__ad"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("__am"))
      val exactD = li.select(col("l_returnflag"), col("l_orderkey")).distinct()
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n_orders_exact"))
      val exactM = Grouping.groupby(li, Seq("l_returnflag"))
        .medianByWindow("l_extendedprice")
        .select(col("__graft_k_l_returnflag").as("l_returnflag"),
          col("__graft_median").as("__em"))
      // approx-distinct bound: 4σ of the configured rsd (0.02 → 8%), the
      // q106 rule — rsd is a standard DEVIATION, so the old 5% was only
      // ~2.5σ and a legitimate run could flip the boolean (residual failure
      // probability at 4σ ≈ 6e-5 per group). percentile_approx's bound is
      // rank-based, not probabilistic — 5% stays ample there.
      base.join(exactD, Seq("l_returnflag")).join(exactM, Seq("l_returnflag"))
        .select(col("l_returnflag"), col("n"), col("n_orders_exact"),
          (abs(col("__ad") - col("n_orders_exact")) <= col("n_orders_exact") * 0.08)
            .as("approx_distinct_ok"),
          (abs(col("__am") - col("__em")) <= abs(col("__em")) * 0.05)
            .as("approx_median_ok"))
        .transform(Ops.sortSmallT(col("l_returnflag")))
    }),
    // 5-iteration fixed-point PageRank on the (symmetrized) customer—supplier
    // trade graph from orders ⋈ lineitem; customers get even node ids,
    // suppliers odd, so one long key namespaces both sides
    "q93_pagerank" -> ((s, d) => {
      val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      val l = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
      val pairs = o.join(l, o("o_orderkey") === l("l_orderkey"))
        .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
        .distinct()
      val edges = pairs.union(pairs.select(col("dst").as("src"), col("src").as("dst")))
      Graph.pageRank(edges, "src", "dst", iterations = 5)
        .orderBy(col("rank_micro").desc, col("node")).limit(20)
    }),
    // multi-source BFS ✚ (r11): hop distance from nation-0 suppliers over
    // the q93 trade graph — the crawl-depth/blast-radius primitive; exact
    // integral frontier rounds, band-pinned, frontier-only shuffles
    "q212_bfs_hops" -> ((s, d) => {
      val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      val l = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
      val pairs = o.join(l, o("o_orderkey") === l("l_orderkey"))
        .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
        .distinct()
      val edges = pairs.union(pairs.select(col("dst").as("src"), col("src").as("dst")))
      val seeds = Tables.supplier(s, d).filter(col("s_nationkey") === 0)
        .select((col("s_suppkey") * 2 + 1).as("node"))
      Graph.bfsHops(edges, "src", "dst", seeds, "node", maxHops = 4)
        .orderBy(col("node"))
    }),
  )

  val oracleSql: Map[String, String] = Map(
    // the naive enumeration: canonical u<v edges, triangles as the a<b<c
    // three-way self-join (each triangle matched exactly once), nodes with
    // no triangle joined back at 0 — set-identical to the degree-ordered
    // plan because both enumerate the same undirected triangle set
    "q131_triangles" ->
      """WITH pairs AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2
             FROM lineitem a JOIN lineitem b
               ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
         e AS (SELECT p1, p2 FROM pairs GROUP BY p1, p2 HAVING count(*) >= 2),
         t AS (SELECT e1.p1 AS a, e1.p2 AS b, e2.p2 AS c
               FROM e e1 JOIN e e2 ON e1.p2 = e2.p1
                         JOIN e e3 ON e3.p1 = e1.p1 AND e3.p2 = e2.p2),
         n AS (SELECT a AS node FROM t UNION ALL SELECT b FROM t UNION ALL SELECT c FROM t),
         allnodes AS (SELECT p1 AS node FROM e UNION SELECT p2 FROM e),
         cnt AS (SELECT node, CAST(count(*) AS BIGINT) AS n_tri FROM n GROUP BY node)
         SELECT node, COALESCE(n_tri, 0) AS n_tri
         FROM allnodes LEFT JOIN cnt USING (node)
         ORDER BY n_tri DESC, node LIMIT 20""",
    "q138_personalized_pagerank" -> pprOracleSql(5),
    "q139_label_propagation" -> lpaOracleSql(3),
    // the q131 edge CTE + the peel unrolled round-for-round
    "q154_kcore" -> kcoreOracleSql(k = 3, rounds = 4),
    // 3 HITS rounds unrolled; HUGEINT sums replay Decimal(38,0)
    "q191_hits" ->
      """WITH e AS (SELECT DISTINCT user_id::VARCHAR AS src, event_type AS dst
                    FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
         nodes AS (SELECT src AS n FROM e UNION SELECT dst FROM e),
         h0 AS (SELECT n, 1::HUGEINT AS h FROM nodes),
         a1 AS (SELECT nodes.n, COALESCE(t.s, 0::HUGEINT) AS a FROM nodes
                LEFT JOIN (SELECT e.dst AS n, sum(h0.h) AS s FROM e
                           JOIN h0 ON h0.n = e.src GROUP BY 1) t ON nodes.n = t.n),
         h1 AS (SELECT nodes.n, COALESCE(t.s, 0::HUGEINT) AS h FROM nodes
                LEFT JOIN (SELECT e.src AS n, sum(a1.a) AS s FROM e
                           JOIN a1 ON a1.n = e.dst GROUP BY 1) t ON nodes.n = t.n),
         a2 AS (SELECT nodes.n, COALESCE(t.s, 0::HUGEINT) AS a FROM nodes
                LEFT JOIN (SELECT e.dst AS n, sum(h1.h) AS s FROM e
                           JOIN h1 ON h1.n = e.src GROUP BY 1) t ON nodes.n = t.n),
         h2 AS (SELECT nodes.n, COALESCE(t.s, 0::HUGEINT) AS h FROM nodes
                LEFT JOIN (SELECT e.src AS n, sum(a2.a) AS s FROM e
                           JOIN a2 ON a2.n = e.dst GROUP BY 1) t ON nodes.n = t.n),
         a3 AS (SELECT nodes.n, COALESCE(t.s, 0::HUGEINT) AS a FROM nodes
                LEFT JOIN (SELECT e.dst AS n, sum(h2.h) AS s FROM e
                           JOIN h2 ON h2.n = e.src GROUP BY 1) t ON nodes.n = t.n),
         h3 AS (SELECT nodes.n, COALESCE(t.s, 0::HUGEINT) AS h FROM nodes
                LEFT JOIN (SELECT e.src AS n, sum(a3.a) AS s FROM e
                           JOIN a3 ON a3.n = e.dst GROUP BY 1) t ON nodes.n = t.n),
         sc AS (SELECT a3.n, a3.a, h3.h FROM a3 JOIN h3 ON a3.n = h3.n),
         mx AS (SELECT max(a) AS ma, max(h) AS mh FROM sc)
         SELECT n AS node,
                CASE WHEN ma > 0
                     THEN CAST(round(a::DOUBLE / ma::DOUBLE * 1e6) AS BIGINT)
                END AS auth_micro,
                CASE WHEN mh > 0
                     THEN CAST(round(h::DOUBLE / mh::DOUBLE * 1e6) AS BIGINT)
                END AS hub_micro
         FROM sc, mx ORDER BY node""",
    "q41_approx_stats" ->
      """SELECT l_returnflag, count(*) AS n, count(DISTINCT l_orderkey) AS n_orders_exact,
                TRUE AS approx_distinct_ok, TRUE AS approx_median_ok
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q93_pagerank" -> pagerankOracleSql(5),
    "q212_bfs_hops" -> bfsOracleSql(4),
  )
}
