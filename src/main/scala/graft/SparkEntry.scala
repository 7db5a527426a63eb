package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.LongType

import graft.operators.{Audit, Bpe, Classify, Dedup, Dsir, Graph, Grouping, Intervals, Joins, Layout, Lm, Ops, Pack, Profile, Search, Sequences, Similarity, Sketches, Stats}
import graft.functions.{Jsons, Multimodal, Pii, Quality, Repetition, Text}
import graft.streaming.Streams

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
    // ----- the reference's own benchmark workload (compare.py:25-34) -------
    // join -> drop_duplicates -> groupby mean, on real tables at the bench SF.
    "q00_compare_pipeline" -> ((s, d) => {
      val o = Tables.orders(s, d).withColumnRenamed("o_orderkey", "l_orderkey")
      val l = Tables.lineitem(s, d)
      val joined = Joins.join(l, o, Seq("l_orderkey"), "inner", broadcastRight = true)
      val deduped = Ops.dropDuplicates(joined, Seq("l_orderkey"), "first",
        Seq(col("l_linenumber"), col("l_partkey"), col("l_suppkey")))
      Grouping.groupby(deduped, Seq("o_custkey")).agg(Seq("l_quantity" -> "mean"))
        .orderBy("o_custkey")
    }),
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
          Iterator.single(FlagStat(keys.getString(0), n, sq))
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
    // ----- ✚ text analysis (documents) -------------------------------------
    "q23_text_stats" -> ((s, d) => {
      Tables.documents(s, d).select(
          col("doc_id"),
          Text.tokenCount(col("text")).cast(LongType).as("n_tokens"),
          Text.fingerprint(col("text")).as("fingerprint"),
          Text.langId(col("text")).as("lang_id"),
          Text.qualityScore(col("text")).as("quality"))
        .orderBy("doc_id")
    }),
    // Unicode NFC normalization ✚ (codegen'd native expression): a decomposed
    // combining-accent prefix is planted on every document so the oracle
    // exercises real composition (the synthetic corpus is ASCII, where NFC
    // is the quick-checked identity fast path)
    "q80_unicode_nfc" -> ((s, d) => {
      graft.expressions.GraftFunctions.register(s)
      Tables.documents(s, d)
        .select(col("doc_id"),
          concat(lit("Cafe\u0301 doc "), col("doc_id").cast("string"), lit(" "),
            substring(col("text"), 1, 40)).as("raw"))
        .select(col("doc_id"), col("raw"),
          Text.normalizeUnicode(col("raw"), "NFC").as("nfc"))
        .select(col("doc_id"),
          length(col("raw")).cast(LongType).as("len_raw"),
          length(col("nfc")).cast(LongType).as("len_nfc"),
          md5(col("nfc")).as("nfc_md5"))
        .orderBy("doc_id")
    }),
    // full Gopher rule battery ✚ (Rae et al. 2021 table A1): per-rule
    // booleans so a curation job can audit WHY documents drop; word-count
    // gate splits this corpus (10-99 words vs the >=50 threshold)
    "q81_gopher_rules" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), Quality.gopherRules(col("text")).as("g"))
        .select(col("doc_id"), col("g.n_words"), col("g.ok_word_count"),
          col("g.ok_mean_word_len"), col("g.ok_symbol_ratio"),
          col("g.ok_bullet_lines"), col("g.ok_ellipsis_lines"),
          col("g.ok_alpha_words"), col("g.ok_stopwords"), col("g.pass"))
        .orderBy("doc_id")
    }),
    "q51_token_budget" -> ((s, d) => {
      Tables.documents(s, d).select(
          col("doc_id"),
          Text.tokenCount(col("text")).cast(LongType).as("n_whitespace"),
          Text.bpeishTokenCount(col("text")).cast(LongType).as("n_bpeish"),
          length(col("text")).cast(LongType).as("n_chars"))
        .orderBy("doc_id")
    }),
    "q24_simhash" -> ((s, d) => {
      Dedup.simhashTable(Tables.documents(s, d), "doc_id", "text")
        .select(col("id").as("doc_id"), col("sh64").as("simhash64"))
        .orderBy("doc_id")
    }),
    "q25_lang_quality_agg" -> ((s, d) => {
      Tables.documents(s, d)
        .select(Text.langId(col("text")).as("lang_id"),
          Text.qualityScore(col("text")).as("q"))
        .groupBy("lang_id")
        .agg(count(lit(1)).as("n_docs"),
          sum(round(col("q") * 1000000).cast(LongType)).as("quality_sum_micro"))
        .orderBy("lang_id")
    }),
    "q26_token_freq" -> ((s, d) => {
      Tables.documents(s, d)
        .select(explode(Text.tokens(Text.normalize(col("text")))).as("token"))
        .groupBy("token").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token")).limit(20)
    }),
    // heavy hitters ✚ (q64/q110's third sketch family): per-shard frequency
    // sketches of the hashed token stream, merged globally; the exact
    // top-20 (q26's query, hash-compared) probes the merged sketch and
    // asserts the sketch's DETERMINISTIC lower ≤ exact ≤ upper guarantee
    // (estimates are merge-tree-specific and never hash-compared)
    "q112_heavy_hitters" -> ((s, d) => {
      graft.expressions.GraftFunctions.register(s)
      val toks = Tables.documents(s, d)
        .select(explode(Text.tokens(Text.normalize(col("text")))).as("token"))
      val hashed = toks.withColumn("h", xxhash64(col("token")))
      val sk = Sketches.frequencySketch(
        Ops.shardByHash(hashed, "token", 8), Seq("shard"), "h")
      val merged = Sketches.mergeFrequency(sk, Nil)
      val top = toks.groupBy("token").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token")).limit(20)
      top.crossJoin(broadcast(merged))
        .withColumn("b",
          call_function("graft_freq_bounds", col("fsketch"), xxhash64(col("token"))))
        .select(col("token"), col("n"),
          (element_at(col("b"), 2) <= col("n") &&
            col("n") <= element_at(col("b"), 3)).as("ok_bounds"))
        .orderBy(col("n").desc, col("token"))
    }),
    // temperature-scaled mixture ✚ (T5 §3.4.3 / XLM sampling): per-source
    // token budgets ∝ n_s^0.5 (α=0.5 flattens the source mix), realized by
    // the deterministic hash-order admission — the complete "mix sources
    // for a training run" pipeline, all exact integer arithmetic
    "q114_temperature_mix" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .withColumn("n_tokens", Text.tokenCount(col("text")).cast(LongType))
      val budgets = Ops.temperatureBudgets(docs, Seq("source"), "n_tokens",
        alpha = 0.5, totalBudget = 50000L)
      val sel = Ops.sampleToBudgets(docs, Seq("source"), "doc_id", "n_tokens", budgets)
      sel.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens_sel"))
        .join(budgets.select(col("source"), col("w_total"), col("budget")), Seq("source"))
        .orderBy("source")
    }),
    // theta-sketch set algebra ✚ (the capability HLL lacks): per-event-type
    // theta sketches of the user id stream; "users who did BOTH view and
    // purchase" (intersection) and "view-only users" (A∖B) answered from
    // the two binaries and asserted inside the sketches' 3σ bounds —
    // below sketch capacity the sketch is EXACT and the bounds collapse
    // onto the true count. Exact sides hash-compare; oracle emits TRUE.
    "q113_theta_sets" -> ((s, d) => {
      graft.expressions.GraftFunctions.register(s)
      val e = Tables.events(s, d).filter(col("event_type").isin("view", "purchase"))
      val sk = Sketches.thetaSketch(e, Seq("event_type"), "user_id")
      val sv = sk.filter(col("event_type") === "view").select(col("tsketch").as("sv"))
      val sp = sk.filter(col("event_type") === "purchase").select(col("tsketch").as("sp"))
      val flags = e.groupBy("user_id").agg(
        max(when(col("event_type") === "view", 1).otherwise(0)).as("v"),
        max(when(col("event_type") === "purchase", 1).otherwise(0)).as("p"))
      flags.agg(
          sum(when(col("v") === 1 && col("p") === 1, 1L).otherwise(0L)).as("n_both_exact"),
          sum(when(col("v") === 1 && col("p") === 0, 1L).otherwise(0L)).as("n_view_only_exact"))
        .crossJoin(broadcast(sv)).crossJoin(broadcast(sp))
        .withColumn("bi", Sketches.thetaSetBounds(col("sv"), col("sp"), "intersect"))
        .withColumn("bd", Sketches.thetaSetBounds(col("sv"), col("sp"), "diff"))
        .select(col("n_both_exact"), col("n_view_only_exact"),
          (element_at(col("bi"), 2) <= col("n_both_exact") &&
            col("n_both_exact") <= element_at(col("bi"), 3)).as("ok_intersect"),
          (element_at(col("bd"), 2) <= col("n_view_only_exact") &&
            col("n_view_only_exact") <= element_at(col("bd"), 3)).as("ok_diff"))
    }),
    // ----- ✚ dedup family (documents) --------------------------------------
    "q27_dedup_exact" -> ((s, d) => {
      Dedup.exact(Tables.documents(s, d), "doc_id", "text")
        .orderBy("keep_id")
    }),
    "q28_ngram_jaccard" -> ((s, d) => {
      Dedup.ngramJaccardPairs(Tables.documents(s, d), "doc_id", "text", n = 3, threshold = 0.8)
        .orderBy("id_a", "id_b")
    }),
    "q29_minhash_lsh" -> ((s, d) => {
      Dedup.minhashLshPairs(Tables.documents(s, d), "doc_id", "text",
          n = 3, bands = 4, rowsPerBand = 3, threshold = 0.8)
        .orderBy("id_a", "id_b")
    }),
    "q30_simhash_pairs" -> ((s, d) => {
      Dedup.simhashPairs(Tables.documents(s, d), "doc_id", "text", maxHamming = 3)
        .orderBy("id_a", "id_b")
    }),
    // exact-substring dedup (Lee et al. 2022): pairs sharing >= 1 verbatim
    // 30-token run — the duplication mode a global-Jaccard threshold misses
    // (k = 30 ≈ a quarter of these ~120-word docs: a shared block that long
    // leaves the pair's Jaccard far below q28's 0.8 gate)
    "q69_substring_dup" -> ((s, d) => {
      Dedup.substringDupPairs(Tables.documents(s, d), "doc_id", "text", k = 30)
        .orderBy("id_a", "id_b")
    }),
    // ----- ✚ similarity search (embeddings) --------------------------------
    "q31_ann_bruteforce" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 10), "vec_id", "embedding", k = 5)
        .orderBy("query_id", "rank")
    }),
    // nTables/signBits/nCells/nprobe left at defaults: signBits and nCells
    // derive from count(*) (constant bucket occupancy / ⌈√N⌉ cells at ANY
    // corpus size — the VERDICT r1 scale fix), reproduced by the oracle
    "q32_ann_bucketed" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.bucketedTopK(e, e.filter(col("vec_id") < 10), "vec_id", "embedding", k = 5)
        .orderBy("query_id", "rank")
    }),
    "q50_ann_ivf" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.ivfTopK(e, e.filter(col("vec_id") < 10), "vec_id", "embedding", k = 5)
        .orderBy("query_id", "rank")
    }),
    "q33_embedding_neardup" -> ((s, d) => {
      Dedup.embeddingNearDupPairs(Tables.embeddings(s, d), "vec_id", "embedding",
          threshold = 0.3)
        .orderBy("id_a", "id_b")
    }),
    // delta↔corpus embedding near-dup ✚ (VERDICT r6 §missing-1, q72's
    // vector twin): hash-shard 0 plays the ingest batch, the rest is the
    // standing corpus whose EmbeddingIndex is built once — the delta is
    // bucketed with the CORPUS's plane parameters and band-joined against
    // the pinned corpus buckets; the corpus is never self-joined
    "q115_embedding_delta" -> ((s, d) => {
      val sharded = Ops.shardByHash(Tables.embeddings(s, d), "vec_id", 5)
      val corpus = sharded.filter(col("shard") =!= 0).drop("shard")
      val delta = sharded.filter(col("shard") === 0).drop("shard")
      val ix = Dedup.embeddingIndex(corpus, "vec_id", "embedding", threshold = 0.3)
      val out = Dedup.embeddingNearDupPairsBetween(delta, ix, "vec_id", "embedding",
        threshold = 0.3)
      ix.release()
      out.orderBy("id_a", "id_b")
    }),
    // SemDeDup-style one-call semantic dedup ✚ (VERDICT r6 §missing-2):
    // embedding pairs → connected components → keep each semantic family's
    // best row under (label, vec_id) — the keepBy window path, exercised
    // end-to-end against the oracle's recursive-closure replay
    "q116_semantic_dedup" -> ((s, d) => {
      Dedup.dedupedCorpusByEmbedding(Tables.embeddings(s, d), "vec_id", "embedding",
          threshold = 0.3, keepBy = Seq(col("label"), col("vec_id")))
        .select(col("vec_id"), col("label"))
        .orderBy("vec_id")
    }),
    // incremental SEMANTIC components ✚ (q109's vector twin, closing the
    // standing-vector-store loop q115 opened): yesterday's corpus labels
    // are computed first; today's batch folds in via labels-as-edges +
    // (delta↔corpus pairs through the corpus EmbeddingIndex ∪ the delta's
    // own internal pairs) — corpus history never re-contracted, the corpus
    // never re-bucketed. Oracle = recursive closure over the same three
    // pair sets, so the gate asserts incremental ≡ full over these edges.
    "q117_semantic_incremental" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val sharded = Ops.shardByHash(e, "vec_id", 5)
      val delta = sharded.filter(col("shard") === 0).drop("shard")
      val corpus = sharded.filter(col("shard") =!= 0).drop("shard")
      val ixC = Dedup.embeddingIndex(corpus, "vec_id", "embedding", threshold = 0.3)
      val ixD = Dedup.embeddingIndex(delta, "vec_id", "embedding", threshold = 0.3)
      val prior = Dedup.connectedComponents(
        Dedup.embeddingNearDupPairsIndexed(ixC, threshold = 0.3), corpus, "vec_id")
      val deltaEdges = Dedup.embeddingNearDupPairsBetween(delta, ixC,
          "vec_id", "embedding", threshold = 0.3)
        .select("id_a", "id_b")
        .unionByName(Dedup.embeddingNearDupPairsIndexed(ixD, threshold = 0.3)
          .select("id_a", "id_b"))
      val out = Dedup.connectedComponentsIncremental(prior, deltaEdges, e, "vec_id")
        .filter(col("id") =!= col("component")) // only vecs folded into a group
        .orderBy("id")
      ixC.release(); ixD.release()
      out
    }),
    // product-quantization two-stage top-k ✚ (the ANN memory-compression
    // leg: 64 dims → 16 integer codes + one stored norm; the ADC pass
    // ranks a shortlist from codes alone, then only shortlist rows' true
    // vectors are exactly re-scored — the production PQ search shape).
    // Deterministic
    // per-subspace integer Lloyd, so the whole chain — codebooks, codes,
    // ADC shortlist, exact rerank — hash-checks against the SQL replay;
    // `hit` flags membership in the exact top-5 so the gate also records
    // the two-stage recall against brute force, row by row.
    "q118_pq_topk" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val qs = e.filter(col("vec_id") < 10)
      val pq = Similarity.pqTopK(e, qs, "vec_id", "embedding", k = 5, rerank = 50)
      val exact = Similarity.bruteForceTopK(e, qs, "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("nbr_id"), lit(1L).as("hit"))
      pq.join(exact, Seq("query_id", "nbr_id"), "left")
        .select(col("query_id"), col("nbr_id"), col("cosine_micro"), col("rank"),
          coalesce(col("hit"), lit(0L)).as("hit"))
        .orderBy("query_id", "rank")
    }),
    // IVF-PQ composed ✚: the production billion-vector layout — coarse
    // cells prune the corpus to each query's probed slice, only that
    // slice's PQ codes are ADC-scored, the shortlist is exactly reranked.
    // Both halves' deterministic chains compose, so the whole thing
    // hash-checks; `hit` again records recall vs brute force row by row.
    "q119_ivfpq_topk" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val qs = e.filter(col("vec_id") < 10)
      val pq = Similarity.ivfPqTopK(e, qs, "vec_id", "embedding", k = 5, rerank = 50)
      val exact = Similarity.bruteForceTopK(e, qs, "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("nbr_id"), lit(1L).as("hit"))
      pq.join(exact, Seq("query_id", "nbr_id"), "left")
        .select(col("query_id"), col("nbr_id"), col("cosine_micro"), col("rank"),
          coalesce(col("hit"), lit(0L)).as("hit"))
        .orderBy("query_id", "rank")
    }),
    // stored-index IVF-PQ search ✚ (VERDICT r7 §next-1): the q119 chain
    // run as a real vector store runs it — train once (ivfPqIndex),
    // PERSIST to parquet, LOAD, and answer the query batch from stored
    // cells/codes with ZERO retraining. The oracle is the q119 chain
    // itself: a stored-then-loaded index must answer bit-identically to
    // the one-call path (cents/books/codes are stored bytes)
    "q120_ivfpq_indexed" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val qs = e.filter(col("vec_id") < 10)
      val ix = Similarity.ivfPqIndex(e, "vec_id", "embedding")
      val path = java.nio.file.Files.createTempDirectory("graft_pqix").toString
      Similarity.saveIvfPqIndex(ix, path)
      ix.release()
      val loaded = Similarity.loadIvfPqIndex(s, path)
      val out = Similarity.ivfPqTopKIndexed(loaded, qs, "vec_id", "embedding",
        k = 5, rerank = 50)
      loaded.release()
      out.orderBy("query_id", "rank")
    }),
    // residual IVF-PQ ✚ (VERDICT r7 §missing-2, Jégou et al. 2011 §IV-A):
    // codes quantize v − cell-centroid instead of v, concentrating the
    // code space on within-cell variation at the same 96-bit budget; the
    // residual subtraction and the q·centroid ADC base term are exact
    // integer math, so the whole extended chain hash-checks. `hit` again
    // records top-5 recall vs brute force row by row (Bench echoes it)
    "q121_ivfpq_residual" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val qs = e.filter(col("vec_id") < 10)
      val pq = Similarity.ivfPqTopK(e, qs, "vec_id", "embedding", k = 5,
        rerank = 50, residual = true)
      val exact = Similarity.bruteForceTopK(e, qs, "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("nbr_id"), lit(1L).as("hit"))
      pq.join(exact, Seq("query_id", "nbr_id"), "left")
        .select(col("query_id"), col("nbr_id"), col("cosine_micro"), col("rank"),
          coalesce(col("hit"), lit(0L)).as("hit"))
        .orderBy("query_id", "rank")
    }),
    // no-retrain ingest assignment ✚ (the PQ store's write path, q115's
    // sibling): hash-shard 0 plays the ingest batch; the index is trained
    // on the REST (residual-encoded), and the batch gets its cell + m
    // codes from the STORED centroids/codebooks only — the oracle replays
    // corpus-restricted training, then the delta's pure-function argmin
    // assignment
    "q122_pq_ingest" -> ((s, d) => {
      val sharded = Ops.shardByHash(Tables.embeddings(s, d), "vec_id", 5)
      val corpus = sharded.filter(col("shard") =!= 0).drop("shard")
      val delta = sharded.filter(col("shard") === 0).drop("shard")
      val ix = Similarity.ivfPqIndex(corpus, "vec_id", "embedding", residual = true)
      val out = Similarity.assignToIvfPqIndex(delta, ix, "vec_id", "embedding")
        .select(col("id"), col("cell"), col("sub").cast("long").as("sub"), col("code"))
        .localCheckpoint(true)
      ix.release()
      out.orderBy("id", "sub")
    }),
    // standing BM25 index ✚ (r8 — the lexical sibling of q120's stored
    // vector index): tokenize/aggregate the corpus ONCE into postings +
    // doc lengths + term dfs + exact corpus scalars, persist, LOAD, and
    // answer the q92 query from stored state — no tokenization on the
    // query path; bit-identical scores, so the oracle IS q92's chain
    "q123_bm25_indexed" -> ((s, d) => {
      val ix = Search.bm25Index(Tables.documents(s, d), "doc_id", "text")
      val path = java.nio.file.Files.createTempDirectory("graft_bm25ix").toString
      Search.saveBm25Index(ix, path)
      ix.release()
      val loaded = Search.loadBm25Index(s, path)
      val out = Search.bm25TopKIndexed(loaded, Seq("spark", "join", "window"), k = 20)
        .localCheckpoint(true)
      loaded.release()
      out.orderBy("rank")
    }),
    // BM25 ingest fold ✚: hash-shard 0 plays the ingest batch; its
    // postings/lengths union in and dfs + corpus scalars ADD — all exact
    // long arithmetic, so the extended index is bit-indistinguishable
    // from a full rebuild and the oracle is again q92's full-corpus chain
    // (a STRONGER gate than the approximate indexes can offer)
    "q124_bm25_ingest" -> ((s, d) => {
      val sharded = Ops.shardByHash(Tables.documents(s, d), "doc_id", 5)
      val corpus = sharded.filter(col("shard") =!= 0).drop("shard")
      val delta = sharded.filter(col("shard") === 0).drop("shard")
      val ix = Search.bm25Index(corpus, "doc_id", "text")
      val ext = Search.extendBm25Index(ix, delta, "text")
      val out = Search.bm25TopKIndexed(ext, Seq("spark", "join", "window"), k = 20)
        .localCheckpoint(true)
      ext.release(); ix.release()
      out.orderBy("rank")
    }),
    // filtered ANN ✚ (metadata predicate + top-k — table stakes for a
    // real vector store): the allowed-id set semi-joins the probed-cell
    // candidates BEFORE any ADC scoring, so the filter makes the search
    // cheaper; top-5 among label<8 docs only
    "q125_ann_filtered" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val qs = e.filter(col("vec_id") < 10)
      val ix = Similarity.ivfPqIndex(e, "vec_id", "embedding")
      val out = Similarity.ivfPqTopKIndexed(ix, qs, "vec_id", "embedding",
        k = 5, rerank = 50,
        allowed = Some(e.filter(col("label") < 8).select("vec_id")))
      ix.release()
      out.orderBy("query_id", "rank")
    }),
    // the deployed retrieval stack in one query ✚ (q108's standing-index
    // twin): BOTH stores built once — the BM25 postings index and the
    // IVF-PQ vector index — searched from stored state, RRF-fused. Each
    // half is bit-identical to its from-scratch sibling, so the oracle
    // composes the q92-style lexical chain with the q120 vector chain
    "q126_hybrid_indexed" -> ((s, d) => {
      import s.implicits._
      val qs = Seq((0L, "spark"), (0L, "join"),
          (1L, "window"), (1L, "merge"), (1L, "sort"))
        .toDF("query_id", "term")
      val bIx = Search.bm25Index(Tables.documents(s, d), "doc_id", "text")
      val bm = Search.bm25PerQueryIndexed(bIx, qs, "query_id", "term", k = 10)
        .select(col("query_id"), col("doc_id"), col("rank")).localCheckpoint(true)
      bIx.release()
      val e = Tables.embeddings(s, d)
      val vIx = Similarity.ivfPqIndex(e, "vec_id", "embedding")
      val ann = Similarity.ivfPqTopKIndexed(vIx, e.filter(col("vec_id") < 10),
          "vec_id", "embedding", k = 5, rerank = 50)
        .filter(col("query_id").isin(0L, 1L))
        .select(col("query_id"), col("nbr_id").as("doc_id"), col("rank"))
      vIx.release()
      Search.fuseRrf(Seq(bm, ann), "query_id", "doc_id", k = 10)
        .orderBy("query_id", "rank")
    }),
    // learned BPE vocabulary training ✚ (Sennrich 2016): 8 merge rounds
    // over the unique-word-frequency table; every pair count an exact
    // weighted long sum, argmax tie-broken (count DESC, left, right) —
    // the oracle unrolls the identical loop as a CTE chain whose greedy
    // merge fold is DuckDB's list_reduce of the same accumulator logic
    "q127_bpe_train" -> ((s, d) =>
      Bpe.train(Tables.documents(s, d), "text", numMerges = 8).orderBy("rank")),
    // BPE encode ✚ — two code paths, one answer: the Spark side RE-ENCODES
    // the corpus dictionary by sequentially applying the learned merges
    // (fresh fold chain per word), while the oracle reads the TRAINING
    // loop's final segmentation state — equal only because greedy merge
    // application commutes with the training iteration order
    "q128_bpe_encode" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val merges = Bpe.train(docs, "text", numMerges = 8).orderBy("rank")
        .collect().map(r => (r.getString(1), r.getString(2))).toSeq
      Bpe.pieceCounts(docs, "text", merges)
        .orderBy(col("total").desc, col("piece")).limit(20)
    }),
    // per-doc token budgets under the LEARNED vocab ✚ — the dictionary
    // join-back shape: encode each unique word ONCE (vocab-sized fold),
    // then one (doc, word) equi-join + per-doc sum; oracle reads the
    // training chain's final state, Spark re-encodes fresh
    "q130_bpe_doc_tokens" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val merges = Bpe.train(docs, "text", numMerges = 8).orderBy("rank")
        .collect().map(r => (r.getString(1), r.getString(2))).toSeq
      Bpe.docPieceCounts(docs, "doc_id", "text", merges)
        .orderBy(col("n_pieces").desc, col("doc_id")).limit(20)
    }),
    // bloom-pruned fact⋈dim join ✚: the urgent-orders keys build a
    // ~4 KB bloom tested on the lineitem scan BEFORE the join's exchange
    // (the 100-TB shuffle-prune shape; Spark's runtime-filter injection
    // in library form, caller-controlled). No false negatives, so the
    // result — and the oracle — is EXACTLY the plain join
    "q129_bloom_join" -> ((s, d) => {
      val big = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_extendedprice"),
          col("l_discount"), col("l_returnflag"))
      val small = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey").as("l_orderkey"))
      Joins.bloomPrunedJoin(big, small, "l_orderkey")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_rows"),
          sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
            .cast(LongType)).as("revenue_cents"))
        .orderBy("l_returnflag")
    }),
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
    // fuzzy (edit-distance ≤2) self-join ✚ of the part-name vocabulary —
    // the record-linkage shape. FastSS deletion-neighborhood signatures
    // make candidates a keyed equi-join (lossless: within-distance pairs
    // ALWAYS share a signature), levenshtein verifies; the oracle is the
    // naive all-pairs filter the signature scheme avoids at scale
    "q132_fuzzy_join" -> ((s, d) => {
      val names = Tables.part(s, d).groupBy(col("p_name").as("name"))
        .agg(count(lit(1)).as("n_parts"))
      Joins.fuzzySelfPairs(names, "name", "name", maxDist = 2)
        .select(col("id_a").as("name_a"), col("id_b").as("name_b"),
          col("dist").cast(LongType).as("dist"))
        .join(names.select(col("name").as("name_a"), col("n_parts").as("n_a")), Seq("name_a"))
        .join(names.select(col("name").as("name_b"), col("n_parts").as("n_b")), Seq("name_b"))
        .select(col("name_a"), col("name_b"), col("dist"), col("n_a"), col("n_b"))
        .orderBy("name_a", "name_b")
    }),
    // multinomial Naive Bayes language ID ✚ — train on the 80% hash split,
    // classify the held-out 20%; every ln quantized to micro-nats per
    // (label, token) BEFORE the long sums, so the argmax label is
    // engine-stable (ties → lexicographically first label)
    "q133_nb_classify" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val model = Classify.nbTrain(docs.filter(col("doc_id") % 5 =!= 0), "lang", "text")
      val test = docs.filter(col("doc_id") % 5 === 0)
      Classify.nbPredict(model, test, "doc_id", "text")
        .join(test.select(col("doc_id"), col("lang").as("true_lang")), Seq("doc_id"))
        .orderBy("doc_id")
    }),
    // MMR diversified re-rank ✚ of the q31 brute-force top-20 (λ=1/2,
    // k=5): nano-quantized relevances and pairwise sims, integer greedy
    // argmax each round — the selection SEQUENCE is engine-exact, and the
    // oracle replays all 5 rounds as unrolled CTEs (the q127 pattern)
    "q134_mmr_rerank" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val cand = Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 10),
          "vec_id", "embedding", k = 20)
        .select(col("query_id"), col("nbr_id"),
          round(col("cosine") * 1e9).cast(LongType).as("rel_nano"))
      Similarity.mmrRerank(cand, e, "vec_id", "embedding", k = 5)
        .orderBy("query_id", "mmr_rank")
    }),
    // PMI collocations ✚ (Church & Hanks 1990): top-20 adjacent pairs
    // co-occurring above independence, min support 5 — micro-nat integer
    // PMI, the tokenizer-pipeline's merge-candidate audit
    "q135_pmi_collocations" -> ((s, d) => {
      Lm.pmiCollocations(Tables.documents(s, d), "text", minCount = 5)
        .orderBy(col("pmi_micro").desc, col("w1"), col("w2")).limit(20)
    }),
    // standing FastSS fuzzy dictionary ✚ (r9): the part-name vocabulary
    // md5-split into a base dictionary, an ingest batch, and a probe set;
    // signatures built over base, EXTENDED with the batch (pure per-row
    // function — extend ≡ rebuild), persisted, reloaded, and probed.
    // Index-probe ≡ the naive probe×dict all-pairs levenshtein the oracle
    // runs — the record-linkage deployment shape: dictionary indexed once,
    // every ingest batch probed with a signature equi-join
    "q136_fuzzy_index" -> ((s, d) => {
      val names = Tables.part(s, d).select(col("p_name").as("name")).distinct()
      val base = names.filter(md5(col("name")) >= "4")
      val batch = names.filter(md5(col("name")) >= "2" && md5(col("name")) < "4")
      val probe = names.filter(md5(col("name")) < "2")
      val path = java.nio.file.Files.createTempDirectory("graft_fzix").toString
      val ix0 = Joins.fuzzyIndex(base, "name", "name", maxDist = 2)
      val ext = Joins.extendFuzzyIndex(ix0, batch)
      Joins.saveFuzzyIndex(ext, path)
      ext.release(); ix0.release()
      val ix = Joins.loadFuzzyIndex(s, path)
      val out = Joins.fuzzyProbe(ix, probe, "name", "name")
        .select(col("id_l").as("name_p"), col("id_r").as("name_d"),
          col("dist").cast(LongType).as("dist"))
        .localCheckpoint(true)
      ix.release()
      out.orderBy("name_p", "name_d")
    }),
    // per-group centroid outliers ✚ (r9): 8 pseudo-domains (vec_id % 8),
    // bottom-5 cosine-to-centroid per group — the "doesn't belong to its
    // domain" curation prune. The centroid enters as the per-dim integer
    // SUM (cosine is scale-invariant), so the only double rounding is the
    // final nano-quantized cosine — engine-exact ranks
    "q137_centroid_outliers" -> ((s, d) => {
      Similarity.centroidOutliers(
          Tables.embeddings(s, d).withColumn("grp", pmod(col("vec_id"), lit(8L))),
          "vec_id", "embedding", "grp", k = 5)
        .orderBy("grp", "rank")
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
    // per-doc character-level Shannon entropy ✚ (r9): the compressibility
    // quality signal — micro-nat total + char count (mean = total/n, no
    // division baked in), one rounded ln per scalar, exact long sums
    "q140_char_entropy" -> ((s, d) => {
      graft.functions.Repetition.charEntropy(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id")
    }),
    // deterministic negative sampling ✚ (r9): 4 hash-ring successors per
    // anchor doc — contrastive-pair generation as a pure function of
    // (anchor, j, seed); the oracle replays the ring with correlated
    // min-successor subqueries (the naive form the bucketed join avoids)
    "q141_negative_sample" -> ((s, d) => {
      Ops.negativeSample(Tables.documents(s, d).select("doc_id"), "doc_id",
          k = 4, seed = 42L)
        .select(col("anchor_id"), col("j").cast(LongType).as("j"), col("neg_id"))
        .orderBy("anchor_id", "j")
    }),
    // top-mass (nucleus) curation ✚ (r9): keep each source's best docs (by
    // n_chars, id ties) until they cover 3/5 of the source's token mass —
    // exact rational test (prior·5 < total·3), no float thresholds
    "q142_top_mass" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("source"), col("doc_id"), col("n_chars"),
          Text.tokenCount(col("text")).cast(LongType).as("w"))
      Ops.takeTopMass(docs, Seq("source"), "doc_id", "n_chars", "w",
          pNum = 3, pDen = 5)
        .orderBy("source", "doc_id")
    }),
    // exact per-group OLS regression ✚ (r9): price-per-quantity trend line
    // from fixed-order plain sums (cents are integral -> exact sums ->
    // engine-identical doubles), where built-in regr_slope/regr_intercept
    // are partition-order dependent; q76's pattern extended to the fit line
    "q143_linreg_exact" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
        .withColumn("cents", round(col("l_extendedprice") * 100).cast(LongType))
      Grouping.groupby(l, Seq("l_returnflag"))
        .linregExact("l_quantity", "cents", "slope_cents", "intercept_cents")
        .orderBy("l_returnflag")
    }),
    // mergeable aggregate state ✚ (r9): the materialized-view maintenance
    // shape — 4 hash-shards each build a small per-source state (count/sum/
    // min/max), the states FOLD, and the fold ≡ a full-scan rebuild because
    // every component is associative-commutative; the oracle is the plain
    // GROUP BY the fold must reproduce bit-for-bit (exact long sums)
    "q144_agg_state_fold" -> ((s, d) => {
      val sharded = Ops.shardByHash(Tables.documents(s, d), "doc_id", 4)
      val states = (0L until 4L).map { i =>
        Grouping.aggState(sharded.filter(col("shard") === i).drop("shard"),
          Seq("source"), Seq("n_chars"))
      }
      Grouping.finalizeAggState(
          Grouping.mergeAggStates(Seq("source"), states: _*))
        .orderBy("source")
    }),
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
    // column mutual information ✚ (r9): does `lang` carry information about
    // `source`? — MI over the joint distribution, each cell's term
    // quantized to micro-nats before the exact long sum (q94's contract)
    "q147_mutual_info" -> ((s, d) => {
      Lm.mutualInfo(Tables.documents(s, d), "lang", "source")
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
    // Welch two-sample t ✚ (r9): the A/B-test statistic for click-vs-view
    // spend — conditional exact cent sums in ONE aggregation, one fixed
    // division tree both engines share, micro-quantized t
    "q150_welch_ab" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .withColumn("cents", round(col("value") * 100).cast(LongType))
      Stats.welchT(ev, "event_type", "cents", "click", "view")
    }),
    // chi-squared independence ✚ (r9): lang × source over the contingency
    // grid INCLUDING structural zeros (marginal cross product, cell-sized);
    // per-cell terms micro-quantized before the exact long sum
    "q151_chi_squared" -> ((s, d) => {
      Stats.chiSquared(Tables.documents(s, d), "lang", "source")
    }),
    // trailing-baseline anomaly z ✚ (r9): 6-hour event-type volumes scored
    // against their previous 8 windows — exact counts, one fixed z tree,
    // insufficient-history windows null (not "anomalous")
    "q152_anomaly_z" -> ((s, d) => {
      Streams.anomalyScores(Tables.events(s, d), "event_type", "ts",
          windowMinutes = 360, baselineWindows = 8)
        .orderBy("event_type", "bucket_us")
    }),
    // exact ROC-AUC ✚ (r9): does order value separate finished from open
    // orders — tie-corrected rank-sum in exact longs, two-level prefix sum
    // (no data-sized single-partition window), one shared final division
    "q153_roc_auc" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .withColumn("cents", round(col("o_totalprice") * 100).cast(LongType))
        .withColumn("is_f", col("o_orderstatus") === "F")
      Stats.rocAuc(o, "cents", "is_f", bucketWidth = 1000000L)
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
    // robust MAD outlier screen ✚ (r9): per-language length outliers —
    // all-integer flag (20·|2x−med2| > k10·mad4), no floating point at all
    "q155_robust_outliers" -> ((s, d) => {
      Stats.robustOutliers(Tables.documents(s, d), "lang", "n_chars", k10 = 35)
        .orderBy(col("lang"))
    }),
    // interval union / coverage ✚ (r9): 30-minute activity spans per user
    // merged overlap-once — exact long sweep, one shuffle, per-key windows
    "q156_interval_coverage" -> ((s, d) => {
      val iv = Tables.events(s, d)
        .withColumn("lo", unix_micros(col("ts")))
        .withColumn("hi", col("lo") + lit(1800000000L))
      Intervals.coverage(iv, "user_id", "lo", "hi")
        .orderBy(col("user_id"))
    }),
    // value concentration ✚ (r9): exact Gini + top-decile share of
    // customer revenue — Decimal(38,0) rank-weighted sum, two-level ranks
    "q157_concentration" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .withColumn("cents", round(col("o_totalprice") * 100).cast(LongType))
      Stats.concentration(o, "o_custkey", "cents", bucketWidth = 10000000L)
    }),
    // Markov transitions ✚ (r9): behavioral event-type bigram matrix —
    // key-partitioned lead, exact counts, micro-quantized row-normalized p
    "q158_transitions" -> ((s, d) => {
      Sequences.transitionCounts(Tables.events(s, d), "user_id", "event_type",
          "ts", "event_id")
        .orderBy(col("from_state"), col("to_state"))
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
        .orderBy(col("diff_status"))
    }),
    // WoE / IV feature screen ✚ (r9): how strongly `source` separates
    // English from the rest — exact counts, shared ln tree, micro-quantized
    "q160_woe_iv" -> ((s, d) => {
      val doc = Tables.documents(s, d).withColumn("is_en", col("lang") === "en")
      Stats.woeIv(doc, "source", "is_en")
        .orderBy(col("source"))
    }),
    // time-weighted mean ✚ (r9): per-user TWAP of event value — each value
    // holds until the next event; exact cent×micro products in Decimal(38,0)
    "q161_twap" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .withColumn("cents", round(col("value") * 100).cast(LongType))
        .withColumn("ts_us", unix_micros(col("ts")))
      Sequences.timeWeightedMean(ev, "user_id", "ts_us", "cents", "event_id")
        .orderBy(col("user_id"))
    }),
    // incremental transition fold ✚ (r9): the q158 matrix rebuilt as
    // standing state + strictly-later ingest — history is never re-scanned
    // (one carried last-event row per key stitches the boundary pair); the
    // query IS the equivalence gate: fold(first half, second half) must
    // equal the full-data oracle count-for-count
    "q162_transitions_incremental" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .filter(col("user_id").isNotNull && col("event_type").isNotNull)
        .withColumn("ts_us", unix_micros(col("ts")))
        .select(col("user_id"), col("event_type"), col("ts_us"), col("event_id"))
      // deterministic mid-range split; boundary rows go to the batch
      val mid = ev.agg(((min(col("ts_us")) + max(col("ts_us"))) / 2)
        .cast(LongType).as("mid"))
      val tagged = ev.crossJoin(broadcast(mid))
      val hist = tagged.filter(col("ts_us") < col("mid")).drop("mid")
      val batch = tagged.filter(col("ts_us") >= col("mid")).drop("mid")
      val (c0, l0) = Sequences.transitionState(hist, "user_id", "event_type",
        "ts_us", "event_id")
      val (c1, _) = Sequences.ingestTransitions(c0, l0, batch, "user_id",
        "event_type", "ts_us", "event_id")
      c1.orderBy(col("from_state"), col("to_state"))
    }),
    // wide→long melt ✚ (r9): the q36 pivot inverted by Spark's native
    // unpivot (an Expand node — |cols| projections, NO shuffle, no
    // explode-over-array that would block column pruning)
    "q164_melt" -> ((s, d) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val wide = Tables.events(s, d)
        .groupBy(col("user_id"))
        .pivot("event_type", types)
        .agg(count(lit(1)))
        .na.fill(0L)
      Ops.melt(wide, Seq("user_id"), types, "event_type", "n_events")
        .orderBy(col("user_id"), col("event_type"))
    }),
    // rendezvous sharding ✚ (r9): HRW argmax over md5(key:shard) — the
    // stateful-shard assignment that moves only ~1/(n+1) keys on regrow
    // (modulo remaps ~100%); pure codegen'd per-row fold, no shuffle
    "q165_rendezvous" -> ((s, d) => {
      Layout.rendezvousAssign(Tables.documents(s, d).select(col("doc_id")),
          "doc_id", nShards = 8)
        .orderBy(col("doc_id"))
    }),
    // grouped KS sweep ✚ (r9): every event type's spend drift in ONE pass
    // — per-segment monitoring as one shuffle, not |segments| jobs
    "q181_ks_by_group" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .withColumn("cents", round(col("value") * 100).cast(LongType))
        .withColumn("ts_us", unix_micros(col("ts")))
      val mid = ev.agg((min(col("ts_us"))
        + floor((max(col("ts_us")) - min(col("ts_us"))) / 2))
        .cast(LongType).as("mid"))
      val tagged = ev.crossJoin(broadcast(mid))
      Stats.ksTestByGroup(tagged.filter(col("ts_us") < col("mid")),
          tagged.filter(col("ts_us") >= col("mid")), "event_type", "cents",
          bucketWidth = 100L)
        .orderBy(col("event_type"))
    }),
    // count-min sketch ✚ (r9): mergeable relational frequency cells — the
    // sketch is built per half of the stream, MERGED by cell-wise sum, and
    // every user's event count estimated from merged state; md5 row hashes
    // make the estimates engine-exact (one-sided: est ≥ exact always)
    "q182_countmin" -> ((s, d) => {
      val ev = Tables.events(s, d).filter(col("user_id").isNotNull)
      val (depth, width) = (4, 256)
      // null-safe, sign-safe split (ADVICE r9 §3): a bare `% 2 === 0/1`
      // drops null event_ids (and negative odds, where % yields −1) from
      // BOTH halves while `exact` still counts them — breaking the
      // one-sided est ≥ exact contract; pmod(coalesce(·,0), 2) partitions
      // every row into exactly one half
      val half = pmod(coalesce(col("event_id"), lit(0L)), lit(2L))
      val halves = Seq(ev.filter(half === 0), ev.filter(half === 1))
        .map(h => Sketches.countMinBuild(h, "user_id", depth, width))
      val merged = Sketches.countMinMerge(halves)
      val exact = ev.groupBy(col("user_id")).agg(count(lit(1)).as("c_exact"))
      Sketches.countMinProbe(merged, ev, "user_id", depth, width)
        .join(exact, Seq("user_id"))
        .select(col("user_id"), col("c_exact"), col("c_est"),
          (col("c_est") - col("c_exact")).as("overcount"))
        .orderBy(col("user_id"))
    }),
    // change-point detection ✚ (r9): per event type, WHEN did the spend
    // level shift — exact integer between-means contrast maximized over
    // every split, ties to the earliest; the level-shift monitor that
    // pairs with q181's "did it drift" KS sweep
    "q183_change_point" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .withColumn("cents", round(col("value") * 100).cast(LongType))
        .withColumn("ts_us", unix_micros(col("ts")))
      Stats.changePointByGroup(ev, "event_type", "ts_us", "event_id", "cents")
        .withColumnRenamed("split_o", "split_ts_us")
        .orderBy(col("event_type"))
    }),
    // Hamilton apportionment ✚ (r9): split a 100k-unit sampling budget
    // across sources pro rata to character mass — floors + largest
    // remainders, Σalloc ≡ budget exactly, no float rounding
    "q184_apportion" -> ((s, d) => {
      Pack.apportion(Tables.documents(s, d), Seq("source"), "n_chars",
          budget = 100000L)
        .orderBy(col("source"))
    }),
    // Good-Turing ✚ (r9): frequency-of-frequencies + adjusted counts —
    // the unseen-mass estimate (r=1 row: P0 = N1/T) a vocab/LM pipeline
    // reads before choosing its smoothing
    "q185_good_turing" -> ((s, d) => {
      Lm.goodTuring(Tables.documents(s, d), "text")
        .orderBy(col("r"))
    }),
    // winnowing ✚ (r9): MOSS positional fingerprints — any shared run of
    // ≥ k+w−1 chars leaves a shared fingerprint, so pairs LOCALIZE copied
    // spans (vs q27/q28's whole-doc resemblance); df-capped inverted index
    "q186_winnow_pairs" -> ((s, d) => {
      Dedup.winnowPairs(Tables.documents(s, d), "doc_id", "text",
          k = 8, w = 4, maxDf = 20)
        .filter(col("n_shared") >= 3)
        .orderBy(col("id_a"), col("id_b"))
    }),
    // retrieval eval ✚ (r9): MRR / recall@k / nDCG@k of a dim-truncated
    // retrieval run vs the exact top-10 — the scorecard grammar every ANN
    // dial is tuned by, with pre-rounded integer log discounts
    "q187_retrieval_eval" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val qs = emb.filter(col("vec_id") % 50 === 0)
      val truth = Similarity.bruteForceTopK(emb, qs, "vec_id", "embedding", k = 10)
      def cut(df: DataFrame) =
        df.select(col("vec_id"), slice(col("embedding"), 1, 16).as("embedding"))
      val sys = Similarity.bruteForceTopK(cut(emb), cut(qs), "vec_id", "embedding", k = 10)
      Similarity.rankingMetrics(sys, truth).orderBy(col("query_id"))
    }),
    // skyline ✚ (r9): per-brand Pareto frontier of (size, price) — the
    // "no other part beats it on both axes" curation shape, two-level
    // suffix max, exact over integer axes
    "q188_skyline" -> ((s, d) => {
      val p = Tables.part(s, d)
        .withColumn("cents", round(col("p_retailprice") * 100).cast(LongType))
      Ops.skylinePerGroup(p, "p_brand", "p_size", "cents")
        .withColumnRenamed("x", "p_size").withColumnRenamed("ymax", "max_cents")
        .orderBy(col("p_brand"), col("p_size"))
    }),
    // average precision ✚ (r9): PR-curve area for the q153 score/label —
    // imbalance-robust ranking metric, id tie-break total order, per-row
    // two-level ranks, pre-rounded integer precision terms
    "q189_avg_precision" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .withColumn("cents", round(col("o_totalprice") * 100).cast(LongType))
        .withColumn("is_f", col("o_orderstatus") === "F")
      Stats.averagePrecision(o, "cents", "o_orderkey", "is_f",
        bucketWidth = 1000000L)
    }),
    // Poisson bootstrap ✚ (r9): deterministic seeded resampling — 64
    // map-side replicates from md5-derived Poisson(1) weights, CI from
    // order statistics of the replicate means; the scalable bootstrap
    "q190_bootstrap" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .withColumn("cents", round(col("value") * 100).cast(LongType))
      Stats.poissonBootstrapMean(ev, "event_id", "cents", reps = 64)
    }),
    // HITS ✚ (r9): hubs/authorities on the bipartite user→event-type
    // graph — 3 pure-integer rounds, one final max-normalized report;
    // string nodes, no id remapping
    "q191_hits" -> ((s, d) => {
      Graph.hits(Tables.events(s, d), "user_id", "event_type", iterations = 3)
        .orderBy(col("node"))
    }),
    // zone maps ✚ (r9): the measured I/O story behind q65's layout — the
    // SAME rows chunked under a natural vs a z-ordered layout, and the
    // chunk-pruning answer a partkey range predicate gets from each
    "q192_zone_maps" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
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
        .orderBy(col("layout"))
    }),
    // sorted-neighborhood blocking ✚ (r9): the Hernández–Stolfo candidate
    // generator — N·(w−1) pairs from sort-order locality, scored by the
    // q163 exact-rational Jaro-Winkler, matches kept at ≥ 0.9
    "q193_sorted_neighborhood" -> ((s, d) => {
      graft.expressions.GraftFunctions.register(s)
      val names = Tables.part(s, d).select(col("p_name").as("name")).distinct()
      Joins.sortedNeighborhoodPairs(names, "name", "name", window = 5)
        .select(col("id_a").as("name_a"), col("id_b").as("name_b"), col("gap"),
          call_function("graft_jw_micro", col("key_a"), col("key_b")).as("jw_micro"))
        .filter(col("jw_micro") >= 900000L)
        .orderBy(col("name_a"), col("name_b"))
    }),
    // rank-biased overlap ✚ (r9): top-weighted similarity of the q187
    // run pair WITHOUT designating a truth side — pre-rounded weight
    // lookup at the worse rank, exact integer sums
    "q194_rbo" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val qs = emb.filter(col("vec_id") % 50 === 0)
      val truth = Similarity.bruteForceTopK(emb, qs, "vec_id", "embedding", k = 10)
      def cut(df: DataFrame) =
        df.select(col("vec_id"), slice(col("embedding"), 1, 16).as("embedding"))
      val sys = Similarity.bruteForceTopK(cut(emb), cut(qs), "vec_id", "embedding", k = 10)
      Similarity.rboOverlap(sys, truth).orderBy(col("query_id"))
    }),
    // vocabulary growth ✚ (r9): the Heaps'-law saturation curve — one
    // corpus scan, per-type first-checkpoint assignment, running sums
    // over the checkpoint table
    "q195_vocab_growth" -> ((s, d) => {
      Lm.vocabGrowth(Tables.documents(s, d), "doc_id", "text",
          Seq(16L, 64L, 256L, 1024L, 4096L, 16384L))
        .orderBy(col("k"))
    }),
    // classifier calibration ✚ (r9): holdout accuracy by exact decision-
    // margin bucket — the abstain-threshold / reliability report over the
    // q133 NB stack; margins are exact micro-nat integer gaps
    "q180_nb_calibration" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val model = Classify.nbTrain(docs.filter(col("doc_id") % 5 =!= 0), "lang", "text")
      val test = docs.filter(col("doc_id") % 5 === 0 && col("lang").isNotNull)
      val w = 500000L
      Classify.nbPredictTop2(model, test, "doc_id", "text")
        .join(test.select(col("doc_id"), col("lang").as("true_lang")), Seq("doc_id"))
        .filter(col("margin_micro").isNotNull)
        .withColumn("bucket",
          ((col("margin_micro") - ((col("margin_micro") % w + w) % w)) / w)
            .cast(LongType))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          count(when(col("pred_label") === col("true_lang"), lit(1))).as("n_correct"))
        .select(col("bucket"), col("n_docs"), col("n_correct"),
          round(col("n_correct").cast("double") / col("n_docs").cast("double") * 1e6)
            .cast(LongType).as("acc_micro"))
        .orderBy(col("bucket"))
    }),
    // Kaplan-Meier churn ✚ (r9): survival of user activity spans (hours),
    // censored when the last event falls in the final 10% of the range —
    // log-space product with per-level rounded-ln terms, two-level prefixes
    "q179_kaplan_meier" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .filter(col("user_id").isNotNull && col("ts").isNotNull)
        .withColumn("ts_us", unix_micros(col("ts")))
      val spans = ev.groupBy(col("user_id"))
        .agg(min(col("ts_us")).as("f"), max(col("ts_us")).as("l"))
      val bounds = ev.agg(min(col("ts_us")).as("gmin"), max(col("ts_us")).as("gmax"))
      val hourUs = 3600000000L
      val obs = spans.crossJoin(broadcast(bounds))
        .withColumn("cut",
          col("gmax") - floor((col("gmax") - col("gmin")) / 10).cast(LongType))
        .withColumn("span", col("l") - col("f"))
        .withColumn("dur", ((col("span") - col("span") % hourUs) / hourUs).cast(LongType))
        .withColumn("churned", col("l") < col("cut"))
      Stats.kaplanMeier(obs, "dur", "churned", bucketWidth = 100L)
    }),
    // tokenizer fertility ✚ (r9): pieces-per-token by language under the
    // corpus-learned BPE — the vocabulary-fairness diagnostic (a language
    // the tokenizer under-serves pays more sequence length per word)
    "q178_bpe_fertility" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val merges = Bpe.train(docs, "text", numMerges = 8).orderBy("rank")
        .collect().map(r => (r.getString(1), r.getString(2))).toSeq
      Bpe.docPieceCounts(docs, "doc_id", "text", merges)
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
        .filter(col("lang").isNotNull)
        .groupBy(col("lang"))
        .agg(sum(col("n_tokens")).as("n_tokens"),
          sum(col("n_pieces")).as("n_pieces"))
        .select(col("lang"), col("n_tokens"), col("n_pieces"),
          round(col("n_pieces").cast("double") / col("n_tokens").cast("double") * 1e6)
            .cast(LongType).as("fertility_micro"))
        .orderBy(col("lang"))
    }),
    // containment pairs ✚ (r9): the quote/excerpt detector — asymmetric
    // overlap over the df-capped shingle vocabulary; exact integer
    // threshold (inter·den ≥ num·min), inverted-index candidates only
    "q177_containment" -> ((s, d) => {
      Dedup.containmentPairs(Tables.documents(s, d), "doc_id", "text",
          n = 3, thrNum = 8, thrDen = 10, maxDf = 10)
        .orderBy(col("id_a"), col("id_b"))
    }),
    // entity resolution ✚ (r9): the record-linkage stack end-to-end —
    // FastSS signature candidates → codegen'd JW decision edges (≥0.93) →
    // star-contraction components → lexicographic-min canonical name
    "q176_entity_resolution" -> ((s, d) => {
      graft.expressions.GraftFunctions.register(s)
      val names = Tables.part(s, d).select(col("p_name").as("name")).distinct()
      val edges = Joins.fuzzySelfPairs(names, "name", "name", maxDist = 2)
        .withColumn("jw", call_function("graft_jw_micro", col("id_a"), col("id_b")))
        .filter(col("jw") >= 930000L)
        .select(col("id_a"), col("id_b"))
      Dedup.connectedComponents(edges, names, "name")
        .filter(col("id") =!= col("component"))
        .select(col("id").as("name"), col("component").as("canon_name"))
        .orderBy(col("name"))
    }),
    // markup stripping ✚ (r9): synthetic HTML wrapped around real text,
    // stripped back to clean prose — tags, entities (&amp; last), whitespace
    "q174_strip_markup" -> ((s, d) => {
      val marked = Tables.documents(s, d)
        .withColumn("raw", concat(lit("<html><p class=\"x\">"),
          substring(col("text"), 1, 60), lit("</p> &amp;amp; <br/>done&nbsp;&#39;q&#39;")))
      marked.select(col("doc_id"),
          length(col("raw")).cast(LongType).as("len_raw"),
          Text.stripMarkup(col("raw")).as("clean"))
        .select(col("doc_id"), col("len_raw"),
          length(col("clean")).cast(LongType).as("len_clean"),
          md5(col("clean")).as("clean_md5"))
        .orderBy(col("doc_id"))
    }),
    // native session_window ✚ (r9): the q44 sessions as ONE hash-aggregate
    // GROUP BY key (runs unchanged as a watermarked streaming agg); half-
    // open boundary — an event exactly `gap` later starts a new session
    "q175_session_window" -> ((s, d) => {
      Streams.sessionWindowAgg(Tables.events(s, d), gapMinutes = 30)
        .orderBy(col("user_id"), col("start_us"))
    }),
    // hashing-trick features ✚ (r9): stateless fixed-dim categorical
    // encoding (single + crossed) — no vocabulary fit, no schema explosion;
    // md5-based so any engine replays the exact buckets
    "q173_feature_hash" -> ((s, d) => {
      val hashed = graft.ml.TableCleaner.hashFeatures(
        Tables.documents(s, d).select(col("doc_id"), col("lang"), col("source")),
        Seq(Seq("lang"), Seq("source")), dim = 16)
      graft.ml.TableCleaner.hashFeatures(hashed,
          Seq(Seq("lang", "source")), dim = 64)
        .select(col("doc_id"), col("hx_lang"), col("hx_source"),
          col("hx_lang_source"))
        .orderBy(col("doc_id"))
    }),
    // two-sample KS ✚ (r9): spend distribution, first half vs second half —
    // the continuous drift monitor (q166 PSI is the categorical sibling);
    // exact integer max over the merged step grid, Decimal(38,0) products
    "q171_ks_drift" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .withColumn("cents", round(col("value") * 100).cast(LongType))
        .withColumn("ts_us", unix_micros(col("ts")))
      val mid = ev.agg((min(col("ts_us"))
        + floor((max(col("ts_us")) - min(col("ts_us"))) / 2))
        .cast(LongType).as("mid"))
      val tagged = ev.crossJoin(broadcast(mid))
      Stats.ksTest(tagged.filter(col("ts_us") < col("mid")),
        tagged.filter(col("ts_us") >= col("mid")), "cents", bucketWidth = 100L)
    }),
    // exact Spearman ✚ (r9): quantity vs line revenue — tie-averaged ranks
    // as exact integers (2·below + cnt + 1), two-level prefix ranks
    "q172_spearman" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
        .withColumn("qty", col("l_quantity").cast(LongType))
        .withColumn("cents", round(col("l_extendedprice") * 100).cast(LongType))
      Stats.spearman(l, "qty", "cents", bucketWidth = 1000000L)
    }),
    // decontamination ✚ (r9): training docs sharing any 5-gram with the
    // held-out benchmark slice — the eval-leak screen; ONE keyed equi-join
    // against the (broadcastable) benchmark shingle set
    "q169_decontaminate" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val isBench = md5(col("doc_id").cast("string")) < "10"
      Dedup.decontaminate(docs.filter(!isBench), "doc_id", "text",
          docs.filter(isBench), "text", n = 5)
        .orderBy(col("train_id"))
    }),
    // trimmed mean ✚ (r9): per-priority order value with 10% trimmed each
    // side — exact kept sums, tie-invariant cut
    "q170_trimmed_mean" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .withColumn("cents", round(col("o_totalprice") * 100).cast(LongType))
      Grouping.trimmedMean(o, "o_orderpriority", "cents", pNum = 1, pDen = 10)
        .orderBy(col("o_orderpriority"))
    }),
    // PSI drift ✚ (r9): event-type distribution, first half vs second half
    // of the time range — appeared/vanished levels flagged, never epsilon'd
    "q166_psi_drift" -> ((s, d) => {
      val ev = Tables.events(s, d).withColumn("ts_us", unix_micros(col("ts")))
      val mid = ev.agg((min(col("ts_us"))
        + floor((max(col("ts_us")) - min(col("ts_us"))) / 2))
        .cast(LongType).as("mid"))
      val tagged = ev.crossJoin(broadcast(mid))
      Stats.psi(tagged.filter(col("ts_us") < col("mid")),
          tagged.filter(col("ts_us") >= col("mid")), "event_type")
        .orderBy(col("event_type"))
    }),
    // Benford audit ✚ (r9): leading digit of order cents vs log10(1+1/d) —
    // digit from the decimal STRING, never a double log
    "q167_benford" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .withColumn("cents", round(col("o_totalprice") * 100).cast(LongType))
      Stats.benford(o, "cents").orderBy(col("digit"))
    }),
    // Cohen's kappa ✚ (r9): chance-corrected agreement between the gold
    // lang column and the q23 n-gram heuristic — the labeler-eval statistic
    "q168_kappa" -> ((s, d) => {
      val doc = Tables.documents(s, d)
        .filter(col("lang").isNotNull)
        .select(col("lang"), Text.langId(col("text")).as("lang_id"))
      Stats.cohenKappa(doc, "lang", "lang_id")
    }),
    // Jaro-Winkler fuzzy rerank ✚ (r9): the q132 FastSS candidate pairs
    // scored by the codegen'd exact-rational graft_jw_micro expression —
    // record-linkage ranking without a single float
    "q163_jw_rerank" -> ((s, d) => {
      graft.expressions.GraftFunctions.register(s)
      val names = Tables.part(s, d).select(col("p_name").as("name")).distinct()
      Joins.fuzzySelfPairs(names, "name", "name", maxDist = 2)
        .select(col("id_a").as("name_a"), col("id_b").as("name_b"),
          col("dist").cast(LongType).as("dist"),
          call_function("graft_jw_micro", col("id_a"), col("id_b")).as("jw_micro"))
        .orderBy(col("name_a"), col("name_b"))
    }),
    // sparse cosine all-pairs ✚: inverted-index candidates over 3-word
    // shingles, df-capped (a boilerplate shingle's df² fan-out never joins);
    // exact integer dots/norms -> engine-identical cosine, micro-quantized
    "q83_sparse_cosine" -> ((s, d) => {
      Similarity.sparseCosinePairs(Tables.documents(s, d), "doc_id",
          Text.wordShingles(col("text"), 3), threshold = 0.6, maxDf = 10)
        .select(col("doc_a"), col("doc_b"),
          round(col("cosine") * 1e6).cast(LongType).as("cosine_micro"))
        .orderBy("doc_a", "doc_b")
    }),
    // pair-recall scorecard for the near-dup path (q52's sibling, VERDICT r2
    // #4): LSH-found pairs vs an EXACT quantized-cosine threshold join. The
    // found side is the scale path (full corpus). The exact side is a
    // deliberate O(N²) nested-loop — the measurement's oracle — GATED to the
    // `cap` corpus rows with the smallest md5(id) (VERDICT r4 §wrong-2: it
    // used to run unbounded at the bench SF and would dominate any larger
    // one). The cap is a deterministic, id-uniform subsample, so recall
    // measured on its pairs is an unbiased estimate; at verification SFs
    // (N ≤ cap) it is a no-op and the scorecard stays exact. Measures the
    // DEFAULT dial, which since r6 adapts to the threshold (24 tables at
    // θ=0.3 < 0.4 — VERDICT r5 §next-2; 24 measured 0.946 pair recall at
    // sf0.1 where the old fixed 16 measured 0.856 on this corpus's hard
    // 0.3–0.5 cosine band).
    "q53_neardup_recall" -> ((s, d) => neardupRecallAt(s, d, nTables = 0)),
    // ----- ✚ as-of join (point-in-time) + bucketized range join ----------
    // attribution: each purchase matched to the user's most recent prior
    // view (merge_asof semantics; right side pre-aggregated to unique
    // (user, ts) so the match is deterministic on any engine)
    "q54_asof_join" -> ((s, d) => {
      val e = Tables.events(s, d)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val views = e.filter(col("event_type") === "view")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("value")).as("view_value"))
      Joins.asofJoin(purchases, views, Seq("user_id"), "ts")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"), col("value"),
          unix_micros(col("ts_r")).as("view_ts_us"), col("view_value"))
        .orderBy("event_id")
    }),
    // calibration binning: orders bucketed into per-priority price bands
    // (band edges from min/max — exact order-independent aggregates, so
    // both engines derive bit-identical bounds)
    "q55_range_join" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val bands = o.groupBy(col("o_orderpriority").as("band"))
        .agg(min(col("o_totalprice")).as("lo"),
          ((min(col("o_totalprice")) + max(col("o_totalprice"))) / 2).as("hi"))
      Joins.rangeJoin(o.select(col("o_orderkey"), col("o_totalprice")), "o_totalprice",
          bands, "lo", "hi", bucketWidth = 10000.0)
        .groupBy(col("band")).agg(count(lit(1)).as("n"))
        .orderBy("band")
    }),
    // interval-OVERLAP join ✚ (both sides are intervals, unlike q55's
    // point-in-interval): click/purchase pairs within 30 minutes per user,
    // expressed as overlapping 30-minute windows — each pair meets in
    // exactly one bucket (the intersection start's), so no dedup pass
    "q82_interval_join" -> ((s, d) => {
      val e = Tables.events(s, d).select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("us"), col("event_type"))
      val halfHourUs = 1800000000L
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          col("us").as("c_lo"), (col("us") + halfHourUs).as("c_hi"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("us").as("p_lo"), (col("us") + halfHourUs).as("p_hi"))
      Joins.intervalJoin(clicks, "c_lo", "c_hi", purchases, "p_lo", "p_hi",
          bucketWidth = 1800000000.0, on = Seq("user_id"))
        .select(col("user_id"), col("click_id"), col("purchase_id"))
        .orderBy("user_id", "click_id", "purchase_id")
    }),
    // salted skew join ✚: the fact side's rows spread over 8 salt shards,
    // the dim side replicated once per shard — a hot key's rows land on 8
    // reducers instead of one; result identical to the plain inner join
    "q86_salted_join" -> ((s, d) => {
      val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      val c = Tables.customer(s, d)
        .select(col("c_custkey").as("o_custkey"), col("c_name"))
      Joins.saltedJoin(o, c, Seq("o_custkey"), saltBuckets = 8)
        .orderBy("o_orderkey")
    }),
    // ----- ✚ corpus assembly: hash sampling, decontamination, packing ----
    // deterministic hash sample + shard: pure function of the id, so the
    // split re-derives identically on any engine/cluster (unlike sample())
    "q56_hash_sample" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Ops.shardByHash(Ops.sampleByHash(docs, "doc_id", 0.0, 0.25), "doc_id", 10)
        .select(col("doc_id"), col("shard"))
        .orderBy("doc_id")
    }),
    // stratified sample ✚: exactly 5 docs per (lang, source) stratum, taken
    // in id-hash order — the same md5-derived hash q56 re-derives, so the
    // selected set is a pure function of the data on any engine
    "q85_stratified_sample" -> ((s, d) => {
      Ops.sampleNPerGroup(Tables.documents(s, d), Seq("lang", "source"), "doc_id", 5)
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    }),
    // decontamination: hash-shard 0 stands in for the eval benchmark; flag
    // training docs containing >= half an eval doc's 3-gram shingles
    "q57_decontamination" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val sharded = Ops.shardByHash(docs, "doc_id", 5)
      val evalSet = sharded.filter(col("shard") === 0).drop("shard")
      val corpus = sharded.filter(col("shard") =!= 0).drop("shard")
      Dedup.contaminationPairs(corpus, evalSet, "doc_id", "text", n = 3, threshold = 0.5)
        .orderBy("train_id", "eval_id")
    }),
    // sequence packing: per-shard greedy token-budget bins (straddle rule)
    "q58_sequence_pack" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val withTok = docs.select(col("doc_id"),
        Text.tokenCount(col("text")).cast("long").as("n_tokens"))
      val sharded = Ops.shardByHash(withTok, "doc_id", 8)
      Pack.packSequences(sharded, "shard", "doc_id", "n_tokens", budget = 4096L)
        .select(col("doc_id"), col("shard"), col("bin_tokens_before"), col("bin"))
        .orderBy("doc_id")
    }),
    // per-domain cap: keep each (lang, source)'s 3 longest docs
    "q59_topk_per_key" -> ((s, d) => {
      Ops.topKPerKey(Tables.documents(s, d), Seq("lang", "source"),
          Seq(col("n_chars").desc, col("doc_id").asc), k = 3)
        .select(col("lang"), col("source"), col("doc_id"), col("n_chars"))
        .orderBy("lang", "source", "doc_id")
    }),
    // Gopher-style repetition signals: bigram coverage/duplication and
    // duplicate-line fractions per doc, parts-per-million (integer DIV)
    "q61_repetition" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val bi = Repetition.ngramRepetition(docs, "doc_id", "text", 2)
        .withColumnRenamed("n_ngrams", "n_bigrams")
        .withColumnRenamed("top_ngram_cover_ppm", "top_bigram_cover_ppm")
        .withColumnRenamed("dup_ngram_char_ppm", "dup_bigram_char_ppm")
      val li = Repetition.lineRepetition(docs, "doc_id", "text")
      bi.join(li, Seq("doc_id")).orderBy("doc_id")
    }),
    // PII scrub: seed each doc with deterministic synthetic PII (the corpus
    // itself is word-soup), then count + redact with the Java∩RE2 patterns
    "q62_pii_scrub" -> ((s, d) => {
      val seeded = Tables.documents(s, d).select(col("doc_id"), concat(
        col("text"),
        lit(" contact u"), col("doc_id").cast("string"),
        lit("@ex"), (col("doc_id") % 7).cast("string"), lit(".org ip 10."),
        (col("doc_id") % 200).cast("string"), lit(".0."),
        (col("doc_id") % 250).cast("string"), lit(" call +1 555-"),
        lpad((col("doc_id") % 1000).cast("string"), 3, "0"), lit("-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0")).as("ft"))
      seeded.select(col("doc_id"),
          Pii.emailCount(col("ft")).cast(LongType).as("n_email"),
          Pii.ipv4Count(col("ft")).cast(LongType).as("n_ip"),
          Pii.phoneCount(col("ft")).cast(LongType).as("n_phone"),
          md5(Pii.redact(col("ft"))).as("redacted_md5"),
          length(Pii.redact(col("ft"))).cast(LongType).as("n_chars_redacted"))
        .orderBy("doc_id")
    }),
    // domain mixing: cap each (lang, source) at a 3000-char budget, rows
    // admitted in deterministic hash order
    "q63_budget_sample" -> ((s, d) => {
      Ops.sampleToBudget(Tables.documents(s, d), Seq("lang", "source"),
          "doc_id", "n_chars", budget = 3000L)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
        .orderBy("doc_id")
    }),
    // mergeable-sketch distinct: per-shard HLL sketches of the token stream,
    // unioned to a global estimate; the oracle asserts the error bound
    // against the exact count (the estimate itself is approximate and not
    // partitioning-deterministic — see Sketches scaladoc)
    "q64_sketch_distinct" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(explode(Text.tokens(Text.normalize(col("text")))).as("token"))
      val sk = Sketches.sketch(Ops.shardByHash(toks, "token", 8), Seq("shard"), "token")
      val est = Sketches.mergeEstimate(sk, Nil)
      val exact = toks.agg(countDistinct(col("token")).as("n_exact"))
      exact.crossJoin(est).select(
        lit(8L).as("n_shards"), col("n_exact"),
        Sketches.withinTolerance(col("n_distinct_est"), col("n_exact"), 0.05)
          .as("within_5pct"))
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
        .orderBy("bucket")
    }),
    // one-pass column profiler (exact fields oracled; the HLL++ distinct
    // estimate is approx-by-contract and spec-checked instead — q64 policy)
    "q68_profile" -> ((s, d) => {
      val o = Tables.orders(s, d).select(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        round(col("o_totalprice") * 100).cast(LongType).as("price_cents"))
      operators.Profile.profile(o)
        .select("col_name", "n_rows", "n_nulls", "min_value", "max_value")
        .orderBy("col_name")
    }),
    // equi-width histogram ✚: 20 fixed bins over order totals in cents —
    // fixed bounds keep bins comparable across runs and the bin function
    // engine-portable; sentinel bins -1/-2/-3 catch out-of-range and nulls
    "q77_histogram" -> ((s, d) => {
      val o = Tables.orders(s, d).select(
        round(col("o_totalprice") * 100).cast(LongType).as("price_cents"))
      operators.Profile.histogram(o, "price_cents", 0.0, 60000000.0, 20)
        .orderBy("bin")
    }),
    // equal-frequency binning ✚: rank-percentile bins derived from the
    // per-VALUE count table (ntile semantics minus its engine-specific tie
    // split); rows are never globally sorted — the tiny value->bin map
    // broadcast-joins back onto the input
    "q84_quantile_bins" -> ((s, d) => {
      operators.Profile.equalFrequencyBins(Tables.lineitem(s, d), "l_quantity", 8)
        .groupBy("bin").agg(count(lit(1)).as("n"),
          min(col("l_quantity")).as("lo"), max(col("l_quantity")).as("hi"))
        .orderBy("bin")
    }),
    // nearest-direction as-of: closer of backward/forward click per purchase
    // (ties resolve backward); oracled via two DuckDB ASOF joins + CASE
    "q67_asof_nearest" -> ((s, d) => {
      val e = Tables.events(s, d)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = e.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts")).agg(max(col("value")).as("click_value"))
      Joins.asofJoin(purchases, clicks, Seq("user_id"), "ts", direction = "nearest")
        .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"),
          unix_micros(col("ts_r")).as("click_ts_us"), col("click_value"))
        .orderBy("event_id")
    }),
    // capstone assembly composite: quality/language gate → per-source token
    // budget (deterministic hash-order mixing) → writer shards → fixed-
    // budget sequence bins. Every stage is one of the audited operators;
    // the chain is what a training-data assembly job actually submits.
    "q66_assembly" -> ((s, d) => {
      val gated = Tables.documents(s, d)
        .withColumn("quality", Text.qualityScore(col("text")))
        .withColumn("lang_id", Text.langId(col("text")))
        .filter(col("quality") >= 0.5 && col("lang_id") === "en")
        .withColumn("n_tokens", Text.tokenCount(col("text")).cast(LongType))
      val mixed = Ops.sampleToBudget(gated, Seq("source"), "doc_id", "n_tokens",
        budget = 5000L)
      val sharded = Ops.shardByHash(mixed, "doc_id", 4)
      Pack.packSequences(sharded, "shard", "doc_id", "n_tokens", budget = 2048L)
        .select(col("doc_id"), col("source"), col("shard"), col("bin"), col("n_tokens"))
        .orderBy("doc_id")
    }),
    // recall scorecard: per query, how many of the exact top-5 the LSH and
    // IVF paths recovered — the honesty metric for the two ANN structures
    "q52_ann_recall" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val qs = e.filter(col("vec_id") < 10)
      val brute = Similarity.bruteForceTopK(e, qs, "vec_id", "embedding", k = 5)
        .select("query_id", "nbr_id")
      val lsh = Similarity.bucketedTopK(e, qs, "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("nbr_id"), lit(1L).as("hit_l"))
      val ivf = Similarity.ivfTopK(e, qs, "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("nbr_id"), lit(1L).as("hit_i"))
      brute.join(lsh, Seq("query_id", "nbr_id"), "left")
        .join(ivf, Seq("query_id", "nbr_id"), "left")
        .groupBy(col("query_id"))
        .agg(count(lit(1)).as("k"),
          sum(coalesce(col("hit_l"), lit(0L))).as("n_hit_lsh"),
          sum(coalesce(col("hit_i"), lit(0L))).as("n_hit_ivf"))
        .orderBy("query_id")
    }),
    // ----- ✚ event streams: batch twins of the streaming transforms --------
    "q34_tumbling_window" -> ((s, d) => {
      Streams.tumblingAgg(Tables.events(s, d), "1 hour")
        .orderBy("window_start_us", "event_type")
    }),
    // time-RANGE window frames ✚: per-user rolling 2-hour event count and
    // cents sum at every event (rangeBetween on event-time micros — the
    // value-based frame q17's ROWS frames don't exercise; one key shuffle)
    "q79_rolling_range" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts_us"))
        .rangeBetween(-7200000000L, Window.currentRow)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"),
          round(col("value") * 100).cast(LongType).as("cents"))
        .withColumn("n_2h", count(lit(1)).over(w))
        .withColumn("cents_2h", sum(col("cents")).over(w))
        .select("event_id", "user_id", "ts_us", "n_2h", "cents_2h")
        .orderBy("event_id")
    }),
    // dense resample ✚: 6-hour buckets with explicit zero rows for empty
    // intervals (pandas resample+asfreq analog; spine size = range/step,
    // independent of event volume)
    "q78_resample_dense" -> ((s, d) => {
      Streams.resampleDense(Tables.events(s, d), "ts", "value", everyMinutes = 360)
        .orderBy("bucket_us")
    }),
    "q35_sessionize" -> ((s, d) => {
      Streams.sessionizeBatch(Tables.events(s, d), gapMinutes = 30)
        .orderBy("user_id", "session_id")
    }),
    "q36_event_pivot" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("user_id")
    }),
    // ----- ✚ multimodal plumbing (binary payload + stub decode) ------------
    "q37_multimodal_meta" -> ((s, d) => {
      val media = Multimodal.pack(Tables.documents(s, d), "doc_id", "text", "text/plain")
      media.toDF()
        .select(col("media_id"), col("n_bytes"), md5(col("content")).as("content_md5"),
          col("format"))
        .orderBy("media_id")
    }),
    // the typed mapPartitions batch-decode path itself (stub decoder is
    // deterministic md5 arithmetic, so DuckDB replays the whole pipeline —
    // pack → per-partition feature extraction → typed output)
    "q60_multimodal_features" -> ((s, d) => {
      val media = Multimodal.pack(Tables.documents(s, d), "doc_id", "text", "text/plain")
      Multimodal.extractFeatures(media).toDF()
        .select(col("media_id"), col("n_bytes"), col("content_md5"),
          col("width").cast(LongType).as("width"),
          col("height").cast(LongType).as("height"),
          col("n_frames").cast(LongType).as("n_frames"))
        .orderBy("media_id")
    }),
    // ----- ✚ scalar string/date function coverage --------------------------
    "q38_scalar_funcs" -> ((s, d) => {
      Tables.orders(s, d).select(
          col("o_orderkey"),
          upper(substring(col("o_orderpriority"), 3, 10)).as("prio_word"),
          length(col("o_orderpriority")).cast(LongType).as("prio_len"),
          concat_ws("-", col("o_orderstatus"), col("o_orderpriority")).as("status_prio"),
          year(col("o_orderdate")).cast(LongType).as("o_year"),
          month(col("o_orderdate")).cast(LongType).as("o_month"),
          date_add(to_date(col("o_orderdate")), 30).as("due_date"),
          datediff(to_date(lit("1998-12-31")), to_date(col("o_orderdate"))).cast(LongType).as("days_to_eoy"),
          // scale-0 rounding only: 2-decimal rounding of doubles diverges
          // across engines (shortest-decimal vs binary .xx5 boundaries)
          round(col("o_totalprice") / 1000.0).cast(LongType).as("price_k"))
        .orderBy("o_orderkey")
    }),
    // ----- ✚ ML cleaner (the SQL-expressible transforms; full pipeline is
    //       ScalaTest-covered since fit state isn't SQL) -------------------
    "q39_cleaner_transform" -> ((s, d) => {
      val cleaner = new graft.ml.TableCleaner
      cleaner.registerNumeric("l_quantity", impute = "mean", clip = true)
      cleaner.registerLabel("l_returnflag", Seq("R", "A"))
      cleaner.registerOneHot("l_linestatus", Seq("F", "O"))
      val l = Tables.lineitem(s, d)
      // fit on a restricted "train" slice so the clip-to-train-bounds
      // behavior is actually visible on the full table
      cleaner.fit(l.filter(col("l_quantity").between(5, 45)))
      cleaner.cleanTable(l)
        .orderBy("l_quantity", "l_returnflag", "l_linestatus_F", "l_linestatus_O")
        .limit(1000)
    }),
    // feature scaling ✚: standard-scale quantity (integral-valued -> exact
    // sums -> engine-identical mean/std via the fixed-order formula) and
    // min-max-scale linenumber; fit on the full table
    "q75_cleaner_scaled" -> ((s, d) => {
      val cleaner = new graft.ml.TableCleaner
      cleaner.registerNumeric("l_quantity", scale = "standard")
      cleaner.registerNumeric("l_linenumber", scale = "minmax")
      cleaner.cleanTable(Tables.lineitem(s, d))
        .orderBy("l_quantity", "l_linenumber")
        .limit(1000)
    }),
    // quantile discretizer ✚: TRAIN-learned type-1 quantile boundaries
    // (pure integer rank selection), transform is a codegen'd comparison
    // fold; summarized per bin so the oracle replays boundary learning
    "q89_cleaner_binned" -> ((s, d) => {
      val cleaner = new graft.ml.TableCleaner
      cleaner.registerBinned("l_quantity", 8)
      cleaner.cleanTable(Tables.lineitem(s, d))
        .groupBy(col("l_quantity").as("bin")).agg(count(lit(1)).as("n"))
        .orderBy("bin")
    }),
    // streaming-twin approx distinct per window ✚: exact per-window count
    // hash-checked, HLL estimate bound-asserted (q41 pattern — the sketch
    // value itself is engine-specific and never hash-compared)
    "q106_window_distinct" -> ((s, d) => {
      val e = Tables.events(s, d)
      val approx = Streams.approxDistinctPerWindow(e, "user_id", "1 hour", rsd = 0.02)
      val exact = e
        .groupBy(window(col("ts"), "1 hour").as("w"))
        .agg(countDistinct(col("user_id")).as("n_distinct_exact"))
        .select(unix_micros(col("w.start")).as("window_start_us"), col("n_distinct_exact"))
      // bound: 4σ of the configured rsd (0.02 → 8%) with an absolute floor
      // of 2. rsd is a standard DEVIATION, not a bound — the previous 5%
      // was only ~2.5σ, so with many windows at larger SF a legitimate run
      // could flip approx_ok and fail the gate (ADVICE r5). 4σ leaves a
      // per-window failure probability of ~6e-5; the floor of 2 covers the
      // small-cardinality windows where ±1 already exceeds any percentage.
      exact.join(approx, Seq("window_start_us"))
        .select(col("window_start_us"), col("n_distinct_exact"),
          (abs(col("n_distinct_approx") - col("n_distinct_exact"))
            <= greatest(lit(2.0), col("n_distinct_exact") * 0.08)).as("approx_ok"))
        .orderBy("window_start_us")
    }),
    // ----- ✚ sliding-window batch twin -------------------------------------
    "q40_sliding_window" -> ((s, d) => {
      Streams.slidingAgg(Tables.events(s, d), "2 hours", "1 hour")
        .orderBy("window_start_us")
    }),
    // ----- ✚ composite analytics: multi-way joins (TPC-H Q3/Q5 flavor) ----
    "q46_shipping_priority" -> ((s, d) => {
      val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("o_custkey"))
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") < to_timestamp(lit("1996-01-01")))
      val l = Tables.lineitem(s, d)
        .withColumnRenamed("l_orderkey", "o_orderkey")
      val j = Joins.join(Joins.join(o, c, Seq("o_custkey"), "inner", broadcastRight = true),
        l, Seq("o_orderkey"))
      j.groupBy(col("o_orderkey"), col("o_orderdate"))
        .agg(sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
          .cast(LongType)).as("revenue_cents"))
        .orderBy(col("revenue_cents").desc, col("o_orderkey"))
        .limit(10)
    }),
    "q47_local_supplier_volume" -> ((s, d) => {
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      val su = Tables.supplier(s, d)
      val l = Tables.lineitem(s, d)
      val nr = Joins.join(
        n.select(col("n_nationkey"), col("n_name"), col("n_regionkey").as("r_regionkey")),
        r.select(col("r_regionkey"), col("r_name")), Seq("r_regionkey"),
        "inner", broadcastRight = true)
      val sn = Joins.join(
        su.select(col("s_suppkey").as("l_suppkey"), col("s_nationkey").as("n_nationkey")),
        nr, Seq("n_nationkey"), "inner", broadcastRight = true)
      Joins.join(l, sn, Seq("l_suppkey"), "inner", broadcastRight = true)
        .groupBy(col("r_name"), col("n_name"))
        .agg(sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
          .cast(LongType)).as("revenue_cents"),
          count(lit(1)).as("n_items"))
        .orderBy("r_name", "n_name")
    }),
    // ----- ✚ the full curation pipeline: dedup -> quality -> language ------
    // The composite a 100-TB training-data run actually executes: drop
    // near-duplicate docs (keep each cluster's min id), then quality- and
    // language-gate, then account surviving tokens per source.
    "q49_curation_pipeline" -> ((s, d) => {
      // routed through the one-call dedupedCorpus (VERDICT r6 §next-1) —
      // same plan semantics as the previous pairs→CC→anti-join spelling,
      // but through the minhashIndex-backed API a real pipeline invokes
      val kept = Dedup.dedupedCorpus(Tables.documents(s, d), "doc_id", "text",
        n = 3, bands = 4, rowsPerBand = 3, threshold = 0.8)
      kept
        .withColumn("quality", Text.qualityScore(col("text")))
        .withColumn("lang_id", Text.langId(col("text")))
        .filter(col("quality") >= 0.5 && col("lang_id") === "en")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(Text.tokenCount(col("text")).cast(LongType)).as("n_tokens"))
        .orderBy("source")
    }),
    // ----- ✚ SQL-first interface: the same engine through spark.sql -------
    "q48_sql_interface" -> ((s, d) => {
      Tables.registerAll(s, d)
      s.sql("""
        SELECT n_name, c_name, revenue_cents FROM (
          SELECT n.n_name, c.c_name,
                 CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
                 row_number() OVER (PARTITION BY n.n_name
                   ORDER BY sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) DESC, c.c_name) AS rk
          FROM orders o
          JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN nation n ON c.c_nationkey = n.n_nationkey
          GROUP BY n.n_name, c.c_name) t
        WHERE rk = 1 ORDER BY n_name""")
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
        .orderBy("l_returnflag")
    }),
    // ----- ✚ dedup groups: connected components over near-dup pairs -------
    "q43_dedup_groups" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
        n = 3, bands = 4, rowsPerBand = 3, threshold = 0.8)
      Dedup.connectedComponents(pairs, docs, "doc_id")
        .filter(col("id") =!= col("component")) // only docs folded into a group
        .orderBy("id")
    }),
    // span-based decontamination: longest verbatim run each TRAIN doc
    // shares with an EVAL doc (hash-shard 0 again plays the benchmark) —
    // the run-length criterion, next to q57's set-containment one
    "q74_decontamination_spans" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val sharded = Ops.shardByHash(docs, "doc_id", 5)
      val evalSet = sharded.filter(col("shard") === 0).drop("shard")
      val corpus = sharded.filter(col("shard") =!= 0).drop("shard")
      Dedup.substringSpansBetween(corpus, evalSet, "doc_id", "text",
          k = 10, minRunTokens = 20)
        .orderBy("train_id", "eval_id")
    }),
    // longest shared verbatim span per pair: k=10 positional windows, runs
    // reassembled per (pair, diagonal) — detects and MEASURES spans >= 30
    // tokens exactly (q69's fixed-k windows only count, they can't size)
    "q73_substring_spans" -> ((s, d) => {
      Dedup.substringDupSpans(Tables.documents(s, d), "doc_id", "text",
          k = 10, minRunTokens = 30)
        .orderBy("id_a", "id_b")
    }),
    // incremental dedup: hash-shard 0 plays today's DELTA, the rest the
    // standing corpus; near-dups found by banding delta AGAINST corpus —
    // the big side is never self-joined (the daily-ingest shape at 100 TB)
    "q72_delta_dedup" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val sharded = Ops.shardByHash(docs, "doc_id", 5)
      val delta = sharded.filter(col("shard") === 0).drop("shard")
      val corpus = sharded.filter(col("shard") =!= 0).drop("shard")
      Dedup.minhashLshPairsBetween(delta, corpus, "doc_id", "text",
          n = 3, bands = 4, rowsPerBand = 3, threshold = 0.8)
        .orderBy("id_a", "id_b")
    }),
    // incremental connected components ✚ (VERDICT r5 §next-5, q72's missing
    // half): the standing corpus's labels are computed FIRST (yesterday's
    // state), then shard 0's delta folds in via labels-as-edges + the
    // delta's banded pairs (delta↔corpus + delta↔delta — per-doc MinHash
    // signatures are corpus-independent, so the split finds exactly the
    // full run's pairs). The oracle is q43's recursive-CTE closure over
    // the FULL pair set — the gate directly asserts incremental == full.
    "q109_incremental_cc" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val sharded = Ops.shardByHash(docs, "doc_id", 5)
      val delta = sharded.filter(col("shard") === 0).drop("shard")
      val corpus = sharded.filter(col("shard") =!= 0).drop("shard")
      // the standing corpus's index is built ONCE (in production: loaded
      // from its stored table) and serves both the prior self-join and the
      // delta's band-join; the delta index serves its cross- and self-joins
      val ixC = Dedup.minhashIndex(corpus, "doc_id", "text",
        n = 3, bands = 4, rowsPerBand = 3)
      val ixD = Dedup.minhashIndex(delta, "doc_id", "text",
        n = 3, bands = 4, rowsPerBand = 3)
      val prior = Dedup.connectedComponents(
        Dedup.minhashLshPairsIndexed(ixC, threshold = 0.8), corpus, "doc_id")
      val deltaEdges = Dedup.minhashLshPairsBetweenIndexed(ixD, ixC, threshold = 0.8)
        .select("id_a", "id_b")
        .unionByName(Dedup.minhashLshPairsIndexed(ixD, threshold = 0.8)
          .select("id_a", "id_b"))
      val out = Dedup.connectedComponentsIncremental(prior, deltaEdges, docs, "doc_id")
        .filter(col("id") =!= col("component")) // only docs folded into a group
        .orderBy("id")
      ixC.release(); ixD.release()
      out
    }),
    // cross-doc boilerplate line removal: seed every doc with a shared
    // footer (and every even doc with a second one — the corpus itself is
    // single-line word-soup, so the repeated lines are planted
    // deterministically, q62-style), then strip lines appearing in >= 2
    // distinct docs and reassemble survivors in order
    "q71_boilerplate_lines" -> ((s, d) => {
      val seeded = Tables.documents(s, d).select(col("doc_id"), concat(
        col("text"),
        lit("\nSubscribe to our newsletter today"),
        lit("\nunique note "), col("doc_id").cast("string"),
        when(col("doc_id") % 2 === 0, lit("\nCopyright 2024 Example Corp"))
          .otherwise(lit(""))).as("t"))
      Dedup.stripBoilerplateLines(seeded, "doc_id", "t", minDocFreq = 2)
        .select(col("doc_id"), col("n_lines_kept"),
          md5(col("clean_text")).as("clean_md5"),
          length(col("clean_text")).cast(LongType).as("n_chars_clean"))
        .orderBy("doc_id")
    }),
    // quality-aware dedup representative: each near-dup cluster keeps its
    // HIGHEST-quality member (tie → min doc_id) instead of the min id —
    // what a curation pipeline wants from its dedup stage (r4 verdict #7)
    "q70_dedup_best_rep" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .withColumn("quality", Text.qualityScore(col("text")))
      Dedup.dedupedCorpus(docs, "doc_id", "text",
          n = 3, bands = 4, rowsPerBand = 3, threshold = 0.8,
          keepBy = Seq(col("quality").desc, col("doc_id")))
        .select(col("doc_id"), col("lang"), col("source"),
          round(col("quality") * 1000000).cast(LongType).as("quality_micro"))
        .orderBy("doc_id")
    }),
    // ----- ✚ TF-IDF top terms ----------------------------------------------
    "q44_tfidf" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), explode(Text.tokens(Text.normalize(col("text")))).as("term"))
      val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val n = Tables.documents(s, d).select(countDistinct(col("doc_id")).as("n_docs"))
      // df/n come from the FULL corpus; scoring + ranking only needs the
      // output docs, so prune before the join and window
      val scored = tf.filter(col("doc_id") < 50)
        .join(broadcast(dfreq), Seq("term")).crossJoin(broadcast(n))
        .withColumn("tfidf", col("tf") * log(col("n_docs").cast("double") / col("df")))
      val w = Window.partitionBy("doc_id").orderBy(col("tfidf").desc, col("term"))
      scored.withColumn("rank", row_number().over(w).cast(LongType))
        .filter(col("rank") <= 3 && col("doc_id") < 50)
        .select("doc_id", "term", "rank") // float column excluded: ln() may
        // differ in the last ulp across libm implementations; ORDER is stable
        .orderBy("doc_id", "rank")
    }),
    // ----- ✚ event funnel ---------------------------------------------------
    "q45_funnel" -> ((s, d) => {
      val e = Tables.events(s, d)
      val perUser = e.groupBy("user_id").agg(
        min(when(col("event_type") === "signup", col("ts"))).as("first_signup"),
        min(when(col("event_type") === "click", col("ts"))).as("first_click"),
        min(when(col("event_type") === "purchase", col("ts"))).as("first_purchase"))
      perUser.select(
          count(lit(1)).as("n_users"),
          count(col("first_signup")).as("n_signed"),
          count(when(col("first_click") > col("first_signup"), 1)).as("n_click_after_signup"),
          count(when(col("first_purchase") > col("first_signup"), 1)).as("n_purchase_after_signup"))
    }),
    // exact per-group correlation ✚: Pearson r from fixed-order plain sums
    // (integral columns -> exact sums -> engine-identical doubles), where
    // built-in streaming corr is partition-order dependent
    "q76_corr_exact" -> ((s, d) => {
      Grouping.groupby(Tables.lineitem(s, d), Seq("l_returnflag"))
        .corrExact("l_quantity", "l_linenumber", "corr_qty_line")
        .orderBy("l_returnflag")
    }),
    // exact discrete percentile ✚: the value AT rank ⌈p·n⌉ — pure integer
    // selection, no engine-ordered float interpolation (q41's approx twin
    // checks bounds; this one hash-matches exactly)
    "q87_percentile_disc" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
        .withColumn("cents", round(col("l_extendedprice") * 100).cast(LongType))
      Grouping.groupby(l, Seq("l_returnflag"))
        .percentileDisc("cents", 0.95, "p95_cents")
        .orderBy("l_returnflag")
    }),
    // type-7 interpolated percentile ✚ (the pandas/numpy default): the
    // interpolation tree is constructed explicitly from integer-rank
    // values, so the double hash-matches after micro-rounding
    "q107_percentile_cont" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
        .withColumn("cents", round(col("l_extendedprice") * 100).cast(LongType))
      Grouping.groupby(l, Seq("l_returnflag"))
        .percentileCont("cents", 0.95, "p95")
        .select(col("l_returnflag"),
          round(col("p95") * 1000000).cast(LongType).as("p95_microcents"))
        .orderBy("l_returnflag")
    }),
    // one-pass multi-percentile ✚: p50/p90/p99 from a single sorted window
    // + one agg — not one shuffle per percentile
    "q105_percentiles_multi" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
        .withColumn("cents", round(col("l_extendedprice") * 100).cast(LongType))
      Grouping.groupby(l, Seq("l_returnflag"))
        .percentilesDisc("cents",
          Seq(0.5 -> "p50_cents", 0.9 -> "p90_cents", 0.99 -> "p99_cents"))
        .orderBy("l_returnflag")
    }),
    // mergeable KLL quantile sketches ✚ (VERDICT r5 §next-6, q64's
    // percentile sibling): per-(returnflag, linestatus) shard sketches
    // over exact cents, merged UP to returnflag — store-and-merge, no raw
    // rows at query time. The k=200 sketch bounds normalized RANK error
    // (~1.65%, 99% conf), so each estimate is asserted inside the exact
    // values at rank p±2.5% (bracket booleans; oracle emits TRUE — the
    // sketch value itself is merge-tree-specific and never hash-compared,
    // exactly q64's contract); the exact percentiles hash-compare.
    "q110_kll_quantiles" -> ((s, d) => {
      val x = Tables.lineitem(s, d).filter(col("l_extendedprice").isNotNull)
        .withColumn("cents", round(col("l_extendedprice") * 100).cast(LongType))
      val sk = Sketches.quantileSketch(x, Seq("l_returnflag", "l_linestatus"), "cents")
      val est = Sketches.mergeQuantiles(sk, Seq("l_returnflag"), Seq(0.5, 0.9, 0.99))
      val exact = Grouping.groupby(x, Seq("l_returnflag"))
        .percentilesDisc("cents", Seq(
          0.5 -> "p50_cents", 0.475 -> "lo50", 0.525 -> "hi50",
          0.9 -> "p90_cents", 0.875 -> "lo90", 0.925 -> "hi90",
          0.99 -> "p99_cents", 0.965 -> "lo99", 1.0 -> "hi99"))
      exact.join(est, Seq("l_returnflag"))
        .select(col("l_returnflag"),
          col("p50_cents"), col("p90_cents"), col("p99_cents"),
          (col("q50") >= col("lo50") && col("q50") <= col("hi50")).as("ok_p50"),
          (col("q90") >= col("lo90") && col("q90") <= col("hi90")).as("ok_p90"),
          (col("q99") >= col("lo99") && col("q99") <= col("hi99")).as("ok_p99"))
        .orderBy("l_returnflag")
    }),
    // exact mode ✚: most frequent value, ties toward the smallest — a total
    // rule where the built-in `mode` documents ties as non-deterministic
    "q88_mode" -> ((s, d) => {
      Grouping.groupby(Tables.lineitem(s, d), Seq("l_returnflag"))
        .modeExact("l_quantity", "mode_qty")
        .orderBy("l_returnflag")
    }),
    // ----- ✚ vector analytics: exact per-label centroids via integer sums --
    "q42_label_centroids" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
        .select(col("label"), posexplode(Similarity.quantize(col("embedding")))
          .as(Seq("pos", "milli")))
        .select(col("label"), col("pos").cast(LongType).as("dim"), col("milli"))
      e.groupBy(col("label"), col("dim"))
        .agg((sum(col("milli")).cast("double") / count(lit(1)).cast("double")).as("centroid_milli"))
        .orderBy("label", "dim")
    }),
    // ----- ✚ r5 batch 2: chunking / LM scoring / lexical search / graph ----
    // sliding-window chunking (RAG preprocessing): 64-token windows every
    // 32 tokens; pure projection + explode, zero shuffles
    "q90_chunk_sliding" -> ((s, d) => {
      Pack.chunkSliding(Tables.documents(s, d), "doc_id", "text",
          window = 64, stride = 32)
        .orderBy("doc_id", "chunk_idx")
    }),
    // unigram-LM surprisal (CCNet-style perplexity filter); exact micro-nat
    // longs — see Lm.surprisal's quantization contract
    "q91_unigram_surprisal" -> ((s, d) => {
      Lm.surprisal(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id")
    }),
    // Okapi BM25 top-20 for a 3-term query over the corpus vocabulary
    "q92_bm25" -> ((s, d) => {
      Search.bm25TopK(Tables.documents(s, d), "doc_id", "text",
          Seq("spark", "join", "window"), k = 20)
        .orderBy("rank")
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
    // per-source KL(P_source ‖ P_corpus) over unigram distributions — the
    // domain-mix audit metric; exact micro-nat longs
    "q94_domain_kl" -> ((s, d) => {
      Lm.domainKl(Tables.documents(s, d), "source", "text")
        .orderBy("source")
    }),
    // deterministic weighted sampling ✚ (Efraimidis–Spirakis A-ES with the
    // idHash60 uniform): 50 docs weighted by length — inclusion ∝ n_chars,
    // identical set on any engine
    "q95_weighted_sample" -> ((s, d) => {
      Ops.sampleWeighted(Tables.documents(s, d), "doc_id", "n_chars", k = 50)
        .select("doc_id", "n_chars")
        .orderBy("doc_id")
    }),
    // batch multi-query BM25 ✚: one corpus pass scores every query; top-10
    // per query via keyed window (scores bit-identical to q92's path)
    "q97_bm25_multi" -> ((s, d) => {
      import s.implicits._
      val qs = Seq(("q1", "spark"), ("q1", "join"),
          ("q2", "window"), ("q2", "merge"), ("q2", "sort"))
        .toDF("query_id", "term")
      Search.bm25PerQuery(Tables.documents(s, d), "doc_id", "text",
          qs, "query_id", "term", k = 10)
        .orderBy("query_id", "rank")
    }),
    // DSIR importance resampling ✚ (Xie et al. 2023): hashed-n-gram bag
    // models of a TARGET (English docs) vs the RAW pool (the rest); each
    // raw doc scored by the exact micro-nat log importance ratio, then
    // A-ES-resampled in log space — "pick crawl pages that look like the
    // target", deterministic and fully replayed by the oracle
    "q111_dsir_select" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dsir.select(docs.filter(col("lang") =!= "en"),
          docs.filter(col("lang") === "en"), "doc_id", "text", k = 50)
        .orderBy("doc_id")
    }),
    // hybrid retrieval fusion ✚ (VERDICT r5 §next-4): RRF-fuse the lexical
    // BM25 top-10 with the vector LSH top-5 for the same two queries
    // (query N's embedding is vec N — the shared id space). Rank-based
    // fusion, exact nano-unit integer arithmetic — fully oracle-able.
    "q108_hybrid_rrf" -> ((s, d) => {
      import s.implicits._
      val qs = Seq((0L, "spark"), (0L, "join"),
          (1L, "window"), (1L, "merge"), (1L, "sort"))
        .toDF("query_id", "term")
      val bm = Search.bm25PerQuery(Tables.documents(s, d), "doc_id", "text",
          qs, "query_id", "term", k = 10)
        .select(col("query_id"), col("doc_id"), col("rank"))
      val e = Tables.embeddings(s, d)
      val ann = Similarity.bucketedTopK(e, e.filter(col("vec_id").isin(0L, 1L)),
          "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("nbr_id").as("doc_id"), col("rank"))
      Search.fuseRrf(Seq(bm, ann), "query_id", "doc_id", k = 10)
        .orderBy("query_id", "rank")
    }),
    // per-stratum weighted sampling ✚: 5 docs per language, inclusion ∝
    // n_chars — the balanced-but-importance-weighted audit slice
    "q98_weighted_per_group" -> ((s, d) => {
      Ops.sampleWeightedPerGroup(Tables.documents(s, d), Seq("lang"),
          "doc_id", "n_chars", n = 5)
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    }),
    // TPC-H Q10 flavor ✚: returned-item revenue per customer — lineitem
    // filter pushed to the scan, orders shuffle-joined, customer and nation
    // dimensions broadcast, cents-exact revenue, top-20 by revenue
    "q99_returned_revenue" -> ((s, d) => {
      val l = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("o_orderkey"), col("l_extendedprice"), col("l_discount"))
      val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      val c = Tables.customer(s, d)
        .select(col("c_custkey").as("o_custkey"), col("c_name"), col("c_nationkey"))
      val n = Tables.nation(s, d)
        .select(col("n_nationkey").as("c_nationkey"), col("n_name"))
      Joins.join(Joins.join(Joins.join(l, o, Seq("o_orderkey")),
          c, Seq("o_custkey"), "inner", broadcastRight = true),
          n, Seq("c_nationkey"), "inner", broadcastRight = true)
        .groupBy(col("o_custkey").as("c_custkey"), col("c_name"), col("n_name"))
        .agg(sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
          .cast(LongType)).as("revenue_cents"))
        .orderBy(col("revenue_cents").desc, col("c_custkey"))
        .limit(20)
    }),
    // TPC-H Q14 flavor ✚ (and the one query on the `part` table): per-brand
    // revenue with the promo split — cents-exact longs, no ratio column, so
    // the row hashes exactly; part is the broadcast dimension
    "q104_promo_share" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
        .select(col("l_partkey").as("p_partkey"), col("l_extendedprice"), col("l_discount"))
      val p = Tables.part(s, d).select(col("p_partkey"), col("p_type"), col("p_brand"))
      val cents = round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
        .cast(LongType)
      Joins.join(l, p, Seq("p_partkey"), "inner", broadcastRight = true)
        .groupBy("p_brand")
        .agg(
          sum(when(col("p_type") === "PROMO", cents).otherwise(lit(0L))).as("promo_cents"),
          sum(cents).as("total_cents"),
          countDistinct(col("p_partkey")).as("n_parts"))
        .orderBy("p_brand")
    }),
    // ranking-window breadth ✚: ntile / percent_rank / cume_dist share one
    // total order (price desc, key) so every rank function is deterministic;
    // percent_rank and cume_dist are exact rational doubles on both engines
    "q103_window_breadth" -> ((s, d) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderpriority"),
          ntile(4).over(w).cast(LongType).as("quartile"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"))
        .orderBy("o_orderkey")
    }),
    // kNN majority-vote classification ✚: modal label of the 5 exact
    // nearest neighbors for the first 50 vectors, ties toward the smaller
    // label — the label-propagation end-use of the ANN stack
    "q102_knn_classify" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.knnClassify(e, e.filter(col("vec_id") < 50),
          "vec_id", "embedding", "label", k = 5)
        .orderBy("query_id")
    }),
    // bigram-LM surprisal ✚: transition-level fluency scoring (word salad
    // has plausible unigrams but improbable bigrams); exact micro-nat longs
    "q100_bigram_surprisal" -> ((s, d) => {
      Lm.bigramSurprisal(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id")
    }),
    // cohort retention ✚: users grouped by first-seen ISO week, distinct
    // active users per whole-week offset — the standard retention triangle
    "q101_cohort_retention" -> ((s, d) => {
      val e = Tables.events(s, d)
      val first = e.groupBy("user_id").agg(min(col("ts")).as("ft"))
      e.join(first, Seq("user_id"))
        .select(
          date_trunc("week", col("ft")).cast("date").as("cohort_week"),
          floor(datediff(col("ts").cast("date"), col("ft").cast("date")) / lit(7))
            .cast(LongType).as("week_offset"),
          col("user_id"))
        .groupBy("cohort_week", "week_offset")
        .agg(countDistinct(col("user_id")).as("n_active"))
        .orderBy("cohort_week", "week_offset")
    }),
    // frozen-LM delta scoring ✚: LM fit on hash shards [0.1, 1.0), the
    // incoming [0, 0.1) batch scored against it (unseen tokens take the
    // add-one max-surprisal floor) — the incremental-curation shape
    "q96_delta_surprisal" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val corpus = Ops.sampleByHash(docs, "doc_id", 0.1, 1.0)
      val delta = Ops.sampleByHash(docs, "doc_id", 0.0, 0.1)
      Lm.surprisalAgainst(Lm.unigramCounts(corpus, "text"), delta, "doc_id", "text")
        .orderBy("doc_id")
    }),
  )

  /** q53's body, parameterized on the LSH table count so `Bench` can echo
    * the non-default dial at the bench SF every round (the oracle row uses
    * `nTables = 0` = the threshold-adaptive default: 24 tables at θ=0.3).
    * The exact side is the deterministic ≤800-row cap —
    * verification-bounded at any SF. */
  def neardupRecallAt(s: SparkSession, d: String, nTables: Int): DataFrame = {
    graft.expressions.GraftFunctions.register(s)
    val e = Tables.embeddings(s, d)
    val found = Dedup.embeddingNearDupPairs(e, "vec_id", "embedding",
        nTables = nTables, threshold = 0.3)
      .select(col("id_a"), col("id_b"), lit(1L).as("hit"))
    val v = e.select(col("vec_id"), Similarity.quantize(col("embedding")).as("q"))
      .withColumn("nn", call_function("graft_qdot", col("q"), col("q")))
      // TakeOrdered (per-partition heap) — never a global sort
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id")).limit(800)
    val exact = v.as("x").join(v.as("y"), col("x.vec_id") < col("y.vec_id"))
      .withColumn("cosine",
        call_function("graft_qdot", col("x.q"), col("y.q")).cast("double") /
          (sqrt(col("x.nn").cast("double")) * sqrt(col("y.nn").cast("double"))))
      .filter(col("cosine") >= 0.3)
      .select(col("x.vec_id").as("id_a"), col("y.vec_id").as("id_b"))
    exact.join(found, Seq("id_a", "id_b"), "left")
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("hit"), lit(0L))).as("n_found"))
      .select(col("n_exact"), col("n_found"),
        (col("n_found").cast("double") / col("n_exact").cast("double")).as("recall"))
  }

  /** The between-path sibling of [[neardupRecallAt]] (r7): recall of the
    * delta↔corpus banding (q115's shape — delta probed in the corpus
    * index's bucket space) against the exact delta×corpus pairs of a
    * deterministic ≤400×400 capped sample — verification-bounded at any
    * SF, echoed by `Bench` at the bench SF every round. */
  def neardupBetweenRecallAt(s: SparkSession, d: String): DataFrame = {
    graft.expressions.GraftFunctions.register(s)
    val e = Tables.embeddings(s, d)
    val sharded = Ops.shardByHash(e, "vec_id", 5)
    val corpus = sharded.filter(col("shard") =!= 0).drop("shard")
    val delta = sharded.filter(col("shard") === 0).drop("shard")
    val ix = Dedup.embeddingIndex(corpus, "vec_id", "embedding", threshold = 0.3)
    val found = Dedup.embeddingNearDupPairsBetween(delta, ix, "vec_id", "embedding",
        threshold = 0.3)
      .select(col("id_a"), col("id_b"), lit(1L).as("hit"))
    ix.release()
    def capped(df: DataFrame) =
      df.select(col("vec_id"), Similarity.quantize(col("embedding")).as("q"))
        .withColumn("nn", call_function("graft_qdot", col("q"), col("q")))
        // TakeOrdered (per-partition heap) — never a global sort
        .orderBy(md5(col("vec_id").cast("string")), col("vec_id")).limit(400)
    val dv = capped(delta)
    val cv = capped(corpus)
    val exact = dv.as("x").join(cv.as("y"), col("x.vec_id") =!= col("y.vec_id"))
      .withColumn("cosine",
        call_function("graft_qdot", col("x.q"), col("y.q")).cast("double") /
          (sqrt(col("x.nn").cast("double")) * sqrt(col("y.nn").cast("double"))))
      .filter(col("cosine") >= 0.3)
      .select(col("x.vec_id").as("id_a"), col("y.vec_id").as("id_b"))
    exact.join(found, Seq("id_a", "id_b"), "left")
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("hit"), lit(0L))).as("n_found"))
      .select(col("n_exact"), col("n_found"),
        (col("n_found").cast("double") / col("n_exact").cast("double")).as("recall"))
  }

  // ---- shared DuckDB CTE fragments for the embeddings family --------------
  // quantized vectors + exact integer norms (dim = 64 in the test tables)
  private val sqlVecs =
    """v AS (SELECT vec_id,
              [round(x::DOUBLE * 1000)::BIGINT for x in embedding] AS q,
              list_sum([round(x::DOUBLE * 1000)::BIGINT * round(x::DOUBLE * 1000)::BIGINT
                        for x in embedding]) AS nn
            FROM embeddings)"""
  // multi-table random-hyperplane LSH buckets: bits = smallest b in [4,24]
  // with 2^b*8 >= count(*) (identical integer derivation to
  // Similarity.sizedSignBits); weight(t,j,p) = +1 iff first md5 nibble of
  // "42|t|j|p" is even (identical to Similarity.hyperplanes, seed 42).
  // nTables must match the Spark-side call site: 16 for bucketedTopK; for
  // Dedup.embeddingNearDupPairs the threshold-adaptive default (r6) picks
  // 24 at the suite's θ=0.3 (16 at θ ≥ 0.4).
  private def sqlLshBuckets(nTables: Int) =
    s"""nb AS (SELECT min(b) AS bits FROM range(4, 25) r(b),
                (SELECT count(*) AS n FROM embeddings) c
              WHERE (1::BIGINT << b) * 8 >= n OR b = 24),
       bk AS (SELECT vec_id, t,
                list_sum([CASE WHEN list_sum([
                    (CASE WHEN (instr('0123456789abcdef',
                         substr(md5(42 || '|' || t || '|' || j || '|' || (p - 1)), 1, 1)) - 1) % 2 = 0
                     THEN 1 ELSE -1 END) * q[p]
                  for p in range(1, 65)]) >= 0 THEN (1::BIGINT << j) ELSE 0 END
                for j in range(0, bits)]) AS bucket
              FROM v, range(0, $nTables) r(t), nb)"""
  // multi-probe query buckets (Lv et al. 2007, = Similarity.multiProbe):
  // each query bucket plus its `bits` Hamming-1 perturbations; pj = 0 is
  // the exact bucket, pj in 1..bits flips sign bit pj-1
  private val sqlLshProbes =
    """qpb AS (SELECT vec_id, t,
                 CASE WHEN pj = 0 THEN bucket
                      ELSE xor(bucket, 1::BIGINT << (pj - 1)) END AS bucket
               FROM bk, nb, range(0, 25) r(pj)
               WHERE vec_id < 10 AND pj <= nb.bits)"""
  // same expansion over EVERY row (near-dup pair joins probe one whole side)
  private val sqlLshProbesAll =
    """pb AS (SELECT vec_id, t,
                CASE WHEN pj = 0 THEN bucket
                     ELSE xor(bucket, 1::BIGINT << (pj - 1)) END AS bucket
              FROM bk, nb, range(0, 25) r(pj)
              WHERE pj <= nb.bits)"""
  // sharded-embedding fragments (q115/q117): vv = quantized vectors + norms
  // + the q72 hash-shard; bucket/probe/pair CTE generators parameterized by
  // shard predicate and bits CTE so the delta↔corpus chains stay readable
  private val sqlEmbVv =
    """vv AS (SELECT vec_id,
              [round(x::DOUBLE * 1000)::BIGINT for x in embedding] AS q,
              list_sum([round(x::DOUBLE * 1000)::BIGINT * round(x::DOUBLE * 1000)::BIGINT
                        for x in embedding]) AS nn,
              (list_sum([ (instr('0123456789abcdef', substr(md5(vec_id::VARCHAR), k, 1)) - 1)
                          * pow(16, 15 - k)::BIGINT for k in range(1, 16)])::BIGINT % 5) AS shard
            FROM embeddings)"""
  private def sqlEmbBits(cteName: String, shardPred: String) =
    s"""$cteName AS (SELECT min(b) AS bits FROM range(4, 25) r(b),
              (SELECT count(*) AS n FROM vv WHERE $shardPred) c
            WHERE (1::BIGINT << b) * 8 >= n OR b = 24)"""
  private def sqlEmbShardBuckets(cteName: String, shardPred: String, bitsCte: String) =
    s"""$cteName AS (SELECT vec_id, t,
              list_sum([CASE WHEN list_sum([
                  (CASE WHEN (instr('0123456789abcdef',
                       substr(md5(42 || '|' || t || '|' || j || '|' || (p - 1)), 1, 1)) - 1) % 2 = 0
                   THEN 1 ELSE -1 END) * q[p]
                for p in range(1, 65)]) >= 0 THEN (1::BIGINT << j) ELSE 0 END
              for j in range(0, bits)]) AS bucket
            FROM vv, range(0, 24) r(t), $bitsCte WHERE $shardPred)"""
  private def sqlEmbProbes(cteName: String, srcCte: String, bitsCte: String) =
    s"""$cteName AS (SELECT vec_id, t,
              CASE WHEN pj = 0 THEN bucket
                   ELSE xor(bucket, 1::BIGINT << (pj - 1)) END AS bucket
            FROM $srcCte, $bitsCte, range(0, 25) r(pj) WHERE pj <= $bitsCte.bits)"""
  private def sqlEmbPairs(cteName: String, left: String, right: String, cond: String) =
    s"""$cteName AS (SELECT id_a, id_b FROM (
              SELECT cand.id_a, cand.id_b,
                     list_sum([p[1] * p[2] for p in list_zip(x.q, y.q)])::DOUBLE
                       / NULLIF(sqrt(x.nn::DOUBLE) * sqrt(y.nn::DOUBLE), 0) AS cosine
              FROM (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
                    FROM $left a JOIN $right b ON a.t = b.t AND a.bucket = b.bucket
                      AND $cond) cand
              JOIN vv x ON x.vec_id = cand.id_a
              JOIN vv y ON y.vec_id = cand.id_b) t
            WHERE cosine >= 0.3)"""
  // PQ (q118, m=16 subspaces of dsub=4 dims, 64 centroids): one
  // per-subspace Lloyd assignment step — every (doc, sub) to its
  // exact-integer-distance argmin centroid of THAT subspace (ties to the
  // lowest cent_id); the sqlIvfAssign shape with `sub` in the key
  private def sqlPqAssign(asgName: String, booksName: String): String =
    s"""$asgName AS (SELECT vec_id, sub, code FROM (
          SELECT sv.vec_id, sv.sub, b.cent_id AS code,
                 row_number() OVER (PARTITION BY sv.vec_id, sv.sub
                   ORDER BY sv.svv - 2 * list_sum([p[1] * p[2] for p in list_zip(sv.svc, b.cv)]) + b.cc,
                            b.cent_id) AS cr
          FROM sv JOIN $booksName b ON b.sub = sv.sub) t WHERE cr = 1)"""
  // PQ: one per-subspace Lloyd update step — per (sub, code, dim) rounded
  // integer mean of the assigned sub-vectors; empty codes vanish
  private def sqlPqUpdate(booksName: String, asgName: String): String =
    s"""$booksName AS (SELECT sub, cent_id, cv, list_sum([x * x for x in cv]) AS cc FROM (
          SELECT sub, code AS cent_id, list(mv ORDER BY spos) AS cv FROM (
            SELECT a.sub, a.code, i AS spos,
                   CAST(round(sum(sv.svc[i])::DOUBLE / count(*)) AS BIGINT) AS mv
            FROM $asgName a JOIN sv ON sv.vec_id = a.vec_id AND sv.sub = a.sub,
                 range(1, 5) r(i)
            GROUP BY a.sub, a.code, i) s GROUP BY sub, cent_id) u)"""
  // IVF: one Lloyd assignment step — every vector to its exact-integer-
  // distance argmin centroid (ties to the lowest cent_id)
  private def sqlIvfAssign(asgName: String, centsName: String): String =
    s"""$asgName AS (SELECT vec_id, q, nn, cell FROM (
          SELECT v.vec_id, v.q, v.nn, c.cent_id AS cell,
                 row_number() OVER (PARTITION BY v.vec_id
                   ORDER BY v.nn - 2 * list_sum([p[1] * p[2] for p in list_zip(v.q, c.cv)]) + c.cc,
                            c.cent_id) AS cr
          FROM v, $centsName c) t WHERE cr = 1)"""
  // IVF: one Lloyd update step — per-cell, per-dim rounded mean of the
  // quantized components (integer-exact; empty cells vanish)
  private def sqlIvfUpdate(centsName: String, asgName: String): String =
    s"""$centsName AS (SELECT cent_id, cv, list_sum([x * x for x in cv]) AS cc FROM (
          SELECT cell AS cent_id, list(m ORDER BY i) AS cv FROM (
            SELECT cell, i, CAST(round(sum(q[i])::DOUBLE / count(*)) AS BIGINT) AS m
            FROM $asgName, range(1, 65) r(i) GROUP BY cell, i) s GROUP BY cell) u)"""
  // IVF chain mirroring Similarity.ivfTopK defaults: nCells = max(4,⌈√N⌉),
  // hash-ordered centroid seeding, 4 Lloyd rounds, corpus assigned to its
  // final cell, queries (vec_id < 10) probing their nprobe nearest cells,
  // nprobe = max(min(cells, 32), 2*ceil(sqrt(cells))) (scales with the
  // index — identical derivation to Similarity.ivfTopK). The chain reads
  // whatever CTE is bound to `v`; `countSrc` sizes the cell count from the
  // same corpus (q122 binds v to the shard<>0 slice and counts it).
  private def sqlIvfChainOver(countSrc: String) =
    s"""nc AS (SELECT greatest(4, CAST(ceil(sqrt(count(*)::DOUBLE)) AS INT)) AS cells
               FROM $countSrc),
        c0 AS (SELECT cent_id, cv, cc FROM (
          SELECT row_number() OVER (ORDER BY md5(vec_id::VARCHAR)) AS cent_id,
                 q AS cv, nn AS cc
          FROM v) t WHERE cent_id <= (SELECT cells FROM nc)),
        ${sqlIvfAssign("ivf_a1", "c0")},
        ${sqlIvfUpdate("c1", "ivf_a1")},
        ${sqlIvfAssign("ivf_a2", "c1")},
        ${sqlIvfUpdate("c2", "ivf_a2")},
        ${sqlIvfAssign("ivf_a3", "c2")},
        ${sqlIvfUpdate("c3", "ivf_a3")},
        ${sqlIvfAssign("ivf_a4", "c3")},
        ${sqlIvfUpdate("c4", "ivf_a4")},
        ${sqlIvfAssign("ivf_asg", "c4")},
        ivf_q AS (SELECT vec_id, q, nn, cell FROM (
          SELECT v.vec_id, v.q, v.nn, c.cent_id AS cell,
                 row_number() OVER (PARTITION BY v.vec_id
                   ORDER BY v.nn - 2 * list_sum([p[1] * p[2] for p in list_zip(v.q, c.cv)]) + c.cc,
                            c.cent_id) AS cr
          FROM v, c4 c WHERE v.vec_id < 10) t
          WHERE cr <= (SELECT greatest(least(cells, 32), 2 * CAST(ceil(sqrt(cells::DOUBLE)) AS INT))
                       FROM nc))"""
  private val sqlIvfChain = sqlIvfChainOver("embeddings")
  // PQ sub-vector table (m=16 subspaces of dsub=4 dims) over any
  // (vec_id, <vecCol>) CTE — `sv` feeds the shared Lloyd generators, so
  // the raw chain binds it to (v, q) and the residual chain to (rv, rq)
  private def sqlPqSubVecs(src: String, vecCol: String) =
    s"""sv AS (SELECT vec_id, s AS sub,
                 [$vecCol[i] for i in range(s * 4 + 1, s * 4 + 5)] AS svc,
                 list_sum([$vecCol[i] * $vecCol[i] for i in range(s * 4 + 1, s * 4 + 5)]) AS svv
               FROM $src, range(0, 16) r(s))"""
  // one hash-ordered 64-doc seed set (from `seedSrc`) supplies every
  // subspace's initial centroids, then 2 per-subspace integer Lloyd rounds
  // over `sv` — the trainPqBooks chain (b2 = final books, af = final codes)
  private def sqlPqTrainChain(seedSrc: String) =
    s"""sc AS (SELECT cent_id, vec_id FROM (
             SELECT row_number() OVER (ORDER BY md5(vec_id::VARCHAR)) AS cent_id, vec_id
             FROM $seedSrc) t WHERE cent_id <= 64),
       b0 AS (SELECT sub, cent_id, svc AS cv, svv AS cc FROM sv JOIN sc USING (vec_id)),
       ${sqlPqAssign("a1", "b0")},
       ${sqlPqUpdate("b1", "a1")},
       ${sqlPqAssign("a2", "b1")},
       ${sqlPqUpdate("b2", "a2")},
       ${sqlPqAssign("af", "b2")}"""
  // corpus residuals against the trained coarse cells (Jégou 2011 §IV-A):
  // rq = q − centroid(cell), exact elementwise integer subtraction
  private val sqlPqResidualVecs =
    """rv AS (SELECT a.vec_id, [p[1] - p[2] for p in list_zip(a.q, c.cv)] AS rq
              FROM ivf_asg a JOIN c4 c ON c.cent_id = a.cell)"""
  // flat (non-residual) IVF-PQ candidate scoring: per-query LUTs from the
  // raw sub-vectors, probed-cell candidates, ADC dot per (query, nbr).
  // `candWhere` optionally gates candidates (q125's filtered search).
  private def sqlIvfPqFlatSearchWhere(candWhere: String) =
    s"""qn AS (SELECT vec_id AS query_id, nn FROM v WHERE vec_id < 10),
       lut AS (SELECT sv.vec_id AS query_id, b.sub, b.cent_id AS code,
                      list_sum([p[1] * p[2] for p in list_zip(sv.svc, b.cv)]) AS dot
               FROM sv JOIN b2 b ON b.sub = sv.sub WHERE sv.vec_id < 10),
       cand AS (SELECT iq.vec_id AS query_id, a.vec_id AS nbr_id
                FROM ivf_q iq JOIN ivf_asg a ON a.cell = iq.cell AND a.vec_id <> iq.vec_id
                $candWhere),
       sc2 AS (SELECT cd.query_id, cd.nbr_id, CAST(sum(l.dot) AS BIGINT) AS adc_dot
               FROM cand cd JOIN af a ON a.vec_id = cd.nbr_id
                    JOIN lut l ON l.query_id = cd.query_id AND l.sub = a.sub AND l.code = a.code
               GROUP BY 1, 2)"""
  private val sqlIvfPqFlatSearch = sqlIvfPqFlatSearchWhere("")
  // residual IVF-PQ candidate scoring: the query's residual against EACH
  // probed cell's centroid feeds a (query, cell)-keyed LUT, and the exact
  // q·centroid base term is added once per candidate:
  // q·(c + r̂) = q·c + q·r̂ — all integer-exact (mirrors ivfPqTopKIndexed's
  // residual branch)
  private val sqlIvfPqResidualSearch =
    s"""qn AS (SELECT vec_id AS query_id, nn FROM v WHERE vec_id < 10),
       qres AS (SELECT iq.vec_id AS query_id, iq.cell,
                       [p[1] - p[2] for p in list_zip(iq.q, c.cv)] AS rq,
                       list_sum([p[1] * p[2] for p in list_zip(iq.q, c.cv)]) AS qc
                FROM ivf_q iq JOIN c4 c ON c.cent_id = iq.cell),
       qsv AS (SELECT query_id, cell, qc, s AS sub,
                      [rq[i] for i in range(s * 4 + 1, s * 4 + 5)] AS svc
               FROM qres, range(0, 16) r(s)),
       lut AS (SELECT qv.query_id, qv.cell, b.sub, b.cent_id AS code, qv.qc,
                      list_sum([p[1] * p[2] for p in list_zip(qv.svc, b.cv)]) AS dot
               FROM qsv qv JOIN b2 b ON b.sub = qv.sub),
       cand AS (SELECT iq.vec_id AS query_id, a.vec_id AS nbr_id, a.cell
                FROM ivf_q iq JOIN ivf_asg a ON a.cell = iq.cell AND a.vec_id <> iq.vec_id),
       sc2 AS (SELECT cd.query_id, cd.nbr_id,
                      CAST(max(l.qc) + sum(l.dot) AS BIGINT) AS adc_dot
               FROM cand cd JOIN af a ON a.vec_id = cd.nbr_id
                    JOIN lut l ON l.query_id = cd.query_id AND l.cell = cd.cell
                      AND l.sub = a.sub AND l.code = a.code
               GROUP BY 1, 2)"""
  // ADC shortlist-50 + exact rerank to top-5 (pr/sl/rr/pq) — the shared
  // two-stage tail over any sc2 (query_id, nbr_id, adc_dot)
  private val sqlAdcTail =
    s"""pr AS (SELECT query_id, nbr_id,
                     row_number() OVER (PARTITION BY query_id
                       ORDER BY adc_dot::DOUBLE / NULLIF(sqrt(qn.nn::DOUBLE) * sqrt(nb.nn::DOUBLE), 0) DESC,
                                nbr_id) AS srank
              FROM sc2 JOIN qn USING (query_id) JOIN v nb ON nb.vec_id = sc2.nbr_id),
       sl AS (SELECT query_id, nbr_id FROM pr WHERE srank <= 50),
       rr AS (SELECT sl.query_id, sl.nbr_id,
                     list_sum([p[1] * p[2] for p in list_zip(qq.q, v.q)])::DOUBLE
                       / NULLIF(sqrt(qq.nn::DOUBLE) * sqrt(v.nn::DOUBLE), 0) AS cosine
              FROM sl JOIN v qq ON qq.vec_id = sl.query_id
                      JOIN v ON v.vec_id = sl.nbr_id),
       pq AS (SELECT query_id, nbr_id, cosine_micro, rank FROM (
                SELECT query_id, nbr_id,
                       CAST(round(cosine * 1000000) AS BIGINT) AS cosine_micro,
                       row_number() OVER (PARTITION BY query_id
                         ORDER BY cosine DESC, nbr_id) AS rank
                FROM rr) t WHERE rank <= 5)"""
  // exact brute-force top-5 for the `hit` recall column
  private val sqlExactTop5 =
    s"""ex AS (SELECT query_id, nbr_id FROM (
                SELECT qq.vec_id AS query_id, v.vec_id AS nbr_id,
                       row_number() OVER (PARTITION BY qq.vec_id
                         ORDER BY list_sum([p[1] * p[2] for p in list_zip(qq.q, v.q)])::DOUBLE
                                  / NULLIF(sqrt(qq.nn::DOUBLE) * sqrt(v.nn::DOUBLE), 0) DESC, v.vec_id) AS rk
                FROM v qq JOIN v ON qq.vec_id < 10 AND v.vec_id <> qq.vec_id) t
              WHERE rk <= 5)"""
  // BM25 top-20 for ('spark','join','window') over the whole documents
  // table — the q92 oracle, and (indexed/extended search being
  // bit-identical) also the q123/q124 oracle
  private val sqlBm25TopK20 =
    """WITH toks AS (SELECT doc_id,
              unnest(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), '\s+')) AS token
            FROM documents),
       dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
       corpus AS (SELECT count(*) AS N, CAST(sum(dl) AS BIGINT) AS TT FROM dl),
       tf AS (SELECT doc_id, token, count(*) AS tf FROM toks
              WHERE token IN ('spark', 'join', 'window') GROUP BY doc_id, token),
       dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
       contrib AS (SELECT tf.doc_id,
                          CAST(round(ln(1.0 + (N - df + 0.5) / (df + 0.5)) * tf * 2.2
                               / (tf + 1.2 * (0.25 + 0.75 * dl / (TT::DOUBLE / N))) * 1000000) AS BIGINT) AS c_micro
                   FROM tf JOIN dfreq USING (token) JOIN dl USING (doc_id), corpus),
       sel AS (SELECT doc_id, count(*) AS n_hit_terms, CAST(sum(c_micro) AS BIGINT) AS score_micro
               FROM contrib GROUP BY doc_id),
       r AS (SELECT doc_id, n_hit_terms, score_micro,
                    row_number() OVER (ORDER BY score_micro DESC, doc_id) AS rank
             FROM sel)
       SELECT doc_id, n_hit_terms, score_micro, rank FROM r WHERE rank <= 20 ORDER BY rank"""

  // BPE training loop, unrolled (q127/q128 — mirrors Bpe.train exactly):
  // w0 = unique normalized words with counts, each char-spaced; per merge
  // i: weighted adjacent-pair counts (bp), the (pc DESC, a, b) argmax (bb),
  // and the greedy fold re-segmentation (w) — DuckDB's list_reduce runs
  // the identical accumulator logic as Spark's `aggregate` fold in
  // Bpe.applyMerge (append b to a trailing " a" tail, else append " "+x)
  private val sqlBpeBase =
    """bpwc AS (SELECT token AS word, count(*) AS cnt FROM (
              SELECT unnest(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), '\s+')) AS token
              FROM documents) t WHERE len(token) > 0 GROUP BY 1),
       w0 AS (SELECT word, cnt, trim(regexp_replace(word, '(.)', '\1 ', 'g')) AS syms FROM bpwc)"""
  private def sqlBpeMergeStep(i: Int): String =
    s"""bp$i AS (SELECT pr[1] AS a, pr[2] AS b, CAST(sum(cnt) AS BIGINT) AS pc
             FROM (SELECT cnt, unnest([[p[1], p[2]] for p in list_zip(sy, sy[2:])]) AS pr
                   FROM (SELECT cnt, string_split(syms, ' ') AS sy FROM w${i - 1}) s) t
             WHERE pr[2] IS NOT NULL GROUP BY 1, 2),
       bb$i AS (SELECT a, b, pc FROM bp$i ORDER BY pc DESC, a, b LIMIT 1),
       w$i AS (SELECT word, cnt, list_reduce(string_split(syms, ' '),
                 (acc, x) -> CASE WHEN x = m.b AND (acc = m.a OR ends_with(acc, ' ' || m.a))
                                  THEN acc || m.b ELSE acc || ' ' || x END) AS syms
               FROM w${i - 1}, bb$i m)"""
  private def sqlBpeChain(m: Int): String =
    sqlBpeBase + ",\n" + (1 to m).map(sqlBpeMergeStep).mkString(",\n")

  // one MMR greedy round (λ=1/2): max-sim of each unselected candidate to
  // the selected set, then the integer argmax rel_nano − max_sim with the
  // (DESC, nbr_id) tie-break — identical to Similarity.mmrRerank's round
  private def sqlMmrStep(i: Int): String =
    s"""mmr_ms$i AS (SELECT p.query_id, p.nbr_id, max(p.sim_nano) AS ms
             FROM mmr_pairs p JOIN mmr_sel${i - 1} s
               ON s.query_id = p.query_id AND s.nbr_id = p.other_id
             GROUP BY p.query_id, p.nbr_id),
       mmr_step$i AS (SELECT query_id, nbr_id, CAST($i AS BIGINT) AS mmr_rank FROM (
             SELECT c.query_id, c.nbr_id,
                    row_number() OVER (PARTITION BY c.query_id
                      ORDER BY c.rel_nano - m.ms DESC, c.nbr_id) AS rn
             FROM mmr_cand c
             JOIN mmr_ms$i m ON m.query_id = c.query_id AND m.nbr_id = c.nbr_id
             WHERE NOT EXISTS (SELECT 1 FROM mmr_sel${i - 1} s
                               WHERE s.query_id = c.query_id AND s.nbr_id = c.nbr_id)) t
           WHERE rn = 1),
       mmr_sel$i AS (SELECT query_id, nbr_id, mmr_rank FROM mmr_sel${i - 1}
                     UNION ALL SELECT query_id, nbr_id, mmr_rank FROM mmr_step$i)"""

  private def sqlMmrChain(k: Int): String =
    """mmr_cand AS (SELECT query_id, nbr_id,
              CAST(round(cosine * 1000000000) AS BIGINT) AS rel_nano
            FROM (SELECT query_id, nbr_id, cosine,
                    row_number() OVER (PARTITION BY query_id
                      ORDER BY cosine DESC, nbr_id) AS rank
                  FROM (SELECT q.vec_id AS query_id, c.vec_id AS nbr_id,
                          list_sum([p[1] * p[2] for p in list_zip(q.q, c.q)])::DOUBLE
                            / NULLIF(sqrt(q.nn::DOUBLE) * sqrt(c.nn::DOUBLE), 0) AS cosine
                        FROM v q JOIN v c ON q.vec_id < 10 AND q.vec_id <> c.vec_id) t0) t
            WHERE rank <= 20),
       mmr_pairs AS (SELECT a.query_id, a.nbr_id, b.nbr_id AS other_id,
              CAST(round(list_sum([p[1] * p[2] for p in list_zip(x.q, y.q)])::DOUBLE
                / NULLIF(sqrt(x.nn::DOUBLE) * sqrt(y.nn::DOUBLE), 0) * 1000000000) AS BIGINT) AS sim_nano
            FROM mmr_cand a JOIN mmr_cand b
              ON a.query_id = b.query_id AND a.nbr_id <> b.nbr_id
            JOIN v x ON x.vec_id = a.nbr_id
            JOIN v y ON y.vec_id = b.nbr_id),
       mmr_sel1 AS (SELECT query_id, nbr_id, CAST(1 AS BIGINT) AS mmr_rank FROM (
              SELECT query_id, nbr_id, row_number() OVER (PARTITION BY query_id
                       ORDER BY rel_nano DESC, nbr_id) AS rn
              FROM mmr_cand) t WHERE rn = 1)""" + ",\n" +
      (2 to k).map(sqlMmrStep).mkString(",\n")

  private val sqlPqHitSelect =
    """SELECT pq.query_id, pq.nbr_id, pq.cosine_micro, pq.rank,
              CAST(CASE WHEN ex.nbr_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS hit
       FROM pq LEFT JOIN ex ON ex.query_id = pq.query_id AND ex.nbr_id = pq.nbr_id
       ORDER BY pq.query_id, pq.rank"""
  // LSH top-k candidates for queries vec_id < 10 (multi-probed query buckets
  // against exact corpus buckets; rank over exact cosine)
  private val sqlLshTopK =
    s"""lsh_k AS (
          SELECT query_id, nbr_id, cosine,
                 row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, nbr_id) AS rank
          FROM (
            SELECT cand.query_id, cand.nbr_id,
                   list_sum([p[1] * p[2] for p in list_zip(qq.q, cc.q)])::DOUBLE
                     / NULLIF(sqrt(qq.nn::DOUBLE) * sqrt(cc.nn::DOUBLE), 0) AS cosine
            FROM (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS nbr_id
                  FROM qpb q JOIN bk c ON q.t = c.t AND q.bucket = c.bucket
                  WHERE q.vec_id <> c.vec_id) cand
            JOIN v qq ON qq.vec_id = cand.query_id
            JOIN v cc ON cc.vec_id = cand.nbr_id) s
          QUALIFY rank <= 5)"""
  private val sqlIvfTopK =
    s"""ivf_k AS (
          SELECT query_id, nbr_id, cosine,
                 row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, nbr_id) AS rank
          FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS nbr_id,
                   list_sum([p[1] * p[2] for p in list_zip(q.q, c.q)])::DOUBLE
                     / NULLIF(sqrt(q.nn::DOUBLE) * sqrt(c.nn::DOUBLE), 0) AS cosine
            FROM ivf_asg c JOIN ivf_q q ON q.cell = c.cell AND q.vec_id <> c.vec_id) s
          QUALIFY rank <= 5)"""

  // full MinHash-LSH pair replay + recursive-CTE reachability closure over
  // the WHOLE corpus — the ground truth for BOTH q43 (full recompute) and
  // q109 (incremental fold): non-root (id, component=min reachable id) rows
  private val sqlCcClosure =
    """WITH RECURSIVE
       w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
       s AS (SELECT doc_id,
                    list_sort(list_distinct([
                      list_sum([ (instr('0123456789abcdef', substr(md5(x), k, 1)) - 1)
                                 * pow(16, 15 - k)::BIGINT for k in range(1, 16)])
                      for x in list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                              for i in range(1, len(w) - 1)])])) AS sh
             FROM w),
       s2 AS (SELECT doc_id, sh, len(sh) AS nsh FROM s WHERE len(sh) > 0),
       ws AS (SELECT doc_id, unnest(sh)::VARCHAR AS x FROM s2),
       ww AS (SELECT doc_id,
                     list_sum([ (instr('0123456789abcdef', substr(md5(x), k, 1)) - 1)
                                * pow(16, 8 - k)::BIGINT for k in range(1, 9)]) AS w0,
                     list_sum([ (instr('0123456789abcdef', substr(md5(x), k + 8, 1)) - 1)
                                * pow(16, 8 - k)::BIGINT for k in range(1, 9)]) AS w1
              FROM ws),
       sigl AS (SELECT doc_id, i, min((w0 + i * w1) % 2147483647) AS mh
                FROM ww, range(0, 12) r(i) GROUP BY doc_id, i),
       bands AS (SELECT doc_id, i // 3 AS bi,
                        md5(string_agg(mh::VARCHAR, '|' ORDER BY i)) AS bk
                 FROM sigl GROUP BY doc_id, i // 3),
       cand AS (SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
                FROM bands a JOIN bands b ON a.bi = b.bi AND a.bk = b.bk AND a.doc_id < b.doc_id),
       pairs AS (SELECT id_a, id_b FROM (
         SELECT c.ia AS id_a, c.ib AS id_b,
                len(list_intersect(x.sh, y.sh))::DOUBLE
                  / (x.nsh + y.nsh - len(list_intersect(x.sh, y.sh))) AS jaccard
         FROM cand c JOIN s2 x ON x.doc_id = c.ia JOIN s2 y ON y.doc_id = c.ib) t
         WHERE jaccard >= 0.8),
       edges AS (SELECT id_a AS a, id_b AS b FROM pairs
                 UNION SELECT id_b, id_a FROM pairs),
       reach(a, b) AS (SELECT a, b FROM edges
                       UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
       SELECT a AS id, min(b) AS component FROM reach
       GROUP BY a HAVING min(b) < a ORDER BY id"""

  def oracleSql: Map[String, String] = Map(
    "q00_compare_pipeline" ->
      """WITH joined AS (
           SELECT l.*, o.o_custkey FROM lineitem l
           JOIN orders o ON l.l_orderkey = o.o_orderkey),
         deduped AS (
           SELECT * FROM (
             SELECT *, row_number() OVER (PARTITION BY l_orderkey
               ORDER BY l_linenumber, l_partkey, l_suppkey) AS rn
             FROM joined) t WHERE rn = 1)
         SELECT o_custkey, avg(l_quantity) AS l_quantity_mean
         FROM deduped GROUP BY o_custkey ORDER BY o_custkey""",
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
    "q23_text_stats" ->
      """WITH t AS (
           SELECT doc_id, text,
                  string_split_regex(trim(lower(text)), '\s+') AS lt,
                  len(string_split_regex(trim(text), '\s+'))::BIGINT AS n_tokens
           FROM documents),
         sc AS (
           SELECT doc_id, text, n_tokens,
             len(list_filter(lt, x -> list_contains(['the','a','of','and','to','in','is','it'], x))) AS s_en,
             len(list_filter(lt, x -> list_contains(['der','die','das','und','ist','ein','zu','den'], x))) AS s_de,
             len(list_filter(lt, x -> list_contains(['el','la','que','y','en','un','es','los'], x))) AS s_es,
             len(list_filter(lt, x -> list_contains(['le','la','et','un','une','est','dans','les'], x))) AS s_fr,
             len(list_filter(lt, x -> list_contains(['的','是','在','了','我','有','和','不'], x))) AS s_zh,
             len(lt) AS ntok
           FROM t)
         SELECT doc_id, n_tokens,
                md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fingerprint,
                CASE WHEN s_en = greatest(s_en, s_de, s_es, s_fr, s_zh) AND s_en > 0 THEN 'en'
                     WHEN s_de = greatest(s_en, s_de, s_es, s_fr, s_zh) AND s_de > 0 THEN 'de'
                     WHEN s_es = greatest(s_en, s_de, s_es, s_fr, s_zh) AND s_es > 0 THEN 'es'
                     WHEN s_fr = greatest(s_en, s_de, s_es, s_fr, s_zh) AND s_fr > 0 THEN 'fr'
                     WHEN s_zh = greatest(s_en, s_de, s_es, s_fr, s_zh) AND s_zh > 0 THEN 'zh'
                     ELSE 'und' END AS lang_id,
                CASE WHEN text IS NULL THEN NULL
                     WHEN length(trim(text)) > 0 THEN
                       0.3 * least(ntok::DOUBLE / 100.0, 1.0)
                       + 0.4 * least(5.0 * (s_en::DOUBLE / ntok::DOUBLE), 1.0)
                       + 0.3 * (length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g'))::DOUBLE / length(text)::DOUBLE)
                     ELSE 0.0 END AS quality
         FROM sc ORDER BY doc_id""",
    "q80_unicode_nfc" ->
      """WITH r AS (
           SELECT doc_id,
                  'Cafe' || chr(769) || ' doc ' || doc_id::VARCHAR || ' '
                    || substr(text, 1, 40) AS raw
           FROM documents)
         SELECT doc_id,
                length(raw)::BIGINT AS len_raw,
                length(nfc_normalize(raw))::BIGINT AS len_nfc,
                md5(nfc_normalize(raw)) AS nfc_md5
         FROM r ORDER BY doc_id""",
    "q81_gopher_rules" ->
      """WITH t AS (
           SELECT doc_id, text,
                  string_split_regex(trim(text), '\s+') AS toks,
                  string_split(text, chr(10)) AS lines,
                  string_split_regex(trim(lower(text)), '\s+') AS ltoks
           FROM documents),
         c AS (
           SELECT doc_id, text, toks, lines, ltoks,
                  (CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE len(toks) END)::BIGINT AS n
           FROM t),
         r AS (
           SELECT doc_id, text, n,
             CASE WHEN n > 0 THEN
               list_sum(list_transform(toks, x -> length(x)))::DOUBLE / n::DOUBLE END AS mean_len,
             CASE WHEN n > 0 THEN
               ((length(text) - length(replace(text, '#', '')))
                + (length(text) - length(replace(text, '...', ''))) / 3)::DOUBLE
               / n::DOUBLE END AS sym_ratio,
             len(list_filter(lines, l -> starts_with(trim(l), '-')
                   OR starts_with(trim(l), '*')
                   OR starts_with(trim(l), chr(8226))))::DOUBLE
               / len(lines)::DOUBLE AS bullet_frac,
             len(list_filter(lines, l -> ends_with(rtrim(l), '...')))::DOUBLE
               / len(lines)::DOUBLE AS ell_frac,
             CASE WHEN n > 0 THEN
               len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]')))::DOUBLE
               / n::DOUBLE END AS alpha_frac,
             (list_contains(ltoks, 'the')::INT + list_contains(ltoks, 'be')::INT
              + list_contains(ltoks, 'to')::INT + list_contains(ltoks, 'of')::INT
              + list_contains(ltoks, 'and')::INT + list_contains(ltoks, 'that')::INT
              + list_contains(ltoks, 'have')::INT + list_contains(ltoks, 'with')::INT)
               AS stop_hits
           FROM c)
         SELECT doc_id,
                CASE WHEN text IS NULL THEN NULL ELSE n END AS n_words,
                CASE WHEN text IS NULL THEN NULL
                     ELSE n >= 50 AND n <= 100000 END AS ok_word_count,
                CASE WHEN text IS NULL THEN NULL
                     ELSE coalesce(mean_len >= 3.0 AND mean_len <= 10.0, false) END
                  AS ok_mean_word_len,
                CASE WHEN text IS NULL THEN NULL
                     ELSE coalesce(sym_ratio <= 0.1, false) END AS ok_symbol_ratio,
                CASE WHEN text IS NULL THEN NULL
                     ELSE bullet_frac < 0.9 END AS ok_bullet_lines,
                CASE WHEN text IS NULL THEN NULL
                     ELSE ell_frac < 0.3 END AS ok_ellipsis_lines,
                CASE WHEN text IS NULL THEN NULL
                     ELSE coalesce(alpha_frac > 0.8, false) END AS ok_alpha_words,
                CASE WHEN text IS NULL THEN NULL
                     ELSE stop_hits >= 2 END AS ok_stopwords,
                CASE WHEN text IS NULL THEN NULL
                     ELSE (n >= 50 AND n <= 100000)
                      AND coalesce(mean_len >= 3.0 AND mean_len <= 10.0, false)
                      AND coalesce(sym_ratio <= 0.1, false)
                      AND bullet_frac < 0.9 AND ell_frac < 0.3
                      AND coalesce(alpha_frac > 0.8, false)
                      AND stop_hits >= 2 END AS pass
         FROM r ORDER BY doc_id""",
    "q51_token_budget" ->
      """SELECT doc_id,
                len(string_split_regex(trim(text), '\s+'))::BIGINT AS n_whitespace,
                len(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+'))::BIGINT AS n_bpeish,
                length(text)::BIGINT AS n_chars
         FROM documents ORDER BY doc_id""",
    "q24_simhash" ->
      """WITH toks AS (
           SELECT doc_id,
                  unnest(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), '\s+')) AS t
           FROM documents),
         h AS (
           SELECT doc_id,
                  list_sum([ (instr('0123456789abcdef', substr(md5(t), k, 1)) - 1)
                             * pow(16, 8 - k)::BIGINT for k in range(1, 9)]) AS w0,
                  list_sum([ (instr('0123456789abcdef', substr(md5(t), k + 8, 1)) - 1)
                             * pow(16, 8 - k)::BIGINT for k in range(1, 9)]) AS w1
           FROM toks),
         votes AS (
           SELECT doc_id, j,
                  sum(2 * ((CASE WHEN j < 32 THEN w1 >> j ELSE w0 >> (j - 32) END) & 1) - 1) AS v
           FROM h, range(0, 64) r(j) GROUP BY doc_id, j)
         SELECT doc_id,
                CAST(sum(CASE WHEN v > 0 THEN
                       CASE WHEN j = 63 THEN -9223372036854775808 ELSE 1::BIGINT << j END
                     ELSE 0 END) AS BIGINT) AS simhash64
         FROM votes GROUP BY doc_id ORDER BY doc_id""",
    "q25_lang_quality_agg" ->
      """WITH t AS (
           SELECT doc_id, text, string_split_regex(trim(lower(text)), '\s+') AS lt
           FROM documents),
         sc AS (
           SELECT doc_id, text,
             len(list_filter(lt, x -> list_contains(['the','a','of','and','to','in','is','it'], x))) AS s_en,
             len(list_filter(lt, x -> list_contains(['der','die','das','und','ist','ein','zu','den'], x))) AS s_de,
             len(list_filter(lt, x -> list_contains(['el','la','que','y','en','un','es','los'], x))) AS s_es,
             len(list_filter(lt, x -> list_contains(['le','la','et','un','une','est','dans','les'], x))) AS s_fr,
             len(list_filter(lt, x -> list_contains(['的','是','在','了','我','有','和','不'], x))) AS s_zh,
             len(lt) AS ntok
           FROM t),
         q AS (
           SELECT CASE WHEN s_en = greatest(s_en, s_de, s_es, s_fr, s_zh) AND s_en > 0 THEN 'en'
                       WHEN s_de = greatest(s_en, s_de, s_es, s_fr, s_zh) AND s_de > 0 THEN 'de'
                       WHEN s_es = greatest(s_en, s_de, s_es, s_fr, s_zh) AND s_es > 0 THEN 'es'
                       WHEN s_fr = greatest(s_en, s_de, s_es, s_fr, s_zh) AND s_fr > 0 THEN 'fr'
                       WHEN s_zh = greatest(s_en, s_de, s_es, s_fr, s_zh) AND s_zh > 0 THEN 'zh'
                       ELSE 'und' END AS lang_id,
                  CASE WHEN text IS NULL THEN NULL
                       WHEN length(trim(text)) > 0 THEN
                         0.3 * least(ntok::DOUBLE / 100.0, 1.0)
                         + 0.4 * least(5.0 * (s_en::DOUBLE / ntok::DOUBLE), 1.0)
                         + 0.3 * (length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g'))::DOUBLE / length(text)::DOUBLE)
                       ELSE 0.0 END AS quality
           FROM sc)
         SELECT lang_id, count(*) AS n_docs,
                CAST(sum(CAST(round(quality * 1000000) AS BIGINT)) AS BIGINT) AS quality_sum_micro
         FROM q GROUP BY lang_id ORDER BY lang_id""",
    "q26_token_freq" ->
      """SELECT t AS token, count(*) AS n FROM (
           SELECT unnest(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), '\s+')) AS t
           FROM documents)
         GROUP BY t ORDER BY n DESC, t LIMIT 20""",
    // temperature budgets replayed: per-source pow(n,0.5) micro-rounded,
    // long-summed normalizer, integer-division budgets, q63's hash-order
    // cumulative admission rule
    "q114_temperature_mix" ->
      """WITH d AS (SELECT doc_id, source,
                len(string_split_regex(trim(text), '\s+'))::BIGINT AS ntok,
                list_sum([ (instr('0123456789abcdef', substr(md5(doc_id::VARCHAR), k, 1)) - 1)
                           * pow(16, 15 - k)::BIGINT for k in range(1, 16)])::BIGINT AS h60
              FROM documents),
         tot AS (SELECT source, CAST(sum(ntok) AS BIGINT) AS w_total FROM d GROUP BY source),
         pm AS (SELECT source, w_total,
                       CAST(round(pow(w_total::DOUBLE, 0.5) * 1000000) AS BIGINT) AS pw
                FROM tot),
         z AS (SELECT CAST(sum(pw) AS BIGINT) AS zm FROM pm),
         bud AS (SELECT source, w_total, (50000 * pw) // zm AS budget FROM pm, z),
         adm AS (SELECT d.source, d.ntok, bud.budget, bud.w_total,
                        sum(ntok) OVER (PARTITION BY d.source ORDER BY h60, doc_id
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
                 FROM d JOIN bud USING (source))
         SELECT source, count(*) AS n_docs, CAST(sum(ntok) AS BIGINT) AS n_tokens_sel,
                max(w_total) AS w_total, max(budget) AS budget
         FROM adm WHERE cum - ntok < budget
         GROUP BY source ORDER BY source""",
    // exact flag-sums replayed; the theta set-operation bounds are
    // asserted Spark-side against the sketch's own 3σ interval, TRUE here
    "q113_theta_sets" ->
      """WITH f AS (SELECT user_id,
                max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS v,
                max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p
              FROM events WHERE event_type IN ('view', 'purchase')
              GROUP BY user_id)
         SELECT CAST(sum(CASE WHEN v = 1 AND p = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_both_exact,
                CAST(sum(CASE WHEN v = 1 AND p = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_view_only_exact,
                TRUE AS ok_intersect, TRUE AS ok_diff
         FROM f""",
    // exact top-20 replayed (q26); the frequency-sketch brackets are the
    // sketch's deterministic guarantee, asserted Spark-side, TRUE here
    "q112_heavy_hitters" ->
      """SELECT t AS token, count(*) AS n, TRUE AS ok_bounds FROM (
           SELECT unnest(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), '\s+')) AS t
           FROM documents)
         GROUP BY t ORDER BY n DESC, t LIMIT 20""",
    "q27_dedup_exact" ->
      """SELECT md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fingerprint,
                min(doc_id) AS keep_id, count(*) AS n_copies
         FROM documents GROUP BY 1 ORDER BY keep_id""",
    "q28_ngram_jaccard" ->
      """WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
         s AS (SELECT doc_id,
                      list_sort(list_distinct([
                        list_sum([ (instr('0123456789abcdef', substr(md5(x), k, 1)) - 1)
                                   * pow(16, 15 - k)::BIGINT for k in range(1, 16)])
                        for x in list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                                for i in range(1, len(w) - 1)])])) AS sh
               FROM w),
         e AS (SELECT doc_id, len(sh) AS nsh, unnest(sh) AS shingle FROM s)
         SELECT id_a, id_b, jaccard FROM (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                  count(*)::DOUBLE / (a.nsh + b.nsh - count(*)) AS jaccard
           FROM e a JOIN e b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
           GROUP BY a.doc_id, b.doc_id, a.nsh, b.nsh) t
         WHERE jaccard >= 0.8 ORDER BY id_a, id_b""",
    "q29_minhash_lsh" ->
      """WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
         s AS (SELECT doc_id,
                      list_sort(list_distinct([
                        list_sum([ (instr('0123456789abcdef', substr(md5(x), k, 1)) - 1)
                                   * pow(16, 15 - k)::BIGINT for k in range(1, 16)])
                        for x in list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                                for i in range(1, len(w) - 1)])])) AS sh
               FROM w),
         s2 AS (SELECT doc_id, sh, len(sh) AS nsh FROM s WHERE len(sh) > 0),
         ws AS (SELECT doc_id, unnest(sh)::VARCHAR AS x FROM s2),
         ww AS (SELECT doc_id,
                       list_sum([ (instr('0123456789abcdef', substr(md5(x), k, 1)) - 1)
                                  * pow(16, 8 - k)::BIGINT for k in range(1, 9)]) AS w0,
                       list_sum([ (instr('0123456789abcdef', substr(md5(x), k + 8, 1)) - 1)
                                  * pow(16, 8 - k)::BIGINT for k in range(1, 9)]) AS w1
                FROM ws),
         sigl AS (SELECT doc_id, i, min((w0 + i * w1) % 2147483647) AS mh
                  FROM ww, range(0, 12) r(i) GROUP BY doc_id, i),
         bands AS (SELECT doc_id, i // 3 AS bi,
                          md5(string_agg(mh::VARCHAR, '|' ORDER BY i)) AS bk
                   FROM sigl GROUP BY doc_id, i // 3),
         cand AS (SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
                  FROM bands a JOIN bands b ON a.bi = b.bi AND a.bk = b.bk AND a.doc_id < b.doc_id)
         SELECT id_a, id_b, jaccard FROM (
           SELECT c.ia AS id_a, c.ib AS id_b,
                  len(list_intersect(x.sh, y.sh))::DOUBLE
                    / (x.nsh + y.nsh - len(list_intersect(x.sh, y.sh))) AS jaccard
           FROM cand c JOIN s2 x ON x.doc_id = c.ia JOIN s2 y ON y.doc_id = c.ib) t
         WHERE jaccard >= 0.8 ORDER BY id_a, id_b""",
    "q30_simhash_pairs" ->
      """WITH toks AS (
           SELECT doc_id,
                  unnest(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), '\s+')) AS t
           FROM documents),
         hw AS (
           SELECT doc_id,
                  list_sum([ (instr('0123456789abcdef', substr(md5(t), k, 1)) - 1)
                             * pow(16, 8 - k)::BIGINT for k in range(1, 9)]) AS w0,
                  list_sum([ (instr('0123456789abcdef', substr(md5(t), k + 8, 1)) - 1)
                             * pow(16, 8 - k)::BIGINT for k in range(1, 9)]) AS w1
           FROM toks),
         votes AS (
           SELECT doc_id, j,
                  sum(2 * ((CASE WHEN j < 32 THEN w1 >> j ELSE w0 >> (j - 32) END) & 1) - 1) AS v
           FROM hw, range(0, 64) r(j) GROUP BY doc_id, j),
         h AS (SELECT doc_id,
                      CAST(sum(CASE WHEN v > 0 THEN
                             CASE WHEN j = 63 THEN -9223372036854775808 ELSE 1::BIGINT << j END
                           ELSE 0 END) AS BIGINT) AS sh64
               FROM votes GROUP BY doc_id),
         banded AS (SELECT doc_id, sh64, bi, (sh64 >> (bi * 16)::INT) & 65535 AS bandval
                    FROM h, range(0, 4) r(bi)),
         cand AS (SELECT DISTINCT a.doc_id AS id_a, a.sh64 AS ha, b.doc_id AS id_b, b.sh64 AS hb
                  FROM banded a JOIN banded b
                    ON a.bi = b.bi AND a.bandval = b.bandval AND a.doc_id < b.doc_id)
         SELECT id_a, id_b, bit_count(xor(ha, hb))::BIGINT AS hamming
         FROM cand
         WHERE bit_count(xor(ha, hb)) <= 3 ORDER BY id_a, id_b""",
    "q69_substring_dup" ->
      """WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
         sh AS (SELECT doc_id, unnest(list_distinct([array_to_string(w[i:i+29], ' ')
                      for i in range(1, len(w) - 28)])) AS s
                FROM w WHERE len(w) >= 30),
         e AS (SELECT doc_id,
                      list_sum([ (instr('0123456789abcdef', substr(md5(s), kk, 1)) - 1)
                                 * pow(16, 15 - kk)::BIGINT for kk in range(1, 16)]) AS h
               FROM sh)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
         FROM e a JOIN e b ON a.h = b.h AND a.doc_id < b.doc_id
         GROUP BY 1, 2 ORDER BY id_a, id_b""",
    "q31_ann_bruteforce" ->
      """WITH v AS (SELECT vec_id,
                           [round(x::DOUBLE * 1000)::BIGINT for x in embedding] AS q,
                           list_sum([round(x::DOUBLE * 1000)::BIGINT * round(x::DOUBLE * 1000)::BIGINT for x in embedding]) AS nn
                    FROM embeddings)
         SELECT query_id, nbr_id, cosine, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, nbr_id) AS rank
         FROM (
           SELECT q.vec_id AS query_id, c.vec_id AS nbr_id,
                  list_sum([p[1] * p[2] for p in list_zip(q.q, c.q)])::DOUBLE
                    / NULLIF(sqrt(q.nn::DOUBLE) * sqrt(c.nn::DOUBLE), 0) AS cosine
           FROM v q JOIN v c ON q.vec_id < 10 AND q.vec_id <> c.vec_id) t
         QUALIFY rank <= 5 ORDER BY query_id, rank""",
    "q32_ann_bucketed" ->
      s"""WITH $sqlVecs, ${sqlLshBuckets(16)}, $sqlLshProbes, $sqlLshTopK
         SELECT query_id, nbr_id, cosine, rank FROM lsh_k ORDER BY query_id, rank""",
    // 5 greedy MMR rounds unrolled; round 1 is the pure relevance argmax,
    // each later round re-ranks by rel − max-sim-to-selected (λ=1/2 in
    // lDen-scaled integers) over the NOT-EXISTS remainder
    "q134_mmr_rerank" ->
      s"""WITH $sqlVecs,
         ${sqlMmrChain(5)}
         SELECT query_id, nbr_id, mmr_rank FROM mmr_sel5
         ORDER BY query_id, mmr_rank""",
    // adjacent bigrams via the q127 list_zip(t, t[2:]) pattern (NULL-padded
    // tail dropped); one rounded ln per count, exact integer PMI
    "q135_pmi_collocations" ->
      """WITH toks AS (SELECT string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), '\s+') AS t
              FROM documents WHERE text IS NOT NULL),
         bg AS (SELECT unnest([[p[1], p[2]] for p in list_zip(t, t[2:])]) AS pr
                FROM toks WHERE len(t) >= 2),
         c2 AS (SELECT pr[1] AS w1, pr[2] AS w2, CAST(count(*) AS BIGINT) AS c2
                FROM bg WHERE pr[2] IS NOT NULL GROUP BY 1, 2),
         ucnt AS (SELECT t, CAST(count(*) AS BIGINT) AS cu
                  FROM (SELECT unnest(t) AS t FROM toks) u GROUP BY 1),
         nbg AS (SELECT CAST(sum(c2) AS BIGINT) AS nbg FROM c2)
         SELECT c2.w1, c2.w2, c2.c2 AS n_pair,
                CAST(round(ln(c2.c2) * 1000000) AS BIGINT)
                  + CAST(round(ln(nbg.nbg) * 1000000) AS BIGINT)
                  - CAST(round(ln(a.cu) * 1000000) AS BIGINT)
                  - CAST(round(ln(b.cu) * 1000000) AS BIGINT) AS pmi_micro
         FROM c2 JOIN ucnt a ON a.t = c2.w1 JOIN ucnt b ON b.t = c2.w2 CROSS JOIN nbg
         WHERE c2.c2 >= 5
         ORDER BY pmi_micro DESC, w1, w2 LIMIT 20""",
    // centroid in per-dim integer-SUM form (exact BIGINT hash-agg); the
    // single rounding is the final nano cosine, ranks ascending — the
    // zero-norm sentinel mirrors the Spark side's -2e9 pin
    "q137_centroid_outliers" ->
      s"""WITH $sqlVecs,
         g AS (SELECT vec_id, vec_id % 8 AS grp, q, nn FROM v),
         e AS (SELECT grp, d, q[d] AS x
               FROM g, unnest(range(1, len(q) + 1)) AS t(d)),
         sums AS (SELECT grp, d, CAST(sum(x) AS BIGINT) AS sx FROM e GROUP BY 1, 2),
         cvec AS (SELECT grp, list(sx ORDER BY d) AS cs FROM sums GROUP BY 1),
         cn AS (SELECT grp, cs, list_sum([y * y for y in cs]) AS cnn FROM cvec),
         scored AS (SELECT g.grp, g.vec_id,
                COALESCE(CAST(round(
                    list_sum([p[1] * p[2] for p in list_zip(g.q, cn.cs)])::DOUBLE
                      / NULLIF(sqrt(g.nn::DOUBLE) * sqrt(cn.cnn::DOUBLE), 0)
                      * 1000000000) AS BIGINT), -2000000000) AS cos_nano
              FROM g JOIN cn ON g.grp = cn.grp),
         rk AS (SELECT grp, vec_id, cos_nano,
                row_number() OVER (PARTITION BY grp
                  ORDER BY cos_nano ASC, vec_id) AS rank
              FROM scored)
         SELECT grp, vec_id, cos_nano, CAST(rank AS BIGINT) AS rank
         FROM rk WHERE rank <= 5 ORDER BY grp, rank""",
    // the naive probe×dict all-pairs scan the standing signature index
    // avoids; the md5-based three-way split is engine-identical (both
    // engines emit lowercase hex)
    "q136_fuzzy_index" ->
      """WITH v AS (SELECT DISTINCT p_name AS name FROM part),
         dict AS (SELECT name FROM v WHERE md5(name) >= '2'),
         probe AS (SELECT name FROM v WHERE md5(name) < '2')
         SELECT p.name AS name_p, d.name AS name_d,
                CAST(levenshtein(p.name, d.name) AS BIGINT) AS dist
         FROM probe p JOIN dict d ON levenshtein(p.name, d.name) <= 2
         ORDER BY name_p, name_d""",
    "q52_ann_recall" ->
      s"""WITH $sqlVecs, ${sqlLshBuckets(16)}, $sqlLshProbes, $sqlIvfChain, $sqlLshTopK, $sqlIvfTopK,
         brute AS (
           SELECT query_id, nbr_id FROM (
             SELECT q.vec_id AS query_id, c.vec_id AS nbr_id,
                    row_number() OVER (PARTITION BY q.vec_id
                      ORDER BY list_sum([p[1] * p[2] for p in list_zip(q.q, c.q)])::DOUBLE
                                 / NULLIF(sqrt(q.nn::DOUBLE) * sqrt(c.nn::DOUBLE), 0) DESC,
                               c.vec_id) AS rank
             FROM v q JOIN v c ON q.vec_id < 10 AND q.vec_id <> c.vec_id) t
           WHERE rank <= 5)
         SELECT b.query_id, count(*) AS k,
                CAST(sum(CASE WHEN l.nbr_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit_lsh,
                CAST(sum(CASE WHEN i.nbr_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit_ivf
         FROM brute b
         LEFT JOIN lsh_k l ON l.query_id = b.query_id AND l.nbr_id = b.nbr_id
         LEFT JOIN ivf_k i ON i.query_id = b.query_id AND i.nbr_id = b.nbr_id
         GROUP BY b.query_id ORDER BY b.query_id""",
    "q50_ann_ivf" ->
      s"""WITH $sqlVecs, $sqlIvfChain, $sqlIvfTopK
         SELECT query_id, nbr_id, cosine, rank FROM ivf_k ORDER BY query_id, rank""",
    "q33_embedding_neardup" ->
      s"""WITH $sqlVecs, ${sqlLshBuckets(24)}, $sqlLshProbesAll
         SELECT id_a, id_b, cosine FROM (
           SELECT cand.id_a, cand.id_b,
                  list_sum([p[1] * p[2] for p in list_zip(x.q, y.q)])::DOUBLE
                    / NULLIF(sqrt(x.nn::DOUBLE) * sqrt(y.nn::DOUBLE), 0) AS cosine
           FROM (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
                 FROM pb a JOIN bk b ON a.t = b.t AND a.bucket = b.bucket
                   AND a.vec_id < b.vec_id) cand
           JOIN v x ON x.vec_id = cand.id_a
           JOIN v y ON y.vec_id = cand.id_b) t
         WHERE cosine >= 0.3 ORDER BY id_a, id_b""",
    // q33's LSH chain split by the q72 hash-shard: bits sized from the
    // CORPUS count (shard <> 0), corpus buckets plain, DELTA side (shard 0)
    // multi-probed, join on a.vec_id <> b.vec_id (disjoint shards anyway)
    "q115_embedding_delta" ->
      s"""WITH $sqlEmbVv,
         ${sqlEmbBits("nb", "shard <> 0")},
         ${sqlEmbShardBuckets("bk", "shard <> 0", "nb")},
         ${sqlEmbShardBuckets("dk", "shard = 0", "nb")},
         ${sqlEmbProbes("pb", "dk", "nb")},
         ${sqlEmbPairs("pairs", "pb", "bk", "a.vec_id <> b.vec_id")}
         SELECT p.id_a, p.id_b,
                list_sum([z[1] * z[2] for z in list_zip(x.q, y.q)])::DOUBLE
                  / NULLIF(sqrt(x.nn::DOUBLE) * sqrt(y.nn::DOUBLE), 0) AS cosine
         FROM pairs p JOIN vv x ON x.vec_id = p.id_a
                      JOIN vv y ON y.vec_id = p.id_b
         ORDER BY id_a, id_b""",
    // PQ chain replayed: 16 sub-vectors per doc (dim 64 / m 16), one
    // hash-ordered 64-doc seed set for every subspace, 2 per-subspace
    // integer Lloyd rounds (assignment argmin ties to lowest cent_id,
    // per-dim rounded means), final codes, per-query dot lookup tables,
    // ADC shortlist of 50 with exact stored norms, exact rerank to
    // top-5, exact brute top-5 for `hit`
    "q118_pq_topk" ->
      s"""WITH $sqlVecs,
         ${sqlPqSubVecs("v", "q")},
         ${sqlPqTrainChain("embeddings")},
         qn AS (SELECT vec_id AS query_id, nn FROM v WHERE vec_id < 10),
         lut AS (SELECT sv.vec_id AS query_id, b.sub, b.cent_id AS code,
                        list_sum([p[1] * p[2] for p in list_zip(sv.svc, b.cv)]) AS dot
                 FROM sv JOIN b2 b ON b.sub = sv.sub WHERE sv.vec_id < 10),
         sc2 AS (SELECT l.query_id, a.vec_id AS nbr_id,
                        CAST(sum(l.dot) AS BIGINT) AS adc_dot
                 FROM af a JOIN lut l ON l.sub = a.sub AND l.code = a.code
                 WHERE l.query_id <> a.vec_id GROUP BY 1, 2),
         $sqlAdcTail,
         $sqlExactTop5
         $sqlPqHitSelect""",
    // IVF-PQ: the q50 ivf chain (cells + probed query cells) intersected
    // with the q118 PQ chain — candidates are probed-cell corpus rows,
    // ADC-scored from codes, shortlisted, exactly reranked
    "q119_ivfpq_topk" ->
      s"""WITH $sqlVecs, $sqlIvfChain,
         ${sqlPqSubVecs("v", "q")},
         ${sqlPqTrainChain("embeddings")},
         $sqlIvfPqFlatSearch,
         $sqlAdcTail,
         $sqlExactTop5
         $sqlPqHitSelect""",
    // stored-index search: train-once/persist/load answers BIT-IDENTICALLY
    // to the one-call chain (cents/books/codes are stored bytes), so the
    // oracle IS the q119 chain, minus the recall audit column
    "q120_ivfpq_indexed" ->
      s"""WITH $sqlVecs, $sqlIvfChain,
         ${sqlPqSubVecs("v", "q")},
         ${sqlPqTrainChain("embeddings")},
         $sqlIvfPqFlatSearch,
         $sqlAdcTail
         SELECT query_id, nbr_id, cosine_micro, rank FROM pq
         ORDER BY query_id, rank""",
    // residual IVF-PQ: the q119 chain with the PQ half rebound to
    // residual space — rv replaces v as the sub-vector source, and the
    // search adds the q·centroid base term per probed cell
    "q121_ivfpq_residual" ->
      s"""WITH $sqlVecs, $sqlIvfChain,
         $sqlPqResidualVecs,
         ${sqlPqSubVecs("rv", "rq")},
         ${sqlPqTrainChain("embeddings")},
         $sqlIvfPqResidualSearch,
         $sqlAdcTail,
         $sqlExactTop5
         $sqlPqHitSelect""",
    // no-retrain ingest: the whole training chain is RESTRICTED to the
    // shard<>0 corpus (v rebound, cells counted from it, seeds drawn from
    // it), then the shard-0 delta is assigned by pure argmin against the
    // trained c4 cells and b2 codebooks — cell first, then codes of its
    // residual against that cell's centroid
    "q122_pq_ingest" ->
      s"""WITH $sqlEmbVv,
         v AS (SELECT vec_id, q, nn FROM vv WHERE shard <> 0),
         d AS (SELECT vec_id, q, nn FROM vv WHERE shard = 0),
         ${sqlIvfChainOver("v")},
         $sqlPqResidualVecs,
         ${sqlPqSubVecs("rv", "rq")},
         ${sqlPqTrainChain("v")},
         dasg AS (SELECT vec_id, cell FROM (
            SELECT d.vec_id, c.cent_id AS cell,
                   row_number() OVER (PARTITION BY d.vec_id
                     ORDER BY d.nn - 2 * list_sum([p[1] * p[2] for p in list_zip(d.q, c.cv)]) + c.cc,
                              c.cent_id) AS cr
            FROM d, c4 c) t WHERE cr = 1),
         drv AS (SELECT da.vec_id, da.cell,
                        [p[1] - p[2] for p in list_zip(d.q, c.cv)] AS rq
                 FROM dasg da JOIN d ON d.vec_id = da.vec_id
                      JOIN c4 c ON c.cent_id = da.cell),
         dsv AS (SELECT vec_id, cell, s AS sub,
                        [rq[i] for i in range(s * 4 + 1, s * 4 + 5)] AS svc,
                        list_sum([rq[i] * rq[i] for i in range(s * 4 + 1, s * 4 + 5)]) AS svv
                 FROM drv, range(0, 16) r(s)),
         dcode AS (SELECT vec_id, sub, code FROM (
            SELECT dsv.vec_id, dsv.sub, b.cent_id AS code,
                   row_number() OVER (PARTITION BY dsv.vec_id, dsv.sub
                     ORDER BY dsv.svv - 2 * list_sum([p[1] * p[2] for p in list_zip(dsv.svc, b.cv)]) + b.cc,
                              b.cent_id) AS cr
            FROM dsv JOIN b2 b ON b.sub = dsv.sub) t WHERE cr = 1)
         SELECT dc.vec_id AS id, da.cell, dc.sub, dc.code
         FROM dcode dc JOIN dasg da ON da.vec_id = dc.vec_id
         ORDER BY id, sub""",
    // the three pair sets of the incremental semantic fold — corpus
    // self-join (corpus-sized bits), delta↔corpus (delta probed in the
    // CORPUS's bucket space), delta self-join (delta-sized bits) — closed
    // transitively; the gate asserts incremental ≡ full over these edges
    "q117_semantic_incremental" ->
      s"""WITH RECURSIVE $sqlEmbVv,
         ${sqlEmbBits("nbc", "shard <> 0")},
         ${sqlEmbBits("nbd", "shard = 0")},
         ${sqlEmbShardBuckets("bkc", "shard <> 0", "nbc")},
         ${sqlEmbProbes("pbc", "bkc", "nbc")},
         ${sqlEmbShardBuckets("dkc", "shard = 0", "nbc")},
         ${sqlEmbProbes("pdc", "dkc", "nbc")},
         ${sqlEmbShardBuckets("bkd", "shard = 0", "nbd")},
         ${sqlEmbProbes("pbd", "bkd", "nbd")},
         ${sqlEmbPairs("cp", "pbc", "bkc", "a.vec_id < b.vec_id")},
         ${sqlEmbPairs("xp", "pdc", "bkc", "a.vec_id <> b.vec_id")},
         ${sqlEmbPairs("dp", "pbd", "bkd", "a.vec_id < b.vec_id")},
         edges AS (SELECT id_a AS a, id_b AS b FROM cp
                   UNION SELECT id_b, id_a FROM cp
                   UNION SELECT id_a, id_b FROM xp
                   UNION SELECT id_b, id_a FROM xp
                   UNION SELECT id_a, id_b FROM dp
                   UNION SELECT id_b, id_a FROM dp),
         reach(a, b) AS (SELECT a, b FROM edges
                         UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         comp AS (SELECT a AS id, least(a, min(b)) AS component FROM reach GROUP BY a)
         SELECT id, component FROM comp WHERE component <> id ORDER BY id""",
    // q33's pair chain closed transitively (q49's recursive-CTE shape) into
    // components; each component keeps its first row under (label, vec_id)
    // — the keepBy window replayed relationally
    "q116_semantic_dedup" ->
      s"""WITH RECURSIVE $sqlVecs, ${sqlLshBuckets(24)}, $sqlLshProbesAll,
         pairs AS (SELECT id_a, id_b FROM (
           SELECT cand.id_a, cand.id_b,
                  list_sum([p[1] * p[2] for p in list_zip(x.q, y.q)])::DOUBLE
                    / NULLIF(sqrt(x.nn::DOUBLE) * sqrt(y.nn::DOUBLE), 0) AS cosine
           FROM (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
                 FROM pb a JOIN bk b ON a.t = b.t AND a.bucket = b.bucket
                   AND a.vec_id < b.vec_id) cand
           JOIN v x ON x.vec_id = cand.id_a
           JOIN v y ON y.vec_id = cand.id_b) t
           WHERE cosine >= 0.3),
         edges AS (SELECT id_a AS a, id_b AS b FROM pairs
                   UNION SELECT id_b, id_a FROM pairs),
         reach(a, b) AS (SELECT a, b FROM edges
                         UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         comp AS (SELECT a AS vec_id, least(a, min(b)) AS component FROM reach GROUP BY a),
         lab AS (SELECT e.vec_id, e.label, coalesce(c.component, e.vec_id) AS component
                 FROM embeddings e LEFT JOIN comp c USING (vec_id)),
         r AS (SELECT vec_id, label,
                      row_number() OVER (PARTITION BY component ORDER BY label, vec_id) AS rk
               FROM lab)
         SELECT vec_id, label FROM r WHERE rk = 1 ORDER BY vec_id""",
    "q83_sparse_cosine" ->
      """WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
         s AS (SELECT doc_id,
                      list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                     for i in range(1, len(w) - 1)]) AS sh
               FROM w),
         tf AS (SELECT doc_id AS doc, term, count(*) AS tf
                FROM (SELECT doc_id, unnest(sh) AS term FROM s) GROUP BY 1, 2),
         kept AS (SELECT term FROM tf GROUP BY term HAVING count(*) <= 10),
         ktf AS (SELECT tf.* FROM tf JOIN kept USING (term)),
         n2 AS (SELECT doc, sum(tf * tf) AS n2 FROM ktf GROUP BY 1),
         dots AS (SELECT a.doc AS doc_a, b.doc AS doc_b, sum(a.tf * b.tf) AS dot
                  FROM ktf a JOIN ktf b USING (term)
                  WHERE a.doc < b.doc GROUP BY 1, 2),
         c AS (SELECT doc_a, doc_b,
                      dot::DOUBLE / NULLIF(sqrt(na.n2::DOUBLE) * sqrt(nb.n2::DOUBLE), 0) AS cosine
               FROM dots JOIN n2 na ON na.doc = doc_a JOIN n2 nb ON nb.doc = doc_b)
         SELECT doc_a, doc_b, CAST(round(cosine * 1e6) AS BIGINT) AS cosine_micro
         FROM c WHERE cosine >= 0.6 ORDER BY doc_a, doc_b""",
    "q53_neardup_recall" ->
      s"""WITH $sqlVecs, ${sqlLshBuckets(24)}, $sqlLshProbesAll,
         found AS (SELECT id_a, id_b FROM (
           SELECT cand.id_a, cand.id_b,
                  list_sum([p[1] * p[2] for p in list_zip(x.q, y.q)])::DOUBLE
                    / NULLIF(sqrt(x.nn::DOUBLE) * sqrt(y.nn::DOUBLE), 0) AS cosine
           FROM (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
                 FROM pb a JOIN bk b ON a.t = b.t AND a.bucket = b.bucket
                   AND a.vec_id < b.vec_id) cand
           JOIN v x ON x.vec_id = cand.id_a
           JOIN v y ON y.vec_id = cand.id_b) t
           WHERE cosine >= 0.3),
         vcap AS (SELECT vec_id, q, nn FROM (
                    SELECT vec_id, q, nn,
                           row_number() OVER (ORDER BY md5(vec_id::VARCHAR), vec_id) AS sr
                    FROM v) t WHERE sr <= 800),
         exact AS (SELECT x.vec_id AS id_a, y.vec_id AS id_b
                   FROM vcap x JOIN vcap y ON x.vec_id < y.vec_id
                   WHERE list_sum([p[1] * p[2] for p in list_zip(x.q, y.q)])::DOUBLE
                         / NULLIF(sqrt(x.nn::DOUBLE) * sqrt(y.nn::DOUBLE), 0) >= 0.3)
         SELECT count(*) AS n_exact,
                CAST(sum(CASE WHEN f.id_a IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_found,
                CAST(sum(CASE WHEN f.id_a IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)::DOUBLE
                  / count(*)::DOUBLE AS recall
         FROM exact e LEFT JOIN found f ON e.id_a = f.id_a AND e.id_b = f.id_b""",
    "q54_asof_join" ->
      """WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS t, value
                    FROM events WHERE event_type = 'purchase'),
           v AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS t, max(value) AS view_value
                 FROM events WHERE event_type = 'view' GROUP BY 1, 2)
         SELECT p.event_id, p.user_id, epoch_us(p.t) AS ts_us, p.value,
                epoch_us(v.t) AS view_ts_us, v.view_value
         FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.t >= v.t
         ORDER BY event_id""",
    "q55_range_join" ->
      """WITH bands AS (SELECT o_orderpriority AS band, min(o_totalprice) AS lo,
                               (min(o_totalprice) + max(o_totalprice)) / 2 AS hi
                        FROM orders GROUP BY 1)
         SELECT band, count(*) AS n
         FROM orders o JOIN bands b ON o.o_totalprice BETWEEN b.lo AND b.hi
         GROUP BY band ORDER BY band""",
    "q82_interval_join" ->
      """WITH c AS (SELECT user_id, event_id AS click_id,
                           epoch_us(CAST(ts AS TIMESTAMP)) AS c_lo,
                           epoch_us(CAST(ts AS TIMESTAMP)) + 1800000000 AS c_hi
                    FROM events WHERE event_type = 'click'),
         p AS (SELECT user_id, event_id AS purchase_id,
                      epoch_us(CAST(ts AS TIMESTAMP)) AS p_lo,
                      epoch_us(CAST(ts AS TIMESTAMP)) + 1800000000 AS p_hi
               FROM events WHERE event_type = 'purchase')
         SELECT c.user_id, click_id, purchase_id
         FROM c JOIN p ON c.user_id = p.user_id
                      AND c_lo <= p_hi AND p_lo <= c_hi
         ORDER BY 1, 2, 3""",
    "q86_salted_join" ->
      """SELECT o_orderkey, o_custkey, c_name
         FROM orders JOIN customer ON c_custkey = o_custkey
         ORDER BY o_orderkey""",
    "q56_hash_sample" ->
      """WITH h AS (
           SELECT doc_id,
                  list_sum([ (instr('0123456789abcdef', substr(md5(doc_id::VARCHAR), k, 1)) - 1)
                             * pow(16, 15 - k)::BIGINT for k in range(1, 16)])::BIGINT AS h60
           FROM documents)
         SELECT doc_id, (h60 % 10)::BIGINT AS shard
         FROM h WHERE h60 >= 0 AND h60 < CAST(0.25 * pow(2, 60) AS BIGINT)
         ORDER BY doc_id""",
    "q85_stratified_sample" ->
      """WITH h AS (
           SELECT doc_id, lang, source,
                  list_sum([ (instr('0123456789abcdef', substr(md5(doc_id::VARCHAR), k, 1)) - 1)
                             * pow(16, 15 - k)::BIGINT for k in range(1, 16)])::BIGINT AS h60
           FROM documents),
         r AS (SELECT doc_id, lang, source,
                      row_number() OVER (PARTITION BY lang, source
                                         ORDER BY h60, doc_id) AS rn
               FROM h)
         SELECT doc_id, lang, source FROM r WHERE rn <= 5 ORDER BY doc_id""",
    "q57_decontamination" ->
      """WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
         s AS (SELECT doc_id,
                      list_sort(list_distinct([
                        list_sum([ (instr('0123456789abcdef', substr(md5(x), k, 1)) - 1)
                                   * pow(16, 15 - k)::BIGINT for k in range(1, 16)])
                        for x in list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                                for i in range(1, len(w) - 1)])])) AS sh
               FROM w),
         s2 AS (SELECT doc_id, sh, len(sh) AS nsh FROM s WHERE len(sh) > 0),
         hs AS (SELECT doc_id,
                       (list_sum([ (instr('0123456789abcdef', substr(md5(doc_id::VARCHAR), k, 1)) - 1)
                                   * pow(16, 15 - k)::BIGINT for k in range(1, 16)])::BIGINT % 5)
                         AS shard
                FROM documents),
         tr AS (SELECT s2.doc_id AS train_id, unnest(sh) AS x
                FROM s2 JOIN hs ON s2.doc_id = hs.doc_id WHERE hs.shard != 0),
         ev AS (SELECT s2.doc_id AS eval_id, nsh AS eval_nsh, unnest(sh) AS x
                FROM s2 JOIN hs ON s2.doc_id = hs.doc_id WHERE hs.shard = 0)
         SELECT train_id, eval_id, count(*) AS n_common,
                count(*)::DOUBLE / eval_nsh::DOUBLE AS containment
         FROM tr JOIN ev ON tr.x = ev.x
         GROUP BY train_id, eval_id, eval_nsh
         HAVING count(*)::DOUBLE / eval_nsh::DOUBLE >= 0.5
         ORDER BY train_id, eval_id""",
    "q58_sequence_pack" ->
      """WITH t AS (
           SELECT doc_id,
                  len(string_split_regex(trim(text), '\s+'))::BIGINT AS n_tokens,
                  (list_sum([ (instr('0123456789abcdef', substr(md5(doc_id::VARCHAR), k, 1)) - 1)
                              * pow(16, 15 - k)::BIGINT for k in range(1, 16)])::BIGINT % 8)
                    AS shard
           FROM documents),
         p AS (
           SELECT doc_id, shard,
                  coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
                    AS bin_tokens_before
           FROM t)
         SELECT doc_id, shard, bin_tokens_before,
                (bin_tokens_before // 4096)::BIGINT AS bin
         FROM p ORDER BY doc_id""",
    "q59_topk_per_key" ->
      """SELECT lang, source, doc_id, n_chars FROM (
           SELECT lang, source, doc_id, n_chars,
                  row_number() OVER (PARTITION BY lang, source
                                     ORDER BY n_chars DESC, doc_id ASC) AS rn
           FROM documents)
         WHERE rn <= 3 ORDER BY lang, source, doc_id""",
    "q61_repetition" ->
      """WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
         bg AS (SELECT doc_id, unnest([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS g
                FROM w WHERE len(w) >= 2),
         bc AS (SELECT doc_id, g, count(*) AS cnt FROM bg GROUP BY 1, 2),
         ba AS (SELECT doc_id,
                  CAST(sum(cnt) AS BIGINT) AS n_bg,
                  CAST(max(cnt * length(g)) AS BIGINT) AS cover,
                  CAST(coalesce(sum(CASE WHEN cnt > 1 THEN cnt * length(g) END), 0) AS BIGINT) AS dupc
                FROM bc GROUP BY 1),
         ln0 AS (SELECT doc_id, trim(l) AS l
                 FROM (SELECT doc_id, unnest(string_split(text, chr(10))) AS l FROM documents)
                 WHERE trim(l) <> ''),
         lc AS (SELECT doc_id, l, count(*) AS cnt FROM ln0 GROUP BY 1, 2),
         la AS (SELECT doc_id,
                  CAST(sum(cnt) AS BIGINT) AS n_ln,
                  CAST(coalesce(sum(CASE WHEN cnt > 1 THEN cnt END), 0) AS BIGINT) AS ndup,
                  CAST(sum(cnt * length(l)) AS BIGINT) AS allc,
                  CAST(coalesce(sum(CASE WHEN cnt > 1 THEN cnt * length(l) END), 0) AS BIGINT) AS dupl
                FROM lc GROUP BY 1)
         SELECT d.doc_id,
                coalesce(ba.n_bg, 0) AS n_bigrams,
                coalesce(ba.cover * 1000000 // length(d.text), 0) AS top_bigram_cover_ppm,
                coalesce(ba.dupc * 1000000 // length(d.text), 0) AS dup_bigram_char_ppm,
                coalesce(la.n_ln, 0) AS n_lines,
                coalesce(la.ndup * 1000000 // la.n_ln, 0) AS dup_line_ppm,
                coalesce(la.dupl * 1000000 // la.allc, 0) AS dup_line_char_ppm
         FROM documents d
         LEFT JOIN ba ON ba.doc_id = d.doc_id
         LEFT JOIN la ON la.doc_id = d.doc_id
         ORDER BY d.doc_id""",
    "q62_pii_scrub" ->
      """WITH f AS (
           SELECT doc_id,
                  text || ' contact u' || doc_id::VARCHAR || '@ex' || (doc_id % 7)::VARCHAR
                       || '.org ip 10.' || (doc_id % 200)::VARCHAR || '.0.' || (doc_id % 250)::VARCHAR
                       || ' call +1 555-' || lpad((doc_id % 1000)::VARCHAR, 3, '0')
                       || '-' || lpad((doc_id % 10000)::VARCHAR, 4, '0') AS ft
           FROM documents),
         r AS (
           SELECT doc_id,
                  len(regexp_extract_all(ft, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
                  len(regexp_extract_all(ft, '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b')) AS n_ip,
                  len(regexp_extract_all(ft, '(\+1[- ]|\b1[- ])?\b[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}\b')) AS n_phone,
                  regexp_replace(regexp_replace(regexp_replace(ft,
                    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                    '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g'),
                    '(\+1[- ]|\b1[- ])?\b[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}\b', '<PHONE>', 'g') AS red
           FROM f)
         SELECT doc_id, CAST(n_email AS BIGINT) AS n_email, CAST(n_ip AS BIGINT) AS n_ip,
                CAST(n_phone AS BIGINT) AS n_phone, md5(red) AS redacted_md5,
                CAST(length(red) AS BIGINT) AS n_chars_redacted
         FROM r ORDER BY doc_id""",
    "q63_budget_sample" ->
      """WITH h AS (
           SELECT doc_id, lang, source, n_chars,
                  list_sum([ (instr('0123456789abcdef', substr(md5(doc_id::VARCHAR), k, 1)) - 1)
                             * pow(16, 15 - k)::BIGINT for k in range(1, 16)])::BIGINT AS h60
           FROM documents),
         c AS (
           SELECT doc_id, lang, source, n_chars,
                  CAST(sum(n_chars) OVER (PARTITION BY lang, source ORDER BY h60, doc_id
                                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
           FROM h)
         SELECT doc_id, lang, source, n_chars
         FROM c WHERE cum - n_chars < 3000 ORDER BY doc_id""",
    "q64_sketch_distinct" ->
      """SELECT CAST(8 AS BIGINT) AS n_shards,
                CAST(count(DISTINCT t) AS BIGINT) AS n_exact,
                TRUE AS within_5pct
         FROM (SELECT unnest(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), '\s+')) AS t
               FROM documents)""",
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
    "q68_profile" ->
      """WITH o AS (SELECT o_orderkey, o_custkey, o_orderstatus,
                           CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
                    FROM orders)
         SELECT * FROM (
           SELECT 'o_orderkey' AS col_name, count(*)::BIGINT AS n_rows,
                  (count(*) - count(o_orderkey))::BIGINT AS n_nulls,
                  min(o_orderkey)::VARCHAR AS min_value, max(o_orderkey)::VARCHAR AS max_value
           FROM o
           UNION ALL
           SELECT 'o_custkey', count(*)::BIGINT, (count(*) - count(o_custkey))::BIGINT,
                  min(o_custkey)::VARCHAR, max(o_custkey)::VARCHAR FROM o
           UNION ALL
           SELECT 'o_orderstatus', count(*)::BIGINT, (count(*) - count(o_orderstatus))::BIGINT,
                  min(o_orderstatus)::VARCHAR, max(o_orderstatus)::VARCHAR FROM o
           UNION ALL
           SELECT 'price_cents', count(*)::BIGINT, (count(*) - count(price_cents))::BIGINT,
                  min(price_cents)::VARCHAR, max(price_cents)::VARCHAR FROM o)
         ORDER BY col_name""",
    "q77_histogram" ->
      """WITH o AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
                    FROM orders),
         t AS (SELECT CASE WHEN price_cents IS NULL THEN -3
                           WHEN price_cents < 0 THEN -1
                           WHEN price_cents > 60000000 THEN -2
                           WHEN price_cents = 60000000 THEN 19
                           ELSE CAST(floor((price_cents::DOUBLE - 0.0) / 3000000.0) AS BIGINT)
                      END AS bin
               FROM o)
         SELECT bin,
                CASE WHEN bin >= 0
                     THEN 0.0::DOUBLE + bin::DOUBLE * 3000000.0::DOUBLE END AS bin_lo,
                CASE WHEN bin >= 0
                     THEN 0.0::DOUBLE + (bin + 1)::DOUBLE * 3000000.0::DOUBLE END AS bin_hi,
                count(*) AS n
         FROM t GROUP BY bin ORDER BY bin""",
    "q84_quantile_bins" ->
      """WITH vc AS (SELECT l_quantity AS v, count(*) AS n FROM lineitem
                     WHERE l_quantity IS NOT NULL GROUP BY 1),
         b AS (SELECT v,
                      CAST((coalesce(sum(n) OVER (ORDER BY v
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * 8)
                        // sum(n) OVER () AS BIGINT) AS bin
               FROM vc)
         SELECT bin, count(*) AS n, min(l_quantity) AS lo, max(l_quantity) AS hi
         FROM lineitem JOIN b ON l_quantity = b.v
         GROUP BY 1 ORDER BY 1""",
    "q67_asof_nearest" ->
      """WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS t
                    FROM events WHERE event_type = 'purchase'),
         c AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS t, max(value) AS click_value
               FROM events WHERE event_type = 'click' GROUP BY 1, 2),
         b AS (SELECT p.event_id, p.user_id, p.t, cb.t AS bt, cb.click_value AS bv
               FROM p ASOF LEFT JOIN c cb ON p.user_id = cb.user_id AND p.t >= cb.t),
         f AS (SELECT p.event_id, cf.t AS ft, cf.click_value AS fv
               FROM p ASOF LEFT JOIN c cf ON p.user_id = cf.user_id AND p.t <= cf.t)
         SELECT b.event_id, b.user_id, epoch_us(b.t) AS ts_us,
                CASE WHEN bt IS NULL THEN epoch_us(ft)
                     WHEN ft IS NULL THEN epoch_us(bt)
                     WHEN epoch_us(ft) - epoch_us(b.t) < epoch_us(b.t) - epoch_us(bt)
                       THEN epoch_us(ft) ELSE epoch_us(bt) END AS click_ts_us,
                CASE WHEN bt IS NULL THEN fv
                     WHEN ft IS NULL THEN bv
                     WHEN epoch_us(ft) - epoch_us(b.t) < epoch_us(b.t) - epoch_us(bt)
                       THEN fv ELSE bv END AS click_value
         FROM b JOIN f USING (event_id)
         ORDER BY event_id""",
    "q66_assembly" ->
      """WITH t AS (
           SELECT doc_id, source, text,
                  string_split_regex(trim(lower(text)), '\s+') AS lt,
                  len(string_split_regex(trim(text), '\s+'))::BIGINT AS n_tokens
           FROM documents),
         sc AS (
           SELECT doc_id, source, text, n_tokens,
             len(list_filter(lt, x -> list_contains(['the','a','of','and','to','in','is','it'], x))) AS s_en,
             len(list_filter(lt, x -> list_contains(['der','die','das','und','ist','ein','zu','den'], x))) AS s_de,
             len(list_filter(lt, x -> list_contains(['el','la','que','y','en','un','es','los'], x))) AS s_es,
             len(list_filter(lt, x -> list_contains(['le','la','et','un','une','est','dans','les'], x))) AS s_fr,
             len(list_filter(lt, x -> list_contains(['的','是','在','了','我','有','和','不'], x))) AS s_zh,
             len(lt) AS ntok
           FROM t),
         g AS (
           SELECT doc_id, source, n_tokens
           FROM sc
           WHERE s_en = greatest(s_en, s_de, s_es, s_fr, s_zh) AND s_en > 0
             AND (CASE WHEN text IS NULL THEN NULL
                       WHEN length(trim(text)) > 0 THEN
                         0.3 * least(ntok::DOUBLE / 100.0, 1.0)
                         + 0.4 * least(5.0 * (s_en::DOUBLE / ntok::DOUBLE), 1.0)
                         + 0.3 * (length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g'))::DOUBLE
                                  / length(text)::DOUBLE)
                       ELSE 0.0 END) >= 0.5),
         h AS (
           SELECT doc_id, source, n_tokens,
                  list_sum([ (instr('0123456789abcdef', substr(md5(doc_id::VARCHAR), k, 1)) - 1)
                             * pow(16, 15 - k)::BIGINT for k in range(1, 16)])::BIGINT AS h60
           FROM g),
         adm AS (
           SELECT doc_id, source, n_tokens, h60,
                  CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY h60, doc_id
                                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
           FROM h),
         mixed AS (
           SELECT doc_id, source, n_tokens, (h60 % 4)::BIGINT AS shard
           FROM adm WHERE cum - n_tokens < 5000),
         p AS (
           SELECT doc_id, source, shard, n_tokens,
                  coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS bfr
           FROM mixed)
         SELECT doc_id, source, shard, (bfr // 2048)::BIGINT AS bin, n_tokens
         FROM p ORDER BY doc_id""",
    "q34_tumbling_window" ->
      """SELECT epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS window_start_us,
                event_type, count(*) AS n_events,
                CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
         FROM events GROUP BY 1, 2 ORDER BY window_start_us, event_type""",
    "q79_rolling_range" ->
      """SELECT event_id, user_id, ts_us,
                count(*) OVER w AS n_2h,
                CAST(sum(cents) OVER w AS BIGINT) AS cents_2h
         FROM (SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
                      CAST(round(value * 100) AS BIGINT) AS cents
               FROM events)
         WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
                      RANGE BETWEEN 7200000000 PRECEDING AND CURRENT ROW)
         ORDER BY event_id""",
    "q78_resample_dense" ->
      """WITH b AS (SELECT epoch_us(CAST(ts AS TIMESTAMP))
                      - epoch_us(CAST(ts AS TIMESTAMP)) % 21600000000 AS bucket_us,
                           value
                    FROM events),
         a AS (SELECT bucket_us, count(*) AS n_events,
                      CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
               FROM b GROUP BY bucket_us),
         mm AS (SELECT min(bucket_us) AS lo, max(bucket_us) AS hi FROM a),
         spine AS (SELECT unnest(range(lo, hi + 21600000000, 21600000000)) AS bucket_us
                   FROM mm)
         SELECT s.bucket_us,
                coalesce(a.n_events, 0) AS n_events,
                coalesce(a.value_cents, 0) AS value_cents
         FROM spine s LEFT JOIN a ON s.bucket_us = a.bucket_us
         ORDER BY s.bucket_us""",
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
    "q36_event_pivot" ->
      """SELECT user_id,
                count(*) FILTER (event_type = 'click') AS click,
                count(*) FILTER (event_type = 'error') AS error,
                count(*) FILTER (event_type = 'purchase') AS purchase,
                count(*) FILTER (event_type = 'signup') AS signup,
                count(*) FILTER (event_type = 'view') AS view
         FROM events GROUP BY user_id ORDER BY user_id""",
    "q37_multimodal_meta" ->
      """SELECT doc_id AS media_id, octet_length(encode(text))::BIGINT AS n_bytes,
                md5(text) AS content_md5, 'text/plain' AS format
         FROM documents ORDER BY media_id""",
    "q60_multimodal_features" ->
      """WITH m AS (SELECT doc_id AS media_id,
                           octet_length(encode(text))::BIGINT AS n_bytes,
                           md5(text) AS h
                    FROM documents)
         SELECT media_id, n_bytes, h AS content_md5,
                (instr('0123456789abcdef', substr(h, 2, 1)) * 64)::BIGINT AS width,
                ((((instr('0123456789abcdef', substr(h, 3, 1)) - 1) * 16
                   + instr('0123456789abcdef', substr(h, 4, 1)) - 1) % 9 + 1) * 64)::BIGINT
                  AS height,
                ((n_bytes + 4095) // 4096)::BIGINT AS n_frames
         FROM m ORDER BY media_id""",
    "q38_scalar_funcs" ->
      """SELECT o_orderkey,
                upper(substr(o_orderpriority, 3, 10)) AS prio_word,
                length(o_orderpriority)::BIGINT AS prio_len,
                concat_ws('-', o_orderstatus, o_orderpriority) AS status_prio,
                year(o_orderdate)::BIGINT AS o_year,
                month(o_orderdate)::BIGINT AS o_month,
                CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS due_date,
                datediff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31')::BIGINT AS days_to_eoy,
                round(o_totalprice / 1000.0)::BIGINT AS price_k
         FROM orders ORDER BY o_orderkey""",
    "q39_cleaner_transform" ->
      """WITH stats AS (
           SELECT min(l_quantity) AS mn, max(l_quantity) AS mx, avg(l_quantity) AS mean
           FROM lineitem WHERE l_quantity BETWEEN 5 AND 45)
         SELECT least(greatest(coalesce(l_quantity, mean), mn), mx) AS l_quantity,
                CASE WHEN l_returnflag = 'R' THEN 1
                     WHEN l_returnflag = 'A' THEN 2 ELSE 0 END AS l_returnflag,
                coalesce(l_linestatus = 'F', false) AS l_linestatus_F,
                coalesce(l_linestatus = 'O', false) AS l_linestatus_O
         FROM lineitem, stats
         ORDER BY 1, 2, 3, 4 LIMIT 1000""",
    "q75_cleaner_scaled" ->
      """WITH st AS (
           SELECT avg(l_quantity) AS m,
                  sqrt(greatest(0.0,
                    (sum(l_quantity * l_quantity)
                      - sum(l_quantity) * sum(l_quantity) / count(l_quantity))
                    / count(l_quantity))) AS s,
                  min(l_quantity) AS qlo, max(l_quantity) AS qhi,
                  min(l_linenumber) AS nlo, max(l_linenumber) AS nhi
           FROM lineitem)
         SELECT (least(greatest(l_quantity, qlo), qhi) - m) / s AS l_quantity,
                (least(greatest(l_linenumber::DOUBLE, nlo::DOUBLE), nhi::DOUBLE)
                  - nlo::DOUBLE) / (nhi::DOUBLE - nlo::DOUBLE) AS l_linenumber
         FROM lineitem, st
         ORDER BY 1, 2 LIMIT 1000""",
    "q89_cleaner_binned" ->
      """WITH x AS (SELECT CAST(l_quantity AS DOUBLE) AS v FROM lineitem
                    WHERE l_quantity IS NOT NULL),
         vc AS (SELECT v, count(*) AS n FROM x GROUP BY 1),
         c AS (SELECT v, n, sum(n) OVER (ORDER BY v) AS cum,
                      sum(n) OVER () AS total
               FROM vc),
         b AS (SELECT j.j, c.v FROM c, range(1, 8) j(j)
               WHERE cum >= (j.j * total + 7) // 8
                 AND cum - n < (j.j * total + 7) // 8),
         binned AS (SELECT CASE WHEN l_quantity IS NULL THEN -1
                                ELSE (SELECT count(*) FROM b
                                      WHERE CAST(l_quantity AS DOUBLE) > b.v)
                           END AS bin
                    FROM lineitem)
         SELECT CAST(bin AS INTEGER) AS bin, count(*) AS n
         FROM binned GROUP BY 1 ORDER BY 1""",
    "q40_sliding_window" ->
      """SELECT epoch_us(w) AS window_start_us, count(*) AS n_events FROM (
           SELECT unnest([date_trunc('hour', CAST(ts AS TIMESTAMP)) - INTERVAL 1 HOUR,
                          date_trunc('hour', CAST(ts AS TIMESTAMP))]) AS w
           FROM events) t GROUP BY w ORDER BY window_start_us""",
    "q41_approx_stats" ->
      """SELECT l_returnflag, count(*) AS n, count(DISTINCT l_orderkey) AS n_orders_exact,
                TRUE AS approx_distinct_ok, TRUE AS approx_median_ok
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q43_dedup_groups" -> sqlCcClosure,
    // same ground truth ON PURPOSE: q109 computes the labeling
    // incrementally (prior corpus labels + delta pairs), so checking it
    // against the full-pair recursive closure IS the equivalence claim
    "q109_incremental_cc" -> sqlCcClosure,
    "q74_decontamination_spans" ->
      """WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
         e AS (SELECT doc_id, u.p AS p,
                      list_sum([ (instr('0123456789abcdef', substr(md5(u.s), kk, 1)) - 1)
                                 * pow(16, 15 - kk)::BIGINT for kk in range(1, 16)]) AS h
               FROM (SELECT doc_id, unnest([{'p': i, 's': array_to_string(w[i:i+9], ' ')}
                                            for i in range(1, len(w) - 8)]) AS u
                     FROM w) t),
         hs AS (SELECT doc_id,
                       (list_sum([ (instr('0123456789abcdef', substr(md5(doc_id::VARCHAR), kk, 1)) - 1)
                                   * pow(16, 15 - kk)::BIGINT for kk in range(1, 16)])::BIGINT % 5)
                         AS shard
                FROM documents),
         et AS (SELECT e.* FROM e JOIN hs ON e.doc_id = hs.doc_id WHERE hs.shard != 0),
         ee AS (SELECT e.* FROM e JOIN hs ON e.doc_id = hs.doc_id WHERE hs.shard = 0),
         m AS (SELECT a.doc_id AS train_id, b.doc_id AS eval_id, a.p AS pa, b.p AS pb
               FROM et a JOIN ee b ON a.h = b.h AND a.doc_id <> b.doc_id),
         r AS (SELECT train_id, eval_id, pa - pb AS d, pa,
                      pa - row_number() OVER (PARTITION BY train_id, eval_id, pa - pb
                                              ORDER BY pa) AS grp
               FROM m),
         runs AS (SELECT train_id, eval_id, count(*) AS rw
                  FROM r GROUP BY train_id, eval_id, d, grp)
         SELECT train_id, eval_id, (max(rw) + 9)::BIGINT AS longest_run_tokens
         FROM runs GROUP BY train_id, eval_id
         HAVING max(rw) + 9 >= 20 ORDER BY train_id, eval_id""",
    "q73_substring_spans" ->
      """WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
         e AS (SELECT doc_id, u.p AS p,
                      list_sum([ (instr('0123456789abcdef', substr(md5(u.s), kk, 1)) - 1)
                                 * pow(16, 15 - kk)::BIGINT for kk in range(1, 16)]) AS h
               FROM (SELECT doc_id, unnest([{'p': i, 's': array_to_string(w[i:i+9], ' ')}
                                            for i in range(1, len(w) - 8)]) AS u
                     FROM w) t),
         m AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.p AS pa, b.p AS pb
               FROM e a JOIN e b ON a.h = b.h AND a.doc_id < b.doc_id),
         r AS (SELECT id_a, id_b, pa - pb AS d, pa,
                      pa - row_number() OVER (PARTITION BY id_a, id_b, pa - pb
                                              ORDER BY pa) AS grp
               FROM m),
         runs AS (SELECT id_a, id_b, count(*) AS rw FROM r GROUP BY id_a, id_b, d, grp)
         SELECT id_a, id_b, (max(rw) + 9)::BIGINT AS longest_run_tokens
         FROM runs GROUP BY id_a, id_b
         HAVING max(rw) + 9 >= 30 ORDER BY id_a, id_b""",
    "q72_delta_dedup" ->
      """WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
         s AS (SELECT doc_id,
                      list_sort(list_distinct([
                        list_sum([ (instr('0123456789abcdef', substr(md5(x), k, 1)) - 1)
                                   * pow(16, 15 - k)::BIGINT for k in range(1, 16)])
                        for x in list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                                for i in range(1, len(w) - 1)])])) AS sh
               FROM w),
         s2 AS (SELECT doc_id, sh, len(sh) AS nsh FROM s WHERE len(sh) > 0),
         hs AS (SELECT doc_id,
                       (list_sum([ (instr('0123456789abcdef', substr(md5(doc_id::VARCHAR), k, 1)) - 1)
                                   * pow(16, 15 - k)::BIGINT for k in range(1, 16)])::BIGINT % 5)
                         AS shard
                FROM documents),
         ws AS (SELECT doc_id, unnest(sh)::VARCHAR AS x FROM s2),
         ww AS (SELECT doc_id,
                       list_sum([ (instr('0123456789abcdef', substr(md5(x), k, 1)) - 1)
                                  * pow(16, 8 - k)::BIGINT for k in range(1, 9)]) AS w0,
                       list_sum([ (instr('0123456789abcdef', substr(md5(x), k + 8, 1)) - 1)
                                  * pow(16, 8 - k)::BIGINT for k in range(1, 9)]) AS w1
                FROM ws),
         sigl AS (SELECT doc_id, i, min((w0 + i * w1) % 2147483647) AS mh
                  FROM ww, range(0, 12) r(i) GROUP BY doc_id, i),
         bands AS (SELECT doc_id, i // 3 AS bi,
                          md5(string_agg(mh::VARCHAR, '|' ORDER BY i)) AS bk
                   FROM sigl GROUP BY doc_id, i // 3),
         bd AS (SELECT b.doc_id, b.bi, b.bk FROM bands b JOIN hs ON b.doc_id = hs.doc_id
                WHERE hs.shard = 0),
         bc AS (SELECT b.doc_id, b.bi, b.bk FROM bands b JOIN hs ON b.doc_id = hs.doc_id
                WHERE hs.shard != 0),
         cand AS (SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
                  FROM bd a JOIN bc b ON a.bi = b.bi AND a.bk = b.bk AND a.doc_id <> b.doc_id)
         SELECT id_a, id_b, jaccard FROM (
           SELECT c.ia AS id_a, c.ib AS id_b,
                  len(list_intersect(x.sh, y.sh))::DOUBLE
                    / (x.nsh + y.nsh - len(list_intersect(x.sh, y.sh))) AS jaccard
           FROM cand c JOIN s2 x ON x.doc_id = c.ia JOIN s2 y ON y.doc_id = c.ib) t
         WHERE jaccard >= 0.8 ORDER BY id_a, id_b""",
    "q71_boilerplate_lines" ->
      """WITH f AS (SELECT doc_id,
             text || chr(10) || 'Subscribe to our newsletter today'
                  || chr(10) || 'unique note ' || doc_id::VARCHAR
                  || (CASE WHEN doc_id % 2 = 0
                           THEN chr(10) || 'Copyright 2024 Example Corp'
                           ELSE '' END) AS t
           FROM documents),
         bl AS (SELECT DISTINCT doc_id, trim(l) AS tl
                FROM (SELECT doc_id, unnest(string_split(t, chr(10))) AS l FROM f)
                WHERE trim(l) <> ''),
         bf AS (SELECT tl FROM bl GROUP BY tl HAVING count(*) >= 2),
         bls AS (SELECT coalesce(list(tl), []) AS ls FROM bf),
         clean AS (SELECT doc_id,
             array_to_string(list_filter([trim(x) for x in string_split(t, chr(10))],
               x -> x <> '' AND NOT list_contains(ls, x)), chr(10)) AS ct,
             len(list_filter([trim(x) for x in string_split(t, chr(10))],
               x -> x <> '' AND NOT list_contains(ls, x)))::BIGINT AS n_lines_kept
           FROM f, bls)
         SELECT doc_id, n_lines_kept, md5(ct) AS clean_md5,
                length(ct)::BIGINT AS n_chars_clean
         FROM clean ORDER BY doc_id""",
    "q70_dedup_best_rep" ->
      """WITH RECURSIVE
         w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
         s AS (SELECT doc_id,
                      list_sort(list_distinct([
                        list_sum([ (instr('0123456789abcdef', substr(md5(x), k, 1)) - 1)
                                   * pow(16, 15 - k)::BIGINT for k in range(1, 16)])
                        for x in list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                                for i in range(1, len(w) - 1)])])) AS sh
               FROM w),
         s2 AS (SELECT doc_id, sh, len(sh) AS nsh FROM s WHERE len(sh) > 0),
         ws AS (SELECT doc_id, unnest(sh)::VARCHAR AS x FROM s2),
         ww AS (SELECT doc_id,
                       list_sum([ (instr('0123456789abcdef', substr(md5(x), k, 1)) - 1)
                                  * pow(16, 8 - k)::BIGINT for k in range(1, 9)]) AS w0,
                       list_sum([ (instr('0123456789abcdef', substr(md5(x), k + 8, 1)) - 1)
                                  * pow(16, 8 - k)::BIGINT for k in range(1, 9)]) AS w1
                FROM ws),
         sigl AS (SELECT doc_id, i, min((w0 + i * w1) % 2147483647) AS mh
                  FROM ww, range(0, 12) r(i) GROUP BY doc_id, i),
         bands AS (SELECT doc_id, i // 3 AS bi,
                          md5(string_agg(mh::VARCHAR, '|' ORDER BY i)) AS bk
                   FROM sigl GROUP BY doc_id, i // 3),
         cand AS (SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
                  FROM bands a JOIN bands b ON a.bi = b.bi AND a.bk = b.bk AND a.doc_id < b.doc_id),
         pairs AS (SELECT id_a, id_b FROM (
           SELECT c.ia AS id_a, c.ib AS id_b,
                  len(list_intersect(x.sh, y.sh))::DOUBLE
                    / (x.nsh + y.nsh - len(list_intersect(x.sh, y.sh))) AS jaccard
           FROM cand c JOIN s2 x ON x.doc_id = c.ia JOIN s2 y ON y.doc_id = c.ib) t
           WHERE jaccard >= 0.8),
         edges AS (SELECT id_a AS a, id_b AS b FROM pairs
                   UNION SELECT id_b, id_a FROM pairs),
         reach(a, b) AS (SELECT a, b FROM edges
                         UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         comp AS (SELECT a AS doc_id, least(a, min(b)) AS component FROM reach GROUP BY a),
         lt AS (SELECT doc_id, text, string_split_regex(trim(lower(text)), '\s+') AS lt
                FROM documents),
         qual AS (SELECT doc_id,
                    CASE WHEN text IS NULL THEN NULL
                         WHEN length(trim(text)) > 0 THEN
                           0.3 * least(len(lt)::DOUBLE / 100.0, 1.0)
                           + 0.4 * least(5.0 * (len(list_filter(lt,
                               x -> list_contains(['the','a','of','and','to','in','is','it'], x)))::DOUBLE
                               / len(lt)::DOUBLE), 1.0)
                           + 0.3 * (length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g'))::DOUBLE
                                    / length(text)::DOUBLE)
                         ELSE 0.0 END AS quality
                  FROM lt),
         lab AS (SELECT d.doc_id, d.lang, d.source,
                        coalesce(c.component, d.doc_id) AS component
                 FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id),
         ranked AS (SELECT l.doc_id, l.lang, l.source, q.quality,
                           row_number() OVER (PARTITION BY l.component
                             ORDER BY q.quality DESC, l.doc_id) AS rk
                    FROM lab l JOIN qual q ON q.doc_id = l.doc_id)
         SELECT doc_id, lang, source,
                CAST(round(quality * 1000000) AS BIGINT) AS quality_micro
         FROM ranked WHERE rk = 1 ORDER BY doc_id""",
    "q44_tfidf" ->
      """WITH toks AS (
           SELECT doc_id,
                  unnest(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), '\s+')) AS term
           FROM documents),
         tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
         dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
         scored AS (SELECT doc_id, term, tf * ln(n_docs::DOUBLE / df) AS tfidf
                    FROM tf JOIN dfreq USING (term), n),
         r AS (SELECT doc_id, term,
                      row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank
               FROM scored)
         SELECT doc_id, term, rank FROM r
         WHERE rank <= 3 AND doc_id < 50 ORDER BY doc_id, rank""",
    "q49_curation_pipeline" ->
      """WITH RECURSIVE
         w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
         s AS (SELECT doc_id,
                      list_sort(list_distinct([
                        list_sum([ (instr('0123456789abcdef', substr(md5(x), k, 1)) - 1)
                                   * pow(16, 15 - k)::BIGINT for k in range(1, 16)])
                        for x in list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                                for i in range(1, len(w) - 1)])])) AS sh
               FROM w),
         s2 AS (SELECT doc_id, sh, len(sh) AS nsh FROM s WHERE len(sh) > 0),
         ws AS (SELECT doc_id, unnest(sh)::VARCHAR AS x FROM s2),
         ww AS (SELECT doc_id,
                       list_sum([ (instr('0123456789abcdef', substr(md5(x), k, 1)) - 1)
                                  * pow(16, 8 - k)::BIGINT for k in range(1, 9)]) AS w0,
                       list_sum([ (instr('0123456789abcdef', substr(md5(x), k + 8, 1)) - 1)
                                  * pow(16, 8 - k)::BIGINT for k in range(1, 9)]) AS w1
                FROM ws),
         sigl AS (SELECT doc_id, i, min((w0 + i * w1) % 2147483647) AS mh
                  FROM ww, range(0, 12) r(i) GROUP BY doc_id, i),
         bands AS (SELECT doc_id, i // 3 AS bi,
                          md5(string_agg(mh::VARCHAR, '|' ORDER BY i)) AS bk
                   FROM sigl GROUP BY doc_id, i // 3),
         cand AS (SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
                  FROM bands a JOIN bands b ON a.bi = b.bi AND a.bk = b.bk AND a.doc_id < b.doc_id),
         pairs AS (SELECT id_a, id_b FROM (
           SELECT c.ia AS id_a, c.ib AS id_b,
                  len(list_intersect(x.sh, y.sh))::DOUBLE
                    / (x.nsh + y.nsh - len(list_intersect(x.sh, y.sh))) AS jaccard
           FROM cand c JOIN s2 x ON x.doc_id = c.ia JOIN s2 y ON y.doc_id = c.ib) t
           WHERE jaccard >= 0.8),
         edges AS (SELECT id_a AS a, id_b AS b FROM pairs
                   UNION SELECT id_b, id_a FROM pairs),
         reach(a, b) AS (SELECT a, b FROM edges
                         UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         folded AS (SELECT a AS doc_id FROM reach GROUP BY a HAVING min(b) < a),
         kept AS (SELECT d.* FROM documents d
                  WHERE NOT EXISTS (SELECT 1 FROM folded f WHERE f.doc_id = d.doc_id)),
         lt AS (SELECT doc_id, source, text,
                       string_split_regex(trim(lower(text)), '\s+') AS lt
                FROM kept),
         sc AS (SELECT doc_id, source, text,
                  len(list_filter(lt, x -> list_contains(['the','a','of','and','to','in','is','it'], x))) AS s_en,
                  len(list_filter(lt, x -> list_contains(['der','die','das','und','ist','ein','zu','den'], x))) AS s_de,
                  len(list_filter(lt, x -> list_contains(['el','la','que','y','en','un','es','los'], x))) AS s_es,
                  len(list_filter(lt, x -> list_contains(['le','la','et','un','une','est','dans','les'], x))) AS s_fr,
                  len(list_filter(lt, x -> list_contains(['的','是','在','了','我','有','和','不'], x))) AS s_zh,
                  len(lt) AS ntok
                FROM lt),
         gated AS (
           SELECT doc_id, source, text, ntok FROM sc
           WHERE (CASE WHEN text IS NULL THEN NULL
                       WHEN length(trim(text)) > 0 THEN
                         0.3 * least(ntok::DOUBLE / 100.0, 1.0)
                         + 0.4 * least(5.0 * (s_en::DOUBLE / ntok::DOUBLE), 1.0)
                         + 0.3 * (length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g'))::DOUBLE / length(text)::DOUBLE)
                       ELSE 0.0 END) >= 0.5
             AND (CASE WHEN s_en = greatest(s_en, s_de, s_es, s_fr, s_zh) AND s_en > 0 THEN 'en'
                       WHEN s_de = greatest(s_en, s_de, s_es, s_fr, s_zh) AND s_de > 0 THEN 'de'
                       WHEN s_es = greatest(s_en, s_de, s_es, s_fr, s_zh) AND s_es > 0 THEN 'es'
                       WHEN s_fr = greatest(s_en, s_de, s_es, s_fr, s_zh) AND s_fr > 0 THEN 'fr'
                       WHEN s_zh = greatest(s_en, s_de, s_es, s_fr, s_zh) AND s_zh > 0 THEN 'zh'
                       ELSE 'und' END) = 'en')
         SELECT source, count(*) AS n_docs,
                CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS n_tokens
         FROM gated GROUP BY source ORDER BY source""",
    "q48_sql_interface" ->
      """SELECT n_name, c_name, revenue_cents FROM (
           SELECT n.n_name, c.c_name,
                  CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
                  row_number() OVER (PARTITION BY n.n_name
                    ORDER BY sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) DESC, c.c_name) AS rk
           FROM orders o
           JOIN customer c ON o.o_custkey = c.c_custkey
           JOIN nation n ON c.c_nationkey = n.n_nationkey
           GROUP BY n.n_name, c.c_name) t
         WHERE rk = 1 ORDER BY n_name""",
    "q46_shipping_priority" ->
      """SELECT o_orderkey, o_orderdate,
                CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
         FROM orders
         JOIN customer ON o_custkey = c_custkey AND c_mktsegment = 'BUILDING'
         JOIN lineitem ON l_orderkey = o_orderkey
         WHERE o_orderdate < TIMESTAMP '1996-01-01'
         GROUP BY o_orderkey, o_orderdate
         ORDER BY revenue_cents DESC, o_orderkey LIMIT 10""",
    "q47_local_supplier_volume" ->
      """SELECT r_name, n_name,
                CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
                count(*) AS n_items
         FROM lineitem
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name
         ORDER BY r_name, n_name""",
    "q45_funnel" ->
      """WITH pu AS (
           SELECT user_id,
                  min(CAST(ts AS TIMESTAMP)) FILTER (event_type = 'signup') AS s,
                  min(CAST(ts AS TIMESTAMP)) FILTER (event_type = 'click') AS c,
                  min(CAST(ts AS TIMESTAMP)) FILTER (event_type = 'purchase') AS p
           FROM events GROUP BY user_id)
         SELECT count(*) AS n_users, count(s) AS n_signed,
                count(CASE WHEN c > s THEN 1 END) AS n_click_after_signup,
                count(CASE WHEN p > s THEN 1 END) AS n_purchase_after_signup
         FROM pu""",
    "q76_corr_exact" ->
      """WITH a AS (
           SELECT l_returnflag,
                  sum(l_quantity) AS sx, sum(l_linenumber::DOUBLE) AS sy,
                  sum(l_quantity * l_linenumber::DOUBLE) AS sxy,
                  sum(l_quantity * l_quantity) AS sx2,
                  sum(l_linenumber::DOUBLE * l_linenumber::DOUBLE) AS sy2,
                  count(*)::DOUBLE AS n
           FROM lineitem GROUP BY l_returnflag)
         SELECT l_returnflag,
                CASE WHEN n >= 2 AND n * sx2 - sx * sx > 0 AND n * sy2 - sy * sy > 0
                     THEN (n * sxy - sx * sy)
                          / (sqrt(n * sx2 - sx * sx) * sqrt(n * sy2 - sy * sy))
                END AS corr_qty_line
         FROM a ORDER BY l_returnflag""",
    "q87_percentile_disc" ->
      """WITH x AS (SELECT l_returnflag, CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
                    FROM lineitem WHERE l_extendedprice IS NOT NULL),
         r AS (SELECT l_returnflag, cents,
                      row_number() OVER (PARTITION BY l_returnflag ORDER BY cents) AS rn,
                      count(*) OVER (PARTITION BY l_returnflag) AS cnt
               FROM x)
         SELECT l_returnflag, cents AS p95_cents FROM r
         WHERE rn = greatest(1, CAST(ceil(0.95 * cnt) AS BIGINT))
         ORDER BY l_returnflag""",
    "q88_mode" ->
      """WITH c AS (SELECT l_returnflag, l_quantity AS v, count(*) AS n
                    FROM lineitem WHERE l_quantity IS NOT NULL GROUP BY 1, 2),
         r AS (SELECT l_returnflag, v,
                      row_number() OVER (PARTITION BY l_returnflag
                                         ORDER BY n DESC, v) AS rk
               FROM c)
         SELECT l_returnflag, v AS mode_qty FROM r WHERE rk = 1
         ORDER BY l_returnflag""",
    "q42_label_centroids" ->
      """SELECT label, i - 1 AS dim,
                CAST(sum(round(embedding[i]::DOUBLE * 1000)::BIGINT) AS DOUBLE) / count(*) AS centroid_milli
         FROM embeddings, range(1, 65) r(i)
         GROUP BY label, i ORDER BY label, dim""",
    // sequence(1, max(1, n-63), 32) in Spark = generate_series(1, greatest(1,
    // len-63), 32) in DuckDB (both inclusive-stop stepped ranges); the
    // end-aligned tail start (stop itself) is UNIONed in on both engines;
    // chunk_idx = rank of the start within the doc; slice and list_slice
    // both clamp at the array end
    "q90_chunk_sliding" ->
      """WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w,
                           greatest(1, len(string_split_regex(trim(text), '\s+')) - 63) AS stop
                    FROM documents WHERE length(trim(text)) > 0),
         st AS (SELECT DISTINCT doc_id, cs FROM (
                  SELECT doc_id, unnest(generate_series(1, stop, 32)) AS cs FROM w
                  UNION ALL SELECT doc_id, stop AS cs FROM w)),
         c AS (SELECT st.doc_id,
                      CAST(row_number() OVER (PARTITION BY st.doc_id ORDER BY cs) - 1 AS BIGINT) AS chunk_idx,
                      CAST(cs AS BIGINT) AS chunk_start,
                      list_slice(w.w, cs, cs + 63) AS chunk
               FROM st JOIN w USING (doc_id))
         SELECT doc_id, chunk_idx, chunk_start, CAST(len(chunk) AS BIGINT) AS n_tok,
                md5(array_to_string(chunk, ' ')) AS chunk_hash
         FROM c ORDER BY doc_id, chunk_idx""",
    // add-one-smoothed unigram LM fit on the corpus itself; the ln values
    // are quantized to micro-nat BIGINTs BEFORE any sum (order-independent)
    "q91_unigram_surprisal" ->
      """WITH toks AS (SELECT doc_id,
                unnest(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), '\s+')) AS token
              FROM documents),
         counts AS (SELECT token, count(*) AS c FROM toks GROUP BY token),
         tot AS (SELECT CAST(sum(c) AS BIGINT) AS T, count(*) AS V FROM counts),
         per AS (SELECT doc_id, CAST(round(ln(c + 1) * 1000000) AS BIGINT) AS s_micro
                 FROM toks JOIN counts USING (token)),
         agg AS (SELECT doc_id, count(*) AS n_tok, CAST(sum(s_micro) AS BIGINT) AS sum_c_micro
                 FROM per GROUP BY doc_id)
         SELECT doc_id, n_tok,
                n_tok * CAST(round(ln(T + V) * 1000000) AS BIGINT) - sum_c_micro AS surprisal_micro
         FROM agg, tot ORDER BY doc_id""",
    // BM25: the idf/tf expression is written with EXACTLY the Spark tree's
    // association (left-to-right * and /) so the one rounded double per
    // (doc, term) is bit-identical; per-doc sums are then exact BIGINTs
    "q92_bm25" -> sqlBm25TopK20,
    // the stored index answers bit-identically to the from-scratch path
    // (postings/dfs/lengths/scalars are exact stored aggregates), so the
    // oracle IS q92's chain — the q120 pattern for the lexical index
    "q123_bm25_indexed" -> sqlBm25TopK20,
    // extend folds EXACT integer statistics, so incremental ≡ full REBUILD
    // bit-for-bit and the full-corpus chain is again the oracle — a
    // stronger gate than the approximate indexes' same-bucket-space one
    "q124_bm25_ingest" -> sqlBm25TopK20,
    // hybrid through standing indexes: the q120 vector chain (pq, queries
    // 0/1 kept) RRF-fused with q108's lexical chain (bm25 CTEs prefixed
    // b*/qt to avoid colliding with the vector chain's names); the fusion
    // arithmetic is q108's exact integer tail
    "q126_hybrid_indexed" ->
      s"""WITH $sqlVecs, $sqlIvfChain,
         ${sqlPqSubVecs("v", "q")},
         ${sqlPqTrainChain("embeddings")},
         $sqlIvfPqFlatSearch,
         $sqlAdcTail,
         qt AS (SELECT CAST(qid AS BIGINT) AS query_id, token
                FROM (VALUES (0, 'spark'), (0, 'join'),
                             (1, 'window'), (1, 'merge'), (1, 'sort')) AS t(qid, token)),
         btoks AS (SELECT doc_id,
                unnest(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), '\\s+')) AS token
              FROM documents),
         bdl AS (SELECT doc_id, count(*) AS dl FROM btoks GROUP BY doc_id),
         bcorpus AS (SELECT count(*) AS N, CAST(sum(dl) AS BIGINT) AS TT FROM bdl),
         btf AS (SELECT doc_id, token, count(*) AS tf FROM btoks
                WHERE token IN (SELECT token FROM qt) GROUP BY doc_id, token),
         bdfreq AS (SELECT token, count(*) AS df FROM btf GROUP BY token),
         bcontrib AS (SELECT btf.doc_id, btf.token,
                            CAST(round(ln(1.0 + (N - df + 0.5) / (df + 0.5)) * tf * 2.2
                                 / (tf + 1.2 * (0.25 + 0.75 * dl / (TT::DOUBLE / N))) * 1000000) AS BIGINT) AS c_micro
                     FROM btf JOIN bdfreq USING (token) JOIN bdl USING (doc_id), bcorpus),
         bsel AS (SELECT qt.query_id, c.doc_id, CAST(sum(c.c_micro) AS BIGINT) AS score_micro
                 FROM bcontrib c JOIN qt USING (token) GROUP BY 1, 2),
         bm AS (SELECT query_id, doc_id, rank FROM (
                  SELECT query_id, doc_id,
                         row_number() OVER (PARTITION BY query_id
                                            ORDER BY score_micro DESC, doc_id) AS rank
                  FROM bsel) t WHERE rank <= 10),
         ann AS (SELECT query_id, nbr_id AS doc_id, rank FROM pq
                 WHERE query_id IN (0, 1)),
         allc AS (SELECT query_id, doc_id, 1000000000 // (60 + rank) AS rrf_nano FROM bm
                  UNION ALL
                  SELECT query_id, doc_id, 1000000000 // (60 + rank) FROM ann),
         fused AS (SELECT query_id, doc_id, count(*) AS n_lists,
                          CAST(sum(rrf_nano) AS BIGINT) AS rrf_nano
                   FROM allc GROUP BY 1, 2)
         SELECT query_id, doc_id, n_lists, rrf_nano,
                CAST(row_number() OVER (PARTITION BY query_id
                                        ORDER BY rrf_nano DESC, doc_id) AS BIGINT) AS rank
         FROM fused QUALIFY rank <= 10 ORDER BY query_id, rank""",
    // filtered ANN: the q120 chain with candidates gated to label < 8
    // (the allowed-id semi-join replayed as an IN subquery)
    "q125_ann_filtered" ->
      s"""WITH $sqlVecs, $sqlIvfChain,
         ${sqlPqSubVecs("v", "q")},
         ${sqlPqTrainChain("embeddings")},
         ${sqlIvfPqFlatSearchWhere(
           "WHERE a.vec_id IN (SELECT vec_id FROM embeddings WHERE label < 8)")},
         $sqlAdcTail
         SELECT query_id, nbr_id, cosine_micro, rank FROM pq
         ORDER BY query_id, rank""",
    // the unrolled training loop's 8 argmax rows, in merge order
    "q127_bpe_train" ->
      s"""WITH ${sqlBpeChain(8)}
         SELECT * FROM (
           ${(1 to 8).map(i =>
             s"SELECT CAST($i AS INTEGER) AS rank, a AS sym_a, b AS sym_b, pc AS pair_count FROM bb$i")
             .mkString("\n           UNION ALL ")})
         ORDER BY rank""",
    // top-20 subword pieces read from the training loop's FINAL state w8 —
    // the Spark side re-encodes from scratch (fresh fold chain per word),
    // so agreement proves encode ≡ training segmentation
    "q128_bpe_encode" ->
      s"""WITH ${sqlBpeChain(8)}
         SELECT piece, CAST(sum(cnt) AS BIGINT) AS total FROM (
           SELECT unnest(string_split(syms, ' ')) AS piece, cnt FROM w8) t
         GROUP BY piece ORDER BY total DESC, piece LIMIT 20""",
    // per-doc budgets from the training chain's final state: the
    // (doc, word) rows join w8's piece counts, summed per doc
    "q130_bpe_doc_tokens" ->
      s"""WITH ${sqlBpeChain(8)},
         bdt AS (SELECT doc_id, token AS word FROM (
                SELECT doc_id, unnest(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), '\\s+')) AS token
                FROM documents) t WHERE len(token) > 0),
         bwp AS (SELECT word, len(string_split(syms, ' ')) AS n_p FROM w8)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                CAST(sum(n_p) AS BIGINT) AS n_pieces
         FROM bdt JOIN bwp USING (word) GROUP BY doc_id
         ORDER BY n_pieces DESC, doc_id LIMIT 20""",
    // bloom pruning is invisible in the result (no false negatives;
    // false positives die in the join) — the oracle is the plain join
    "q129_bloom_join" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
                CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE o_orderpriority = '1-URGENT'
         GROUP BY 1 ORDER BY 1""",
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
    // the naive all-pairs form the signature join avoids; levenshtein is
    // the classic DP distance in both engines
    "q132_fuzzy_join" ->
      """WITH v AS (SELECT p_name AS name, CAST(count(*) AS BIGINT) AS n_parts
                    FROM part GROUP BY p_name)
         SELECT a.name AS name_a, b.name AS name_b,
                CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist,
                a.n_parts AS n_a, b.n_parts AS n_b
         FROM v a JOIN v b ON a.name < b.name
         WHERE levenshtein(a.name, b.name) <= 2
         ORDER BY name_a, name_b""",
    // same micro-nat quantize-then-sum contract as q91: one rounded ln per
    // (label, token) count and per label scalar, exact BIGINT score sums,
    // argmax via the identical (score DESC, label) window
    "q133_nb_classify" ->
      """WITH train AS (SELECT * FROM documents WHERE doc_id % 5 <> 0 AND lang IS NOT NULL),
         test AS (SELECT * FROM documents WHERE doc_id % 5 = 0),
         ttoks AS (SELECT lang AS label,
                unnest(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), '\s+')) AS token
              FROM train),
         counts AS (SELECT label, token, count(*) AS c FROM ttoks GROUP BY 1, 2),
         perlabel AS (SELECT label, CAST(sum(c) AS BIGINT) AS t_label FROM counts GROUP BY 1),
         vocab AS (SELECT count(DISTINCT token) AS v FROM counts),
         nd AS (SELECT lang AS label, count(*) AS n_docs FROM train GROUP BY 1),
         nt AS (SELECT count(*) AS n_total FROM train),
         stats AS (SELECT nd.label,
                CAST(round(ln(n_docs) * 1000000) AS BIGINT)
                  - CAST(round(ln(n_total) * 1000000) AS BIGINT) AS prior_micro,
                CAST(round(ln(t_label + v) * 1000000) AS BIGINT) AS denom_micro
              FROM nd CROSS JOIN nt JOIN perlabel ON nd.label = perlabel.label CROSS JOIN vocab),
         lik AS (SELECT label, token, CAST(round(ln(c + 1) * 1000000) AS BIGINT) AS lik_micro FROM counts),
         dtoks AS (SELECT doc_id,
                unnest(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), '\s+')) AS token
              FROM test),
         ntok AS (SELECT doc_id, CASE WHEN text IS NULL THEN 0
                ELSE CAST(len(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), '\s+')) AS BIGINT) END AS n_tok
              FROM test),
         overlap AS (SELECT d.doc_id, l.label, CAST(sum(l.lik_micro) AS BIGINT) AS num_micro
              FROM dtoks d JOIN lik l ON d.token = l.token GROUP BY 1, 2),
         scored AS (SELECT t.doc_id, s.label,
                s.prior_micro + COALESCE(o.num_micro, 0) - k.n_tok * s.denom_micro AS score_micro
              FROM test t CROSS JOIN stats s
              JOIN ntok k ON k.doc_id = t.doc_id
              LEFT JOIN overlap o ON o.doc_id = t.doc_id AND o.label = s.label),
         best AS (SELECT doc_id, label, score_micro,
                row_number() OVER (PARTITION BY doc_id ORDER BY score_micro DESC, label) AS rn
              FROM scored)
         SELECT b.doc_id, b.label AS pred_label, b.score_micro, t.lang AS true_lang
         FROM best b JOIN test t USING (doc_id) WHERE rn = 1 ORDER BY doc_id""",
    "q93_pagerank" -> pagerankOracleSql(5),
    "q138_personalized_pagerank" -> pprOracleSql(5),
    "q139_label_propagation" -> lpaOracleSql(3),
    // characters enumerated by position on both engines (substr over
    // 1..len), one rounded ln per scalar, exact BIGINT term sums
    "q140_char_entropy" ->
      """WITH ch AS (SELECT doc_id, substr(text, d, 1) AS ch
              FROM documents, unnest(range(1, len(text) + 1)) AS t(d)
              WHERE text IS NOT NULL AND len(text) > 0),
         pc AS (SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS c FROM ch GROUP BY 1, 2),
         tot AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_chars FROM pc GROUP BY 1),
         st AS (SELECT pc.doc_id, tot.n_chars,
                CAST(sum(c * (CAST(round(ln(n_chars) * 1000000) AS BIGINT)
                              - CAST(round(ln(c) * 1000000) AS BIGINT))) AS BIGINT) AS entropy_micro
              FROM pc JOIN tot USING (doc_id) GROUP BY 1, 2)
         SELECT d.doc_id AS doc_id, COALESCE(st.n_chars, 0) AS n_chars,
                COALESCE(st.entropy_micro, 0) AS entropy_micro
         FROM documents d LEFT JOIN st ON st.doc_id = d.doc_id
         ORDER BY d.doc_id""",
    // the naive correlated-successor form of the bucketed ring join; the
    // same 60-bit md5 expansion as q95, self-hits dropped on both sides
    "q141_negative_sample" ->
      """WITH ring AS (
           SELECT doc_id AS neg_id,
                  list_sum([ (instr('0123456789abcdef', substr(md5(doc_id::VARCHAR), kk, 1)) - 1)
                             * pow(16, 15 - kk)::BIGINT for kk in range(1, 16)])::BIGINT AS pos
           FROM documents),
         probes AS (
           SELECT d.doc_id AS anchor_id, u.j,
                  list_sum([ (instr('0123456789abcdef', substr(md5(d.doc_id::VARCHAR || '|' || u.j::VARCHAR || '|42'), kk, 1)) - 1)
                             * pow(16, 15 - kk)::BIGINT for kk in range(1, 16)])::BIGINT AS t
           FROM documents d, unnest(range(1, 5)) AS u(j)),
         succ AS (
           SELECT p.anchor_id, p.j,
                  COALESCE(
                    (SELECT r.neg_id FROM ring r WHERE r.pos >= p.t ORDER BY r.pos, r.neg_id LIMIT 1),
                    (SELECT r.neg_id FROM ring r ORDER BY r.pos, r.neg_id LIMIT 1)) AS neg_id
           FROM probes p)
         SELECT anchor_id, CAST(j AS BIGINT) AS j, neg_id
         FROM succ WHERE neg_id <> anchor_id
         ORDER BY anchor_id, j""",
    // same rational admission test; the boundary row crossing the target
    // is included, at least one row survives per group
    "q142_top_mass" ->
      """WITH d AS (SELECT source, doc_id, n_chars,
                CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS w
              FROM documents WHERE text IS NOT NULL AND n_chars IS NOT NULL),
         t AS (SELECT source, CAST(sum(w) AS BIGINT) AS tot FROM d GROUP BY 1),
         c AS (SELECT d.source, d.doc_id, d.n_chars, d.w, t.tot,
                sum(w) OVER (PARTITION BY d.source ORDER BY n_chars DESC, doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
              FROM d JOIN t USING (source))
         SELECT source, doc_id, n_chars, w FROM c
         WHERE (cum - w) * 5 < tot * 3
         ORDER BY source, doc_id""",
    // the identical sum tree and division order as linregExact: slope first,
    // then intercept FROM the slope — exact integral sums make both engines'
    // doubles bit-equal (q76 contract)
    "q143_linreg_exact" ->
      """WITH x AS (SELECT l_returnflag, l_quantity AS x,
                CAST(round(l_extendedprice * 100) AS BIGINT)::DOUBLE AS y
              FROM lineitem),
         a AS (SELECT l_returnflag,
                sum(CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN x END) AS sx,
                sum(CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN y END) AS sy,
                sum(CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN x * y END) AS sxy,
                sum(CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN x * x END) AS sx2,
                count(CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN 1 END)::DOUBLE AS n
              FROM x GROUP BY l_returnflag),
         sl AS (SELECT l_returnflag, sx, sy, n,
                CASE WHEN n >= 2 AND n * sx2 - sx * sx > 0
                     THEN (n * sxy - sx * sy) / (n * sx2 - sx * sx) END AS slope_cents
              FROM a)
         SELECT l_returnflag, slope_cents,
                CASE WHEN slope_cents IS NOT NULL
                     THEN (sy - slope_cents * sx) / n END AS intercept_cents
         FROM sl ORDER BY l_returnflag""",
    // the full-scan rebuild the shard fold must reproduce: every state
    // component is an exact long aggregate, mean derived sum/n at read time
    "q144_agg_state_fold" ->
      """SELECT source,
                CAST(count(*) AS BIGINT) AS n_rows,
                CAST(count(n_chars) AS BIGINT) AS n_chars_n,
                CAST(sum(n_chars) AS BIGINT) AS n_chars_sum,
                min(n_chars) AS n_chars_min,
                max(n_chars) AS n_chars_max,
                CASE WHEN count(n_chars) > 0
                     THEN CAST(sum(n_chars) AS BIGINT)::DOUBLE
                          / CAST(count(n_chars) AS BIGINT)::DOUBLE END AS n_chars_mean
         FROM documents GROUP BY source ORDER BY source""",
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
    // marginals re-aggregated FROM the joint, the identical rounded-ln term
    // tree per cell (q94's quantize-then-sum contract)
    "q147_mutual_info" ->
      """WITH j AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS cab
              FROM documents WHERE lang IS NOT NULL AND source IS NOT NULL
              GROUP BY 1, 2),
         a AS (SELECT lang, CAST(sum(cab) AS BIGINT) AS ca FROM j GROUP BY 1),
         b AS (SELECT source, CAST(sum(cab) AS BIGINT) AS cb FROM j GROUP BY 1),
         t AS (SELECT CAST(sum(cab) AS BIGINT) AS n FROM j)
         SELECT n AS n_pairs,
                CAST(sum(CAST(round((ln(cab) - ln(ca) - ln(cb) + ln(n))
                                    * cab * 1000000) AS BIGINT)) AS BIGINT) AS mi_micro
         FROM j JOIN a USING (lang) JOIN b USING (source) CROSS JOIN t
         GROUP BY n""",
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
    // identical division tree: v = (Σx² − (Σx)²/n)/(n−1), se² = va/na+vb/nb,
    // t = (ma − mb)/√se² — exact cent sums make the doubles engine-equal
    "q150_welch_ab" ->
      """WITH x AS (SELECT event_type AS g,
                CAST(round(value * 100) AS BIGINT)::DOUBLE AS v FROM events),
         s AS (SELECT
                count(CASE WHEN g = 'click' AND v IS NOT NULL THEN 1 END)::DOUBLE AS na,
                sum(CASE WHEN g = 'click' THEN v END) AS sa,
                sum(CASE WHEN g = 'click' THEN v * v END) AS sa2,
                count(CASE WHEN g = 'view' AND v IS NOT NULL THEN 1 END)::DOUBLE AS nb,
                sum(CASE WHEN g = 'view' THEN v END) AS sb,
                sum(CASE WHEN g = 'view' THEN v * v END) AS sb2
               FROM x)
         SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
                CASE WHEN na >= 1 THEN sa / na END AS mean_a,
                CASE WHEN nb >= 1 THEN sb / nb END AS mean_b,
                CASE WHEN na >= 2 AND nb >= 2
                      AND (sa2 - sa * sa / na) / (na - 1) / na
                        + (sb2 - sb * sb / nb) / (nb - 1) / nb > 0
                     THEN CAST(round((sa / na - sb / nb)
                          / sqrt((sa2 - sa * sa / na) / (na - 1) / na
                               + (sb2 - sb * sb / nb) / (nb - 1) / nb) * 1e6) AS BIGINT)
                END AS t_micro
         FROM s""",
    // the same marginal-cross-product grid with observed-0 cells, the same
    // rounded per-cell term tree, exact long total
    "q151_chi_squared" ->
      """WITH dd AS (SELECT lang, source FROM documents
              WHERE lang IS NOT NULL AND source IS NOT NULL),
         j AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS cab
               FROM dd GROUP BY 1, 2),
         a AS (SELECT lang, CAST(sum(cab) AS BIGINT) AS ca FROM j GROUP BY 1),
         b AS (SELECT source, CAST(sum(cab) AS BIGINT) AS cb FROM j GROUP BY 1),
         t AS (SELECT CAST(sum(cab) AS BIGINT) AS n,
                      CAST(count(DISTINCT lang) AS BIGINT) AS ka,
                      CAST(count(DISTINCT source) AS BIGINT) AS kb FROM j),
         g AS (SELECT a.lang, b.source, a.ca, b.cb, COALESCE(j.cab, 0) AS o
               FROM a CROSS JOIN b
               LEFT JOIN j ON j.lang = a.lang AND j.source = b.source),
         term AS (SELECT n, ka, kb,
                CAST(round((o - ca::DOUBLE * cb::DOUBLE / n::DOUBLE)
                         * (o - ca::DOUBLE * cb::DOUBLE / n::DOUBLE)
                         / (ca::DOUBLE * cb::DOUBLE / n::DOUBLE)
                         * 1000000) AS BIGINT) AS tm
              FROM g CROSS JOIN t)
         SELECT n AS n_pairs, (ka - 1) * (kb - 1) AS dof,
                CAST(sum(tm) AS BIGINT) AS chi2_micro
         FROM term GROUP BY 1, 2""",
    // the same integer bucket, trailing ROWS frame, and z tree
    "q152_anomaly_z" ->
      """WITH c AS (SELECT event_type,
                epoch_us(ts) - epoch_us(ts) % 21600000000 AS bucket_us,
                CAST(count(*) AS BIGINT) AS n_events
              FROM events GROUP BY 1, 2),
         w AS (SELECT event_type, bucket_us, n_events,
                CAST(count(n_events) OVER fr AS DOUBLE) AS k,
                CAST(sum(n_events) OVER fr AS DOUBLE) AS s1,
                CAST(sum(n_events * n_events) OVER fr AS DOUBLE) AS s2
              FROM c
              WINDOW fr AS (PARTITION BY event_type ORDER BY bucket_us
                            ROWS BETWEEN 8 PRECEDING AND 1 PRECEDING))
         SELECT event_type, bucket_us, n_events, CAST(k AS BIGINT) AS base_n,
                CASE WHEN k >= 2 AND (k * s2 - s1 * s1) / (k * (k - 1)) > 0
                     THEN CAST(round((n_events - s1 / k)
                          / sqrt((k * s2 - s1 * s1) / (k * (k - 1))) * 1e6) AS BIGINT)
                END AS z_micro
         FROM w ORDER BY event_type, bucket_us""",
    // same exact rank-sum identity over distinct score levels; the oracle
    // uses the one-level window (result-identical — the stats are exact
    // longs; the Spark side's two-level shape is a scale choice, not a
    // semantics one)
    "q153_roc_auc" ->
      """WITH x AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS s,
                (o_orderstatus = 'F') AS lbl FROM orders
              WHERE o_totalprice IS NOT NULL AND o_orderstatus IS NOT NULL),
         lv AS (SELECT s, count(CASE WHEN lbl THEN 1 END) AS p,
                       count(CASE WHEN NOT lbl THEN 1 END) AS n
                FROM x GROUP BY s),
         w AS (SELECT p, n, COALESCE(sum(n) OVER (ORDER BY s
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
               FROM lv),
         t AS (SELECT CAST(sum(p) AS BIGINT) AS n_pos,
                      CAST(sum(n) AS BIGINT) AS n_neg,
                      CAST(sum(p * (cb * 2 + n)) AS BIGINT) AS auc_num2 FROM w)
         SELECT n_pos, n_neg, auc_num2,
                CASE WHEN n_pos > 0 AND n_neg > 0
                     THEN CAST(round(auc_num2::DOUBLE
                          / (n_pos::DOUBLE * n_neg::DOUBLE * 2) * 1e6) AS BIGINT)
                END AS auc_micro
         FROM t""",
    // the q131 edge CTE + the peel unrolled round-for-round
    "q154_kcore" -> kcoreOracleSql(k = 3, rounds = 4),
    // same integer flag tree; DuckDB median of BIGINT interpolates the two
    // middles, so 2·median casts back to an exact BIGINT
    "q155_robust_outliers" ->
      """WITH x AS (SELECT lang AS g, CAST(n_chars AS BIGINT) AS v
              FROM documents WHERE lang IS NOT NULL AND n_chars IS NOT NULL),
         m AS (SELECT g, CAST(2 * median(v) AS BIGINT) AS med2 FROM x GROUP BY g),
         d AS (SELECT x.g, v, abs(2 * v - med2) AS d2, med2
               FROM x JOIN m ON x.g = m.g),
         md AS (SELECT g, CAST(2 * median(d2) AS BIGINT) AS mad4 FROM d GROUP BY g)
         SELECT d.g AS lang, CAST(count(*) AS BIGINT) AS n_rows,
                max(med2) AS med_x2, max(mad4) AS mad_x4,
                count(CASE WHEN mad4 > 0 AND 20 * d2 > 35 * mad4 THEN 1 END) AS n_outliers
         FROM d JOIN md ON d.g = md.g GROUP BY 1 ORDER BY 1""",
    // same half-open sweep: running max over preceding rows, prefix count
    // of run starts, one collapse per run
    "q156_interval_coverage" ->
      """WITH iv AS (SELECT user_id, epoch_us(ts) AS lo,
                epoch_us(ts) + 1800000000 AS hi FROM events
              WHERE user_id IS NOT NULL AND ts IS NOT NULL),
         f AS (SELECT user_id, lo, hi,
                CASE WHEN max(hi) OVER pre IS NULL OR lo > max(hi) OVER pre
                     THEN 1 ELSE 0 END AS new_run
               FROM iv
               WINDOW pre AS (PARTITION BY user_id ORDER BY lo, hi
                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
         r AS (SELECT user_id, lo, hi, sum(new_run) OVER (
                 PARTITION BY user_id ORDER BY lo, hi
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
               FROM f),
         g AS (SELECT user_id, run, min(lo) AS mlo, max(hi) AS mhi
               FROM r GROUP BY 1, 2)
         SELECT user_id, CAST(count(*) AS BIGINT) AS n_runs,
                CAST(sum(mhi - mlo) AS BIGINT) AS covered,
                CAST(max(mhi) - min(mlo) AS BIGINT) AS span,
                CAST(max(mhi) - min(mlo) - sum(mhi - mlo) AS BIGINT) AS gap
         FROM g GROUP BY 1 ORDER BY 1""",
    // same rank-weighted sum in HUGEINT (the Decimal(38,0) twin), same
    // fixed Gini/share trees
    "q157_concentration" ->
      """WITH pk AS (SELECT o_custkey AS k,
                COALESCE(sum(CAST(round(o_totalprice * 100) AS BIGINT)), 0) AS x
              FROM orders WHERE o_custkey IS NOT NULL GROUP BY 1),
         r AS (SELECT k, x, row_number() OVER (ORDER BY x, k) AS i FROM pk),
         t AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
                      sum(i::HUGEINT * x::HUGEINT) AS six FROM r),
         tc AS (SELECT COALESCE(sum(x), 0) AS top_x
                FROM r, t WHERE i > n - CAST(floor((n + 9) / 10) AS BIGINT))
         SELECT n AS n_keys, sx AS total,
                CASE WHEN n > 0 AND sx > 0
                     THEN CAST(round((six::DOUBLE * 2 - (n + 1)::DOUBLE * sx::DOUBLE)
                          / (n::DOUBLE * sx::DOUBLE) * 1e6) AS BIGINT)
                END AS gini_micro,
                CASE WHEN sx > 0
                     THEN CAST(round(top_x::DOUBLE / sx::DOUBLE * 1e6) AS BIGINT)
                END AS top10_share_micro
         FROM t, tc""",
    // same key-partitioned lead pairing and row-normalization tree
    "q158_transitions" ->
      """WITH e AS (SELECT user_id, event_type, ts, event_id FROM events
              WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
         p AS (SELECT event_type AS from_state, lead(event_type) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id) AS to_state FROM e),
         c AS (SELECT from_state, to_state, CAST(count(*) AS BIGINT) AS n_trans
               FROM p WHERE to_state IS NOT NULL GROUP BY 1, 2),
         t AS (SELECT from_state, CAST(sum(n_trans) AS BIGINT) AS rt
               FROM c GROUP BY 1)
         SELECT c.from_state, to_state, n_trans,
                CAST(round(n_trans::DOUBLE / rt::DOUBLE * 1e6) AS BIGINT) AS p_micro
         FROM c JOIN t ON c.from_state = t.from_state ORDER BY 1, 2""",
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
    // same exact counts and the shared ln tree, micro-quantized
    "q160_woe_iv" ->
      """WITH d AS (SELECT source, (lang = 'en') AS lbl FROM documents
              WHERE source IS NOT NULL AND lang IS NOT NULL),
         lv AS (SELECT source, count(CASE WHEN lbl THEN 1 END) AS pos,
                       count(CASE WHEN NOT lbl THEN 1 END) AS neg
                FROM d GROUP BY 1),
         t AS (SELECT CAST(sum(pos) AS BIGINT) AS tp,
                      CAST(sum(neg) AS BIGINT) AS tn FROM lv)
         SELECT source, CAST(pos AS BIGINT) AS pos, CAST(neg AS BIGINT) AS neg,
                CASE WHEN pos > 0 AND neg > 0
                     THEN CAST(round(ln((pos::DOUBLE / tp::DOUBLE)
                          / (neg::DOUBLE / tn::DOUBLE)) * 1e6) AS BIGINT)
                END AS woe_micro,
                COALESCE(CASE WHEN pos > 0 AND neg > 0
                     THEN CAST(round((pos::DOUBLE / tp::DOUBLE - neg::DOUBLE / tn::DOUBLE)
                          * ln((pos::DOUBLE / tp::DOUBLE) / (neg::DOUBLE / tn::DOUBLE))
                          * 1e6) AS BIGINT) END, 0) AS iv_term_micro
         FROM lv CROSS JOIN t ORDER BY source""",
    // same hold-until-next pairing and Decimal/HUGEINT product sums
    "q161_twap" ->
      """WITH e AS (SELECT user_id,
                CAST(round(value * 100) AS BIGINT) AS cents,
                epoch_us(ts) AS t, event_id FROM events
              WHERE user_id IS NOT NULL AND value IS NOT NULL),
         h AS (SELECT user_id, cents,
                lead(t) OVER (PARTITION BY user_id ORDER BY t, event_id) - t AS dur
               FROM e),
         g AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_holds,
                CAST(sum(dur) AS BIGINT) AS held_us,
                sum(cents::HUGEINT * dur::HUGEINT) AS vd
               FROM h WHERE dur IS NOT NULL GROUP BY 1)
         SELECT user_id, n_holds, held_us,
                CASE WHEN held_us > 0
                     THEN CAST(round(vd::DOUBLE / held_us::DOUBLE * 1e6) AS BIGINT)
                END AS twm_micro
         FROM g ORDER BY user_id""",
    // the oracle recomputes the matrix from ALL events in one pass — the
    // incremental fold must reproduce it exactly
    "q162_transitions_incremental" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS t, event_id
              FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
         p AS (SELECT event_type AS from_state, lead(event_type) OVER (
                 PARTITION BY user_id ORDER BY t, event_id) AS to_state FROM e)
         SELECT from_state, to_state, CAST(count(*) AS BIGINT) AS n_trans
         FROM p WHERE to_state IS NOT NULL GROUP BY 1, 2
         ORDER BY 1, 2""",
    // the same candidate pairs from the naive all-pairs filter, scored by
    // DuckDB's own jaro_winkler_similarity (micro-rounded; the Spark side's
    // exact-rational integer path agrees to the micro digit — verified on
    // 30k random pairs plus this vocabulary)
    "q163_jw_rerank" ->
      """WITH names AS (SELECT p_name AS name FROM part GROUP BY p_name),
         pairs AS (SELECT a.name AS name_a, b.name AS name_b,
                CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
               FROM names a JOIN names b ON a.name < b.name
               WHERE levenshtein(a.name, b.name) <= 2)
         SELECT name_a, name_b, dist,
                CAST(round(jaro_winkler_similarity(name_a, name_b) * 1e6) AS BIGINT) AS jw_micro
         FROM pairs ORDER BY name_a, name_b""",
    // the q171 step-grid machinery with the group as an extra key
    "q181_ks_by_group" ->
      """WITH raw AS (SELECT event_type AS g,
                CAST(round(value * 100) AS BIGINT) AS v, epoch_us(ts) AS t
              FROM events),
         m AS (SELECT min(t) + CAST(floor((max(t) - min(t)) / 2.0) AS BIGINT) AS mid
               FROM raw),
         la AS (SELECT g, v, count(*) AS ca FROM raw, m
                WHERE t < mid AND v IS NOT NULL AND g IS NOT NULL GROUP BY 1, 2),
         lb AS (SELECT g, v, count(*) AS cb FROM raw, m
                WHERE t >= mid AND v IS NOT NULL AND g IS NOT NULL GROUP BY 1, 2),
         gm AS (SELECT COALESCE(la.g, lb.g) AS g, COALESCE(la.v, lb.v) AS v,
                       COALESCE(ca, 0) AS ca, COALESCE(cb, 0) AS cb
                FROM la FULL OUTER JOIN lb ON la.g = lb.g AND la.v = lb.v),
         c AS (SELECT g, v, sum(ca) OVER w AS cuma, sum(cb) OVER w AS cumb FROM gm
               WINDOW w AS (PARTITION BY g ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         t2 AS (SELECT g, CAST(sum(ca) AS BIGINT) AS na,
                       CAST(sum(cb) AS BIGINT) AS nb FROM gm GROUP BY 1),
         dm AS (SELECT c.g, max(abs(nb::HUGEINT * cuma::HUGEINT
                              - na::HUGEINT * cumb::HUGEINT)) AS dmax
                FROM c JOIN t2 ON c.g = t2.g GROUP BY 1)
         SELECT t2.g AS event_type, na AS n_a, nb AS n_b,
                CASE WHEN na > 0 AND nb > 0
                     THEN CAST(round(dmax::DOUBLE / (na::DOUBLE * nb::DOUBLE) * 1e6) AS BIGINT)
                END AS ks_micro
         FROM t2 JOIN dm ON t2.g = dm.g ORDER BY event_type""",
    // the identical md5 hex fold (15 chars → 60-bit long) % width gives the
    // same cells; a one-shot build equals Spark's merged half-sketches by
    // the cell-sum identity, so every estimate hash-compares exactly
    "q182_countmin" ->
      """WITH it AS (SELECT user_id::VARCHAR AS it FROM events
                     WHERE user_id IS NOT NULL),
         cells AS (SELECT r,
                list_sum([ (instr('0123456789abcdef',
                                  substr(md5(r::VARCHAR || ':' || it), k, 1)) - 1)
                           * pow(16, 15 - k)::BIGINT for k in range(1, 16)]) % 256 AS b,
                count(*) AS c
              FROM it, range(0, 4) t(r) GROUP BY 1, 2),
         ex AS (SELECT it, count(*) AS c_exact FROM it GROUP BY 1),
         probes AS (SELECT it, r,
                list_sum([ (instr('0123456789abcdef',
                                  substr(md5(r::VARCHAR || ':' || it), k, 1)) - 1)
                           * pow(16, 15 - k)::BIGINT for k in range(1, 16)]) % 256 AS b
              FROM ex, range(0, 4) t(r)),
         est AS (SELECT it, min(COALESCE(c, 0)) AS c_est
                 FROM probes LEFT JOIN cells USING (r, b) GROUP BY 1)
         SELECT CAST(ex.it AS BIGINT) AS user_id, c_exact, c_est,
                c_est - c_exact AS overcount
         FROM ex JOIN est USING (it) ORDER BY user_id""",
    // one global window stands in for the engine's two-level prefix — same
    // exact integer D_i = |n·S_i − i·S_n|, argmax ties to smallest i
    "q183_change_point" ->
      """WITH raw AS (SELECT event_type AS g, epoch_us(ts) AS o, event_id AS id,
                CAST(round(value * 100) AS BIGINT) AS v
              FROM events
              WHERE event_type IS NOT NULL AND ts IS NOT NULL
                AND value IS NOT NULL AND event_id IS NOT NULL),
         c AS (SELECT g, o, id, v, count(*) OVER w AS i, sum(v) OVER w AS si
               FROM raw WINDOW w AS (PARTITION BY g ORDER BY o, id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         t AS (SELECT g, count(*) AS n, sum(v) AS sn FROM raw GROUP BY 1),
         s AS (SELECT c.g, i, o, n,
                      abs(n::HUGEINT * si::HUGEINT - i::HUGEINT * sn::HUGEINT) AS d
               FROM c JOIN t USING (g) WHERE i < n),
         dm AS (SELECT g, max(d) AS dmax FROM s GROUP BY 1),
         best AS (SELECT s.g, min(i) AS split_i
                  FROM s JOIN dm ON s.g = dm.g AND s.d = dm.dmax GROUP BY 1)
         SELECT s.g AS event_type, s.n, best.split_i, s.o AS split_ts_us,
                CAST(round(dm.dmax::DOUBLE
                  / (best.split_i::DOUBLE * (s.n - best.split_i)::DOUBLE) * 1e6)
                  AS BIGINT) AS gap_micro
         FROM s JOIN dm ON s.g = dm.g AND s.d = dm.dmax
                JOIN best ON s.g = best.g AND s.i = best.split_i
         ORDER BY event_type""",
    // HUGEINT products/mods replay the engine's Decimal(38,0) arithmetic;
    // // is exact because budget·w − rem is divisible by W by construction
    "q184_apportion" ->
      """WITH pg AS (SELECT source AS g, CAST(sum(n_chars) AS HUGEINT) AS w
                     FROM documents
                     WHERE source IS NOT NULL AND n_chars IS NOT NULL
                       AND n_chars >= 0 GROUP BY 1),
         t AS (SELECT sum(w) AS wt FROM pg),
         j AS (SELECT g, w, (100000::HUGEINT * w) % wt AS rem,
                      (100000::HUGEINT * w) // wt AS fq
               FROM pg, t WHERE wt > 0),
         l AS (SELECT 100000 - sum(fq) AS lf FROM j),
         r AS (SELECT g, w, fq, rem,
                      row_number() OVER (ORDER BY rem DESC, g) AS rk FROM j)
         SELECT g AS source, CAST(w AS BIGINT) AS w,
                CAST(fq + CASE WHEN rk <= lf THEN 1 ELSE 0 END AS BIGINT) AS alloc
         FROM r, l ORDER BY source""",
    // same normalize/tokenize as the LM family; the only division is the
    // final r* ratio over exact integer counts
    "q185_good_turing" ->
      """WITH toks AS (SELECT unnest(string_split_regex(
                trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')),
                '\s+')) AS token FROM documents),
         c AS (SELECT token, count(*) AS c FROM toks GROUP BY 1),
         ff AS (SELECT c AS r, count(*) AS n_r FROM c GROUP BY 1),
         nx AS (SELECT r - 1 AS r, n_r AS n_next FROM ff)
         SELECT ff.r, ff.n_r,
                CASE WHEN n_next IS NOT NULL
                     THEN CAST(round((ff.r + 1)::DOUBLE * n_next::DOUBLE
                                     / ff.n_r::DOUBLE * 1e6) AS BIGINT)
                END AS r_star_micro
         FROM ff LEFT JOIN nx USING (r) ORDER BY r""",
    // windows replayed by bounded fan-out (gram × offset 0..w−1), argmin
    // tie-to-rightmost as max(p) among the window's min-hash rows
    "q186_winnow_pairs" ->
      """WITH d AS (SELECT doc_id AS id,
                trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS t
              FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
         d2 AS (SELECT id, t, len(t) AS n FROM d WHERE len(t) >= 11),
         gp AS (SELECT id, t, n - 7 AS np,
                unnest([pp for pp in range(1, n - 6)]) AS p FROM d2),
         g AS (SELECT id, p, np,
                list_sum([ (instr('0123456789abcdef',
                                  substr(md5(substr(t, p::INT, 8)), kk, 1)) - 1)
                           * pow(16, 15 - kk)::BIGINT for kk in range(1, 16)]) AS h
               FROM gp),
         j AS (SELECT id, p + o AS e, p, h FROM g, range(0, 4) o(o)
               WHERE p + o >= 4 AND p + o <= np),
         wm AS (SELECT id, e, min(h) AS mh FROM j GROUP BY 1, 2),
         sel AS (SELECT j.id, max(j.p) AS p, wm.mh AS h
                 FROM j JOIN wm ON j.id = wm.id AND j.e = wm.e AND j.h = wm.mh
                 GROUP BY j.id, j.e, wm.mh),
         fp AS (SELECT DISTINCT id, h FROM sel),
         kept AS (SELECT fp.* FROM fp JOIN (SELECT h FROM fp GROUP BY h
                    HAVING count(*) <= 20) ok ON fp.h = ok.h),
         sizes AS (SELECT id, count(*) AS nf FROM kept GROUP BY 1),
         pairs AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_shared
                   FROM kept a JOIN kept b ON a.h = b.h AND a.id < b.id
                   GROUP BY 1, 2)
         SELECT id_a, id_b, n_shared, sa.nf AS n_a, sb.nf AS n_b,
                CAST(round(n_shared::DOUBLE
                  / (sa.nf + sb.nf - n_shared)::DOUBLE * 1e6) AS BIGINT) AS jac_micro
         FROM pairs JOIN sizes sa ON pairs.id_a = sa.id
                    JOIN sizes sb ON pairs.id_b = sb.id
         WHERE n_shared >= 3 ORDER BY id_a, id_b""",
    // two brute-force rankings (full dim, first-16-dim) + pre-rounded
    // integer log2 discounts; the only division is the final nDCG ratio
    "q187_retrieval_eval" ->
      s"""WITH $sqlVecs,
         v16 AS (SELECT vec_id, q[1:16] AS q,
                        list_sum([qq * qq for qq in q[1:16]]) AS nn FROM v),
         truth AS (SELECT query_id, nbr_id, rank FROM (
             SELECT q.vec_id AS query_id, c.vec_id AS nbr_id,
                    row_number() OVER (PARTITION BY q.vec_id
                      ORDER BY list_sum([p[1] * p[2] for p in list_zip(q.q, c.q)])::DOUBLE
                                 / NULLIF(sqrt(q.nn::DOUBLE) * sqrt(c.nn::DOUBLE), 0) DESC,
                               c.vec_id) AS rank
             FROM v q JOIN v c ON q.vec_id % 50 = 0 AND q.vec_id <> c.vec_id) t
           WHERE rank <= 10),
         sys AS (SELECT query_id, nbr_id, rank FROM (
             SELECT q.vec_id AS query_id, c.vec_id AS nbr_id,
                    row_number() OVER (PARTITION BY q.vec_id
                      ORDER BY list_sum([p[1] * p[2] for p in list_zip(q.q, c.q)])::DOUBLE
                                 / NULLIF(sqrt(q.nn::DOUBLE) * sqrt(c.nn::DOUBLE), 0) DESC,
                               c.vec_id) AS rank
             FROM v16 q JOIN v16 c ON q.vec_id % 50 = 0 AND q.vec_id <> c.vec_id) t
           WHERE rank <= 10),
         tagg AS (SELECT query_id, count(*) AS n_truth,
                CAST(sum(CAST(round(1e6 / (ln(rank + 1) / ln(2))) AS BIGINT)) AS BIGINT) AS idcg_micro
              FROM truth GROUP BY 1),
         hagg AS (SELECT s.query_id, count(*) AS n_hit,
                CAST(sum(CAST(round(1e6 / (ln(s.rank + 1) / ln(2))) AS BIGINT)) AS BIGINT) AS dcg_micro
              FROM sys s JOIN truth t
                ON s.query_id = t.query_id AND s.nbr_id = t.nbr_id GROUP BY 1),
         rr AS (SELECT t.query_id,
                COALESCE(CAST(round(1e6 / s.rank) AS BIGINT), 0) AS rr_micro
              FROM (SELECT query_id, nbr_id FROM truth WHERE rank = 1) t
              LEFT JOIN sys s ON s.query_id = t.query_id AND s.nbr_id = t.nbr_id)
         SELECT tagg.query_id, n_truth, COALESCE(n_hit, 0) AS n_hit, rr.rr_micro,
                COALESCE(dcg_micro, 0) AS dcg_micro, idcg_micro,
                CASE WHEN idcg_micro > 0
                     THEN CAST(round(COALESCE(dcg_micro, 0)::DOUBLE
                                     / idcg_micro::DOUBLE * 1e6) AS BIGINT)
                END AS ndcg_micro
         FROM tagg LEFT JOIN hagg ON tagg.query_id = hagg.query_id
              LEFT JOIN rr ON tagg.query_id = rr.query_id
         ORDER BY tagg.query_id""",
    // one suffix-max window stands in for the engine's two-level form
    "q188_skyline" ->
      """WITH lx AS (SELECT p_brand AS g, p_size AS x,
                max(CAST(round(p_retailprice * 100) AS BIGINT)) AS ymax
              FROM part
              WHERE p_brand IS NOT NULL AND p_size IS NOT NULL
                AND p_retailprice IS NOT NULL GROUP BY 1, 2),
         m AS (SELECT g, x, ymax, max(ymax) OVER (PARTITION BY g ORDER BY x DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mgt FROM lx)
         SELECT g AS p_brand, CAST(x AS BIGINT) AS p_size, ymax AS max_cents
         FROM m WHERE mgt IS NULL OR mgt < ymax ORDER BY p_brand, p_size""",
    // one global (score DESC, id) window stands in for the two-level rank;
    // precision terms pre-rounded to micro ints, summed exactly
    "q189_avg_precision" ->
      """WITH raw AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS s,
                o_orderkey AS id, o_orderstatus = 'F' AS y
              FROM orders WHERE o_totalprice IS NOT NULL
                AND o_orderstatus IS NOT NULL AND o_orderkey IS NOT NULL),
         c AS (SELECT s, id, y, row_number() OVER w AS k,
                      sum(CASE WHEN y THEN 1 ELSE 0 END) OVER
                        (ORDER BY s DESC, id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cp
               FROM raw WINDOW w AS (ORDER BY s DESC, id)),
         t AS (SELECT count(*) AS n_rows,
                      CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
               FROM raw),
         st AS (SELECT COALESCE(sum(CAST(round(cp::DOUBLE / k::DOUBLE * 1e6)
                                         AS BIGINT)), 0) AS st
                FROM c WHERE y)
         SELECT n_rows, n_pos,
                CASE WHEN n_pos > 0
                     THEN CAST(round(st::DOUBLE / n_pos::DOUBLE) AS BIGINT)
                END AS ap_micro
         FROM t, st""",
    // one md5 per ROW → (w0, w1) words; replicate uniforms via the
    // Kirsch–Mitzenmacher (w0 + r·w1) mod (2³¹−1), SAME literal CDF
    // thresholds; lo/hi indices fixed at ceil(0.025·64) = 2
    "q190_bootstrap" ->
      """WITH base AS (SELECT event_id::VARCHAR AS id,
                CAST(round(value * 100) AS BIGINT) AS v
              FROM events WHERE event_id IS NOT NULL AND value IS NOT NULL),
         hw AS (SELECT v,
                list_sum([ (instr('0123456789abcdef', substr(md5(id), k, 1)) - 1)
                           * pow(16, 8 - k)::BIGINT for k in range(1, 9)]) AS w0,
                list_sum([ (instr('0123456789abcdef', substr(md5(id), k + 8, 1)) - 1)
                           * pow(16, 8 - k)::BIGINT for k in range(1, 9)]) AS w1
              FROM base),
         wts AS (SELECT r, v,
                CASE WHEN u < 790015083 THEN 0
                     WHEN u < 1580030167 THEN 1
                     WHEN u < 1975037709 THEN 2
                     WHEN u < 2106706890 THEN 3
                     WHEN u < 2139624185 THEN 4
                     WHEN u < 2146207644 THEN 5
                     WHEN u < 2147304887 THEN 6
                     ELSE 7 END AS w
              FROM (SELECT r, v, (w0 + w1 * r) % 2147483647 AS u
                    FROM hw, range(0, 64) t(r)) t),
         rs AS (SELECT r, CAST(round(sum(w * v)::DOUBLE / sum(w)::DOUBLE * 1e6)
                               AS BIGINT) AS m
                FROM wts GROUP BY r HAVING sum(w) > 0),
         rk AS (SELECT r, m, row_number() OVER (ORDER BY m, r) AS ra,
                       row_number() OVER (ORDER BY m DESC, r DESC) AS rd FROM rs),
         ci AS (SELECT count(*) AS nb,
                       max(CASE WHEN ra = 2 THEN m END) AS lo,
                       max(CASE WHEN rd = 2 THEN m END) AS hi,
                       sum(m::HUGEINT) AS sm,
                       sum(m::HUGEINT * m::HUGEINT) AS sm2 FROM rk),
         f AS (SELECT count(*) AS n_rows, CAST(sum(v) AS BIGINT) AS sv FROM base)
         SELECT n_rows,
                CASE WHEN n_rows > 0
                     THEN CAST(round(sv::DOUBLE / n_rows::DOUBLE * 1e6) AS BIGINT)
                END AS mean_micro,
                lo AS boot_lo_micro, hi AS boot_hi_micro,
                CASE WHEN nb >= 2
                     THEN CAST(round(sqrt((sm2::DOUBLE - sm::DOUBLE * sm::DOUBLE
                                           / nb::DOUBLE) / (nb::DOUBLE - 1)))
                               AS BIGINT)
                END AS boot_se_micro
         FROM f, ci""",
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
    // position join replayed with a global row_number; DuckDB's own
    // jaro_winkler_similarity micro-rounds to the q163-verified digits
    "q193_sorted_neighborhood" ->
      """WITH names AS (SELECT DISTINCT p_name AS name FROM part
                        WHERE p_name IS NOT NULL),
         pos AS (SELECT name, row_number() OVER (ORDER BY name) AS p FROM names),
         pr AS (SELECT a.name AS name_a, b.name AS name_b, j AS gap
                FROM pos a, range(1, 5) t(j)
                JOIN pos b ON b.p = a.p + j)
         SELECT name_a, name_b, gap,
                CAST(round(jaro_winkler_similarity(name_a, name_b) * 1e6)
                     AS BIGINT) AS jw_micro
         FROM pr
         WHERE CAST(round(jaro_winkler_similarity(name_a, name_b) * 1e6)
                    AS BIGINT) >= 900000
         ORDER BY name_a, name_b""",
    // the q187 run pair + the SAME literal RBO weights (k=10, p=0.9),
    // one lookup at the worse rank per shared item
    "q194_rbo" ->
      s"""WITH $sqlVecs,
         v16 AS (SELECT vec_id, q[1:16] AS q,
                        list_sum([qq * qq for qq in q[1:16]]) AS nn FROM v),
         truth AS (SELECT query_id, nbr_id, rank FROM (
             SELECT q.vec_id AS query_id, c.vec_id AS nbr_id,
                    row_number() OVER (PARTITION BY q.vec_id
                      ORDER BY list_sum([p[1] * p[2] for p in list_zip(q.q, c.q)])::DOUBLE
                                 / NULLIF(sqrt(q.nn::DOUBLE) * sqrt(c.nn::DOUBLE), 0) DESC,
                               c.vec_id) AS rank
             FROM v q JOIN v c ON q.vec_id % 50 = 0 AND q.vec_id <> c.vec_id) t
           WHERE rank <= 10),
         sys AS (SELECT query_id, nbr_id, rank FROM (
             SELECT q.vec_id AS query_id, c.vec_id AS nbr_id,
                    row_number() OVER (PARTITION BY q.vec_id
                      ORDER BY list_sum([p[1] * p[2] for p in list_zip(q.q, c.q)])::DOUBLE
                                 / NULLIF(sqrt(q.nn::DOUBLE) * sqrt(c.nn::DOUBLE), 0) DESC,
                               c.vec_id) AS rank
             FROM v16 q JOIN v16 c ON q.vec_id % 50 = 0 AND q.vec_id <> c.vec_id) t
           WHERE rank <= 10),
         sh AS (SELECT s.query_id,
                ([235416,135416,90416,63416,45191,32069,22228,14636,8657,3874])
                  [greatest(s.rank, t.rank)::INT] AS w
              FROM sys s JOIN truth t
                ON s.query_id = t.query_id AND s.nbr_id = t.nbr_id),
         ag AS (SELECT query_id, count(*) AS n_shared,
                       CAST(sum(w) AS BIGINT) AS rbo_micro FROM sh GROUP BY 1),
         qs AS (SELECT DISTINCT query_id FROM
                (SELECT query_id FROM sys UNION SELECT query_id FROM truth) u)
         SELECT qs.query_id, COALESCE(n_shared, 0) AS n_shared,
                COALESCE(rbo_micro, 0) AS rbo_micro
         FROM qs LEFT JOIN ag ON qs.query_id = ag.query_id
         ORDER BY qs.query_id""",
    // the same normalize/tokenize; smallest covering checkpoint via a
    // filtered list min; running sums over the checkpoint table
    "q195_vocab_growth" ->
      """WITH cps AS (SELECT unnest([16, 64, 256, 1024, 4096, 16384]) AS k),
         toks AS (SELECT doc_id AS id,
                unnest(string_split_regex(trim(regexp_replace(lower(text),
                  '[^a-z0-9]+', ' ', 'g')), '\s+')) AS token
              FROM documents WHERE doc_id IS NOT NULL),
         ft AS (SELECT k, count(*) AS new_types FROM (
                  SELECT list_min([c for c in [16, 64, 256, 1024, 4096, 16384]
                                   if c >= fid]) AS k
                  FROM (SELECT token, min(id) AS fid FROM toks GROUP BY 1) t) u
                WHERE k IS NOT NULL GROUP BY 1),
         tm AS (SELECT k, count(*) AS new_tokens FROM (
                  SELECT list_min([c for c in [16, 64, 256, 1024, 4096, 16384]
                                   if c >= id]) AS k FROM toks) u
                WHERE k IS NOT NULL GROUP BY 1),
         cur AS (SELECT cps.k,
                sum(COALESCE(new_tokens, 0)) OVER (ORDER BY cps.k
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_tokens,
                sum(COALESCE(new_types, 0)) OVER (ORDER BY cps.k
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_types
              FROM cps LEFT JOIN ft ON cps.k = ft.k
                       LEFT JOIN tm ON cps.k = tm.k)
         SELECT CAST(k AS BIGINT) AS k, CAST(n_tokens AS BIGINT) AS n_tokens,
                CAST(n_types AS BIGINT) AS n_types,
                CASE WHEN n_tokens > 0
                     THEN CAST(round(n_types::DOUBLE / n_tokens::DOUBLE * 1e6)
                               AS BIGINT)
                END AS ttr_micro
         FROM cur ORDER BY k""",
    // the q133 NB chain through `scored`, top-2 pivot, exact margin bucket
    "q180_nb_calibration" ->
      """WITH train AS (SELECT * FROM documents WHERE doc_id % 5 <> 0 AND lang IS NOT NULL),
         test AS (SELECT * FROM documents WHERE doc_id % 5 = 0),
         ttoks AS (SELECT lang AS label,
                unnest(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), '\s+')) AS token
              FROM train),
         counts AS (SELECT label, token, count(*) AS c FROM ttoks GROUP BY 1, 2),
         perlabel AS (SELECT label, CAST(sum(c) AS BIGINT) AS t_label FROM counts GROUP BY 1),
         vocab AS (SELECT count(DISTINCT token) AS v FROM counts),
         nd AS (SELECT lang AS label, count(*) AS n_docs FROM train GROUP BY 1),
         nt AS (SELECT count(*) AS n_total FROM train),
         stats AS (SELECT nd.label,
                CAST(round(ln(n_docs) * 1000000) AS BIGINT)
                  - CAST(round(ln(n_total) * 1000000) AS BIGINT) AS prior_micro,
                CAST(round(ln(t_label + v) * 1000000) AS BIGINT) AS denom_micro
              FROM nd CROSS JOIN nt JOIN perlabel ON nd.label = perlabel.label CROSS JOIN vocab),
         lik AS (SELECT label, token, CAST(round(ln(c + 1) * 1000000) AS BIGINT) AS lik_micro FROM counts),
         dtoks AS (SELECT doc_id,
                unnest(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), '\s+')) AS token
              FROM test),
         ntok AS (SELECT doc_id, CASE WHEN text IS NULL THEN 0
                ELSE CAST(len(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), '\s+')) AS BIGINT) END AS n_tok
              FROM test),
         overlap AS (SELECT d.doc_id, l.label, CAST(sum(l.lik_micro) AS BIGINT) AS num_micro
              FROM dtoks d JOIN lik l ON d.token = l.token GROUP BY 1, 2),
         scored AS (SELECT t.doc_id, s.label,
                s.prior_micro + COALESCE(o.num_micro, 0) - k.n_tok * s.denom_micro AS score_micro
              FROM test t CROSS JOIN stats s
              JOIN ntok k ON k.doc_id = t.doc_id
              LEFT JOIN overlap o ON o.doc_id = t.doc_id AND o.label = s.label),
         rk AS (SELECT doc_id, label, score_micro,
                row_number() OVER (PARTITION BY doc_id ORDER BY score_micro DESC, label) AS rn
              FROM scored),
         p AS (SELECT doc_id,
                max(CASE WHEN rn = 1 THEN label END) AS pred_label,
                max(CASE WHEN rn = 1 THEN score_micro END) AS s1,
                max(CASE WHEN rn = 2 THEN score_micro END) AS s2
               FROM rk WHERE rn <= 2 GROUP BY 1),
         m AS (SELECT p.doc_id, pred_label, s1 - s2 AS mg, t.lang AS true_lang
               FROM p JOIN test t USING (doc_id)
               WHERE t.lang IS NOT NULL AND s2 IS NOT NULL),
         b AS (SELECT CAST((mg - ((mg % 500000 + 500000) % 500000)) / 500000 AS BIGINT) AS bucket,
                CAST(count(*) AS BIGINT) AS n_docs,
                CAST(count(CASE WHEN pred_label = true_lang THEN 1 END) AS BIGINT) AS n_correct
               FROM m GROUP BY 1)
         SELECT bucket, n_docs, n_correct,
                CAST(round(n_correct::DOUBLE / n_docs::DOUBLE * 1e6) AS BIGINT) AS acc_micro
         FROM b ORDER BY bucket""",
    // same censoring cut, level grid, rounded-ln terms, shared exp tree
    "q179_kaplan_meier" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS t FROM events
              WHERE user_id IS NOT NULL AND ts IS NOT NULL),
         sp AS (SELECT user_id, min(t) AS f, max(t) AS l FROM e GROUP BY 1),
         g AS (SELECT min(t) AS gmin, max(t) AS gmax FROM e),
         obs AS (SELECT ((l - f) - (l - f) % 3600000000) / 3600000000 AS dur,
                        l < gmax - CAST(floor((gmax - gmin) / 10.0) AS BIGINT) AS ev
                 FROM sp, g),
         lv AS (SELECT CAST(dur AS BIGINT) AS dur,
                       CAST(count(CASE WHEN ev THEN 1 END) AS BIGINT) AS d,
                       CAST(count(CASE WHEN NOT ev THEN 1 END) AS BIGINT) AS c
                FROM obs GROUP BY 1),
         l2 AS (SELECT dur, d, c, d + c AS tot FROM lv),
         t2 AS (SELECT CAST(sum(tot) AS BIGINT) AS N FROM l2),
         r AS (SELECT dur, d, c,
                CAST(N - COALESCE(sum(tot) OVER (ORDER BY dur
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n_risk
               FROM l2, t2),
         s AS (SELECT dur, d, c, n_risk,
                CASE WHEN d > 0 AND d < n_risk
                     THEN CAST(round(ln(1 - d::DOUBLE / n_risk::DOUBLE) * 1e6) AS BIGINT)
                END AS term,
                CASE WHEN d = n_risk THEN 1 ELSE 0 END AS pin
               FROM r),
         cum AS (SELECT dur, n_risk, d, c,
                CAST(sum(term) OVER win AS BIGINT) AS ls, max(pin) OVER win AS dead
               FROM s WINDOW win AS (ORDER BY dur
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         SELECT dur, n_risk, d AS n_events, c AS n_censored,
                CASE WHEN dead = 0 THEN ls END AS logsurv_micro,
                CASE WHEN dead = 1 THEN 0
                     WHEN ls IS NULL THEN 1000000
                     ELSE CAST(round(exp(ls::DOUBLE / 1e6) * 1e6) AS BIGINT)
                END AS surv_micro
         FROM cum ORDER BY dur""",
    // the q130 BPE chain rolled up by language instead of by document
    "q178_bpe_fertility" ->
      s"""WITH ${sqlBpeChain(8)},
         bdt AS (SELECT doc_id, token AS word FROM (
                SELECT doc_id, unnest(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), '\\s+')) AS token
                FROM documents) t WHERE len(token) > 0),
         bwp AS (SELECT word, len(string_split(syms, ' ')) AS n_p FROM w8),
         pl AS (SELECT d.lang, CAST(count(*) AS BIGINT) AS n_tokens,
                       CAST(sum(n_p) AS BIGINT) AS n_pieces
                FROM bdt JOIN bwp USING (word)
                JOIN documents d USING (doc_id)
                WHERE d.lang IS NOT NULL GROUP BY 1)
         SELECT lang, n_tokens, n_pieces,
                CAST(round(n_pieces::DOUBLE / n_tokens::DOUBLE * 1e6) AS BIGINT) AS fertility_micro
         FROM pl ORDER BY lang""",
    // same shingles, df cap, exact integer threshold, micro divisions
    "q177_containment" ->
      """WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
              FROM documents),
         s AS (SELECT doc_id,
                list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                               for i in range(1, len(w) - 1)]) AS sh
               FROM w),
         e AS (SELECT doc_id, unnest(sh) AS g FROM s),
         dfc AS (SELECT g FROM e GROUP BY g HAVING count(*) <= 10),
         ke AS (SELECT e.doc_id, e.g FROM e JOIN dfc USING (g)),
         sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nsh FROM ke GROUP BY 1),
         inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                CAST(count(*) AS BIGINT) AS inter
               FROM ke a JOIN ke b ON a.g = b.g AND a.doc_id < b.doc_id
               GROUP BY 1, 2)
         SELECT id_a, id_b, inter, x.nsh AS n_a, y.nsh AS n_b,
                CAST(round(inter::DOUBLE / x.nsh::DOUBLE * 1e6) AS BIGINT) AS cont_a_micro,
                CAST(round(inter::DOUBLE / y.nsh::DOUBLE * 1e6) AS BIGINT) AS cont_b_micro
         FROM inter JOIN sz x ON x.doc_id = id_a JOIN sz y ON y.doc_id = id_b
         WHERE inter * 10 >= 8 * least(x.nsh, y.nsh)
         ORDER BY id_a, id_b""",
    // naive all-pairs candidates + DuckDB's own JW at the same threshold,
    // closure via recursive CTE, same min-name canonicalization
    "q176_entity_resolution" ->
      """WITH RECURSIVE
         names AS (SELECT p_name AS name FROM part GROUP BY 1),
         p AS (SELECT a.name AS na, b.name AS nb
               FROM names a JOIN names b ON a.name < b.name
               WHERE levenshtein(a.name, b.name) <= 2
                 AND CAST(round(jaro_winkler_similarity(a.name, b.name) * 1e6) AS BIGINT) >= 930000),
         edges AS (SELECT na AS a, nb AS b FROM p UNION SELECT nb, na FROM p),
         reach(a, b) AS (SELECT a, b FROM edges
                         UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
         SELECT a AS name, min(b) AS canon_name FROM reach
         GROUP BY a HAVING min(b) < a ORDER BY name""",
    // same tag regex, same entity order (&amp; last), same whitespace fold
    "q174_strip_markup" ->
      """WITH r AS (SELECT doc_id,
                '<html><p class="x">' || substr(text, 1, 60)
                  || '</p> &amp;amp; <br/>done&nbsp;&#39;q&#39;' AS raw
              FROM documents),
         c AS (SELECT doc_id, raw,
                trim(regexp_replace(
                  replace(replace(replace(replace(replace(replace(
                    regexp_replace(raw, '<[^>]*>', ' ', 'g'),
                    '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                    '&#39;', chr(39)), '&nbsp;', ' '), '&amp;', '&'),
                  '\s+', ' ', 'g')) AS clean
               FROM r)
         SELECT doc_id, CAST(length(raw) AS BIGINT) AS len_raw,
                CAST(length(clean) AS BIGINT) AS len_clean,
                md5(clean) AS clean_md5
         FROM c ORDER BY doc_id""",
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
    // the q95 md5→60-bit integer trick, mod the feature dim; nulls ride
    // md5(NULL) = NULL on both engines
    "q173_feature_hash" ->
      """WITH h AS (SELECT doc_id,
                list_sum([ (instr('0123456789abcdef', substr(md5(lang), k, 1)) - 1)
                           * pow(16, 15 - k)::BIGINT for k in range(1, 16)])::BIGINT % 16 AS hx_lang,
                list_sum([ (instr('0123456789abcdef', substr(md5(source), k, 1)) - 1)
                           * pow(16, 15 - k)::BIGINT for k in range(1, 16)])::BIGINT % 16 AS hx_source,
                list_sum([ (instr('0123456789abcdef', substr(md5(lang || '|' || source), k, 1)) - 1)
                           * pow(16, 15 - k)::BIGINT for k in range(1, 16)])::BIGINT % 64 AS hx_lang_source
              FROM documents)
         SELECT doc_id, hx_lang, hx_source, hx_lang_source
         FROM h ORDER BY doc_id""",
    // same mid split, merged step grid, HUGEINT cross products, max once
    "q171_ks_drift" ->
      """WITH raw AS (SELECT CAST(round(value * 100) AS BIGINT) AS v,
                epoch_us(ts) AS t FROM events),
         m AS (SELECT min(t) + CAST(floor((max(t) - min(t)) / 2.0) AS BIGINT) AS mid
               FROM raw),
         la AS (SELECT v, count(*) AS ca FROM raw, m
                WHERE t < mid AND v IS NOT NULL GROUP BY 1),
         lb AS (SELECT v, count(*) AS cb FROM raw, m
                WHERE t >= mid AND v IS NOT NULL GROUP BY 1),
         g AS (SELECT COALESCE(la.v, lb.v) AS v, COALESCE(ca, 0) AS ca,
                      COALESCE(cb, 0) AS cb
               FROM la FULL OUTER JOIN lb ON la.v = lb.v),
         c AS (SELECT v, sum(ca) OVER w AS cuma, sum(cb) OVER w AS cumb FROM g
               WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         t2 AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
                       CAST(sum(cb) AS BIGINT) AS nb FROM g),
         dm AS (SELECT max(abs(nb::HUGEINT * cuma::HUGEINT
                             - na::HUGEINT * cumb::HUGEINT)) AS dmax
                FROM c CROSS JOIN t2)
         SELECT na AS n_a, nb AS n_b,
                CASE WHEN na > 0 AND nb > 0
                     THEN CAST(round(dmax::DOUBLE / (na::DOUBLE * nb::DOUBLE) * 1e6) AS BIGINT)
                END AS ks_micro
         FROM t2 CROSS JOIN dm""",
    // same doubled tie-averaged ranks and the shared Pearson tree
    "q172_spearman" ->
      """WITH r0 AS (SELECT CAST(l_quantity AS BIGINT) AS x,
                CAST(round(l_extendedprice * 100) AS BIGINT) AS y
              FROM lineitem
              WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
         lx AS (SELECT x AS v, count(*) AS c FROM r0 GROUP BY 1),
         cx AS (SELECT v, 2 * COALESCE(sum(c) OVER (ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + c + 1 AS r
                FROM lx),
         ly AS (SELECT y AS v, count(*) AS c FROM r0 GROUP BY 1),
         cy AS (SELECT v, 2 * COALESCE(sum(c) OVER (ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + c + 1 AS r
                FROM ly),
         rr AS (SELECT cx.r AS rx, cy.r AS ry
                FROM r0 JOIN cx ON r0.x = cx.v JOIN cy ON r0.y = cy.v),
         s AS (SELECT CAST(count(*) AS BIGINT) AS n,
                      sum(rx::HUGEINT) AS sx, sum(ry::HUGEINT) AS sy,
                      sum(rx::HUGEINT * rx::HUGEINT) AS sxx,
                      sum(ry::HUGEINT * ry::HUGEINT) AS syy,
                      sum(rx::HUGEINT * ry::HUGEINT) AS sxy FROM rr)
         SELECT n AS n_rows,
                CASE WHEN n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE > 0
                      AND n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE > 0
                     THEN CAST(round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
                          / (sqrt(n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
                           * sqrt(n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE))
                          * 1e6) AS BIGINT)
                END AS rho_micro
         FROM s""",
    // same tokenization/shingling as the Spark side, same md5 bench split
    "q169_decontaminate" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
              FROM documents),
         lbl AS (SELECT doc_id, w, md5(doc_id::VARCHAR) < '10' AS is_bench FROM t),
         sh AS (SELECT doc_id, is_bench,
                list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' '
                               || w[i+3] || ' ' || w[i+4]
                               for i in range(1, len(w) - 3)]) AS sh
               FROM lbl),
         te AS (SELECT doc_id, unnest(sh) AS g FROM sh WHERE NOT is_bench),
         be AS (SELECT DISTINCT unnest(sh) AS g FROM sh WHERE is_bench)
         SELECT te.doc_id AS train_id, CAST(count(*) AS BIGINT) AS n_hits
         FROM te JOIN be USING (g) GROUP BY 1 ORDER BY 1""",
    // same rank window, same floor cut, exact kept sums
    "q170_trimmed_mean" ->
      """WITH x AS (SELECT o_orderpriority AS g,
                CAST(round(o_totalprice * 100) AS BIGINT) AS v FROM orders
              WHERE o_orderpriority IS NOT NULL AND o_totalprice IS NOT NULL),
         r AS (SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v) AS rn,
                      count(*) OVER (PARTITION BY g) AS n FROM x),
         kk AS (SELECT g, v, rn, n,
                      CAST(floor(n * 1 / 10) AS BIGINT) AS k FROM r)
         SELECT g AS o_orderpriority, CAST(max(n) AS BIGINT) AS n_rows,
                CAST(count(*) AS BIGINT) AS n_kept,
                CAST(round(sum(v)::DOUBLE / count(*)::DOUBLE * 1e6) AS BIGINT) AS tmean_micro
         FROM kk WHERE rn > k AND rn <= n - k GROUP BY 1 ORDER BY 1""",
    // same exact split point, full-outer level grid, and shared ln tree
    "q166_psi_drift" ->
      """WITH e AS (SELECT event_type, epoch_us(ts) AS t FROM events),
         m AS (SELECT min(t) + CAST(floor((max(t) - min(t)) / 2.0) AS BIGINT) AS mid
               FROM e),
         la AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_a
                FROM e, m WHERE t < mid AND event_type IS NOT NULL GROUP BY 1),
         lb AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_b
                FROM e, m WHERE t >= mid AND event_type IS NOT NULL GROUP BY 1),
         lv AS (SELECT COALESCE(la.event_type, lb.event_type) AS event_type,
                       COALESCE(n_a, 0) AS n_a, COALESCE(n_b, 0) AS n_b
                FROM la FULL OUTER JOIN lb ON la.event_type = lb.event_type),
         t2 AS (SELECT CAST(sum(n_a) AS BIGINT) AS ta,
                       CAST(sum(n_b) AS BIGINT) AS tb FROM lv)
         SELECT event_type, n_a, n_b, (n_a = 0 OR n_b = 0) AS one_sided,
                CASE WHEN n_a > 0 AND n_b > 0
                     THEN CAST(round((n_a::DOUBLE / ta::DOUBLE - n_b::DOUBLE / tb::DOUBLE)
                          * ln((n_a::DOUBLE / ta::DOUBLE) / (n_b::DOUBLE / tb::DOUBLE))
                          * 1e6) AS BIGINT)
                END AS psi_term_micro
         FROM lv CROSS JOIN t2 ORDER BY event_type""",
    // the same decimal-string leading digit and micro trees
    "q167_benford" ->
      """WITH v AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c FROM orders),
         d AS (SELECT CAST(substr(c::VARCHAR, 1, 1) AS BIGINT) AS digit,
                      CAST(count(*) AS BIGINT) AS n
               FROM v WHERE c IS NOT NULL AND c > 0 GROUP BY 1),
         t AS (SELECT CAST(sum(n) AS BIGINT) AS tt FROM d)
         SELECT digit, n,
                CAST(round(n::DOUBLE / tt::DOUBLE * 1e6) AS BIGINT) AS share_micro,
                CAST(round(ln(1.0 + 1.0 / digit::DOUBLE) / ln(10.0) * 1e6) AS BIGINT) AS benford_micro,
                CAST(round(n::DOUBLE / tt::DOUBLE * 1e6) AS BIGINT)
                  - CAST(round(ln(1.0 + 1.0 / digit::DOUBLE) / ln(10.0) * 1e6) AS BIGINT) AS dev_micro
         FROM d CROSS JOIN t ORDER BY digit""",
    // the q23 lang-id CTE verbatim, then the exact-marginal kappa identity
    "q168_kappa" ->
      """WITH t AS (
           SELECT doc_id, text,
                  string_split_regex(trim(lower(text)), '\s+') AS lt
           FROM documents),
         sc AS (
           SELECT doc_id,
             len(list_filter(lt, x -> list_contains(['the','a','of','and','to','in','is','it'], x))) AS s_en,
             len(list_filter(lt, x -> list_contains(['der','die','das','und','ist','ein','zu','den'], x))) AS s_de,
             len(list_filter(lt, x -> list_contains(['el','la','que','y','en','un','es','los'], x))) AS s_es,
             len(list_filter(lt, x -> list_contains(['le','la','et','un','une','est','dans','les'], x))) AS s_fr,
             len(list_filter(lt, x -> list_contains(['的','是','在','了','我','有','和','不'], x))) AS s_zh
           FROM t),
         lbl AS (
           SELECT d.lang AS la,
                CASE WHEN s_en = greatest(s_en, s_de, s_es, s_fr, s_zh) AND s_en > 0 THEN 'en'
                     WHEN s_de = greatest(s_en, s_de, s_es, s_fr, s_zh) AND s_de > 0 THEN 'de'
                     WHEN s_es = greatest(s_en, s_de, s_es, s_fr, s_zh) AND s_es > 0 THEN 'es'
                     WHEN s_fr = greatest(s_en, s_de, s_es, s_fr, s_zh) AND s_fr > 0 THEN 'fr'
                     WHEN s_zh = greatest(s_en, s_de, s_es, s_fr, s_zh) AND s_zh > 0 THEN 'zh'
                     ELSE 'und' END AS lb
           FROM sc JOIN documents d ON d.doc_id = sc.doc_id
           WHERE d.lang IS NOT NULL),
         j AS (SELECT la, lb, CAST(count(*) AS BIGINT) AS c FROM lbl GROUP BY 1, 2),
         ra AS (SELECT la, CAST(sum(c) AS BIGINT) AS r FROM j GROUP BY 1),
         cb AS (SELECT lb, CAST(sum(c) AS BIGINT) AS cc FROM j GROUP BY 1),
         rc AS (SELECT COALESCE(sum(r::HUGEINT * cc::HUGEINT), 0::HUGEINT) AS src
                FROM ra JOIN cb ON ra.la = cb.lb),
         b AS (SELECT CAST(sum(c) AS BIGINT) AS n,
                      CAST(sum(CASE WHEN la = lb THEN c ELSE 0 END) AS BIGINT) AS agree
               FROM j)
         SELECT n AS n_rows, agree AS n_agree,
                CASE WHEN n::HUGEINT * n::HUGEINT <> src
                     THEN CAST(round((n::DOUBLE * agree::DOUBLE - src::DOUBLE)
                          / (n::DOUBLE * n::DOUBLE - src::DOUBLE) * 1e6) AS BIGINT)
                END AS kappa_micro
         FROM b CROSS JOIN rc""",
    // the melt of the zero-filled pivot = the user × type count grid
    "q164_melt" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
         t AS (SELECT unnest(['click','error','purchase','signup','view']) AS event_type),
         c AS (SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n_events
               FROM events GROUP BY 1, 2)
         SELECT u.user_id, t.event_type, COALESCE(c.n_events, 0) AS n_events
         FROM u CROSS JOIN t
         LEFT JOIN c ON c.user_id = u.user_id AND c.event_type = t.event_type
         ORDER BY u.user_id, t.event_type""",
    // the same md5(key:shard) weights, argmax replayed as a ranked window
    "q165_rendezvous" ->
      """WITH g AS (SELECT doc_id, j,
                md5(doc_id::VARCHAR || ':' || j::VARCHAR) AS w
              FROM documents CROSS JOIN generate_series(0, 7) AS t(j)),
         r AS (SELECT doc_id, j, row_number() OVER (
                 PARTITION BY doc_id ORDER BY w DESC, j) AS rn FROM g)
         SELECT doc_id, CAST(j AS BIGINT) AS shard
         FROM r WHERE rn = 1 ORDER BY doc_id""",
    // same quantize-then-sum contract as q91; term order matches the Spark
    // expression tree term-for-term
    "q94_domain_kl" ->
      """WITH toks AS (SELECT source,
                unnest(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), '\s+')) AS token
              FROM documents),
         dt AS (SELECT source, token, count(*) AS cst FROM toks GROUP BY source, token),
         ds AS (SELECT source, CAST(sum(cst) AS BIGINT) AS ts FROM dt GROUP BY source),
         ct AS (SELECT token, CAST(sum(cst) AS BIGINT) AS ctok FROM dt GROUP BY token),
         tt AS (SELECT CAST(sum(ctok) AS BIGINT) AS ttot FROM ct),
         term AS (SELECT dt.source,
                         CAST(round((ln(cst) - ln(ts) - ln(ctok) + ln(ttot)) * cst * 1000000) AS BIGINT) AS term_micro,
                         ts
                  FROM dt JOIN ct USING (token) JOIN ds USING (source) CROSS JOIN tt)
         SELECT source, max(ts) AS n_tokens, CAST(sum(term_micro) AS BIGINT) AS kl_sum_micro
         FROM term GROUP BY source ORDER BY source""",
    // A-ES key ln(u)/w re-derived from the same md5 hash. u = (h60+1)/2^60
    // is NOT exact (h60 has 60 bits, a double mantissa 53): both engines
    // apply the same IEEE round-to-nearest-even when casting the identical
    // 60-bit integer, then an exact power-of-two division — determinism
    // rests on identical rounding, not exactness (ADVICE r5). Keys of
    // distinct docs are far beyond ulp apart, id tie-break totalizes
    "q95_weighted_sample" ->
      """WITH h AS (
           SELECT doc_id, n_chars,
                  list_sum([ (instr('0123456789abcdef', substr(md5(doc_id::VARCHAR), k, 1)) - 1)
                             * pow(16, 15 - k)::BIGINT for k in range(1, 16)])::BIGINT AS h60
           FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0),
         r AS (SELECT doc_id, n_chars,
                      row_number() OVER (ORDER BY ln((h60 + 1) / pow(2, 60)) / n_chars DESC, doc_id) AS rk
               FROM h)
         SELECT doc_id, n_chars FROM r WHERE rk <= 50 ORDER BY doc_id""",
    // frozen-LM split re-derived from the same md5 hash band; unseen tokens
    // coalesce to count 0 → ln(1) = 0 → the full ln(T+V) surprisal
    "q96_delta_surprisal" ->
      """WITH h AS (
           SELECT doc_id, text,
                  list_sum([ (instr('0123456789abcdef', substr(md5(doc_id::VARCHAR), k, 1)) - 1)
                             * pow(16, 15 - k)::BIGINT for k in range(1, 16)])::BIGINT AS h60
           FROM documents),
         corpus AS (SELECT text FROM h WHERE h60 >= CAST(0.1 * pow(2, 60) AS BIGINT)),
         delta AS (SELECT doc_id, text FROM h WHERE h60 < CAST(0.1 * pow(2, 60) AS BIGINT)),
         ctoks AS (SELECT unnest(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), '\s+')) AS token
                   FROM corpus),
         counts AS (SELECT token, count(*) AS c FROM ctoks GROUP BY token),
         tot AS (SELECT CAST(sum(c) AS BIGINT) AS T, count(*) AS V FROM counts),
         dtoks AS (SELECT doc_id,
                          unnest(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), '\s+')) AS token
                   FROM delta),
         per AS (SELECT doc_id, CAST(round(ln(coalesce(c, 0) + 1) * 1000000) AS BIGINT) AS s_micro
                 FROM dtoks LEFT JOIN counts USING (token)),
         agg AS (SELECT doc_id, count(*) AS n_tok, CAST(sum(s_micro) AS BIGINT) AS sum_c_micro
                 FROM per GROUP BY doc_id)
         SELECT doc_id, n_tok,
                n_tok * CAST(round(ln(T + V) * 1000000) AS BIGINT) - sum_c_micro AS surprisal_micro
         FROM agg, tot ORDER BY doc_id""",
    // same contribution tree as q92, fanned out per query via the q join;
    // top-10 per query by (score, doc id)
    "q97_bm25_multi" ->
      """WITH q AS (SELECT * FROM (VALUES ('q1', 'spark'), ('q1', 'join'),
                                          ('q2', 'window'), ('q2', 'merge'), ('q2', 'sort'))
                    AS t(query_id, token)),
         toks AS (SELECT doc_id,
                unnest(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), '\s+')) AS token
              FROM documents),
         dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
         corpus AS (SELECT count(*) AS N, CAST(sum(dl) AS BIGINT) AS TT FROM dl),
         tf AS (SELECT doc_id, token, count(*) AS tf FROM toks
                WHERE token IN (SELECT token FROM q) GROUP BY doc_id, token),
         dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
         contrib AS (SELECT tf.doc_id, tf.token,
                            CAST(round(ln(1.0 + (N - df + 0.5) / (df + 0.5)) * tf * 2.2
                                 / (tf + 1.2 * (0.25 + 0.75 * dl / (TT::DOUBLE / N))) * 1000000) AS BIGINT) AS c_micro
                     FROM tf JOIN dfreq USING (token) JOIN dl USING (doc_id), corpus),
         sel AS (SELECT q.query_id, c.doc_id, count(*) AS n_hit_terms,
                        CAST(sum(c.c_micro) AS BIGINT) AS score_micro
                 FROM contrib c JOIN q USING (token) GROUP BY 1, 2),
         r AS (SELECT query_id, doc_id, n_hit_terms, score_micro,
                      row_number() OVER (PARTITION BY query_id
                                         ORDER BY score_micro DESC, doc_id) AS rank
               FROM sel)
         SELECT query_id, doc_id, n_hit_terms, score_micro, rank FROM r
         WHERE rank <= 10 ORDER BY query_id, rank""",
    // DSIR replay: unigram+bigram features → md5-60-bit bucket % 65536,
    // add-one models over the bucket space, q94's four-ln tree rounded
    // once per (doc, bucket), A-ES log-space key from the q95 h60 uniform
    "q111_dsir_select" ->
      """WITH tok AS (SELECT doc_id, lang,
                string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), '\s+') AS ts
              FROM documents),
         feats AS (
           SELECT doc_id, lang, unnest(ts) AS f FROM tok
           UNION ALL
           SELECT doc_id, lang, unnest([ts[i] || ' ' || ts[i+1] for i in range(1, len(ts))]) AS f
           FROM tok WHERE len(ts) >= 2),
         fb AS (SELECT doc_id, lang,
                       (list_sum([ (instr('0123456789abcdef', substr(md5(f), k, 1)) - 1)
                                   * pow(16, 15 - k)::BIGINT for k in range(1, 16)])::BIGINT % 65536) AS bucket
                FROM feats),
         rfc AS (SELECT doc_id, bucket, count(*) AS c FROM fb WHERE lang <> 'en' GROUP BY 1, 2),
         tb AS (SELECT bucket, count(*) AS ct FROM fb WHERE lang = 'en' GROUP BY 1),
         rb AS (SELECT bucket, CAST(sum(c) AS BIGINT) AS cr FROM rfc GROUP BY 1),
         tt AS (SELECT CAST(coalesce(sum(ct), 0) AS BIGINT) AS tot_t FROM tb),
         rt AS (SELECT CAST(coalesce(sum(cr), 0) AS BIGINT) AS tot_r FROM rb),
         w AS (SELECT rfc.doc_id, CAST(sum(c) AS BIGINT) AS n_feats,
                      CAST(sum(CAST(round((ln(coalesce(ct, 0) + 1) - ln(tot_t + 65536)
                                           - ln(cr + 1) + ln(tot_r + 65536)) * c * 1000000) AS BIGINT)) AS BIGINT) AS logw_micro
               FROM rfc LEFT JOIN tb USING (bucket) JOIN rb USING (bucket)
               CROSS JOIN tt CROSS JOIN rt
               GROUP BY rfc.doc_id),
         h AS (SELECT doc_id, n_feats, logw_micro,
                      list_sum([ (instr('0123456789abcdef', substr(md5(doc_id::VARCHAR), k, 1)) - 1)
                                 * pow(16, 15 - k)::BIGINT for k in range(1, 16)])::BIGINT AS h60
               FROM w),
         sel AS (SELECT doc_id, n_feats, logw_micro,
                        row_number() OVER (ORDER BY ln(-ln(least((h60 + 1) / pow(2, 60), 1 - pow(2::DOUBLE, -53)))) - logw_micro / 1000000.0,
                                           doc_id) AS rk
                 FROM h)
         SELECT doc_id, n_feats, logw_micro FROM sel WHERE rk <= 50 ORDER BY doc_id""",
    // RRF fusion: q97's BM25 tree (BIGINT query ids) + q32's LSH top-k
    // chain, fused with the same exact integer floor(1e9/(60+rank)) sums
    // as Search.fuseRrf; ties by ascending doc id
    "q108_hybrid_rrf" ->
      s"""WITH $sqlVecs, ${sqlLshBuckets(16)}, $sqlLshProbes, $sqlLshTopK,
         q AS (SELECT CAST(qid AS BIGINT) AS query_id, token
               FROM (VALUES (0, 'spark'), (0, 'join'),
                            (1, 'window'), (1, 'merge'), (1, 'sort')) AS t(qid, token)),
         toks AS (SELECT doc_id,
                unnest(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), '\\s+')) AS token
              FROM documents),
         dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
         corpus AS (SELECT count(*) AS N, CAST(sum(dl) AS BIGINT) AS TT FROM dl),
         tf AS (SELECT doc_id, token, count(*) AS tf FROM toks
                WHERE token IN (SELECT token FROM q) GROUP BY doc_id, token),
         dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
         contrib AS (SELECT tf.doc_id, tf.token,
                            CAST(round(ln(1.0 + (N - df + 0.5) / (df + 0.5)) * tf * 2.2
                                 / (tf + 1.2 * (0.25 + 0.75 * dl / (TT::DOUBLE / N))) * 1000000) AS BIGINT) AS c_micro
                     FROM tf JOIN dfreq USING (token) JOIN dl USING (doc_id), corpus),
         sel AS (SELECT q.query_id, c.doc_id, CAST(sum(c.c_micro) AS BIGINT) AS score_micro
                 FROM contrib c JOIN q USING (token) GROUP BY 1, 2),
         bm AS (SELECT query_id, doc_id, rank FROM (
                  SELECT query_id, doc_id,
                         row_number() OVER (PARTITION BY query_id
                                            ORDER BY score_micro DESC, doc_id) AS rank
                  FROM sel) t WHERE rank <= 10),
         ann AS (SELECT CAST(query_id AS BIGINT) AS query_id, nbr_id AS doc_id, rank
                 FROM lsh_k WHERE query_id IN (0, 1)),
         allc AS (SELECT query_id, doc_id, 1000000000 // (60 + rank) AS rrf_nano FROM bm
                  UNION ALL
                  SELECT query_id, doc_id, 1000000000 // (60 + rank) FROM ann),
         fused AS (SELECT query_id, doc_id, count(*) AS n_lists,
                          CAST(sum(rrf_nano) AS BIGINT) AS rrf_nano
                   FROM allc GROUP BY 1, 2)
         SELECT query_id, doc_id, n_lists, rrf_nano,
                CAST(row_number() OVER (PARTITION BY query_id
                                        ORDER BY rrf_nano DESC, doc_id) AS BIGINT) AS rank
         FROM fused QUALIFY rank <= 10 ORDER BY query_id, rank""",
    "q98_weighted_per_group" ->
      """WITH h AS (
           SELECT doc_id, lang, n_chars,
                  list_sum([ (instr('0123456789abcdef', substr(md5(doc_id::VARCHAR), k, 1)) - 1)
                             * pow(16, 15 - k)::BIGINT for k in range(1, 16)])::BIGINT AS h60
           FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0),
         r AS (SELECT doc_id, lang, n_chars,
                      row_number() OVER (PARTITION BY lang
                        ORDER BY ln((h60 + 1) / pow(2, 60)) / n_chars DESC, doc_id) AS rk
               FROM h)
         SELECT doc_id, lang, n_chars FROM r WHERE rk <= 5 ORDER BY doc_id""",
    "q99_returned_revenue" ->
      """SELECT o_custkey AS c_custkey, c_name, n_name,
                CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         WHERE l_returnflag = 'R'
         GROUP BY 1, 2, 3
         ORDER BY revenue_cents DESC, c_custkey LIMIT 20""",
    // bigram positions = two parallel array slices zipped (DuckDB zips
    // same-length unnests); same quantize-then-sum contract as q91
    "q100_bigram_surprisal" ->
      """WITH toks AS (SELECT doc_id,
                string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), '\s+') AS w
              FROM documents),
         uni AS (SELECT count(DISTINCT t) AS V FROM (SELECT unnest(w) AS t FROM toks)),
         bg AS (SELECT doc_id, unnest(w[1:len(w)-1]) AS w1, unnest(w[2:len(w)]) AS w2
                FROM toks WHERE len(w) >= 2),
         c2 AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY 1, 2),
         c1 AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c1 FROM c2 GROUP BY 1),
         per AS (SELECT doc_id,
                        CAST(round(ln(c1 + V) * 1000000) AS BIGINT)
                          - CAST(round(ln(c2 + 1) * 1000000) AS BIGINT) AS s_micro
                 FROM bg JOIN c2 USING (w1, w2) JOIN c1 USING (w1), uni)
         SELECT doc_id, count(*) AS n_bigrams, CAST(sum(s_micro) AS BIGINT) AS surprisal_micro
         FROM per GROUP BY doc_id ORDER BY doc_id""",
    "q101_cohort_retention" ->
      """WITH f AS (SELECT user_id, min(ts) AS ft FROM events GROUP BY user_id)
         SELECT CAST(date_trunc('week', ft) AS DATE) AS cohort_week,
                CAST(floor(date_diff('day', CAST(ft AS DATE), CAST(ts AS DATE)) / 7) AS BIGINT) AS week_offset,
                count(DISTINCT e.user_id) AS n_active
         FROM events e JOIN f USING (user_id)
         GROUP BY 1, 2 ORDER BY cohort_week, week_offset""",
    // exact-kNN vote replay: same quantized cosine and (votes desc, label)
    // tie rule as Similarity.knnClassify
    "q102_knn_classify" ->
      """WITH v AS (SELECT vec_id,
                           [round(x::DOUBLE * 1000)::BIGINT for x in embedding] AS q,
                           list_sum([round(x::DOUBLE * 1000)::BIGINT * round(x::DOUBLE * 1000)::BIGINT for x in embedding]) AS nn
                    FROM embeddings),
         knn AS (SELECT query_id, nbr_id FROM (
                   SELECT q.vec_id AS query_id, c.vec_id AS nbr_id,
                          row_number() OVER (PARTITION BY q.vec_id
                            ORDER BY list_sum([p[1] * p[2] for p in list_zip(q.q, c.q)])::DOUBLE
                                       / NULLIF(sqrt(q.nn::DOUBLE) * sqrt(c.nn::DOUBLE), 0) DESC,
                                     c.vec_id) AS rank
                   FROM v q JOIN v c ON q.vec_id < 50 AND q.vec_id <> c.vec_id) t
                 WHERE rank <= 5),
         votes AS (SELECT query_id, label, count(*) AS n_votes
                   FROM knn JOIN embeddings ON nbr_id = vec_id GROUP BY 1, 2)
         SELECT query_id, label AS pred_label, n_votes FROM (
           SELECT query_id, label, n_votes,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY n_votes DESC, label) AS rk
           FROM votes) t WHERE rk = 1 ORDER BY query_id""",
    "q103_window_breadth" ->
      """SELECT o_orderkey, o_orderpriority,
                CAST(ntile(4) OVER w AS BIGINT) AS quartile,
                percent_rank() OVER w AS pr,
                cume_dist() OVER w AS cd
         FROM orders
         WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
         ORDER BY o_orderkey""",
    "q104_promo_share" ->
      """SELECT p_brand,
                CAST(sum(CASE WHEN p_type = 'PROMO'
                         THEN CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS promo_cents,
                CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS total_cents,
                count(DISTINCT p_partkey) AS n_parts
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY p_brand ORDER BY p_brand""",
    // the HLL estimate is engine-specific: the oracle checks the EXACT
    // column and emits TRUE for the bound column (Spark asserts the bound)
    "q106_window_distinct" ->
      """SELECT epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS window_start_us,
                count(DISTINCT user_id) AS n_distinct_exact,
                TRUE AS approx_ok
         FROM events GROUP BY 1 ORDER BY window_start_us""",
    "q105_percentiles_multi" ->
      """WITH x AS (SELECT l_returnflag, CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
                    FROM lineitem WHERE l_extendedprice IS NOT NULL),
         r AS (SELECT l_returnflag, cents,
                      row_number() OVER (PARTITION BY l_returnflag ORDER BY cents) AS rn,
                      count(*) OVER (PARTITION BY l_returnflag) AS cnt
               FROM x)
         SELECT l_returnflag,
                max(CASE WHEN rn = greatest(1, CAST(ceil(CAST(0.5 AS DOUBLE) * cnt) AS BIGINT)) THEN cents END) AS p50_cents,
                max(CASE WHEN rn = greatest(1, CAST(ceil(CAST(0.9 AS DOUBLE) * cnt) AS BIGINT)) THEN cents END) AS p90_cents,
                max(CASE WHEN rn = greatest(1, CAST(ceil(CAST(0.99 AS DOUBLE) * cnt) AS BIGINT)) THEN cents END) AS p99_cents
         FROM r GROUP BY l_returnflag ORDER BY l_returnflag""",
    // exact percentiles replayed (q105's tree); the KLL bracket booleans
    // are asserted Spark-side and emitted TRUE here (q64's contract for
    // merge-tree-specific sketch values)
    "q110_kll_quantiles" ->
      """WITH x AS (SELECT l_returnflag, CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
                    FROM lineitem WHERE l_extendedprice IS NOT NULL),
         r AS (SELECT l_returnflag, cents,
                      row_number() OVER (PARTITION BY l_returnflag ORDER BY cents) AS rn,
                      count(*) OVER (PARTITION BY l_returnflag) AS cnt
               FROM x)
         SELECT l_returnflag,
                max(CASE WHEN rn = greatest(1, CAST(ceil(CAST(0.5 AS DOUBLE) * cnt) AS BIGINT)) THEN cents END) AS p50_cents,
                max(CASE WHEN rn = greatest(1, CAST(ceil(CAST(0.9 AS DOUBLE) * cnt) AS BIGINT)) THEN cents END) AS p90_cents,
                max(CASE WHEN rn = greatest(1, CAST(ceil(CAST(0.99 AS DOUBLE) * cnt) AS BIGINT)) THEN cents END) AS p99_cents,
                TRUE AS ok_p50, TRUE AS ok_p90, TRUE AS ok_p99
         FROM r GROUP BY l_returnflag ORDER BY l_returnflag""",
    // the same explicit type-7 tree: h = p·(n−1), bracketing values by
    // integer rank, vlo + frac·(vhi − vlo), micro-rounded once. The 0.95
    // literal is cast to DOUBLE so DuckDB evaluates the identical IEEE
    // double tree as Spark rather than exact DECIMAL arithmetic (ADVICE r5:
    // the decimal path could round p95_microcents differently by 1 once
    // n_rows × bracket-gap grows past ~1e10)
    "q107_percentile_cont" ->
      """WITH x AS (SELECT l_returnflag, CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
                    FROM lineitem WHERE l_extendedprice IS NOT NULL),
         r AS (SELECT l_returnflag, cents,
                      row_number() OVER (PARTITION BY l_returnflag ORDER BY cents) AS rn,
                      CAST(0.95 AS DOUBLE) * (count(*) OVER (PARTITION BY l_returnflag) - 1) AS h
               FROM x),
         a AS (SELECT l_returnflag,
                      max(CASE WHEN rn = CAST(floor(h) AS BIGINT) + 1 THEN cents END) AS vlo,
                      max(CASE WHEN rn = CAST(floor(h) AS BIGINT) + 2 THEN cents END) AS vhi,
                      max(h - floor(h)) AS frac
               FROM r GROUP BY l_returnflag)
         SELECT l_returnflag,
                CAST(round((vlo + frac * (coalesce(vhi, vlo) - vlo)) * 1000000) AS BIGINT) AS p95_microcents
         FROM a ORDER BY l_returnflag""",
  )

  /** DuckDB twin of q93: the same fixed-point micro-unit PageRank unrolled
    * as `iters` chained CTE pairs (contribs, ranks) — every arithmetic step
    * mirrors [[graft.operators.Graph.pageRank]] exactly (BIGINT transfer
    * floors, BIGINT sums, floored base), so the result hash-matches. */
  /** Unrolled synchronous label-propagation rounds over the q131
    * co-purchase graph: each round votes ONLY onto not-yet-labeled nodes
    * and argmaxes by (count DESC, label ASC) — Graph.labelPropagation's
    * label-once frontier, term for term. */
  /** q154 oracle: the q131 co-purchase edge CTE + [[Graph.kCore]]'s peel
    * unrolled round-for-round (degree, survivors, filtered edges). */
  private def kcoreOracleSql(k: Int, rounds: Int): String = {
    val head =
      """WITH pairs AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2
             FROM lineitem a JOIN lineitem b
               ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
         e0 AS (SELECT p1 AS eu, p2 AS ev FROM pairs
                GROUP BY p1, p2 HAVING count(*) >= 2)"""
    val peel = (1 to rounds).map { i =>
      s""",
         d$i AS (SELECT node, count(*) AS deg FROM (
                 SELECT eu AS node FROM e${i - 1}
                 UNION ALL SELECT ev FROM e${i - 1}) u GROUP BY node),
         a$i AS (SELECT node FROM d$i WHERE deg >= $k),
         e$i AS (SELECT eu, ev FROM e${i - 1}
                 WHERE eu IN (SELECT node FROM a$i)
                   AND ev IN (SELECT node FROM a$i))"""
    }.mkString
    head + peel +
      s"""
         SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
           SELECT eu AS node FROM e$rounds
           UNION ALL SELECT ev FROM e$rounds) u
         GROUP BY node ORDER BY node"""
  }

  private def lpaOracleSql(iters: Int): String = {
    val head =
      """WITH pairs AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2
             FROM lineitem a JOIN lineitem b
               ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
         e0 AS (SELECT p1, p2 FROM pairs GROUP BY p1, p2 HAVING count(*) >= 2),
         e AS (SELECT p1 AS src, p2 AS dst FROM e0 UNION SELECT p2, p1 FROM e0),
         l0 AS (SELECT p_partkey AS node, p_brand AS label, CAST(0 AS BIGINT) AS round
                FROM part WHERE p_partkey % 23 = 0)"""
    val rounds = (1 to iters).map { i =>
      s""",
         v$i AS (SELECT e.dst AS cand, l.label, count(*) AS n
               FROM l${i - 1} l JOIN e ON l.node = e.src
               WHERE e.dst NOT IN (SELECT node FROM l${i - 1})
               GROUP BY 1, 2),
         n$i AS (SELECT cand AS node, label, CAST($i AS BIGINT) AS round FROM (
                 SELECT cand, label,
                        row_number() OVER (PARTITION BY cand ORDER BY n DESC, label) AS rn
                 FROM v$i) t WHERE rn = 1),
         l$i AS (SELECT * FROM l${i - 1} UNION ALL SELECT * FROM n$i)"""
    }.mkString
    head + rounds +
      s"\n         SELECT node, label, round FROM l$iters ORDER BY node"
  }

  /** [[pagerankOracleSql]]'s personalized twin: identical unrolled rounds,
    * but r0 and the per-round base are gated to the seed set (nation-0
    * suppliers) and scaled by |S| instead of N. */
  private def pprOracleSql(iters: Int): String = {
    val head =
      """WITH e0 AS (SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
                     FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
         seeds AS (SELECT s_suppkey * 2 + 1 AS node FROM supplier WHERE s_nationkey = 0),
         nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e UNION SELECT node FROM seeds),
         deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
         ss AS (SELECT count(*) AS S FROM seeds),
         r0 AS (SELECT nodes.node,
                     CASE WHEN sd.node IS NOT NULL
                          THEN CAST(floor(1000000 / S) AS BIGINT)
                          ELSE CAST(0 AS BIGINT) END AS r
               FROM nodes CROSS JOIN ss LEFT JOIN seeds sd ON sd.node = nodes.node)"""
    val iterations = (1 to iters).map { i =>
      s""",
         c$i AS (SELECT e.dst AS node,
                      CAST(sum(CAST(floor(p.r * 85 / (100 * deg.outdeg)) AS BIGINT)) AS BIGINT) AS inm
               FROM r${i - 1} p JOIN e ON p.node = e.src JOIN deg ON deg.src = e.src
               GROUP BY e.dst),
         r$i AS (SELECT nodes.node,
                      CASE WHEN sd.node IS NOT NULL
                           THEN CAST(floor(15000000 / (100 * S)) AS BIGINT)
                           ELSE CAST(0 AS BIGINT) END
                        + coalesce(c$i.inm, CAST(0 AS BIGINT)) AS r
               FROM nodes CROSS JOIN ss
                    LEFT JOIN seeds sd ON sd.node = nodes.node
                    LEFT JOIN c$i ON c$i.node = nodes.node)"""
    }.mkString
    head + iterations +
      s"\n         SELECT node, r AS rank_micro FROM r$iters ORDER BY rank_micro DESC, node LIMIT 20"
  }

  private def pagerankOracleSql(iters: Int): String = {
    val head =
      """WITH e0 AS (SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
                     FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
         nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
         nn AS (SELECT count(*) AS N FROM nodes),
         r0 AS (SELECT node, CAST(floor(1000000 / N) AS BIGINT) AS r FROM nodes CROSS JOIN nn)"""
    val iterations = (1 to iters).map { i =>
      s""",
         c$i AS (SELECT e.dst AS node,
                      CAST(sum(CAST(floor(p.r * 85 / (100 * deg.outdeg)) AS BIGINT)) AS BIGINT) AS inm
               FROM r${i - 1} p JOIN e ON p.node = e.src JOIN deg ON deg.src = e.src
               GROUP BY e.dst),
         r$i AS (SELECT nodes.node,
                      CAST(floor(15000000 / (100 * N)) AS BIGINT)
                        + coalesce(c$i.inm, CAST(0 AS BIGINT)) AS r
               FROM nodes CROSS JOIN nn LEFT JOIN c$i ON c$i.node = nodes.node)"""
    }.mkString
    head + iterations +
      s"\n         SELECT node, r AS rank_micro FROM r$iters ORDER BY rank_micro DESC, node LIMIT 20"
  }
}
