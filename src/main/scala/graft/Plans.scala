package graft

/** Physical-plan audit: prints `explain("formatted")` for representative
  * queries so scan pushdown, join strategy, and WholeStageCodegen spans can
  * be reviewed. Run: `sbt "runMain graft.Plans [sfDir] [query...]"`. */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq
      else Seq("q01_filters", "q10_join_inner", "q22_pricing_summary",
        "q00_compare_pipeline", "q29_minhash_lsh", "q31_ann_bruteforce",
        // round-4 operators: relational repetition aggs, single-exchange
        // profiler, one-shuffle nearest as-of, budget-sample window
        "q61_repetition", "q63_budget_sample", "q67_asof_nearest", "q68_profile",
        // round-5 operators: substring window index joins, delta banding,
        // boilerplate doc-frequency anti-join
        "q69_substring_dup", "q73_substring_spans", "q72_delta_dedup",
        "q71_boilerplate_lines",
        // late-round-5 operators: inverted-index sparse cosine, broadcast
        // value→bin map, one-window stratified sample, salted join
        "q83_sparse_cosine", "q84_quantile_bins", "q85_stratified_sample",
        "q86_salted_join",
        // r5 batch 2: shuffle-free chunk explode, vocab-join LM scoring,
        // postings-pruned BM25, iterated-join PageRank
        "q90_chunk_sliding", "q91_unigram_surprisal", "q92_bm25",
        "q93_pagerank", "q94_domain_kl",
        // r6: RRF fusion, incremental CC over a shared MinHash index,
        // sketch-probe heavy hitters, DSIR selection (q83's rewritten
        // Bayardo prefix-index plan is audited via its entry above)
        "q108_hybrid_rrf", "q109_incremental_cc",
        "q111_dsir_select", "q112_heavy_hitters",
        // r7: delta↔corpus embedding banding through the stored-index
        // shape, semantic dedup composite (pairs → CC → keepBy window),
        // the composed IVF-PQ index
        "q115_embedding_delta", "q116_semantic_dedup", "q119_ivfpq_topk",
        // r8: stored-index search (train/persist/load/search), the
        // postings-index BM25 lookup, predicate-gated filtered ANN, and
        // the standing-index hybrid fusion
        "q120_ivfpq_indexed", "q123_bm25_indexed", "q125_ann_filtered",
        "q126_hybrid_indexed",
        // r8b: the bloom predicate must sit ON the lineitem scan, below
        // the join's exchange (the whole point of the primitive)
        "q129_bloom_join",
        // r9: signature-probe against the standing fuzzy dictionary, the
        // group-keyed centroid join (must broadcast the tiny centroid
        // side), and the seed-gated iterated-join walk
        "q136_fuzzy_index", "q137_centroid_outliers",
        "q138_personalized_pagerank", "q139_label_propagation",
        // r9 batch 2: the two-level prefix sum must show NO data-sized
        // single-partition window (only the bucket frame sorts globally);
        // melt must plan an Expand (not a Generate); decontaminate must
        // BROADCAST the benchmark shingle side; the JW rescore must sit
        // inside WholeStageCodegen on the joined pair frame
        "q153_roc_auc", "q157_concentration", "q164_melt",
        "q169_decontaminate", "q163_jw_rerank", "q171_ks_drift",
        // r10: the shared Ranks two-level shapes in the ported operators
        // (keySkew's count-value collapse; q84 above now shows the
        // range-bucketed bins) and the unigram DP — the Viterbi must be
        // ONE projection over the broadcast cost map, not a join chain
        "q148_key_skew", "q196_unigram_train", "q197_unigram_encode",
        // r10 continuation: the rank tests must window only the level
        // frame (bucket-partitioned, never data-sized single-partition);
        // grouped MW adds the segment to every window key; WordPiece
        // encode must be ONE broadcast-map projection over distinct
        // words (no join chain), its train loop vocab-sized
        "q200_mann_whitney", "q205_mw_by_group", "q203_wordpiece_encode",
        // ANOVA must be pure hash-aggs (no window at all); Brown-Forsythe
        // adds only the block/group-partitioned median windows
        "q210_anova", "q211_brown_forsythe",
        // r11: BFS joins must stream the cached src-sorted edge side (no
        // per-round exchange on it); EWMA and paths are ONE key-partitioned
        // window + hash-aggs (no global sort before the final top-k);
        // prototypicality reuses the broadcast-centroid assignment and
        // windows only per cell
        "q212_bfs_hops", "q213_ewma", "q214_top_paths",
        "q215_prototypicality",
        // r11 batch 2: basket lift must Apriori-prune BEFORE the basket
        // self-join (item-count semi-join below the pair exchange);
        // rolling median is one bounded-frame key window; tfidf is
        // posting joins + a doc-partitioned top-k window
        "q217_basket_lift", "q218_rolling_median", "q219_tfidf_terms",
        // r11 batch 3: diversity must be explode + hash-aggs ONLY (the
        // whole point is no pair join — any BroadcastNestedLoop/cartesian
        // here is a regression)
        "q220_embedding_diversity",
        // r12 (re-based r15, VERDICT r14 next #1): the component split
        // must be a stateless projection over a plain parquet SCAN of the
        // standing label store - no LSH, no contraction, no join anywhere
        // in the plan (the build runs once, outside these plans); session paths
        // must reuse ONE user exchange across the three windows (the
        // (key, session) rank rides the key hash partitioning); the dense
        // growth spine is an agg-derived explode, never a row-sized sort;
        // the group sample and winsorized bounds are WindowGroupLimit /
        // bucket-cell windows, never data-sized single partitions
        "q223_leak_safe_split", "q224_session_paths",
        "q225_period_growth_gapped", "q226_group_sample",
        "q227_winsorized_mean",
        // r12 batch 2: the weighted sample must be the same
        // WindowGroupLimit rank-filter as q226 (the key is a projection,
        // never a join); the funnel must be per-step shrinking equi-joins
        // + hash-aggs with no window at all
        "q229_weighted_sample", "q230_funnel_within",
        // the split-leakage audit (re-based r15): both the labels and the
        // pair table must be parquet scans of the standing store - two
        // 1-row aggs over label-attach joins, no LSH re-derivation
        "q228_split_leakage_audit",
        // r13 (re-based r15): the k-fold label must be a stateless
        // projection over the label-store SCAN (q223's shape with a
        // k-arm CASE — no extra shuffle, no LSH/contraction);
        // retention must collapse events map-side to distinct (key,
        // period) then window THAT table (no window over raw events);
        // fraction sampling must be a broadcast join + codegen'd filter
        // (no exchange of the fact side, no window at all)
        "q231_group_kfold", "q232_retention_cohorts",
        "q233_sample_fractions",
        // r13 batch 2: Fleiss must be hash-aggs over the (item, category)
        // cell table only (broadcast 1-row frames, no window, no join
        // against raw ratings); Bradley-Terry's game window partitions by
        // user and each MM round joins the PINNED edge table against the
        // |items|-sized strength frame (never a rounds-deep lazy plan)
        "q234_fleiss_kappa", "q235_bradley_terry",
        // r13 batch 3: conformal rides the winsorize bucket-cell shape
        // (no data-sized single-partition window); centroid drift is two
        // explode+hash-agg centroid passes + a |groups|-sized join (no
        // pairwise anything); incremental retention folds the standing
        // (key, period) store — the matrix tail never re-reads events
        "q236_conformal_threshold", "q237_centroid_drift",
        "q238_retention_incremental",
        // zipf alpha must be explode + two hash-aggs with the ln term
        // inside the partial agg (map-side combine) — no window, no sort
        "q239_zipf_alpha",
        // r14: the reliability bins are ONE map-side-combined hash-agg
        // from data-sized rows to ≤ nBins rows (no window, no join); the
        // summary adds a second row-agg for Brier and broadcasts two
        // 1-row frames — nothing data-sized beyond the two scans
        "q240_reliability_bins", "q241_calibration_summary",
        // r14 batch 2: the time split is a stateless codegen'd CASE on
        // the row's own timestamp (no shuffle, no join); the audit is two
        // filtered 1-row aggs over the same scan — nothing data-sized
        // beyond the two scans, no window anywhere
        "q242_time_split", "q243_time_split_audit",
        // r14 batch 3: calendar retention must be the q232 one-exchange
        // shape on the integer month index (collect_set map-side dedup,
        // make_date only on the tiny matrix — no window over raw rows)
        "q244_retention_calendar",
        // r14 batch 4: the BT store fold must be two hash-aggs (batch
        // collapse + state re-agg, never a re-read of historical games);
        // the readout MM rounds run on the pinned pair-derived edges
        "q245_bt_incremental",
        // the store-readout split must be the stateless q223 projection
        // over a plain parquet scan of the label table - no LSH, no
        // contraction, no join anywhere downstream of the load
        "q246_component_store",
        // media dims must be ONE typed mapPartitions chain over the doc
        // scan - no shuffle, no join, no exchange anywhere
        "q247_media_dims",
        // r14 batch 5: quantile bins ride the conformal/winsorize
        // two-level rank shape (bucket-frame + per-bucket windows only,
        // never a data-sized single partition); the decomposition is the
        // q240 bin hash-agg + one <= nBins-row agg
        "q248_reliability_quantile", "q249_brier_decomposition",
        // the PAVA minimax runs entirely on the <= nBins bin table (its
        // windows and self-joins are parameter-bounded, never data-sized)
        "q250_isotonic_calibration",
        // Neyman is ONE map-side agg to the |strata| table; the Hamilton
        // windows run on that tiny frame (no data-sized window or join)
        "q251_neyman_allocation",
        // capped apportionment: rounds run on the pinned |groups| frame
        // (one data-sized agg total; never a rounds-deep lazy plan)
        "q252_apportion_capped",
        // target encoding: ONE map-side hash-agg to the cats x folds cell
        // table; densify/totals/joins all run on cell-sized frames
        "q253_target_encoding",
        // JSD is two explode+hash-agg token tables + one vocab-sized
        // full-outer join + broadcast totals - no window, no data-sized
        // pass after the two token collapses (r15: the vocab table is
        // pinned once; each corpus explodes exactly once)
        "q254_domain_jsd",
        // r15: the applied remap must be ONE broadcast join of the
        // <= nBins table against the row scan (no shuffle of the data
        // side); both summaries stay bin hash-agg + row-agg shapes
        "q255_isotonic_apply",
        // per-group calibration is ONE (group, bin)-keyed map-side
        // hash-agg carrying the Brier residual sum - no second row scan,
        // no window, the rollup runs on the |groups| x nBins cell table
        "q256_calibration_by_group",
        // the calibration store fold must be two hash-aggs (batch
        // collapse + <= 2 nBins state re-agg); the readout is a stateless
        // projection on the state - history is never re-read
        "q257_calibration_ingest",
        // av header metadata must be ONE typed mapPartitions chain over
        // the doc scan (the q247 shape) - no shuffle, no join anywhere
        "q258_av_header_dims",
        // Platt: the bin hash-agg is the only data-sized node; the 6
        // Newton rounds are tiny jobs on the pinned <= nBins bin table
        // (a rounds-deep plan over raw rows would be a regression)
        "q259_platt_scaling")
    val spark = GraftSession.local("8", "graft-plans")
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
