package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.Text

/** Deduplication for large-scale text corpora (north-star extension,
  * SURVEY §2.1 ✚): exact, n-gram Jaccard, MinHash+LSH banding, SimHash,
  * and near-dup-pair → group resolution.
  *
  * Algorithms are the published standards: MinHash (Broder, "On the
  * resemblance and containment of documents", 1997) with banding LSH
  * (Leskovec/Rajaraman/Ullman, MMDS ch. 3) and Kirsch–Mitzenmacher double
  * hashing ("Less hashing, same performance", 2006); SimHash (Charikar,
  * "Similarity estimation techniques from rounding algorithms", 2002);
  * prefix filtering for exact set-similarity joins (Chaudhuri et al. 2006;
  * Xiao et al., PPJoin, 2008).
  *
  * Scale design: every variant avoids the O(N²) cross join. Candidate pairs
  * come either from an inverted index on shingle prefixes (docs sharing ≥1
  * indexed shingle) or from LSH band buckets; both are plain shuffles on a
  * key, so they partition across executors and survive a 1000× scale-up.
  * All hashing is md5-based (codegen'd, no UDF) so the DuckDB oracle
  * reproduces results exactly.
  *
  * Cache discipline: the pair operators persist their intermediates
  * (shingle sets, banded signatures), EAGERLY materialize the small pair
  * result via `localCheckpoint(true)`, then unpersist every intermediate
  * before returning — no INTERMEDIATE storage outlives the call. The
  * checkpointed result itself does hold its (small, final-output-sized)
  * blocks until the returned DataFrame is unpersisted or GC'd — a
  * long-lived session that calls these in a loop should release results
  * it is done with. Eager evaluation is a deliberate semantic: a
  * near-dup-pairs result is consumed in full by any caller, and
  * materializing it once is what lets the self-joined signature pipeline
  * run ONCE instead of once per join side. On a multi-node cluster you'd
  * swap the final `localCheckpoint` for a table write (localCheckpoint
  * blocks are not fault-tolerant); single-JVM here.
  */
object Dedup {

  /** Persist + force-materialize: after this, every later consumer —
    * including both sides of a self-join — reads the cached blocks instead
    * of recomputing the plan (lazy persist alone would let the self-join's
    * two concurrently-scheduled map stages each compute the pipeline). */
  private def pin(df: DataFrame): DataFrame = {
    df.persist(StorageLevel.MEMORY_AND_DISK)
    df.count()
    df
  }

  /** Exact dedup on a fingerprint of normalized text — one hash-agg shuffle
    * (map-side combine), the 100-TB-safe baseline. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val fp = Par.spread(df)
      .select(col(idCol), Text.fingerprint(col(textCol)).as("fingerprint"))
    fp.groupBy(col("fingerprint"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
  }

  /** doc → sorted distinct 60-bit shingle hashes (one row per doc).
    * Shingles are hashed to longs immediately (md5 → first 15 hex chars →
    * long): join keys and verify arrays are then 8-byte fixed-width instead
    * of ~50-char strings, cutting shuffle volume and comparison cost ~8×.
    * A within-pair collision would alter a Jaccard count, but at 2^60 the
    * probability is ~10^-13 per corpus — and the DuckDB oracle applies the
    * SAME hash, so results always agree bit-for-bit.
    * Callers `pin` this frame (index build, both sides of the candidate
    * self-join, both verify joins re-read the materialized sets instead of
    * re-deriving shingles from text) and unpersist it before returning —
    * at 100 TB this would be a DISK_ONLY cache or a staging table. */
  /** (id, h) rows: one 60-bit hash per distinct shingle STRING of each doc
    * ([[Text.wordShingles]] array_distincts inside the row, before any
    * shuffle). Distinctness at the HASH level is NOT guaranteed here — two
    * shingles colliding in 60 bits yield two equal h rows (~1e-13; callers
    * that promise the oracle hash-set semantics dedup hashes downstream:
    * collect_set in [[shingled]], countDistinct in [[contaminationPairs]]).
    * Hashing happens OUTSIDE any array lambda so md5/conv run in
    * WholeStageCodegen. */
  private def shingleHashed(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    Par.spread(df)
      .select(col(idCol).as("id"), explode(Text.wordShingles(col(textCol), n)).as("s"))
      .select(col("id"), conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long").as("h"))

  private def shingled(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    shingleHashed(df, idCol, textCol, n)
      // one tiny shuffle of (id, long) rebuilds the per-doc sorted set
      // (collect_set dedups like array_distinct)
      .groupBy(col("id")).agg(sort_array(collect_set(col("h"))).as("sh"))
      .withColumn("nsh", size(col("sh")))

  /** Exact near-dup pairs with PPJoin-style prefix filtering (lossless):
    * with each doc's shingles in a fixed total order (lexicographic), any
    * pair with Jaccard ≥ t must share an element within the first
    * |d| − ceil(t·|d|) + 1 shingles of each side — so only the PREFIX is
    * exploded into the inverted index (~(1−t)·|d| entries per doc instead
    * of |d|, cutting index self-join volume ~(1−t)² at scale). Candidates
    * are then verified with the exact Jaccard over the full sets. */
  def ngramJaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.8): DataFrame = {
    val s = pin(shingled(df, idCol, textCol, n).filter(col("nsh") > 0)) // already sorted
    // epsilon guards float rounding UP only (a longer prefix is still lossless)
    val prefLen = (col("nsh") - ceil(col("nsh") * (threshold - 1e-9)) + 1).cast("int")
    val ex = s.select(col("id"), col("nsh"), explode(slice(col("sh"), lit(1), prefLen)).as("shingle"))
    // PPJoin LENGTH filter (lossless): J(a,b) >= t forces
    // min(|A|,|B|) >= t * max(|A|,|B|) — kill size-incompatible candidates
    // at the index join, before the distinct and the full-set verify.
    // Epsilon loosens only (a spared candidate is re-checked exactly).
    val cand = ex.as("x").join(ex.as("y"),
        col("x.shingle") === col("y.shingle") && col("x.id") < col("y.id") &&
          least(col("x.nsh"), col("y.nsh")).cast("double") >=
            greatest(col("x.nsh"), col("y.nsh")) * lit(threshold - 1e-9))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b")).distinct()
    val out = verifyJaccard(cand, s, threshold).localCheckpoint(true)
    s.unpersist(false)
    out
  }

  /** Join candidate (id_a,id_b) pairs back to shingle sets and keep those
    * with exact Jaccard ≥ threshold. Size-incompatible candidates
    * (J ≥ t forces min(|A|,|B|) ≥ t·max — the PPJoin length filter, lossless)
    * are dropped BEFORE the O(|A|+|B|) array_intersect, which matters for
    * LSH-banding candidates that never went through a prefix index. */
  private def verifyJaccard(cand: DataFrame, sets: DataFrame, threshold: Double): DataFrame =
    verifyJaccard2(cand, sets, sets, threshold)

  /** [[verifyJaccard]] with distinct set frames per pair side (the
    * delta↔corpus case of [[minhashLshPairsBetween]]). */
  private def verifyJaccard2(cand: DataFrame, setsA: DataFrame, setsB: DataFrame,
      threshold: Double): DataFrame =
    cand
      .join(setsA.select(col("id").as("id_a"), col("sh").as("sh_a"), col("nsh").as("nsh_a")), Seq("id_a"))
      .join(setsB.select(col("id").as("id_b"), col("sh").as("sh_b"), col("nsh").as("nsh_b")), Seq("id_b"))
      .filter(least(col("nsh_a"), col("nsh_b")).cast("double") >=
        greatest(col("nsh_a"), col("nsh_b")) * lit(threshold - 1e-9))
      .withColumn("common", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        col("common").cast("double") / (col("nsh_a") + col("nsh_b") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")

  /** Exact-substring duplicate pairs — the duplication mode Jaccard-based
    * dedup MISSES (Lee et al., "Deduplicating Training Data Makes Language
    * Models Better", ACL 2022): a long page embedding one verbatim k-token
    * boilerplate block sits below any global-Jaccard threshold yet is the
    * most common real-world duplication. Flags (id_a, id_b, n_shared) pairs
    * sharing ≥ `minShared` distinct k-token consecutive runs.
    *
    * Relational shape ([[contaminationPairs]]' inverted index, corpus ↔
    * corpus): every k-token window (stride 1, deduped per doc) hashes to a
    * 60-bit long; the self-join on the window hash IS the exact criterion —
    * two docs share a window hash iff they share a verbatim k-token run
    * (up to the documented ~1e-13 60-bit collision odds), so no verify pass
    * exists. Both sides are keyed equi-joins; never a cross join.
    *
    * Scale notes: the index is one row per (doc, distinct window) ≈ one row
    * per token — the same order as every shingle path here; the window
    * STRINGS expand the projection ~k× transiently (inside one codegen'd
    * stage, never shuffled — the shuffle carries 8-byte hashes). Stride
    * must stay 1 on both sides of a self-join (strided windows sample
    * different phases of the same run in different documents and would miss
    * aligned copies). Pair volume is bounded by the duplication actually
    * present: a window shared by m docs contributes m(m−1)/2 pairs — that
    * quadratic IS the signal (a thousand-way boilerplate block is a
    * thousand-way dup family); cap with a per-hash doc-frequency filter
    * upstream if a corpus is known to carry degenerate mega-clusters. */
  def substringDupPairs(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 50, minShared: Long = 1L): DataFrame = {
    require(k >= 2, s"k must be >= 2 tokens, got $k")
    require(minShared >= 1L, s"minShared must be >= 1, got $minShared")
    val e = pin(shingleHashed(df, idCol, textCol, k))
    val out = e.as("x").join(e.as("y"),
        col("x.h") === col("y.h") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .localCheckpoint(true)
    e.unpersist(false)
    out
  }

  /** Longest shared verbatim SPAN per document pair — the exact quantity
    * Lee et al. 2022 threshold on (~50 consecutive tokens), where
    * [[substringDupPairs]] only counts shared windows of a fixed k. Windows
    * of a SMALL k are matched WITH their positions; on each (pair,
    * pa−pb diagonal), maximal chains of consecutive matches are
    * reassembled with the islands trick (pa − row_number is constant
    * within a chain): two documents share a run of exactly L ≥ k equal
    * consecutive tokens iff some diagonal carries L−k+1 consecutive window
    * matches, so `longest_run_tokens = max_chain + k − 1` is EXACT (up to
    * the documented 60-bit hash odds). k trades index size against the
    * shortest detectable run (k=10 detects any run ≥ 10 yet thresholds at
    * `minRunTokens` ≥ 50 precisely — a k=50 window index cannot tell 50
    * from 59). Same scale shape as [[substringDupPairs]]: the shuffle
    * carries (8-byte hash, int position) rows; the diagonal windows
    * partition by (pair, diagonal) so chain assembly spreads across
    * executors; match volume is bounded by the true shared-window count. */
  def substringDupSpans(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 10, minRunTokens: Int = 50): DataFrame = {
    require(k >= 2, s"k must be >= 2 tokens, got $k")
    require(minRunTokens >= k, s"minRunTokens ($minRunTokens) must be >= k ($k)")
    val e = pin(positionalWindowHashes(df, idCol, textCol, k))
    val out = spansFromMatches(
      e.as("x").join(e.as("y"),
        col("x.h") === col("y.h") && col("x.id") < col("y.id")),
      k, minRunTokens)
    e.unpersist(false)
    out
  }

  /** Span-based DECONTAMINATION: for each (train, eval) pair, the longest
    * verbatim token run the train document shares with the eval document —
    * the length-thresholded overlap criterion evaluation hygiene actually
    * uses (a train page quoting ≥ L consecutive tokens of a benchmark item
    * is contaminated regardless of its global Jaccard). Same diagonal-
    * islands machinery as [[substringDupSpans]] over two frames; the
    * measured length lets callers pick the threshold per eval set rather
    * than bake it into the index. [[contaminationPairs]] remains the
    * set-containment (fraction) criterion; this is the span (run-length)
    * one. Output: (train_id, eval_id, longest_run_tokens). */
  def substringSpansBetween(
      corpus: DataFrame, evalSet: DataFrame, idCol: String, textCol: String,
      k: Int = 10, minRunTokens: Int = 50): DataFrame = {
    require(k >= 2, s"k must be >= 2 tokens, got $k")
    require(minRunTokens >= k, s"minRunTokens ($minRunTokens) must be >= k ($k)")
    val eT = pin(positionalWindowHashes(corpus, idCol, textCol, k))
    val eE = pin(positionalWindowHashes(evalSet, idCol, textCol, k))
    val out = spansFromMatches(
      eT.as("x").join(eE.as("y"),
        col("x.h") === col("y.h") && col("x.id") =!= col("y.id")),
      k, minRunTokens)
      .withColumnRenamed("id_a", "train_id").withColumnRenamed("id_b", "eval_id")
    eT.unpersist(false); eE.unpersist(false)
    out
  }

  /** (id, p, h) rows: one 60-bit hash per k-token window WITH its position
    * (stride 1, NOT deduped — chain reassembly needs every occurrence). */
  private def positionalWindowHashes(
      df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val toks = Text.tokens(col(textCol))
    val wins = when(size(toks) >= k,
        transform(sequence(lit(0), size(toks) - k),
          i => concat_ws(" ", slice(toks, i + lit(1), lit(k)))))
      .otherwise(array().cast("array<string>"))
    Par.spread(df).select(col(idCol).as("id"), posexplode(wins).as(Seq("p", "s")))
      .select(col("id"), col("p"),
        conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long").as("h"))
  }

  /** Diagonal islands over an x↔y window-hash match join → per-pair longest
    * run (eager; see [[substringDupSpans]] for the argument). */
  private def spansFromMatches(matches: DataFrame, k: Int, minRunTokens: Int): DataFrame = {
    val m = matches.select(col("x.id").as("id_a"), col("y.id").as("id_b"),
      col("x.p").as("pa"), col("y.p").as("pb"))
    val byDiag = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id_a"), col("id_b"), col("d")).orderBy(col("pa"))
    val runs = m.withColumn("d", col("pa") - col("pb"))
      .withColumn("grp", col("pa") - row_number().over(byDiag))
      .groupBy(col("id_a"), col("id_b"), col("d"), col("grp"))
      .agg(count(lit(1)).as("rw"))
    runs.groupBy("id_a", "id_b")
      .agg((max(col("rw")) + lit(k - 1)).as("longest_run_tokens"))
      .filter(col("longest_run_tokens") >= minRunTokens)
      .localCheckpoint(true)
  }

  /** Cross-corpus decontamination: (train doc, eval doc) pairs where the
    * TRAIN document contains at least `threshold` of the EVAL document's
    * n-gram shingles — containment |A∩B| / |B|, the standard test for a
    * benchmark item leaking into a training corpus (eval-side containment,
    * not symmetric Jaccard: a long train doc that embeds a whole eval item
    * must flag even though its Jaccard is tiny).
    *
    * Scale shape: the eval set (a benchmark suite — tiny next to a 100 TB
    * corpus) is fully exploded into a BROADCAST inverted shingle index; the
    * corpus side streams its shingles map-side through the broadcast join,
    * so the only shuffle is the per-(train,eval) hit-count agg, whose volume
    * is the number of matching shingle occurrences — not the corpus. Counting
    * distinct shared shingles directly (shingle sets are distinct per doc)
    * makes the containment exact with no verify pass. */
  def contaminationPairs(
      corpus: DataFrame, evalSet: DataFrame,
      idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.8): DataFrame = {
    // the corpus side is NEVER shuffled wholesale: its shingle rows stream
    // map-side through the broadcast eval index, and the only shuffle is
    // the per-(train, eval) overlap agg, whose volume is the MATCHING
    // occurrences — tiny next to the corpus when the eval set is a
    // benchmark suite. countDistinct(h) there (not a plain count) keeps
    // the result exact under duplicate corpus rows and 60-bit hash
    // collisions — the same hash-set semantics the oracle computes.
    // The eval side (small, broadcast) is deduped up front so the index
    // is a set and per-doc sizes are a plain count.
    val tr = shingleHashed(corpus, idCol, textCol, n)
      .select(col("id").as("train_id"), col("h"))
    val evD = shingleHashed(evalSet, idCol, textCol, n)
      .select(col("id").as("eval_id"), col("h")).distinct()
    val evN = evD.groupBy(col("eval_id")).agg(count(lit(1)).as("eval_nsh"))
    tr.join(broadcast(evD), Seq("h"))
      .groupBy(col("train_id"), col("eval_id"))
      .agg(countDistinct(col("h")).as("n_common"))
      .join(broadcast(evN), Seq("eval_id"))
      .withColumn("containment",
        col("n_common").cast("double") / col("eval_nsh").cast("double"))
      .filter(col("containment") >= threshold)
      .select("train_id", "eval_id", "n_common", "containment")
  }

  /** Cross-document boilerplate removal at LINE granularity — the curation
    * stage between whole-doc dedup and span dedup (CCNet / RefinedWeb style:
    * navigation chrome, cookie banners, copyright footers repeat across
    * pages of a site without making the pages near-duplicates). Every line
    * whose trimmed form appears in ≥ `minDocFreq` DISTINCT documents is
    * dropped from every document; survivors are reassembled in original
    * order, joined by "\n". Blank lines are dropped (reassembly is
    * whitespace-normalizing); a document whose every line was boilerplate
    * survives with `outCol` = "" and `nKeptCol` = 0 (callers gate on it);
    * null text stays null.
    *
    * Scale shape: explode lines (linear) → doc-frequency hash-agg on the
    * line hash (one map-side-combined shuffle of 8-byte hashes) →
    * anti-join lines against the boilerplate hashes (keyed equi-join) →
    * per-doc reassembly agg. No driver-side set, no cross join; the
    * boilerplate table lives distributed and is only as large as the
    * repeated-line vocabulary. Line matching is md5-based so the DuckDB
    * oracle reproduces the decision bit-for-bit. */
  def stripBoilerplateLines(
      df: DataFrame, idCol: String, textCol: String,
      minDocFreq: Int = 2,
      outCol: String = "clean_text", nKeptCol: String = "n_lines_kept"): DataFrame = {
    require(minDocFreq >= 2, s"minDocFreq must be >= 2 (got $minDocFreq)")
    val reserved = Seq("__bid", "__pos", "__line", "__tl", "__lh", outCol, nKeptCol)
    val clash = df.columns.filter(reserved.contains)
    require(clash.isEmpty,
      s"stripBoilerplateLines reserves ${reserved.mkString("/")}; " +
        s"rename input column(s): ${clash.mkString(", ")}")
    val lines = Par.spread(df)
      .select(col(idCol).as("__bid"),
        posexplode(split(col(textCol), "\n")).as(Seq("__pos", "__line")))
      .withColumn("__tl", trim(col("__line")))
      .filter(col("__tl") =!= "")
      .withColumn("__lh", md5(col("__tl")))
    // doc frequency over DISTINCT (doc, line): repetition WITHIN one doc is
    // Repetition.lineRepetition's signal, not boilerplate
    val boiler = lines.select(col("__bid"), col("__lh")).distinct()
      .groupBy(col("__lh")).agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= minDocFreq)
      .select("__lh")
    val rebuilt = lines.join(boiler, Seq("__lh"), "left_anti")
      .groupBy(col("__bid"))
      .agg(
        concat_ws("\n",
          transform(array_sort(collect_list(struct(col("__pos"), col("__tl")))),
            e => e.getField("__tl"))).as(outCol),
        count(lit(1)).as(nKeptCol))
    df.join(rebuilt, df(idCol) === rebuilt("__bid"), "left")
      .withColumn(outCol,
        when(col(textCol).isNull, lit(null).cast("string"))
          .otherwise(coalesce(col(outCol), lit(""))))
      .withColumn(nKeptCol,
        when(col(textCol).isNull, lit(null).cast("long"))
          .otherwise(coalesce(col(nKeptCol), lit(0L))))
      .drop("__bid")
  }

  /** MinHash signatures via Kirsch–Mitzenmacher double hashing: per shingle
    * ONE md5 supplies two independent 32-bit words (w0, w1); hash i is
    * (w0 + i·w1) mod (2^31−1). Computed relationally — explode shingles,
    * hash each ONCE with codegen'd expressions, then `numHashes` min()
    * aggregates in a single hash-agg (map-side partial combine, one shuffle
    * on the doc id). Output: (id, mh0..mh{k-1}). This formulation keeps the
    * whole hot path inside WholeStageCodegen, unlike higher-order array
    * lambdas which Spark interprets row-by-row. */
  def minhashSignatures(s: DataFrame, numHashes: Int): DataFrame = {
    val p = 2147483647L
    // shingles arrive as 60-bit longs; KM words hash their decimal strings
    val ex = s.select(col("id"), explode(col("sh")).as("xl"))
      .select(col("id"),
        Text.md5Word32(col("xl").cast("string"), 1).as("w0"),
        Text.md5Word32(col("xl").cast("string"), 9).as("w1"))
    val mins = (0 until numHashes).map(i =>
      min(pmod(col("w0") + col("w1") * i, lit(p))).as(s"mh$i"))
    ex.groupBy(col("id")).agg(mins.head, mins.tail: _*)
  }

  /** A reusable MinHash-LSH index over one corpus: the pinned shingle sets
    * (exact-verify side) and the pinned banded signature keys (candidate-
    * generation side). THIS is the state a standing-corpus pipeline stores —
    * signatures depend only on each doc's text, so an index built once
    * serves the corpus self-join, every delta's band-join against it, and
    * the incremental-components fold, without re-shingling the big side
    * (in a real deployment both frames are tables keyed by id / (band,
    * band_key); here they are pinned caches). `release()` when done. */
  final case class MinhashIndex private[operators] (
      shingles: DataFrame, bandedKeys: DataFrame) {
    def release(): Unit = {
      bandedKeys.unpersist(false); shingles.unpersist(false)
    }
  }

  /** Build a [[MinhashIndex]]: one shingle pass, one signature hash-agg
    * (the expensive job — map-side combined, one shuffle on the doc id),
    * bands exploded to (id, band, band_key) rows. Both frames pinned. */
  def minhashIndex(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, bands: Int = 4, rowsPerBand: Int = 3): MinhashIndex = {
    val numHashes = bands * rowsPerBand
    // ONE shingle+hash pass pinned as (id, h) rows at scan parallelism;
    // both the sorted-set frame (verify side) and the signatures aggregate
    // from it. Signatures take their min() over the raw rows DIRECTLY —
    // min over the multiset equals min over collect_set's set, so the
    // values are bit-identical to the former explode-the-array spelling —
    // which (a) map-side-combines 12 longs per doc per partition instead
    // of shuffling shingle arrays into a second explode, and (b) keeps the
    // KM md5 kernel on the spread scan partitions instead of the handful
    // of post-AQE cache partitions (guide §2.3 "aggregate before you
    // shuffle"; measured: the signature stage was a single-task 6.9 s
    // serial stage at sf0.1 before this).
    val rows = pin(shingleHashed(df, idCol, textCol, n))
    val s = pin(rows
      .groupBy(col("id")).agg(sort_array(collect_set(col("h"))).as("sh"))
      .withColumn("nsh", size(col("sh")))
      .filter(col("nsh") > 0))
    val p = 2147483647L
    val ex = rows.select(col("id"),
      Text.md5Word32(col("h").cast("string"), 1).as("w0"),
      Text.md5Word32(col("h").cast("string"), 9).as("w1"))
    val mins = (0 until numHashes).map(i =>
      min(pmod(col("w0") + col("w1") * i, lit(p))).as(s"mh$i"))
    val sig = ex.groupBy(col("id")).agg(mins.head, mins.tail: _*)
    val bandKeys = (0 until bands).map(bi =>
      md5(concat_ws("|",
        (0 until rowsPerBand).map(j => col(s"mh${bi * rowsPerBand + j}").cast("string")): _*)))
    // pinned: without it the candidate self-join executes the signature
    // pipeline on BOTH sides (this alone halved q29's wall time)
    val banded = pin(
      sig.select(col("id"), posexplode(array(bandKeys: _*)).as(Seq("band", "band_key"))))
    rows.unpersist(blocking = false) // s + banded carry all consumers need
    MinhashIndex(s, banded)
  }

  /** MinHash + LSH near-dup pairs.
    * numHashes = bands * rowsPerBand; a pair is a candidate iff all rows of
    * some band agree (band key = md5 of the joined band slice). Candidates
    * are verified with exact Jaccard over the shingle sets. The only
    * shuffles are the band-bucket self-join and the verify joins — never a
    * cross join, so this is the scale path for corpus dedup. */
  def minhashLshPairs(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, bands: Int = 4, rowsPerBand: Int = 3,
      threshold: Double = 0.8): DataFrame = {
    val ix = minhashIndex(df, idCol, textCol, n, bands, rowsPerBand)
    val out = minhashLshPairsIndexed(ix, threshold)
    ix.release()
    out
  }

  /** Persist a [[MinhashIndex]] as two parquet tables (`shingles`,
    * `banded`) — the literal standing-corpus layout the index scaladoc
    * describes: build the signatures once, store them, and band every
    * later delta against the stored table instead of re-shingling the
    * corpus. Pair with [[loadMinhashIndex]]. */
  def saveMinhashIndex(ix: MinhashIndex, path: String): Unit = {
    ix.shingles.write.mode("overwrite").parquet(s"$path/shingles")
    // banded is written LAST and doubles as the commit marker the loader
    // checks first (ADVICE r7): a save interrupted mid-way leaves no banded
    // dir and the load names the problem instead of failing downstream
    ix.bandedKeys.write.mode("overwrite").parquet(s"$path/banded")
  }

  /** True iff every named component dir of a stored index exists — the
    * loaders' fail-fast gate (ADVICE r7): a partially-written index (save
    * interrupted between component writes) produces a clear "incomplete
    * index" error naming the missing part, not an AnalysisException deep in
    * some later join. Shared with [[graft.operators.Similarity]]'s PQ-index
    * loaders. */
  private[operators] def requireIndexParts(
      spark: org.apache.spark.sql.SparkSession, path: String,
      parts: Seq[String], kind: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val missing = parts.filterNot { p =>
      val hp = new org.apache.hadoop.fs.Path(s"$path/$p")
      hp.getFileSystem(conf).exists(hp)
    }
    require(missing.isEmpty,
      s"$kind at $path is incomplete - missing component(s): " +
        s"${missing.mkString(", ")} (expected ${parts.mkString(", ")}). " +
        "Was the save interrupted? Re-run the save.")
  }

  /** Load a stored [[MinhashIndex]] (both frames pinned, [[minhashIndex]]
    * contract). Signatures are a pure function of each doc's text, so a
    * loaded index is interchangeable with a freshly built one. Fails fast
    * with a clear message on a partial save. */
  def loadMinhashIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): MinhashIndex = {
    requireIndexParts(spark, path, Seq("banded", "shingles"), "MinhashIndex")
    MinhashIndex(
      pin(spark.read.parquet(s"$path/shingles")),
      pin(spark.read.parquet(s"$path/banded")))
  }

  /** Persist dedup component labels (r14 ✚, VERDICT r13 "what's wrong"
    * #2) — the (id, component) table [[connectedComponents]] emits,
    * materialized as a one-table parquet store. This is the
    * real-pipeline shape for leakage-safe splitting: the LSH pair graph
    * + star contraction runs ONCE, and every consumer — train/holdout
    * split, leakage audit, k-fold assignment — reads the label table
    * instead of re-deriving ~85%-shared work per query (q223/q228/q231
    * each pay it standalone; q246 is the store-readout ≡ recompute
    * gate). Labels are a pure function of the pair graph, so a loaded
    * table is interchangeable with a fresh contraction; fold new docs in
    * with [[connectedComponentsIncremental]] and re-save. Pair with
    * [[loadComponentLabels]]. */
  def saveComponentLabels(labels: DataFrame, path: String): Unit =
    labels.select(col("id"), col("component"))
      .write.mode("overwrite").parquet(s"$path/labels")

  /** Load a stored component-label table (pinned — split/audit/fold
    * consumers typically read it several times). Fails fast with a clear
    * message when the store dir is missing. */
  def loadComponentLabels(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame = {
    requireIndexParts(spark, path, Seq("labels"), "ComponentLabels")
    pin(spark.read.parquet(s"$path/labels"))
  }

  /** [[minhashLshPairs]] over a prebuilt [[MinhashIndex]] — the index is
    * NOT released (the caller owns it and may reuse it, q109-style). */
  def minhashLshPairsIndexed(ix: MinhashIndex, threshold: Double): DataFrame = {
    val banded = ix.bandedKeys
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.band_key") === col("y.band_key") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b")).distinct()
    verifyJaccard(cand, ix.shingles, threshold).localCheckpoint(true)
  }

  /** Incremental (delta ↔ corpus) MinHash-LSH near-dup pairs: the daily-
    * ingest shape of corpus dedup at 100 TB — band-join the NEW batch
    * against the standing corpus instead of self-joining the whole corpus
    * again. Output: (id_a = left/delta id, id_b = right/corpus id, jaccard),
    * same-id pairs excluded (overlapping id spaces). The MinHash family
    * depends only on shingle values, so signatures computed here for the
    * corpus side are bit-identical to any previous run's — in a real
    * pipeline the corpus's banded signatures are computed ONCE, stored as a
    * table keyed by (band, band_key), and each delta joins against that
    * index; this method takes the raw frame and derives them for the
    * oracle's sake, which changes cost, not results. Candidate volume is
    * |delta bands| ⋈ |corpus bands| bucket-bounded — never a self-join of
    * the big side. Eager (result checkpointed, caches released). */
  def minhashLshPairsBetween(
      left: DataFrame, right: DataFrame, idCol: String, textCol: String,
      n: Int = 3, bands: Int = 4, rowsPerBand: Int = 3,
      threshold: Double = 0.8): DataFrame = {
    val ixL = minhashIndex(left, idCol, textCol, n, bands, rowsPerBand)
    val ixR = minhashIndex(right, idCol, textCol, n, bands, rowsPerBand)
    val out = minhashLshPairsBetweenIndexed(ixL, ixR, threshold)
    ixL.release(); ixR.release()
    out
  }

  /** [[minhashLshPairsBetween]] over prebuilt indexes — the standing-corpus
    * shape made literal: the big side's [[MinhashIndex]] is built (or
    * loaded) ONCE and every delta batch band-joins against it; neither
    * index is released here. */
  def minhashLshPairsBetweenIndexed(
      left: MinhashIndex, right: MinhashIndex, threshold: Double): DataFrame = {
    val cand = left.bandedKeys.as("x").join(right.bandedKeys.as("y"),
        col("x.band") === col("y.band") && col("x.band_key") === col("y.band_key") &&
          col("x.id") =!= col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b")).distinct()
    verifyJaccard2(cand, left.shingles, right.shingles, threshold).localCheckpoint(true)
  }

  /** Relational 64-bit SimHash: explode tokens, hash each ONCE (codegen'd
    * md5+conv), then 64 per-bit vote sums in one hash-agg — same values as
    * `Text.simhash` but the hot path stays inside WholeStageCodegen.
    * Bits 0–31 vote on the token's second md5 word, 32–63 on the first
    * (see `Text.simhash` for why per-word extraction, not a fused hash).
    * Output: (id, sh64). Docs with zero tokens are absent from the output. */
  def simhashTable(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ex = Par.spread(df).select(col(idCol).as("id"),
        explode(Text.tokens(Text.normalize(col(textCol)))).as("t"))
      .select(col("id"), Text.md5Word32(col("t"), 1).as("w0"), Text.md5Word32(col("t"), 9).as("w1"))
    val votes = (0 until 64).map { j =>
      val bit =
        if (j < 32) shiftright(col("w1"), j).bitwiseAND(lit(1L))
        else shiftright(col("w0"), j - 32).bitwiseAND(lit(1L))
      sum(bit * lit(2) - lit(1)).as(s"v$j")
    }
    ex.groupBy(col("id")).agg(votes.head, votes.tail: _*)
      .select(col("id"),
        // distinct powers of two: the sum never carries, so it is exactly a
        // bitwise OR (1L << 63 = Long.MinValue is the sign bit, no overflow)
        (0 until 64).map(j => when(col(s"v$j") > 0, lit(1L << j)).otherwise(lit(0L)))
          .reduce(_ + _).as("sh64"))
  }

  /** Explode a `(id, sh64)` simhash table into its 4×16-bit band index:
    * (id, sh64, band, bandval). Any equal (band, bandval) between two hashes
    * is a near-dup candidate — complete for Hamming distance ≤ 3 by
    * pigeonhole. This is also the STATIC side of streaming ingest dedup
    * ([[graft.streaming.Streams.dropNearDupsStream]]): build it once per
    * corpus snapshot, then stream-static join against it. */
  def simhashBandIndex(h: DataFrame): DataFrame =
    h.select(col("id"), col("sh64"), posexplode(
        array((0 until 4).map(bi =>
          shiftright(col("sh64"), bi * 16).bitwiseAND(lit(0xFFFFL))): _*))
      .as(Seq("band", "bandval")))

  /** SimHash near-dups = pairs within `maxHamming`. Candidates via banding
    * the 64-bit hash into 4×16-bit bands (any equal band ⇒ candidate —
    * guaranteed complete for maxHamming ≤ 3 by pigeonhole), so again no
    * cross join at scale; hamming distance is codegen'd `bit_count(xor)`.
    * Scale note (VERDICT r1): 16-bit bands give 65,536 buckets per band —
    * candidate volume per band is O(N²/65,536) instead of the 32-bit
    * version's O(N²/256), which is the difference between a web-scale
    * corpus deduping and quadratic blow-up. */
  def simhashPairs(
      df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "16-bit banding is only complete for maxHamming <= 3")
    val h = pin(simhashTable(df, idCol, textCol))
    val banded = simhashBandIndex(h)
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bandval") === col("y.bandval") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("x.sh64").as("h_a"),
        col("y.id").as("id_b"), col("y.sh64").as("h_b"))
      .distinct()
    // popcount(xor): two codegen'd integer instructions per pair
    val ham = bit_count(col("h_a").bitwiseXOR(col("h_b"))).cast("long")
    val out = cand.withColumn("hamming", ham)
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
      .localCheckpoint(true)
    h.unpersist(false)
    out
  }

  /** Near-dup pairs → dedup groups: connected components via alternating
    * large-star / small-star contraction (Kiveris et al., "Connected
    * Components in MapReduce and Beyond", ACM SoCC 2014). Each round over
    * the current edge set (every edge kept oriented u > v, no self-loops):
    *
    *   - large-star: each node u links every LARGER neighbor to
    *     m = min(Γ(u) ∪ {u}) — collapses downhill chains from above;
    *   - small-star: each node u links its smaller neighbors AND ITSELF to
    *     its minimum neighbor — collapses what remains from below.
    *
    * The fixed point is one star per component rooted at the component's
    * minimum id, reached in O(log N) rounds even on path graphs — vs the
    * O(diameter) rounds of the min-label propagation this replaced (q43 at
    * sf0.1: propagation needed a driver-synced shuffle round per hop of the
    * longest chain; see BENCH history r2 → r3).
    *
    * Scale design: both phases are keyed shuffles over the CURRENT edges
    * only (a groupBy-min plus an equi-join back, then distinct) — never a
    * cross join, no per-node state table, and intermediate volume is
    * bounded by 2|E| rows per phase. Convergence = edge set unchanged,
    * detected by an order-insensitive checksum (count + bit_xor of
    * xxhash64(u,v)) computed by the same agg job that materializes the
    * round. Round state is plan-truncated through an RDD (Catalyst plans
    * never compound across rounds) and the previous round is unpersisted
    * as soon as the next is materialized — held storage is one round of
    * edges, not O(rounds).
    * Output: (id, component) where component = min id in the cluster;
    * singletons (nodes outside `nodes` ∩ pairs) keep themselves. */
  def connectedComponents(
      pairs: DataFrame, nodes: DataFrame, idCol: String,
      maxIter: Int = 50): DataFrame =
    foldComponents(
      pairs.select(col("id_a").as("u"), col("id_b").as("v")), nodes, idCol, maxIter)

  /** INCREMENTAL [[connectedComponents]]: fold a delta batch's pairs into
    * standing labels WITHOUT re-contracting the full corpus (VERDICT r5
    * §next-5 — the missing half of the [[minhashLshPairsBetween]] story:
    * banding gives delta↔corpus edges, but recomputing labels from the full
    * edge set made every batch pay the whole history).
    *
    * `priorLabels` is a previous run's (id, component) output. Each label
    * row IS an edge to the component root, and a labeling is by definition
    * a fully-contracted star forest — so seeding the star contraction with
    * (labels-as-edges ∪ delta pairs) reaches the same fixed point as
    * re-running over (all historical pairs ∪ delta pairs): the label edges
    * connect exactly the same components the historical pairs did.
    * Convergence needs only the rounds to fold the DELTA in — O(log of the
    * largest newly-merged chain), independent of corpus history; a batch
    * touching nothing converges in one confirmation round. Output contract
    * is identical to [[connectedComponents]] over the union
    * ([[graft.operators]] ComponentsSpec asserts equality with the full
    * recompute; q109's oracle checks it against a recursive-CTE closure).
    * Roots can only DECREASE across batches (a merge relabels to the
    * union's min id) — stable keys for a standing dedup store. */
  def connectedComponentsIncremental(
      priorLabels: DataFrame, deltaPairs: DataFrame,
      nodes: DataFrame, idCol: String, maxIter: Int = 50): DataFrame =
    foldComponents(
      priorLabels.select(col("id").as("u"), col("component").as("v"))
        .union(deltaPairs.select(col("id_a").as("u"), col("id_b").as("v"))),
      nodes, idCol, maxIter)

  private def foldComponents(
      rawEdges: DataFrame, nodes: DataFrame, idCol: String,
      maxIter: Int): DataFrame = {
    val spark = rawEdges.sparkSession

    // large-star(u): m = min over u's full neighborhood (symmetrized) and u
    // itself; every neighbor v > u re-links to m. Emitted edges keep u > v
    // (v > u ≥ m), so orientation is an invariant, not a per-round sort.
    // Both phases need their edge frame partitioned on u TWICE — once as
    // the min-agg input, once as the join's probe side. An explicit
    // repartition(u) makes the two subtrees identical, so ReuseExchange
    // materializes ONE shuffle per phase that both consumers read (the
    // former spelling exchanged the frame separately for the agg and the
    // join — two edge-cardinality shuffles per phase; guide §2.4 "two
    // operations keyed the same way can share one exchange").
    def largeStar(e: DataFrame): DataFrame = {
      val nbrs = e.union(e.select(col("v").as("u"), col("u").as("v")))
        .repartition(col("u"))
      val m = nbrs.groupBy("u").agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      nbrs.join(m, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
    }
    // small-star(u): with edges oriented u > v, m = min smaller neighbor;
    // u and each other smaller neighbor re-link to m (all ≥ m ⇒ oriented).
    def smallStar(e: DataFrame): DataFrame = {
      val e2 = e.repartition(col("u"))
      val m = e2.groupBy("u").agg(min(col("v")).as("m"))
      e2.join(m, "u")
        .select(col("v").as("n"), col("m"))
        .union(m.select(col("u").as("n"), col("m")))
        .filter(col("n") =!= col("m"))
        .select(col("n").as("u"), col("m").as("v"))
        .distinct()
    }
    // one agg job both materializes the round's cache and fingerprints the
    // edge SET (rows are distinct, so count + xor-of-hashes identifies it).
    // The 64-bit fingerprint is a cheap SCREEN only: a match triggers an
    // exact set-equality confirmation below, so a hash collision can cost
    // one extra round but can never stop iteration early.
    def checksum(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)).as("c"), expr("bit_xor(xxhash64(u, v))").as("x")).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }

    val init = rawEdges.select(
        greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
    var cur = init.rdd.persist(StorageLevel.MEMORY_AND_DISK)
    var edges = spark.createDataFrame(cur, init.schema)
    var (cnt, chk) = checksum(edges)
    var converged = cnt == 0L
    var i = 0
    while (!converged && i < maxIter) {
      // one LS∘SS pair per materialization. Measured and rejected (r15):
      // folding TWO pairs per materialization to halve the round-boundary
      // overhead ran 1.3-1.5× SLOWER on every CC composite — the inner
      // pair's un-materialized subtree is referenced several times by the
      // outer pair (only its exchanges get reused), so its aggregates
      // re-evaluate and the doubled plan re-plans per AQE stage.
      val round = smallStar(largeStar(edges))
      val next = round.rdd.persist(StorageLevel.MEMORY_AND_DISK)
      val nextDf = spark.createDataFrame(next, round.schema)
      val (c2, k2) = checksum(nextDf)
      // checksum match → confirm exactly while BOTH rounds are still
      // pinned: equal counts + distinct rows ⇒ one-sided exceptAll-empty
      // proves set equality. Runs once at the (suspected) fixed point, so
      // the exact check adds one job total, not one per round.
      converged = c2 == cnt && k2 == chk && nextDf.exceptAll(edges).isEmpty
      cnt = c2; chk = k2
      cur.unpersist(blocking = false)
      cur = next
      edges = nextDf
      i += 1
    }
    if (!converged && cnt > 0L)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"connectedComponents stopped at maxIter=$maxIter before the edge set " +
          "stabilized — components may be split; raise maxIter")
    // at the fixed point every edge is (member, root): labels fall straight
    // out; re-root the (small) result so the loop RDD can be released
    val finalLabels = edges.select(col("u").as("id"), col("v").as("component"))
      .localCheckpoint(true)
    cur.unpersist(blocking = false)
    // roots have no outgoing edge and singletons never appear: both keep
    // themselves via the coalesce
    val allNodes = nodes.select(col(idCol).as("id"))
    allNodes.join(finalLabels.withColumnRenamed("id", "__lid"),
        allNodes("id") === col("__lid"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("component"))
  }

  /** One-call corpus dedup: MinHash-LSH near-dup pairs → connected
    * components → one representative per cluster (plus every document never
    * seen in a pair). This is the operator a curation pipeline actually
    * invokes (q49 composes it with quality/language gates).
    *
    * Representative rule: with `keepBy` empty (default), each cluster keeps
    * its minimum-id member via an anti-join of the folded ids — the cheap
    * path (no window). With `keepBy` given (e.g. `Seq(col("quality").desc,
    * col(idCol))` — what a real curation run wants: keep each dup family's
    * BEST member, not its accidental first), each cluster keeps its first
    * row under that ordering; append a unique tie-breaker for deterministic
    * output. Cost: one extra keyed window over the component label — the
    * same single-shuffle shape as the anti-join it replaces. */
  def dedupedCorpus(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, bands: Int = 4, rowsPerBand: Int = 3,
      threshold: Double = 0.8, keepBy: Seq[Column] = Nil): DataFrame = {
    val pairs = minhashLshPairs(df, idCol, textCol, n, bands, rowsPerBand, threshold)
    keepRepresentatives(df, idCol, pairs, keepBy)
  }

  /** Shared representative-selection tail of [[dedupedCorpus]] /
    * [[dedupedCorpusByEmbedding]]: fold `pairs` into components, keep one
    * row per cluster. `keepBy` empty = min-id member via a cheap anti-join
    * of the folded ids; `keepBy` given = each cluster's first row under
    * that ordering via one keyed window over the component label. */
  private def keepRepresentatives(
      df: DataFrame, idCol: String, pairs: DataFrame,
      keepBy: Seq[Column]): DataFrame = {
    if (keepBy.isEmpty) {
      val folded = connectedComponents(pairs, df, idCol)
        .filter(col("id") =!= col("component"))
        .select(col("id").as(idCol))
      Joins.join(df, folded, Seq(idCol), "anti")
    } else {
      val reserved = Seq("__graft_comp", "__graft_rk")
      val clash = df.columns.filter(reserved.contains)
      require(clash.isEmpty,
        s"dedupedCorpus(keepBy) reserves ${reserved.mkString("/")}; " +
          s"rename input column(s): ${clash.mkString(", ")}")
      // labels cover EVERY doc (singletons label themselves), so the window
      // ranks each cluster once and keeps singletons trivially
      val labels = connectedComponents(pairs, df, idCol)
        .select(col("id").as(idCol), col("component").as("__graft_comp"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("__graft_comp")).orderBy(keepBy: _*)
      df.join(labels, Seq(idCol))
        .withColumn("__graft_rk", row_number().over(w))
        .filter(col("__graft_rk") === 1)
        .drop("__graft_rk", "__graft_comp")
    }
  }

  /** Embedding near-dup: multi-table random-hyperplane LSH candidates
    * (shared with [[Similarity.bucketedTopK]] — `nTables` seeded Rademacher
    * hyperplane tables, `signBits` sized to the corpus by default so bucket
    * occupancy is constant at any scale), exact quantized cosine verify.
    * `multiProbe` additionally joins each row's Hamming-1 bucket
    * perturbations against the other side's exact buckets — COMPLETE for
    * bucket pairs one sign-bit apart (a pair differing in exactly bit j has
    * the lower id's perturbation j land in the higher id's bucket), which
    * is where most LSH misses live. Measured on q53's scorecard (pairs at
    * cosine 0.3–0.5, the hardest band for hyperplane LSH): 8 tables/no
    * probing = 0.34 pair recall; 16 tables + probing = 0.99 at sf0.01
    * (6 sign bits) and 0.86 at sf0.1 (8 bits; 24 tables measure 0.95 there
    * at ~2× found-side cost — `Bench` re-measures the default every round).
    * The decay with corpus size is inherent: sized sign bits cut per-table
    * collision probability ~0.63^bits at this θ, so holding recall at a
    * FIXED low threshold needs tables growing exponentially in bits —
    * whereas at realistic near-dup cosines (≥ 0.7, per-table collision
    * ≥ 0.12 at 8 bits before probing) the default holds ≥ 0.99 at any
    * tested size. Probing costs ×(bits+1) probe-side rows — still a keyed
    * equi-join (never a cross join); `nTables` is the dial when a low
    * detection threshold matters more than index size at 100 TB, so the
    * DEFAULT (`nTables = 0` = auto) adapts to the requested threshold:
    * 16 tables at θ ≥ 0.4, 24 below (VERDICT r5 §next-2 — the 16-table
    * dial measured 0.856 pair recall at θ=0.3/sf0.1 where 24 measures
    * 0.946 at ~2× candidate cost; both re-measured by `Bench` every
    * round). Deterministic and oracle-reproducible; precision = 1 via the
    * exact verify. Eager (result checkpointed, caches released). */
  def embeddingNearDupPairs(
      df: DataFrame, idCol: String, vecCol: String,
      nTables: Int = 0, signBits: Int = 0, threshold: Double = 0.4,
      multiProbe: Boolean = true, seed: Long = 42L): DataFrame = {
    val ix = embeddingIndex(df, idCol, vecCol, nTables, signBits, threshold,
      seed = seed)
    val out = embeddingNearDupPairsIndexed(ix, threshold, multiProbe)
    ix.release()
    out
  }

  /** A reusable embedding near-dup index — the vector sibling of
    * [[MinhashIndex]] (VERDICT r6 §missing-1): the pinned quantized vectors
    * + exact integer norms (verify side) and the pinned sign-LSH buckets
    * (candidate side), plus the hyperplane parameters (`nTables`, `bits`,
    * `dim`, `scale`, `seed`) that a DELTA batch must share to land in the
    * same bucket space. Hyperplanes are a pure function of those parameters
    * ([[Similarity.hyperplanes]] — seeded md5), so they are re-derived, not
    * stored; in a real deployment `vecs`/`buckets` are tables keyed by id /
    * (t, bucket) and each ingest batch joins against them. `release()`
    * when done. */
  final case class EmbeddingIndex private[operators] (
      vecs: DataFrame, buckets: DataFrame,
      nTables: Int, bits: Int, dim: Int, scale: Int, seed: Long) {
    def release(): Unit = {
      buckets.unpersist(false); vecs.unpersist(false)
    }
  }

  /** Build an [[EmbeddingIndex]]: one quantize+norm pass (pinned), sign
    * bits sized to THIS corpus ([[Similarity.sizedSignBits]] — constant
    * bucket occupancy at any scale), one relational bucket pass (pinned).
    * `nTables = 0` = threshold-adaptive default (16 at θ ≥ 0.4, 24 below —
    * the r6-measured dial); the `threshold` argument is used ONLY for that
    * auto-dial. An empty corpus yields an empty index (dim = 0) that every
    * downstream join handles as zero pairs. */
  def embeddingIndex(
      df: DataFrame, idCol: String, vecCol: String,
      nTables: Int = 0, signBits: Int = 0, threshold: Double = 0.4,
      scale: Int = 1000, seed: Long = 42L): EmbeddingIndex = {
    val tables = if (nTables > 0) nTables else if (threshold >= 0.4) 16 else 24
    graft.expressions.GraftFunctions.register(df.sparkSession)
    val v = pin(Par.spread(df).select(col(idCol).as("id"),
        Similarity.quantize(col(vecCol), scale).as("v"))
      .withColumn("nn", call_function("graft_qdot", col("v"), col("v"))))
    val n = v.count() // reads the pinned cache
    if (n == 0L) { // empty corpus: typed empty buckets, no dim probe to throw
      val b = v.select(col("id"), lit(0L).as("t"), lit(0L).as("bucket")).limit(0)
      return EmbeddingIndex(v, b, tables, bits = 4, dim = 0, scale = scale, seed = seed)
    }
    val bits = if (signBits > 0) signBits else Similarity.sizedSignBits(n)
    val dim = v.select(size(col("v")).as("d")).head().getInt(0)
    val planes = Similarity.hyperplanes(df.sparkSession, tables, bits, dim, seed)
    val b = pin(Similarity.lshBuckets(v, "id", "v", planes))
    EmbeddingIndex(v, b, tables, bits, dim, scale, seed)
  }

  /** Persist an [[EmbeddingIndex]] as three parquet tables (`vecs`,
    * `buckets`, `params`) — the standing-vector-store layout made literal:
    * quantize + bucket the corpus once, store, and every later ingest
    * batch ([[embeddingNearDupPairsBetween]], the streaming bulk gate)
    * joins against the stored tables. `params` carries the hyperplane
    * parameters a delta must share to land in the same bucket space. */
  def saveEmbeddingIndex(ix: EmbeddingIndex, path: String): Unit = {
    ix.vecs.write.mode("overwrite").parquet(s"$path/vecs")
    ix.buckets.write.mode("overwrite").parquet(s"$path/buckets")
    val spark = ix.vecs.sparkSession
    import spark.implicits._
    // params is written LAST as the commit marker (ADVICE r7): its presence
    // implies every data component landed, so the loader's fail-fast check
    // catches any interrupted save
    Seq((ix.nTables, ix.bits, ix.dim, ix.scale, ix.seed))
      .toDF("n_tables", "bits", "dim", "scale", "seed")
      .write.mode("overwrite").parquet(s"$path/params")
  }

  /** Load a stored [[EmbeddingIndex]] (frames pinned, [[embeddingIndex]]
    * contract). Hyperplanes are re-derived from the stored parameters
    * (seeded md5 — a pure function), so a loaded index produces
    * bit-identical buckets and pairs to the one that was saved. Fails fast
    * with a clear message on a partial save. */
  def loadEmbeddingIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): EmbeddingIndex = {
    requireIndexParts(spark, path, Seq("params", "vecs", "buckets"), "EmbeddingIndex")
    val p = spark.read.parquet(s"$path/params").head()
    EmbeddingIndex(
      pin(spark.read.parquet(s"$path/vecs")),
      pin(spark.read.parquet(s"$path/buckets")),
      p.getAs[Int]("n_tables"), p.getAs[Int]("bits"), p.getAs[Int]("dim"),
      p.getAs[Int]("scale"), p.getAs[Long]("seed"))
  }

  /** [[embeddingNearDupPairs]] over a prebuilt [[EmbeddingIndex]] — the
    * index is NOT released (the caller owns it and may reuse it for delta
    * joins, [[minhashLshPairsIndexed]]-style). */
  def embeddingNearDupPairsIndexed(
      ix: EmbeddingIndex, threshold: Double,
      multiProbe: Boolean = true): DataFrame = {
    val probed =
      if (multiProbe) Similarity.multiProbe(ix.buckets, "id", ix.bits) else ix.buckets
    val cand = probed.as("x").join(ix.buckets.as("y"),
        col("x.t") === col("y.t") && col("x.bucket") === col("y.bucket") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b")).distinct()
    cosineVerify(cand, ix.vecs, ix.vecs, threshold).localCheckpoint(true)
  }

  /** Incremental (delta ↔ corpus) embedding near-dup pairs — the vector
    * twin of [[minhashLshPairsBetweenIndexed]] and the missing half of the
    * standing-vector-store story (VERDICT r6 §missing-1): a daily ingest
    * batch is bucketed with the CORPUS index's own hyperplane parameters
    * (same tables/bits/seed ⇒ same bucket space) and band-joined against
    * the pinned corpus buckets — the corpus is never self-joined and never
    * re-bucketed. Multi-probe expands the DELTA side (the small one), so
    * probe cost is ×(bits+1) delta rows, Hamming-1-complete exactly like
    * the self-join path. Output: (id_a = delta id, id_b = corpus id,
    * cosine ≥ threshold); same-id pairs excluded (overlapping id spaces).
    * Eager (result checkpointed, delta cache released); the corpus index
    * is NOT released. */
  def embeddingNearDupPairsBetween(
      delta: DataFrame, corpus: EmbeddingIndex,
      idCol: String, vecCol: String, threshold: Double = 0.4,
      multiProbe: Boolean = true): DataFrame = {
    graft.expressions.GraftFunctions.register(delta.sparkSession)
    val dv = pin(Par.spread(delta).select(col(idCol).as("id"),
        Similarity.quantize(col(vecCol), corpus.scale).as("v"))
      .withColumn("nn", call_function("graft_qdot", col("v"), col("v"))))
    val n = dv.count() // reads the pinned cache
    if (n == 0L || corpus.dim == 0) { // nothing to match: typed empty result
      val out = dv.select(col("id").as("id_a"), col("id").as("id_b"),
        lit(0.0).as("cosine")).limit(0).localCheckpoint(true)
      dv.unpersist(false)
      return out
    }
    val planes = Similarity.hyperplanes(delta.sparkSession,
      corpus.nTables, corpus.bits, corpus.dim, corpus.seed)
    val db = Similarity.lshBuckets(dv, "id", "v", planes)
    val probed = if (multiProbe) Similarity.multiProbe(db, "id", corpus.bits) else db
    val cand = probed.as("x").join(corpus.buckets.as("y"),
        col("x.t") === col("y.t") && col("x.bucket") === col("y.bucket") &&
          col("x.id") =!= col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b")).distinct()
    val out = cosineVerify(cand, dv, corpus.vecs, threshold).localCheckpoint(true)
    dv.unpersist(false)
    out
  }

  /** Exact quantized-cosine verification of candidate pairs: id_a rows come
    * from `va`, id_b rows from `vb` (both `(id, v, nn)` frames); one
    * codegen'd integer dot per candidate, one double division — engine-
    * identical (the [[Similarity]] determinism contract). */
  private def cosineVerify(
      cand: DataFrame, va: DataFrame, vb: DataFrame,
      threshold: Double): DataFrame =
    cand
      .join(va.select(col("id").as("id_a"), col("v").as("va"), col("nn").as("na")), Seq("id_a"))
      .join(vb.select(col("id").as("id_b"), col("v").as("vb"), col("nn").as("nb")), Seq("id_b"))
      .withColumn("cosine",
        Similarity.cosineOf(call_function("graft_qdot", col("va"), col("vb")),
          col("na"), col("nb")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")

  /** SemDeDup-style one-call semantic dedup (Abbas et al. 2023 in spirit —
    * embedding near-dups, graph-folded, one kept representative per
    * cluster; VERDICT r6 §missing-2): [[embeddingNearDupPairs]] →
    * [[connectedComponents]] → the same representative rule as
    * [[dedupedCorpus]] (min-id anti-join with `keepBy` empty; best-row
    * keyed window with `keepBy` given — a real curation run keeps each
    * semantic family's highest-quality member, not its accidental first).
    * Same scale shape end to end: keyed equi-joins and O(log N) star
    * contraction, never all-pairs. */
  def dedupedCorpusByEmbedding(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.4, nTables: Int = 0, signBits: Int = 0,
      keepBy: Seq[Column] = Nil, seed: Long = 42L): DataFrame = {
    val pairs = embeddingNearDupPairs(df, idCol, vecCol, nTables, signBits,
      threshold, seed = seed)
    keepRepresentatives(df, idCol, pairs, keepBy)
  }

  /** Benchmark decontamination screen (the GPT-3 appendix-C / PaLM
    * n-gram-collision shape): flag every training document sharing at
    * least one word n-gram with the evaluation corpus — eval answers
    * leaking into training data inflate benchmark scores silently, so
    * curation pipelines run this screen before every training dump.
    * Returns (train_id, n_hits) for CONTAMINATED docs only, n_hits = how
    * many distinct benchmark n-grams the doc contains (the triage
    * severity: 1 hit ≈ idiom collision, 50 hits ≈ a verbatim copy).
    * Drop or quarantine via an anti-join on the result.
    *
    * Scale shape: both sides explode to distinct n-gram rows; ONE keyed
    * equi-join — the benchmark side (thousands of docs) is tiny next to
    * the training corpus, so Spark broadcasts it and the 100 TB side
    * never shuffles; then one map-side-combined count. Raise `n` to
    * sharpen precision (13 is the published choice for web-scale dumps;
    * short-doc corpora want 5–8). */
  def decontaminate(train: DataFrame, trainId: String, trainText: String,
      bench: DataFrame, benchText: String, n: Int): DataFrame = {
    require(n >= 1, "n must be >= 1")
    val tSh = Par.spread(train).select(col(trainId).as("train_id"),
      explode(graft.functions.Text.wordShingles(col(trainText), n)).as("sh"))
    val bSh = bench
      .select(explode(graft.functions.Text.wordShingles(col(benchText), n)).as("sh"))
      .distinct()
    // wordShingles is already per-doc distinct, so count(*) after the
    // join is the distinct-collision count
    tSh.join(bSh, Seq("sh"))
      .groupBy(col("train_id"))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** Asymmetric (containment) near-dup pairs — the quote/excerpt detector
    * Jaccard misses: a 50-shingle snippet fully embedded in a 5000-shingle
    * article has Jaccard ≈ 0.01 but containment 1.0 on the snippet side.
    * Over the df-capped shingle vocabulary (a boilerplate shingle shared
    * by half the corpus generates df² candidate pairs AND carries no
    * evidence — the [[Similarity.sparseCosinePairs]] cap, mirrored by the
    * oracle), emits each pair with the intersection size, both (capped)
    * set sizes, and both containment directions, kept when the LARGER
    * direction clears `thrNum/thrDen` — an exact integer test
    * (inter·thrDen ≥ thrNum·min(n_a, n_b)), micro-quantized only for
    * display. Output: (id_a, id_b, inter, n_a, n_b, cont_a_micro,
    * cont_b_micro), id_a < id_b.
    *
    * Scale shape: inverted-index candidate generation (one keyed
    * equi-join on the shingle), never all-pairs; two map-side-combined
    * aggs; the df cap bounds any shingle's fan-out at maxDf². */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int, thrNum: Long, thrDen: Long, maxDf: Long): DataFrame = {
    require(n >= 1 && maxDf >= 2 && thrDen > 0 && thrNum >= 0,
      "need n >= 1, maxDf >= 2, 0 <= thrNum/thrDen")
    // pin the exploded shingle rows: they feed the df table, both sides of
    // the candidate join AND the size agg — recomputing the regex/explode
    // four times dominated the wall clock before this (9.3 s -> measured
    // drop at sf0.1); eager localCheckpoint is the Bpe/kCore discipline
    val sh = Par.spread(df).select(col(idCol).as("id"),
      explode(graft.functions.Text.wordShingles(col(textCol), n)).as("sh"))
      .localCheckpoint(true)
    val kept = sh.join(
      sh.groupBy("sh").agg(count(lit(1)).as("df"))
        .filter(col("df") <= maxDf).select("sh"), Seq("sh"))
      .localCheckpoint(true)
    val sizes = kept.groupBy("id").agg(count(lit(1)).as("nsh"))
    val inter = kept.select(col("id").as("id_a"), col("sh"))
      .join(kept.select(col("id").as("id_b"), col("sh")), Seq("sh"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("id").as("id_a"), col("nsh").as("n_a")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("nsh").as("n_b")), Seq("id_b"))
      .filter(col("inter") * thrDen >= lit(thrNum) * least(col("n_a"), col("n_b")))
      .select(col("id_a"), col("id_b"), col("inter"), col("n_a"), col("n_b"),
        round(col("inter").cast("double") / col("n_a").cast("double") * 1e6)
          .cast("long").as("cont_a_micro"),
        round(col("inter").cast("double") / col("n_b").cast("double") * 1e6)
          .cast("long").as("cont_b_micro"))
  }

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 — the
    * MOSS local fingerprinting scheme): hash every character `k`-gram of
    * the normalized text, slide a `w`-gram window, and keep each window's
    * minimum hash with ties broken to the RIGHTMOST position — the
    * selection whose guarantee is positional: any shared substring of
    * length ≥ k+w−1 yields at least one shared fingerprint, while
    * expected density stays ~2/(w+1) of the grams. Hashes are the repo
    * md5 fold (15 hex → 60-bit long), so fingerprints are engine-exact.
    * Documents shorter than k+w−1 normalized chars have no full window
    * and yield no rows (the scheme is defined on full windows only).
    * Output: distinct (`idCol`, `p` — 1-based gram position, `h`).
    *
    * Scale shape: one projection explodes positions (codegen'd substring/
    * md5, no UDF), then ONE per-document window min — partitioned by doc,
    * ordered by position, a (w)-row moving frame; the argmin-with-
    * rightmost-tie is a lexicographic struct min (h, −p), no self-join.
    * Shuffle volume is the gram stream keyed by doc. */
  def winnowFingerprints(df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1, "need k >= 1 and w >= 1")
    // slice k-char grams INSIDE the array builder so the exploded rows
    // carry 8-char grams, not the whole document text (carrying __t per
    // gram row multiplies the shuffled bytes by ~n_chars/k); md5 runs
    // AFTER the explode, codegen'd on a plain string column
    val grams = Par.spread(df)
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("id"),
        graft.functions.Text.normalize(col(textCol)).as("__t"))
      .filter(length(col("__t")) >= k + w - 1)
      .select(col("id"), posexplode(transform(
        sequence(lit(1), length(col("__t")) - (k - 1)),
        p => col("__t").substr(p, lit(k)))))
      .select(col("id"), (col("pos") + 1).as("p"),
        conv(substring(md5(col("col")), 1, 15), 16, 10).cast("long").as("h"))
    val fr = Window.partitionBy(col("id")).orderBy(col("p"))
      .rowsBetween(-(w - 1), 0)
    grams
      .withColumn("__sel",
        min(struct(col("h").as("mh"), (-col("p")).as("np"))).over(fr))
      .filter(col("p") >= w) // full frames only
      .select(col("id"),
        (-col("__sel").getField("np")).as("p"),
        col("__sel").getField("mh").as("h"))
      .distinct()
  }

  /** Cross-document shared-fingerprint pairs over [[winnowFingerprints]]
    * — the plagiarism/quote detector that LOCALIZES: a shared fingerprint
    * pins a shared ≥k-char span, so `n_shared` measures copied material
    * directly. Fingerprints in more than `maxDf` documents are dropped
    * before pairing (boilerplate — the [[containmentPairs]] df-cap
    * discipline; set sizes are counted over the SAME capped set so the
    * Jaccard is internally consistent). Output per pair (id_a < id_b):
    * `n_shared`, `n_a`, `n_b`, `jac_micro`.
    *
    * Scale shape: inverted-index equi-join on the fingerprint hash —
    * never all-pairs; the df-cap bounds each hash's pair fan-out at
    * maxDf², and the fingerprint stream is ~2/(w+1) of the gram stream.
    * The capped set is pinned once and feeds sizes + both join sides. */
  def winnowPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, w: Int = 4, maxDf: Long = 50): DataFrame = {
    require(maxDf >= 2, "maxDf must be >= 2 to ever produce a pair")
    val fp = winnowFingerprints(df, idCol, textCol, k, w)
      .select(col("id"), col("h")).distinct()
      .localCheckpoint(true)
    val kept = fp.join(
      fp.groupBy("h").agg(count(lit(1)).as("dfh"))
        .filter(col("dfh") <= maxDf).select("h"), Seq("h"))
      .localCheckpoint(true)
    val sizes = kept.groupBy("id").agg(count(lit(1)).as("nf"))
    kept.select(col("id").as("id_a"), col("h"))
      .join(kept.select(col("id").as("id_b"), col("h")), Seq("h"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_shared"))
      .join(sizes.select(col("id").as("id_a"), col("nf").as("n_a")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("nf").as("n_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("n_shared"), col("n_a"), col("n_b"),
        round(col("n_shared").cast("double")
          / (col("n_a") + col("n_b") - col("n_shared")).cast("double") * 1e6)
          .cast("long").as("jac_micro"))
  }
}
