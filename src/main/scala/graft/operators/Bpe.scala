package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Learned byte-pair-encoding vocabulary training and subword encoding
  * (Sennrich, Haddow & Birch 2016), distributed (north-star extension: the
  * tokenizer-training half of an LLM data pipeline — the reference has no
  * tokenizer surface; [[graft.functions.Text.bpeishTokens]] remains the
  * model-agnostic budget proxy, this is the real learned vocabulary).
  *
  * Scale shape — the textbook trick that makes BPE training a Spark
  * problem: ALL pair statistics live on the unique-word-frequency table
  * ([[wordCounts]] — ONE corpus-wide hash-agg shuffle, map-side combined),
  * weighted by word count. The merge loop then iterates over that pinned
  * vocab-sized frame (≪ corpus: bounded by the language's vocabulary, not
  * the token count), so 100 TB of text costs one shuffle plus roughly
  * `numMerges / maxBatch` cheap jobs over millions of rows at most: each
  * round's adjacent-pair explode → hash-agg → top-`topM` collect (the only
  * driver traffic — a few hundred rows per round, the model itself) feeds
  * [[selectBatch]], which proves a PREFIX of the sorted pairs independent
  * and applies them all as one lazily-chained codegen'd fold. Sequential
  * equivalence is exact (see [[selectBatch]]), so batching is purely a
  * scheduler-round-trip optimization. Nothing else ever leaves the
  * executors; encoding never shuffles at all.
  *
  * Greedy merge application is the sequential-looking step that kept r4
  * from attempting real BPE — but it is exactly a left fold, and Spark's
  * `aggregate` higher-order function IS a codegen'd left fold. With the
  * word's symbols space-joined in a string accumulator, merging pair (a,b)
  * is: if the next symbol is `b` and the accumulator's LAST symbol is
  * exactly `a` (it equals `a`, or ends with `" a"` — the space delimiter
  * makes the check exact since symbols never contain spaces), append `b`
  * with no separator (fusing "… a" + "b" = "… ab"); otherwise append
  * " "+symbol. Non-overlap falls out naturally: a fused tail "ab" no
  * longer ends with " a", so "a a a a" under (a,a) folds to "aa aa", not
  * "aaa a" — the exact greedy left-to-right semantics of the reference
  * algorithm, and DuckDB's `list_reduce` replays the identical fold for
  * the oracle. Zero UDFs.
  *
  * Determinism: pair counts are exact long sums; the argmax tie-breaks by
  * (count DESC, left ASC, right ASC) — bit-identical on any engine.
  * Applying the learned merges in order to a training word reproduces that
  * word's final training segmentation (each encode step performs the same
  * transformation training performed), which q128 exploits as a
  * two-code-paths-one-answer gate. */
object Bpe {

  /** Unique-word frequency table of a corpus: (word, cnt). Tokenization is
    * [[Text.normalize]] + whitespace split — the same contract as
    * [[Search]]'s BM25, so the two share vocabularies. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    Par.spread(docs).select(explode(Text.tokens(Text.normalize(col(textCol)))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** A word as its initial symbol sequence: single characters joined by
    * single spaces ("low" → "l o w"). No end-of-word marker — segmentation
    * quality is not the point of this operator's tests; add one by
    * appending a sentinel token to the string before training if needed. */
  def charSymbols(word: Column): Column =
    trim(regexp_replace(word, "(.)", "$1 "))

  /** One greedy merge of pair (a, b) over a space-joined symbol string —
    * the codegen'd left fold described in the header. Single-symbol
    * strings pass through untouched (empty fold tail). */
  def applyMerge(symsStr: Column, a: Column, b: Column): Column = {
    val sy = split(symsStr, " ")
    aggregate(
      slice(sy, lit(2), size(sy) - 1), element_at(sy, 1),
      (acc, x) =>
        when(x === b && (acc === a || acc.endsWith(concat(lit(" "), a))),
          concat(acc, b))
          .otherwise(concat(acc, lit(" "), x)))
  }

  /** The adjacent-pair frequency table of a (word, cnt, syms) state frame:
    * (a, b, pc) with pc = Σ cnt over every adjacent occurrence. Shared
    * with [[WordPiece]], whose training differs only in the pair SCORE. */
  private[operators] def pairCounts(words: DataFrame): DataFrame = {
    val sy = split(col("syms"), " ")
    words
      .select(col("cnt"),
        explode(arrays_zip(
          slice(sy, lit(1), size(sy) - 1).as("a"),
          slice(sy, lit(2), size(sy) - 1).as("b"))).as("pr"))
      .groupBy(col("pr.a").as("a"), col("pr.b").as("b"))
      .agg(sum(col("cnt")).as("pc"))
  }

  /** Train `numMerges` BPE merges on a corpus. Returns the ordered merge
    * table (rank, sym_a, sym_b, pair_count) — vocab-sized by construction
    * (one row per merge), so it is a driver-safe model artifact: persist
    * it with a plain parquet write, reload and `.collect()` it for
    * [[encodePieces]]. Stops early (fewer rows) when no adjacent pair
    * remains. */
  /** How many of the sorted pair-count rows can be merged in ONE round
    * while replaying sequential greedy BPE bit-for-bit (r9 — the merge-loop
    * scale regime: one Spark job per merge is fine at numMerges ≈ 10² but a
    * 30k-merge production vocab would be 30k sequential scheduler
    * round-trips). Walk the (pc DESC, a, b)-sorted rows, accepting while:
    *
    *  - the pair shares no symbol with any accepted pair ("dirty" symbols);
    *    the first dirty-toucher ends the batch — its own count is stale;
    *  - no row ANYWHERE with the same count touches a dirty symbol: a merge
    *    of (a,b) only (1) zeroes (a,b) itself (greedy fuses every
    *    occurrence; self-pair runs leave no residual adjacency), (2)
    *    decreases dirty-adjacent pairs, and (3) creates new pairs whose
    *    counts are ≤ some old dirty-adjacent pair's count — so as long as
    *    every dirty-adjacent count is STRICTLY below the candidate's, no
    *    updated or new pair can reach the candidate's count, and the
    *    candidate is exactly the sequential argmax (clean pairs keep their
    *    counts and the candidate is the first unprocessed clean row). The
    *    strictness matters for ties: a new pair's name ("ab") can sort
    *    anywhere, so an equal count could steal the argmax;
    *  - the list was truncated at `topM` and the candidate's count has
    *    reached the last visible count (the equal-count band may continue
    *    past the horizon, hiding a dirty-adjacent tie).
    *
    * The first row (the global argmax) is always accepted. */
  private def selectBatch(top: Array[(String, String, Long)], topM: Int,
      maxN: Int): Seq[(String, String, Long)] = {
    val dirty = scala.collection.mutable.Set.empty[String]
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    val truncated = top.length == topM
    val pcLast = top.last._3
    var i = 0
    var stop = false
    while (i < top.length && !stop && out.size < maxN) {
      val (a, b, pc) = top(i)
      if (out.isEmpty) { out += top(i); dirty += a; dirty += b }
      else if (dirty(a) || dirty(b)) stop = true
      else if (truncated && pc <= pcLast) stop = true
      else if (top.indices.exists(j => j > i && top(j)._3 == pc &&
          (dirty(top(j)._1) || dirty(top(j)._2)))) stop = true
      else { out += top(i); dirty += a; dirty += b }
      i += 1
    }
    out.toSeq
  }

  def train(docs: DataFrame, textCol: String, numMerges: Int,
      maxBatch: Int = 16): DataFrame = {
    require(numMerges >= 1, "numMerges must be >= 1")
    require(maxBatch >= 1, "maxBatch must be >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    // Eager localCheckpoint per round — the [[Similarity.mmrRerank]]
    // iteration discipline. Two jobs per ROUND (materialize + argmax), but
    // the round's plan is CONSTANT-size: a fold stack over the previous
    // round's LogicalRDD. The earlier lazy-persist variant kept the full
    // logical lineage, and every job's SQL-execution event re-stringifies
    // the accumulated plan — by round ~20 the driver spent minutes in
    // treeString, dwarfing the work. A round applies up to `maxBatch`
    // provably-independent merges ([[selectBatch]]) as one select-per-merge
    // stack (one SELECT per merge, NOT one folded expression: applyMerge
    // references its input ~3×, so inlining k merges builds a 3^k-node
    // expression tree; separate projections share the alias and codegen
    // fuses them), so a 30k-merge vocab costs ~2·30k/batch scheduler
    // round-trips, not 2·30k. Checkpoint blocks are reclaimed by the
    // ContextCleaner as references drop; they are not fault-tolerant — on
    // a multi-node cluster swap for reliable checkpoints or table writes.
    val topM = 256
    var words = wordCounts(docs, textCol)
      .select(col("word"), col("cnt"), charSymbols(col("word")).as("syms"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var done = false
    while (merges.size < numMerges && !done) {
      val top = pairCounts(words)
        .orderBy(col("pc").desc, col("a"), col("b")).limit(topM).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      if (top.isEmpty) done = true
      else {
        val batch = selectBatch(top, topM, math.min(maxBatch, numMerges - merges.size))
        batch.foreach { case (a, b, pc) => merges += ((merges.size + 1, a, b, pc)) }
        words = batch.foldLeft(words) { case (df, (a, b, _)) =>
          df.select(col("word"), col("cnt"),
            applyMerge(col("syms"), lit(a), lit(b)).as("syms")) }
          .localCheckpoint(true)
      }
    }
    merges.toSeq.toDF("rank", "sym_a", "sym_b", "pair_count")
  }

  /** Persist a trained merge table ([[train]]'s output) as parquet — the
    * model artifact a tokenizer ships. One file of `numMerges` rows. */
  def saveBpe(merges: DataFrame, path: String): Unit =
    merges.select("rank", "sym_a", "sym_b", "pair_count")
      .coalesce(1).write.mode("overwrite").parquet(path)

  /** Load a persisted merge table back into the ordered driver-side list
    * [[encodePieces]] consumes. Fails fast on a missing/renamed column
    * rather than mis-encoding with a scrambled merge order. */
  def loadBpe(spark: org.apache.spark.sql.SparkSession, path: String): Seq[(String, String)] = {
    val df = spark.read.parquet(path)
    require(Seq("rank", "sym_a", "sym_b").forall(df.columns.contains),
      s"not a BPE merge table at $path (need rank/sym_a/sym_b, got ${df.columns.mkString(",")})")
    df.orderBy("rank").collect().map(r =>
      (r.getAs[String]("sym_a"), r.getAs[String]("sym_b"))).toSeq
  }

  /** Encode one token column into its subword pieces (array of strings)
    * under an ordered merge list — a pure projection: an outer fold over
    * the merge table (an array-of-structs LITERAL riding in the plan, the
    * model as data) whose accumulator is the symbol string, with
    * [[applyMerge]]'s inner fold applied per merge. Two nested
    * higher-order functions and an O(M) literal — NOT M syntactically
    * chained folds, which would copy the whole accumulated expression
    * tree into each level's `split` references and blow up ~3^M (the
    * first cut of q128 spent 12 minutes analyzing exactly that). No
    * shuffle, no state, no UDF. */
  def encodePieces(token: Column, merges: Seq[(String, String)]): Column = {
    require(merges.nonEmpty, "merges must be non-empty")
    val mArr = array(merges.map { case (a, b) =>
      struct(lit(a).as("a"), lit(b).as("b"))
    }: _*)
    split(
      aggregate(mArr, charSymbols(token),
        (s, m) => applyMerge(s, m.getField("a"), m.getField("b"))),
      " ")
  }

  /** Encode the corpus dictionary: unique words with counts and their
    * piece arrays — the scale shape for whole-corpus tokenization (encode
    * each unique word ONCE, join back to documents by word; the fold cost
    * is vocab-sized, not corpus-sized). */
  def encodeWords(docs: DataFrame, textCol: String,
      merges: Seq[(String, String)]): DataFrame =
    wordCounts(docs, textCol)
      .select(col("word"), col("cnt"), encodePieces(col("word"), merges).as("pieces"))

  /** Corpus-wide subword piece frequencies: (piece, total) — the vocab
    * histogram a tokenizer report prints, and the q128 oracle surface.
    *
    * The encoded dictionary is MATERIALIZED (`localCheckpoint`) before the
    * explode: higher-order functions are CodegenFallback expressions, and
    * a Generate fused directly over the nested fold re-initializes the
    * interpreted tree per row — measured at ~180 ms/row (!) at sf0.1, vs
    * 0.1 s for the whole exploded aggregate once the fold's output is
    * pinned. The frame is vocab-sized, so the eager pin costs nothing at
    * any corpus scale. */
  def pieceCounts(docs: DataFrame, textCol: String,
      merges: Seq[(String, String)]): DataFrame =
    encodeWords(docs, textCol, merges)
      .select(col("pieces"), col("cnt")).localCheckpoint(true)
      .select(explode(col("pieces")).as("piece"), col("cnt"))
      .groupBy("piece").agg(sum(col("cnt")).as("total"))

  /** Per-document token budget under the LEARNED vocab: (id, n_tokens,
    * n_pieces) — the number a packing/budgeting pipeline actually needs
    * (vs [[graft.functions.Text.bpeishTokenCount]]'s model-agnostic
    * bound). The dictionary join-back shape: the fold runs once per
    * UNIQUE word to get its piece count, then a plain (doc, word) ⋈
    * (word, n) equi-join and a per-doc sum — at 100 TB the expensive
    * encode is vocab-sized and the corpus pass is one join + one
    * map-side-combined agg. */
  def docPieceCounts(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val dt = Par.spread(docs)
      .select(col(idCol), explode(Text.tokens(Text.normalize(col(textCol)))).as("word"))
      .filter(length(col("word")) > 0)
    val wp = wordCounts(docs, textCol)
      .select(col("word"), size(encodePieces(col("word"), merges)).as("n_p"))
    dt.join(wp, "word")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"), sum(col("n_p").cast("long")).as("n_pieces"))
  }
}
