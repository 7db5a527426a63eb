package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

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
  * the token count), so 100 TB of text costs one shuffle plus `numMerges`
  * cheap jobs over millions of rows at most. Per iteration: adjacent-pair
  * explode → hash-agg → `limit(1).collect()` of the single argmax row (the
  * only driver traffic — one row per merge, the model itself), then the
  * merge is applied as a codegen'd fold (below). Nothing else ever leaves
  * the executors; encoding never shuffles at all.
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
    docs.select(explode(Text.tokens(Text.normalize(col(textCol)))).as("word"))
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
    * (a, b, pc) with pc = Σ cnt over every adjacent occurrence. */
  private def pairCounts(words: DataFrame): DataFrame = {
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
  def train(docs: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    require(numMerges >= 1, "numMerges must be >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    // LAZY persist: each iteration's single argmax job materializes the
    // current state's cache while reading the previous one — ONE Spark job
    // per merge (an eager pin would double it; the loop IS the driver-sync
    // cost, so job count is the knob that matters). The previous state is
    // unpersisted only after the job that read it has completed.
    var words = wordCounts(docs, textCol)
      .select(col("word"), col("cnt"), charSymbols(col("word")).as("syms"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var prev: DataFrame = null
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= numMerges && !done) {
      val top = pairCounts(words)
        .orderBy(col("pc").desc, col("a"), col("b")).limit(1).collect()
      if (prev != null) { prev.unpersist(blocking = false); prev = null }
      if (top.isEmpty) done = true
      else {
        val (a, b, pc) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((rank, a, b, pc))
        prev = words
        words = words.select(col("word"), col("cnt"),
            applyMerge(col("syms"), lit(a), lit(b)).as("syms"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        rank += 1
      }
    }
    words.unpersist(blocking = false)
    if (prev != null) prev.unpersist(blocking = false)
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
    val dt = docs
      .select(col(idCol), explode(Text.tokens(Text.normalize(col(textCol)))).as("word"))
      .filter(length(col("word")) > 0)
    val wp = wordCounts(docs, textCol)
      .select(col("word"), size(encodePieces(col("word"), merges)).as("n_p"))
    dt.join(wp, "word")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"), sum(col("n_p").cast("long")).as("n_pieces"))
  }
}
