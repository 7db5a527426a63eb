package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.storage.StorageLevel

import graft.functions.Text

/** Keyword relevance scoring over a document corpus — Okapi BM25 (Robertson
  * & Zaragoza 2009), the standard lexical ranking function, as a pure
  * DataFrame computation (north-star extension: a curation pipeline uses
  * this to pull topic-targeted subsets out of a crawl, and it is the
  * lexical half of hybrid retrieval next to [[Similarity]]'s ANN).
  *
  * score(D,Q) = Σ_{t∈Q} idf(t) · tf(t,D)·(k1+1) / (tf(t,D) + k1·(1-b+b·|D|/avgdl))
  * with idf(t) = ln(1 + (N - df(t) + 0.5)/(df(t) + 0.5)).
  *
  * Determinism at scale: each (doc, term) contribution is computed by one
  * fixed-shape expression tree (identical on any engine) and quantized to
  * integer micro-units BEFORE the per-document sum, which is then an exact
  * long — partition-order independent, same contract as [[Lm.surprisal]].
  *
  * Scale shape: the exploded corpus is pruned to the query terms FIRST —
  * an `isin` literal filter ([[bm25TopK]]) or a broadcast semi-join
  * ([[bm25PerQuery]]) that runs ahead of every shuffle, so the shuffled
  * volume is only the matching postings, not the corpus; df/N/avgdl are
  * one map-side-combined agg each; the ≤|terms|-row stats frames join
  * broadcast. Top-k is TakeOrderedAndProject (single query) or a keyed
  * window (per query) — never a global sort. */
object Search {

  /** The BM25 (doc, term) contribution in integer micro-units — ONE
    * fixed-shape double expression rounded once, shared by both entry
    * points so their scores are bit-identical (and match the DuckDB
    * oracle's literal transcription of this tree). */
  private def contribMicro(tf: Column, df: Column, dl: Column,
      n: Column, tt: Column, k1: Double, b: Double): Column = {
    val idf = log(lit(1.0) + (n - df + lit(0.5)) / (df + lit(0.5)))
    val avgdl = tt.cast("double") / n
    round(idf * tf * lit(k1 + 1.0) /
      (tf + lit(k1) * (lit(1.0 - b) + lit(b) * dl / avgdl))
      * lit(1000000L)).cast(LongType)
  }

  /** (doc, token, c_micro) contributions for every posting whose token
    * survives `prune` (applied BEFORE the tf shuffle). */
  private def contribs(df: DataFrame, idCol: String, textCol: String,
      prune: DataFrame => DataFrame, k1: Double, b: Double): DataFrame = {
    // the regex tokenize+normalize kernel is narrow — spread it when the
    // scan has fewer splits than the cluster has slots (no-op at scale)
    val toks = Par.spread(df)
      .select(col(idCol), explode(Text.tokens(Text.normalize(col(textCol)))).as("token"))
    // corpus stats: N docs, total tokens (for avgdl) — exact longs
    val dl = toks.groupBy(idCol).agg(count(lit(1)).as("dl"))
    val corpus = dl.agg(count(lit(1)).as("N"), sum(col("dl")).as("TT"))
    val tf = prune(toks)
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfreq), Seq("token"))
      .join(dl, Seq(idCol))
      .crossJoin(broadcast(corpus))
      .select(col(idCol), col("token"),
        contribMicro(col("tf"), col("df"), col("dl"), col("N"), col("TT"), k1, b)
          .as("c_micro"))
  }

  /** BM25 top-k: the `k` highest-scoring documents for `queryTerms`.
    * Output: idCol, n_hit_terms (long — distinct query terms present),
    * score_micro (long — 1e6 × BM25 score, exact), rank (long).
    * Ties break by ascending id. Terms are matched against
    * [[Text.normalize]]d tokens, so pass lowercase terms. */
  def bm25TopK(
      df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(k > 0, "k must be positive")
    contribs(df, idCol, textCol, _.filter(col("token").isin(queryTerms: _*)), k1, b)
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_hit_terms"), sum(col("c_micro")).as("score_micro"))
      .orderBy(col("score_micro").desc, col(idCol))
      .limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("score_micro").desc, col(idCol)))
          .cast(LongType))
  }

  /** Batch keyword search: BM25 top-k for MANY queries in one job.
    * `queries` is a (queryIdCol, termCol) table; [[bm25TopK]] is the
    * single-query special case (their scores are bit-identical — shared
    * contribution expression). Postings are pruned by a broadcast
    * semi-join on the distinct term set before any shuffle; per-(doc,term)
    * contributions are computed ONCE and fanned out to every query using
    * the term, so a thousand queries cost one corpus pass plus the
    * (postings × matching-queries) join. Top-k per query is a keyed
    * window — no global sort.
    * Output: queryIdCol, idCol, n_hit_terms, score_micro, rank (≤ k). */
  def bm25PerQuery(
      df: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, queryIdCol: String, termCol: String, k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k > 0, "k must be positive")
    val qterms = queries
      .select(col(queryIdCol), col(termCol).as("token")).distinct()
    val terms = qterms.select("token").distinct()
    val w = Window.partitionBy(queryIdCol)
      .orderBy(col("score_micro").desc, col(idCol))
    contribs(df, idCol, textCol,
        _.join(broadcast(terms), Seq("token"), "left_semi"), k1, b)
      .join(broadcast(qterms), Seq("token"))
      .groupBy(col(queryIdCol), col(idCol))
      .agg(count(lit(1)).as("n_hit_terms"), sum(col("c_micro")).as("score_micro"))
      .withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
  }

  /** Persist + force-materialize (the [[Dedup]]/[[Similarity]] pin
    * discipline). */
  private def pin(df: DataFrame): DataFrame = {
    df.persist(StorageLevel.MEMORY_AND_DISK)
    df.count()
    df
  }

  /** A standing BM25 search index (r8 — the lexical sibling of
    * [[Similarity.IvfPqIndex]], completing the stored-index story for the
    * search path: [[bm25TopK]]/[[bm25PerQuery]] re-tokenize the corpus on
    * every call, which is the benchmark shape, not the deployed one):
    * the full token-keyed inverted index (`postings` — (id, token, tf)),
    * per-doc lengths (`docLens`), per-term document frequencies
    * (`termDf`), and the two exact corpus scalars (`nDocs`,
    * `totalTokens`). Build once with [[bm25Index]], persist with
    * [[saveBm25Index]], answer queries with [[bm25TopKIndexed]]/
    * [[bm25PerQueryIndexed]] (each reads only the query terms' postings —
    * in a deployment the postings table is stored bucketed by token, so
    * the scan prunes to the terms' buckets), and fold ingest batches in
    * with [[extendBm25Index]]. Every statistic is an exact long
    * aggregate, so an extended index scores BIT-IDENTICALLY to one
    * rebuilt from scratch on the union (the q124 gate — stronger than the
    * approximate-index stories, which only promise same-bucket-space).
    * `release()` when done. */
  final case class Bm25Index private[operators] (
      idCol: String, postings: DataFrame, docLens: DataFrame, termDf: DataFrame,
      nDocs: Long, totalTokens: Long) {
    def release(): Unit = {
      termDf.unpersist(false); docLens.unpersist(false); postings.unpersist(false)
    }
  }

  /** Build a [[Bm25Index]]: one tokenize pass feeds one (doc, token)
    * hash-agg; lengths and document frequencies are one further hash-agg
    * each over the pinned postings (never a second corpus pass). Docs with
    * no tokens (null/empty text) contribute no postings and do not count
    * toward N — identical to [[bm25TopK]]'s semantics. */
  def bm25Index(df: DataFrame, idCol: String, textCol: String): Bm25Index = {
    val tf = pin(bm25Postings(df, idCol, textCol))
    val dl = pin(tf.groupBy(idCol).agg(sum(col("tf")).as("dl")))
    val dfreq = pin(tf.groupBy("token").agg(count(lit(1)).as("df")))
    val stats = dl.agg(count(lit(1)).as("N"), coalesce(sum(col("dl")), lit(0L)).as("TT")).head()
    Bm25Index(idCol, tf, dl, dfreq, stats.getLong(0), stats.getLong(1))
  }

  /** The (doc, token, c_micro) contributions for the given pruned postings
    * slice of an index — the [[contribs]] tail over STORED statistics.
    * The corpus scalars enter as literals; the expression tree is
    * [[contribMicro]], so scores are bit-identical to the from-scratch
    * path. */
  private def indexContribs(ix: Bm25Index, pruned: DataFrame, prunedDf: DataFrame,
      k1: Double, b: Double): DataFrame =
    pruned.join(broadcast(prunedDf), Seq("token"))
      .join(ix.docLens, Seq(ix.idCol))
      .select(col(ix.idCol), col("token"),
        contribMicro(col("tf"), col("df"), col("dl"),
          lit(ix.nDocs), lit(ix.totalTokens), k1, b).as("c_micro"))

  /** The (id, token, tf) postings rows of a document frame — the unit
    * every standing-index operation is built from ([[bm25Index]] pins
    * them, [[extendBm25Index]] folds them in, and the streaming ingest
    * twin ships each micro-batch's rows to the store's postings table;
    * doc lengths, term dfs and the corpus scalars all derive from these
    * rows by exact aggregation). */
  def bm25Postings(df: DataFrame, idCol: String, textCol: String): DataFrame =
    Par.spread(df)
      .select(col(idCol), explode(Text.tokens(Text.normalize(col(textCol)))).as("token"))
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))

  /** [[bm25TopK]] against a prebuilt [[Bm25Index]] — no tokenization, no
    * corpus pass: only the query terms' postings rows are read and scored
    * against the stored statistics. Bit-identical output (q123's gate). */
  def bm25TopKIndexed(
      ix: Bm25Index, queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(k > 0, "k must be positive")
    indexContribs(ix,
        ix.postings.filter(col("token").isin(queryTerms: _*)),
        ix.termDf.filter(col("token").isin(queryTerms: _*)), k1, b)
      .groupBy(ix.idCol)
      .agg(count(lit(1)).as("n_hit_terms"), sum(col("c_micro")).as("score_micro"))
      .orderBy(col("score_micro").desc, col(ix.idCol))
      .limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("score_micro").desc, col(ix.idCol)))
          .cast(LongType))
  }

  /** [[bm25PerQuery]] against a prebuilt [[Bm25Index]] — one postings
    * lookup serves every query; contributions fan out to the queries using
    * each term exactly as in the from-scratch path. */
  def bm25PerQueryIndexed(
      ix: Bm25Index, queries: DataFrame, queryIdCol: String, termCol: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k > 0, "k must be positive")
    val qterms = queries
      .select(col(queryIdCol), col(termCol).as("token")).distinct()
    val terms = qterms.select("token").distinct()
    val w = Window.partitionBy(queryIdCol)
      .orderBy(col("score_micro").desc, col(ix.idCol))
    indexContribs(ix,
        ix.postings.join(broadcast(terms), Seq("token"), "left_semi"),
        ix.termDf.join(broadcast(terms), Seq("token"), "left_semi"), k1, b)
      .join(broadcast(qterms), Seq("token"))
      .groupBy(col(queryIdCol), col(ix.idCol))
      .agg(count(lit(1)).as("n_hit_terms"), sum(col("c_micro")).as("score_micro"))
      .withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
  }

  /** Fold an ingest batch INTO the index: the batch's postings/lengths
    * union in, per-term document frequencies add, and the corpus scalars
    * add — all EXACT integer arithmetic, so the extended index is
    * bit-indistinguishable from one rebuilt on the union (the q124 gate
    * asserts exactly this through the oracle). Batch ids must be disjoint
    * from indexed ids (the usual ingest contract). Returns a NEW pinned
    * index; the caller may `release()` the old one afterwards. */
  def extendBm25Index(ix: Bm25Index, batch: DataFrame, textCol: String): Bm25Index = {
    val dtf = pin(bm25Postings(batch, ix.idCol, textCol))
    val ddl = dtf.groupBy(ix.idCol).agg(sum(col("tf")).as("dl"))
    val dStats = ddl.agg(count(lit(1)).as("n"), coalesce(sum(col("dl")), lit(0L)).as("tt")).head()
    val newPostings = pin(ix.postings.unionByName(dtf))
    val newDl = pin(ix.docLens.unionByName(ddl))
    val newDf = pin(ix.termDf.unionByName(
        dtf.groupBy("token").agg(count(lit(1)).as("df")))
      .groupBy("token").agg(sum(col("df")).as("df")))
    dtf.unpersist(false)
    Bm25Index(ix.idCol, newPostings, newDl, newDf,
      ix.nDocs + dStats.getLong(0), ix.totalTokens + dStats.getLong(1))
  }

  /** Persist a [[Bm25Index]] as four parquet tables; `params` (which also
    * carries the corpus scalars) is written LAST as the commit marker —
    * the shared [[Dedup.saveEmbeddingIndex]] contract. */
  def saveBm25Index(ix: Bm25Index, path: String): Unit = {
    ix.postings.write.mode("overwrite").parquet(s"$path/postings")
    ix.docLens.write.mode("overwrite").parquet(s"$path/doclens")
    ix.termDf.write.mode("overwrite").parquet(s"$path/termdf")
    val spark = ix.postings.sparkSession
    import spark.implicits._
    Seq((ix.idCol, ix.nDocs, ix.totalTokens))
      .toDF("id_col", "n_docs", "total_tokens")
      .write.mode("overwrite").parquet(s"$path/params")
  }

  /** Load a stored [[Bm25Index]] (frames pinned). Postings and statistics
    * are stored bytes, so a loaded index scores bit-identically to the one
    * saved. Fails fast with a clear message on a partial save. */
  def loadBm25Index(spark: SparkSession, path: String): Bm25Index = {
    Dedup.requireIndexParts(spark, path,
      Seq("params", "postings", "doclens", "termdf"), "Bm25Index")
    val p = spark.read.parquet(s"$path/params").head()
    Bm25Index(p.getAs[String]("id_col"),
      pin(spark.read.parquet(s"$path/postings")),
      pin(spark.read.parquet(s"$path/doclens")),
      pin(spark.read.parquet(s"$path/termdf")),
      p.getAs[Long]("n_docs"), p.getAs[Long]("total_tokens"))
  }

  /** Per-document top-k keyword extraction by tf·idf (Spärck Jones 1972)
    * — the doc-tagging / topic-labeling primitive next to [[bm25TopK]]'s
    * query-side ranking: tf(t, D) · ln(N / df(t)) with N = documents
    * holding ≥ 1 token and df the document frequency. Counts are exact
    * longs; the score is ONE fixed double tree (the shared-`ln` contract
    * of [[Lm.surprisal]]), micro-quantized BEFORE ranking, ties by term.
    * Corpus-wide terms score ln(1) = 0 — ranked, never special-cased.
    *
    * Scale shape: TWO explode+hash-agg passes to (doc, term, tf) — one
    * feeding the |vocab|-sized df agg, one the scored join — plus a
    * no-explode scan of `docs` for the 1-row N (a doc counts iff any
    * token survives normalization — the exact countDistinct-over-tf
    * value, derived without a third tokenization pass), broadcast into
    * the score, and a doc-partitioned window for the top-k. Lazy: r12
    * pinned tf (persist + eager localCheckpoint) to run the explode
    * once; the r13 measurements (VERDICT r12 #2) found the two plans
    * within ~25% of each other on the ScaleProbe tfidf axis at every
    * factor (position-in-run biased), while the DE-NOISED instrument —
    * the bench harness, median of 3 with GC between runs — reads this
    * query at 1.09 s lazy vs 1.80 s pinned at sf0.1: materialization +
    * cache read-back costs more than the recompute, so the
    * recompute-twice plan shipped and the pinned counterfactual stays
    * measured in the probe every round. Posting-list-shaped joins only,
    * no global sort, no driver state. Output: (id, `term`, `tf`, `df`,
    * `tfidf_micro`, `rank` ≤ k). */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 5): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val toks = Par.spread(docs).select(col(idCol),
        explode(Text.tokens(Text.normalize(col(textCol)))).as("term"))
      .filter(length(col("term")) > 0)
    val tf = toks.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    // N without touching tf: distinct docs holding >= 1 post-normalize
    // token — `exists` over the token array, no explode, no shuffle of
    // token rows (countDistinct guards duplicate-id inputs exactly like
    // the old countDistinct over tf)
    val n = docs
      .filter(exists(Text.tokens(Text.normalize(col(textCol))),
        t => length(t) > 0))
      .agg(countDistinct(col(idCol)).as("__n"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("tfidf_micro").desc, col("term"))
    tf.join(dfreq, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("tfidf_micro",
        round(col("tf").cast("double")
          * log(col("__n").cast("double") / col("df").cast("double"))
          * 1e6).cast(LongType))
      .withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df"),
        col("tfidf_micro"), col("rank"))
  }

  /** Hybrid retrieval fusion — reciprocal-rank fusion (Cormack, Clarke &
    * Büttcher, SIGIR 2009) of any number of per-query rankings, the
    * standard way to combine [[bm25PerQuery]]'s lexical top-k with
    * [[Similarity.bucketedTopK]]'s vector top-k (or any other ranked
    * lists over the same query/doc id space). RRF is RANK-based, so the
    * lists' scores never need normalizing against each other — exactly why
    * it is the default fusion in hybrid search engines.
    *
    * Each list contributes floor(1e9 / (rrfK + rank)) "nano-units" per
    * (query, doc) — an exact integer division, so the fused score is an
    * exact long sum: partition-order independent and bit-identical on any
    * engine (the same quantize-then-sum contract as [[contribMicro]]).
    * rrfK = 60 is the constant from the original paper.
    *
    * Every input must carry `queryIdCol`, `docIdCol`, and a `rank` column
    * (1-based, as both producers here emit); a doc absent from a list
    * simply contributes nothing for it. Scale shape: one union (no
    * shuffle) + one hash-agg + one keyed window over lists that are
    * already ≤ k·|queries| rows — negligible next to either producer.
    * Output: queryIdCol, docIdCol, n_lists (long — lists containing the
    * doc), rrf_nano (long), rank (long, ≤ k; ties by ascending doc id). */
  def fuseRrf(rankings: Seq[DataFrame], queryIdCol: String, docIdCol: String,
      k: Int, rrfK: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking to fuse")
    require(k > 0, "k must be positive")
    require(rrfK >= 0, "rrfK must be non-negative")
    val contribs = rankings.map(_.select(col(queryIdCol), col(docIdCol),
      expr(s"CAST(1000000000 AS BIGINT) div " +
        s"(CAST($rrfK AS BIGINT) + CAST(rank AS BIGINT))").as("rrf_nano")))
    val w = Window.partitionBy(queryIdCol)
      .orderBy(col("rrf_nano").desc, col(docIdCol))
    contribs.reduce(_ unionByName _)
      .groupBy(col(queryIdCol), col(docIdCol))
      .agg(count(lit(1)).as("n_lists"), sum(col("rrf_nano")).as("rrf_nano"))
      .withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
  }
}
