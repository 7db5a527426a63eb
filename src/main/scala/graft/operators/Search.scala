package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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
    val toks = df
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
