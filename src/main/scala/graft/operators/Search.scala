package graft.operators

import org.apache.spark.sql.DataFrame
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
  * Scale shape: the exploded corpus is filtered to the query terms FIRST
  * (an `isin` literal filter that pushes ahead of every shuffle — the
  * shuffled volume is only the matching postings, not the corpus); df/N/avgdl
  * are one map-side-combined agg each; the ≤|Q|-row term-stats frame joins
  * broadcast. Top-k is TakeOrderedAndProject, never a global sort. */
object Search {

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
    val toks = df
      .select(col(idCol), explode(Text.tokens(Text.normalize(col(textCol)))).as("token"))
    // corpus stats: N docs, total tokens (for avgdl) — exact longs
    val dl = toks.groupBy(idCol).agg(count(lit(1)).as("dl"))
    val corpus = dl.agg(count(lit(1)).as("N"), sum(col("dl")).as("TT"))
    // postings pruned to the query terms BEFORE any shuffle
    val tf = toks.filter(col("token").isin(queryTerms: _*))
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val contrib = tf
      .join(broadcast(dfreq), Seq("token"))
      .join(dl, Seq(idCol))
      .crossJoin(broadcast(corpus))
      .withColumn("idf",
        log(lit(1.0) + (col("N") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("avgdl", col("TT").cast("double") / col("N"))
      .withColumn("c_micro",
        round(col("idf") * col("tf") * lit(k1 + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
          * lit(1000000L)).cast(LongType))
    contrib.groupBy(idCol)
      .agg(count(lit(1)).as("n_hit_terms"), sum(col("c_micro")).as("score_micro"))
      .orderBy(col("score_micro").desc, col(idCol))
      .limit(k)
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("score_micro").desc, col(idCol))).cast(LongType))
  }
}
