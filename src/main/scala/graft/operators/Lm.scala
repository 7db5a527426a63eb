package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.Text

/** Unigram language-model surprisal scoring — the perplexity-style quality
  * filter every large-scale curation pipeline runs (CCNet, Wenzek et al.
  * 2020: documents are ranked by LM perplexity and the tails dropped; the
  * reference engine has no text ops at all, this is north-star extension
  * surface like [[graft.functions.Text]]).
  *
  * Model: add-one-smoothed unigram LM fit on the corpus itself.
  * For token t with corpus count c(t), total token count T and vocabulary
  * size V, the per-token surprisal is -ln p(t) = ln(T+V) - ln(c(t)+1);
  * a document's score is the mean surprisal of its tokens (high = the
  * document's tokens are rare in this corpus = "surprising" — boilerplate
  * and in-domain text score low, noise and out-of-domain text score high).
  *
  * Determinism at scale: floating-point SUMS are partition-order dependent,
  * so instead of avg(ln ...) the per-token surprisal is quantized to
  * integer micro-nats FIRST — round(1e6*ln(c+1)) — and the per-document
  * total is then an exact long sum, identical on any engine, cluster, or
  * partitioning (the same integer-quantization rule the aggregate queries
  * use; rounding the one-per-distinct-token ln value is the only float
  * step, and it happens before any order-dependent accumulation).
  * Output surprisal_micro = n_tok * round(1e6*ln(T+V)) - Σ_t round(1e6*ln(c(t)+1)),
  * i.e. 1e6 × total surprisal in nats; divide by n_tok for the mean.
  *
  * Scale shape: fit is one explode + map-side-combined hash agg over tokens
  * (the shuffled volume is the VOCABULARY, not the corpus); scoring joins
  * the exploded corpus to the vocab on the token key — a plain shuffle
  * equi-join that AQE turns into a broadcast when the vocab is small, and
  * that stays a sort-merge join when it is not (a web-scale vocab does NOT
  * fit on the driver, so nothing here ever collects it). The (T, V) scalars
  * ride along as a broadcast single-row cross join. Two shuffles total.
  */
object Lm {

  /** Corpus unigram counts: one row per distinct token of the normalized
    * text, with its occurrence count. The "fit" half of the LM. */
  def unigramCounts(df: DataFrame, textCol: String): DataFrame =
    Par.spread(df).select(explode(Text.tokens(Text.normalize(col(textCol)))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("c"))

  /** Score each document by total/mean unigram surprisal under the
    * add-one-smoothed LM fit on `df` itself.
    * Output: idCol, n_tok (long), surprisal_micro (long — exact; see
    * object doc for the quantization contract). Documents with no tokens
    * after normalization are dropped (no tokens ⇒ no LM evidence). */
  def surprisal(df: DataFrame, idCol: String, textCol: String): DataFrame =
    surprisalAgainst(unigramCounts(df, textCol), df, idCol, textCol)

  /** Score documents against a FROZEN unigram LM — the production split of
    * [[surprisal]] (fit once on the standing corpus via [[unigramCounts]],
    * store that vocab table, score every incoming batch against it: the LM
    * analog of `Dedup.minhashLshPairsBetween`'s delta-vs-corpus shape).
    * `counts` must be a (token, c) frame as produced by [[unigramCounts]];
    * T and V are re-derived from it in one agg job, so callers persist only
    * the counts table between batches. Tokens the LM never saw take the
    * add-one floor p = 1/(T+V) — maximum surprisal ln(T+V) — so
    * out-of-domain text scores HIGH, which is exactly the filter's intent.
    * On the fit corpus itself this equals [[surprisal]] bit-for-bit (every
    * token is seen; the left join degenerates to the inner one). */
  def surprisalAgainst(counts: DataFrame, df: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    // T and V are exact longs; ln(T+V) is one double rounded once
    val totals = counts.agg(
      sum(col("c")).as("T"), count(lit(1)).as("V"))
    val toks = Par.spread(df)
      .select(col(idCol), explode(Text.tokens(Text.normalize(col(textCol)))).as("token"))
    toks
      .join(counts, Seq("token"), "left")
      .select(col(idCol),
        round(log(coalesce(col("c"), lit(0L)) + lit(1)) * lit(1000000L))
          .cast(LongType).as("s_micro"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tok"), sum(col("s_micro")).as("sum_c_micro"))
      .crossJoin(broadcast(totals))
      .select(col(idCol), col("n_tok"),
        (col("n_tok") * round(log(col("T") + col("V")) * lit(1000000L)).cast(LongType)
          - col("sum_c_micro")).as("surprisal_micro"))
  }

  /** Bigram-LM surprisal — the next step up from [[surprisal]]'s unigram
    * model and a much sharper fluency signal (word-salad text has plausible
    * unigrams but improbable transitions). Model: add-one-smoothed bigram
    * conditional p(w₂|w₁) = (c(w₁,w₂)+1)/(c(w₁)+V), where c(w₁) is w₁'s
    * count as a CONTEXT (Σ_w c(w₁,w)) and V the unigram vocabulary size —
    * the classic Laplace bigram estimator. A document's score is
    * Σ −ln p over its n−1 bigram positions.
    *
    * Same determinism contract as [[surprisal]]: each position's surprisal
    * is round(1e6·ln(c₁+V)) − round(1e6·ln(c₂+1)) — two per-distinct-count
    * rounded doubles — and the per-document total is an exact long sum.
    * Documents with fewer than two tokens have no bigrams and are dropped.
    *
    * Scale shape: bigram positions come from zipping two array slices
    * (no self-join of the token stream); the fit is one hash-agg on the
    * (w₁,w₂) key (shuffled volume = the bigram VOCABULARY); scoring joins
    * positions to the bigram and context tables on their keys. Three
    * shuffles total, all map-side combined. */
  def bigramSurprisal(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = Text.tokens(Text.normalize(col(textCol)))
    val bg = df
      .select(col(idCol), toks.as("__t"))
      .filter(size(col("__t")) >= 2)
      .select(col(idCol), explode(arrays_zip(
        slice(col("__t"), lit(1), size(col("__t")) - lit(1)).as("w1"),
        slice(col("__t"), lit(2), size(col("__t")) - lit(1)).as("w2"))).as("__bg"))
      .select(col(idCol), col("__bg.w1").as("w1"), col("__bg.w2").as("w2"))
    val c2 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val c1 = c2.groupBy("w1").agg(sum(col("c2")).as("c1"))
    val vocab = df
      .select(explode(toks).as("t")).agg(countDistinct(col("t")).as("V"))
    bg
      .join(c2, Seq("w1", "w2"))
      .join(c1, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .select(col(idCol),
        (round(log(col("c1") + col("V")) * lit(1000000L)).cast(LongType)
          - round(log(col("c2") + lit(1)) * lit(1000000L)).cast(LongType)).as("s_micro"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"), sum(col("s_micro")).as("surprisal_micro"))
  }

  /** PMI collocation mining (Church & Hanks 1990) — the classic
    * multi-word-expression detector a tokenizer/vocab pipeline runs before
    * deciding merge candidates: for adjacent token pair (a,b) with bigram
    * count c_ab, corpus unigram counts c_a/c_b and total bigram count N,
    * PMI = ln(c_ab·N / (c_a·c_b)). Positive ⇒ the pair co-occurs more
    * than independence predicts.
    *
    * Determinism: pmi_micro = round(ln c_ab·1e6) + round(ln N·1e6) −
    * round(ln c_a·1e6) − round(ln c_b·1e6) — one rounded ln per count
    * (the [[surprisal]] contract), so the value and the (pmi DESC, a, b)
    * ordering are engine-exact. `minCount` drops rare-pair noise (PMI's
    * known low-count pathology) BEFORE the joins.
    *
    * Scale shape: two map-side-combined hash aggs (bigrams, unigrams) +
    * two joins keyed on the word — shuffled volume is the vocabulary and
    * bigram-vocabulary, never the corpus; N rides as a broadcast scalar. */
  def pmiCollocations(df: DataFrame, textCol: String, minCount: Long = 5): DataFrame = {
    val toks = Text.tokens(Text.normalize(col(textCol)))
    val bg = df.select(toks.as("__t")).filter(size(col("__t")) >= 2)
      .select(explode(arrays_zip(
        slice(col("__t"), lit(1), size(col("__t")) - lit(1)).as("w1"),
        slice(col("__t"), lit(2), size(col("__t")) - lit(1)).as("w2"))).as("__bg"))
      .select(col("__bg.w1").as("w1"), col("__bg.w2").as("w2"))
    val c2 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val uni = df.select(explode(toks).as("t")).groupBy("t").agg(count(lit(1)).as("cu"))
    val nBg = c2.agg(sum(col("c2")).as("nbg"))
    c2.filter(col("c2") >= minCount)
      .join(uni.select(col("t").as("w1"), col("cu").as("c_a")), Seq("w1"))
      .join(uni.select(col("t").as("w2"), col("cu").as("c_b")), Seq("w2"))
      .crossJoin(broadcast(nBg))
      .select(col("w1"), col("w2"), col("c2").as("n_pair"),
        (round(log(col("c2")) * lit(1000000L)).cast(LongType)
          + round(log(col("nbg")) * lit(1000000L)).cast(LongType)
          - round(log(col("c_a")) * lit(1000000L)).cast(LongType)
          - round(log(col("c_b")) * lit(1000000L)).cast(LongType)).as("pmi_micro"))
  }

  /** Per-domain distribution shift: KL(P_domain ‖ P_corpus) over unigram
    * distributions, one row per value of `domainCol` — the mixing-audit
    * metric a curation pipeline logs next to [[Ops.mixByBudget]] (a domain
    * whose token distribution diverges hard from the corpus is either a
    * contamination signal or an under-sampled source).
    *
    * KL = Σ_t (c_st/T_s)·ln((c_st·T)/(T_s·c_t)) where c_st is token t's
    * count within domain s and c_t/T are corpus-wide. Always ≥ 0; 0 iff the
    * domain's distribution equals the corpus's. Reported as
    * kl_sum_micro = Σ_t round((ln c_st − ln T_s − ln c_t + ln T)·c_st·1e6)
    * — each term is one fixed-shape double expression rounded ONCE to a
    * long before the (exact, order-independent) sum, the same quantization
    * contract as [[surprisal]]; mean KL in nats = kl_sum_micro/(1e6·T_s).
    *
    * Scale shape: two map-side-combined aggs (domain×token, token) + one
    * shuffle join on the token key; domain totals join broadcast (one row
    * per domain). Nothing is collected. */
  def domainKl(df: DataFrame, domainCol: String, textCol: String): DataFrame = {
    val domTok = Par.spread(df)
      .select(col(domainCol), explode(Text.tokens(Text.normalize(col(textCol)))).as("token"))
      .groupBy(domainCol, "token").agg(count(lit(1)).as("cst"))
    val domTotal = domTok.groupBy(domainCol).agg(sum(col("cst")).as("Ts"))
    val corpusTok = domTok.groupBy("token").agg(sum(col("cst")).as("ct"))
    val corpusTotal = corpusTok.agg(sum(col("ct")).as("TT"))
    domTok
      .join(corpusTok, Seq("token"))
      .join(broadcast(domTotal), Seq(domainCol))
      .crossJoin(broadcast(corpusTotal))
      .select(col(domainCol),
        round((log(col("cst")) - log(col("Ts")) - log(col("ct")) + log(col("TT")))
          * col("cst") * lit(1000000L)).cast(LongType).as("term_micro"),
        col("Ts"))
      .groupBy(domainCol)
      .agg(max(col("Ts")).as("n_tokens"), sum(col("term_micro")).as("kl_sum_micro"))
  }

  /** Jensen–Shannon divergence between two corpus slices' token
    * distributions (r14 ✚) — the symmetric, BOUNDED companion of
    * [[domainKl]]: JSD(P,Q) = ½KL(P‖M) + ½KL(Q‖M) with M = ½(P+Q),
    * always finite (a token present on only one side contributes
    * c·ln 2, never ∞ like plain KL) and capped at ln 2 ≈ 0.693 nats for
    * fully disjoint vocabularies — the scale-free "how different are
    * these two corpora" number for snapshot drift, source comparison, or
    * train-vs-eval distribution checks. Using exact counts,
    * (c_a/T_A)/M = 2·c_a·T_B/(c_a·T_B + c_b·T_A), so each side's
    * per-token term is c·ln(that ratio) — quantized to micro per TOKEN
    * and summed as an exact long (the [[domainKl]]/[[mutualInfo]]
    * discipline; the ln runs on one fixed double tree both engines
    * share), with the two ÷T normalizations and the ½ as ONE final
    * mirrored expression. Output, one row: `n_tokens_a`, `n_tokens_b`,
    * `jsd_micro` (null when either slice has no tokens — there is no
    * distribution to compare).
    *
    * Scale shape: two explode + hash-agg token tables (the only
    * data-sized passes — each corpus is exploded exactly ONCE: the joined
    * vocab table is pinned and the totals derive from it, ADVICE r14),
    * one vocab-sized full-outer join, one broadcast 1-row total frame,
    * one final agg — no window, nothing driver-side. */
  def domainJsd(dfA: DataFrame, dfB: DataFrame, textCol: String): DataFrame = {
    def toks(df: DataFrame) = Par.spread(df)
      .select(explode(Text.tokens(Text.normalize(col(textCol)))).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("token").agg(count(lit(1)).as("c"))
    // the vocab join is pinned so the per-side totals read the SAME blocks
    // instead of re-exploding each corpus (full-outer keeps every token, so
    // sum(ca)/sum(cb) over it ARE the side totals)
    val v = toks(dfA).select(col("token"), col("c").as("ca"))
      .join(toks(dfB).select(col("token"), col("c").as("cb")),
        Seq("token"), "full_outer")
      .select(coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
      .localCheckpoint(true)
    val tot = v.agg(coalesce(sum(col("ca")), lit(0L)).as("TA"),
      coalesce(sum(col("cb")), lit(0L)).as("TB"))
    val j = v.crossJoin(broadcast(tot))
    val den = col("ca").cast("double") * col("TB").cast("double") +
      col("cb").cast("double") * col("TA").cast("double")
    // the t > 0 guard keeps ANSI division happy on an empty side (den = 0
    // only when the OTHER total is 0 — and then jsd is null anyway); with
    // both totals positive, c > 0 already implies den > 0
    def term(c: Column, t: Column) = when(c > 0 && t > 0,
      round(log(lit(2d) * c.cast("double") * t.cast("double") / den)
        * c * lit(1000000L)).cast(LongType)).otherwise(lit(0L))
    j.agg(max(col("TA")).as("n_tokens_a"), max(col("TB")).as("n_tokens_b"),
        coalesce(sum(term(col("ca"), col("TB"))), lit(0L)).as("__sp"),
        coalesce(sum(term(col("cb"), col("TA"))), lit(0L)).as("__sq"))
      .select(col("n_tokens_a"), col("n_tokens_b"),
        when(col("n_tokens_a") > 0 && col("n_tokens_b") > 0,
          round((col("__sp").cast("double") / col("n_tokens_a").cast("double")
            + col("__sq").cast("double") / col("n_tokens_b").cast("double"))
            / 2d).cast(LongType)).as("jsd_micro"))
  }

  /** Mutual information between two discrete columns (✚ extension): the
    * feature/metadata dependence audit — MI(A;B) = Σ_ab p(ab)·ln(p(ab) /
    * (p(a)p(b))). "Does `lang` carry information about `source`?" is the
    * question a curation pipeline asks before stratifying on either.
    *
    * Same exactness contract as [[domainKl]]: counts are exact longs, each
    * cell's term is quantized to micro-nats BEFORE the sum (one rounded ln
    * tree per cell, identical on any engine), and the total is an exact
    * long sum — partition-order independent, bit-reproducible (the q147
    * oracle contract). Rows with a null on either side are dropped (MI is
    * over the observed joint distribution).
    *
    * Cost: one hash-agg builds the joint (|A×B| cells); the marginals are
    * re-aggregated FROM the joint (never a second data scan), and the term
    * join is cell-sized. At 100 TB the data is read once; everything after
    * is proportional to distinct cells. Output: one row
    * (n_pairs, mi_micro). */
  def mutualInfo(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val joint = df
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(aCol, bCol).agg(count(lit(1)).as("cab"))
    val ma = joint.groupBy(aCol).agg(sum(col("cab")).as("ca"))
    val mb = joint.groupBy(bCol).agg(sum(col("cab")).as("cb"))
    val tot = joint.agg(sum(col("cab")).as("n"))
    joint
      .join(broadcast(ma), Seq(aCol))
      .join(broadcast(mb), Seq(bCol))
      .crossJoin(broadcast(tot))
      .select(col("n"),
        round((log(col("cab")) - log(col("ca")) - log(col("cb")) + log(col("n")))
          * col("cab") * lit(1000000L)).cast(LongType).as("term_micro"))
      .groupBy(col("n").as("n_pairs"))
      .agg(sum(col("term_micro")).as("mi_micro"))
  }

  /** Good–Turing frequency-of-frequencies table (Gale & Sampson's raw GT
    * counts): for each observed occurrence count r, how many vocabulary
    * types have it (`n_r`) and the GT-adjusted count
    *   r* = (r+1)·N_{r+1}/N_r
    * (`r_star_micro`, micro-quantized; null where N_{r+1} = 0 — the
    * highest counts, where raw GT is undefined and real smoothers switch
    * to a fitted tail). The r = 1 row doubles as the unseen-mass estimate:
    * P₀ = N₁/T. Everything upstream of the one final division is an exact
    * integer, so the table hash-compares across engines.
    *
    * Scale shape: the [[unigramCounts]] token agg (shuffle volume =
    * vocabulary), then a count-keyed agg to the TINY (distinct r) table
    * and a self-join on r+1 — the output is bounded by the largest count,
    * not the vocab. */
  def goodTuring(df: DataFrame, textCol: String): DataFrame = {
    val ff = unigramCounts(df, textCol)
      .groupBy(col("c").as("r")).agg(count(lit(1)).as("n_r"))
    val nx = ff.select((col("r") - 1).as("r"), col("n_r").as("__n_next"))
    ff.join(nx, Seq("r"), "left")
      .select(col("r"), col("n_r"),
        when(col("__n_next").isNotNull,
          round((col("r") + 1).cast("double") * col("__n_next").cast("double")
            / col("n_r").cast("double") * 1e6).cast(LongType))
          .as("r_star_micro"))
  }

  /** Vocabulary-growth (Heaps'-law) curve: at each corpus-prefix
    * checkpoint — all documents with `idCol` ≤ K — the cumulative token
    * count, distinct-type count, and type/token ratio. The saturation
    * diagnostic a corpus-collection effort reads: a flattening type curve
    * means new data is re-treading old vocabulary. Checkpoints with no
    * documents report zeros (their curve point is real: nothing collected
    * yet). Exact integers; the one division (TTR) is micro-quantized.
    *
    * Scale shape: one token explode feeding TWO tiny aggregates — each
    * type's FIRST checkpoint (min doc id → smallest covering K) and
    * per-checkpoint token mass — then a |checkpoints|-sized running sum;
    * the corpus is scanned once, never once per checkpoint. */
  def vocabGrowth(df: DataFrame, idCol: String, textCol: String,
      checkpoints: Seq[Long]): DataFrame = {
    require(checkpoints.nonEmpty && checkpoints == checkpoints.sorted
      && checkpoints.distinct == checkpoints, "checkpoints must be sorted, distinct")
    val spark = df.sparkSession
    import spark.implicits._
    val cps = checkpoints.toDF("k")
    val cpArr = array(checkpoints.map(lit): _*)
    // smallest checkpoint covering a doc id (null = beyond every checkpoint)
    def cover(id: Column): Column =
      array_min(filter(cpArr, c => c >= id))
    val toks = Par.spread(df).filter(col(idCol).isNotNull)
      .select(col(idCol).cast(LongType).as("id"),
        explode(Text.tokens(Text.normalize(col(textCol)))).as("token"))
    // per-type: the first checkpoint at which the type exists
    val firstK = toks.groupBy("token").agg(min(col("id")).as("fid"))
      .select(cover(col("fid")).as("k"))
      .filter(col("k").isNotNull)
      .groupBy("k").agg(count(lit(1)).as("new_types"))
    val tokMass = toks.select(cover(col("id")).as("k"))
      .filter(col("k").isNotNull)
      .groupBy("k").agg(count(lit(1)).as("new_tokens"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("k"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    cps.join(firstK, Seq("k"), "left").join(tokMass, Seq("k"), "left")
      .withColumn("n_tokens", sum(coalesce(col("new_tokens"), lit(0L))).over(w))
      .withColumn("n_types", sum(coalesce(col("new_types"), lit(0L))).over(w))
      .select(col("k"), col("n_tokens"), col("n_types"),
        when(col("n_tokens") > 0,
          round(col("n_types").cast("double") / col("n_tokens").cast("double") * 1e6)
            .cast(LongType)).as("ttr_micro"))
  }
}
