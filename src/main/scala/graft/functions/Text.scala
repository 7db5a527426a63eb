package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column expressions for training-data pipelines (north-star
  * extension beyond the reference surface — SURVEY §2.1 ✚): tokenization,
  * language-ID, quality scoring, fingerprinting, shingling, SimHash.
  *
  * Everything here is built from codegen'd built-in functions (higher-order
  * array functions, `md5`, regexes) — no UDFs, so the whole pipeline stays
  * inside WholeStageCodegen and scales linearly with executors. Hashes are
  * md5-based so the DuckDB oracle can reproduce them bit-for-bit.
  */
object Text {

  /** Whitespace tokenizer. */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-style subword pre-tokenization (the GPT-2-family pattern shape,
    * ASCII-only so Java and RE2 regex engines agree): letter runs, digit
    * runs, and punctuation runs each form a token, with an optional leading
    * space attached. The realistic token-count proxy for LLM data budgeting
    * (whitespace counting underestimates ~30% on punctuated text). */
  val bpeishPattern = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"

  def bpeishTokens(c: Column): Column = regexp_extract_all(c, lit(bpeishPattern), lit(0))

  def bpeishTokenCount(c: Column): Column = size(bpeishTokens(c))

  /** Normalize: lowercase, collapse non-alphanumeric runs to single spaces. */
  def normalize(c: Column): Column =
    trim(regexp_replace(lower(c), "[^a-z0-9]+", " "))

  /** Deterministic 128-bit document fingerprint: md5 over normalized text.
    * (The reference has no fingerprinting; rolling-hash analog chosen as md5
    * so the oracle matches exactly.) */
  def fingerprint(c: Column): Column = md5(normalize(c))

  /** Distinct n-word shingles, built with `transform` over an index sequence
    * (no explode — stays one row per document until the caller decides to
    * shuffle). Empty array when the document has fewer than n tokens. */
  def wordShingles(c: Column, n: Int): Column = {
    val toks = tokens(c)
    when(size(toks) >= n,
      array_distinct(
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + lit(1), lit(n))))))
      .otherwise(array().cast("array<string>"))
  }

  /** Tiny per-language stopword profiles for the n-gram/stopword language-ID
    * heuristic. Fixed order = deterministic tie-break (first wins). */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu", "den"),
    "es" -> Seq("el", "la", "que", "y", "en", "un", "es", "los"),
    "fr" -> Seq("le", "la", "et", "un", "une", "est", "dans", "les"),
    "zh" -> Seq("的", "是", "在", "了", "我", "有", "和", "不"))

  /** #tokens of `c` that appear in `profile`. */
  private def profileHits(toks: Column, profile: Seq[String]): Column =
    size(filter(toks, t => array_contains(array(profile.map(lit): _*), t)))

  /** Language-ID: argmax of stopword-profile hit counts over lowercased
    * tokens; "und" (undetermined) when no profile scores > 0. */
  def langId(c: Column): Column = {
    val toks = tokens(lower(c))
    val scores = langProfiles.map { case (l, p) => (l, profileHits(toks, p)) }
    val best = scores.map(_._2).reduce(greatest(_, _))
    scores.foldRight(lit("und")) { case ((l, s), acc) =>
      when(s === best && s > 0, lit(l)).otherwise(acc)
    }
  }

  /** Heuristic quality score in [0,1]:
    *   0.3 * min(tokens/100, 1)            — enough content
    * + 0.4 * min(5 * stopword_ratio, 1)    — natural-language-ness
    * + 0.3 * alnum_chars / chars           — low punctuation/noise
    * Pure double arithmetic, evaluated in a fixed order so the DuckDB oracle
    * reproduces it bit-for-bit. */
  def qualityScore(c: Column): Column = {
    val toks = tokens(lower(c))
    val nTok = size(toks).cast("double")
    val stopHits = profileHits(toks, langProfiles.head._2).cast("double")
    val alnum = length(regexp_replace(c, "[^A-Za-z0-9]", "")).cast("double")
    val chars = length(c).cast("double")
    lit(0.3) * least(nTok / lit(100.0), lit(1.0)) +
      lit(0.4) * least(lit(5.0) * (stopHits / nTok), lit(1.0)) +
      lit(0.3) * (alnum / chars)
  }

  /** 32-bit word from hex chars [from, from+8) of an md5 digest, as a long.
    * Cross-engine: Spark `conv(hex,16,10)`; DuckDB nibble-sum arithmetic. */
  def md5Word32(s: Column, from: Int): Column =
    conv(substring(md5(s), from, 8), 16, 10).cast("long")

  /** 32-bit SimHash over whitespace tokens of the normalized text.
    * Bit j of the result is 1 iff the (+1/−1) vote sum over tokens of bit j
    * of the token's 32-bit md5 word is positive. ONE pass over the tokens
    * with a 32-counter array accumulator — md5 is computed once per token
    * (not once per bit). No shuffle, no UDF. */
  def simhash(c: Column): Column = {
    val toks = tokens(normalize(c))
    val votes = aggregate(
      toks,
      array_repeat(lit(0L), 32),
      (acc, t) => {
        val h = md5Word32(t, 1)
        zip_with(acc, sequence(lit(0), lit(31)),
          (a, j) => a + lit(2) * pmod(floor(h / pow(lit(2.0), j)), lit(2)).cast("long") - lit(1))
      })
    aggregate(
      zip_with(votes, sequence(lit(0), lit(31)),
        (v, j) => when(v > 0, pow(lit(2.0), j).cast("long")).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)
  }
}
