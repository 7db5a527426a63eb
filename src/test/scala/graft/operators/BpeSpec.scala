package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.prop.TableDrivenPropertyChecks._
import graft.SparkTestBase

/** Learned BPE: merge selection, greedy fold semantics, encode ≡ training
  * segmentation, and the lossless-concatenation invariant. */
class BpeSpec extends SparkTestBase {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "low low low low low"),
    (2L, "lower lower"),
    (3L, "newest newest newest newest newest newest"),
    (4L, "widest widest widest")).toDF("doc_id", "text")

  test("train: reproduces the hand-computed Sennrich example merge sequence") {
    // word counts: low:5 lower:2 newest:6 widest:3
    // pair counts round 1: (e,s)=9 (newest+widest), (s,t)=9, (l,o)=7, ...
    // argmax ties (e,s) vs (s,t) at 9 → lexicographic picks (e,s)
    val merges = Bpe.train(corpus, "text", 4)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(merges(0) == ((1, "e", "s", 9L)))   // n e w e s t → n e w es t
    assert(merges(1) == ((2, "es", "t", 9L)))  // → n e w est
    // round 3: (l,o)=7 (low+lower) beats (n,e)=6, (w,est)=6...
    assert(merges(2) == ((3, "l", "o", 7L)))
    // round 4: (lo,w)=7 — "lo w" in low and lower
    assert(merges(3) == ((4, "lo", "w", 7L)))
  }

  test("applyMerge: greedy left-to-right non-overlap (the a-a-a case)") {
    val rows = Seq("a a a a a a", "x a b a b", "a", "b a a b")
      .toDF("syms")
      .select(Bpe.applyMerge(col("syms"), lit("a"), lit("a")).as("m"))
      .collect().map(_.getString(0)).toSeq
    // matches DuckDB list_reduce of the identical fold
    assert(rows == Seq("aa aa aa", "x a b a b", "a", "b aa b"))
  }

  test("applyMerge: fused tail never re-merges, multi-char symbols delimit exactly") {
    // symbol "xa" must not satisfy an ends-with-"a" check: delimiter makes it exact
    val out = Seq("xa b c", "a b a b").toDF("syms")
      .select(Bpe.applyMerge(col("syms"), lit("a"), lit("b")).as("m"))
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("xa b c", "ab ab"))
  }

  test("encodePieces ≡ final training segmentation; concat of pieces restores the word") {
    val merges = Bpe.train(corpus, "text", 6).orderBy("rank")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val enc = Bpe.encodeWords(corpus, "text", merges)
    // lossless: pieces concatenate back to the word, for every word
    assert(enc.filter(concat_ws("", col("pieces")) =!= col("word")).count() == 0L)
    // the trained segmentation re-derived by sequential encode: "newest"
    // after (e,s),(es,t),(l,o),(lo,w),... begins n e w est → further merges
    val newest = enc.filter(col("word") === "newest")
      .select(col("pieces")).head().getSeq[String](0)
    assert(newest.mkString(" ").endsWith("est") || newest.contains("est"))
    // encoding an UNSEEN word applies the same merges: "slowest"
    val unseen = Seq("slowest").toDF("w")
      .select(Bpe.encodePieces(col("w"), merges).as("p"))
      .head().getSeq[String](0)
    assert(unseen.mkString("") == "slowest")
  }

  test("pieceCounts: totals are word-count weighted and cover every character") {
    val merges = Bpe.train(corpus, "text", 2).orderBy("rank")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq // (e,s),(es,t)
    val pc = Bpe.pieceCounts(corpus, "text", merges)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // "est" appears once in newest (6) and widest (3) → 9; a raw e survives
    // in lower (2) and as newest's FIRST e (6) — only the second e merged
    assert(pc("est") == 9L && pc("e") == 8L)
    // total characters conserved: sum(len(piece)*total) == sum(len(word)*cnt)
    val lhs = pc.map { case (p, n) => p.length * n }.sum
    val rhs = Bpe.wordCounts(corpus, "text")
      .select(sum(length(col("word")) * col("cnt"))).head().getLong(0)
    assert(lhs == rhs)
  }

  test("docPieceCounts: per-doc sums via the dictionary join-back") {
    val merges = Bpe.train(corpus, "text", 2).orderBy("rank")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq // (e,s),(es,t)
    val out = Bpe.docPieceCounts(corpus, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // doc 3: "newest"×6 → 6 tokens, newest = n e w est → 4 pieces each
    assert(out(3L) == ((6L, 24L)))
    // doc 1: "low"×5 → untouched by (e,s)/(es,t): 3 chars each
    assert(out(1L) == ((5L, 15L)))
  }

  test("saveBpe/loadBpe round-trip preserves merge order; wrong table fails fast") {
    val merges = Bpe.train(corpus, "text", 4)
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe").toString
    Bpe.saveBpe(merges, dir)
    val loaded = Bpe.loadBpe(spark, dir)
    assert(loaded == merges.orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq)
    val bad = java.nio.file.Files.createTempDirectory("graft_bpe_bad").toString
    Seq((1, "x")).toDF("a", "b").write.mode("overwrite").parquet(bad)
    intercept[IllegalArgumentException] { Bpe.loadBpe(spark, bad) }
  }

  test("train stops early when no adjacent pairs remain") {
    val tiny = Seq((1L, "ab ab ab")).toDF("doc_id", "text")
    // one merge (a,b) exhausts the corpus: every word becomes one symbol
    val merges = Bpe.train(tiny, "text", 10).collect()
    assert(merges.length == 1)
  }

  test("batched train ≡ strictly sequential train (maxBatch=1), ranks and counts") {
    // a corpus with count ties, self-pairs, and overlapping-symbol pairs —
    // the cases selectBatch's guards exist for
    val tricky = corpus.unionByName(Seq(
      (5L, "aaaa aaaa banana banana banana"),
      (6L, "abcabc abcabc xyxyxy")).toDF("doc_id", "text"))
    val seqMerges = Bpe.train(tricky, "text", 12, maxBatch = 1)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val batMerges = Bpe.train(tricky, "text", 12, maxBatch = 16)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(batMerges == seqMerges)
  }
}
