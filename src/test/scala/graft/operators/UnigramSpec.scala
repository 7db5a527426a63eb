package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Unigram-LM tokenizer: the Viterbi HOF expression against hand-computed
  * segmentations, seeding, EM survival rules, and encode fallbacks. */
class UnigramSpec extends SparkTestBase {
  import spark.implicits._

  private def vocabDf(entries: (String, Long)*) =
    entries.toSeq.toDF("piece", "cost_micro").withColumn("cnt", lit(1L))

  test("viterbiBest: picks min-cost segmentation; tie-break by segmentation string; null when unsegmentable") {
    val words = Seq("abab", "ba", "axb").toDF("word")
    val v = vocabDf("a" -> 100L, "b" -> 100L, "ab" -> 150L)
    val got = Unigram.segmentWords(words, v, maxPieceLen = 2)
      .select(col("word"), col("c"), col("s"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) null else (r.getLong(1), r.getString(2)))).toMap
    // "abab": ab+ab = 300 = a+b+ab = ... all length-4 paths: (a b a b)=400,
    // (ab ab)=300, (a b ab)=350, (ab a b)=350 -> min 300
    assert(got("abab") == (300L, "ab ab"))
    // "ba": only b+a = 200
    assert(got("ba") == (200L, "b a"))
    // "axb": 'x' not in vocab, no piece covers it -> null
    assert(got("axb") == null)
    // exact cost tie resolved by the smaller segmentation STRING: with
    // cost(ab)=200=cost(a)+cost(b), "a b" < "ab" lexicographically
    val tied = Unigram.segmentWords(Seq("ab").toDF("word"),
      vocabDf("a" -> 100L, "b" -> 100L, "ab" -> 200L), 2)
    assert(tied.select("s").as[String].head() == "a b")
  }

  test("seedVocab: substring counts weighted by word freq; single chars always kept") {
    val wc = Seq(("aba", 2L), ("bb", 3L)).toDF("word", "cnt")
    val seed = Unigram.seedVocab(wc, maxPieceLen = 2, seedSize = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // substrings: aba -> a(x2 pos)*2=4, b*2, ab*2, ba*2 ; bb -> b(2 pos)*3=6, bb*3
    // full counts: a=4, b=8, ab=2, ba=2, bb=3; top-3 by (cnt desc, piece):
    // b(8), a(4), bb(3); chars a, b already in -> plus nothing else
    assert(seed == Map("b" -> 8L, "a" -> 4L, "bb" -> 3L))
    // seedSize=1 keeps top-1 plus ALL single chars
    val s1 = Unigram.seedVocab(wc, 2, 1).collect().map(_.getString(0)).toSet
    assert(s1 == Set("b", "a"))
  }

  test("train: deterministic, partition-invariant, chars survive pruning, costs are -1e6 ln(p)") {
    val docs = (Seq.fill(6)("the cat sat") ++ Seq.fill(3)("the mat") ++
      Seq("cats scatter")).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val v1 = Unigram.train(docs, "text", maxWordLen = 8, maxPieceLen = 3,
      seedSize = 12, vocabSize = 8, emRounds = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val v2 = Unigram.train(docs.repartition(7), "text", maxWordLen = 8,
      maxPieceLen = 3, seedSize = 12, vocabSize = 8, emRounds = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(v1.sortBy(_._1).toSeq == v2.sortBy(_._1).toSeq)
    val pieces = v1.map(_._1).toSet
    // every corpus character survives every prune
    val alphabet = "thecatsmr".toSet.map((c: Char) => c.toString)
    assert(alphabet.subsetOf(pieces))
    // cost identity against the count column
    val total = v1.map(_._2).sum.toDouble
    for ((_, cnt, cost) <- v1)
      assert(cost == math.round(-math.log(cnt / total) * 1e6))
  }

  test("saveVocab/loadVocab: round-trip encodes identically; load rejects junk") {
    val docs = Seq((1L, "the cat sat"), (2L, "the mat")).toDF("doc_id", "text")
    val vocab = Unigram.train(docs, "text", maxWordLen = 8, maxPieceLen = 3,
      seedSize = 10, vocabSize = 8, emRounds = 1)
    val dir = java.nio.file.Files.createTempDirectory("ugvocab").toString
    Unigram.saveVocab(vocab, s"$dir/v")
    val re = Unigram.loadVocab(spark, s"$dir/v")
    def enc(v: org.apache.spark.sql.DataFrame) =
      Unigram.encodeCounts(docs, "doc_id", "text", v)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(enc(re) == enc(vocab))
    // wrong-schema directory rejected fail-fast
    docs.write.mode("overwrite").parquet(s"$dir/junk")
    intercept[IllegalArgumentException](Unigram.loadVocab(spark, s"$dir/junk"))
    intercept[IllegalArgumentException](Unigram.loadVocab(spark, s"$dir/missing"))
  }

  test("encodeCounts: per-doc word/piece totals; unknown-char words fall back to one piece per char") {
    val docs = Seq((1L, "ab ab ba"), (2L, "zq ab")).toDF("doc_id", "text")
    val v = vocabDf("a" -> 100L, "b" -> 100L, "ab" -> 150L)
    val got = Unigram.encodeCounts(docs, "doc_id", "text", v, maxPieceLen = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // doc 1: ab(1 piece) x2 + ba(2 pieces) -> 3 words, 4 pieces
    assert(got(1L) == (3L, 4L))
    // doc 2: zq unsegmentable -> 2 char-fallback pieces; ab -> 1
    assert(got(2L) == (2L, 3L))
  }

  test("segmentWords: empty word -> null, no runtime error (ADVICE r10)") {
    val v = vocabDf("a" -> 100L, "b" -> 100L)
    val got = Unigram.segmentWords(Seq("", "ab").toDF("word"), v,
        maxPieceLen = 2)
      .select(col("word"), col("s")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("") == null)   // the WordPiece convention, not an error
    assert(got("ab") == "a b")
  }

  test("segmentWords: vocab piece longer than maxPieceLen rejected loudly (ADVICE r10)") {
    val over = vocabDf("a" -> 100L, "abc" -> 50L)
    val e = intercept[Throwable] {
      Unigram.segmentWords(Seq("a").toDF("word"), over, maxPieceLen = 2)
        .collect()
    }
    val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString(" | ")
    assert(msgs.contains("maxPieceLen"), msgs)
  }
}
