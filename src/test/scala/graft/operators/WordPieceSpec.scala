package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** WordPiece: likelihood-scored merges (hand-traced rounds incl. the
  * score ties the (score DESC, a, b) order must break), MaxMatch
  * longest-first encoding with the single-[UNK] convention, and the
  * vocab save/load round-trip. */
class WordPieceSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "low low low"), (2L, "lower lower"), (3L, "newest")
  ).toDF("doc_id", "text")

  test("train: hand-traced likelihood merges with tie-breaks") {
    // r1: (##s,##t) score 1/(1·1)=1 -> ##st
    // r2: 0.25 tie {(##e,##r),(n,##e),(##e,##st)} -> (##e,##r) ('#'<'n', '##r'<'##st')
    // r3: 0.5 tie {(n,##e),(##e,##st)} -> (##e,##st) -> ##est
    val m = WordPiece.train(docs, "text", numMerges = 3).orderBy("rank")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(m.toSeq == Seq(
      (1, "##s", "##t", "##st", 1L),
      (2, "##e", "##r", "##er", 2L),
      (3, "##e", "##st", "##est", 1L)))
    // score_nano of round 1 is exactly 1e9 (score 1.0)
    val s1 = WordPiece.train(docs, "text", 1).collect()(0).getAs[Long]("score_nano")
    assert(s1 == 1000000000L)
    // early stop: more merges requested than pairs exist still terminates
    assert(WordPiece.train(Seq((1L, "ab")).toDF("id", "text"), "text", 50)
      .count() == 1L) // one pair (a,##b), then single symbols everywhere
  }

  test("maxMatch: longest-first, ## continuations, UNK null, empty-word null") {
    val merges = WordPiece.train(docs, "text", 3)
    val vocab = WordPiece.vocabPieces(docs, "text", merges)
    val words = Seq("lowest", "low", "lax", "newest", "n", "t").toDF("word")
    val got = WordPiece.segmentWords(words, vocab, maxPieceLen = 8)
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(got("lowest").contains("l ##o ##w ##est")) // longest match at tail
    assert(got("low").contains("l ##o ##w"))
    assert(got("lax").isEmpty)                        // ##a not in vocab -> UNK
    assert(got("newest").contains("n ##e ##w ##est"))
    assert(got("n").contains("n"))                    // bare initial char
    // 't' is never word-INITIAL in the corpus: only ##t exists -> UNK,
    // the positional-vocab property production WordPiece shares
    assert(got("t").isEmpty)
  }

  test("encodeCounts: UNK costs one piece; counts join back per doc") {
    val merges = WordPiece.train(docs, "text", 3)
    val vocab = WordPiece.vocabPieces(docs, "text", merges)
    val d = Seq((7L, "low lowest lax"), (8L, "")).toDF("doc_id", "text")
    val got = WordPiece.encodeCounts(d, "doc_id", "text", vocab)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // low=3 pieces, lowest=4, lax=UNK=1; empty doc has no words -> no row
    assert(got == Set((7L, 3L, 8L)))
  }

  test("saveVocab/loadVocab: round-trip segments identically; junk rejected") {
    val merges = WordPiece.train(docs, "text", 2)
    val vocab = WordPiece.vocabPieces(docs, "text", merges)
    val dir = java.nio.file.Files.createTempDirectory("wpvocab").toString
    WordPiece.saveVocab(vocab, s"$dir/v")
    val re = WordPiece.loadVocab(spark, s"$dir/v")
    val words = Seq("lower", "newest").toDF("word")
    def seg(v: org.apache.spark.sql.DataFrame) =
      WordPiece.segmentWords(words, v, 8).collect()
        .map(r => r.getString(0) -> r.getString(1)).toSet
    assert(seg(re) == seg(vocab))
    docs.write.mode("overwrite").parquet(s"$dir/junk")
    intercept[IllegalArgumentException](WordPiece.loadVocab(spark, s"$dir/junk"))
    intercept[IllegalArgumentException](WordPiece.loadVocab(spark, s"$dir/missing"))
  }

  test("segmentWords: unreachable over-long vocab piece rejected; ## prefix excluded from raw length (ADVICE r10)") {
    import spark.implicits._
    val words = Seq("lower").toDF("word")
    // ##wer has raw length 3 = maxPieceLen -> fine
    val ok = Seq("l", "o", "w", "e", "r", "##o", "##w", "##e", "##r",
      "##wer").toDF("piece")
    assert(WordPiece.segmentWords(words, ok, 3).collect()
      .head.getString(1) == "l ##o ##wer")
    // ##ower raw length 4 > 3 -> MaxMatch could never probe it; loud error
    val over = ok.unionByName(Seq("##ower").toDF("piece"))
    val e = intercept[Throwable] {
      WordPiece.segmentWords(words, over, 3).collect()
    }
    val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString(" | ")
    assert(msgs.contains("maxPieceLen"), msgs)
  }
}
