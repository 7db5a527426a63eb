package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class ClassifySpec extends SparkTestBase {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "spam", "buy cheap pills now buy now"),
    (2L, "spam", "cheap pills cheap deal"),
    (3L, "ham", "meeting notes for the quarterly review"),
    (4L, "ham", "please review the meeting agenda"),
    (5L, "ham", "quarterly planning meeting tomorrow")
  ).toDF("id", "label", "text")

  test("nbPredict: class-typical vocabulary classifies to its class") {
    val m = Classify.nbTrain(corpus, "label", "text")
    val test = Seq((10L, "cheap pills"), (11L, "quarterly meeting review"))
      .toDF("id", "text")
    val pred = Classify.nbPredict(m, test, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pred == Map(10L -> "spam", 11L -> "ham"))
  }

  test("nbPredict: no-overlap and empty docs fall back to prior + denominator evidence") {
    val m = Classify.nbTrain(corpus, "label", "text")
    // zero tokens after normalization: score = prior only → majority class
    val empty = nbPredictOf(m, Seq((20L, "")).toDF("id", "text"))
    // "" still tokenizes to one empty-string token (split contract) which
    // is unseen in training → n_tok=1: ham's prior edge ln(0.6/0.4) beats
    // its larger denominator ln(30/25), so ham wins
    assert(empty.collect().head.getString(1) == "ham")
    // unseen-vocab doc: all tokens contribute only −n_tok·ln(T_label+V).
    // At n_tok=3 the denominator dominates the prior: 3·ln(30/25) > ln(0.6/0.4),
    // so the label with the SMALLER token total (spam, T=10 vs ham's 15) wins
    // despite the smaller prior — correct Laplace-smoothed NB behavior.
    val oov = nbPredictOf(m, Seq((21L, "zzz qqq www")).toDF("id", "text"))
    assert(oov.collect().head.getString(1) == "spam")
  }

  private def nbPredictOf(m: Classify.NbModel, df: org.apache.spark.sql.DataFrame) =
    Classify.nbPredict(m, df, "id", "text")

  test("nb scores are partition-independent exact longs; save/load ≡ fresh") {
    val test = Seq((30L, "cheap meeting"), (31L, "pills review deal"), (32L, "now"))
      .toDF("id", "text")
    val a = rowSet(nbPredictOf(Classify.nbTrain(corpus, "label", "text"), test))
    val b = rowSet(nbPredictOf(Classify.nbTrain(corpus.repartition(7), "label", "text"),
      test.repartition(5)))
    assert(a == b && a.nonEmpty)
    val dir = java.nio.file.Files.createTempDirectory("nbmodel").toString
    Classify.saveNbModel(Classify.nbTrain(corpus, "label", "text"), dir)
    val loaded = Classify.loadNbModel(spark, dir)
    assert(rowSet(nbPredictOf(loaded, test)) == a)
    // partial save fails fast with the component name
    val broken = java.nio.file.Files.createTempDirectory("nbbroken").toString
    Classify.nbTrain(corpus, "label", "text").tokenLik
      .write.mode("overwrite").parquet(s"$broken/token_lik")
    val e = intercept[IllegalArgumentException](Classify.loadNbModel(spark, broken))
    assert(e.getMessage.contains("class_stats"))
  }

  test("nb ties break to the lexicographically first label") {
    val sym = Seq((1L, "a", "x y"), (2L, "b", "x y")).toDF("id", "label", "text")
    val m = Classify.nbTrain(sym, "label", "text")
    val p = Classify.nbPredict(m, Seq((9L, "x")).toDF("id", "text"), "id", "text").collect().head
    assert(p.getString(1) == "a") // identical score under both labels
  }

  test("nbPredictTop2: same winner as nbPredict, exact top1-top2 margin, single-class null") {
    val m = Classify.nbTrain(corpus, "label", "text")
    val test = Seq((30L, "cheap meeting"), (31L, "pills review deal")).toDF("id", "text")
    val top1 = Classify.nbPredict(m, test, "id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    val top2 = Classify.nbPredictTop2(m, test, "id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    top1.foreach { case (id, (lbl, s1)) =>
      val r = top2(id)
      assert(r.getString(1) == lbl && r.getLong(2) == s1)
      assert(r.getLong(3) >= 0L) // margin = s1 - s2 >= 0, exact micro-nats
    }
    // symmetric two-doc tie: margin exactly 0
    val symModel = Classify.nbTrain(
      Seq((1L, "a", "x"), (2L, "b", "x")).toDF("id", "label", "text"), "label", "text")
    val tie = Classify.nbPredictTop2(symModel,
      Seq((9L, "x")).toDF("id", "text"), "id", "text").collect().head
    assert(tie.getLong(3) == 0L)
    // one-class model: no runner-up, null margin
    val one = Classify.nbTrain(
      Seq((1L, "a", "x y")).toDF("id", "label", "text"), "label", "text")
    val r1 = Classify.nbPredictTop2(one, Seq((9L, "x")).toDF("id", "text"),
      "id", "text").collect().head
    assert(r1.isNullAt(3))
  }
}
