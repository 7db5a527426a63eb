package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class QualitySpec extends SparkTestBase {
  import spark.implicits._

  private def rules(texts: Seq[Option[String]]) =
    texts.toDF("t").select(Quality.gopherRules(col("t")).as("g")).select("g.*").collect()

  test("gopherRules: a natural paragraph above the word floor passes every gate") {
    val good = Seq.fill(6)(
      "the quick brown fox jumps over that lazy dog and runs off with some of its dinner to be fair")
      .mkString(" ")
    val r = rules(Seq(Some(good)))(0)
    assert(r.getAs[Long]("n_words") >= 50)
    assert(r.getAs[Boolean]("pass"))
  }

  test("gopherRules: word-count gate fails short and empty docs, never NaN/null verdict") {
    val r = rules(Seq(Some("too short"), Some(""), Some("   ")))
    r.foreach { row =>
      assert(!row.getAs[Boolean]("ok_word_count"))
      assert(!row.getAs[Boolean]("pass"))
    }
    assert(r(1).getAs[Long]("n_words") == 0L)
    assert(r(2).getAs[Long]("n_words") == 0L)
  }

  test("gopherRules: symbol-ratio gate catches hash/ellipsis spam") {
    val base = Seq.fill(3)(
      "the quick brown fox jumps over that lazy dog and runs off with some of its dinner to be fair")
      .mkString(" ")
    val spam = base + " " + Seq.fill(30)("###...").mkString(" ")
    val r = rules(Seq(Some(base), Some(spam)))
    assert(r(0).getAs[Boolean]("ok_symbol_ratio"))
    assert(!r(1).getAs[Boolean]("ok_symbol_ratio"))
    assert(!r(1).getAs[Boolean]("pass"))
  }

  test("gopherRules: bullet and ellipsis line fractions") {
    val bullets = (1 to 10).map(i => s"- item $i").mkString("\n")
    val ells = (1 to 10).map(i => s"line $i trails off...").mkString("\n")
    val r = rules(Seq(Some(bullets), Some(ells)))
    assert(!r(0).getAs[Boolean]("ok_bullet_lines")) // 10/10 lines >= 0.9
    assert(!r(1).getAs[Boolean]("ok_ellipsis_lines")) // 10/10 lines >= 0.3
  }

  test("gopherRules: alpha-word fraction and stopword requirement") {
    val numbers = (1 to 60).map(_.toString).mkString(" ")
    val noStops = Seq.fill(60)("zebra").mkString(" ")
    val r = rules(Seq(Some(numbers), Some(noStops)))
    assert(!r(0).getAs[Boolean]("ok_alpha_words"))
    assert(r(1).getAs[Boolean]("ok_alpha_words"))
    assert(!r(1).getAs[Boolean]("ok_stopwords")) // zero of the 8 required words
    assert(!r(0).getAs[Boolean]("pass") && !r(1).getAs[Boolean]("pass"))
  }

  test("gopherRules: null text yields a null struct (SQL semantics)") {
    val out = Seq(Option.empty[String]).toDF("t")
      .select(Quality.gopherRules(col("t")).as("g")).collect()
    assert(out(0).isNullAt(0))
  }

  test("gopherRules: thresholds are tunable") {
    val short = "the cat sat on that mat with some of its friends to be fair have fun"
    val strict = rules(Seq(Some(short)))(0)
    assert(!strict.getAs[Boolean]("ok_word_count"))
    val loose = Seq(Some(short)).toDF("t")
      .select(Quality.gopherRules(col("t"),
        Quality.GopherThresholds(minWords = 5)).as("g")).select("g.*").collect()(0)
    assert(loose.getAs[Boolean]("ok_word_count"))
    assert(loose.getAs[Boolean]("pass"))
  }
}
