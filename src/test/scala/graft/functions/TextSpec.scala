package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class TextSpec extends SparkTestBase {
  import spark.implicits._

  test("tokens/tokenCount/normalize/fingerprint") {
    val df = Seq("  Hello,  WORLD! 42 ").toDF("t")
    val r = df.select(
      Text.tokenCount(col("t")),
      Text.normalize(col("t")),
      Text.fingerprint(col("t"))).head()
    assert(r.getInt(0) == 3)
    assert(r.getString(1) == "hello world 42")
    // md5("hello world 42")
    assert(r.getString(2) == java.security.MessageDigest.getInstance("MD5")
      .digest("hello world 42".getBytes).map("%02x".format(_)).mkString)
  }

  test("wordShingles: n-grams, distinct, empty when too short") {
    val df = Seq("a b c d", "a b").toDF("t")
    val out = df.select(Text.wordShingles(col("t"), 3)).collect()
    assert(out(0).getSeq[String](0) == Seq("a b c", "b c d"))
    assert(out(1).getSeq[String](0).isEmpty)
  }

  test("wordShingles: repeated shingles dedup") {
    val df = Seq("x y x y x y").toDF("t")
    val out = df.select(Text.wordShingles(col("t"), 2)).head().getSeq[String](0)
    assert(out.toSet == Set("x y", "y x"))
  }

  test("bpeishTokens: letter/digit/punct runs with attached leading space") {
    val df = Seq("It's 42 degrees, really-hot today!").toDF("t")
    val toks = df.select(Text.bpeishTokens(col("t"))).head().getSeq[String](0)
    assert(toks == Seq("It", "'", "s", " 42", " degrees", ",", " really", "-", "hot", " today", "!"))
    assert(df.select(Text.bpeishTokenCount(col("t"))).head().getInt(0) == 11)
  }

  test("langId: stopword-profile argmax with deterministic tie-break, und when no hits") {
    val df = Seq(
      "the cat is in the hat", "der hund ist ein tier", "el gato es un animal",
      "le chat est dans la maison", "xyzzy qwerty").toDF("t")
    val out = df.select(Text.langId(col("t"))).collect().map(_.getString(0)).toSeq
    assert(out == Seq("en", "de", "es", "fr", "und"))
  }

  test("qualityScore: in [0,1], higher for natural text than noise") {
    val df = Seq("the cat is on the mat and it is happy", "@@@@ #### %%%% !!!!").toDF("t")
    val s = df.select(Text.qualityScore(col("t"))).collect().map(_.getDouble(0))
    assert(s.forall(v => v >= 0.0 && v <= 1.0))
    assert(s(0) > s(1))
  }

  test("qualityScore: empty/whitespace docs score 0.0 (never NaN), null stays null") {
    val df = Seq(Some(""), Some("   "), Some("\n\t "), None, Some("the cat sat"))
      .toDF("t")
    val s = df.select(Text.qualityScore(col("t")).as("q")).collect()
    assert(s(0).getDouble(0) == 0.0) // empty: was 0.0/0.0 = NaN before the guard
    assert(s(1).getDouble(0) == 0.0) // space-only (trim strips spaces on both engines)
    // tab/newline-only: NOT caught by the space-only trim (same on DuckDB),
    // but chars > 0 so no NaN was ever possible — just a tiny finite score
    assert(!s(2).getDouble(0).isNaN && s(2).getDouble(0) < 0.05)
    assert(s(3).isNullAt(0))         // null propagates (SQL semantics)
    assert(s(4).getDouble(0) > 0.0 && !s(4).getDouble(0).isNaN)
    // the gate property that motivated the fix: empty docs must NOT pass
    assert(df.filter(Text.qualityScore(col("t")) >= 0.5).count() <= 1)
  }

  test("simhash: deterministic, equal for equal token bags, uses full 64 bits") {
    val df = Seq("spark makes big data small", "spark makes big data small",
      "completely different words entirely here").toDF("t")
    val h = df.select(Text.simhash(col("t"))).collect().map(_.getLong(0))
    assert(h(0) == h(1))
    assert(h(0) != h(2))
    // the high word (bits 32-63) must actually be populated
    assert(h.exists(v => (v >>> 32) != 0L))
  }

  test("normalizeUnicode: NFC composes, NFKC folds compatibility forms, null propagates") {
    graft.expressions.GraftFunctions.register(spark)
    // "Cafe" + combining acute (decomposed, 5 chars) vs precomposed (4 chars)
    val df = Seq(Some("Cafe\u0301"), Some("plain ascii"), Some("\ufb01le \uff10"), None)
      .toDF("t")
    val nfc = df.select(Text.normalizeUnicode(col("t")),
      length(Text.normalizeUnicode(col("t")))).collect()
    assert(nfc(0).getString(0) == "Caf\u00e9")
    assert(nfc(0).getInt(1) == 4)
    assert(nfc(1).getString(0) == "plain ascii") // quick-check identity path
    assert(nfc(2).getString(0) == "\ufb01le \uff10") // NFC keeps compatibility chars
    assert(nfc(3).isNullAt(0))
    val nfkc = df.select(Text.normalizeUnicode(col("t"), "NFKC")).collect()
    assert(nfkc(2).getString(0) == "file 0") // ligature fi + fullwidth 0 folded
    // exact-dedup motivation: byte-different, render-identical docs converge
    val fp = Seq("Cafe\u0301", "Caf\u00e9").toDF("t")
      .select(Text.fingerprint(Text.normalizeUnicode(col("t")))).collect()
    assert(fp(0).getString(0) == fp(1).getString(0))
  }

  test("normalizeUnicode: invalid form rejected at construction") {
    graft.expressions.GraftFunctions.register(spark)
    val df = Seq("x").toDF("t")
    val e = intercept[Exception] {
      df.select(Text.normalizeUnicode(col("t"), "NFX")).collect()
    }
    assert(e.getMessage.contains("NFC") || e.getMessage.contains("form"))
  }

  test("stripMarkup: tags dropped, entities decoded once, whitespace folded, null rides") {
    val df = Seq(
      "<p>hello <b>world</b></p>",
      "a &amp;lt; b",                       // double-encoded: ONE decode pass
      "x&nbsp;&#39;y&#39;  <br/>\n z",
      "&lt;tag&gt; is text",
      null.asInstanceOf[String]
    ).toDF("t")
    val got = df.select(Text.stripMarkup(col("t")).as("c")).collect()
      .map(r => if (r.isNullAt(0)) null else r.getString(0))
    assert(got(0) == "hello world")
    assert(got(1) == "a &lt; b")            // NOT "a < b" - entities decode once
    assert(got(2) == "x 'y' z")
    assert(got(3) == "<tag> is text")       // decoded AFTER tag strip: stays text
    assert(got(4) == null)
  }
}
