package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class RepetitionPiiSpec extends SparkTestBase {
  import spark.implicits._

  test("ngramRepetition: counts, top cover and dup chars on a known doc") {
    // "a b a b a b": bigrams = [a b, b a, a b, b a, a b]
    //   count("a b")=3, count("b a")=2, chars each = 3
    //   all 5 bigrams duplicated → dup_chars = 3*3 + 2*3 = 15
    //   max_cover = 3*3 = 9; doc chars = 11
    val df = Seq((1L, "a b a b a b"), (2L, "all words here are unique")).toDF("id", "text")
    val out = Repetition.ngramRepetition(df, "id", "text", 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == ((5L, 9L * 1000000L / 11L, 15L * 1000000L / 11L)))
    // unique bigrams: top cover = the longest bigram's chars * 1, dup = 0
    val (n2, top2, dup2) = out(2L)
    assert(n2 == 4L && dup2 == 0L && top2 > 0L)
  }

  test("ngramRepetition: short and empty docs get zeros, all ids survive") {
    val df = Seq((1L, "one two"), (2L, ""), (3L, "x y z x y z")).toDF("id", "text")
    val out = Repetition.ngramRepetition(df, "id", "text", 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L) == ((0L, 0L, 0L)) && out(2L) == ((0L, 0L, 0L)))
    // "x y z x y z": trigrams = [x y z, y z x, z x y, x y z] → x y z dup'd
    assert(out(3L)._1 == 4L && out(3L)._3 == (2L * 5L) * 1000000L / 11L)
  }

  test("ngramRepetition n=1 on an empty-string doc: zeros, no ANSI divide-by-zero") {
    // "" tokenizes to [""] (split semantics), so a stats row EXISTS with
    // doc chars 0 — the ppm division must yield zeros, not DIVIDE_BY_ZERO
    val df = Seq((1L, ""), (2L, "a a b")).toDF("id", "text")
    val out = Repetition.ngramRepetition(df, "id", "text", 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L)._2 == 0L && out(1L)._3 == 0L)
    // unigrams of "a a b": count(a)=2 → cover 2, dup 2; doc chars 5
    assert(out(2L) == ((3L, 2L * 1000000L / 5L, 2L * 1000000L / 5L)))
  }

  test("lineRepetition: duplicate-line fractions, blank lines dropped") {
    val df = Seq(
      (1L, "alpha\n\n  alpha  \nbeta"), // lines: alpha, alpha, beta
      (2L, "no newlines here"),
      (3L, "\n\n")                      // no non-empty lines
    ).toDF("id", "text")
    val out = Repetition.lineRepetition(df, "id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // doc 1: 3 lines, 2 duplicated; chars: alpha(5)*2 dup of 5+5+4=14 total
    assert(out(1L) == ((3L, 2L * 1000000L / 3L, 10L * 1000000L / 14L)))
    assert(out(2L) == ((1L, 0L, 0L)))
    assert(out(3L) == ((0L, 0L, 0L)))
  }

  test("pii: counts and typed redaction, fixed application order") {
    val s = "write bob.smith+x@mail.example.org or 192.168.1.250, " +
      "call +1 555-123-4567 / 555 987 6543; no pii after"
    val df = Seq((1L, s)).toDF("id", "text")
    val r = df.select(
      Pii.emailCount($"text").as("e"), Pii.ipv4Count($"text").as("i"),
      Pii.phoneCount($"text").as("p"), Pii.redact($"text").as("red")).head()
    assert(r.getAs[Int]("e") == 1 && r.getAs[Int]("i") == 1 && r.getAs[Int]("p") == 2)
    val red = r.getAs[String]("red")
    assert(red == "write <EMAIL> or <IP>, call <PHONE> / <PHONE>; no pii after")
  }

  test("pii: email whose host looks like a dotted quad is consumed as email first") {
    val df = Seq((1L, "x user@10.0.0.1.com y 10.0.0.2 z")).toDF("id", "text")
    val r = df.select(Pii.redact($"text").as("red"),
      Pii.emailCount($"text").as("e"), Pii.ipv4Count($"text").as("i")).head()
    assert(r.getAs[String]("red") == "x <EMAIL> y <IP> z")
    assert(r.getAs[Int]("e") == 1)
    // counting runs on the RAW text: the quad inside the email host counts too
    assert(r.getAs[Int]("i") == 2)
  }

  test("ngramSignalsPerRow equals the relational form on every doc (incl. degenerate)") {
    val df = Seq(
      (1L, "a b a b a b"), (2L, "all words here are unique"),
      (3L, "x y z x y z"), (4L, ""), (5L, "one two"),
      (6L, "s s s s s s s s")
    ).toDF("id", "text")
    val relational = Repetition.ngramRepetition(df, "id", "text", 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val perRow = df.select($"id", Repetition.ngramSignalsPerRow($"text", 2).as("s"))
      .select($"id", $"s.n_ngrams", $"s.top_ngram_cover_ppm", $"s.dup_ngram_char_ppm")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(perRow == relational)
  }

  test("charEntropy: exact micro-nat totals — uniform, constant, empty, null") {
    val df = Seq((1L, "abcd"), (2L, "aaaa"), (3L, ""), (5L, "aabb"))
      .toDF("id", "text")
      .unionByName(Seq(4L).toDF("id").select($"id", lit(null).cast("string").as("text")))
    val out = Repetition.charEntropy(df, "id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // "abcd": 4 · (round(ln4·1e6) − round(ln1·1e6)) = 4 · 1386294
    assert(out(1L) == ((4L, 4L * 1386294L)))
    assert(out(2L) == ((4L, 0L)))        // constant string: zero entropy
    assert(out(3L) == ((0L, 0L)))        // empty
    assert(out(4L) == ((0L, 0L)))        // null
    // "aabb": 2·(round(ln4·1e6) − round(ln2·1e6)) · 2 chars = 4·693147
    assert(out(5L) == ((4L, 4L * 693147L)))
    val rep = Repetition.charEntropy(df.repartition(5), "id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rep == out)
  }

  test("repetition plan is relational: no interpreted higher-order aggregate in the exploded path") {
    val df = Seq((1L, "a b a b")).toDF("id", "text")
    val plan = Repetition.ngramRepetition(df, "id", "text", 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate")) // explode → count shape, codegen'd aggs
  }
}
