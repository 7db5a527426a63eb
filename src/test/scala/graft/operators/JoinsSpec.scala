package graft.operators

import graft.SparkTestBase

class JoinsSpec extends SparkTestBase {
  import spark.implicits._

  private def left = Seq((1, "a", 10.0), (1, "b", 11.0), (2, "c", 12.0), (4, "d", 13.0))
    .toDF("id", "tag", "x")
  private def right = Seq((1, "R1", 1.0), (2, "R2", 2.0), (2, "R3", 3.0), (3, "R4", 4.0))
    .toDF("id", "name", "x")

  test("inner join: cartesian per duplicate key (lc*rc multiplicity, cjoin.pyx semantics)") {
    val out = Joins.join(left, right, Seq("id"))
    assert(out.count() == 2 * 1 + 1 * 2) // id=1: 2*1, id=2: 1*2
  }

  test("duplicate non-key columns: left wins, right's dropped (join.py:7-13)") {
    val out = Joins.join(left, right, Seq("id"))
    assert(out.columns.toSeq == Seq("id", "tag", "x", "name")) // x from left only
    assert(out.filter($"id" === 1 && $"tag" === "a").head().getDouble(2) == 10.0)
  }

  test("left/right/full/semi/anti/cross row counts") {
    assert(Joins.join(left, right, Seq("id"), "left").count() == 5)  // 4 matched + d
    assert(Joins.join(left, right, Seq("id"), "right").count() == 5) // 4 matched + R4
    assert(Joins.join(left, right, Seq("id"), "full").count() == 6)
    assert(Joins.join(left, right, Seq("id"), "semi").count() == 3)  // a,b,c
    assert(Joins.join(left, right, Seq("id"), "anti").count() == 1)  // d
    assert(Joins.join(left, right, Nil, "cross").count() == 16)
    intercept[IllegalArgumentException] { Joins.join(left, right, Seq("id"), "sideways") }
  }

  test("property: inner-join row count equals sum of lc*rc over shared keys (10 seeded cases)") {
    val rnd = new scala.util.Random(42)
    (1 to 10).foreach { _ =>
      val lk = List.fill(30)(rnd.nextInt(9))
      val rk = List.fill(30)(rnd.nextInt(9))
      val l = lk.zipWithIndex.toDF("k", "lv")
      val r = rk.zipWithIndex.toDF("k", "rv")
      val expected = lk.groupBy(identity).map { case (k, ls) =>
        ls.size.toLong * rk.count(_ == k)
      }.sum
      assert(Joins.join(l, r, Seq("k")).count() == expected)
    }
  }

  // ---- bloom-pruned joins -------------------------------------------------

  test("bloomSemiFilter: NO false negatives — every matching key survives") {
    val big = (1L to 5000L).toDF("k")
    val keys = (1L to 5000L by 7).toDF("k") // 715 keys
    val kept = Joins.bloomSemiFilter(big, "k", keys, "k")
      .collect().map(_.getLong(0)).toSet
    assert((1L to 5000L by 7).forall(kept.contains)) // the bloom guarantee
    // false-positive rate sane: ≤ ~5× the nominal 1% on the non-members
    val fps = kept.size - 715
    assert(fps <= (5000 - 715) * 0.05, s"implausible fp count $fps")
  }

  test("bloomPrunedJoin ≡ plain inner join, and pruning actually drops rows") {
    val big = (1L to 2000L).map(i => (i % 500, i)).toDF("k", "v")
    val small = Seq(7L, 13L, 99L, 400L).toDF("k")
    val plain = Joins.join(big, small, Seq("k")).collect().map(_.toSeq).toSet
    val pruned = Joins.bloomPrunedJoin(big, small, "k").collect().map(_.toSeq).toSet
    assert(pruned == plain && plain.size == 16) // 4 keys × 4 multiplicity
    val surviving = Joins.bloomSemiFilter(big, "k", small, "k").count()
    assert(surviving >= 16 && surviving < 2000) // pruned below the scan size
  }

  test("bloom prune with empty key set drops everything; join stays empty") {
    val big = (1L to 100L).toDF("k")
    val none = Seq.empty[Long].toDF("k")
    assert(Joins.bloomPrunedJoin(big, none, "k").count() == 0)
  }

  // ---- fuzzy (edit-distance) joins ---------------------------------------

  test("fuzzySelfPairs ≡ naive all-pairs levenshtein filter (lossless signatures)") {
    val words = Seq("kitten", "sitten", "sittin", "mitten", "cat", "cart",
      "chart", "dog", "dig", "dug", "a", "ab", "")
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
    for (d <- 1 to 2) {
      val got = Joins.fuzzySelfPairs(words, "id", "s", d)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val rows = words.collect().map(r => (r.getLong(0), r.getString(1)))
      val want = (for {
        (ia, sa) <- rows; (ib, sb) <- rows if ia < ib
        if levenshteinRef(sa, sb) <= d
      } yield (ia, ib)).toSet
      assert(got == want, s"maxDist=$d")
    }
  }

  test("fuzzySelfPairs dist column is the exact edit distance; partition-independent") {
    val words = Seq((1L, "abc"), (2L, "abcd"), (3L, "azc"), (4L, "xyz")).toDF("id", "s")
    val out = Joins.fuzzySelfPairs(words, "id", "s", 2)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(4))).toMap
    assert(out == Map((1L, 2L) -> 1, (1L, 3L) -> 1, (2L, 3L) -> 2))
    val rep = Joins.fuzzySelfPairs(words.repartition(7), "id", "s", 2)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(4))).toMap
    assert(rep == out)
  }

  test("fuzzyJoin probe side: each left row matched within maxDist, empty string handled") {
    val corpus = Seq((10L, "spark"), (11L, "spork"), (12L, "shark"), (13L, "")).toDF("id", "s")
    val probes = Seq((1L, "spark"), (2L, "sparkk"), (3L, "zzz"), (4L, "x")).toDF("id", "s")
    val got = Joins.fuzzyJoin(probes, "id", "s", corpus, "id", "s", 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // "spark"→{spark, spork, shark}, "sparkk"→{spark}, "zzz"→{}, "x"→{""}
    assert(got == Set((1L, 10L), (1L, 11L), (1L, 12L), (2L, 10L), (4L, 13L)))
  }

  test("FuzzyIndex: build+extend+save/load probe ≡ from-scratch fuzzyJoin") {
    val base = Seq((10L, "spark"), (11L, "spork"), (12L, "shark")).toDF("id", "s")
    val batch = Seq((13L, "stork"), (14L, "sparse")).toDF("id", "s")
    val probes = Seq((1L, "spark"), (2L, "sparkk"), (3L, "zzz")).toDF("id", "s")
    val fresh = rowSet(Joins.fuzzyJoin(probes, "id", "s",
      base.unionByName(batch), "id", "s", 2))
    val ix0 = Joins.fuzzyIndex(base, "id", "s", maxDist = 2)
    val ext = Joins.extendFuzzyIndex(ix0, batch)
    assert(rowSet(Joins.fuzzyProbe(ext, probes, "id", "s")) == fresh)
    val dir = java.nio.file.Files.createTempDirectory("fzix").toString
    Joins.saveFuzzyIndex(ext, dir)
    ext.release(); ix0.release()
    val loaded = Joins.loadFuzzyIndex(spark, dir)
    assert(loaded.maxDist == 2 && loaded.idCol == "id")
    assert(rowSet(Joins.fuzzyProbe(loaded, probes, "id", "s")) == fresh)
    loaded.release()
    // partial save fails fast with the missing component named
    val broken = java.nio.file.Files.createTempDirectory("fzbroken").toString
    val ix2 = Joins.fuzzyIndex(base, "id", "s", 1)
    ix2.signatures.write.mode("overwrite").parquet(s"$broken/signatures")
    ix2.release()
    val e = intercept[IllegalArgumentException](Joins.loadFuzzyIndex(spark, broken))
    assert(e.getMessage.contains("params"))
  }

  /** Classic DP reference implementation for the spec oracle. */
  test("sortedNeighborhoodPairs: exact window pairs across bucket boundaries") {
    import spark.implicits._
    val names = Seq("aa", "ab", "ac", "ba", "bb").map(Tuple1(_)).toDF("name")
      .repartition(3)
    val got = Joins.sortedNeighborhoodPairs(names, "name", "name",
        window = 3, prefixLen = 1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(4))).toSet
    // every pair within 2 sort positions, INCLUDING the a/b prefix boundary
    assert(got == Set(("aa", "ab", 1L), ("aa", "ac", 2L), ("ab", "ac", 1L),
      ("ab", "ba", 2L), ("ac", "ba", 1L), ("ac", "bb", 2L), ("ba", "bb", 1L)))
    // pair volume is exactly N·(w−1) minus the tail clip, never quadratic
    val n = 40
    val big = (1 to n).map(i => Tuple1(f"k$i%03d")).toDF("name")
    assert(Joins.sortedNeighborhoodPairs(big, "name", "name", window = 4)
      .count() == (n * 3 - 3 - 2 - 1).toLong)
  }

  private def levenshteinRef(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    dp(a.length)(b.length)
  }
}
