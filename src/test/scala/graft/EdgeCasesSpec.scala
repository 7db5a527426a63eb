package graft

import org.apache.spark.sql.functions._
import graft.functions.{Multimodal, Text}
import graft.ml.TableCleaner
import graft.operators.{Dedup, Grouping, Ops, Similarity}

/** Negative paths and boundary inputs across modules. */
class EdgeCasesSpec extends SparkTestBase {
  import spark.implicits._

  test("empty input: filters/dedup/groupby/text produce empty, not errors") {
    val empty = Seq.empty[(Long, String)].toDF("id", "text")
    assert(Ops.filters(empty, ("id", ">", 0L)).count() == 0)
    assert(Ops.dropDuplicates(empty, Seq("id")).count() == 0)
    assert(Grouping.groupby(empty, Seq("id")).count().count() == 0)
    assert(Dedup.exact(empty, "id", "text").count() == 0)
    assert(Dedup.ngramJaccardPairs(empty, "id", "text").count() == 0)
  }

  test("single-document corpus: no pairs, components keep the singleton") {
    val one = Seq((1L, "only doc here with some tokens")).toDF("doc_id", "text")
    assert(Dedup.minhashLshPairs(one, "doc_id", "text").count() == 0)
    val cc = Dedup.connectedComponents(
      Seq.empty[(Long, Long)].toDF("id_a", "id_b"), one, "doc_id").collect()
    assert(cc.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 1L)))
  }

  test("text functions on empty/whitespace strings") {
    val df = Seq("", "   ", "x").toDF("t")
    val counts = df.select(Text.tokenCount(col("t"))).collect().map(_.getInt(0))
    assert(counts.last == 1) // "x"
    val fp = df.select(Text.fingerprint(col("t"))).collect().map(_.getString(0))
    assert(fp(0) == fp(1)) // both normalize to "" -> same fingerprint
    assert(df.select(Text.wordShingles(col("t"), 3)).collect()
      .forall(_.getSeq[String](0).isEmpty))
  }

  test("TableCleaner.fromJson rejects unknown column type") {
    intercept[IllegalArgumentException] {
      TableCleaner.fromJson("""[{"name":"x","type":"mystery"}]""")
    }
  }

  test("cleaner on all-null numeric column: falls back to impute value") {
    val df = Seq[Option[Double]](None, None).toDF("v")
    val c = new TableCleaner
    c.registerNumeric("v", impute = "mean")
    // mean of all-null is null -> getDouble throws; document the behavior:
    // fit on all-null data is a caller error surfaced as an exception
    intercept[Exception] { c.cleanTable(df).collect() }
  }

  test("ANN operators on an empty corpus: empty result, not an error") {
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val qs = Seq((1L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    assert(Similarity.bucketedTopK(empty, qs, "vec_id", "embedding", k = 3).count() == 0)
    assert(Similarity.ivfTopK(empty, qs, "vec_id", "embedding", k = 3).count() == 0)
    assert(Similarity.bruteForceTopK(empty, qs, "vec_id", "embedding", k = 3).count() == 0)
    assert(Dedup.embeddingNearDupPairs(empty, "vec_id", "embedding").count() == 0)
    assert(Similarity.pqTopK(empty, qs, "vec_id", "embedding", k = 3).count() == 0)
    assert(Similarity.ivfPqTopK(empty, qs, "vec_id", "embedding", k = 3).count() == 0)
  }

  test("embedding between/semantic paths on empty sides: empty results, not errors") {
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val some = Seq((1L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    // empty corpus index: any delta matches nothing
    val emptyIx = Dedup.embeddingIndex(empty, "vec_id", "embedding")
    assert(Dedup.embeddingNearDupPairsBetween(some, emptyIx, "vec_id", "embedding").count() == 0)
    emptyIx.release()
    // empty delta against a real index: nothing to match
    val ix = Dedup.embeddingIndex(some, "vec_id", "embedding", signBits = 3)
    assert(Dedup.embeddingNearDupPairsBetween(empty, ix, "vec_id", "embedding").count() == 0)
    ix.release()
    // semantic dedup of an empty corpus is the empty corpus
    assert(Dedup.dedupedCorpusByEmbedding(empty, "vec_id", "embedding").count() == 0)
  }

  test("multimodal: zero-byte payload yields zero frames and valid features") {
    val df = Seq((1L, "")).toDF("id", "t")
    val m = Multimodal.pack(df, "id", "t", "text/plain")
    assert(Multimodal.frameSample(m, 100, 1).count() == 0)
    val f = Multimodal.extractFeatures(m).head()
    assert(f.n_bytes == 0L && f.width > 0)
  }

  test("repetition/pii on null text: zero signals and null outputs, not errors") {
    import graft.functions.{Pii, Repetition}
    val df = Seq((1L, Option("a b a b")), (2L, Option.empty[String])).toDF("id", "text")
    val rep = Repetition.ngramRepetition(df, "id", "text", 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rep(2L) == 0L && rep(1L) == 3L) // null text = empty doc; ids survive
    val line = Repetition.lineRepetition(df, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(line(2L) == 0L)
    val pii = df.select($"id", Pii.emailCount($"text").as("n"), Pii.redact($"text").as("r"))
      .collect().map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(pii(2L) == ((None, None))) // null in, null out (SQL semantics)
  }

  test("sampleToBudget: null-weight rows are dropped without breaking neighbors") {
    import graft.operators.Ops
    val df = Seq((1L, Option(5L)), (2L, Option.empty[Long]), (3L, Option(5L)))
      .toDF("id", "w").withColumn("g", lit("x"))
    val kept = Ops.sampleToBudget(df, Seq("g"), "id", "w", budget = 100L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept.subsetOf(Set(1L, 3L)) && kept == Set(1L, 3L))
  }

  test("r9 stats on empty/degenerate inputs: no crashes, defined nulls or empty outputs") {
    import graft.operators.{Audit, Intervals, Sequences, Stats}
    import spark.implicits._
    val eLS = Seq.empty[(Long, String)].toDF("v", "g")
    val eLB = Seq.empty[(Long, Boolean)].toDF("v", "y")
    val eLL = Seq.empty[(Long, Long)].toDF("x", "y")
    // scalar-summary ops on empty input: a single all-null/zero row or empty
    val auc = Stats.rocAuc(eLB, "v", "y").collect()
    assert(auc.isEmpty || auc(0).isNullAt(3))
    assert(Stats.ksTest(eLL.select(col("x").as("v")),
      eLL.select(col("x").as("v")), "v").collect()
      .forall(r => r.isNullAt(2)))
    val sp = Stats.spearman(eLL, "x", "y").collect()
    assert(sp.isEmpty || sp(0).isNullAt(1))
    val conc = Stats.concentration(eLS.select(col("v").as("k"), col("v").as("x")),
      "k", "x").collect()
    assert(conc.isEmpty || conc(0).isNullAt(2))
    // grouped/per-level ops on empty input: empty output, never a throw
    assert(Stats.robustOutliers(eLS, "g", "v").collect().isEmpty)
    assert(Stats.kaplanMeier(eLB, "v", "y").collect().isEmpty)
    assert(Stats.psi(eLS, eLS, "g").collect().isEmpty)
    assert(Stats.benford(eLS, "v").collect().isEmpty)
    assert(Stats.woeIv(eLS.select(col("g").as("f"), (col("v") > 0).as("y")),
      "f", "y").collect().isEmpty)
    assert(Intervals.coverage(Seq.empty[(String, Long, Long)].toDF("k", "lo", "hi"),
      "k", "lo", "hi").collect().isEmpty)
    assert(Sequences.transitionCounts(
      Seq.empty[(Long, String, Long, Long)].toDF("u", "s", "t", "id"),
      "u", "s", "t", "id").collect().isEmpty)
    // diff of two empties: no keys, no rows
    assert(Audit.diffSummary(eLS, eLS, Seq("g")).collect().isEmpty)
    // kappa on empty: one null row or empty
    val kp = Stats.cohenKappa(eLS.select(col("g").as("a"), col("g").as("b")),
      "a", "b").collect()
    assert(kp.isEmpty || kp(0).isNullAt(2))
  }

  test("wave-6/7 operators on empty/degenerate inputs: defined zeros/nulls, not errors") {
    import graft.operators.{Graph, Joins, Layout, Lm, Pack, Ranks, Sketches, Stats, Unigram}
    val emptyKV = Seq.empty[(Long, Long)].toDF("id", "v")
    val emptyGrp = Seq.empty[(String, Long, Long, Long)].toDF("g", "o", "id", "v")
    // apportion: empty and all-zero-weight inputs yield no rows (wt = 0 guard)
    assert(Pack.apportion(emptyKV.toDF("src", "w"), Seq("src"), "w", 10L).count() == 0)
    assert(Pack.apportion(Seq(("a", 0L)).toDF("src", "w"), Seq("src"), "w", 10L)
      .count() == 0)
    // change point: empty and single-row groups are absent, not wrong
    assert(Stats.changePointByGroup(emptyGrp, "g", "o", "id", "v").count() == 0)
    // average precision on empty input: one row, zero counts, null AP
    val ap = Stats.averagePrecision(
      Seq.empty[(Long, Long, Boolean)].toDF("s", "id", "y"), "s", "id", "y")
      .collect()(0)
    assert(ap.getAs[Long]("n_rows") == 0L && ap.isNullAt(ap.fieldIndex("ap_micro")))
    // bootstrap on empty input: zero rows, null mean/CI (no replicate survives)
    val bs = Stats.poissonBootstrapMean(emptyKV, "id", "v").collect()(0)
    assert(bs.getAs[Long]("n_rows") == 0L && bs.isNullAt(bs.fieldIndex("mean_micro")))
    // HITS on an empty edge list: empty output, no max-division blowup
    assert(Graph.hits(Seq.empty[(String, String)].toDF("s", "d"), "s", "d").count() == 0)
    // skyline/zone maps/SNM/winnow/count-min/good-turing/vocab growth on empty
    assert(Ops.skylinePerGroup(emptyGrp, "g", "o", "v").count() == 0)
    val zm = Layout.zoneMap(emptyKV.toDF("k", "id"), "k", "id", Seq("k"), 4L)
    assert(zm.count() == 0)
    val zs = Layout.zonesScanned(zm, "k", 0L, 10L).collect()(0)
    assert(zs.getAs[Long]("n_chunks") == 0L && zs.isNullAt(zs.fieldIndex("scan_micro")))
    assert(Joins.sortedNeighborhoodPairs(
      Seq.empty[(String, String)].toDF("id", "k"), "id", "k", 3).count() == 0)
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.winnowPairs(emptyDocs, "doc_id", "text").count() == 0)
    assert(Lm.goodTuring(emptyDocs, "text").count() == 0)
    val vg = Lm.vocabGrowth(emptyDocs, "doc_id", "text", Seq(10L)).collect()(0)
    assert(vg.getAs[Long]("n_tokens") == 0L && vg.isNullAt(vg.fieldIndex("ttr_micro")))
    // rboOverlap of two empty runs: no query ids, empty output
    val emptyRun = Seq.empty[(Long, String, Long)].toDF("query_id", "nbr_id", "rank")
    assert(Similarity.rboOverlap(emptyRun, emptyRun).count() == 0)
    assert(Sketches.countMinBuild(emptyKV.toDF("item", "x"), "item").count() == 0)
    // r10: unigram training/encode on an empty corpus — empty vocab, empty
    // encode, no division/log blowup anywhere in the chain
    assert(Unigram.train(emptyDocs, "text").count() == 0)
    assert(Unigram.encodeCounts(emptyDocs, "doc_id", "text",
      Unigram.train(emptyDocs, "text")).count() == 0)
    // r10: Ranks on an empty frame — empty output, no bucket-agg failure;
    // withRangeBucket's min/max come back null -> degenerate single bucket
    val emptyV = Seq.empty[(Long, Long)].toDF("v", "id")
    assert(Ranks.positions(emptyV, Ranks.floorDiv(col("v"), 4L),
      Seq(col("v"), col("id")), "p").count() == 0)
    assert(Ranks.runningSums(Ranks.withRangeBucket(emptyV, "v", "b"),
      col("b"), Seq(col("v")), Seq("id" -> "cum")).count() == 0)
  }

  test("r12 operators on empty / all-null / degenerate inputs") {
    import graft.operators.{Baskets, Sequences, Stats}
    val emptyEv = Seq.empty[(Long, String, Long, Long)].toDF("k", "s", "t", "id")
    // session paths, lifetime paths, funnel: empty in, empty/zeros out
    assert(Sequences.sessionTopPaths(emptyEv, "k", "s", "t", "id",
      gapUs = 100L).count() == 0)
    assert(Sequences.topPaths(emptyEv, "k", "s", "t", "id").count() == 0)
    val fz = Sequences.funnelWithin(emptyEv, "k", "s", "t",
      Seq("a", "b"), 100L).collect()
    assert(fz.map(_.getLong(2)).toSeq == Seq(0L, 0L)
      && fz.forall(_.isNullAt(3)))
    // all-null keys are dropped everywhere, never NPE
    val nullEv = Seq((Option.empty[Long], "x", 1L, 1L)).toDF("k", "s", "t", "id")
    assert(Sequences.sessionTopPaths(nullEv, "k", "s", "t", "id", 100L).count() == 0)
    // dense growth: empty frame -> empty spine, no sequence() crash
    val emptyM = Seq.empty[(java.sql.Date, Long)].toDF("month", "v")
    assert(Sequences.periodGrowthDense(emptyM, "month", "v").count() == 0)
    // single-month series: value row, both growths null
    val one = Seq((java.sql.Date.valueOf("1995-01-01"), 5L)).toDF("month", "v")
    val o = Sequences.periodGrowthDense(one, "month", "v").head()
    assert(o.getLong(1) == 5L && o.isNullAt(2) && o.isNullAt(3))
    // winsorize: empty in, empty out (pin of an empty frame is fine);
    // single value is its own bounds and mean
    val emptyW = Seq.empty[(String, Double, Long)].toDF("g", "v", "id")
    assert(Stats.winsorizedMean(emptyW, "g", "v", "id").count() == 0)
    val w1 = Stats.winsorizedMean(
      Seq(("g", 7.0, 1L)).toDF("g", "v", "id"), "g", "v", "id").head()
    assert(w1.getLong(1) == 1L && w1.getLong(6) == 7000000L)
    // samplers and baskets: empty in, empty out
    val emptyI = Seq.empty[(Long, Long, Long)].toDF("id", "grp", "w")
    assert(Ops.sampleKPerGroup(emptyI, Seq("grp"), "id", 3).count() == 0)
    assert(Ops.weightedSampleKPerGroup(emptyI, Seq("grp"), "id", "w", 3).count() == 0)
    assert(Ops.splitByGroupHash(emptyI, "grp",
      Seq("a" -> 0.5, "b" -> 1.0)).count() == 0)
    val emptyB = Seq.empty[(Long, String)].toDF("bk", "it")
    assert(Baskets.pairLift(emptyB, "bk", "it").count() == 0)
  }

  test("r13 operators on empty / all-null / degenerate inputs") {
    import graft.operators.{Sequences, Similarity, Stats}
    // fold labels / fraction samples: empty in, empty out; null keys to
    // the last fold (CASE else), null fractions drop their group
    val emptyI = Seq.empty[(Long, Long)].toDF("id", "grp")
    assert(Ops.foldByGroupHash(emptyI, "grp", 3).count() == 0)
    val frNull = Seq((Option.empty[Double], 1L)).toDF("fraction", "grp")
    val rows = Seq((1L, 1L), (2L, 1L)).toDF("id", "grp")
    assert(Ops.sampleByFractions(rows, Seq("grp"), "id", frNull).count() == 0)
    // retention: empty and all-null-key events -> empty matrix; a
    // single-event corpus is its own cohort at offset 0, retained 100%
    val emptyEv = Seq.empty[(Long, Long)].toDF("u", "t")
    assert(Sequences.retentionCohorts(emptyEv, "u", "t", 10L).count() == 0)
    assert(Sequences.retentionFromState(
      Sequences.periodState(emptyEv, "u", "t", 10L)).count() == 0)
    val oneEv = Seq((1L, 5L)).toDF("u", "t")
    val r1 = Sequences.retentionCohorts(oneEv, "u", "t", 10L).head()
    assert(r1.getLong(2) == 1L && r1.getLong(4) == 1000000L)
    // conformal: empty in, empty out; a 1-row group refuses (k = 2 > 1)
    val emptyS = Seq.empty[(String, Double, Long)].toDF("g", "v", "id")
    assert(Stats.conformalThreshold(emptyS, "g", "v", "id").count() == 0)
    val c1 = Stats.conformalThreshold(
      Seq(("g", 3.0, 1L)).toDF("g", "v", "id"), "g", "v", "id", 10).head()
    assert(c1.getLong(1) == 1L && c1.getLong(2) == 2L && c1.isNullAt(3))
    // fleiss: empty input still emits its one summary row, all-null stats
    val emptyR = Seq.empty[(Long, String)].toDF("item", "cat")
    val fk = Stats.fleissKappa(emptyR, "item", "cat").collect()(0)
    assert(fk.getLong(0) == 0L && fk.isNullAt(4))
    // bradley-terry: empty games and self-games yield no items
    val emptyG = Seq.empty[(String, String)].toDF("w", "l")
    assert(Stats.bradleyTerry(emptyG, "w", "l").count() == 0)
    assert(Stats.bradleyTerry(Seq(("a", "a")).toDF("w", "l"), "w", "l")
      .count() == 0)
    // centroid drift: one empty side -> inner join drops everything
    val emptyVec = Seq.empty[(Long, Array[Double])].toDF("g", "v")
    val someVec = Seq((1L, Array(1.0, 0.0))).toDF("g", "v")
    assert(Similarity.centroidDrift(someVec, emptyVec, "v", "g").count() == 0)
    // funnel stream state types: the batch funnel with a single step list
    // still emits its one row on empty input (fixed step list contract)
    val emptyFe = Seq.empty[(Long, String, Long)].toDF("k", "s", "t")
    val f1 = Sequences.funnelWithin(emptyFe, "k", "s", "t", Seq("x"), 5L).head()
    assert(f1.getLong(2) == 0L && f1.isNullAt(3))
  }
}
