package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class SketchesLayoutSpec extends SparkTestBase {
  import spark.implicits._

  test("sketch + mergeEstimate: shard-union estimate within HLL error of exact") {
    // 10k distinct values spread over 8 shards (values repeat across shards)
    val df = (0 until 30000).map(i => (i % 8, (i * 2654435761L) % 10000))
      .toDF("shard", "v")
    val exact = df.select("v").distinct().count()
    val perShard = Sketches.sketch(df, Seq("shard"), "v")
    assert(perShard.count() == 8)
    val est = Sketches.mergeEstimate(perShard, Nil)
      .select("n_distinct_est").head().getLong(0)
    assert(math.abs(est - exact).toDouble / exact <= 0.05,
      s"estimate $est vs exact $exact")
  }

  test("sketch union: shard-merge and direct sketch both honor the error bound") {
    // NOTE: the two estimates need NOT be equal — a small direct sketch stays
    // in exact sparse mode (estimates 1300 exactly) while the shard union
    // promotes to the dense register array (estimated ~1286 when written);
    // the contract is the shared error bound, not estimate equality.
    val df = (0 until 5000).map(i => (i % 4, i.toLong % 1300)).toDF("shard", "v")
    val viaShards = Sketches.mergeEstimate(Sketches.sketch(df, Seq("shard"), "v"), Nil)
      .head().getLong(0)
    val direct = Sketches.mergeEstimate(
      Sketches.sketch(df.repartition(11), Nil, "v"), Nil).head().getLong(0)
    assert(math.abs(viaShards - 1300L) <= 65L, s"shard-merged estimate $viaShards")
    assert(math.abs(direct - 1300L) <= 65L, s"direct estimate $direct")
    // the estimate is NOT partitioning-deterministic either (the sparse→
    // dense promotion point depends on the partial-agg merge tree — measured
    // 1297 vs 1300 here), so all we assert under a third partitioning is the
    // bound again; never equality-compare or hash sketch estimates
    val viaShards2 = Sketches.mergeEstimate(
      Sketches.sketch(df.repartition(17), Seq("shard"), "v"), Nil).head().getLong(0)
    assert(math.abs(viaShards2 - 1300L) <= 65L, s"repartitioned estimate $viaShards2")
  }

  test("sketches survive a parquet round-trip: write shards, read back, union later") {
    // the workflow the operator exists for: build per-shard sketches once,
    // STORE them (kilobytes), answer distinct-count questions later by
    // unioning the stored state — no re-scan of the raw data
    val df = (0 until 8000).map(i => (i % 4, (i * 131L) % 2100)).toDF("shard", "v")
    val dirPath = java.nio.file.Files.createTempDirectory("graft_sketches")
    try {
      val dir = dirPath.toString
      Sketches.sketch(df, Seq("shard"), "v").write.mode("overwrite").parquet(dir)
      val reloaded = spark.read.parquet(dir)
      assert(reloaded.count() == 4)
      val est = Sketches.mergeEstimate(reloaded, Nil).head().getLong(0)
      val exact = df.select("v").distinct().count()
      assert(math.abs(est - exact).toDouble / exact <= 0.05, s"est $est vs exact $exact")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dirPath).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("quantileSketch + mergeQuantiles: merged estimate within rank brackets of exact") {
    // values 1..10000 per shard-interleaved frame: every quantile is known
    val df = (1L to 10000L).map(i => (i % 8, i)).toDF("shard", "v")
    val sk = Sketches.quantileSketch(df, Seq("shard"), "v")
    assert(sk.count() == 8)
    val est = Sketches.mergeQuantiles(sk, Nil, Seq(0.5, 0.99)).head()
    // k=200 bounds rank error at ~1.65%; assert a 2.5% bracket on values
    // (values are uniform 1..10000 so value brackets == rank brackets)
    val q50 = est.getLong(est.fieldIndex("q50"))
    val q99 = est.getLong(est.fieldIndex("q99"))
    assert(q50 >= 4750L && q50 <= 5250L, s"q50=$q50")
    assert(q99 >= 9650L && q99 <= 10000L, s"q99=$q99")
    // grouped merge: per-parity groups carry only even/odd values
    val df2 = (1L to 10000L).map(i => (i % 2, i % 8, i)).toDF("par", "shard", "v")
    val sk2 = Sketches.quantileSketch(df2, Seq("par", "shard"), "v")
    val g = Sketches.mergeQuantiles(sk2, Seq("par"), Seq(0.5))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(g(0L) >= 4750L && g(0L) <= 5250L && g(0L) % 2 == 0) // evens only
    assert(g(1L) >= 4750L && g(1L) <= 5250L && g(1L) % 2 == 1) // odds only
  }

  test("quantileSketch: retained values are exact longs; parquet round-trip merges") {
    val df = Seq(1L, 1L, 1L, 1000000L).map(v => ("s", v)).toDF("shard", "v")
    val sk = Sketches.quantileSketch(df, Seq("shard"), "v")
    // tiny input → sketch retains everything exactly
    val q = Sketches.mergeQuantiles(sk, Nil, Seq(0.5, 1.0)).head()
    assert(q.getLong(q.fieldIndex("q50")) == 1L)
    assert(q.getLong(q.fieldIndex("q100")) == 1000000L)
    // store-and-merge: sketches written to parquet, read back, merged later
    val dir = java.nio.file.Files.createTempDirectory("kll").toString
    sk.write.mode("overwrite").parquet(dir)
    val q2 = Sketches.mergeQuantiles(spark.read.parquet(dir), Nil, Seq(1.0)).head()
    assert(q2.getLong(q2.fieldIndex("q100")) == 1000000L)
  }

  test("frequencySketch + mergeFrequency: brackets always contain the true count") {
    graft.expressions.GraftFunctions.register(spark)
    // skewed stream: item 1 dominates, long tail of singletons; small map
    // (64) forces purges so estimates are genuinely approximate
    val rows = (Seq.fill(500)(1L) ++ Seq.fill(120)(2L) ++ (100L to 400L)).zipWithIndex
      .map { case (v, i) => (i % 4, v) }
    val df = rows.toDF("shard", "item")
    val sk = Sketches.frequencySketch(df, Seq("shard"), "item", maxMapSize = 64)
    val merged = Sketches.mergeFrequency(sk, Nil)
    val b = merged.select(call_function("graft_freq_bounds", col("fsketch"), lit(1L)).as("b"),
        call_function("graft_freq_bounds", col("fsketch"), lit(2L)).as("b2"))
      .head()
    val (e1, lo1, hi1) = { val a = b.getSeq[Long](0); (a(0), a(1), a(2)) }
    val (lo2, hi2) = { val a = b.getSeq[Long](1); (a(1), a(2)) }
    // deterministic guarantee: lower <= true <= upper, for hitters and all
    assert(lo1 <= 500L && 500L <= hi1 && e1 >= lo1 && e1 <= hi1)
    assert(lo2 <= 120L && 120L <= hi2)
    // small-cardinality stream: no purge ever happens -> bounds are EXACT
    val tiny = Seq((0, 7L), (0, 7L), (0, 9L)).toDF("shard", "item")
    val tb = Sketches.mergeFrequency(
        Sketches.frequencySketch(tiny, Seq("shard"), "item"), Nil)
      .select(call_function("graft_freq_bounds", col("fsketch"), lit(7L))).head().getSeq[Long](0)
    assert(tb == Seq(2L, 2L, 2L))
  }

  test("thetaSketch: set algebra on stored sketches — exact below capacity") {
    graft.expressions.GraftFunctions.register(spark)
    // A = 1..1000, B = 500..1500: |A∩B| = 501, |A∖B| = 499, |A∪B| = 1500
    val df = ((1L to 1000L).map(("a", _)) ++ (500L to 1500L).map(("b", _)))
      .toDF("grp", "k")
    val sk = Sketches.thetaSketch(df, Seq("grp"), "k")
    val a = sk.filter($"grp" === "a").select($"tsketch".as("sa"))
    val b = sk.filter($"grp" === "b").select($"tsketch".as("sb"))
    val r = a.crossJoin(b).select(
      Sketches.thetaSetBounds(col("sa"), col("sb"), "intersect").as("i"),
      Sketches.thetaSetBounds(col("sa"), col("sb"), "diff").as("d"),
      Sketches.thetaSetBounds(col("sa"), col("sb"), "union").as("u")).head()
    // below 2^12 retained keys the sketch is exact: est = lb = ub = truth
    assert(r.getSeq[Long](0) == Seq(501L, 501L, 501L))
    assert(r.getSeq[Long](1) == Seq(499L, 499L, 499L))
    assert(r.getSeq[Long](2) == Seq(1500L, 1500L, 1500L))
    // sampling mode (lgK = 4 → 16 nominal entries): bounds must bracket
    val sk2 = Sketches.thetaSketch(df, Seq("grp"), "k", lgK = 4)
    val r2 = sk2.filter($"grp" === "a").select($"tsketch".as("sa"))
      .crossJoin(sk2.filter($"grp" === "b").select($"tsketch".as("sb")))
      .select(Sketches.thetaSetBounds(col("sa"), col("sb"), "union").as("u")).head()
    val u2 = r2.getSeq[Long](0)
    assert(u2(1) <= 1500L && 1500L <= u2(2))
  }

  test("zValue2: known interleavings and two-sided monotonicity") {
    val df = Seq((5L, 3L)).toDF("a", "b") // a=101, b=011
    // interleave: a bits at even positions (1,0,1 -> 1+0+16), b at odd (1,1,0 -> 2+8)
    val z = df.select(Layout.zValue2($"a", $"b", 3).as("z")).head().getLong(0)
    assert(z == 27L)
    // z is monotone in each coordinate when the other bits allow (spot grid)
    val grid = (0 until 16).flatMap(a => (0 until 16).map(b => (a.toLong, b.toLong)))
      .toDF("a", "b")
    val zs = grid.select($"a", $"b", Layout.zValue2($"a", $"b", 4).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(zs.values.toSet.size == 256)        // bijective on the 4-bit grid
    assert(zs((0L, 0L)) == 0L && zs((15L, 15L)) == 255L)
    assert(zs((1L, 0L)) == 1L && zs((0L, 1L)) == 2L)
  }

  test("zValueN: 3-D interleaving, bijective on the grid, zValue2-compatible") {
    // x=1 (001), y=1 (001), w=1 (001) -> bits at positions 0,1,2 -> 7
    val one = Seq((1L, 1L, 1L)).toDF("x", "y", "w")
    assert(one.select(Layout.zValueN(Seq($"x", $"y", $"w"), 3)).head().getLong(0) == 7L)
    // x=4 (100) -> position 3*2+0 = 6 -> 64
    val four = Seq((4L, 0L, 0L)).toDF("x", "y", "w")
    assert(four.select(Layout.zValueN(Seq($"x", $"y", $"w"), 3)).head().getLong(0) == 64L)
    // bijective on the 3-bit cube; corners map to 0 and 511
    val cube = (for (a <- 0 until 8; b <- 0 until 8; c <- 0 until 8)
      yield (a.toLong, b.toLong, c.toLong)).toDF("x", "y", "w")
    val zs = cube.select(Layout.zValueN(Seq($"x", $"y", $"w"), 3).as("z"))
      .collect().map(_.getLong(0))
    assert(zs.toSet.size == 512 && zs.min == 0L && zs.max == 511L)
    // 2-D zValueN must equal the original zValue2 layout
    val grid = (0 until 8).flatMap(a => (0 until 8).map(b => (a.toLong, b.toLong)))
      .toDF("a", "b")
    val same = grid.select(
      (Layout.zValueN(Seq($"a", $"b"), 3) === Layout.zValue2($"a", $"b", 3)).as("eq"))
      .collect().forall(_.getBoolean(0))
    assert(same)
    // guard: result must fit a positive long
    intercept[IllegalArgumentException](Layout.zValueN(Seq($"a", $"b", $"b"), 21))
    intercept[IllegalArgumentException](Layout.zValueN(Seq($"a"), 3))
  }

  test("zorderBy: range exchange on the z-value, rows preserved, files hold z-contiguous rectangles") {
    val df = (0 until 1024).map(i => (i.toLong, (i * 7L) % 32, (i * 13L) % 32))
      .toDF("id", "x", "y")
    val laid = Layout.zorderBy(df, col("x"), col("y"), bits = 5, numFiles = 8)
    assert(laid.queryExecution.executedPlan.toString.contains("rangepartitioning"))
    assert(laid.count() == 1024)
    // within each output partition, the z-range is contiguous: partitions'
    // [min,max] z-intervals do not overlap
    val ranges = laid
      .withColumn("z", Layout.zValue2(col("x"), col("y"), 5))
      .withColumn("p", spark_partition_id())
      .groupBy("p").agg(min("z").as("lo"), max("z").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2)
      case _ =>
    }
  }

  test("sampleToBudget: greedy hash-order admission per group, at least one row") {
    val df = (0L until 200L).map(i => (if (i % 2 == 0) "a" else "b", i, 10L + i % 7))
      .toDF("grp", "id", "w")
    val out = Ops.sampleToBudget(df, Seq("grp"), "id", "w", budget = 100L)
    // replicate the admission rule from the hash order
    val order = df.select($"grp", $"id", $"w", Ops.idHash60($"id").as("h"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    val expected = order.values.flatMap { rows =>
      var cum = 0L
      rows.sortBy(r => (r._4, r._2)).takeWhile { r =>
        val admit = cum < 100L; cum += r._3; admit
      }.map(_._2).toSeq
    }.toSet
    val got = out.select("id").collect().map(_.getLong(0)).toSet
    assert(got == expected && got.nonEmpty)
    // each group keeps at least its first row even under a tiny budget
    val tiny = Ops.sampleToBudget(df, Seq("grp"), "id", "w", budget = 1L)
    assert(tiny.groupBy("grp").count().collect().map(_.getLong(1)).toSeq == Seq(1L, 1L))
  }

  test("temperatureBudgets: alpha flattens the mix; sampleToBudgets admits per-group") {
    // weights 100 vs 400: alpha=1 → 1:4 split; alpha=0.5 → pow ratio 10:20 = 1:2
    val df = ((1L to 10L).map(("a", _, 10L)) ++ (11L to 20L).map(("b", _, 40L)))
      .toDF("grp", "id", "w")
    val b1 = Ops.temperatureBudgets(df, Seq("grp"), "w", alpha = 1.0, totalBudget = 500L)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(b1("a") == ((100L, 100L)) && b1("b") == ((400L, 400L)))
    val b5 = Ops.temperatureBudgets(df, Seq("grp"), "w", alpha = 0.5, totalBudget = 300L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(b5("a") == 100L && b5("b") == 200L) // exact thirds: 10/(10+20), 20/(10+20)
    // per-group admission against those budgets follows the hash order and
    // matches the constant-budget operator when budgets are equal
    val const = Ops.temperatureBudgets(df, Seq("grp"), "w", alpha = 1.0, totalBudget = 1000L)
      .withColumn("budget", lit(60L)).select("grp", "budget")
    val viaTable = Ops.sampleToBudgets(df, Seq("grp"), "id", "w", const)
    val direct = Ops.sampleToBudget(df, Seq("grp"), "id", "w", budget = 60L)
    assert(rowSet(viaTable) == rowSet(direct))
    // zero budget admits nothing for that group
    val zb = Seq(("a", 0L), ("b", 100L)).toDF("grp", "budget")
    assert(Ops.sampleToBudgets(df, Seq("grp"), "id", "w", zb)
      .select("grp").distinct().collect().map(_.getString(0)).toSeq == Seq("b"))
  }

  test("rendezvousAssign: deterministic, uniform-ish, and minimal movement on regrow") {
    val keys = spark.range(2000).toDF("id")
    val a8 = Layout.rendezvousAssign(keys, "id", 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // deterministic: a second run (different partitioning) is identical
    val again = Layout.rendezvousAssign(keys.repartition(7), "id", 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a8 == again)
    // all shards in range and populated, no shard hogging (uniform-ish)
    val byShard = a8.values.groupBy(identity).view.mapValues(_.size)
    assert(byShard.keys.forall(s => s >= 0 && s < 8) && byShard.size == 8)
    assert(byShard.values.max < 2 * 2000 / 8) // < 2x fair share
    // HRW minimal movement: growing 8 -> 9 moves only keys whose new
    // shard-8 weight wins; expected ~1/9, assert well under modulo's ~88%
    val a9 = Layout.rendezvousAssign(keys, "id", 9)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val moved = a8.count { case (k, s) => a9(k) != s }
    assert(moved < 2000 / 4, s"moved $moved of 2000")
    // every moved key lands on the NEW shard (the HRW invariant)
    assert(a8.forall { case (k, s) => a9(k) == s || a9(k) == 8L })
  }

  test("zoneMap + zonesScanned: chunk stats exact, pruning counts, bucket-invariant") {
    val rows = (1 to 10).map(i => (i.toLong, i.toLong, i * 10L)).toDF("k", "id", "v")
      .repartition(4)
    val zm = Layout.zoneMap(rows, "k", "id", Seq("v"), chunkRows = 4L)
    val m = zm.collect().map(r => r.getAs[Long]("chunk") ->
      (r.getAs[Long]("n_rows"), r.getAs[Long]("min_v"), r.getAs[Long]("max_v"))).toMap
    assert(m == Map(0L -> ((4L, 10L, 40L)), 1L -> ((4L, 50L, 80L)),
      2L -> ((2L, 90L, 100L))))
    // predicate 55..75 overlaps only chunk 1
    val s = Layout.zonesScanned(zm, "v", 55L, 75L).collect()(0)
    assert(s.getAs[Long]("n_chunks") == 3L && s.getAs[Long]("n_scanned") == 1L)
    assert(s.getAs[Long]("rows_total") == 10L && s.getAs[Long]("rows_scanned") == 4L)
    assert(s.getAs[Long]("scan_micro") == 400000L)
    // bucket width must not change the layout positions
    val wide = Layout.zoneMap(rows, "k", "id", Seq("v"), 4L, bucketWidth = 3L)
    assert(rowSet(wide) == rowSet(zm))
    // a clustered layout prunes what a scattered one cannot: same rows,
    // key=v clusters the stat column; key=id xor-ish scatters it
    val scattered = (0 until 64).map(i => ((i * 37 % 64).toLong, i.toLong, (i % 8).toLong))
      .toDF("k", "id", "v")
    val clustered = scattered.withColumn("k", col("v") * 100 + col("id"))
    val sc = Layout.zonesScanned(
      Layout.zoneMap(scattered, "k", "id", Seq("v"), 8L), "v", 3L, 3L).collect()(0)
    val cl = Layout.zonesScanned(
      Layout.zoneMap(clustered, "k", "id", Seq("v"), 8L), "v", 3L, 3L).collect()(0)
    assert(cl.getAs[Long]("n_scanned") < sc.getAs[Long]("n_scanned"))
  }

  test("countMin: one-sided bound, merge ≡ one-shot, absent item reads 0 on empty sketch") {
    // zipf-ish: item i appears 400/i times, 40 distinct items
    val rows = (1 to 40).flatMap(i => Seq.fill(400 / i)(i.toLong)).map(Tuple1(_))
    val df = rows.toDF("item")
    val (depth, width) = (4, 64)
    val cms = Sketches.countMinBuild(df, "item", depth, width)
    // cell invariants: depth rows used, every bucket in range, total mass
    // per row equals N (each item increments exactly one cell per row)
    val n = rows.size.toLong
    val perRow = cms.groupBy("r").agg(sum("c").as("m")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(perRow.keySet == (0 until depth).toSet && perRow.values.forall(_ == n))
    assert(cms.filter(col("b") < 0 || col("b") >= width).count() == 0)
    // one-sided estimate bound: est >= exact, always
    val exact = df.groupBy("item").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val est = Sketches.countMinProbe(cms, df, "item", depth, width).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(exact.forall { case (k, c) => est(k) >= c }, "count-min must never undercount")
    // merge identity: two disjoint half-sketches summed == one-shot build
    val halves = Seq(df.filter(col("item") % 2 === 0), df.filter(col("item") % 2 === 1))
      .map(h => Sketches.countMinBuild(h, "item", depth, width))
    assert(rowSet(Sketches.countMinMerge(halves)) == rowSet(cms))
    // an empty sketch answers 0 (missing cells count 0, not null)
    val empty = Sketches.countMinBuild(df.filter(col("item") < 0), "item", depth, width)
    val z = Sketches.countMinProbe(empty, df.limit(3), "item", depth, width)
      .collect().map(_.getLong(1))
    assert(z.nonEmpty && z.forall(_ == 0L))
  }
}
