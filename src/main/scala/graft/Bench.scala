package graft


/** Benchmark main. One JSON line on stdout:
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}
  *
  * Honesty rules (VERDICT r1 §wrong-7): each query executes through the
  * no-op WRITE sink, not `.count()` — a count lets Catalyst prune sorts,
  * projects and limit-ordering work, undermeasuring the real pipeline.
  * Each query runs `RUNS` times (default 3) and reports the per-query
  * MEDIAN, so one scheduler hiccup or GC pause doesn't define the round's
  * number (BENCH_r01 showed 4× machine-contention inflation on singles).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    val spark = GraftSession.local(GraftSession.envCpus("32"), "graft-bench")
    spark.sparkContext.setLogLevel("ERROR")
    // absorb session/codegen/scheduler init so the first query isn't charged for it
    spark.range(1000).selectExpr("sum(id)").collect()

    def release(): Unit = {
      // queries are independent: drop Dataset caches AND raw pinned RDDs
      // (Dedup's iterative state) so cache pressure doesn't skew timings;
      // the explicit GC keeps one query's garbage from being collected on a
      // neighbor's clock (r5: q49 read 13.4 s inside the full loop vs 6.3 s
      // isolated — heap pressure, not plan). Untimed (outside the t0 clock).
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      System.gc()
    }

    // optional comma-separated filter for local iteration (driver leaves unset)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').toSet)
    // drift-normalization sentinel (VERDICT r11 §next-1): the flagship
    // query re-measured every ~25 queries, single-shot. r11 adjudication
    // spent a full section proving a uniform 1.22× wall-time drift was
    // machine contention, not regression — the sentinel series makes that
    // factor an OBSERVED number in the artifact: a contended run shows a
    // rising/noisy series (divide it out before calling regressions), a
    // quiet run a flat one. Untimed relative to the per-query medians
    // (each sentinel shot releases caches exactly like a query run).
    val sentinelName = "q00_compare_pipeline"
    val sentinelFn = SparkEntry.queries.get(sentinelName)
    val sentinelTimes = scala.collection.mutable.ArrayBuffer.empty[Double]
    // a FAILED shot is never recorded (the query loop's ADVICE-r2 rule:
    // a short failure time would read as a fast min and fake a 10× drift)
    def runSentinel(record: Boolean): Unit = sentinelFn.foreach { fn =>
      release()
      var failed = false
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
      catch { case scala.util.control.NonFatal(e) =>
        failed = true
        System.err.println(s"[bench] sentinel failed: ${e.getMessage}")
      }
      if (record && !failed) sentinelTimes += (System.nanoTime() - t0) / 1e9
    }
    // one UNRECORDED sentinel shot first: the very first parquet read pays
    // footer/codegen warmup (~4s) that would otherwise masquerade as a 5×
    // drift minimum in a perfectly quiet run
    runSentinel(record = false)
    // A query with ANY failed run is reported in "failed", not "queries" —
    // a consistently-throwing query would otherwise post its (short) failure
    // time as a fast median and read as a success (ADVICE r2).
    val outcomes = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .zipWithIndex
      .map { case ((name, fn), qi) =>
        if (qi % 25 == 0) runSentinel(record = true)
        var failed = false
        val times = (1 to runs).map { _ =>
          release()
          val t0 = System.nanoTime()
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
          catch { case e: Throwable =>
            failed = true
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
          }
          (System.nanoTime() - t0) / 1e9
        }.sorted
        // median is the honesty number (one GC pause doesn't define the
        // round); min-of-N is the standard quiet-machine estimator — the
        // spread between them IS the contention on this host (VERDICT r6
        // §next-1: r4/r5/r6 each ended adjudicating artifact-vs-quiet-run
        // gaps; emitting both makes the gap measurable in the artifact).
        (name, times(times.length / 2), times.head, failed)
      }
    runSentinel(record = true) // close the sentinel series after the last query
    val results = outcomes.collect { case (n, med, mn, false) => (n, med, mn) }.toSeq
    val failedNames = outcomes.collect { case (n, _, _, true) => n }.toSeq
    // explicit ROOT locale: f"" uses the default JVM locale, which on
    // comma-decimal locales (de_DE) would emit "0,435" — invalid JSON
    def ms(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + ms(v) }
      .mkString("{", ",", "}")
    val qmins = results.map { case (k, _, v) => s"\"" + k + "\":" + ms(v) }
      .mkString("{", ",", "}")
    val fj = failedNames.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    val totalMin = results.map(_._3).sum
    // scorecard echo (VERDICT r4 §wrong-3): the ANN/near-dup recall numbers
    // AT THE BENCH SCALE FACTOR, tracked every round. Untimed — runs after
    // the measurement loop; a failure leaves the object empty rather than
    // failing the bench.
    val recalls: Map[String, Double] = try {
      import org.apache.spark.sql.functions.{count, lit, sum}
      release()
      val r52 = SparkEntry.queries("q52_ann_recall")(spark, sfDir)
        .agg(sum("k"), sum("n_hit_lsh"), sum("n_hit_ivf")).head()
      val k = r52.getLong(0).toDouble
      release()
      val r53 = SparkEntry.queries("q53_neardup_recall")(spark, sfDir).head()
      // the non-default recall dial (Dedup.embeddingNearDupPairs scaladoc:
      // the r6 threshold-adaptive default picks 24 tables at θ=0.3, so echo
      // the cheaper 16-table dial): measured at the bench SF every round so
      // the dial's cost/recall trade stays an observed number, not prose
      release()
      val r53d = SparkEntry.neardupRecallAt(spark, sfDir, nTables = 16).head()
      // r7 paths: the delta↔corpus between-join's pair recall, and PQ's
      // top-5 recall vs brute force (q118's own hit column, re-aggregated
      // at the bench SF)
      release()
      val r115 = SparkEntry.neardupBetweenRecallAt(spark, sfDir).head()
      release()
      val r118 = SparkEntry.queries("q118_pq_topk")(spark, sfDir)
        .agg(sum("hit"), count(lit(1))).head()
      release()
      val r119 = SparkEntry.queries("q119_ivfpq_topk")(spark, sfDir)
        .agg(sum("hit"), count(lit(1))).head()
      // r8: the residual-encoded variant's recall at the same 96-bit
      // budget, next to the flat chain's — the Jégou §IV-A claim measured
      release()
      val r121 = SparkEntry.queries("q121_ivfpq_residual")(spark, sfDir)
        .agg(sum("hit"), count(lit(1))).head()
      Map("lsh_topk" -> r52.getLong(1) / k, "ivf_topk" -> r52.getLong(2) / k,
        "neardup_pairs" -> r53.getDouble(2),
        "neardup_pairs_16t" -> r53d.getDouble(2),
        "neardup_between" -> r115.getDouble(2),
        "pq_top5" -> r118.getLong(0).toDouble / r118.getLong(1),
        "ivfpq_top5" -> r119.getLong(0).toDouble / r119.getLong(1),
        "ivfpq_res_top5" -> r121.getLong(0).toDouble / r121.getLong(1))
    } catch { case e: Throwable =>
      System.err.println(s"[bench] recall scorecard failed: ${e.getMessage}")
      Map.empty
    }
    val rj = recalls.map { case (k, v) => s"\"" + k + "\":" + ms(v) }
      .mkString("{", ",", "}")
    // drift object: the raw sentinel series plus median/min — a flat
    // series near factor 1.0 certifies a quiet run; divide regressions by
    // the factor before adjudicating them as code
    val dj = if (sentinelTimes.isEmpty) "{}" else {
      val sorted = sentinelTimes.toSeq.sorted
      val factor = sorted(sorted.length / 2) / sorted.head
      s"""{"sentinel":"$sentinelName","runs":[${sentinelTimes.map(ms).mkString(",")}],""" +
        s""""factor":${ms(factor)}}"""
    }
    // Field order matters (VERDICT r5 §wrong-4, r7 §wrong-2): the driver's
    // capture keeps the TAIL of stdout, so the LAST bytes survive a
    // truncated capture. Order by adjudication priority back-to-front:
    // scalar summary (total/recall/sf) at the very end, the per-query
    // MEDIAN map (the regression-adjudication number) right before it, the
    // min-of-N map first (the one sacrificed if the window is short — r7's
    // artifact kept only 67/120 of whichever map came second).
    val line = s"""{"queries_min":$qmins,"failed":$fj,"drift":$dj,"queries":$qs,"recall":$rj,"sf":"$sfDir","metric":"total","unit":"sec","total_min":${ms(totalMin)},"value":${ms(total)}}"""
    println(line)
    // Measurement-infrastructure fix (VERDICT r15 §wrong-1, additions only):
    // the full line above has grown to ~14 KB for 260 queries, and the
    // driver's stdout capture keeps only a ~3 KB TAIL — which truncates the
    // line's HEAD, so the driver could not json-parse the bench output in
    // r14 OR r15 (PERF_r15.json: per_query {}, *_bench_ok false). Emit a
    // SECOND, compact totals line AFTER it: short enough to survive any
    // tail capture, valid JSON on its own, same totals/failed/drift as the
    // full line. The full line (and bench_last.json below) keep every
    // per-query number; nothing is removed or renamed and the timing
    // methodology is untouched.
    println(s"""{"metric":"total","value":${ms(total)},"unit":"sec","sf":"$sfDir","compact":true,"n_queries":${results.length},"failed":$fj,"drift":$dj,"total_min":${ms(totalMin)}}""")
    // ALSO persist the full JSON to a workspace file (VERDICT r9 §wrong-2):
    // the driver keeps only the TAIL of stdout, and at 196+ queries the
    // min-of-N map — and soon the medians — fall off the capture; the file
    // keeps every per-query number for regression adjudication. Best-effort:
    // a read-only workspace must not fail the bench.
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_last.json")), line)
    catch { case scala.util.control.NonFatal(e) =>
      // NonFatal, not Throwable (ADVICE r10): an OOM or other fatal JVM
      // error must propagate, not be reported as a benign write failure
      System.err.println(s"[bench] could not write bench_last.json: ${e.getMessage}")
    }
    spark.stop()
  }
}
