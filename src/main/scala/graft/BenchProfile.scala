package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Dev-only measurement harness (guide §1: measure first) — NOT part of the
  * driver contract. Runs one named query from [[SparkEntry.queries]] through
  * the noop sink (same methodology as [[Bench]]) and prints a per-stage and
  * per-job breakdown from a SparkListener, so optimization targets the stage
  * that actually costs time instead of the one that looks expensive.
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.BenchProfile q117_semantic_incremental [runs]"
  */
object BenchProfile {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: BenchProfile <query> [runs]"))
    val runs = if (args.length > 1) args(1).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(GraftSession.envCpus("32"), "graft-profile")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    final case class St(id: Int, name: String, ms: Long, tasks: Int)
    val stages = scala.collection.mutable.ArrayBuffer.empty[St]
    var jobs = 0
    var jobMs = 0L
    val jobStart = scala.collection.mutable.Map.empty[Int, Long]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = (for {
          a <- si.completionTime; b <- si.submissionTime
        } yield a - b).getOrElse(0L)
        stages.synchronized {
          stages += St(si.stageId, si.name.takeWhile(_ != '\n'), ms, si.numTasks)
        }
      }
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobStart.synchronized { jobStart(js.jobId) = js.time }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        jobs += 1
        jobStart.synchronized {
          jobStart.get(je.jobId).foreach(t0 => jobMs += je.time - t0)
        }
      }
    })

    // comma-separated names profile several queries in one JVM (same
    // session warmup), e.g. the r16 tiny-query fixed-overhead probes
    name.split(',').foreach { qn =>
      val fn = SparkEntry.queries.getOrElse(qn, sys.error(s"unknown query $qn"))
      (1 to runs).foreach { i =>
        stages.clear(); jobs = 0; jobMs = 0L
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        System.gc()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        // listener bus is async — drain before reading the buffers
        Thread.sleep(500)
        println(f"== $qn run $i: wall $wall%.3f s, $jobs jobs (sum job wall ${jobMs / 1e3}%.3f s), ${stages.size} stages, stage-ms sum ${stages.map(_.ms).sum / 1e3}%.3f s")
        stages.sortBy(-_.ms).take(20).foreach { s =>
          println(f"   stage ${s.id}%4d ${s.ms}%6d ms ${s.tasks}%4d tasks  ${s.name.take(110)}")
        }
      }
    }
    spark.stop()
  }
}
