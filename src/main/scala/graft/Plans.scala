package graft

import org.apache.spark.sql.SparkSession

/** Physical-plan audit: prints `explain("formatted")` for representative
  * queries so scan pushdown, join strategy, and WholeStageCodegen spans can
  * be reviewed. Run: `sbt "runMain graft.Plans [sfDir] [query...]"`. */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq
      else Seq("q01_filters", "q10_join_inner", "q22_pricing_summary",
        "q00_compare_pipeline", "q29_minhash_lsh", "q31_ann_bruteforce")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
