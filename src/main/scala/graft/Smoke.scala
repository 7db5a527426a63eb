package graft

import org.apache.spark.sql.SparkSession

/** Local replica of the driver's t1 smoke check: `SparkEntry.entry` on
  * sf0.001 must return rows > 0. Run: `sbt "runMain graft.Smoke"`. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(5)
    println(s"ENTRY_ROWS=$n")
    assert(n > 0, "entry() returned no rows")
    spark.stop()
  }
}
