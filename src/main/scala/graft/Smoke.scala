package graft



/** Local replica of the driver's t1 smoke check: `SparkEntry.entry` on
  * sf0.001 must return rows > 0. Run: `sbt "runMain graft.Smoke"`. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(GraftSession.envCpus("8"), "graft-smoke")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(5)
    println(s"ENTRY_ROWS=$n")
    assert(n > 0, "entry() returned no rows")
    spark.stop()
  }
}
