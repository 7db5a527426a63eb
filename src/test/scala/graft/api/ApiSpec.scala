package graft.api

import org.apache.spark.sql.functions.col
import graft.SparkTestBase

/** Drives the reference-style free-function surface end-to-end the way the
  * reference's own test_func.py does — import the package, run the pipeline. */
class ApiSpec extends SparkTestBase {
  import spark.implicits._
  import graft.api._

  test("reference-style pipeline: filters -> join -> drop_duplicates -> groupby") {
    val animals = Seq(("Falcon", 380.0), ("Falcon", 370.0), ("Parrot", 24.0),
      ("Goose", 60.0)).toDF("animal", "max_speed")
    val kinds = Seq(("Falcon", "bird"), ("Parrot", "bird"), ("Goose", "bird"))
      .toDF("animal", "kind")

    val fast = filters(animals, ("max_speed", ">", 50.0))
    assert(fast.count() == 3)

    val joined = join(fast, kinds, Seq("animal"))
    assert(joined.columns.toSeq == Seq("animal", "max_speed", "kind"))

    val deduped = drop_duplicates(joined, Seq("animal"), keep = "first",
      orderBy = Seq(col("max_speed")))
    assert(deduped.count() == 2)

    val agg = groupby(deduped, "animal").mean(Seq("max_speed"))
    assert(agg.columns.toSeq == Seq("animal", "max_speed_mean"))

    head(agg, 2) // console sink, reference head() analog

    val cleaner = new TableCleaner
    cleaner.registerLabel("animal", Seq("Goose", "Falcon"))
    assert(cleaner.cleanTable(animals).collect().map(_.getInt(0)).toSeq
      == Seq(2, 2, 0, 1))
  }
}
