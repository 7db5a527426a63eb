package graft.ml

import graft.SparkTestBase

/** Known-answer tests mirroring the reference's `test_ml.py` fixture and the
  * verified behaviors in SURVEY §2.2.8. */
class TableCleanerSpec extends SparkTestBase {
  import spark.implicits._

  // the reference's Animals train table (test_ml.py flavor)
  private def train = Seq(
    (Some("Falcon"), Some(380.0), Some(1.0)),
    (Some("Falcon"), Some(370.0), Some(0.0)),
    (Some("Parrot"), Some(24.0), Some(0.0)),
    (Some("Parrot"), Some(26.0), Some(1.0)),
    (Some("Goose"), None, Some(1.0))
  ).toDF("animal", "max_speed", "label")

  test("numeric: impute with TRAIN mean, clip to TRAIN [min,max] on predict data") {
    val c = new TableCleaner
    c.registerNumeric("max_speed", impute = "mean")
    val out = c.cleanTable(train).collect().map(_.getDouble(0))
    assert(out.toSeq == Seq(380.0, 370.0, 24.0, 26.0, 200.0)) // mean of 4 non-null = 200
    // predict-time: unseen 9999 clipped to train max 380 (SURVEY §2.2.8 verified)
    val predict = Seq(Some(9999.0), None, Some(-5.0)).toDF("max_speed")
    val p = c.cleanTable(predict).collect().map(_.getDouble(0))
    assert(p.toSeq == Seq(380.0, 200.0, 24.0))
  }

  test("numeric: impute min/max strategies and invalid strategy") {
    val cMin = new TableCleaner; cMin.registerNumeric("max_speed", impute = "min")
    assert(cMin.cleanTable(train).collect().map(_.getDouble(0)).last == 24.0)
    val cMax = new TableCleaner; cMax.registerNumeric("max_speed", impute = "max")
    assert(cMax.cleanTable(train).collect().map(_.getDouble(0)).last == 380.0)
    val bad = new TableCleaner; bad.registerNumeric("max_speed", impute = "mode")
    intercept[IllegalArgumentException] { bad.cleanTable(train) }
  }

  test("label encode with given categories: idx+1, unknown->0, null->0, keeps name (ml.py:9-17)") {
    val c = new TableCleaner
    c.registerLabel("animal", Seq("Goose", "Falcon"))
    val df = Seq(Some("Falcon"), Some("Goose"), Some("Parrot"), None).toDF("animal")
    val out = c.cleanTable(df)
    assert(out.columns.toSeq == Seq("animal"))
    assert(out.collect().map(_.getInt(0)).toSeq == Seq(2, 1, 0, 0))
  }

  test("label encode learned: sorted distinct categories (documented divergence)") {
    val c = new TableCleaner
    c.registerLabel("animal")
    val out = c.cleanTable(train).collect().map(_.getInt(0))
    // sorted cats: Falcon=1, Goose=2, Parrot=3
    assert(out.toSeq == Seq(1, 1, 3, 3, 2))
  }

  test("one-hot: bool col per category named {col}_{cat}; null row all-false; drop_first") {
    val c = new TableCleaner
    c.registerOneHot("animal")
    val df = Seq(Some("Falcon"), Some("Parrot"), None).toDF("animal")
    val out = c.cleanTable(df)
    assert(out.columns.toSeq == Seq("animal_Falcon", "animal_Parrot"))
    assert(rowList(out) == Seq(Seq(true, false), Seq(false, true), Seq(false, false)))
    val d = new TableCleaner
    d.registerOneHot("animal", dropFirst = true)
    assert(d.cleanTable(df).columns.toSeq == Seq("animal_Parrot"))
  }

  test("pipeline: multiple columns in registration order; label passthrough") {
    val c = new TableCleaner
    c.registerOneHot("animal")
    c.registerNumeric("max_speed")
    val (x, y) = c.cleanTable(train, "label")
    assert(x.columns.toSeq == Seq("animal_Falcon", "animal_Goose", "animal_Parrot", "max_speed"))
    assert(y.columns.toSeq == Seq("label"))
    assert(y.count() == 5)
  }

  test("to_dict-schema JSON round-trip reproduces transforms (ml.py:83-93)") {
    val c = new TableCleaner
    c.registerNumeric("max_speed", impute = "mean")
    c.registerLabel("animal", Seq("Goose", "Falcon"))
    val before = c.cleanTable(train).collect().map(_.toSeq).toSeq
    val json = c.toJson
    assert(json.contains("\"type\":\"numerical\"") && json.contains("\"v_max\":380.0"))
    val c2 = TableCleaner.fromJson(json)
    val after = c2.cleanTable(train).collect().map(_.toSeq).toSeq
    assert(before == after)
  }

  test("split: seeded random split partitions all rows") {
    val c = new TableCleaner
    val (tr, te) = c.split(train, testSize = 0.4, seed = 7)
    assert(tr.count() + te.count() == 5)
    assert(tr.intersect(te).count() == 0)
  }
}
