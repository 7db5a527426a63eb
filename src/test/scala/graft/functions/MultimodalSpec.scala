package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = Seq((1L, "hello world"), (2L, "x" * 10000)).toDF("doc_id", "text")

  test("pack: binary payload with metadata, correct byte counts") {
    val m = Multimodal.pack(docs, "doc_id", "text", "text/plain")
    val rows = m.collect().sortBy(_.media_id)
    assert(rows(0).n_bytes == 11L && rows(1).n_bytes == 10000L)
    assert(rows(0).format == "text/plain")
    assert(new String(rows(0).content, "UTF-8") == "hello world")
  }

  test("extractFeatures: mapPartitions batch shape, deterministic stub decode") {
    val f = Multimodal.extractFeatures(Multimodal.pack(docs, "doc_id", "text", "text/plain"))
    val rows = f.collect().sortBy(_.media_id)
    assert(rows(0).content_md5 ==
      java.security.MessageDigest.getInstance("MD5")
        .digest("hello world".getBytes).map("%02x".format(_)).mkString)
    // stub dims are deterministic functions of content
    val again = Multimodal.extractFeatures(Multimodal.pack(docs, "doc_id", "text", "text/plain"))
      .collect().sortBy(_.media_id)
    assert(rows.map(r => (r.width, r.height)).toSeq == again.map(r => (r.width, r.height)).toSeq)
    assert(rows.forall(r => r.width > 0 && r.height > 0))
    assert(rows(1).n_frames == 3) // ceil(10000 / 4096)
  }

  test("frameSample: strided fixed-size chunks, no empty frames") {
    val frames = Multimodal.frameSample(
      Multimodal.pack(docs, "doc_id", "text", "text/plain").filter(col("media_id") === 2),
      frameBytes = 1000, stride = 2).collect()
    assert(frames.map(_.getInt(1)).toSeq == Seq(0, 2, 4, 6, 8))
    assert(frames.forall(_.getAs[Array[Byte]]("frame").length == 1000))
  }
}
