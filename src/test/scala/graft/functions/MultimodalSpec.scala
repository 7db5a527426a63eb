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

  test("headerDims: hand-built container bytes parse to exact dims") {
    // PNG: signature + IHDR, big-endian 32-bit dims at fixed offsets —
    // checked against hand-written bytes, not just the builder round-trip
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 13, 'I', 'H', 'D', 'R',
      0, 0, 0x01, 0x90.toByte, // width 400
      0, 0, 0, 0x64,           // height 100
      8, 6, 0, 0, 0)
    assert(Multimodal.headerDims(png).contains(("png", 400, 100)))
    // GIF87a variant, LITTLE-endian 16-bit dims
    val gif = "GIF87a".getBytes("US-ASCII") ++
      Array[Byte](0x2c, 0x01, // width 300 LE
        0x0a, 0x00,           // height 10 LE
        0, 0, 0)
    assert(Multimodal.headerDims(gif).contains(("gif", 300, 10)))
    // JPEG: the scan must SKIP APP0 (and a fill byte) to reach SOF2
    // (progressive), big-endian height BEFORE width in the SOF payload
    val jpeg = Array[Byte](0xff.toByte, 0xd8.toByte) ++
      (Array[Byte](0xff.toByte, 0xe0.toByte, 0, 6) ++ Array[Byte](1, 2, 3, 4)) ++
      Array[Byte](0xff.toByte) ++ // fill byte
      (Array[Byte](0xff.toByte, 0xc2.toByte, 0, 11, 8,
        0x00, 0x96.toByte,   // height 150
        0x02, 0x00,          // width 512
        1, 1, 0x11, 0))
    assert(Multimodal.headerDims(jpeg).contains(("jpeg", 512, 150)))
    // builder round-trips (the q247 identity) incl. 16-bit-edge dims
    assert(Multimodal.headerDims(Multimodal.pngHeader(65536, 1))
      .contains(("png", 65536, 1)))
    assert(Multimodal.headerDims(Multimodal.gifHeader(65535, 65535))
      .contains(("gif", 65535, 65535)))
    assert(Multimodal.headerDims(Multimodal.jpegHeader(65535, 1))
      .contains(("jpeg", 65535, 1)))
    // refusals: text, truncated PNG, SOS before any SOF, empty
    assert(Multimodal.headerDims("GIF8 but actually text".getBytes).isEmpty)
    assert(Multimodal.headerDims(png.take(20)).isEmpty)
    val sosFirst = Array[Byte](0xff.toByte, 0xd8.toByte,
      0xff.toByte, 0xda.toByte, 0, 2)
    assert(Multimodal.headerDims(sosFirst).isEmpty)
    assert(Multimodal.headerDims(Array.empty[Byte]).isEmpty)
    // extractFeatures prefers the real parse; text keeps the stub path
    val media = Seq(
      Multimodal.MediaRow(1L, Multimodal.pngHeader(400, 100), "png", 29L),
      Multimodal.MediaRow(2L, "plain text".getBytes, "text/plain", 10L))
      .toDS()
    val f = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    assert(f(0).width == 400 && f(0).height == 100)
    val (sw, sh) = Multimodal.decodeStub("plain text".getBytes)
    assert(f(1).width == sw && f(1).height == sh)
    // mediaDims surfaces unparseable payloads as nulls, parsed as values
    val dims = Multimodal.mediaDims(media).collect().sortBy(_.media_id)
    assert(dims(0) == Multimodal.MediaDims(1L, Some("png"), Some(400), Some(100)))
    assert(dims(1) == Multimodal.MediaDims(2L, None, None, None))
  }

  test("headerAv: hand-built WAV/MP4 bytes parse to exact metadata") {
    def le16(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte)
    def le32(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte,
      (v >>> 16).toByte, (v >>> 24).toByte)
    // WAV with a LIST chunk BEFORE fmt (the walk must skip it, incl.
    // the odd-size word-align pad), hand-written bytes: 2ch 44100 Hz
    // 16-bit, 441 frames -> 1764 data bytes, duration 10 ms
    val wav = "RIFF".getBytes ++ le32(0) ++ "WAVE".getBytes ++
      ("LIST".getBytes ++ le32(3) ++ Array[Byte](9, 9, 9, 0)) ++ // padded
      ("fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(2) ++ le32(44100) ++
        le32(44100 * 4) ++ le16(4) ++ le16(16)) ++
      ("data".getBytes ++ le32(1764))
    assert(Multimodal.headerAv(wav)
      .contains(("wav", 44100L, 441L, Some(2))))
    // MP4 with a free box between ftyp and moov, and a child box before
    // mvhd inside moov — both walks must skip by declared sizes
    def be32(v: Long) = Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte,
      (v >>> 8).toByte, v.toByte)
    val mvhd = be32(32) ++ "mvhd".getBytes ++ Array[Byte](0, 0, 0, 0) ++
      be32(0) ++ be32(0) ++ be32(600) ++ be32(7200) ++ be32(0x10000)
    val iods = be32(12) ++ "iods".getBytes ++ be32(0)
    val moov = be32(8L + iods.length + mvhd.length) ++ "moov".getBytes ++
      iods ++ mvhd
    val mp4 = be32(16) ++ "ftyp".getBytes ++ "isom".getBytes ++ be32(0) ++
      (be32(12) ++ "free".getBytes ++ be32(0)) ++ moov
    assert(Multimodal.headerAv(mp4)
      .contains(("mp4", 600L, 7200L, None)))
    // builder round-trips for both mvhd versions and a 64-bit duration
    assert(Multimodal.headerAv(Multimodal.wavHeader(8000, 1, 12345))
      .contains(("wav", 8000L, 12345L, Some(1))))
    assert(Multimodal.headerAv(Multimodal.mp4Header(90000, 123456, 0))
      .contains(("mp4", 90000L, 123456L, None)))
    assert(Multimodal.headerAv(
        Multimodal.mp4Header(90000, 8589934592L, 1)) // > 2^32: v1 only
      .contains(("mp4", 90000L, 8589934592L, None)))
    // refusals: text, truncated WAV (no fmt), moov-less mp4, zero-rate
    // fmt, image headers, empty
    assert(Multimodal.headerAv("RIFF but actually text..".getBytes).isEmpty)
    assert(Multimodal.headerAv(wav.take(20)).isEmpty)
    assert(Multimodal.headerAv(
      be32(16) ++ "ftyp".getBytes ++ "isom".getBytes ++ be32(0)).isEmpty)
    val zeroRate = "RIFF".getBytes ++ le32(0) ++ "WAVE".getBytes ++
      ("fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(2) ++ le32(0) ++
        le32(0) ++ le16(4) ++ le16(16))
    assert(Multimodal.headerAv(zeroRate).isEmpty)
    assert(Multimodal.headerAv(Multimodal.pngHeader(4, 4)).isEmpty)
    assert(Multimodal.headerAv(Array.empty[Byte]).isEmpty)
    // avDims: typed mapPartitions surface — parsed values, nulls for
    // unparseable, exact floor duration_ms
    val media = Seq(
      Multimodal.MediaRow(1L, Multimodal.wavHeader(44100, 2, 441), "wav", 44L),
      Multimodal.MediaRow(2L, Multimodal.mp4Header(600, 7201), "mp4", 132L),
      Multimodal.MediaRow(3L, "plain text".getBytes, "text/plain", 10L))
      .toDS()
    val got = Multimodal.avDims(media).collect().sortBy(_.media_id)
    assert(got(0) == Multimodal.AvMeta(1L, Some("wav"), Some(44100L),
      Some(441L), Some(2), Some(10L)))    // 441000/44100 = 10 exactly
    assert(got(1) == Multimodal.AvMeta(2L, Some("mp4"), Some(600L),
      Some(7201L), None, Some(12001L)))   // floor(7201000/600)
    assert(got(2) == Multimodal.AvMeta(3L, None, None, None, None, None))
  }

  test("frameSample: strided fixed-size chunks, no empty frames") {
    val frames = Multimodal.frameSample(
      Multimodal.pack(docs, "doc_id", "text", "text/plain").filter(col("media_id") === 2),
      frameBytes = 1000, stride = 2).collect()
    assert(frames.map(_.getInt(1)).toSeq == Seq(0, 2, 4, 6, 8))
    assert(frames.forall(_.getAs[Array[Byte]]("frame").length == 1000))
  }
}
