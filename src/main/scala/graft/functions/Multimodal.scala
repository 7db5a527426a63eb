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
  * (`octet_length`/`md5`/`substring`). The media DECODE itself is a STUB:
  * no image/audio codecs exist in this environment, so `decodeStub` derives
  * deterministic fake dimensions from the content hash. Swapping in a real
  * codec changes only the function body — the distributed plumbing is
  * unchanged.
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
    * (first two bytes → width/height buckets). A real implementation would
    * parse the codec header here. */
  private[graft] def decodeStub(content: Array[Byte]): (Int, Int) = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(content)
    (((d(0) & 0xff) % 16 + 1) * 64, ((d(1) & 0xff) % 9 + 1) * 64)
  }

  /** Partition-local batch feature extraction — the `mapInPandas` analog.
    * Each task streams its partition through the (stubbed) decoder; no
    * shuffle, no driver collect, arbitrary per-item native work. */
  def extractFeatures(media: Dataset[MediaRow], frameBytes: Int = 4096): Dataset[MediaFeature] = {
    implicit val enc = Encoders.product[MediaFeature]
    media.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        md.reset()
        val hash = md.digest(r.content).map("%02x".format(_)).mkString
        val (w, h) = decodeStub(r.content)
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
