package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** A media asset: opaque bytes + typed metadata. The binary payload is
  * never interpreted by Spark itself — exactly how image/audio/video
  * columns should travel through a 100 TB pipeline (decode happens only
  * inside the partition-local feature step, never in a join key or
  * shuffle).
  */
case class MediaRecord(
    media_id: Long,
    media_type: String,          // "image" | "audio" | "video" | "text"
    content: Array[Byte],        // opaque payload
    source: String)

/** Extracted features for one asset. */
case class MediaFeatures(
    media_id: Long,
    media_type: String,
    byte_len: Int,
    // STUB feature vector — see [[Multimodal.decodeStub]].
    features: Array[Double])

/** Header-level image metadata decoded by a REAL codec
  * ([[Multimodal.decodeImageMeta]], `javax.imageio` — in the JDK, no
  * external deps). Undecodable payloads carry format "unknown" and -1
  * dimensions rather than failing the partition: one corrupt file in a
  * 100 TB corpus must not kill the job.
  */
case class ImageMeta(
    media_id: Long,
    media_type: String,
    byte_len: Int,
    format: String,              // "png" | "jpeg" | … | "unknown"
    width: Int,
    height: Int,
    channels: Int)

/** Multimodal-column plumbing (north-star extension).
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * clearly-marked deterministic stub ([[decodeStub]]); everything around
  * it — the binary schema, the typed `Dataset` boundary, the
  * partition-local batched processing shape, the feature schema — is the
  * real design a codec would drop into:
  *
  *   readBinary → Dataset[MediaRecord] → mapPartitions(batch decode)
  *   → Dataset[MediaFeatures] → DataFrame joins/aggregations
  *
  * `mapPartitions` is deliberate (vs per-row map): a real decoder
  * amortizes model/codec init once per partition, mirroring what a
  * Python `mapInPandas` batch UDF does.
  */
object Multimodal {

  /** Read a directory of media files as binary records via Spark's
    * binaryFile source — the real ingestion path for image/audio/video
    * payloads. `pathGlobFilter` prunes at listing time (e.g. "*.jpg");
    * ids are stable hashes of the file path (reproducible across runs).
    * Payload bytes stream through the scan; they are never join/shuffle
    * keys.
    */
  def readBinaryDir(spark: org.apache.spark.sql.SparkSession, path: String,
                    mediaType: String, globFilter: String = "*"): Dataset[MediaRecord] = {
    implicit val enc = Encoders.product[MediaRecord]
    spark.read.format("binaryFile")
      .option("pathGlobFilter", globFilter)
      .load(path)
      .select(
        xxhash64(col("path")).as("media_id"),
        lit(mediaType).as("media_type"),
        col("content"),
        col("path").as("source"))
      .as[MediaRecord]
  }

  /** Attach an opaque binary payload column derived from a string column
    * (UTF-8 bytes) — stands in for reading real media files; with real
    * data this is [[readBinaryDir]].
    */
  def asMedia(df: DataFrame, idCol: String, textCol: String,
              mediaType: String, sourceCol: String): Dataset[MediaRecord] = {
    implicit val enc = Encoders.product[MediaRecord]
    df.select(
        col(idCol).cast("long").as("media_id"),
        lit(mediaType).as("media_type"),
        // a null payload is an EMPTY payload, not an NPE in the decoder
        encode(coalesce(col(textCol), lit("")), "UTF-8").as("content"),
        col(sourceCol).as("source"))
      // a row whose id doesn't cast has no media identity — dropping it
      // beats the opaque non-nullable-encoder crash mid-job (parallel to
      // readBinaryDir's glob skipping non-matching files)
      .where(col(idCol).cast("long").isNotNull)
      .as[MediaRecord]
  }

  /** STUB decoder — the fallback for media types with no in-container
    * codec (audio resample / video frame-sample). Produces a
    * fixed-length feature vector from the raw bytes: byte-value
    * histogram over 8 buckets, L1-normalized. IMAGES have a real
    * decoder now — [[decodeImageMeta]] via `javax.imageio`; this stub
    * remains the contract for the codec-less modalities.
    */
  def decodeStub(records: Iterator[MediaRecord]): Iterator[MediaFeatures] = {
    // per-partition init would go here (codec handles, model weights, …)
    records.map { r =>
      val hist = new Array[Double](8)
      var i = 0
      while (i < r.content.length) {
        hist((r.content(i) & 0xff) >> 5) += 1.0
        i += 1
      }
      val total = math.max(1.0, r.content.length.toDouble)
      MediaFeatures(r.media_id, r.media_type, r.content.length,
        hist.map(_ / total))
    }
  }

  /** Full plumbing: binary column → partition-batched decode → typed
    * feature rows.
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.mapPartitions(decodeStub)
  }

  /** REAL image decode via `javax.imageio` (in the JDK — PNG, JPEG,
    * GIF, BMP readers ship with it): width / height / channel count
    * read from the HEADER through an `ImageReader` — `getWidth(0)` and
    * friends parse metadata only, never the pixel payload, so a 100 MB
    * JPEG costs a few KB of I/O. Payloads no registered reader
    * recognizes degrade to format "unknown" with -1 dimensions (and a
    * corrupt-but-recognized header to -1 on the failing field) instead
    * of failing the partition. Same batch shape as [[decodeStub]]:
    * per-partition init amortized, rows stream through.
    */
  def decodeImageMeta(records: Iterator[MediaRecord]): Iterator[ImageMeta] =
    records.map { r =>
      val in = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(r.content))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(in)
        if (!readers.hasNext)
          ImageMeta(r.media_id, r.media_type, r.content.length,
            "unknown", -1, -1, -1)
        else {
          val rd = readers.next()
          try {
            rd.setInput(in, true, true)
            def safe(f: => Int): Int =
              try f catch { case scala.util.control.NonFatal(_) => -1 }
            val channels = safe {
              val it = rd.getImageTypes(0)
              if (it.hasNext) it.next().getNumComponents else -1
            }
            ImageMeta(r.media_id, r.media_type, r.content.length,
              rd.getFormatName.toLowerCase(java.util.Locale.ROOT),
              safe(rd.getWidth(0)), safe(rd.getHeight(0)), channels)
          } finally rd.dispose()
        }
      } finally if (in != null) in.close()
    }

  /** [[decodeImageMeta]] over a Dataset — the typed pipeline stage. */
  def extractImageMeta(media: Dataset[MediaRecord]): Dataset[ImageMeta] = {
    implicit val enc = Encoders.product[ImageMeta]
    media.mapPartitions(decodeImageMeta)
  }

  /** Deterministic PNG synthesizer (BufferedImage + ImageIO, both
    * in-JDK): a `width`×`height` RGB image whose pixels derive from
    * `seed` — the test/oracle fixture for the real decode path in a
    * container that ships no media files. Headless-safe (no display
    * needed for raster ops).
    */
  def synthesizePng(width: Int, height: Int, seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        // cheap deterministic mix — value only needs to be stable
        val v = (seed * 31 + x * 7 + y * 13).toInt & 0xffffff
        img.setRGB(x, y, v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }
}
