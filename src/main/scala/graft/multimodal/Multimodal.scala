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

  /** STUB decoder — deterministic fake standing in for a real codec
    * (image resize / audio resample / video frame-sample). Produces a
    * fixed-length feature vector from the raw bytes: byte-value
    * histogram over 8 buckets, L1-normalized. Replace the body with a
    * real decoder; the signature (batch of records in, features out) is
    * the contract.
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
}
