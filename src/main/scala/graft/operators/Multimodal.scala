package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed in partition-local
  * batches — the Scala analog of the arrow-batched mapInPandas pattern
  * (north-star extension; training pipelines carry media this way).
  *
  * The DECODE STEP IS A STUB: this container has no image/audio codecs,
  * so [[MediaCodec.decodeStub]] derives a deterministic fake feature
  * vector from the raw bytes. Everything around it — the schema, the
  * binary payload column, the batched mapPartitions execution, the
  * metadata struct, partitioning — is the real plumbing a codec would
  * drop into.
  *
  * Scale notes: payloads never shuffle — every op here is map-only over
  * the scan; batches bound per-task peak memory exactly like Arrow
  * record batches; at 100 TB the media table would be partitioned by
  * kind and bucketed by media_id so joins against features stay local.
  */
object Multimodal {

  /** One media row: opaque payload + typed metadata, like a real
    * lakehouse media table (kind in {image, audio, video}).
    */
  case class MediaRow(
      media_id: Long, kind: String, payload: Array[Byte],
      width: Int, height: Int, sample_rate: Int, duration_ms: Long)

  case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long, bin0_hits: Long,
      features: Array[Double])

  case class FrameSample(media_id: Long, frame_idx: Int, offset: Long)

  /** The codec boundary. A real implementation would decode
    * image/audio/video bytes; the stub derives deterministic features
    * so the pipeline around it is fully testable.
    */
  object MediaCodec {
    val FeatureDim = 16

    /** STUB — stands in for a real decoder (e.g. JPEG -> pixels ->
      * pooled features). Deterministic: a normalized 16-bin byte
      * histogram of the payload.
      */
    def decodeStub(payload: Array[Byte]): Array[Double] = {
      val hist = new Array[Double](FeatureDim)
      var i = 0
      while (i < payload.length) {
        hist((payload(i) & 0xff) % FeatureDim) += 1.0
        i += 1
      }
      if (payload.length > 0) {
        var j = 0
        while (j < FeatureDim) { hist(j) /= payload.length; j += 1 }
      }
      hist
    }

    /** STUB resize — a real one reshapes pixels; this rescales the
      * metadata and re-derives features at the "new resolution".
      */
    def resizeStub(row: MediaRow, w: Int, h: Int): MediaRow =
      row.copy(width = w, height = h)
  }

  /** Deterministic media table derived from `documents` (no media
    * fixture exists): payload = utf-8 text bytes, kind/metadata derived
    * from stable columns. Plays the role of a scanned media lake table.
    */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("n_chars"))
      .as[(Long, String, Long)]
      .map { case (id, text, nChars) =>
        val kind = (id % 3) match {
          case 0 => "image"
          case 1 => "audio"
          case _ => "video"
        }
        MediaRow(id, kind, text.getBytes("UTF-8"),
          width = (nChars % 640).toInt + 16, height = (nChars % 480).toInt + 16,
          sample_rate = 16000, duration_ms = nChars * 10)
      }
  }

  /** Batched feature extraction: partition-local iteration in fixed-size
    * batches through the stub codec (the mapInPandas shape — batch in,
    * batch out, bounded memory).
    */
  def extractFeatures(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val f = MediaCodec.decodeStub(r.payload)
          val bin0 = math.round(f(0) * r.payload.length)
          MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, bin0, f)
        }
      }
    }
  }

  /** Frame sampling plumbing for video rows: `n` evenly-spaced byte
    * offsets per payload (a real codec seeks keyframes; offsets make the
    * fan-out schema and partitioning real).
    */
  def sampleFrames(media: Dataset[MediaRow], n: Int = 4): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { r =>
      val len = math.max(r.payload.length.toLong, 1L)
      (0 until n).map(i => FrameSample(r.media_id, i, i * len / n))
    }
  }

  /** Declared query: the frame-sampling fan-out as a flat table —
    * (media_id, frame_idx, offset) for every video row (one row per
    * sampled frame; deterministic offsets).
    */
  def frameOffsets(spark: SparkSession, dir: String): DataFrame =
    sampleFrames(mediaTable(spark, dir)).toDF()

  /** Declared query: per-kind feature statistics — proves the payload ->
    * batch decode -> aggregate pipeline end-to-end. Aggregates exact
    * integer counts (never fold-order-dependent double sums) so the
    * DuckDB oracle can reproduce it from the same byte definition.
    */
  def featureStats(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(mediaTable(spark, dir)).toDF()
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n"),
        sum(col("n_bytes")).as("total_bytes"),
        sum(col("bin0_hits")).as("bin0_hits"))
      .withColumn("bin0_ratio", round(col("bin0_hits") / col("total_bytes"), 6))

  /** Perceptual signature of a payload: a 64-bit hash whose bit b says
    * "byte-class b is over-represented" (64-bin byte histogram, bit set
    * iff 64*count(bin) > length — pure integer arithmetic, so any engine
    * reproduces it exactly). The stub analog of an image pHash: decoded
    * content with the same coarse feature profile collides.
    */
  def perceptualSignature(payload: Array[Byte]): Long = {
    val counts = new Array[Int](64)
    var i = 0
    while (i < payload.length) {
      counts((payload(i) & 0xff) % 64) += 1
      i += 1
    }
    var h = 0L
    var b = 0
    while (b < 64) {
      if (64L * counts(b) > payload.length) h |= (1L << b)
      b += 1
    }
    h
  }

  /** Declared query: perceptual-signature dedup groups — the image-
    * pipeline near-dup pattern (bucket by fingerprint of the DECODED
    * content, no pairwise comparison anywhere). One row per (kind,
    * signature) bucket holding >1 media row: the keeper (min media_id),
    * member count, and total payload bytes the dedup would reclaim.
    *
    * Scale shape: map-only signature extraction fused with the decode
    * scan, then ONE groupBy on a 64-bit key — the whole dedup is a
    * single partial-aggregated shuffle of (kind, long) pairs; payloads
    * never shuffle. Contrast with the quadratic pairing detectors in
    * [[Dedup]]: bucket-grouping is how media dedup stays linear at 100 TB.
    */
  def signatureDedupGroups(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .map(r => (r.media_id, r.kind, perceptualSignature(r.payload),
        r.payload.length.toLong))
      .toDF("media_id", "kind", "signature", "n_bytes")
      .groupBy(col("kind"), col("signature"))
      .agg(count(lit(1)).as("n"),
        min(col("media_id")).as("keep_id"),
        sum(col("n_bytes")).as("total_bytes"))
      .filter(col("n") > 1)
  }
}
