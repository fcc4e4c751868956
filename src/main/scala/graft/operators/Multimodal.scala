package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed in partition-local
  * batches — the Scala analog of the arrow-batched mapInPandas pattern
  * (north-star extension; training pipelines carry media this way).
  *
  * The IMAGE leg is REAL: [[ImageCodec]] encodes and decodes genuine
  * PNG byte streams through the pure-JVM `javax.imageio`, and the
  * perceptual hash is computed from decoded pixels
  * ([[phashDedupGroups]]). The audio/video decode steps remain STUBS
  * ([[MediaCodec.decodeStub]] — no audio/video codecs in this
  * container): deterministic fake features over raw bytes, with the
  * real plumbing (schema, binary payload column, batched mapPartitions
  * execution, metadata struct, partitioning) around them.
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

  /** REAL image codec leg (no stub): `javax.imageio` is pure-JVM, so
    * the PNG encode/decode round-trip runs for real in this sandbox —
    * payloads are genuine PNG byte streams and the perceptual hash is
    * computed from DECODED PIXELS, not payload bytes.
    */
  object ImageCodec {
    import java.awt.image.BufferedImage

    /** Render a deterministic 16x16 RGB raster from a seed byte string
      * (pixels drawn from a Random seeded by the bytes' FNV-1a hash)
      * and encode it as a real PNG. Same seed bytes => bit-identical
      * pixels; PNG is lossless, so decode returns them exactly.
      */
    def renderPng(seed: Array[Byte]): Array[Byte] = {
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < seed.length) {
        h ^= (seed(i) & 0xffL); h *= 0x100000001b3L; i += 1
      }
      val r = new java.util.Random(h)
      val img = new BufferedImage(16, 16, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < 16) {
        var x = 0
        while (x < 16) {
          img.setRGB(x, y, r.nextInt(1 << 24)); x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Average-hash over DECODED pixels: ImageIO.read the PNG, 2x2
      * block-average to 8x8 integer grayscale (gray = r+g+b, exact),
      * bit b set iff 64·gray(b) > Σ gray — pure integer arithmetic on
      * real decoded content, so identical images collide and the hash
      * is engine-reproducible given the same decoder.
      */
    def averageHash(png: Array[Byte]): Long = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(png))
      require(img != null && img.getWidth == 16 && img.getHeight == 16,
        "expected a 16x16 PNG payload")
      val gray = new Array[Long](64)
      var total = 0L
      var by = 0
      while (by < 8) {
        var bx = 0
        while (bx < 8) {
          var g = 0L
          var dy = 0
          while (dy < 2) {
            var dx = 0
            while (dx < 2) {
              val rgb = img.getRGB(bx * 2 + dx, by * 2 + dy)
              g += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
              dx += 1
            }
            dy += 1
          }
          gray(by * 8 + bx) = g
          total += g
          bx += 1
        }
        by += 1
      }
      var hash = 0L
      var b = 0
      while (b < 64) {
        if (64L * gray(b) > total) hash |= (1L << b)
        b += 1
      }
      hash
    }
  }

  /** Real-PNG media table: one genuine PNG per document, rendered
    * deterministically from the document TITLE (its first three
    * whitespace words — the fixture's collision-bearing key: distinct
    * docs sharing a title render bit-identical images, the thumbnail
    * situation media dedup exists for).
    */
  def imageTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val title = text.split(" ").take(3).mkString(" ")
        (id, ImageCodec.renderPng(title.getBytes("UTF-8")))
      }
      .toDF("media_id", "png")
  }

  /** Declared query: perceptual-hash dedup over REAL decoded pixels —
    * render → PNG-encode → `ImageIO.read` decode → 8x8 average-hash →
    * bucket-group. One map-only pass fused with the scan (payloads
    * never shuffle; only (media_id, long) pairs do), then one
    * partial-aggregated groupBy on the 64-bit hash — the linear media
    * dedup shape at any scale.
    *
    * Oracle-checkable WITHOUT a decoder on the oracle side: rendering
    * is injective per distinct title (seeded 16x16 draws; cross-title
    * hash collisions are ~n²/2⁶⁴) and PNG is lossless, so the decoded
    * aHash groups are EXACTLY the title duplicate groups — which
    * DuckDB derives independently from the first three words. A broken
    * decode (constant pixels, wrong channel order collapsing content)
    * would merge unrelated groups and fail the row/hash compare.
    * Output: (keep_id, n) per duplicate group.
    */
  def phashDedupGroups(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    imageTable(spark, dir)
      .select(col("media_id"), col("png"))
      .as[(Long, Array[Byte])]
      .map { case (id, png) => (id, ImageCodec.averageHash(png)) }
      .toDF("media_id", "phash")
      .groupBy(col("phash"))
      .agg(min(col("media_id")).as("keep_id"), count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .select(col("keep_id"), col("n"))
  }
}
