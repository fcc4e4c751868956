package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.operators.Multimodal.MediaCodec

class MultimodalSpec extends SparkSpec {

  test("media table: payload/metadata schema over all docs") {
    val m = Multimodal.mediaTable(spark, sf0001).cache()
    assert(m.count() == 500)
    val kinds = m.select("kind").distinct().collect().map(_.getString(0)).toSet
    assert(kinds == Set("image", "audio", "video"))
    assert(m.filter(col("width") < 16 || col("height") < 16).count() == 0)
  }

  test("batched feature extraction: normalized 16-dim features") {
    val f = Multimodal.extractFeatures(Multimodal.mediaTable(spark, sf0001),
      batchSize = 32).cache()
    assert(f.count() == 500)
    assert(f.filter(size(col("features")) =!= MediaCodec.FeatureDim).count() == 0)
    // normalized histogram sums to ~1
    val bad = f.toDF().select(
      abs(aggregate(col("features"), lit(0.0), (a, x) => a + x) - 1.0).as("err"))
      .filter(col("err") > 1e-9).count()
    assert(bad == 0)
  }

  test("decode stub is deterministic and matches a hand histogram") {
    val payload = "aab".getBytes("UTF-8") // a=97 -> bin 1, b=98 -> bin 2
    val f = MediaCodec.decodeStub(payload)
    assert(math.abs(f(97 % 16) - 2.0 / 3) < 1e-12)
    assert(math.abs(f(98 % 16) - 1.0 / 3) < 1e-12)
    assert(f.sum > 0.999999 && f.sum < 1.000001)
  }

  test("frame sampling: n evenly spaced offsets per video row") {
    val media = Multimodal.mediaTable(spark, sf0001)
    val frames = Multimodal.sampleFrames(media, n = 4).cache()
    val nVideo = media.filter(col("kind") === "video").count()
    assert(frames.count() == 4 * nVideo)
    assert(frames.filter(col("frame_idx") >= 4).count() == 0)
    assert(frames.filter(col("offset") < 0).count() == 0)
  }

  test("feature stats: per-kind counts conserve the table") {
    val s = Multimodal.featureStats(spark, sf0001).cache()
    assert(s.count() == 3)
    assert(s.agg(sum("n")).collect()(0).getLong(0) == 500)
    assert(s.filter(col("bin0_ratio") < 0 || col("bin0_ratio") > 1).count() == 0)
  }

  test("signature dedup groups match a brute-force bucket-by-fingerprint") {
    val media = Multimodal.mediaTable(spark, sf0001).collect()
    val expected = media
      .map(r => (r.kind, Multimodal.perceptualSignature(r.payload),
        r.media_id, r.payload.length.toLong))
      .groupBy { case (kind, sig, _, _) => (kind, sig) }
      .collect { case ((kind, sig), rows) if rows.length > 1 =>
        (kind, sig) -> ((rows.length.toLong, rows.map(_._3).min,
          rows.map(_._4).sum))
      }.toMap
    assert(expected.nonEmpty, "fixture has no signature collisions?")
    val got = Multimodal.signatureDedupGroups(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == expected,
      s"got=${got.size} expected=${expected.size} " +
        s"diff=${got.filter { case (k, v) => expected.get(k) != Some(v) }.take(3)}")
  }

  test("PNG round-trip is lossless and aHash runs on decoded pixels") {
    val seed = "the quick brown fox".getBytes("UTF-8")
    val png = Multimodal.ImageCodec.renderPng(seed)
    // a genuine PNG byte stream (magic bytes), not a fake payload
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N' &&
      png(3) == 'G', "payload is not a real PNG")
    // lossless round-trip: decode returns the rendered raster exactly
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(png))
    val img2 = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
      Multimodal.ImageCodec.renderPng(seed)))
    for (y <- 0 until 16; x <- 0 until 16)
      assert(img.getRGB(x, y) == img2.getRGB(x, y))
    // same seed -> same hash; different seed -> different hash
    val h1 = Multimodal.ImageCodec.averageHash(png)
    val h2 = Multimodal.ImageCodec.averageHash(
      Multimodal.ImageCodec.renderPng(seed))
    val h3 = Multimodal.ImageCodec.averageHash(
      Multimodal.ImageCodec.renderPng("other text".getBytes("UTF-8")))
    assert(h1 == h2)
    assert(h1 != h3)
  }

  test("decoded-pixel pHash dedup equals the title group structure") {
    val texts = Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").take(3).mkString(" ")))
    val expected = texts.groupBy(_._2).values
      .filter(_.length > 1)
      .map(g => (g.map(_._1).min, g.length.toLong)).toSet
    assert(expected.nonEmpty, "fixture has no title dups?")
    val got = Multimodal.phashDedupGroups(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected, s"got=$got expected=$expected")
  }

  test("WAV round-trip is lossless and fingerprint runs on decoded samples") {
    val seed = "the quick brown fox".getBytes("UTF-8")
    val wav = Multimodal.AudioCodec.renderWav(seed)
    // a genuine RIFF/WAVE byte stream, not a fake payload
    assert(wav(0) == 'R' && wav(1) == 'I' && wav(2) == 'F' && wav(3) == 'F' &&
      wav(8) == 'W' && wav(9) == 'A' && wav(10) == 'V' && wav(11) == 'E',
      "payload is not a real WAV")
    // decode through the real AudioSystem parser returns the synthesized
    // samples exactly (16-bit PCM is lossless)
    val s1 = Multimodal.AudioCodec.decodeSamples(wav)
    val s2 = Multimodal.AudioCodec.decodeSamples(
      Multimodal.AudioCodec.renderWav(seed))
    assert(s1.length == Multimodal.AudioCodec.NumSamples)
    assert(s1.sameElements(s2))
    // square-wave synthesis: every sample is one of the segment amps
    assert(s1.forall(v => math.abs(v) >= 4096 && math.abs(v) < 20480))
    val h1 = Multimodal.AudioCodec.fingerprint(wav)
    val h2 = Multimodal.AudioCodec.fingerprint(
      Multimodal.AudioCodec.renderWav(seed))
    val h3 = Multimodal.AudioCodec.fingerprint(
      Multimodal.AudioCodec.renderWav("other text".getBytes("UTF-8")))
    assert(h1 == h2)
    assert(h1 != h3)
  }

  test("decoded-sample audio dedup equals the title group structure") {
    val texts = Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").take(3).mkString(" ")))
    val expected = texts.groupBy(_._2).values
      .filter(_.length > 1)
      .map(g => (g.map(_._1).min, g.length.toLong)).toSet
    assert(expected.nonEmpty, "fixture has no title dups?")
    val got = Multimodal.audioDedupGroups(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected, s"got=$got expected=$expected")
  }

  test("animated GIF round-trip is lossless; keyframe sampling shapes the fingerprint") {
    val seed = "the quick brown fox".getBytes("UTF-8")
    val gif = Multimodal.VideoCodec.renderGif(seed)
    // a genuine GIF89a/87a container
    assert(gif(0) == 'G' && gif(1) == 'I' && gif(2) == 'F',
      "payload is not a real GIF")
    val f1 = Multimodal.VideoCodec.decodeFrames(gif)
    val f2 = Multimodal.VideoCodec.decodeFrames(
      Multimodal.VideoCodec.renderGif(seed))
    assert(f1.length == Multimodal.VideoCodec.Frames)
    // gray-palette round trip is pixel-exact and frames genuinely differ
    for (i <- f1.indices) assert(f1(i).sameElements(f2(i)), s"frame $i")
    assert(f1.map(_.toSeq).distinct.length == f1.length,
      "frames should differ within a clip")
    val h1 = Multimodal.VideoCodec.fingerprint(gif)
    val h2 = Multimodal.VideoCodec.fingerprint(
      Multimodal.VideoCodec.renderGif(seed))
    val h3 = Multimodal.VideoCodec.fingerprint(
      Multimodal.VideoCodec.renderGif("other text".getBytes("UTF-8")))
    assert(h1 == h2)
    assert(h1 != h3)
    // stride=1 hashes ALL frames, stride=2 only keyframes 0 and 2 —
    // different sampled sets must fingerprint differently (the
    // coarse-recall trade frame sampling makes is real, not a no-op)
    assert(Multimodal.VideoCodec.fingerprint(gif, stride = 1) != h1)
  }

  test("decoded-frame video dedup equals the title group structure") {
    val texts = Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").take(3).mkString(" ")))
    val expected = texts.groupBy(_._2).values
      .filter(_.length > 1)
      .map(g => (g.map(_._1).min, g.length.toLong)).toSet
    val got = Multimodal.videoDedupGroups(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected, s"got=$got expected=$expected")
  }

  test("IHDR parse reads real container headers at arbitrary sizes") {
    for ((w, h) <- Seq((8, 8), (31, 9), (16, 24))) {
      val png = Multimodal.ImageCodec.renderPngSized(
        s"t$w x$h".getBytes("UTF-8"), w, h)
      val (pw, ph, depth, color) = Multimodal.pngHeader(png)
      assert((pw, ph) == (w, h), s"dims ($pw,$ph) != ($w,$h)")
      assert(depth == 8 && color == 2, s"depth=$depth color=$color")
    }
    // a non-PNG stream is rejected, not misparsed
    intercept[IllegalArgumentException] {
      Multimodal.pngHeader("RIFFxxxxWAVE not a png at all".getBytes)
    }
    ()
  }
}
