package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Multimodal column plumbing over REAL media bytes (PNG/WAV built
  * in-test — no external files): header sniffing, ImageIO resize,
  * feature extraction, and the video frame-sample stub's shape.
  */
class MultimodalSpec extends SparkSpec {

  private def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def wav(sampleRate: Int, channels: Int): Array[Byte] = {
    val data = new Array[Byte](64)
    val bb = java.nio.ByteBuffer.allocate(44 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(36 + data.length).put("WAVE".getBytes)
    bb.put("fmt ".getBytes).putInt(16).putShort(1)
      .putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * 2).putShort((channels * 2).toShort)
      .putShort(16)
    bb.put("data".getBytes).putInt(data.length).put(data)
    bb.array()
  }

  private def mediaDf = {
    import spark.implicits._
    Seq(
      (1L, png(8, 6, 0xff0000)),
      (2L, png(16, 16, 0x0000ff)),
      (3L, wav(44100, 2)),
      (4L, "not media at all".getBytes("UTF-8")))
      .toDF("id", "blob")
  }

  test("header sniff: png/wav dimensions without decoding") {
    val rows = Multimodal.withMediaMeta(mediaDf, "blob")
      .select(col("id"), col("meta.mime"), col("meta.width"),
        col("meta.height"), col("meta.sample_rate"), col("meta.channels"))
      .orderBy("id").collect()
    assert(rows(0).getString(1) == "image/png" &&
      rows(0).getInt(2) == 8 && rows(0).getInt(3) == 6)
    assert(rows(1).getInt(2) == 16 && rows(1).getInt(3) == 16)
    assert(rows(2).getString(1) == "audio/wav" &&
      rows(2).getInt(4) == 44100 && rows(2).getInt(5) == 2)
    assert(rows(3).isNullAt(1), "non-media must sniff as unknown, not error")
  }

  test("resize re-encodes to the target dimensions; bad blobs yield null") {
    val out = Multimodal.resizeImages(mediaDf, "blob", "thumb", 4, 4)
    val metas = Multimodal.withMediaMeta(
      out.filter(col("thumb").isNotNull).select(col("id"), col("thumb").as("blob")),
      "blob").select(col("id"), col("meta.width"), col("meta.height"))
      .orderBy("id").collect()
    assert(metas.length == 2, "only the two PNGs decode")
    assert(metas.forall(r => r.getInt(1) == 4 && r.getInt(2) == 4))
    val bad = out.filter(col("id") >= 3).select("thumb").collect()
    assert(bad.forall(_.isNullAt(0)))
  }

  test("image features: solid-color means are exact") {
    val feats = Multimodal.imageFeatures(mediaDf.filter(col("id") === 1), "blob", "f")
      .select("f").head().getSeq[Float](0)
    assert(math.abs(feats(0) - 1.0f) < 1e-6, "red channel of solid red = 1")
    assert(feats(1) == 0.0f && feats(2) == 0.0f)
  }

  test("audio features: real PCM decode of a synthesized sine wave") {
    import spark.implicits._
    // 1-second 440 Hz full-scale sine at 8 kHz mono, 16-bit PCM
    val rate = 8000
    val samples = Array.tabulate(rate)(i =>
      (math.sin(2 * math.Pi * 440 * i / rate) * 32767).toShort)
    val bb = java.nio.ByteBuffer.allocate(44 + 2 * samples.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(36 + 2 * samples.length).put("WAVE".getBytes)
    bb.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
    bb.put("data".getBytes).putInt(2 * samples.length)
    samples.foreach(bb.putShort)
    val df = Seq((1L, bb.array()), (2L, "junk".getBytes("UTF-8")))
      .toDF("id", "blob")
    val out = Multimodal.audioFeatures(df, "blob", "feats")
      .orderBy("id").select("feats").as[Seq[Float]].collect()
    val f = out(0)
    assert(math.abs(f(0) - 1.0f) < 1e-3, s"duration: ${f(0)}")
    // full-scale sine: rms = 1/sqrt(2), peak ~1, zcr ~2*440/8000
    assert(math.abs(f(1) - 0.7071f) < 0.01, s"rms: ${f(1)}")
    assert(f(2) > 0.99f && f(2) <= 1.0f, s"peak: ${f(2)}")
    assert(math.abs(f(3) - 2.0f * 440 / 8000) < 0.005, s"zcr: ${f(3)}")
    assert(out(1) == null, "non-WAV blob must yield null features")
  }

  /** A wxh solid-color JPEG via ImageIO. */
  private def jpeg(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, rgb)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  test("video frames: MJPEG-in-AVI round-trip with exact counts and dimensions") {
    import spark.implicits._
    // 10 frames, each a distinct gray level so frame ORDER is checkable
    val srcFrames = (0 until 10).map(i => jpeg(32, 24, i * 20 * 0x010101))
    val avi = Multimodal.mjpegAvi(srcFrames, 32, 24)
    val df = Seq((1L, avi), (2L, "not a video".getBytes("UTF-8")),
      (3L, null.asInstanceOf[Array[Byte]])).toDF("id", "blob")
    val all = Multimodal.videoFrames(df, "blob")
      .select("id", "frame_idx", "frame").orderBy("id", "frame_idx").collect()
    assert(all.forall(_.getLong(0) == 1L), "only the AVI blob yields frames")
    assert(all.map(_.getInt(1)).toSeq == (0 until 10), "all 10 frames, in order")
    all.foreach { r =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](2)))
      assert(img != null && img.getWidth == 32 && img.getHeight == 24,
        "each frame must be a standalone decodable JPEG of the source size")
    }
    // frames come back byte-identical (MJPEG frames are stored verbatim)
    assert(all.map(_.getAs[Array[Byte]](2).toSeq).toSeq == srcFrames.map(_.toSeq),
      "frame payloads survive the container round-trip byte-for-byte")
  }

  test("video frames: everyNth sampling and maxFrames cap") {
    import spark.implicits._
    val srcFrames = (0 until 9).map(i => jpeg(8, 8, i))
    val avi = Multimodal.mjpegAvi(srcFrames, 8, 8)
    val df = Seq((1L, avi)).toDF("id", "blob")
    val sampled = Multimodal.videoFrames(df, "blob", everyNth = 3)
      .select("frame_idx").as[Int].collect().toSeq.sorted
    assert(sampled == Seq(0, 3, 6), "every 3rd source frame")
    val capped = Multimodal.videoFrames(df, "blob", everyNth = 2, maxFrames = 2)
      .select("frame_idx").as[Int].collect().toSeq.sorted
    assert(capped == Seq(0, 2), "sampling applies before the cap")
  }

  test("video frames: truncated containers yield zero rows, never exceptions") {
    import spark.implicits._
    val avi = Multimodal.mjpegAvi(Seq(jpeg(8, 8, 1), jpeg(8, 8, 2)), 8, 8)
    // every prefix of a valid AVI must be handled — including cuts that
    // end exactly after a chunk header (the nasty boundary)
    val prefixes = (0 to avi.length).by(7).map(n => avi.take(n)) :+
      (avi.take(12) ++ "00dc".getBytes ++ Array[Byte](2, 0, 0, 0)) // header, no payload
    val df = prefixes.zipWithIndex.map { case (b, i) => (i.toLong, b) }
      .toDF("id", "blob")
    val n = Multimodal.videoFrames(df, "blob").count() // must not throw
    assert(n <= prefixes.length * 2)
  }

  test("video frames: sampled frames feed the image ops unchanged") {
    import spark.implicits._
    val avi = Multimodal.mjpegAvi(Seq(jpeg(16, 16, 0xff0000)), 16, 16)
    val frames = Multimodal.videoFrames(
      Seq((1L, avi)).toDF("id", "blob"), "blob")
    val feats = Multimodal.imageFeatures(frames, "frame", "rgb")
      .select("rgb").as[Seq[Float]].collect().head
    assert(feats(0) > 0.9f && feats(1) < 0.1f && feats(2) < 0.1f,
      s"a red frame must feature-extract as red: $feats")
    val meta = Multimodal.withMediaMeta(frames, "frame")
      .select("meta.mime", "meta.width", "meta.height").collect().head
    assert(meta.getString(0) == "image/jpeg" &&
      meta.getInt(1) == 16 && meta.getInt(2) == 16)
  }
}
