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

  test("video frame stub: deterministic frames, explode shape") {
    val frames = Multimodal.videoFrameStub(mediaDf.filter(col("id") === 1),
      "blob", everyNth = 10, maxFrames = 3)
    val rows = frames.select("id", "frame_idx", "frame").orderBy("frame_idx").collect()
    assert(rows.map(_.getInt(1)).toSeq == Seq(0, 1, 2))
    val again = Multimodal.videoFrameStub(mediaDf.filter(col("id") === 1),
      "blob", 10, 3).select("frame").orderBy("frame_idx").collect()
    assert(rows.map(_.getAs[Array[Byte]](2).toSeq).toSeq ==
      again.map(_.getAs[Array[Byte]](0).toSeq).toSeq, "stub must be deterministic")
  }
}
