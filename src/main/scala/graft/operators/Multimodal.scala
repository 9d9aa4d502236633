package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) columns for training-data pipelines:
  * media rides as opaque `binary` columns with typed metadata, and the
  * decode / resize / feature steps run where the bytes already live —
  * mapPartitions over the scan, no shuffle of blob data.
  *
  * Reference anchors: the AI processor family operates on image content
  * blocks (e.g. docs/modules/components/pages/processors/
  * openai_chat_completion.adoc:26 image inputs); this module gives those
  * payloads a first-class columnar form.
  *
  * Scale notes: blobs NEVER enter a shuffle here — every transform is a
  * narrow map over the files scan, so `spark.sql.files.maxPartitionBytes`
  * alone controls task sizing. Joins against media tables should join on
  * the id/metadata columns first and fetch bytes late (Parquet column
  * pruning keeps untouched blob columns unread).
  *
  * Decode strategy: image header PARSING (format/width/height) is a pure
  * JVM kernel — no decode, ~100 bytes read per blob. Full decode/resize
  * uses JDK ImageIO (png/jpeg/gif/bmp — built into the JDK, headless-
  * safe). Video frame-sampling is a REAL decode for MJPEG-in-AVI
  * ([[videoFrames]] — a RIFF chunk walk whose `##dc` payloads are
  * complete JPEGs, no codec library involved); other codecs (h264…)
  * need a codec jar and are rejected cleanly.
  */
object Multimodal {

  /** Parsed-from-header media metadata: mime, width, height (images);
    * sampleRate/channels (wav audio); -1 where not applicable.
    */
  val MetaSchema: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType)))

  /** Sniff format + dimensions from the blob HEADER (no decode):
    * PNG IHDR, JPEG SOF0/2 scan, GIF logical screen, WAV fmt chunk.
    * Unknown formats yield (null mime, -1 dims) rather than an error —
    * corrupt blobs are data, not exceptions, in a 100 TB corpus.
    */
  def mediaMeta(bytes: Array[Byte]): Row = {
    def u8(i: Int) = bytes(i) & 0xff
    def be16(i: Int) = (u8(i) << 8) | u8(i + 1)
    def be32(i: Int) = (be16(i) << 16) | be16(i + 2)
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int) = le16(i) | (le16(i + 2) << 16)
    try {
      if (bytes.length >= 24 && u8(0) == 0x89 && u8(1) == 'P' && u8(2) == 'N' &&
          u8(3) == 'G')
        Row("image/png", be32(16), be32(20), -1, -1)
      else if (bytes.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
        // JPEG: walk markers to the first SOF frame header
        var i = 2
        var out: Row = Row("image/jpeg", -1, -1, -1, -1)
        var done = false
        while (!done && i + 9 < bytes.length) {
          if (u8(i) != 0xff) { i += 1 }
          else {
            val marker = u8(i + 1)
            if (marker >= 0xc0 && marker <= 0xcf &&
                marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
              out = Row("image/jpeg", be16(i + 7), be16(i + 5), -1, -1)
              done = true
            } else if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd9)) {
              i += 2
            } else {
              i += 2 + be16(i + 2)
            }
          }
        }
        out
      } else if (bytes.length >= 10 && u8(0) == 'G' && u8(1) == 'I' && u8(2) == 'F')
        Row("image/gif", le16(6), le16(8), -1, -1)
      else if (bytes.length >= 36 && u8(0) == 'R' && u8(1) == 'I' && u8(2) == 'F' &&
               u8(3) == 'F' && u8(8) == 'W' && u8(9) == 'A' && u8(10) == 'V')
        Row("audio/wav", -1, -1, le32(24), le16(22))
      else Row(null, -1, -1, -1, -1)
    } catch {
      case _: IndexOutOfBoundsException => Row(null, -1, -1, -1, -1)
    }
  }

  /** Metadata column for every blob: mapPartitions keeps the header
    * sniff adjacent to the scan; output schema = input + `meta` struct.
    */
  def withMediaMeta(df: DataFrame, blobCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField("meta", MetaSchema))
    val blobIdx = df.schema.fieldIndex(blobCol)
    implicit val enc = Encoders.row(outSchema)
    df.mapPartitions { it =>
      it.map { r =>
        val bytes = r.get(blobIdx).asInstanceOf[Array[Byte]]
        val meta = if (bytes == null) Row(null, -1, -1, -1, -1) else mediaMeta(bytes)
        Row.fromSeq(r.toSeq :+ meta)
      }
    }
  }

  /** Decode + bilinear resize + re-encode PNG via JDK ImageIO. Failed
    * decodes yield null (kept, filterable) — never a task failure.
    */
  def resizeImages(df: DataFrame, blobCol: String, outCol: String,
                   width: Int, height: Int): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField(outCol, BinaryType))
    val blobIdx = df.schema.fieldIndex(blobCol)
    implicit val enc = Encoders.row(outSchema)
    df.mapPartitions { it =>
      it.map { r =>
        val bytes = r.get(blobIdx).asInstanceOf[Array[Byte]]
        val resized: Array[Byte] =
          if (bytes == null) null
          else try {
            val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
            if (img == null) null
            else {
              val out = new java.awt.image.BufferedImage(width, height,
                java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g = out.createGraphics()
              g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(img, 0, 0, width, height, null)
              g.dispose()
              val bos = new ByteArrayOutputStream()
              javax.imageio.ImageIO.write(out, "png", bos)
              bos.toByteArray
            }
          } catch { case _: Exception => null }
        Row.fromSeq(r.toSeq :+ resized)
      }
    }
  }

  /** Mean RGB features per image — the feature-extract step shape.
    * Output: array<float> [meanR, meanG, meanB] in [0,1]; null on
    * decode failure.
    */
  def imageFeatures(df: DataFrame, blobCol: String, outCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField(outCol, ArrayType(FloatType)))
    val blobIdx = df.schema.fieldIndex(blobCol)
    implicit val enc = Encoders.row(outSchema)
    df.mapPartitions { it =>
      it.map { r =>
        val bytes = r.get(blobIdx).asInstanceOf[Array[Byte]]
        val feats: Seq[Float] =
          if (bytes == null) null
          else try {
            val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
            if (img == null) null
            else {
              var sr = 0L; var sg = 0L; var sb = 0L
              var y = 0
              while (y < img.getHeight) {
                var x = 0
                while (x < img.getWidth) {
                  val p = img.getRGB(x, y)
                  sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
                  x += 1
                }
                y += 1
              }
              val n = img.getWidth.toLong * img.getHeight * 255
              Seq(sr.toFloat / n, sg.toFloat / n, sb.toFloat / n)
            }
          } catch { case _: Exception => null }
        Row.fromSeq(r.toSeq :+ feats)
      }
    }
  }

  /** Audio features from PCM WAV blobs — a REAL decode (PCM is pure
    * byte math, no codec library needed; non-PCM formats like mp3/flac
    * would need a codec jar). Walks the RIFF chunks to the fmt + data
    * chunks and computes over the FIRST channel:
    * [duration_s, rms, peak, zero_crossing_rate], all in [0,1]-ish
    * normalized units (rms/peak over full-scale). Null on non-WAV /
    * non-PCM-16 blobs — kept, filterable, never a task failure.
    */
  def audioFeatures(df: DataFrame, blobCol: String, outCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField(outCol, ArrayType(FloatType)))
    val blobIdx = df.schema.fieldIndex(blobCol)
    implicit val enc = Encoders.row(outSchema)
    df.mapPartitions { it =>
      it.map { r =>
        val bytes = r.get(blobIdx).asInstanceOf[Array[Byte]]
        val feats: Seq[Float] =
          if (bytes == null) null
          else try audioFeatureKernel(bytes)
          catch { case _: Exception => null }
        Row.fromSeq(r.toSeq :+ feats)
      }
    }
  }

  private def audioFeatureKernel(b: Array[Byte]): Seq[Float] = {
    def le16(i: Int) = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    def le32(i: Int) = le16(i) | (le16(i + 2) << 16)
    if (b.length < 44 || new String(b, 0, 4, "US-ASCII") != "RIFF" ||
        new String(b, 8, 4, "US-ASCII") != "WAVE") return null
    // walk chunks for fmt + data
    var pos = 12
    var sampleRate = 0; var channels = 0; var bits = 0; var fmt = 0
    var dataOff = -1; var dataLen = 0
    while (pos + 8 <= b.length && (dataOff < 0 || sampleRate == 0)) {
      val id = new String(b, pos, 4, "US-ASCII")
      val len = le32(pos + 4)
      // a corrupt/negative chunk length would stall the walk (pos += 0)
      // and pin the task forever — treat it as not-a-WAV instead
      if (len < 0 || pos + 8 + len < pos) return null
      if (id == "fmt ") {
        fmt = le16(pos + 8); channels = le16(pos + 10)
        sampleRate = le32(pos + 12); bits = le16(pos + 22)
      } else if (id == "data") { dataOff = pos + 8; dataLen = len }
      pos += 8 + len + (len & 1)
    }
    if (fmt != 1 || bits != 16 || sampleRate <= 0 || channels <= 0 ||
        dataOff < 0) return null
    val frameBytes = 2 * channels
    val n = math.min(dataLen, b.length - dataOff) / frameBytes
    if (n == 0) return Seq(0f, 0f, 0f, 0f)
    var sumSq = 0.0; var peak = 0.0; var zc = 0L; var prev = 0
    var i = 0
    while (i < n) {
      val s = le16(dataOff + i * frameBytes).toShort.toInt
      val norm = s / 32768.0
      sumSq += norm * norm
      if (math.abs(norm) > peak) peak = math.abs(norm)
      if (i > 0 && ((s >= 0) != (prev >= 0))) zc += 1
      prev = s
      i += 1
    }
    Seq((n.toDouble / sampleRate).toFloat, math.sqrt(sumSq / n).toFloat,
      peak.toFloat, (zc.toDouble / n).toFloat)
  }

  /** Video frame sampling — a REAL decode for MJPEG-in-AVI, the one
    * mainstream video container whose frames need no codec library: an
    * AVI file is a RIFF tree (the same chunk walk as the WAV kernel
    * above), its `movi` LIST holds one sub-chunk per frame, and for
    * MJPEG each `##dc`/`##db` sub-chunk's payload IS a complete JPEG.
    * Every `everyNth`-th frame is emitted (up to `maxFrames`) as a
    * standalone JPEG blob — downstream image ops (resize / features /
    * meta) consume it unchanged.
    *
    * The walk is lazy and allocation-light: skipped frames are never
    * copied, and rows explode where the bytes already live (narrow
    * mapPartitions, no blob shuffle). Non-AVI / non-MJPEG / corrupt
    * blobs yield zero rows — data, not exceptions. Other codecs
    * (h264 etc.) need a codec jar; this kernel rejects them cleanly
    * (their `##dc` payloads are not JPEG-magic-prefixed).
    */
  def videoFrames(df: DataFrame, blobCol: String, everyNth: Int = 1,
                  maxFrames: Int = Int.MaxValue): DataFrame = {
    require(everyNth >= 1, "everyNth must be >= 1")
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame", BinaryType)))
    val blobIdx = df.schema.fieldIndex(blobCol)
    implicit val enc = Encoders.row(outSchema)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val bytes = r.get(blobIdx).asInstanceOf[Array[Byte]]
        if (bytes == null) Iterator.empty
        else aviMjpegFrames(bytes).zipWithIndex
          .collect { case (f, i) if i % everyNth == 0 => (f, i) }
          .take(maxFrames)
          .map { case (f, i) => Row.fromSeq(r.toSeq ++ Seq(i, f)) }
      }
    }
  }

  /** Lazy offset-ordered iterator over the JPEG payloads of an AVI's
    * `movi` list (OpenDML AVI: frames may sit directly in `movi` or
    * inside interleaved `rec ` sub-lists). Returns empty for anything
    * that is not a well-formed MJPEG AVI.
    */
  private[operators] def aviMjpegFrames(b: Array[Byte]): Iterator[Array[Byte]] = {
    def fourcc(i: Int) = new String(b, i, 4, "US-ASCII")
    def le32(i: Int) = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
    if (b.length < 12 || fourcc(0) != "RIFF" || fourcc(8) != "AVI ")
      return Iterator.empty
    // frame chunk: '##dc'/'##db' (stream-indexed compressed/raw DIB)
    def isFrameId(id: String) =
      id.length == 4 && id(0).isDigit && id(1).isDigit &&
        (id.endsWith("dc") || id.endsWith("db"))
    // walk one chunk run over [pos, end), descending into movi/rec
    def walk(pos0: Int, end: Int): Iterator[Array[Byte]] =
      new Iterator[Array[Byte]] {
        private var pos = pos0
        private var nested: Iterator[Array[Byte]] = Iterator.empty
        private var nextFrame: Array[Byte] = _
        private def advance(): Unit = {
          nextFrame = null
          while (nextFrame == null) {
            if (nested.hasNext) { nextFrame = nested.next(); return }
            if (pos + 8 > end || pos + 8 > b.length) return
            val id = fourcc(pos)
            val len = le32(pos + 4)
            // negative/overflowing length = corrupt; stop, don't spin
            if (len < 0 || pos + 8 + len < pos) return
            val dataStart = pos + 8
            val dataEnd = math.min(math.min(dataStart + len, end), b.length)
            // guard reads against AVAILABLE bytes, not the declared
            // len — a truncated file may end right after a header
            val avail = dataEnd - dataStart
            if (id == "LIST" && len >= 4 && avail >= 4) {
              val listType = fourcc(dataStart)
              if (listType == "movi" || listType == "rec ")
                nested = walk(dataStart + 4, dataEnd)
            } else if (isFrameId(id) && len >= 2 && avail >= 2 &&
                       (b(dataStart) & 0xff) == 0xff &&
                       (b(dataStart + 1) & 0xff) == 0xd8) {
              // JPEG magic — copy exactly this frame's bytes
              nextFrame = java.util.Arrays.copyOfRange(b, dataStart, dataEnd)
            }
            pos += 8 + len + (len & 1) // chunks are word-aligned
          }
        }
        advance()
        override def hasNext: Boolean = nextFrame != null
        override def next(): Array[Byte] = {
          val f = nextFrame; advance(); f
        }
      }
    walk(12, b.length)
  }

  /** Minimal MJPEG-in-AVI writer (test-fixture / round-trip helper —
    * produces a structurally valid single-stream AVI: hdrl with avih +
    * one strl, then the movi list with one `00dc` chunk per JPEG).
    */
  def mjpegAvi(frames: Seq[Array[Byte]], width: Int, height: Int,
               fps: Int = 25): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    def le32(v: Int): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val o = new ByteArrayOutputStream()
      o.write(id.getBytes("US-ASCII")); o.write(le32(body.length))
      o.write(body)
      if (body.length % 2 == 1) o.write(0)
      o.toByteArray
    }
    def list(listType: String, bodies: Seq[Array[Byte]]): Array[Byte] = {
      val inner = new ByteArrayOutputStream()
      inner.write(listType.getBytes("US-ASCII"))
      bodies.foreach(inner.write)
      chunk("LIST", inner.toByteArray)
    }
    val avih = {
      val o = new ByteArrayOutputStream()
      o.write(le32(1000000 / math.max(fps, 1))) // usec per frame
      o.write(le32(0)); o.write(le32(0)); o.write(le32(0))
      o.write(le32(frames.length)); o.write(le32(0)); o.write(le32(1))
      o.write(le32(0)); o.write(le32(width)); o.write(le32(height))
      (0 until 4).foreach(_ => o.write(le32(0)))
      o.toByteArray
    }
    val strh = {
      val o = new ByteArrayOutputStream()
      o.write("vids".getBytes("US-ASCII"))
      o.write("MJPG".getBytes("US-ASCII"))
      o.write(le32(0)); o.write(le32(0)); o.write(le32(0))
      o.write(le32(1)); o.write(le32(math.max(fps, 1))) // scale/rate
      o.write(le32(0)); o.write(le32(frames.length))
      (0 until 5).foreach(_ => o.write(le32(0)))
      o.toByteArray
    }
    val strf = { // BITMAPINFOHEADER
      val o = new ByteArrayOutputStream()
      o.write(le32(40)); o.write(le32(width)); o.write(le32(height))
      o.write(Array[Byte](1, 0, 24, 0)) // planes=1, bpp=24
      o.write("MJPG".getBytes("US-ASCII"))
      (0 until 5).foreach(_ => o.write(le32(0)))
      o.toByteArray
    }
    val hdrl = list("hdrl", Seq(chunk("avih", avih),
      list("strl", Seq(chunk("strh", strh), chunk("strf", strf)))))
    val movi = list("movi", frames.map(f => chunk("00dc", f)))
    val riffBody = new ByteArrayOutputStream()
    riffBody.write("AVI ".getBytes("US-ASCII"))
    riffBody.write(hdrl); riffBody.write(movi)
    val body = riffBody.toByteArray
    bos.write("RIFF".getBytes("US-ASCII")); bos.write(le32(body.length))
    bos.write(body)
    bos.toByteArray
  }

  /** Late materialization helper: keep only ids + meta while planning,
    * re-join blobs at the end. Parquet never reads the blob column for
    * the pruned branch.
    */
  def pruneBlobs(df: DataFrame, blobCols: Seq[String]): DataFrame =
    df.drop(blobCols: _*)
}
