package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support (SURVEY §2.9 E4 + builder mandate): image/
  * audio/video payloads are opaque `BinaryType` columns with typed metadata.
  *
  * The Spark-side plumbing — schema, batch iteration, partition-parallel
  * decode — is real and tested. The IMAGE codec is also real:
  * [[ImageIoDecoder]] / [[decodeImageStats]] parse PNG/JPEG/GIF/BMP
  * containers and pixel data with `javax.imageio` (ships with the JDK, no
  * external libs). Audio/video decoding stays STUBBED (those codecs aren't
  * in this container) behind [[MediaDecoder]], which any real decoder
  * (javacv, a JNI codec, an external service) can replace without touching
  * the pipeline. The decode stage is `mapPartitions` over a typed Dataset:
  * one decoder instance per partition (the Spark idiom for per-executor
  * native resources), rows streamed, never collected.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                           width: Int, height: Int, n_frames: Int, checksum: Long)

  /** Pluggable decoder. Implementations must be Serializable (constructed on
    * the driver, instantiated per partition on executors). */
  trait MediaDecoder extends Serializable {
    def decode(kind: String, payload: Array[Byte]): (Int, Int, Int)
  }

  /** Deterministic fake decoder: derives plausible dimensions from payload
    * bytes. STUB — replace with a real codec off-container. */
  object StubDecoder extends MediaDecoder {
    def decode(kind: String, payload: Array[Byte]): (Int, Int, Int) = {
      val n = payload.length.toLong
      val w = (n % 640 + 1).toInt
      val h = (n * 7 % 480 + 1).toInt
      val frames = kind match {
        case "video" => (n % 30 + 1).toInt
        case _ => 1
      }
      (w, h, frames)
    }
  }

  /** Real image decoder: `javax.imageio` parses the container and decodes
    * pixel data for the formats the JDK ships (PNG, JPEG, GIF, BMP, WBMP).
    * Non-image kinds — and payloads ImageIO cannot identify — fall back to
    * the deterministic stub so mixed-kind tables keep flowing. */
  object ImageIoDecoder extends MediaDecoder {
    def decode(kind: String, payload: Array[Byte]): (Int, Int, Int) =
      if (kind == "image") {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        if (img == null) StubDecoder.decode(kind, payload)
        else (img.getWidth, img.getHeight, 1)
      } else StubDecoder.decode(kind, payload)
  }

  /** Deterministic grayscale PNG: `width = seed % 64 + 16`,
    * `height = seed*7 % 48 + 16`, pixel(x,y) = `(x + y + seed) % 256` on all
    * three channels — a closed form a SQL oracle can replay, pushed through a
    * REAL PNG encode so the decode side proves container + pixel fidelity,
    * not header arithmetic. */
  def syntheticPng(seed: Long): Array[Byte] = {
    val w = (seed % 64 + 16).toInt
    val h = (seed * 7 % 48 + 16).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = ((x + y + seed) % 256).toInt
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** [[syntheticPng]] with explicit dimensions (same closed-form pixels). */
  def syntheticPngSized(seed: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = ((x + y + seed) % 256).toInt
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  case class DHashRow(media_id: Long, dhash: Long)

  /** Difference hash (dHash) — the standard perceptual fingerprint for
    * image near-dup detection: over a 9×8 grayscale image, bit (x,y) is
    * `pixel(x,y) > pixel(x+1,y)` packed into 64 bits. Computed from REAL
    * decoded pixel data (javax.imageio); the production pipeline resizes
    * arbitrary images to 9×8 first ([[resizeImages]]) — the hash stage
    * gates here on decode-exact 9×8 inputs so the oracle can replay the
    * bits. Map-only, one decode per row. */
  def dHash(media: Dataset[MediaRow]): Dataset[DHashRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.filter(_.kind == "image").map { r =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
        require(img != null && img.getWidth == 9 && img.getHeight == 8,
          s"dHash expects decodable 9x8 input for media_id=${r.media_id}")
        var h = 0L
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            if ((img.getRGB(x, y) & 0xff) > (img.getRGB(x + 1, y) & 0xff))
              h |= 1L << (y * 8 + x)
            x += 1
          }
          y += 1
        }
        DHashRow(r.media_id, h)
      }
    }
  }

  case class ImageStats(media_id: Long, width: Int, height: Int, gray_sum: Long)

  /** Pixel-level image decode: dimensions plus the sum of the blue channel
    * over all pixels (for grayscale inputs: the gray value). PNG is lossless,
    * so `gray_sum` round-trips bit-exactly through encode/decode — the
    * oracle-checkable proof that a real codec ran. Partition-parallel,
    * streaming, one ImageIO call per row. */
  def decodeImageStats(media: Dataset[MediaRow]): Dataset[ImageStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.filter(_.kind == "image").map { r =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
        require(img != null, s"undecodable image payload for media_id=${r.media_id}")
        var sum = 0L
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) { sum += (img.getRGB(x, y) & 0xff); x += 1 }
          y += 1
        }
        ImageStats(r.media_id, img.getWidth, img.getHeight, sum)
      }
    }
  }

  /** Real image resize (area-averaging scale via java.awt) — replaces
    * [[resizeStub]]'s byte-stride fake for image payloads; re-encodes PNG so
    * the output stays a decodable media column. */
  def resizeImages(media: Dataset[MediaRow], targetW: Int, targetH: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        if (r.kind != "image") r
        else {
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
          if (img == null) r
          else {
            val out = new java.awt.image.BufferedImage(
              targetW, targetH, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g2 = out.createGraphics()
            g2.drawImage(
              img.getScaledInstance(targetW, targetH, java.awt.Image.SCALE_AREA_AVERAGING),
              0, 0, null)
            g2.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", bos)
            MediaRow(r.media_id, r.kind, bos.toByteArray)
          }
        }
      }
    }
  }

  /** Partition-parallel feature extraction: the multimodal analog of a
    * columnar decode stage. Checksum is a cheap rolling hash so outputs are
    * deterministic and oracle-checkable. */
  def extractFeatures(media: Dataset[MediaRow],
                      decoder: MediaDecoder = StubDecoder): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, f) = decoder.decode(r.kind, r.payload)
        var cs = 0L
        var i = 0
        while (i < r.payload.length) {
          cs = (cs * 31L + (r.payload(i) & 0xff)) % 1000000007L
          i += 1
        }
        MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, w, h, f, cs)
      }
    }
  }

  /** Deterministic animated GIF: `nFrames` full frames of `w`×`h` indexed
    * grayscale, pixel(x,y,f) = `(x + 2*y + 3*f + seed) % 251` — a closed form
    * a SQL oracle can replay. Frames are `TYPE_BYTE_INDEXED` over an identity
    * gray palette, so the container write is lossless (no quantization), and
    * the whole animation goes through the JDK's real GIF sequence writer
    * (`prepareWriteSequence`/`writeToSequence`) — a genuine multi-image
    * container, not concatenated stills. */
  def syntheticGif(seed: Long, w: Int, h: Int, nFrames: Int): Array[Byte] = {
    val gray = new Array[Byte](256)
    var i = 0
    while (i < 256) { gray(i) = i.toByte; i += 1 }
    val cm = new java.awt.image.IndexColorModel(8, 256, gray, gray, gray)
    val bos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    var f = 0
    while (f < nFrames) {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          raster.setSample(x, y, 0, ((x + 2L * y + 3L * f + seed) % 251).toInt)
          x += 1
        }
        y += 1
      }
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      f += 1
    }
    writer.endWriteSequence()
    ios.close()
    writer.dispose()
    bos.toByteArray
  }

  case class GifFrameStats(media_id: Long, frame_idx: Int, width: Int,
                           height: Int, n_frames: Int, pixel_sum: Long)

  /** REAL multi-frame container decode: `javax.imageio`'s GIF `ImageReader`
    * parses the animation (`getNumImages(true)` walks the image descriptors),
    * then every `everyN`-th frame is decoded to pixels and summed over the
    * blue channel — going through `getRGB` (palette-resolved color values,
    * not raw indices) so a palette permutation or lossy re-encode would
    * change the sum and fail the oracle. One reader per row, streamed inside
    * `mapPartitions`; payloads never leave the executors. */
  def decodeGifFrames(media: Dataset[MediaRow], everyN: Int): Dataset[GifFrameStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.filter(_.kind == "video").flatMap { r =>
        val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(r.payload))
        reader.setInput(iis, false, true)
        val n = reader.getNumImages(true)
        val out = (0 until n by everyN).map { f =>
          val img = reader.read(f)
          var sum = 0L
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) { sum += (img.getRGB(x, y) & 0xff); x += 1 }
            y += 1
          }
          GifFrameStats(r.media_id, f, img.getWidth, img.getHeight, n, sum)
        }
        reader.dispose()
        iis.close()
        out.iterator
      }
    }
  }

  /** Deterministic WAV: `nFrames` 16-bit little-endian PCM mono samples,
    * sample(i) = `((i·37 + seed·101) mod 65536) − 32768` — a closed form a
    * SQL oracle can replay — written through the JDK's real WAV encoder
    * (`AudioSystem.write`), so the RIFF container is genuine. PCM is
    * lossless: the samples round-trip bit-exactly. */
  def syntheticWav(seed: Long, nFrames: Int, rate: Float = 8000f): Array[Byte] = {
    val pcm = new Array[Byte](nFrames * 2)
    var i = 0
    while (i < nFrames) {
      val s = (((i * 37L + seed * 101L) % 65536L) - 32768L).toInt
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  case class AudioStats(media_id: Long, sample_rate: Int, bits: Int, channels: Int,
                        n_frames: Long, sample_sum: Long, sample_abs_sum: Long)

  /** REAL audio container decode: `javax.sound.sampled.AudioSystem` parses
    * the RIFF/WAV header (format, channel count, frame length from the data
    * chunk) and streams the PCM frames, which are decoded to signed 16-bit
    * samples and summed — a header-only parse, an endianness slip, or any
    * sample corruption changes the sums and fails the oracle. One parser per
    * row inside `mapPartitions`; payloads never leave the executors. */
  def decodeWavStats(media: Dataset[MediaRow]): Dataset[AudioStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.filter(_.kind == "audio").map { r =>
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.payload))
        val f = in.getFormat
        require(f.getSampleSizeInBits == 16 && !f.isBigEndian,
          s"decodeWavStats expects 16-bit LE PCM for media_id=${r.media_id}")
        val data = in.readAllBytes()
        in.close()
        var sum = 0L
        var sumAbs = 0L
        var i = 0
        while (i + 1 < data.length) {
          val s = ((data(i) & 0xff) | (data(i + 1) << 8)).toShort.toInt
          sum += s
          sumAbs += math.abs(s)
          i += 2
        }
        AudioStats(r.media_id, f.getSampleRate.toInt, f.getSampleSizeInBits,
          f.getChannels, in.getFrameLength, sum, sumAbs)
      }
    }
  }

  case class AudioWindow(media_id: Long, window_idx: Long, energy: Long)

  /** Windowed audio FEATURE extraction over decoded PCM (the step past
    * [[decodeWavStats]]'s container stats — energy contours are the
    * standard front end for VAD / loudness normalization / audio dedup):
    * each complete `windowFrames`-frame window's energy Σs² as an exact
    * long (16-bit samples: window sums fit to ~2^31 windows). Incomplete
    * trailing windows are dropped — the deterministic convention the
    * oracle mirrors. Same movement as the decoder: one mapPartitions
    * pass, payloads never leave the executors, flatMap row-generation. */
  def wavWindowEnergies(media: Dataset[MediaRow],
                        windowFrames: Int): Dataset[AudioWindow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.filter(_.kind == "audio").flatMap { r =>
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.payload))
        val f = in.getFormat
        require(f.getSampleSizeInBits == 16 && !f.isBigEndian,
          s"wavWindowEnergies expects 16-bit LE PCM for media_id=${r.media_id}")
        val data = in.readAllBytes()
        in.close()
        val nFrames = data.length / 2
        val nWin = nFrames / windowFrames
        (0 until nWin).map { w =>
          var e = 0L
          var i = w * windowFrames
          val end = i + windowFrames
          while (i < end) {
            val s = ((data(2 * i) & 0xff) | (data(2 * i + 1) << 8)).toShort.toLong
            e += s * s
            i += 1
          }
          AudioWindow(r.media_id, w.toLong, e)
        }
      }
    }
  }

  case class FrameRow(media_id: Long, frame_idx: Int, n_bytes: Long, md5_hex: String)

  /** Frame sampling for video payloads: the stub "codec" treats the payload
    * as `n_frames` equal byte chunks (the real decoder would emit actual
    * frames); every `everyN`-th frame is materialized with its byte length
    * and md5. Row-to-many-rows decode = flatMap inside mapPartitions — the
    * same shape a real frame extractor (or a mapInPandas batch in PySpark)
    * would use, streaming frames out without collecting a video. */
  def sampleFrames(media: Dataset[MediaRow], everyN: Int,
                   decoder: MediaDecoder = StubDecoder): Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.filter(_.kind == "video").flatMap { r =>
        val (_, _, frames) = decoder.decode(r.kind, r.payload)
        val chunk = r.payload.length / frames
        (0 until frames by everyN).iterator.filter(_ => chunk > 0).map { i =>
          val slice = java.util.Arrays.copyOfRange(r.payload, i * chunk, (i + 1) * chunk)
          md.reset()
          FrameRow(r.media_id, i, chunk.toLong,
            md.digest(slice).map("%02x".format(_)).mkString)
        }
      }
    }
  }

  /** Stub resize: byte-stride downsampling (every `stride`-th payload byte).
    * A real implementation swaps the body for an image scaler; the
    * partition-parallel plumbing, typed schema, and determinism contract
    * stay identical. */
  def resizeStub(media: Dataset[MediaRow], stride: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val out = new Array[Byte]((r.payload.length + stride - 1) / stride)
        var i = 0
        while (i < out.length) { out(i) = r.payload(i * stride); i += 1 }
        MediaRow(r.media_id, r.kind, out)
      }
    }
  }

  /** Fabricate a binary media table from the documents corpus (UTF-8 payload
    * bytes) — stands in for `spark.read.format("binaryFile")` in this
    * parquet-only test environment. */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("kind"),
      col("text").cast("binary").as("payload"))
      .as[MediaRow]
  }
}
