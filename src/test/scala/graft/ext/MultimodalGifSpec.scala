package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Pins the REAL animated-GIF codec path (q171): the JDK GIF sequence
  * writer must produce a container the GIF ImageReader parses back to the
  * exact frame count, dimensions, and closed-form pixel sums — bit-exact,
  * because the frames are indexed over an identity gray palette (no
  * quantization anywhere). */
class MultimodalGifSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def expectSum(seed: Long, w: Int, h: Int, f: Int): Long = {
    var sum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { sum += (x + 2L * y + 3L * f + seed) % 251; x += 1 }
      y += 1
    }
    sum
  }

  test("syntheticGif is a parseable multi-frame container (magic + frame count)") {
    val payload = Multimodal.syntheticGif(seed = 7, w = 24, h = 16, nFrames = 4)
    assert(new String(payload.take(6), "US-ASCII").startsWith("GIF8"))
    val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    reader.setInput(iis)
    assert(reader.getNumImages(true) == 4)
    reader.dispose(); iis.close()
  }

  test("decodeGifFrames round-trips every sampled frame bit-exactly") {
    import spark.implicits._
    val media = Seq(3L, 8L, 11L).toDS().map(id =>
      Multimodal.MediaRow(id, "video",
        Multimodal.syntheticGif(id, w = 24, h = 16, nFrames = (id % 4 + 2).toInt)))
    val rows = Multimodal.decodeGifFrames(media, everyN = 2).collect()
      .sortBy(r => (r.media_id, r.frame_idx))
    val expected = for {
      id <- Seq(3L, 8L, 11L)
      nf = (id % 4 + 2).toInt
      f <- 0 until nf by 2
    } yield Multimodal.GifFrameStats(id, f, 24, 16, nf, expectSum(id, 24, 16, f))
    assert(rows.toSeq == expected.sortBy(r => (r.media_id, r.frame_idx)))
  }

  test("non-video rows are filtered out, not mis-decoded") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRow(1L, "image", Multimodal.syntheticPng(1L)),
      Multimodal.MediaRow(2L, "video", Multimodal.syntheticGif(2L, 24, 16, 2))).toDS()
    val rows = Multimodal.decodeGifFrames(media, everyN = 1).collect()
    assert(rows.forall(_.media_id == 2L) && rows.length == 2)
  }
}
