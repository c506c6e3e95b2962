package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Pins the REAL WAV codec path (q175): the JDK RIFF encoder must produce a
  * container `AudioSystem` parses back to the exact format, frame count,
  * and closed-form sample sums — bit-exact, because PCM is lossless. */
class MultimodalWavSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def expect(seed: Long, n: Int): (Long, Long) = {
    var sum = 0L; var sumAbs = 0L
    var i = 0
    while (i < n) {
      val s = ((i * 37L + seed * 101L) % 65536L) - 32768L
      sum += s; sumAbs += math.abs(s); i += 1
    }
    (sum, sumAbs)
  }

  test("syntheticWav is a parseable RIFF container") {
    val wav = Multimodal.syntheticWav(seed = 7, nFrames = 4800)
    assert(new String(wav.take(4), "US-ASCII") == "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    assert(in.getFrameLength == 4800 && in.getFormat.getChannels == 1)
    in.close()
  }

  test("decodeWavStats round-trips sample sums bit-exactly") {
    import spark.implicits._
    val media = Seq(3L, 8L, 11L).toDS().map(id =>
      Multimodal.MediaRow(id, "audio",
        Multimodal.syntheticWav(id, nFrames = (1000 + id % 7 * 100).toInt)))
    val rows = Multimodal.decodeWavStats(media).collect().sortBy(_.media_id)
    val expected = Seq(3L, 8L, 11L).map { id =>
      val n = (1000 + id % 7 * 100).toInt
      val (s, sa) = expect(id, n)
      Multimodal.AudioStats(id, 8000, 16, 1, n.toLong, s, sa)
    }
    assert(rows.toSeq == expected)
  }

  test("non-audio rows are filtered out") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRow(1L, "image", Multimodal.syntheticPng(1L)),
      Multimodal.MediaRow(2L, "audio", Multimodal.syntheticWav(2L, 1000))).toDS()
    val rows = Multimodal.decodeWavStats(media).collect()
    assert(rows.forall(_.media_id == 2L) && rows.length == 1)
  }
}
