package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** r12: the audio modality decodes REAL RIFF/WAVE bytes. Pins genuine
  * container magic, a pixel... sample-exact round trip of the
  * deterministic test tone, header metadata read from the decode, and
  * loud failure on undecodable media.
  */
class AudioCodecSpec extends AnyFunSuite {

  test("encode emits a genuine RIFF/WAVE container") {
    val b = AudioCodec.encode(42L, 100L)
    assert(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F', "RIFF magic")
    assert(b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E', "WAVE type")
  }

  test("hand-rolled header is byte-identical to javax.sound's own WAVE output") {
    for (id <- Seq(0L, 5L, 999L); len <- Seq(0L, 31L, 4096L)) {
      val fast = AudioCodec.encode(id, len)
      val ref = AudioCodec.encodeViaProvider(id, len)
      assert(fast.sameElements(ref), s"id=$id len=$len containers differ")
    }
  }

  test("decode reads header metadata and round-trips samples exactly") {
    for (id <- Seq(0L, 7L, 1234L); len <- Seq(0L, 17L, 5000L)) {
      val d = AudioCodec.decode(AudioCodec.encode(id, len))
      assert(d.sampleRate == 8000 && d.bits == 16 && d.channels == 1)
      val n = AudioCodec.samplesFor(len)
      assert(d.nSamples == n)
      val samples = (0 until n).map(AudioCodec.sample(id, _))
      assert(d.pcmSum == samples.map(_.toLong).sum, s"id=$id len=$len sum drifted")
      assert(d.pcmMin == samples.min && d.pcmMax == samples.max)
    }
  }

  test("undecodable media throws (dead-letter path)") {
    val junk = Array.tabulate[Byte](64)(i => (i * 37).toByte)
    intercept[Exception](AudioCodec.decode(junk))
    val cut = AudioCodec.encode(2L, 100L).take(10)
    intercept[Exception](AudioCodec.decode(cut))
  }
}
