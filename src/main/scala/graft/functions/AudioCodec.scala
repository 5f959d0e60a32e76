package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** Real pure-JVM audio codec for the multimodal audio key (r12) — the
  * second modality next to [[ImageCodec]]'s PNG/BMP. Same honesty split:
  * ENCODE renders a deterministic 16-bit PCM test tone and writes a
  * genuine RIFF/WAVE container via `javax.sound.sampled` (real chunk
  * layout, fmt header, little-endian PCM); DECODE — the operator under
  * test — parses the container back (`AudioSystem.getAudioInputStream`
  * sniffs and validates the header), reads the format metadata OUT OF THE
  * DECODED HEADER (sample rate, channels, bits), and folds the samples.
  * The DuckDB oracle replays sample statistics by pure integer
  * arithmetic, so header or PCM unfaithfulness breaks hash parity.
  */
object AudioCodec {

  final val SampleRate = 8000f

  /** Deterministic test-tone length (samples) from the payload length. */
  def samplesFor(len: Long): Int = (64 + len % 192).toInt

  /** Deterministic signed 16-bit sample i — integer-exact in any engine. */
  def sample(docId: Long, i: Int): Int =
    (((docId * 7 + i.toLong * 13) % 65536) - 32768).toInt

  /** Render the tone and encode it as a real 16-bit mono PCM WAVE file.
    * The canonical 44-byte RIFF/fmt/data header is written directly
    * (AudioSystem.write's provider machinery cost ~6× the whole key at
    * sf1 — fixture overhead, not operator cost); [[encodeViaProvider]]
    * keeps the library path and the spec pins both byte-identical, so
    * the hand-rolled container is exactly what javax.sound itself emits.
    */
  def encode(docId: Long, len: Long): Array[Byte] = {
    val n = samplesFor(len)
    val out = new Array[Byte](44 + n * 2)
    def le32(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
      out(off + 2) = ((v >> 16) & 0xff).toByte; out(off + 3) = ((v >> 24) & 0xff).toByte
    }
    def le16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
    }
    def tag(off: Int, s: String): Unit =
      s.getBytes("US-ASCII").zipWithIndex.foreach { case (b, i) => out(off + i) = b }
    val sr = SampleRate.toInt
    tag(0, "RIFF"); le32(4, 36 + n * 2); tag(8, "WAVE")
    tag(12, "fmt "); le32(16, 16); le16(20, 1 /* PCM */); le16(22, 1 /* mono */)
    le32(24, sr); le32(28, sr * 2 /* byte rate */); le16(32, 2 /* block */); le16(34, 16)
    tag(36, "data"); le32(40, n * 2)
    var i = 0
    while (i < n) {
      val s = sample(docId, i)
      out(44 + 2 * i) = (s & 0xff).toByte       // little-endian PCM
      out(44 + 2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  /** The javax.sound encode path — kept as the reference the spec pins
    * [[encode]] byte-identical against.
    */
  def encodeViaProvider(docId: Long, len: Long): Array[Byte] = {
    val n = samplesFor(len)
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = sample(docId, i)
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(SampleRate, 16, 1, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new ByteArrayOutputStream()
    try AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos): Unit
    finally ais.close()
    bos.toByteArray
  }

  /** One decoded clip: header metadata + integer sample statistics. */
  final case class Decoded(sampleRate: Int, bits: Int, channels: Int,
      nSamples: Long, pcmSum: Long, pcmMin: Int, pcmMax: Int)

  /** Decode WAVE bytes: the header is parsed and validated by the real
    * codec (undecodable bytes throw — the dead-letter path), samples are
    * read back per the DECODED endianness/width, not assumed.
    */
  def decode(bytes: Array[Byte]): Decoded = {
    val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    try {
      val f = ais.getFormat
      require(f.getSampleSizeInBits == 16 && f.getChannels == 1,
        s"unsupported decoded format: $f")
      val raw = ais.readAllBytes()
      val n = raw.length / 2
      var sum = 0L
      var mn = Int.MaxValue
      var mx = Int.MinValue
      var i = 0
      while (i < n) {
        val lo = raw(2 * i) & 0xff
        val hi = raw(2 * i + 1).toInt
        val s = if (f.isBigEndian) ((raw(2 * i).toInt) << 8) | (raw(2 * i + 1) & 0xff)
                else (hi << 8) | lo
        sum += s; if (s < mn) mn = s; if (s > mx) mx = s
        i += 1
      }
      Decoded(f.getSampleRate.toInt, f.getSampleSizeInBits, f.getChannels, n, sum, mn, mx)
    } finally ais.close()
  }
}
