package graft.functions

/** S7 buffer codec — the one genuinely domain-specific scalar function in
  * the reference (snap7 get_real/get_dword/get_int/get_bool, ref
  * Linux/InfluxConnector2.py:146-170). Big-endian byte order throughout
  * (S7 wire format).
  *
  * `decode` is total and branch-free for codegen: invalid input (unknown
  * type code, short buffer, out-of-range bit) returns NaN, which the
  * DecodeS7 expression maps to SQL NULL — matching the reference's
  * "value is None → drop the sample" behavior (InfluxConnector2.py:172).
  */
object S7 {

  // snap7 word-length codes (snap7.types; ref ConfigApp.py:186).
  val WLBit   = 0x01
  val WLByte  = 0x02
  val WLWord  = 0x04
  val WLDWord = 0x06
  val WLReal  = 0x08

  /** Decode a raw S7 buffer to a double, or NaN if undecodable. */
  def decode(buf: Array[Byte], typeCode: Int, bit: Int): Double = typeCode match {
    case WLReal =>
      if (buf.length < 4) Double.NaN
      else java.lang.Float.intBitsToFloat(beInt(buf)).toDouble
    case WLDWord =>
      if (buf.length < 4) Double.NaN
      else (beInt(buf).toLong & 0xffffffffL).toDouble
    case WLWord | WLByte =>
      // The reference decodes both Byte and Word via get_int (16-bit
      // big-endian signed) — InfluxConnector2.py:150-153.
      if (buf.length < 2) Double.NaN
      else (((buf(0) & 0xff) << 8) | (buf(1) & 0xff)).toShort.toDouble
    case WLBit =>
      if (buf.length < 1 || bit < 0 || bit > 7) Double.NaN
      else ((buf(0) >> bit) & 1).toDouble
    case _ => Double.NaN
  }

  private def beInt(buf: Array[Byte]): Int =
    ((buf(0) & 0xff) << 24) | ((buf(1) & 0xff) << 16) | ((buf(2) & 0xff) << 8) | (buf(3) & 0xff)

  // ---- Encoders (round-trip tests + buffer synthesis in q_decode_s7) ----

  def encodeReal(v: Float): Array[Byte] = beBytes(java.lang.Float.floatToIntBits(v))

  def encodeDWord(v: Long): Array[Byte] = beBytes((v & 0xffffffffL).toInt)

  def encodeWord(v: Short): Array[Byte] =
    Array((((v >> 8) & 0xff)).toByte, (v & 0xff).toByte)

  def encodeBits(v: Int): Array[Byte] = Array((v & 0xff).toByte)

  private def beBytes(i: Int): Array[Byte] =
    Array(((i >> 24) & 0xff).toByte, ((i >> 16) & 0xff).toByte, ((i >> 8) & 0xff).toByte, (i & 0xff).toByte)
}
