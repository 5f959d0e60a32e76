package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Decode-dispatch table vs hand-computed S7 byte patterns (SURVEY §5.2)
  * + seeded encode→decode round-trip properties (§5.3).
  */
class S7Spec extends AnyFunSuite {

  test("real: big-endian IEEE754 float32 (snap7 get_real)") {
    // 50.0f = 0x42480000 big-endian
    assert(S7.decode(Array(0x42, 0x48, 0x00, 0x00).map(_.toByte), S7.WLReal, 0) === 50.0)
    // -1.5f = 0xBFC00000
    assert(S7.decode(Array(0xbf, 0xc0, 0x00, 0x00).map(_.toByte), S7.WLReal, 0) === -1.5)
  }

  test("dword: big-endian unsigned 32-bit (snap7 get_dword)") {
    assert(S7.decode(Array(0xff, 0xff, 0xff, 0xff).map(_.toByte), S7.WLDWord, 0) === 4294967295.0)
    assert(S7.decode(Array(0x00, 0x00, 0x01, 0x00).map(_.toByte), S7.WLDWord, 0) === 256.0)
  }

  test("word/byte: big-endian signed 16-bit (snap7 get_int, used for both)") {
    assert(S7.decode(Array(0x80, 0x00).map(_.toByte), S7.WLWord, 0) === -32768.0)
    assert(S7.decode(Array(0x7f, 0xff).map(_.toByte), S7.WLWord, 0) === 32767.0)
    assert(S7.decode(Array(0x00, 0x2a).map(_.toByte), S7.WLByte, 0) === 42.0)
  }

  test("bit: single-bit extraction (snap7 get_bool → int)") {
    val buf = Array(0x0a.toByte) // 0b00001010
    assert(S7.decode(buf, S7.WLBit, 0) === 0.0)
    assert(S7.decode(buf, S7.WLBit, 1) === 1.0)
    assert(S7.decode(buf, S7.WLBit, 3) === 1.0)
    assert(S7.decode(buf, S7.WLBit, 7) === 0.0)
  }

  test("invalid input → NaN (maps to NULL in DecodeS7, the ref's None drop)") {
    assert(S7.decode(Array[Byte](1), S7.WLReal, 0).isNaN)   // short buffer
    assert(S7.decode(Array[Byte](1, 2), 99, 0).isNaN)       // unknown type
    assert(S7.decode(Array[Byte](1), S7.WLBit, 8).isNaN)    // bit out of range
  }

  test("round-trip: word (exhaustive over the 16-bit range)") {
    (Short.MinValue to Short.MaxValue).foreach { v =>
      assert(S7.decode(S7.encodeWord(v.toShort), S7.WLWord, 0) === v.toDouble)
    }
  }

  test("round-trip: real (seeded random floats + edge values)") {
    val rnd = new scala.util.Random(42)
    val edge = Seq(0.0f, -0.0f, 1.5f, Float.MinValue, Float.MaxValue,
      Float.MinPositiveValue, Float.PositiveInfinity, Float.NegativeInfinity)
    (edge ++ Seq.fill(10000)(java.lang.Float.intBitsToFloat(rnd.nextInt()))).foreach { v =>
      val d = S7.decode(S7.encodeReal(v), S7.WLReal, 0)
      assert((v.isNaN && d.isNaN) || d === v.toDouble)
    }
  }

  test("round-trip: dword (seeded random over the unsigned 32-bit range)") {
    val rnd = new scala.util.Random(42)
    (Seq(0L, 1L, 4294967295L, 2147483648L) ++ Seq.fill(10000)(rnd.nextInt().toLong & 0xffffffffL))
      .foreach { u => assert(S7.decode(S7.encodeDWord(u), S7.WLDWord, 0) === u.toDouble) }
  }

  test("round-trip: every bit of every byte") {
    (0 to 255).foreach { v =>
      (0 to 7).foreach { b =>
        assert(S7.decode(S7.encodeBits(v), S7.WLBit, b) === ((v >> b) & 1).toDouble)
      }
    }
  }
}
