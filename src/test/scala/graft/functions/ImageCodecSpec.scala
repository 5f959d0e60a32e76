package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** r12 (VERDICT r11 #5): the multimodal keys decode REAL image bytes. This
  * pins that the fixture encoder emits genuine PNG/BMP containers (magic
  * bytes a foreign tool would accept), that the decode round-trips the
  * deterministic test card pixel-exactly, and that undecodable media fails
  * loudly (the dead-letter contract) instead of yielding silent nulls.
  */
class ImageCodecSpec extends AnyFunSuite {

  test("even ids encode real PNG, odd ids real BMP (container magic)") {
    val png = ImageCodec.encode(42L, 100L)
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G',
      "PNG signature missing")
    val bmp = ImageCodec.encode(43L, 100L)
    assert(bmp(0) == 'B' && bmp(1) == 'M', "BMP magic missing")
  }

  test("decode sniffs format from bytes and round-trips dims + pixels") {
    for (id <- Seq(0L, 7L, 1234L); len <- Seq(0L, 17L, 5000L)) {
      val d = ImageCodec.decode(ImageCodec.encode(id, len))
      assert(d.format == (if (id % 2 == 0) "png" else "bmp"))
      assert(d.width == ImageCodec.widthFor(len) && d.height == ImageCodec.heightFor(len))
      var expected = 0L
      for (y <- 0 until d.height; x <- 0 until d.width)
        expected += ImageCodec.gray(id, x, y)
      assert(d.pixSum == expected, s"id=$id len=$len pixel sum drifted")
      assert(d.firstPx == ImageCodec.gray(id, 0, 0))
      assert(d.lastPx == ImageCodec.gray(id, d.width - 1, d.height - 1))
    }
  }

  test("decodeRows: one row per scanline, row sums partition the pixel sum") {
    val id = 99L
    val bytes = ImageCodec.encode(id, 321L)
    val whole = ImageCodec.decode(bytes)
    val rows = ImageCodec.decodeRows(bytes)
    assert(rows.size == whole.height)
    assert(rows.map(_._2).sum == whole.pixSum)
    rows.foreach { case (y, _, first) =>
      assert(first == ImageCodec.gray(id, 0, y))
    }
  }

  test("undecodable media throws (dead-letter path), not silent nulls") {
    val junk = Array.tabulate[Byte](64)(i => (i * 37).toByte)
    intercept[RuntimeException](ImageCodec.decode(junk))
    // a truncated PNG is sniffable but not readable -> still an error
    val cut = ImageCodec.encode(2L, 100L).take(20)
    intercept[Exception](ImageCodec.decode(cut))
  }
}
