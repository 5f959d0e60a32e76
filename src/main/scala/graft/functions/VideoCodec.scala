package graft.functions

import java.awt.image.{BufferedImage, IndexColorModel}
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.imageio.stream.{MemoryCacheImageInputStream, MemoryCacheImageOutputStream}

/** Pure-JVM VIDEO codec for the multimodal column family (r13): genuine
  * multi-frame animated GIF via `javax.imageio` — a real LZW-compressed
  * container with a global color table, not a stand-in byte layout. The
  * fixture encodes a deterministic frame sequence (the q_decode_s7
  * encode-side convention); the DECODE path — container sniff, frame
  * enumeration, per-frame raster readback — is the operator under test,
  * mirroring ImageCodec (PNG/BMP) and AudioCodec (RIFF/WAVE PCM).
  *
  * Frames use an explicit 256-entry grayscale palette
  * (TYPE_BYTE_INDEXED), so the GIF writer adopts the palette verbatim and
  * the round trip is lossless — pixel index in == gray level out.
  */
object VideoCodec {

  /** Deterministic clip geometry from the payload length (same style as
    * ImageCodec.widthFor): 2..5 frames of (8..15)×(8..11) pixels. */
  def framesFor(len: Long): Int = (2 + len % 4).toInt
  def widthFor(len: Long): Int  = (8 + len % 8).toInt
  def heightFor(len: Long): Int = (8 + (len * 31) % 4).toInt

  /** Deterministic gray level of pixel (x, y) in frame f of doc `docId`. */
  def gray(docId: Long, f: Int, x: Int, y: Int): Int =
    ((docId * 31 + f * 17 + x * 7 + y * 13) % 256).toInt

  private val grayPalette: IndexColorModel = {
    val ramp = Array.tabulate(256)(_.toByte)
    new IndexColorModel(8, 256, ramp, ramp, ramp)
  }

  /** Provider lookup + plugin instantiation dominate per-clip cost (the
    * r12 audio-codec lesson) — cache one writer/reader per executor
    * thread; ImageWriter/ImageReader are single-threaded by contract but
    * reusable across inputs via setOutput/setInput. */
  private val writerTl = ThreadLocal.withInitial[javax.imageio.ImageWriter](() =>
    ImageIO.getImageWritersByFormatName("gif").next())
  private val readerTl = ThreadLocal.withInitial[javax.imageio.ImageReader](() =>
    ImageIO.getImageReadersByFormatName("gif").next())

  /** Encode the deterministic clip as a real animated GIF. */
  def encode(docId: Long, len: Long): Array[Byte] = {
    val (nf, w, h) = (framesFor(len), widthFor(len), heightFor(len))
    val writer = writerTl.get()
    val bos = new ByteArrayOutputStream()
    val ios = new MemoryCacheImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    for (f <- 0 until nf) {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, grayPalette)
      val raster = img.getRaster
      for (y <- 0 until h; x <- 0 until w)
        raster.setSample(x, y, 0, gray(docId, f, x, y))
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence()
    ios.flush(); writer.setOutput(null); ios.close()
    bos.toByteArray
  }

  /** One decoded frame's features: (frame index, pixel sum, first pixel). */
  final case class Frame(idx: Int, width: Int, height: Int, pixSum: Long, firstPx: Int)

  /** Decode a real GIF container: enumerate frames, read each raster back.
    * Returns every frame; callers sample downstream. */
  def decode(bytes: Array[Byte]): IndexedSeq[Frame] = {
    require(bytes.length >= 6 &&
      bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F',
      "not a GIF container")
    val reader = readerTl.get()
    val iis = new MemoryCacheImageInputStream(new ByteArrayInputStream(bytes))
    try {
      reader.setInput(iis, false, true)
      val n = reader.getNumImages(true)
      (0 until n).map { f =>
        val img = reader.read(f)
        val (w, h) = (img.getWidth, img.getHeight)
        var sum = 0L
        for (y <- 0 until h; x <- 0 until w)
          sum += (img.getRGB(x, y) & 0xFF)
        Frame(f, w, h, sum, img.getRGB(0, 0) & 0xFF)
      }
    } finally { reader.setInput(null); iis.close() }
  }
}
