package graft

import graft.ops.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** Golden tests for the pure-JVM header codecs behind the multimodal
  * binary-column plumbing: hand-built BMP and WAV byte arrays with known
  * header fields, decoded both directly and through the distributed
  * decodeBatch path.
  */
class MultimodalSpec extends AnyFunSuite {
  import SparkTestBase.spark

  private def le16(v: Int): Array[Byte] = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
  private def ascii(s: String): Array[Byte] = s.getBytes("US-ASCII")

  /** minimal BMP: BITMAPFILEHEADER (14) + BITMAPINFOHEADER (40) */
  private def bmp(width: Int, height: Int): Array[Byte] =
    ascii("BM") ++ le32(54) ++ le32(0) ++ le32(54) ++ // file header
      le32(40) ++ le32(width) ++ le32(height) ++ le16(1) ++ le16(24) ++
      Array.fill[Byte](40 - 16)(0) // rest of the DIB header

  /** minimal RIFF/WAVE: fmt chunk + data chunk of `dataBytes` */
  private def wav(sampleRate: Int, bits: Int, channels: Int, dataBytes: Int): Array[Byte] = {
    val blockAlign = channels * bits / 8
    val fmt = ascii("fmt ") ++ le32(16) ++ le16(1) ++ le16(channels) ++
      le32(sampleRate) ++ le32(sampleRate * blockAlign) ++ le16(blockAlign) ++ le16(bits)
    val data = ascii("data") ++ le32(dataBytes) ++ Array.fill[Byte](dataBytes)(7)
    ascii("RIFF") ++ le32(4 + fmt.length + data.length) ++ ascii("WAVE") ++ fmt ++ data
  }

  test("hostile WAV chunk sizes terminate: negative size must not loop or overflow") {
    // sz = -8 once made off += 8 + sz + (sz&1) == 0 — an infinite loop on an
    // executor task fed untrusted crawl bytes (ADVICE r3). Unsigned read +
    // Long offset: the walk overshoots and terminates instead.
    val evilNeg = ascii("RIFF") ++ le32(64) ++ ascii("WAVE") ++
      ascii("junk") ++ le32(-8) ++ Array.fill[Byte](16)(0)
    val m1 = Multimodal.realDecode(90L, evilNeg)
    assert(m1.format === "audio") // parsed the container, walked off cleanly
    // huge positive size: Int offset would overflow; Long offset terminates
    val evilBig = ascii("RIFF") ++ le32(64) ++ ascii("WAVE") ++
      ascii("data") ++ le32(0x7FFFFFFF) ++ Array.fill[Byte](8)(1)
    val m2 = Multimodal.realDecode(91L, evilBig)
    assert(m2.format === "audio" && m2.n_frames === 0)
    // declared data size past the payload end clamps to the real bytes
    val fmtOnly = ascii("fmt ") ++ le32(16) ++ le16(1) ++ le16(1) ++
      le32(8000) ++ le32(8000) ++ le16(1) ++ le16(8)
    val shortData = ascii("data") ++ le32(1000) ++ Array.fill[Byte](10)(3)
    val clamped = Multimodal.realDecode(92L,
      ascii("RIFF") ++ le32(4 + fmtOnly.length + shortData.length) ++ ascii("WAVE") ++
        fmtOnly ++ shortData)
    assert(clamped.n_frames === 10, "frame count derives from bytes actually present")
  }

  test("BMP header parse: dimensions, abs of top-down negative height") {
    val m = Multimodal.realDecode(1L, bmp(640, 480))
    assert((m.width, m.height, m.n_frames, m.format) === ((640, 480, 1, "img")))
    val topDown = Multimodal.realDecode(2L, bmp(64, -32))
    assert((topDown.width, topDown.height) === ((64, 32)))
  }

  test("WAV header parse: sample rate, bits, frame count from data/blockAlign") {
    val m = Multimodal.realDecode(3L, wav(sampleRate = 44100, bits = 16, channels = 2, dataBytes = 400))
    assert(m.format === "audio")
    assert(m.width === 44100)
    assert(m.height === 16)
    assert(m.n_frames === 100) // 400 bytes / (2ch * 2 bytes)
  }

  test("PNG decode via javax.imageio: real fixture bytes, exact dimensions") {
    // deterministic fixture: render a gradient and round-trip through the
    // JDK's own PNG encoder — the decode side is what realDecode exercises
    val img = new java.awt.image.BufferedImage(7, 5, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 7; y <- 0 until 5) img.setRGB(x, y, (x * 40) << 16 | (y * 50) << 8 | 7)
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", baos), "JDK PNG writer present")
    val bytes = baos.toByteArray
    val m = Multimodal.realDecode(10L, bytes)
    assert((m.width, m.height, m.n_frames, m.format, m.byte_len) === (7, 5, 1, "img", bytes.length))
  }

  test("JPEG decode via javax.imageio: real fixture bytes, exact dimensions") {
    val img = new java.awt.image.BufferedImage(12, 9, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 12; y <- 0 until 9) img.setRGB(x, y, (x * 20) << 16 | (y * 25) << 8)
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", baos), "JDK JPEG writer present")
    val bytes = baos.toByteArray
    val m = Multimodal.realDecode(11L, bytes)
    assert((m.width, m.height, m.format) === (12, 9, "img"))
  }

  test("GIF logical-screen descriptor: canvas dimensions from real encoder bytes") {
    // round-trip through the JDK's GIF writer for realism, plus a
    // hand-built header pinning the u16-LE field layout
    val img = new java.awt.image.BufferedImage(11, 6, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "gif", baos), "JDK GIF writer present")
    val m = Multimodal.realDecode(13L, baos.toByteArray)
    assert((m.width, m.height, m.format) === (11, 6, "img"))
    val hand = "GIF89a".getBytes("US-ASCII") ++
      Array[Byte](0x34, 0x12, 0x78, 0x56) ++ Array.fill[Byte](6)(0) // 0x1234 x 0x5678
    val h = Multimodal.realDecode(14L, hand)
    assert((h.width, h.height) === (0x1234, 0x5678))
  }

  test("truncated PNG fails loudly, never a silent half-decode") {
    val img = new java.awt.image.BufferedImage(16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val cut = baos.toByteArray.take(24) // signature + partial IHDR
    intercept[UnsupportedOperationException] { Multimodal.realDecode(12L, cut) }
  }

  test("unsupported magic fails loudly (the honest codec boundary)") {
    intercept[UnsupportedOperationException] {
      Multimodal.realDecode(4L, Array[Byte](0x50, 0x4B, 3, 4) ++ Array.fill[Byte](60)(0))
    }
  }

  test("decodeBatch drives the real codec through mapPartitions") {
    import spark.implicits._
    val media = Seq(
      (10L, bmp(128, 64)),
      (11L, wav(8000, 8, 1, 160))).toDF("doc_id", "payload")
    val out = Multimodal.decodeBatch(spark, media, codec = Multimodal.realDecode)
      .collect().sortBy(_.doc_id)
    assert(out.map(m => (m.doc_id, m.width, m.height, m.n_frames, m.format)).toSeq === Seq(
      (10L, 128, 64, 1, "img"),
      (11L, 8000, 8, 160, "audio")))
  }
}
