package graft.sources

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the byte-level codecs on the WARC ingestion path:
  * chunked-framing decode and the verifying multi-member gzip stream must
  * be exact inverses of their encoders for ARBITRARY payload bytes and
  * fragment/read sizes — a crawl-scale reader meets every size/alignment
  * combination eventually, not just the golden ones. (Package
  * graft.sources for the private[sources] surfaces under test.)
  */
class CodecPropsSpec extends AnyFunSuite {

  /** deterministic property loop (scalatestplus bridge isn't cached offline) */
  private def forAll[A](gen: Gen[A], n: Int = 120)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(42L + i)).foreach(body)
    }

  private val bytesGen: Gen[Array[Byte]] =
    Gen.chooseNum(0, 4096).flatMap(n => Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte)))
      .map(_.toArray)

  private def gz(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(b); g.close()
    bos.toByteArray
  }

  private def chunkEnc(body: Array[Byte], size: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    body.grouped(size).foreach { c =>
      out.write(s"${c.length.toHexString}\r\n".getBytes("US-ASCII"))
      out.write(c)
      out.write("\r\n".getBytes("US-ASCII"))
    }
    out.write("0\r\n\r\n".getBytes("US-ASCII"))
    out.toByteArray
  }

  private def readAll(is: java.io.InputStream, readSize: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](math.max(1, readSize))
    var n = is.read(buf, 0, buf.length)
    while (n >= 0) { out.write(buf, 0, n); n = is.read(buf, 0, buf.length) }
    out.toByteArray
  }

  test("dechunk inverts chunked encoding for arbitrary bodies and chunk sizes") {
    forAll(Gen.zip(bytesGen, Gen.chooseNum(1, 512))) { case (body, size) =>
      assert(java.util.Arrays.equals(Http.dechunk(chunkEnc(body, size)), body))
    }
  }

  test("Http.parse round-trips arbitrary bodies through chunked + gzip framing") {
    forAll(Gen.zip(bytesGen, Gen.chooseNum(1, 256))) { case (body, size) =>
      val payload = ("HTTP/1.1 200 OK\r\nContent-Type: application/octet-stream\r\n" +
        "Transfer-Encoding: chunked\r\nContent-Encoding: gzip\r\n\r\n").getBytes("US-ASCII") ++
        chunkEnc(gz(body), size)
      val r = Http.parse(payload)
      assert(r.status === 200)
      assert(java.util.Arrays.equals(r.body, body))
    }
  }

  test("MultiGzipInputStream inverts member concatenation at arbitrary read granularity") {
    val membersGen = Gen.chooseNum(1, 5).flatMap(k => Gen.listOfN(k, bytesGen))
    forAll(Gen.zip(membersGen, Gen.chooseNum(1, 1 << 14)), n = 60) { case (members, readSize) =>
      val concat = members.map(gz).reduce(_ ++ _)
      val is = new Warc.MultiGzipInputStream("prop.gz",
        new java.io.ByteArrayInputStream(concat))
      val got = readAll(is, readSize)
      assert(java.util.Arrays.equals(got, members.map(_.toSeq).reduce(_ ++ _).toArray))
    }
  }

  test("MultiGzipInputStream raises on any single flipped byte (never silent corruption)") {
    // exhaustively flip one byte at every offset of a two-member stream:
    // the reader must either return the exact original bytes (flips in
    // non-load-bearing header fields like MTIME/XFL/OS) or throw — silent
    // wrong-bytes/truncation is the one forbidden outcome
    val members = Seq("first member payload".getBytes("UTF-8"),
      "second member payload".getBytes("UTF-8"))
    val original = members.map(_.toSeq).reduce(_ ++ _).toArray
    val concat = members.map(gz).reduce(_ ++ _)
    var threw = 0
    var clean = 0
    for (i <- concat.indices) {
      val corrupt = concat.clone()
      corrupt(i) = (corrupt(i) ^ 0x41).toByte
      try {
        val got = readAll(new Warc.MultiGzipInputStream("flip.gz",
          new java.io.ByteArrayInputStream(corrupt)), 64)
        assert(java.util.Arrays.equals(got, original),
          s"flip at offset $i returned WRONG bytes without raising")
        clean += 1
      } catch { case _: java.io.IOException => threw += 1 }
    }
    assert(threw > concat.length / 2, s"most flips must be detected (threw=$threw clean=$clean)")
  }
}
