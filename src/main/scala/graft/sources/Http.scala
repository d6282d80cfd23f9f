package graft.sources

import java.io.ByteArrayInputStream
import java.nio.charset.{Charset, StandardCharsets}

/** HTTP/1.x response decoding for WARC `response` record payloads
  * (SURVEY.md §2 source layer; the realism gap named in VERDICT r3 #1).
  *
  * Real Common-Crawl response records routinely carry all three of:
  * `Transfer-Encoding: chunked` framing, `Content-Encoding: gzip`/`deflate`
  * compressed bodies, and a non-UTF-8 charset in the Content-Type header.
  * Stripping headers at CRLFCRLF and hard-decoding UTF-8 silently corrupts
  * those pages — the text-extraction invariant would hash garbage.
  *
  * Decoding is BEST-EFFORT by design (the warcio posture): archives hold
  * whatever the origin server actually sent, including truncated gzip
  * streams and mis-declared encodings, and a crawl-scale pipeline must not
  * fail a 1-GB WARC task over one malformed page. Any step that cannot be
  * applied cleanly leaves the body as-is; charset falls back to UTF-8 with
  * replacement (never a decoder throw). Everything is pure JVM — runs
  * identically in every executor with no native libs.
  */
object Http {

  /** Parsed response: status code (0 when the payload has no parseable
    * status line), header map (lower-cased names, first value wins) and
    * the DECODED body — chunked framing removed, content-encoding
    * decompressed — plus the charset the body's text should decode with.
    */
  final case class Response(status: Int, headers: Map[String, String],
                            body: Array[Byte], charset: Charset)

  /** "HTTP/1.x 200 OK" → 200; anything else → 0 */
  private def statusOf(block: String): Int = {
    val line = block.linesIterator.nextOption.getOrElse("")
    if (!line.startsWith("HTTP/")) 0
    else line.split("\\s+").lift(1).flatMap(_.toIntOption).getOrElse(0)
  }

  /** end of the header block: CRLFCRLF per RFC 9112, with the bare-LF
    * tolerance real servers require; returns (headerEnd, bodyStart) or None
    */
  private def headerSplit(p: Array[Byte]): Option[(Int, Int)] = {
    var i = 0
    while (i < p.length) {
      if (p(i) == '\n') {
        if (i + 2 < p.length && p(i + 1) == '\r' && p(i + 2) == '\n') return Some((i, i + 3))
        if (i + 1 < p.length && p(i + 1) == '\n') return Some((i, i + 2))
      }
      i += 1
    }
    None
  }

  private def parseHeaders(block: String): Map[String, String] = {
    val m = scala.collection.mutable.HashMap[String, String]()
    for (line <- block.linesIterator.drop(1)) { // drop the status line
      val i = line.indexOf(':')
      if (i > 0) {
        val k = line.substring(0, i).trim.toLowerCase
        if (!m.contains(k)) m(k) = line.substring(i + 1).trim
      }
    }
    m.toMap
  }

  /** Decode `Transfer-Encoding: chunked` framing: hex-size line (optional
    * `;ext`), that many bytes, CRLF — until the 0 chunk; trailer headers
    * dropped. A malformed frame returns the bytes decoded SO FAR if any,
    * else the raw input (best-effort; a half-transferred page still yields
    * its transferred prefix, which is what the archive actually holds).
    */
  private[sources] def dechunk(b: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(b.length)
    var i = 0
    try {
      while (true) {
        // chunk-size line
        var j = i
        while (j < b.length && b(j) != '\n') j += 1
        if (j >= b.length) throw new IllegalArgumentException("no chunk-size line")
        val line = new String(b, i, j - i, StandardCharsets.US_ASCII).trim
        val semi = line.indexOf(';')
        val size = Integer.parseInt(if (semi >= 0) line.substring(0, semi).trim else line, 16)
        if (size < 0) throw new IllegalArgumentException("negative chunk size")
        if (size == 0) return out.toByteArray // trailers ignored
        if (j + 1 + size > b.length) throw new IllegalArgumentException("truncated chunk")
        out.write(b, j + 1, size)
        i = j + 1 + size
        // skip the chunk-terminating CRLF / LF
        if (i < b.length && b(i) == '\r') i += 1
        if (i < b.length && b(i) == '\n') i += 1
      }
      out.toByteArray
    } catch {
      case scala.util.control.NonFatal(_) =>
        if (out.size() > 0) out.toByteArray else b
    }
  }

  /** best-effort stream decompress; truncated streams yield their decodable
    * prefix (common in archives), undecodable input returns `raw`
    */
  private def inflateWith(raw: Array[Byte], mk: ByteArrayInputStream => java.io.InputStream): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(raw.length * 4)
    try {
      val is = mk(new ByteArrayInputStream(raw))
      val buf = new Array[Byte](1 << 14)
      var n = is.read(buf)
      while (n > 0) { out.write(buf, 0, n); n = is.read(buf) }
      out.toByteArray
    } catch {
      case scala.util.control.NonFatal(_) =>
        if (out.size() > 0) out.toByteArray else raw
    }
  }

  private[sources] def decompress(encoding: String, body: Array[Byte]): Array[Byte] =
    encoding match {
      case "gzip" | "x-gzip" =>
        inflateWith(body, new java.util.zip.GZIPInputStream(_))
      case "deflate" =>
        // servers send both zlib-wrapped and raw deflate under this token;
        // sniff the zlib header (0x78 CMF + valid FCHECK) to pick
        val zlib = body.length >= 2 && (body(0) & 0x0F) == 8 &&
          (((body(0) & 0xFF) << 8) | (body(1) & 0xFF)) % 31 == 0
        inflateWith(body, bis => new java.util.zip.InflaterInputStream(bis,
          new java.util.zip.Inflater(!zlib)))
      case _ => body // identity, br (no JVM codec), unknown: leave as-is
    }

  /** charset from a Content-Type header value, fallback UTF-8 */
  private[sources] def charsetOf(contentType: Option[String]): Charset = {
    val name = contentType.flatMap { ct =>
      ct.split(';').map(_.trim).collectFirst {
        case p if p.toLowerCase.startsWith("charset=") =>
          p.substring("charset=".length).trim.stripPrefix("\"").stripSuffix("\"")
      }
    }
    // Charset.isSupported itself THROWS (IllegalCharsetNameException) on
    // syntactically illegal names — 'utf 8', 'iso-8859-1,iso-8859-1' and the
    // like are routine in real crawl headers — which would fail the whole
    // Spark task from inside the toPages UDF. The best-effort contract means
    // ANY unresolvable name falls back to UTF-8, never a throw.
    name.flatMap { n =>
      try if (n.nonEmpty && Charset.isSupported(n)) Some(Charset.forName(n)) else None
      catch { case _: IllegalArgumentException => None }
    }.getOrElse(StandardCharsets.UTF_8)
  }

  /** Full response decode: split headers, undo chunked framing, undo
    * content-encoding, resolve the charset. A payload with no header block
    * passes through whole as the body (UTF-8) — same posture as the old
    * CRLFCRLF strip.
    */
  def parse(payload: Array[Byte]): Response = headerSplit(payload) match {
    case None => Response(0, Map.empty, payload, StandardCharsets.UTF_8)
    case Some((hEnd, bStart)) =>
      val block = new String(payload, 0, hEnd, StandardCharsets.ISO_8859_1)
      val headers = parseHeaders(block)
      var body = java.util.Arrays.copyOfRange(payload, bStart, payload.length)
      if (headers.get("transfer-encoding").exists(_.toLowerCase.contains("chunked")))
        body = dechunk(body)
      for (ce <- headers.get("content-encoding"))
        body = decompress(ce.trim.toLowerCase, body)
      Response(statusOf(block), headers, body, charsetOf(headers.get("content-type")))
  }

  /** (status, decoded body bytes, body string decoded with the declared
    * charset — malformed sequences replace, never throw)
    */
  def decodedBodyAndText(payload: Array[Byte]): (Int, Array[Byte], String) = {
    val r = parse(payload)
    (r.status, r.body, new String(r.body, r.charset))
  }
}
