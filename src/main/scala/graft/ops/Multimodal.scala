package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media (image/audio/video) travels as opaque
  * `binary` columns + typed metadata, exactly like Common-Crawl WARC
  * payloads. The Spark-side machinery — schema, batch shape, partition
  * sizing, per-partition decoder amortization — is real and tested.
  * Codecs: [[Multimodal.realDecode]] decodes real PNG/JPEG (javax.imageio)
  * and parses BMP/WAV headers in pure JVM (golden-tested); video and
  * compressed-audio formats (MP4/...) would need codec libraries absent
  * from this container and fail loudly there.
  * [[Multimodal.fakeDecode]] is the deterministic stand-in wired into the
  * harness queries so results stay SQL-oracle-able.
  */
object Multimodal {

  final case class MediaMeta(
      doc_id: Long,
      byte_len: Int,
      width: Int,
      height: Int,
      n_frames: Int,
      format: String)

  private def u16le(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
  private def i32le(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) | ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)
  private def tag(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  private def isPng(p: Array[Byte]): Boolean =
    p.length >= 8 && (p(0) & 0xFF) == 0x89 && p(1) == 'P' && p(2) == 'N' && p(3) == 'G'
  private def isJpeg(p: Array[Byte]): Boolean =
    p.length >= 3 && (p(0) & 0xFF) == 0xFF && (p(1) & 0xFF) == 0xD8 && (p(2) & 0xFF) == 0xFF

  /** Real decode for the formats a pure JVM handles without external codec
    * libraries — PNG and JPEG via `javax.imageio` (the two formats that
    * dominate real web corpora; full pixel decode, pure JVM, headless-safe),
    * plus hand-parsed GIF, BMP (BITMAPINFOHEADER) and RIFF/WAVE headers.
    * Field mapping into the generic [[MediaMeta]] envelope:
    *   - PNG/JPEG/GIF/BMP: width/height = pixel dimensions (GIF: the
    *     logical-screen canvas; BMP abs: negative height means top-down
    *     row order), n_frames = 1, format = "img".
    *   - WAV:  width = sample rate (Hz), height = bits per sample,
    *     n_frames = sample-frame count (data bytes / block align),
    *     format = "audio".
    * Video and compressed-audio codecs (MP4/Opus/...) need libraries that
    * do not exist in this container and fail loudly here — a real
    * deployment extends this match (e.g. JNI/ffmpeg on the executor
    * image). Corrupt/truncated image bytes also fail LOUDLY (never a
    * half-decoded silent zero): crawl payloads are untrusted, and the
    * caller chooses lenient handling at the pipeline level, not here. The
    * Spark-side plumbing ([[decodeBatch]]) is identical either way.
    */
  private def isGif(p: Array[Byte]): Boolean =
    p.length >= 10 && p(0) == 'G' && p(1) == 'I' && p(2) == 'F' && p(3) == '8' &&
      (p(4) == '7' || p(4) == '9') && p(5) == 'a'

  def realDecode(docId: Long, payload: Array[Byte]): MediaMeta =
    if (isGif(payload)) {
      // GIF87a/89a logical-screen descriptor: u16-LE canvas size at bytes
      // 6-9 (header-only — no pixel decode needed for the metadata
      // envelope; animated GIFs report the canvas, n_frames stays 1 at
      // this layer since frame counting requires a full block walk)
      MediaMeta(docId, payload.length,
        width = u16le(payload, 6), height = u16le(payload, 8),
        n_frames = 1, format = "img")
    } else if (isPng(payload) || isJpeg(payload)) {
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        catch {
          case scala.util.control.NonFatal(e) =>
            throw new UnsupportedOperationException(
              s"corrupt ${if (isPng(payload)) "PNG" else "JPEG"} payload: ${e.getMessage}")
        }
      if (img == null)
        throw new UnsupportedOperationException("image signature present but no ImageIO codec decoded it")
      MediaMeta(docId, payload.length, img.getWidth, img.getHeight, n_frames = 1, format = "img")
    } else if (payload.length >= 26 && payload(0) == 'B' && payload(1) == 'M') {
      MediaMeta(docId, payload.length,
        width = math.abs(i32le(payload, 18)),
        height = math.abs(i32le(payload, 22)),
        n_frames = 1, format = "img")
    } else if (payload.length >= 12 && tag(payload, 0) == "RIFF" && tag(payload, 8) == "WAVE") {
      // payloads are untrusted crawl bytes: the chunk size is read UNSIGNED
      // and the offset tracked as a Long, so a hostile size field (e.g. -8,
      // which would otherwise make the offset stop advancing) can only
      // overshoot the buffer and terminate the walk — never loop or
      // overflow. A declared chunk size past the payload end also clamps.
      var off = 12L
      var sampleRate = 0; var bits = 0; var blockAlign = 0; var dataLen = 0L
      while (off + 8 <= payload.length) {
        val o = off.toInt
        val id = tag(payload, o)
        val sz = i32le(payload, o + 4).toLong & 0xFFFFFFFFL
        if (id == "fmt " && off + 24 <= payload.length) {
          sampleRate = i32le(payload, o + 12)
          blockAlign = u16le(payload, o + 20)
          bits = u16le(payload, o + 22)
        } else if (id == "data") dataLen = math.min(sz, payload.length - off - 8)
        off += 8 + sz + (sz & 1) // RIFF chunks are 2-byte aligned
      }
      MediaMeta(docId, payload.length, width = sampleRate, height = bits,
        n_frames = if (blockAlign > 0) (dataLen / blockAlign).toInt else 0, format = "audio")
    } else
      throw new UnsupportedOperationException(
        "realDecode handles PNG, JPEG (javax.imageio), GIF, BMP, and WAV; " +
          "video/compressed-audio codecs require libraries not present in this sandbox")

  /** Deterministic fake decode — pure arithmetic on the payload length, so
    * a SQL oracle can reproduce it bit-for-bit.
    */
  def fakeDecode(docId: Long, payload: Array[Byte]): MediaMeta = {
    val len = payload.length
    MediaMeta(
      doc_id = docId,
      byte_len = len,
      width = 64 + len % 64,
      height = 64 + len % 37,
      n_frames = 1 + len % 8,
      format = if (len % 3 == 0) "img" else if (len % 3 == 1) "audio" else "video")
  }

  /** Batch decode over (doc_id, payload) rows via mapPartitions — the shape
    * a real decoder needs: one decoder instance per partition (expensive
    * init amortized), rows streamed through it. Partition count should be
    * sized so payload batches fit executor memory
    * (`spark.sql.files.maxPartitionBytes` governs the scan side).
    */
  def decodeBatch(spark: SparkSession, media: DataFrame,
                  idCol: String = "doc_id", payloadCol: String = "payload",
                  /** the codec; [[fakeDecode]] keeps query outputs SQL-oracle-able,
                    * [[realDecode]] parses real BMP/WAV headers */
                  codec: (Long, Array[Byte]) => MediaMeta = fakeDecode): Dataset[MediaMeta] = {
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // real codec: initialize the decoder ONCE here, then stream
        rows.map { case (id, payload) => codec(id, payload) }
      }
  }

  /** Deterministic frame sampling plan for "video" payloads: every
    * ceil(n_frames / maxFrames)-th frame index. Pure Column arithmetic.
    */
  def frameSamplePlan(meta: DataFrame, maxFrames: Int = 4): DataFrame =
    meta.withColumn("sampled_frames",
      filter(sequence(lit(0), col("n_frames") - 1),
        i => i % ceil(col("n_frames").cast("double") / maxFrames).cast("int") === 0))
}
