package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media (image/audio/video) travels as opaque
  * `binary` columns + typed metadata, exactly like Common-Crawl WARC
  * payloads. The Spark-side machinery — schema, batch shape, partition
  * sizing, per-partition decoder amortization — is real and tested; the
  * codec itself is STUBBED (no image/audio libraries exist in this
  * container): `realDecode` is an unimplemented hook, `fakeDecode` is the
  * deterministic stand-in wired into queries so results stay oracle-able.
  */
object Multimodal {

  final case class MediaMeta(
      doc_id: Long,
      byte_len: Int,
      width: Int,
      height: Int,
      n_frames: Int,
      format: String)

  /** THE STUB: a real deployment plugs a codec in here (e.g. via JNI/ffmpeg
    * on the executor image). Deliberately unimplemented in this sandbox.
    */
  def realDecode(payload: Array[Byte]): MediaMeta = ???

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
                  idCol: String = "doc_id", payloadCol: String = "payload"): Dataset[MediaMeta] = {
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // real codec: initialize the decoder ONCE here, then stream
        rows.map { case (id, payload) => fakeDecode(id, payload) }
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
