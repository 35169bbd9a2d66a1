package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in partition-sized batches.
  *
  * The decode step is a clearly-marked STUB — no image/audio codec
  * libraries exist in this environment — but everything Spark-side is
  * real and tested: the binary column plumbing, the typed result
  * schema, the `mapPartitions` batch shape (one iterator per
  * partition, streaming, no per-row task overhead), and the
  * deterministic contract the oracle checks. Swapping the stub body
  * for a real decoder (e.g. TwelveMonkeys/ImageIO on a cluster) changes
  * no plan shape.
  */
object Multimodal {

  final case class MediaMeta(doc_id: Long, width: Int, height: Int,
                             format: String, n_bytes: Long)
  implicit val mediaMetaEnc: Encoder[MediaMeta] = Encoders.product[MediaMeta]

  /** STUB decode: dimensions derived deterministically from the payload
    * bytes (length + first byte) so tests and the SQL oracle can pin
    * the plumbing end-to-end. A real decoder reads the same
    * `Array[Byte]` and fills the same schema. */
  def decodeStub(bytes: Array[Byte]): (Int, Int, String) = {
    val w = 64 + (bytes.length % 512)
    val h = 64 + ((if (bytes.nonEmpty) bytes(0) & 0xff else 0) * 3 % 512)
    (w.toInt, h.toInt, "rgb8")
  }

  /** Video-style frame sampling over a binary payload: the column is
    * treated as fixed-size frames and every `every`-th frame is
    * emitted as its own row — pure column algebra (sequence + explode
    * + byte-substring), fully codegen'd, no UDF. At scale this is a
    * narrow 1→N row transform; frames stay binary for a downstream
    * decoder. */
  def frameSample(df: DataFrame, idCol: String, binCol: String,
                  frameSize: Int, every: Int = 1): DataFrame = {
    val nFrames = ceil(length(col(binCol)).cast("double") / frameSize).cast("int")
    df.select(col(idCol), col(binCol),
        explode(sequence(lit(0), greatest(nFrames - 1, lit(0)), lit(every)))
          .as("frame_idx"))
      .select(col(idCol), col("frame_idx"),
        expr(s"substring($binCol, frame_idx * $frameSize + 1, $frameSize)").as("frame"))
  }

  /** STUB resize: deterministic re-dimension of a binary payload to
    * `targetBytes` (truncate or zero-pad) standing in for a real image
    * resize — the contract a codec-backed implementation would keep:
    * fixed-size output derived only from the input bytes. */
  def resizeStub(df: DataFrame, binCol: String, targetBytes: Int): DataFrame =
    df.withColumn(s"${binCol}_resized",
      expr(s"substring(concat($binCol, cast(repeat(chr(0), $targetBytes) AS BINARY)), 1, $targetBytes)"))

  /** Batch decode over a binary column — mapPartitions keeps the batch
    * shape a native decoder needs (shared codec context per partition). */
  def decodeMeta(df: DataFrame, idCol: String, binCol: String): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    implicit val tupleEnc: Encoder[(Long, Array[Byte])] = Encoders.tuple(
      Encoders.scalaLong, Encoders.BINARY)
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder context would be initialized here
        it.map { case (id, bytes) =>
          val (w, h, fmt) = decodeStub(bytes)
          MediaMeta(id, w, h, fmt, bytes.length.toLong)
        }
      }
  }
}
