package graft.ext

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.security.MessageDigest
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Compressed-payload ingestion: web-scale corpora arrive as
  * gzip-member streams (WARC records, .jsonl.gz shards), so the first
  * real operator a 100 TB text pipeline runs is "inflate this member,
  * or route it to the error side if it's truncated/corrupt". The
  * codec is the REAL JDK zlib path (`GZIPInputStream` — header parse,
  * inflate, CRC32 + ISIZE trailer verification), not a string stub:
  * the oracle hashes the ORIGINAL text, so only a genuine
  * deflate→inflate round trip can produce matching bytes.
  *
  * Scale shape: decode is map-only (`mapPartitions`, one narrow pass —
  * the payload never shuffles); a corrupt member degrades to the
  * wasError-route contract (`ok = false`, never an executor crash);
  * [[Compressed.MaxInflatedBytes]] caps the inflate loop so a
  * decompression bomb (a few KB inflating to GBs) cannot OOM an
  * executor — the cap routes the member to the error side like any
  * other malformed input.
  */
object Compressed {

  /** Inflate cap: members claiming more than this many decoded bytes
    * are treated as malformed (decompression-bomb guard). Generous for
    * documents (64 MiB) while bounding per-task memory. */
  val MaxInflatedBytes: Int = 64 << 20

  final case class GzipMeta(doc_id: Long, ok: Boolean, n_bytes: Long,
                            text_md5: String)
  implicit val gzipMetaEnc: Encoder[GzipMeta] = Encoders.product[GzipMeta]

  /** Gzip-compress `bytes` (JDK `GZIPOutputStream`: fixed header —
    * MTIME 0 — so the member is a pure function of its content). */
  def gzip(bytes: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(bytes.length / 2 + 64)
    val gz = new GZIPOutputStream(bos)
    gz.write(bytes)
    gz.close()
    bos.toByteArray
  }

  /** Inflate a gzip member, verifying the CRC32 + ISIZE trailer (the
    * stream throws on mismatch). Returns None for corrupt, truncated,
    * or over-[[MaxInflatedBytes]] input. */
  def gunzip(bytes: Array[Byte]): Option[Array[Byte]] =
    try {
      val in = new GZIPInputStream(new ByteArrayInputStream(bytes))
      try {
        val out = new ByteArrayOutputStream(math.min(bytes.length * 4, 1 << 16))
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) {
          out.write(buf, 0, n)
          if (out.size > MaxInflatedBytes) throw new java.io.IOException(
            s"inflated size exceeds $MaxInflatedBytes — refusing (bomb guard)")
          n = in.read(buf)
        }
        // GZIPInputStream verifies the CRC32/ISIZE trailer on the read
        // that returns -1 — reaching here means the member checked out
        Some(out.toByteArray)
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Column form of [[gzip]] over a string column (payload
    * generation — per-row codec work has no built-in, the legitimate
    * UDF case; decode uses `mapPartitions`). Null text compresses as
    * the empty member. */
  def gzipCol(textCol: Column): Column = {
    val u = udf((s: String) =>
      gzip(Option(s).getOrElse("").getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    u(textCol)
  }

  /** [[gzipCol]] with a planted corrupt member every `corruptEvery`
    * ids: one byte mid-stream is flipped (inside the deflate data, or
    * the trailer for degenerate members), which the decoder's
    * CRC32/ISIZE verification must catch — the deterministic
    * error-route fixture. */
  def gzipPlantedCol(textCol: Column, idCol: Column, corruptEvery: Int): Column = {
    val u = udf { (s: String, id: Long) =>
      val g = gzip(Option(s).getOrElse("")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      if (id % corruptEvery == 0) {
        val i = math.min(12, g.length - 9) // past the 10-byte header when possible
        g(i) = (g(i) ^ 0xff).toByte
      }
      g
    }
    u(textCol, idCol)
  }

  private def md5Hex(bytes: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(bytes)
      .map(b => f"${b & 0xff}%02x").mkString

  /** Batch inflate over a binary column — emits per-member
    * (ok, inflated byte count, md5 of the inflated bytes). Corrupt
    * members emit (false, 0, "") — the wasError-route contract.
    * Map-only: one narrow pass, the payload never shuffles. */
  def gunzipMeta(df: DataFrame, idCol: String, binCol: String): Dataset[GzipMeta] = {
    implicit val tupleEnc: Encoder[(Long, Array[Byte])] = Encoders.tuple(
      Encoders.scalaLong, Encoders.BINARY)
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          gunzip(bytes) match {
            case Some(decoded) =>
              GzipMeta(id, ok = true, decoded.length.toLong, md5Hex(decoded))
            case None => GzipMeta(id, ok = false, 0L, "")
          }
        }
      }
  }
}
