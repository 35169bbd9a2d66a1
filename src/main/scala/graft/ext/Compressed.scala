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

  // ---- multi-member streams (the WARC / .warc.gz shard shape) ----

  final case class MemberMeta(doc_id: Long, member_idx: Int, ok: Boolean,
                              n_bytes: Long, text_md5: String)
  implicit val memberMetaEnc: Encoder[MemberMeta] = Encoders.product[MemberMeta]

  /** Concatenate the gzip members of `parts` into one stream — the
    * on-the-wire shape of a .warc.gz shard (one member per record). */
  def gzipMembers(parts: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    parts.foreach(p => bos.write(gzip(p)))
    bos.toByteArray
  }

  /** Walk a concatenated-member stream, inflating each member with a
    * raw `Inflater` (nowrap) after a manual RFC 1952 header parse, and
    * verifying each member's CRC32 + ISIZE trailer. Returns one entry
    * per member: `Some(bytes)` for a clean member, `None` for one
    * whose trailer check failed — the boundary survives trailer
    * corruption (`getBytesRead` pins the deflate extent), so LATER
    * members still decode: record-level degradation, the property a
    * WARC reader needs. A failure *inside* the deflate data loses the
    * boundary — the remainder of the stream becomes one final error
    * member (resync-by-magic-scan is deliberately not attempted: on
    * arbitrary payloads it can false-positive mid-deflate, silently
    * splicing garbage records; bounded loss + an error row is the
    * honest contract).
    */
  def splitInflateMembers(bytes: Array[Byte]): Seq[Option[Array[Byte]]] = {
    val out = Seq.newBuilder[Option[Array[Byte]]]
    var pos = 0
    var lostSync = false
    while (pos < bytes.length && !lostSync) {
      val parsed: Option[(Option[Array[Byte]], Int)] =
        try {
          val hEnd = parseHeader(bytes, pos)
          val inf = new java.util.zip.Inflater(true)
          try {
            inf.setInput(bytes, hEnd, bytes.length - hEnd)
            val body = new ByteArrayOutputStream(1 << 12)
            val buf = new Array[Byte](8192)
            while (!inf.finished()) {
              val n = inf.inflate(buf)
              if (n == 0 && !inf.finished()) throw new java.io.IOException(
                "truncated deflate data")
              body.write(buf, 0, n)
              if (body.size > MaxInflatedBytes) throw new java.io.IOException(
                "member exceeds inflate cap")
            }
            val used = inf.getBytesRead.toInt
            val tEnd = hEnd + used + 8
            if (tEnd > bytes.length)
              throw new java.io.IOException("truncated trailer")
            val decoded = body.toByteArray
            val crc = new java.util.zip.CRC32()
            crc.update(decoded)
            val wantCrc = le32(bytes, hEnd + used)
            val wantIsize = le32(bytes, hEnd + used + 4)
            val okMember = wantCrc == (crc.getValue & 0xffffffffL) &&
              wantIsize == (decoded.length.toLong & 0xffffffffL)
            Some((if (okMember) Some(decoded) else None, tEnd))
          } finally inf.end()
        } catch { case scala.util.control.NonFatal(_) => None }
      parsed match {
        case Some((member, next)) =>
          out += member
          pos = next
        case None => // header or deflate damage: boundary unknowable
          out += None
          lostSync = true
      }
    }
    out.result()
  }

  private def le32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL)) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  /** RFC 1952 §2.3 header parse: returns the offset of the deflate
    * data. Throws on bad magic / method or a truncated header. */
  private def parseHeader(b: Array[Byte], pos: Int): Int = {
    if (pos + 10 > b.length || (b(pos) & 0xff) != 0x1f ||
      (b(pos + 1) & 0xff) != 0x8b || b(pos + 2) != 8)
      throw new java.io.IOException("bad gzip member header")
    val flg = b(pos + 3) & 0xff
    var p = pos + 10
    if ((flg & 0x04) != 0) { // FEXTRA
      if (p + 2 > b.length) throw new java.io.IOException("truncated FEXTRA")
      p += 2 + (((b(p) & 0xff)) | ((b(p + 1) & 0xff) << 8))
    }
    if ((flg & 0x08) != 0) { // FNAME, NUL-terminated
      while (p < b.length && b(p) != 0) p += 1
      p += 1
    }
    if ((flg & 0x10) != 0) { // FCOMMENT
      while (p < b.length && b(p) != 0) p += 1
      p += 1
    }
    if ((flg & 0x02) != 0) p += 2 // FHCRC
    if (p > b.length) throw new java.io.IOException("truncated header")
    p
  }

  /** Planted multi-member payload: the doc's text is split into
    * `parts` equal character slices (integer-division sizes, the last
    * slice takes the remainder — mirrored exactly by the oracle's
    * `substr` algebra), each slice becomes one gzip member, and for
    * `id % corruptEvery == 0` the SECOND member's CRC trailer byte is
    * flipped — trailer damage keeps the boundary, so the contract is
    * per-member error isolation, not whole-stream loss. */
  def gzipMembersPlantedCol(textCol: Column, idCol: Column,
                            parts: Int, corruptEvery: Int): Column = {
    val u = udf { (s: String, id: Long) =>
      val t = Option(s).getOrElse("")
      val a = t.length / parts
      val slices = (0 until parts).map { i =>
        if (i == parts - 1) t.substring(i * a)
        else t.substring(i * a, (i + 1) * a)
      }
      val members = slices.map(p =>
        gzip(p.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      if (id % corruptEvery == 0 && members.length > 1) {
        val m = members(1)
        m(m.length - 8) = (m(m.length - 8) ^ 0xff).toByte // first CRC byte
      }
      val bos = new ByteArrayOutputStream()
      members.foreach(bos.write)
      bos.toByteArray
    }
    u(textCol, idCol)
  }

  /** Per-member inflate over a concatenated-member binary column —
    * one output row per member (1→N narrow, no shuffle): clean
    * members emit (ok, byte count, md5 of the inflated bytes);
    * damaged ones emit the error contract (false, 0, ""). */
  def memberMeta(df: DataFrame, idCol: String, binCol: String): Dataset[MemberMeta] = {
    implicit val tupleEnc: Encoder[(Long, Array[Byte])] = Encoders.tuple(
      Encoders.scalaLong, Encoders.BINARY)
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        splitInflateMembers(bytes).zipWithIndex.map {
          case (Some(decoded), i) =>
            MemberMeta(id, i, ok = true, decoded.length.toLong, md5Hex(decoded))
          case (None, i) => MemberMeta(id, i, ok = false, 0L, "")
        }
      }
  }

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
