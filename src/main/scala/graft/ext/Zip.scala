package graft.ext

import java.io.ByteArrayOutputStream
import java.security.MessageDigest
import java.util.zip.{CRC32, Deflater, Inflater}

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** ZIP archive ingestion — the third shard container next to
  * [[Compressed]] (gzip members) and [[Tar]] (ustar): the most common
  * interchange format corpora dumps actually arrive in. The format is
  * the public APPNOTE.TXT layout: per-member local file headers
  * (`PK\3\4`: method, CRC-32, compressed/uncompressed sizes, name),
  * then a central directory + end record so standard tools can read
  * what we write.
  *
  * The walker parses local headers DIRECTLY rather than via
  * `ZipInputStream`: the JDK stream aborts the whole archive at the
  * first damaged member, while the header's `csize` lets us verify
  * each member's CRC ourselves, emit the error contract for that one
  * member, and resync at the next header — the same bounded-
  * degradation semantics as the gzip trailer and tar checksum paths.
  *
  * Scale shape: map-only 1→N `flatMap`, archive bytes never shuffle,
  * inflate capped by [[Compressed.MaxInflatedBytes]].
  */
object Zip {

  final case class ZipMember(doc_id: Long, member_idx: Int, name: String,
                             ok: Boolean, n_bytes: Long, text_md5: String)
  implicit val zipMemberEnc: Encoder[ZipMember] = Encoders.product[ZipMember]

  private def md5Hex(bytes: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(bytes)
      .map(b => f"${b & 0xff}%02x").mkString

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def rd16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def rd32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  /** Raw deflate at BEST_SPEED: the oracle depends only on the decoded
    * bytes, so compression ratio buys nothing here — and the planted
    * builder runs once per member per row. */
  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater(Deflater.BEST_SPEED, true)
    try {
      d.setInput(data); d.finish()
      val out = new ByteArrayOutputStream(data.length / 2 + 32)
      val buf = new Array[Byte](8192)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      out.toByteArray
    } finally d.end()
  }

  /** A complete, standard-tool-readable archive: local headers +
    * deflated bodies, central directory, end-of-central-directory. */
  def archive(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val central = new ByteArrayOutputStream()
    var offset = 0L
    entries.foreach { case (name, data) =>
      val nameB = name.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val comp = deflate(data)
      val crc = new CRC32(); crc.update(data)
      val local = Array.concat(
        Array[Byte]('P', 'K', 3, 4), le16(20), le16(0), le16(8), // deflate
        le16(0), le16(0x21), // fixed dos time/date (determinism)
        le32(crc.getValue), le32(comp.length.toLong), le32(data.length.toLong),
        le16(nameB.length), le16(0), nameB)
      out.write(local); out.write(comp)
      central.write(Array.concat(
        Array[Byte]('P', 'K', 1, 2), le16(20), le16(20), le16(0), le16(8),
        le16(0), le16(0x21),
        le32(crc.getValue), le32(comp.length.toLong), le32(data.length.toLong),
        le16(nameB.length), le16(0), le16(0), le16(0), le16(0),
        le32(0), le32(offset), nameB))
      offset += local.length + comp.length
    }
    val cd = central.toByteArray
    out.write(cd)
    out.write(Array.concat(
      Array[Byte]('P', 'K', 5, 6), le16(0), le16(0),
      le16(entries.length), le16(entries.length),
      le32(cd.length.toLong), le32(offset), le16(0)))
    out.toByteArray
  }

  /** Walk local headers; one `(name, Some(bytes))` per clean member,
    * `("", None)` for a member whose inflate or CRC fails (resync on
    * `csize`). Stops cleanly at the central directory (`PK\1\2`). A
    * header whose magic is unrecognizable ends the walk with one
    * error member — the boundary is unknowable. */
  def splitMembers(bytes: Array[Byte]): Seq[(String, Option[Array[Byte]])] = {
    val out = Seq.newBuilder[(String, Option[Array[Byte]])]
    var pos = 0
    var done = false
    while (!done && pos + 4 <= bytes.length) {
      if (bytes(pos) == 'P' && bytes(pos + 1) == 'K' &&
          bytes(pos + 2) == 1 && bytes(pos + 3) == 2) done = true // central dir
      else if (bytes(pos) == 'P' && bytes(pos + 1) == 'K' &&
          bytes(pos + 2) == 3 && bytes(pos + 3) == 4 && pos + 30 <= bytes.length) {
        val method = rd16(bytes, pos + 8)
        val wantCrc = rd32(bytes, pos + 14)
        val csize = rd32(bytes, pos + 18)
        val usize = rd32(bytes, pos + 22)
        val nameLen = rd16(bytes, pos + 26)
        val extraLen = rd16(bytes, pos + 28)
        val dataOff = pos + 30 + nameLen + extraLen
        if (dataOff + csize > bytes.length || usize > Compressed.MaxInflatedBytes) {
          out += (("", None)); done = true
        } else {
          val name = new String(bytes, pos + 30, nameLen,
            java.nio.charset.StandardCharsets.UTF_8)
          val decoded: Option[Array[Byte]] =
            try {
              val data =
                if (method == 0) java.util.Arrays.copyOfRange(
                  bytes, dataOff, dataOff + csize.toInt)
                else if (method == 8) {
                  val inf = new Inflater(true)
                  try {
                    inf.setInput(bytes, dataOff, csize.toInt)
                    val body = new ByteArrayOutputStream(usize.toInt.max(64))
                    val buf = new Array[Byte](8192)
                    while (!inf.finished()) {
                      val n = inf.inflate(buf)
                      if (n == 0 && !inf.finished())
                        throw new java.io.IOException("truncated deflate data")
                      body.write(buf, 0, n)
                      if (body.size > Compressed.MaxInflatedBytes)
                        throw new java.io.IOException("inflate cap exceeded")
                    }
                    body.toByteArray
                  } finally inf.end()
                } else throw new java.io.IOException(s"method $method unsupported")
              val crc = new CRC32(); crc.update(data)
              if ((crc.getValue & 0xffffffffL) == wantCrc &&
                  data.length.toLong == usize) Some(data)
              else None
            } catch { case scala.util.control.NonFatal(_) => None }
          out += ((if (decoded.isDefined) name else "", decoded))
          pos = dataOff + csize.toInt // resync on the declared extent
        }
      } else { // unrecognizable header: boundary unknowable
        out += (("", None)); done = true
      }
    }
    out.result()
  }

  /** Planted archive column: same 3-way slice algebra as the gzip/tar
    * fixtures, names `doc<id>/part<i>.txt`; for `id % corruptEvery`
    * a byte inside member 1's DEFLATE DATA is flipped — inflate (or
    * the CRC) fails for that member, its neighbors survive. */
  def zipPlantedCol(textCol: Column, idCol: Column,
                    parts: Int, corruptEvery: Int): Column = {
    val u = udf { (s: String, id: Long) =>
      val t = Option(s).getOrElse("")
      val a = t.length / parts
      val slices = (0 until parts).map { i =>
        if (i == parts - 1) t.substring(i * a)
        else t.substring(i * a, (i + 1) * a)
      }
      val arch = archive(slices.zipWithIndex.map { case (p, i) =>
        (s"doc$id/part$i.txt",
          p.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      })
      if (id % corruptEvery == 0 && parts > 1) {
        // locate member 1's local header (second PK\3\4) and flip a
        // byte a few bytes into its deflate data
        var hits = 0
        var i = 0
        var target = -1
        while (target < 0 && i + 4 <= arch.length) {
          if (arch(i) == 'P' && arch(i + 1) == 'K' && arch(i + 2) == 3 &&
              arch(i + 3) == 4) {
            hits += 1
            if (hits == 2) target = i
          }
          i += 1
        }
        if (target >= 0) {
          val nameLen = (arch(target + 26) & 0xff) | ((arch(target + 27) & 0xff) << 8)
          val extraLen = (arch(target + 28) & 0xff) | ((arch(target + 29) & 0xff) << 8)
          val off = target + 30 + nameLen + extraLen
          if (off < arch.length) arch(off) = (arch(off) ^ 0xff).toByte
        }
      }
      arch
    }
    u(textCol, idCol)
  }

  /** Per-member walk over an archive binary column — map-only 1→N. */
  def memberMeta(df: DataFrame, idCol: String, binCol: String): Dataset[ZipMember] = {
    implicit val tupleEnc: Encoder[(Long, Array[Byte])] = Encoders.tuple(
      Encoders.scalaLong, Encoders.BINARY)
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        splitMembers(bytes).zipWithIndex.map {
          case ((name, Some(content)), i) =>
            ZipMember(id, i, name, ok = true, content.length.toLong,
              md5Hex(content))
          case ((_, None), i) => ZipMember(id, i, "", ok = false, 0L, "")
        }
      }
  }
}
