package graft.ext

import java.io.ByteArrayOutputStream
import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** TAR (POSIX ustar) archive ingestion — the flow-side `UnpackContent`
  * role next to [[Compressed]]'s gzip path: corpora also arrive as
  * `.tar` shard files (one member per record), so the engine needs
  * "split this archive into member records, or route a damaged member
  * to the error side" as a map-only operator.
  *
  * The format is the public POSIX.1-1988 ustar layout: 512-byte
  * header blocks (name, octal size/mtime, checksum over the header
  * with the checksum field blanked, `ustar` magic), content rounded up
  * to 512-byte blocks, two zero blocks at the end.
  *
  * Scale shape: identical to the gzip-member walk — one narrow
  * `flatMap` pass per archive (1→N, no shuffle), per-member error
  * isolation, and a declared-size cap so a forged header cannot make
  * one task allocate unbounded memory.
  */
object Tar {

  /** Members claiming more than this are treated as malformed
    * (mirror of [[Compressed.MaxInflatedBytes]]). */
  val MaxMemberBytes: Int = 64 << 20

  private val Block = 512

  final case class TarMember(doc_id: Long, member_idx: Int, name: String,
                             ok: Boolean, n_bytes: Long, mtime: Long,
                             text_md5: String)
  implicit val tarMemberEnc: Encoder[TarMember] = Encoders.product[TarMember]

  private def md5Hex(bytes: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(bytes)
      .map(b => f"${b & 0xff}%02x").mkString

  /** One ustar entry: 512-byte header + NUL-padded content blocks.
    * Deterministic: fixed mode/uid/gid/uname, caller-supplied mtime. */
  def entry(name: String, mtime: Long, content: Array[Byte]): Array[Byte] = {
    require(name.getBytes("UTF-8").length <= 100, s"name too long: $name")
    val h = new Array[Byte](Block)
    def put(off: Int, s: String): Unit = {
      val b = s.getBytes("US-ASCII"); System.arraycopy(b, 0, h, off, b.length)
    }
    put(0, name)
    put(100, "0000644"); put(108, "0000000"); put(116, "0000000")
    put(124, f"${content.length}%011o")
    put(136, f"$mtime%011o")
    h(156) = '0' // regular file
    put(257, "ustar"); h(262) = 0; put(263, "00")
    put(265, "graft"); put(297, "graft")
    put(329, "0000000"); put(337, "0000000")
    // checksum: header bytes summed with the checksum field as spaces
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    val sum = h.map(_ & 0xff).sum
    put(148, f"$sum%06o"); h(154) = 0; h(155) = ' '
    val padded = (content.length + Block - 1) / Block * Block
    val out = new Array[Byte](Block + padded)
    System.arraycopy(h, 0, out, 0, Block)
    System.arraycopy(content, 0, out, Block, content.length)
    out
  }

  /** Concatenate entries and close with the two zero blocks. */
  def archive(entries: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    entries.foreach(bos.write)
    bos.write(new Array[Byte](2 * Block))
    bos.toByteArray
  }

  /** Walk an archive: one `(name, mtime, Some(content))` per clean
    * member. A member whose magic is valid but whose checksum does not
    * verify emits `(name="", 0, None)` and the walk CONTINUES past it
    * using the declared size (the header survives byte-for-byte, so
    * the boundary is still trustworthy enough to resync — the same
    * bounded-degradation contract as the gzip trailer case); a header
    * whose magic is wrong means the boundary itself is unknowable, so
    * the remainder becomes one final error member. */
  def splitMembers(bytes: Array[Byte]): Seq[(String, Long, Option[Array[Byte]])] = {
    val out = Seq.newBuilder[(String, Long, Option[Array[Byte]])]
    var pos = 0
    var lostSync = false
    var done = false
    while (!done && !lostSync && pos + Block <= bytes.length) {
      if (bytes.slice(pos, pos + Block).forall(_ == 0)) done = true // end marker
      else {
        val magicOk = bytes(pos + 257) == 'u' && bytes(pos + 258) == 's' &&
          bytes(pos + 259) == 't' && bytes(pos + 260) == 'a' &&
          bytes(pos + 261) == 'r'
        val size = octal(bytes, pos + 124, 12)
        val mtime = octal(bytes, pos + 136, 11)
        val declared = octal(bytes, pos + 148, 8)
        if (!magicOk || size < 0 || size > MaxMemberBytes ||
            pos + Block + size > bytes.length) {
          out += (("", 0L, None))
          lostSync = true
        } else {
          var sum = 0L
          var i = 0
          while (i < Block) {
            sum += (if (i >= 148 && i < 156) ' '.toInt else bytes(pos + i) & 0xff)
            i += 1
          }
          if (sum != declared) out += (("", 0L, None))
          else {
            val name = str(bytes, pos, 100)
            val prefix = str(bytes, pos + 345, 155)
            val full = if (prefix.isEmpty) name else s"$prefix/$name"
            out += ((full, mtime,
              Some(java.util.Arrays.copyOfRange(bytes, pos + Block,
                pos + Block + size.toInt))))
          }
          pos += Block + (size.toInt + Block - 1) / Block * Block
        }
      }
    }
    out.result()
  }

  private def str(b: Array[Byte], off: Int, max: Int): String = {
    var n = 0
    while (n < max && b(off + n) != 0) n += 1
    new String(b, off, n, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Parse a NUL/space-terminated octal field; -1 when malformed. */
  private def octal(b: Array[Byte], off: Int, max: Int): Long = {
    var v = 0L
    var i = 0
    var seen = false
    while (i < max) {
      val c = b(off + i) & 0xff
      if (c >= '0' && c <= '7') { v = v * 8 + (c - '0'); seen = true; i += 1 }
      else if (c == ' ' && !seen) i += 1 // leading spaces allowed
      else i = max
    }
    if (seen) v else -1L
  }

  /** Planted archive column: the doc's text in the same 3-way slice
    * algebra as [[Compressed.gzipMembersPlantedCol]], one member per
    * slice named `doc<id>/part<i>.txt` with mtime `1700000000 + id`,
    * and for `id % corruptEvery == 0` one checksum digit of member 1
    * is damaged — exercising the resync-past-bad-checksum contract. */
  def tarPlantedCol(textCol: Column, idCol: Column,
                    parts: Int, corruptEvery: Int): Column = {
    val u = udf { (s: String, id: Long) =>
      val t = Option(s).getOrElse("")
      val a = t.length / parts
      val entries = (0 until parts).map { i =>
        val slice = if (i == parts - 1) t.substring(i * a)
                    else t.substring(i * a, (i + 1) * a)
        entry(s"doc$id/part$i.txt", 1700000000L + id,
          slice.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
      val all = entries.toArray
      if (id % corruptEvery == 0 && all.length > 1) {
        val m = all(1)
        m(148) = (if (m(148) == '0') '7' else '0').toByte
      }
      archive(all)
    }
    u(textCol, idCol)
  }

  /** Per-member walk over an archive binary column — one output row
    * per member (1→N narrow, no shuffle): clean members emit (name,
    * mtime, byte count, md5); damaged ones the error contract. */
  def memberMeta(df: DataFrame, idCol: String, binCol: String): Dataset[TarMember] = {
    implicit val tupleEnc: Encoder[(Long, Array[Byte])] = Encoders.tuple(
      Encoders.scalaLong, Encoders.BINARY)
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        splitMembers(bytes).zipWithIndex.map {
          case ((name, mtime, Some(content)), i) =>
            TarMember(id, i, name, ok = true, content.length.toLong, mtime,
              md5Hex(content))
          case ((_, _, None), i) => TarMember(id, i, "", ok = false, 0L, 0L, "")
        }
      }
  }
}
