package graft.extract

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal OLE2 / Compound File Binary reader (public [MS-CFB] spec):
  * header, DIFAT, FAT chains, directory entries, and the mini-stream /
  * mini-FAT path for streams under the 4096-byte cutoff. Enough to pull
  * named streams (`WordDocument`, `\u0005SummaryInformation`) out of
  * legacy Office files — the container the reference detects via the
  * `D0 CF 11 E0` magic (SURVEY.md §7.1).
  */
object Cfb {
  final case class Entry(name: String, objType: Int, startSector: Int, size: Long)

  final class CompoundFile(data: Array[Byte]) {
    private def u16(off: Int): Int = ((data(off) & 0xff) | ((data(off + 1) & 0xff) << 8))
    private def i32(off: Int): Int =
      ByteBuffer.wrap(data, off, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
    private def i64(off: Int): Long =
      ByteBuffer.wrap(data, off, 8).order(ByteOrder.LITTLE_ENDIAN).getLong

    require(data.length >= 512, "not a CFB file: too short")
    private val sectorSize = 1 << u16(30)
    private val miniSectorSize = 1 << u16(32)
    private val dirStart = i32(48)
    private val miniCutoff = i32(56)
    private val miniFatStart = i32(60)
    private val difatStart = i32(68)
    private val numDifat = i32(72)

    private def sector(n: Int): Array[Byte] = {
      val off = sectorSize * (n + 1)
      java.util.Arrays.copyOfRange(data, off, math.min(off + sectorSize, data.length))
    }

    private val fat: Array[Int] = {
      val sectors = new scala.collection.mutable.ArrayBuffer[Int]
      var off = 76
      var k = 0
      while (k < 109) { // header DIFAT entries
        val s = i32(off); if (s >= 0) sectors += s
        off += 4; k += 1
      }
      var ds = difatStart // chained DIFAT sectors for huge files
      var guard = 0
      while (ds >= 0 && guard < numDifat + 1) {
        val sec = sector(ds)
        var j = 0
        while (j < sectorSize - 4) {
          val s = ByteBuffer.wrap(sec, j, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
          if (s >= 0) sectors += s
          j += 4
        }
        ds = ByteBuffer.wrap(sec, sectorSize - 4, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
        guard += 1
      }
      val buf = new java.io.ByteArrayOutputStream()
      sectors.foreach(s => buf.write(sector(s)))
      val bb = ByteBuffer.wrap(buf.toByteArray).order(ByteOrder.LITTLE_ENDIAN)
      Array.fill(bb.remaining() / 4)(bb.getInt)
    }

    private def chain(start: Int, table: Array[Int]): List[Int] = {
      val out = new scala.collection.mutable.ListBuffer[Int]
      var s = start
      var guard = 0
      while (s >= 0 && s != -2 && guard <= table.length) {
        out += s
        s = if (s < table.length) table(s) else -2
        guard += 1
      }
      out.toList
    }

    private def readChain(start: Int): Array[Byte] = {
      val buf = new java.io.ByteArrayOutputStream()
      chain(start, fat).foreach(s => buf.write(sector(s)))
      buf.toByteArray
    }

    val entries: List[Entry] = {
      val dir = readChain(dirStart)
      (0 until dir.length / 128).flatMap { k =>
        val off = k * 128
        val nameLen = (dir(off + 64) & 0xff) | ((dir(off + 65) & 0xff) << 8)
        if (nameLen < 2 || nameLen > 64) None
        else {
          val name = new String(dir, off, nameLen - 2, java.nio.charset.StandardCharsets.UTF_16LE)
          val objType = dir(off + 66) & 0xff
          val start = ByteBuffer.wrap(dir, off + 116, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
          val size = ByteBuffer.wrap(dir, off + 120, 8).order(ByteOrder.LITTLE_ENDIAN).getLong
          Some(Entry(name, objType, start, size))
        }
      }.toList
    }

    private lazy val root: Entry = entries.find(_.objType == 5)
      .getOrElse(throw new IllegalArgumentException("CFB: no root entry"))

    private lazy val miniStream: Array[Byte] = {
      val full = readChain(root.startSector)
      java.util.Arrays.copyOfRange(full, 0, math.min(root.size, full.length.toLong).toInt)
    }

    private lazy val miniFat: Array[Int] = {
      val raw = readChain(miniFatStart)
      val bb = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
      Array.fill(bb.remaining() / 4)(bb.getInt)
    }

    def stream(name: String): Option[Array[Byte]] =
      entries.find(e => e.objType == 2 && e.name == name).map { e =>
        if (e.size >= miniCutoff) {
          val full = readChain(e.startSector)
          java.util.Arrays.copyOfRange(full, 0, math.min(e.size, full.length.toLong).toInt)
        } else {
          val buf = new java.io.ByteArrayOutputStream()
          chain(e.startSector, miniFat).foreach { s =>
            val off = s * miniSectorSize
            buf.write(java.util.Arrays.copyOfRange(miniStream, off,
              math.min(off + miniSectorSize, miniStream.length)))
          }
          val full = buf.toByteArray
          java.util.Arrays.copyOfRange(full, 0, math.min(e.size, full.length.toLong).toInt)
        }
      }
  }
}
