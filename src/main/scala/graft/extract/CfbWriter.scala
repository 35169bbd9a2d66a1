package graft.extract

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal OLE2 / Compound File Binary WRITER (public [MS-CFB] spec) —
  * the emit side of [[Cfb]]. Produces a version-3 container (512-byte
  * sectors, 64-byte mini sectors, 4096-byte mini cutoff) holding the
  * given named streams, honoring the cutoff rule: streams under 4096
  * bytes go through the mini-stream + mini-FAT path, larger ones chain
  * in the regular FAT — exactly the two read paths `Cfb.CompoundFile`
  * implements, so round-trips exercise both.
  *
  * Deliberate fixture-grade bounds: one FAT sector (≤ 128 sectors ≈
  * 64 KB total, asserted), header-resident DIFAT only, and a degenerate
  * right-sibling chain instead of a balanced red-black directory tree
  * (readers — ours, POI-style scanners — walk entries linearly; the
  * tree shape is not load-bearing for them). Used to synthesize legacy
  * `.xls`/`.ppt` fixtures whose golden text the extraction oracle pins.
  */
object CfbWriter {

  private val SectorSize = 512
  private val MiniSectorSize = 64
  private val MiniCutoff = 4096
  private val EndOfChain = 0xfffffffe
  private val FatSect = 0xfffffffd
  private val FreeSect = 0xffffffff

  def write(streams: Seq[(String, Array[Byte])]): Array[Byte] = {
    require(streams.nonEmpty, "cfb: no streams")
    require(streams.forall(_._1.length <= 31), "cfb: stream name over 31 chars")

    def sectorsFor(n: Int, unit: Int): Int = (n + unit - 1) / unit

    // ---- mini-stream layout (streams under the cutoff) ---------------
    val minis = streams.filter(_._2.length < MiniCutoff)
    val miniStarts = new scala.collection.mutable.HashMap[String, Int]
    val miniData = {
      val buf = new java.io.ByteArrayOutputStream()
      minis.foreach { case (name, bytes) =>
        miniStarts(name) = buf.size() / MiniSectorSize
        buf.write(bytes)
        val pad = (MiniSectorSize - buf.size() % MiniSectorSize) % MiniSectorSize
        buf.write(new Array[Byte](pad))
      }
      buf.toByteArray
    }
    val nMiniSectors = miniData.length / MiniSectorSize
    val miniFat: Array[Int] = {
      val mf = Array.fill(nMiniSectors)(FreeSect)
      minis.foreach { case (name, bytes) =>
        val start = miniStarts(name)
        val n = sectorsFor(bytes.length, MiniSectorSize)
        for (k <- 0 until n)
          mf(start + k) = if (k == n - 1) EndOfChain else start + k + 1
      }
      mf
    }

    // ---- file-sector plan: [FAT][dir][miniFAT][mini-stream][regular] --
    val regulars = streams.filter(_._2.length >= MiniCutoff)
    val nDirSectors = sectorsFor((1 + streams.size) * 128, SectorSize)
    val nMiniFatSectors = sectorsFor(miniFat.length * 4, SectorSize)
    val nMiniStreamSectors = sectorsFor(miniData.length, SectorSize)
    val dirStart = 1
    val miniFatStart = dirStart + nDirSectors
    val miniStreamStart = miniFatStart + nMiniFatSectors
    var next = miniStreamStart + nMiniStreamSectors
    val regularStarts = regulars.map { case (name, bytes) =>
      val s = next; next += sectorsFor(bytes.length, SectorSize); (name, s)
    }.toMap
    val nSectors = next
    require(nSectors <= SectorSize / 4,
      s"cfb fixture writer caps at one FAT sector (128 sectors); need $nSectors")

    // ---- FAT ---------------------------------------------------------
    val fat = Array.fill(SectorSize / 4)(FreeSect)
    def chainInto(start: Int, n: Int): Unit =
      for (k <- 0 until n) fat(start + k) = if (k == n - 1) EndOfChain else start + k + 1
    fat(0) = FatSect
    chainInto(dirStart, nDirSectors)
    if (nMiniFatSectors > 0) chainInto(miniFatStart, nMiniFatSectors)
    if (nMiniStreamSectors > 0) chainInto(miniStreamStart, nMiniStreamSectors)
    regulars.foreach { case (name, bytes) =>
      chainInto(regularStarts(name), sectorsFor(bytes.length, SectorSize))
    }

    // ---- directory ---------------------------------------------------
    def dirEntry(name: String, objType: Int, start: Int, size: Long,
                 child: Int, rightSib: Int): Array[Byte] = {
      val e = ByteBuffer.allocate(128).order(ByteOrder.LITTLE_ENDIAN)
      val utf16 = name.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
      e.put(utf16)
      e.position(64)
      e.putShort((utf16.length + 2).toShort)  // name length incl. terminator
      e.put(objType.toByte)
      e.put(1.toByte)                          // color: black
      e.putInt(-1)                             // left sibling
      e.putInt(rightSib)
      e.putInt(child)
      e.position(116)
      e.putInt(start)
      e.putLong(size)
      e.array()
    }
    val dir = new java.io.ByteArrayOutputStream()
    dir.write(dirEntry("Root Entry", 5,
      if (nMiniStreamSectors > 0) miniStreamStart else EndOfChain,
      miniData.length.toLong, child = if (streams.nonEmpty) 1 else -1,
      rightSib = -1))
    streams.zipWithIndex.foreach { case ((name, bytes), i) =>
      val start =
        if (bytes.length < MiniCutoff) miniStarts(name) else regularStarts(name)
      val rightSib = if (i == streams.size - 1) -1 else i + 2
      dir.write(dirEntry(name, 2, start, bytes.length.toLong, child = -1, rightSib))
    }
    while (dir.size() % SectorSize != 0) dir.write(new Array[Byte](128))

    // ---- header ------------------------------------------------------
    val header = ByteBuffer.allocate(SectorSize).order(ByteOrder.LITTLE_ENDIAN)
    header.put(Array(0xd0, 0xcf, 0x11, 0xe0, 0xa1, 0xb1, 0x1a, 0xe1).map(_.toByte))
    header.position(24)
    header.putShort(0x3e.toShort)       // minor version
    header.putShort(3.toShort)          // major version 3
    header.putShort(0xfffe.toShort)     // little-endian byte order mark
    header.putShort(9.toShort)          // sector shift: 512
    header.putShort(6.toShort)          // mini sector shift: 64
    header.position(44)
    header.putInt(1)                    // FAT sector count
    header.putInt(dirStart)
    header.putInt(0)                    // transaction signature
    header.putInt(MiniCutoff)
    header.putInt(if (nMiniFatSectors > 0) miniFatStart else EndOfChain)
    header.putInt(nMiniFatSectors)
    header.putInt(EndOfChain)           // no chained DIFAT sectors
    header.putInt(0)
    header.putInt(0)                    // DIFAT[0]: FAT lives in sector 0
    for (_ <- 1 until 109) header.putInt(FreeSect)

    // ---- assemble ----------------------------------------------------
    val out = new java.io.ByteArrayOutputStream()
    out.write(header.array())
    val fatBytes = ByteBuffer.allocate(SectorSize).order(ByteOrder.LITTLE_ENDIAN)
    fat.foreach(fatBytes.putInt)
    out.write(fatBytes.array())
    out.write(dir.toByteArray)
    val mfBytes = ByteBuffer
      .allocate(nMiniFatSectors * SectorSize).order(ByteOrder.LITTLE_ENDIAN)
    miniFat.foreach(mfBytes.putInt)
    out.write(mfBytes.array())
    out.write(java.util.Arrays.copyOf(miniData, nMiniStreamSectors * SectorSize))
    regulars.foreach { case (_, bytes) =>
      out.write(java.util.Arrays.copyOf(bytes,
        sectorsFor(bytes.length, SectorSize) * SectorSize))
    }
    out.toByteArray
  }
}
