package graft.extract

import java.nio.{ByteBuffer, ByteOrder}

/** Synthetic legacy-Office documents: minimal BIFF8 `.xls` and `.ppt`
  * files assembled from the public [MS-XLS]/[MS-PPT] record structure
  * inside a [[CfbWriter]] container. These are the extraction
  * fixtures for [[XlsText]]/[[PptText]] (the reference has no binary
  * fixtures for these formats — same approach as the in-test OOXML
  * zips in OoxmlSpec): deterministic bytes, golden-pinned text.
  */
object LegacyOffice {

  private def u16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def i32(v: Int): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v).array()
  private def f64(v: Double): Array[Byte] =
    ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putDouble(v).array()
  private def cat(parts: Array[Byte]*): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    parts.foreach(out.write)
    out.toByteArray
  }
  private def rec(typ: Int, data: Array[Byte]): Array[Byte] =
    cat(u16(typ), u16(data.length), data)

  // ---- BIFF8 ---------------------------------------------------------

  private def bof(dt: Int): Array[Byte] =
    rec(0x0809, cat(u16(0x0600), u16(dt), u16(0x0dbb), u16(0x07cc), i32(0), i32(0)))
  private val eof = rec(0x000a, Array.empty)

  /** XLUnicodeRichExtendedString: compressed when latin-1 suffices,
    * UTF-16LE otherwise. */
  private def sstString(s: String): Array[Byte] = {
    val wide = s.exists(_ > 0xff)
    if (wide)
      cat(u16(s.length), Array(0x01.toByte),
        s.getBytes(java.nio.charset.StandardCharsets.UTF_16LE))
    else
      cat(u16(s.length), Array(0x00.toByte),
        s.map(_.toByte).toArray)
  }

  private def labelSst(row: Int, col: Int, isst: Int): Array[Byte] =
    rec(0x00fd, cat(u16(row), u16(col), u16(0), i32(isst)))
  private def number(row: Int, col: Int, v: Double): Array[Byte] =
    rec(0x0203, cat(u16(row), u16(col), u16(0), f64(v)))
  private def rkInt(v: Int): Int = (v << 2) | 0x02
  private def rk(row: Int, col: Int, rkVal: Int): Array[Byte] =
    rec(0x027e, cat(u16(row), u16(col), u16(0), i32(rkVal)))
  private def mulRk(row: Int, colFirst: Int, rkVals: Seq[Int]): Array[Byte] =
    rec(0x00bd, cat(
      cat(u16(row), u16(colFirst)),
      cat(rkVals.map(v => cat(u16(0), i32(v))): _*),
      u16(colFirst + rkVals.size - 1)))

  /** Two-sheet workbook exercising LabelSst, Number, RK, MulRk, and a
    * UTF-16 SST entry. Extracted text (the golden the oracle pins):
    * {{{
    * Region\tRevenue
    * north\t1500.25
    * south\t42
    * 7\t8
    * café π note
    * }}} */
  def sampleXls(): Array[Byte] = {
    val strings = Seq("Region", "Revenue", "north", "south", "café π note")
    val sst = rec(0x00fc,
      cat(Seq(i32(strings.length), i32(strings.length)) ++ strings.map(sstString): _*))
    // BoundSheet8 positions are not load-bearing for the linear-walk
    // reader; point both at 0 (readers that seek would re-derive them)
    def boundSheet(name: String): Array[Byte] =
      rec(0x0085, cat(i32(0), u16(0),
        Array(name.length.toByte, 0x00.toByte), name.map(_.toByte).toArray))
    val globals = cat(bof(0x0005), boundSheet("Data"), boundSheet("Notes"), sst, eof)
    val sheet1 = cat(bof(0x0010),
      labelSst(0, 0, 0), labelSst(0, 1, 1),
      labelSst(1, 0, 2), number(1, 1, 1500.25),
      labelSst(2, 0, 3), rk(2, 1, rkInt(42)),
      mulRk(3, 0, Seq(rkInt(7), rkInt(8))),
      eof)
    val sheet2 = cat(bof(0x0010), labelSst(0, 0, 4), eof)
    CfbWriter.write(Seq("Workbook" -> cat(globals, sheet1, sheet2)))
  }

  /** Workbook whose SST spills into Continue records (split at string
    * boundaries, the common writer behavior): `n` strings "s000000"…,
    * each referenced once in row-major cells. */
  def manyStringsXls(n: Int): Array[Byte] = {
    val strings = (0 until n).map(i => f"s$i%06d")
    val encoded = strings.map(sstString)
    // first record: header + as many whole strings as fit in 8224 bytes
    val chunks = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var cur = scala.collection.mutable.ArrayBuffer[Array[Byte]](
      i32(n), i32(n))
    var curLen = 8
    for (e <- encoded) {
      if (curLen + e.length > 8224) {
        chunks += cat(cur.toSeq: _*)
        cur = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
        curLen = 0
      }
      cur += e; curLen += e.length
    }
    chunks += cat(cur.toSeq: _*)
    val sst = cat(
      (rec(0x00fc, chunks.head) +: chunks.tail.map(c => rec(0x003c, c))).toSeq: _*)
    val cells = (0 until n).map(i => labelSst(i / 8, i % 8, i))
    val wb = cat(bof(0x0005), sst, eof,
      cat(bof(0x0010) +: cells :+ eof: _*))
    CfbWriter.write(Seq("Workbook" -> wb))
  }

  // ---- PPT -----------------------------------------------------------

  private def pptAtom(typ: Int, data: Array[Byte]): Array[Byte] =
    cat(u16(0x0000), u16(typ), i32(data.length), data)
  private def pptContainer(typ: Int, children: Array[Byte]*): Array[Byte] = {
    val body = cat(children: _*)
    cat(u16(0x000f), u16(typ), i32(body.length), body)
  }

  /** DocumentContainer → SlideListWithText → text atoms (one UTF-16
    * TextCharsAtom, one ANSI TextBytesAtom with a \r paragraph mark).
    * Extracted text: "Legacy Deck\nFirst point\nSecond point". */
  def samplePpt(): Array[Byte] = {
    val doc = pptContainer(0x03e8, // DocumentContainer
      pptContainer(0x0ff0,         // SlideListWithText
        pptAtom(0x0fa0, "Legacy Deck"
          .getBytes(java.nio.charset.StandardCharsets.UTF_16LE)),
        pptAtom(0x0fa8, "First point\rSecond point"
          .getBytes(java.nio.charset.Charset.forName("windows-1252")))))
    CfbWriter.write(Seq("PowerPoint Document" -> doc))
  }

  // ---- fast-saved .doc (piece table) ---------------------------------

  /** Fast-saved ("complex") Word binary: the text lives in THREE
    * pieces stored physically OUT OF ORDER in the WordDocument stream
    * (third piece's bytes first), with mixed encodings (CP1252
    * compressed / UTF-16LE / CP1252), mapped by a Clx piece table in
    * the `1Table` stream ([MS-DOC] 2.9.178) — the fixture also carries
    * a leading Prc entry so the RgPrc skip is exercised. `fcMin/fcMac`
    * point at a DECOY region, so a reader that ignores the piece table
    * extracts the decoy, never the golden. Extracted text:
    * {{{
    * Fast-saved pieces survive.
    * μ unicode πiece tail piece.
    * }}} */
  def samplePiecedDoc(): Array[Byte] = {
    val cp1252 = java.nio.charset.Charset.forName("windows-1252")
    val pieceA = "Fast-saved pieces survive.\r" // CP1252, para mark → \n
    val pieceB = "μ unicode πiece "             // needs UTF-16LE
    val pieceC = "tail piece."                  // CP1252
    val ccpText = pieceA.length + pieceB.length + pieceC.length
    val decoy = "DECOY SHOULD NOT APPEAR".getBytes(cp1252)

    // FIB: 32-byte base + csw=14 block + cslw=22 block + cbRgFcLcb=93
    // blob — the standard nFib-97 shape ([MS-DOC] 2.5.1)
    val csw = 14; val cslw = 22; val cbRgFcLcb = 93
    val fibLen = 32 + 2 + csw * 2 + 2 + cslw * 4 + 2 + cbRgFcLcb * 8
    val decoyOff = fibLen
    val cOff = decoyOff + decoy.length
    val aOff = cOff + pieceC.length // CP1252: 1 byte/char
    val bOff = aOff + pieceA.length

    // Clx in the table stream: Prc (skipped grpprl noise) + Pcdt
    val prc = cat(Array(0x01.toByte), u16(2), Array(0xaa.toByte, 0xbb.toByte))
    val lcbPlcPcd = 4 * 4 + 3 * 8 // 4 CPs + 3 PCDs
    def pcd(fcRaw: Int): Array[Byte] = cat(u16(0), i32(fcRaw), u16(0))
    val clx = cat(prc, Array(0x02.toByte), i32(lcbPlcPcd),
      i32(0), i32(pieceA.length), i32(pieceA.length + pieceB.length), i32(ccpText),
      pcd((aOff * 2) | 0x40000000), // compressed: fc = 2 × byte offset
      pcd(bOff),                    // UTF-16LE: fc = byte offset
      pcd((cOff * 2) | 0x40000000))

    val fib = ByteBuffer.allocate(fibLen).order(ByteOrder.LITTLE_ENDIAN)
    fib.putShort(0, 0xa5ec.toShort)              // wIdent
    fib.putShort(2, 0x00c1.toShort)              // nFib (Word 97)
    fib.putShort(10, 0x0204.toShort)             // fComplex | fWhichTblStm
    fib.putInt(24, decoyOff)                     // fcMin → decoy
    fib.putInt(28, decoyOff + decoy.length)      // fcMac
    fib.putShort(32, csw.toShort)
    val lwOff = 34 + csw * 2
    fib.putShort(lwOff, cslw.toShort)
    fib.putInt(lwOff + 2 + 3 * 4, ccpText)       // FibRgLw97.ccpText
    val blobOff = lwOff + 2 + cslw * 4
    fib.putShort(blobOff, cbRgFcLcb.toShort)
    fib.putInt(blobOff + 2 + 33 * 8, 0)          // fcClx (Clx at table[0])
    fib.putInt(blobOff + 2 + 33 * 8 + 4, clx.length) // lcbClx

    val wd = cat(fib.array(), decoy,
      pieceC.getBytes(cp1252),                   // third piece FIRST
      pieceA.getBytes(cp1252),
      pieceB.getBytes(java.nio.charset.StandardCharsets.UTF_16LE))
    CfbWriter.write(Seq("WordDocument" -> wd, "1Table" -> clx))
  }

  /** Writes the three fixtures into `dir` (for pipeline-level queries
    * that ingest a directory of files). */
  def writeFixtures(dir: java.nio.file.Path): Unit =
    syncFixtureDir(dir, Map(
      "legacy.xls" -> sampleXls(), "legacy.ppt" -> samplePpt(),
      "pieced.doc" -> samplePiecedDoc(),
      "secured_rc4.pdf" -> SecuredPdf.securedRc4(),
      "secured_aes.pdf" -> SecuredPdf.securedAes(),
      "secured_aes256.pdf" -> SecuredPdf.securedAes256(),
      "cid.pdf" -> CidFontPdf.sample()))

  /** Makes `dir` hold EXACTLY `files`: unknown entries are removed (a
    * stale file from an earlier fixture generation would be ingested
    * by the directory scan and break the golden row set; symlinks are
    * unlinked, never followed) and each fixture lands via
    * write-temp + atomic rename — concurrent runs (bench + verify
    * share the path) each produce the identical bytes and a reader
    * never observes a half-written or missing file, which a
    * wipe-then-rewrite window would allow. */
  private[extract] def syncFixtureDir(dir: java.nio.file.Path,
                                      files: Map[String, Array[Byte]]): Unit = {
    import java.nio.file.{Files, StandardCopyOption}
    Files.createDirectories(dir)
    Option(dir.toFile.listFiles).getOrElse(Array.empty[java.io.File])
      .filterNot(f => files.contains(f.getName))
      .foreach { f =>
        def rec(g: java.io.File): Unit = {
          if (g.isDirectory && !Files.isSymbolicLink(g.toPath))
            Option(g.listFiles).getOrElse(Array.empty[java.io.File]).foreach(rec)
          g.delete(); ()
        }
        rec(f)
      }
    files.foreach { case (name, bytes) =>
      val tmp = Files.createTempFile(dir, s".$name", ".tmp")
      Files.write(tmp, bytes)
      Files.move(tmp, dir.resolve(name),
        StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
    }
  }
}
