package graft.extract

import java.nio.{ByteBuffer, ByteOrder}

/** Text extraction from legacy Excel (.xls) BIFF8 files via the public
  * [MS-XLS] spec: the `Workbook` stream inside the CFB container, the
  * shared-string table (SST record 0x00FC with Continue 0x003C
  * spillover, including strings that restart their flags byte
  * mid-string across the record boundary), and the cell records that
  * carry values — LabelSst (0x00FD), Label (0x0204), Number (0x0203),
  * RK (0x027E), and MulRk (0x00BD).
  *
  * Output contract matches [[XlsxText]]: cells sorted by (sheet, row,
  * column), tab-joined within a row, newline-joined across rows — the
  * same tabular text shape the reference's Tika path emits for
  * spreadsheets (auto-detected at ETP.java:174-175).
  */
object XlsText {

  def extract(bytes: Array[Byte], maxLen: Int): String = {
    val cf = new Cfb.CompoundFile(bytes)
    val wb = cf.stream("Workbook").orElse(cf.stream("Book"))
      .getOrElse(throw new IllegalArgumentException("xls: no Workbook stream"))

    def u16(off: Int): Int = (wb(off) & 0xff) | ((wb(off + 1) & 0xff) << 8)
    def i32(off: Int): Int =
      ByteBuffer.wrap(wb, off, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
    def f64(off: Int): Double =
      ByteBuffer.wrap(wb, off, 8).order(ByteOrder.LITTLE_ENDIAN).getDouble

    require(wb.length >= 4 && u16(0) == 0x0809, "xls: Workbook does not start with BOF")

    val sst = new scala.collection.mutable.ArrayBuffer[String]
    // (sheet, row, col) -> text; BIFF stores cells row-major per sheet
    // but sorting makes no ordering assumption
    val cells = new scala.collection.mutable.ArrayBuffer[(Int, Int, Int, String)]
    var sheet = -1 // incremented at each worksheet-substream BOF

    // Early-stop budget: well-formed BIFF stores cells in (sheet, row,
    // col) order, so once ~2×maxLen characters are collected the capped
    // output is already determined — memory stays O(maxLen) on a huge
    // sheet with a small cap. (The 2× + slack headroom tolerates
    // moderately out-of-order writers; a pathological writer would
    // need the full collect and gets a truncation, not an error.)
    val cellBudget =
      if (maxLen < 0) Long.MaxValue else 2L * maxLen + 4096L
    var collected = 0L
    def budgetLeft: Boolean = collected < cellBudget
    def addCell(s: Int, r: Int, c: Int, v: String): Unit = {
      cells += ((s, r, c, v)); collected += v.length + 1
    }

    var off = 0
    while (off + 4 <= wb.length && budgetLeft) {
      val typ = u16(off)
      val len = u16(off + 2)
      val data = off + 4
      if (data + len > wb.length) { off = wb.length } // truncated tail: stop
      else {
        typ match {
          case 0x0809 => // BOF: dt field distinguishes globals/worksheet
            if (len >= 4 && u16(data + 2) == 0x0010) sheet += 1
          case 0x00fc => // SST (+ following Continue records)
            parseSst(wb, data, len, sst)
          case 0x00fd => // LabelSst
            val isst = i32(data + 6)
            if (isst >= 0 && isst < sst.length)
              addCell(sheet, u16(data), u16(data + 2), sst(isst))
          case 0x0204 if len >= 9 => // Label (pre-SST inline string)
            // cch clamped to the record's actual payload: a corrupt
            // count must degrade to the bytes present, never throw
            val high = (wb(data + 8) & 0x01) != 0
            val avail = len - 9
            val cch = math.max(0,
              math.min(u16(data + 6), if (high) avail / 2 else avail))
            val s =
              if (high) new String(wb, data + 9, cch * 2,
                java.nio.charset.StandardCharsets.UTF_16LE)
              else new String(wb, data + 9, cch,
                java.nio.charset.StandardCharsets.ISO_8859_1)
            addCell(sheet, u16(data), u16(data + 2), s)
          case 0x0203 => // Number: IEEE double
            addCell(sheet, u16(data), u16(data + 2), formatNum(f64(data + 6)))
          case 0x027e => // RK
            addCell(sheet, u16(data), u16(data + 2), formatNum(decodeRk(i32(data + 6))))
          case 0x00bd => // MulRk: run of RKs sharing a row
            val row = u16(data)
            val colFirst = u16(data + 2)
            val nRk = (len - 6) / 6
            for (k <- 0 until nRk)
              addCell(sheet, row, colFirst + k,
                formatNum(decodeRk(i32(data + 4 + k * 6 + 2))))
          case _ => // formatting, calc-chain, etc. carry no cell text
        }
        off = data + len
      }
    }

    val text = cells.sortBy(c => (c._1, c._2, c._3))
      .groupBy(c => (c._1, c._2)).toSeq.sortBy(_._1)
      .map(_._2.map(_._4).mkString("\t"))
      .mkString("\n")
    val out = new Bounded(maxLen)
    out.append(text)
    out.result().trim
  }

  /** SST payload spans the SST record plus any immediately-following
    * Continue records; a string cut mid-characters RESTARTS with a
    * fresh flags byte at the continue boundary ([MS-XLS] 2.5.293) —
    * so compressed/wide encoding can flip per fragment. */
  private def parseSst(wb: Array[Byte], sstData: Int, sstLen: Int,
                       out: scala.collection.mutable.ArrayBuffer[String]): Unit = {
    def u16(off: Int): Int = (wb(off) & 0xff) | ((wb(off + 1) & 0xff) << 8)
    // chunk list: (start, end) of SST data then each Continue's data
    val chunks = scala.collection.mutable.ArrayBuffer((sstData, sstData + sstLen))
    var off = sstData + sstLen
    while (off + 4 <= wb.length && u16(off) == 0x003c) {
      val l = u16(off + 2)
      chunks += ((off + 4, math.min(off + 4 + l, wb.length)))
      off = off + 4 + l
    }
    var ci = 0
    var p = chunks(ci)._1
    // every accessor is total even after the last chunk is exhausted —
    // a truncated SST (header claiming more strings than are encoded)
    // must degrade to the strings recovered so far, never throw
    def atEnd: Boolean = ci >= chunks.length
    def remaining: Int = if (atEnd) 0 else chunks(ci)._2 - p
    def nextChunk(): Boolean = {
      ci += 1
      if (atEnd) false else { p = chunks(ci)._1; true }
    }
    def readU8(): Int = {
      if (remaining == 0 && !nextChunk()) return -1
      val v = wb(p) & 0xff; p += 1; v
    }
    def readU16(): Int = { val lo = readU8(); val hi = readU8(); lo | (hi << 8) }
    def readI32(): Int = readU16() | (readU16() << 16)
    def skip(n: Int): Unit = {
      var left = n
      while (left > 0) {
        if (remaining == 0 && !nextChunk()) return
        val take = math.min(left, remaining)
        p += take; left -= take
      }
    }

    val cstUnique = { skip(4); readI32() } // cstTotal skipped
    var k = 0
    while (k < cstUnique && !atEnd) {
      val cch = readU16()
      var flags = readU8()
      if (flags < 0) return // truncated before the string began
      val fRich = (flags & 0x08) != 0
      val fExt = (flags & 0x04) != 0
      val cRun = if (fRich) readU16() else 0
      val cbExt = if (fExt) readI32() else 0
      val sb = new java.lang.StringBuilder(math.max(cch, 0))
      var got = 0
      var truncated = false
      while (got < cch && !truncated) {
        if (remaining == 0) {
          if (!nextChunk()) truncated = true
          else {
            val f = readU8() // continue fragment re-declares width
            if (f < 0) truncated = true else flags = f
          }
        } else if ((flags & 0x01) != 0) {
          if (remaining >= 2) { sb.append(charU16(wb, p)); p += 2; got += 1 }
          else { p = chunks(ci)._2 } // lone byte at boundary: force next chunk
        } else {
          sb.append(latin1(wb(p))); p += 1; got += 1
        }
      }
      skip(cRun * 4 + cbExt)
      out += sb.toString
      k += 1
    }
  }

  private def charU16(wb: Array[Byte], off: Int): Char =
    (((wb(off) & 0xff) | ((wb(off + 1) & 0xff) << 8)).toChar)

  /** Compressed (fHighByte=0) BIFF8 strings are the LOW BYTES of UTF-16
    * code units ([MS-XLS] 2.5.240 XLUnicodeRichExtendedString), i.e.
    * ISO-8859-1 — NOT windows-1252 (which would map 0x80–0x9F to
    * €/™/… instead of U+0080–U+009F), matching POI/Tika. */
  private def latin1(b: Byte): Char = (b & 0xff).toChar

  /** RK number: bit0 = ×1/100, bit1 = int-vs-truncated-double. */
  private def decodeRk(rk: Int): Double = {
    val v =
      if ((rk & 0x02) != 0) (rk >> 2).toDouble
      else java.lang.Double.longBitsToDouble((rk & 0xfffffffcL) << 32)
    if ((rk & 0x01) != 0) v / 100.0 else v
  }

  /** Whole doubles print integral ("42"), others via Double.toString
    * ("1500.25") — the same shape XLSX's raw cell values carry. */
  private def formatNum(d: Double): String =
    if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString else d.toString
}
