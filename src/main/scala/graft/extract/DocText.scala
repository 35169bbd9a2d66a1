package graft.extract

import java.nio.{ByteBuffer, ByteOrder}

/** Text extraction from legacy Word (.doc) binary files via the public
  * [MS-DOC] File Information Block.
  *
  * Primary path: the PIECE TABLE — the Clx structure ([MS-DOC] 2.9.178)
  * in the table stream maps character-position ranges to (offset,
  * encoding) runs inside the `WordDocument` stream. Normal saves write
  * one piece; fast-saved ("complex") documents scatter the text across
  * many out-of-order pieces, each independently CP1252-compressed or
  * UTF-16LE — a contiguous read would interleave stale and live text.
  * The reference's Tika path handles these (ETP.java:174-175).
  *
  * Fallback (no/malformed Clx): main-document text at `fcMin..fcMac`
  * truncated to `ccpText` characters (FibRgLw97), CP1252 single-byte
  * vs UTF-16LE decided by NUL-density probe.
  *
  * Word's paragraph mark `\r` is normalized to `\n`, matching the text
  * shape the reference asserts (ExtractTextProcessorTest.java:99).
  */
object DocText {

  private val Cp1252 = java.nio.charset.Charset.forName("windows-1252")

  def extract(bytes: Array[Byte], maxLen: Int): String = {
    val cf = new Cfb.CompoundFile(bytes)
    val wd = cf.stream("WordDocument")
      .getOrElse(throw new IllegalArgumentException("doc: no WordDocument stream"))
    require(wd.length >= 68, "doc: WordDocument stream too short")
    def u16(off: Int): Int = (wd(off) & 0xff) | ((wd(off + 1) & 0xff) << 8)
    def i32(off: Int): Int = ByteBuffer.wrap(wd, off, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
    val wIdent = u16(0)
    require(wIdent == 0xa5ec || wIdent == 0xa5dc, f"doc: bad FIB magic 0x$wIdent%x")
    val flags = u16(10)
    val fcMin = i32(24)
    val fcMac = i32(28)
    // FibRgLw97: after the 32-byte base, csw 16-bit-count block, then
    // cslw 32-bit-count block whose [3] is ccpText (main document chars)
    val csw = u16(32)
    val lwOff = 34 + csw * 2
    val cslw = u16(lwOff)
    val ccpText = if (cslw > 3) i32(lwOff + 2 + 3 * 4) else Int.MaxValue
    val main = piecedText(cf, wd, flags, lwOff, cslw, ccpText)
      .getOrElse(linearText(wd, fcMin, fcMac, ccpText))
    val normalized = normalize(main)
    val out = new Bounded(maxLen)
    out.append(normalized)
    out.result().trim
  }

  /** Piece-table text assembly. Returns None when the FIB carries no
    * Clx, the table stream is absent, or any structure is out of
    * bounds — corruption degrades to the contiguous fallback, never an
    * exception. */
  private def piecedText(cf: Cfb.CompoundFile, wd: Array[Byte], flags: Int,
                         lwOff: Int, cslw: Int, ccpText: Int): Option[String] =
    try {
      def u16(off: Int): Int = (wd(off) & 0xff) | ((wd(off + 1) & 0xff) << 8)
      def i32(off: Int): Int =
        ByteBuffer.wrap(wd, off, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
      // FibRgFcLcb97 blob directly after the cslw block; (fcClx, lcbClx)
      // is pair 33 ([MS-DOC] 2.5.5 — POI's FIBFieldHandler.CLX)
      val blobOff = lwOff + 2 + cslw * 4
      if (blobOff + 2 > wd.length) return None
      val cbRgFcLcb = u16(blobOff)
      if (cbRgFcLcb <= 33) return None
      val pair = blobOff + 2 + 33 * 8
      if (pair + 8 > wd.length) return None
      val fcClx = i32(pair)
      val lcbClx = i32(pair + 4)
      if (fcClx < 0 || lcbClx <= 0) return None
      // fWhichTblStm (FibBase bit 0x0200) selects the table stream
      val tb = cf.stream(if ((flags & 0x0200) != 0) "1Table" else "0Table")
        .getOrElse(return None)
      val end = fcClx.toLong + lcbClx
      if (end > tb.length) return None
      def tu16(off: Int): Int = (tb(off) & 0xff) | ((tb(off + 1) & 0xff) << 8)
      def ti32(off: Int): Int =
        ByteBuffer.wrap(tb, off, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
      // Clx = RgPrc (clxt=0x01 property modifiers, skipped) + Pcdt
      var pos = fcClx
      while (pos < end && tb(pos) == 0x01) pos += 3 + tu16(pos + 1)
      if (pos + 5 > end || tb(pos) != 0x02) return None
      val lcbPlcPcd = ti32(pos + 1)
      val plc = pos + 5
      if (lcbPlcPcd < 4 + 12 || plc.toLong + lcbPlcPcd > end) return None
      val n = (lcbPlcPcd - 4) / 12
      val pcd0 = plc + (n + 1) * 4
      val sb = new java.lang.StringBuilder()
      var i = 0
      while (i < n) {
        val cpLen = ti32(plc + (i + 1) * 4) - ti32(plc + i * 4)
        if (cpLen < 0) return None
        // PCD = 2 flag bytes, FcCompressed (30-bit fc, bit 30 =
        // fCompressed), 2-byte prm. Compressed pieces store CP1252 at
        // fc/2; uncompressed store UTF-16LE at fc.
        val fcRaw = ti32(pcd0 + i * 8 + 2)
        val fc = fcRaw & 0x3fffffff
        if ((fcRaw & 0x40000000) != 0) {
          val start = fc / 2
          if (start.toLong + cpLen > wd.length) return None
          sb.append(new String(wd, start, cpLen, Cp1252))
        } else {
          if (fc.toLong + cpLen.toLong * 2 > wd.length) return None
          sb.append(new String(wd, fc, cpLen * 2,
            java.nio.charset.StandardCharsets.UTF_16LE))
        }
        i += 1
      }
      val s = sb.toString
      Some(s.substring(0, math.min(math.max(ccpText, 0), s.length)))
    } catch { case _: Exception => None }

  /** Contiguous fcMin..fcMac fallback for files without a usable Clx. */
  private def linearText(wd: Array[Byte], fcMin: Int, fcMac: Int,
                         ccpText: Int): String = {
    val lo = math.max(0, math.min(fcMin, wd.length))
    val hi = math.max(lo, math.min(fcMac, wd.length))
    val raw = java.util.Arrays.copyOfRange(wd, lo, hi)
    val decoded =
      if (looksUtf16(raw)) new String(raw, java.nio.charset.StandardCharsets.UTF_16LE)
      else new String(raw, Cp1252)
    decoded.substring(0, math.min(math.max(ccpText, 0), decoded.length))
  }

  /** 16-bit text has NULs in the high bytes of ASCII-range chars. */
  private def looksUtf16(raw: Array[Byte]): Boolean = {
    val n = math.min(raw.length, 512)
    if (n < 4) return false
    var nulsOdd = 0
    var i = 1
    while (i < n) { if (raw(i) == 0) nulsOdd += 1; i += 2 }
    nulsOdd.toDouble / (n / 2) > 0.3
  }

  /** \r → \n (paragraph mark), 0x07 cell mark → \t, drop field/object
    * control chars Word embeds in the text stream. */
  private def normalize(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\r'   => sb.append('\n')
        case c if c.toInt == 7  => sb.append('\t') // table cell/row mark
        case c if c.toInt == 11 => sb.append('\n') // hard line break
        case c if c >= 0x20 || c == '\n' || c == '\t' => sb.append(c)
        case _ => // FIB control chars (0x01 pic, 0x13-0x15 fields, …)
      }
      i += 1
    }
    sb.toString
  }
}
