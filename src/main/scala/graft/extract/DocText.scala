package graft.extract

import java.nio.{ByteBuffer, ByteOrder}

/** Text extraction from legacy Word (.doc) binary files via the public
  * [MS-DOC] File Information Block: the `WordDocument` stream inside the
  * CFB container, main-document text at `fcMin..fcMac` truncated to
  * `ccpText` characters (FibRgLw97), CP1252 single-byte vs UTF-16LE
  * decided by NUL-density probe (the FIB's `fExtChar` flag does not pin
  * per-chunk encoding — the simple, non-complex files the reference
  * fixtures use store contiguous 8-bit text).
  *
  * Word's paragraph mark `\r` is normalized to `\n`, matching the text
  * shape the reference asserts (ExtractTextProcessorTest.java:99).
  */
object DocText {

  def extract(bytes: Array[Byte], maxLen: Int): String = {
    val cf = new Cfb.CompoundFile(bytes)
    val wd = cf.stream("WordDocument")
      .getOrElse(throw new IllegalArgumentException("doc: no WordDocument stream"))
    require(wd.length >= 68, "doc: WordDocument stream too short")
    def u16(off: Int): Int = (wd(off) & 0xff) | ((wd(off + 1) & 0xff) << 8)
    def i32(off: Int): Int = ByteBuffer.wrap(wd, off, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
    val wIdent = u16(0)
    require(wIdent == 0xa5ec || wIdent == 0xa5dc, f"doc: bad FIB magic 0x$wIdent%x")
    val fcMin = i32(24)
    val fcMac = i32(28)
    // FibRgLw97: after the 32-byte base, csw 16-bit-count block, then
    // cslw 32-bit-count block whose [3] is ccpText (main document chars)
    val csw = u16(32)
    val lwOff = 34 + csw * 2
    val cslw = u16(lwOff)
    val ccpText = if (cslw > 3) i32(lwOff + 2 + 3 * 4) else Int.MaxValue
    val lo = math.max(0, math.min(fcMin, wd.length))
    val hi = math.max(lo, math.min(fcMac, wd.length))
    val raw = java.util.Arrays.copyOfRange(wd, lo, hi)
    val decoded =
      if (looksUtf16(raw)) new String(raw, java.nio.charset.StandardCharsets.UTF_16LE)
      else new String(raw, java.nio.charset.Charset.forName("windows-1252"))
    val main = decoded.substring(0, math.min(math.max(ccpText, 0), decoded.length))
    val normalized = normalize(main)
    val out = new Bounded(maxLen)
    out.append(normalized)
    out.result().trim
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
