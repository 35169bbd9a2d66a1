package graft.extract

import java.nio.charset.StandardCharsets.ISO_8859_1

/** Deterministic Identity-H fixture WITHOUT a ToUnicode CMap: the text
  * is only recoverable by inverting the embedded TrueType font's
  * format-4 unicode `cmap` (OpenType spec, public) — the fallback path
  * [[PdfText.parseFontCmaps]] implements, matching what Tika/PDFBox do
  * for CJK/multilingual documents whose subsetters skip ToUnicode.
  *
  * The planted font maps codepoint c → glyph id c+5 over the printable
  * ASCII range, so the content stream's 2-byte Identity-H codes are
  * gibberish to a reader without the font table and exactly [[Text]]
  * with it. */
object CidFontPdf {

  val Text = "CID text recovered via font cmap."
  private val GidShift = 5

  def sample(): Array[Byte] = {
    val font = minimalTtf()
    val hexCodes = Text.map(c => f"${(c + GidShift) & 0xffff}%04x").mkString
    val content = s"BT /F1 12 Tf 72 720 Td <$hexCodes> Tj ET".getBytes(ISO_8859_1)
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    val offsets = new Array[Int](9)
    w("%PDF-1.4\n%âãÏÓ\n")
    def obj(num: Int)(body: => Unit): Unit = {
      offsets(num) = out.size()
      w(s"$num 0 obj\n"); body; w("\nendobj\n")
    }
    obj(1) { w("<< /Type /Catalog /Pages 2 0 R >>") }
    obj(2) { w("<< /Type /Pages /Kids [3 0 R] /Count 1 >>") }
    obj(3) { w("<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
      "/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>") }
    obj(4) { w(s"<< /Length ${content.length} >>\nstream\n")
      out.write(content); w("\nendstream") }
    obj(5) { w("<< /Type /Font /Subtype /Type0 /BaseFont /GraftCID " +
      "/Encoding /Identity-H /DescendantFonts [6 0 R] >>") }
    obj(6) { w("<< /Type /Font /Subtype /CIDFontType2 /BaseFont /GraftCID " +
      "/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) " +
      "/Supplement 0 >> /FontDescriptor 7 0 R /CIDToGIDMap /Identity >>") }
    obj(7) { w("<< /Type /FontDescriptor /FontName /GraftCID /Flags 4 " +
      "/FontBBox [0 -200 1000 900] /ItalicAngle 0 /Ascent 800 " +
      "/Descent -200 /CapHeight 700 /StemV 80 /FontFile2 8 0 R >>") }
    obj(8) { w(s"<< /Length ${font.length} >>\nstream\n")
      out.write(font); w("\nendstream") }
    val xref = out.size()
    w("xref\n0 9\n0000000000 65535 f \n")
    (1 to 8).foreach(i => w(f"${offsets(i)}%010d 00000 n \n"))
    w("trailer\n<< /Size 9 /Root 1 0 R >>\n" +
      s"startxref\n$xref\n%%EOF\n")
    out.toByteArray
  }

  /** One-table TTF: sfnt header + a cmap with a single (3,1) format-4
    * subtable mapping [0x20..0x7a] with idDelta = [[GidShift]]. Only
    * the cmap is present — sufficient for any cmap-reading consumer;
    * glyf/head etc. are irrelevant to text recovery. */
  private def minimalTtf(): Array[Byte] = {
    val seg = bb(2 * 2) { b => b.putShort(0x7a.toShort); b.putShort(-1) } // endCode
    val fmt4 = {
      // 14-byte header + endCode(4) + pad(2) + startCode(4) + idDelta(4)
      // + idRangeOffset(4) = 32
      val body = bb(32) { b =>
        b.putShort(4)               // format
        b.putShort(32)              // length
        b.putShort(0)               // language
        b.putShort(4)               // segCountX2
        b.putShort(4)               // searchRange
        b.putShort(1)               // entrySelector
        b.putShort(0)               // rangeShift
        b.put(seg)                  // endCode [0x7a, 0xffff]
        b.putShort(0)               // reservedPad
        b.putShort(0x20.toShort); b.putShort(-1)          // startCode
        b.putShort(GidShift.toShort); b.putShort(1)       // idDelta
        b.putShort(0); b.putShort(0)                      // idRangeOffset
      }
      body
    }
    val cmap = bb(4 + 8 + fmt4.length) { b =>
      b.putShort(0)      // cmap version
      b.putShort(1)      // numTables
      b.putShort(3)      // platform: Windows
      b.putShort(1)      // encoding: Unicode BMP
      b.putInt(12)       // subtable offset from cmap start
      b.put(fmt4)
    }
    bb(12 + 16 + cmap.length) { b =>
      b.putInt(0x00010000) // sfnt version
      b.putShort(1)        // numTables
      b.putShort(16)       // searchRange
      b.putShort(0)        // entrySelector
      b.putShort(0)        // rangeShift
      b.put("cmap".getBytes(ISO_8859_1))
      b.putInt(0)          // checksum (unchecked by readers)
      b.putInt(28)         // offset
      b.putInt(cmap.length)
      b.put(cmap)
    }
  }

  private def bb(size: Int)(f: java.nio.ByteBuffer => Unit): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(size)
    f(b)
    b.array()
  }
}
