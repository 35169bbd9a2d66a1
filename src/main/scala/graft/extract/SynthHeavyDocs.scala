package graft.extract

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.ISO_8859_1

/** The HEAVY-format sibling of [[SynthDocs]] (VERDICT r17 #3): the
  * easy corpus cycles uncompressed-PDF/DOCX/ODT/HTML/TXT — cheap
  * parses that put the throughput ladder at 576 docs/s/core. The
  * corpus the reference actually faces is FlateDecode multi-stream
  * PDFs (the `big.pdf` shape), OLE2 fast-saved `.doc` piece tables,
  * and encrypted PDFs, whose extractors ([[PdfText]] inflate +
  * operator walk, [[Cfb]]/[[DocText]] FAT + Clx resolution,
  * [[PdfCrypt]] key derivation + AES) are 10-50× more work per byte.
  * Three formats cycle by index, every document's extracted text
  * equal to [[expectedText]] EXACTLY (SynthHeavyDocsSpec), so the
  * heavy rung stays oracle-checkable like the easy one. Deterministic:
  * everything derives from the document index.
  */
object SynthHeavyDocs {

  /** pdfz = FlateDecode multi-stream PDF; doc = OLE2 fast-saved piece
    * table; pdfenc = AES-V2 encrypted PDF. */
  val Formats: Seq[String] = Seq("pdfz", "doc", "pdfenc")

  def formatFor(i: Long): String = Formats((i % Formats.length).toInt)

  /** Distinct basenames per variant (two formats share the .pdf
    * extension — detection must come from content, as in the wild). */
  def fileName(i: Long): String = formatFor(i) match {
    case "pdfz"   => f"doc_$i%07d_z.pdf"
    case "doc"    => f"doc_$i%07d.doc"
    case _        => f"doc_$i%07d_e.pdf"
  }

  /** ~7 KB of planted text per document (16 easy-corpus paragraphs) —
    * the big.pdf / real-.doc size class. The easy corpus's ~0.5 KB
    * docs make fixed per-file costs dominate and HIDE the heavy
    * formats' per-byte work (measured: 361 vs 380 docs/s/core at 20k
    * docs with 0.5 KB payloads — a dishonest parity); at real document
    * sizes the inflate/Clx/AES cost is the measurement. */
  def textFor(i: Long): String =
    (0 until 16).map(k => SynthDocs.textFor(i * 16 + k)).mkString(" ")

  /** The multi-stream PDF plants one chunk per page stream; extraction
    * emits one line per Tj, so the expectation joins with \n. */
  def expectedText(i: Long): String = formatFor(i) match {
    case "pdfz" => chunks(textFor(i), 8).mkString("\n")
    case _      => textFor(i)
  }

  def bytesFor(i: Long): Array[Byte] = formatFor(i) match {
    case "pdfz"   => pdfFlateBytes(chunks(textFor(i), 8))
    case "doc"    => docBytes(textFor(i))
    case _        => SecuredPdf.securedAes(textFor(i))
  }

  /** Split at word boundaries into up to `n` non-empty chunks. */
  private[extract] def chunks(text: String, n: Int): Seq[String] = {
    val words = text.split(' ')
    val per = math.max(1, (words.length + n - 1) / n)
    words.grouped(per).map(_.mkString(" ")).toSeq
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** `big.pdf` shape: one FlateDecode content stream per page chunk,
    * sequential numbered objects, plain trailer (ISO 32000 §7.5 —
    * [[PdfText]] walks stream spans without needing an xref). */
  def pdfFlateBytes(pageChunks: Seq[String]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("%PDF-1.4\n".getBytes(ISO_8859_1))
    pageChunks.zipWithIndex.foreach { case (chunk, k) =>
      val body = deflate(s"BT /F1 12 Tf ($chunk) Tj ET".getBytes(ISO_8859_1))
      out.write((s"${k + 1} 0 obj << /Length ${body.length} " +
        "/Filter /FlateDecode >>\nstream\n").getBytes(ISO_8859_1))
      out.write(body)
      out.write("\nendstream\nendobj\n".getBytes(ISO_8859_1))
    }
    out.write("trailer << >>\n%%EOF\n".getBytes(ISO_8859_1))
    out.toByteArray
  }

  /** Fast-saved OLE2 `.doc`: the planted text split into three pieces
    * (CP1252 / UTF-16LE / CP1252) stored physically OUT OF ORDER in
    * the WordDocument stream behind a decoy `fcMin..fcMac` region,
    * mapped by a Clx piece table in `1Table` — the
    * [[LegacyOffice.samplePiecedDoc]] structure parameterized on the
    * text, so extraction exercises the full [[Cfb]] FAT walk plus
    * [[DocText]]'s piece resolution on every document. */
  def docBytes(text: String): Array[Byte] = {
    def u16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def i32(v: Int) = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def cat(parts: Array[Byte]*) = parts.flatten.toArray
    val cp1252 = java.nio.charset.Charset.forName("windows-1252")
    val third = math.max(1, text.length / 3)
    val pieceA = text.substring(0, third)
    val pieceB = text.substring(third, math.min(text.length, third * 2))
    val pieceC = text.substring(math.min(text.length, third * 2))
    val ccpText = text.length
    val decoy = "DECOY SHOULD NOT APPEAR".getBytes(cp1252)

    val csw = 14; val cslw = 22; val cbRgFcLcb = 93
    val fibLen = 32 + 2 + csw * 2 + 2 + cslw * 4 + 2 + cbRgFcLcb * 8
    val decoyOff = fibLen
    val cOff = decoyOff + decoy.length
    val aOff = cOff + pieceC.length // CP1252: 1 byte/char
    val bOff = aOff + pieceA.length

    val prc = cat(Array(0x01.toByte), u16(2), Array(0xaa.toByte, 0xbb.toByte))
    val lcbPlcPcd = 4 * 4 + 3 * 8
    def pcd(fcRaw: Int): Array[Byte] = cat(u16(0), i32(fcRaw), u16(0))
    val clx = cat(prc, Array(0x02.toByte), i32(lcbPlcPcd),
      i32(0), i32(pieceA.length), i32(pieceA.length + pieceB.length), i32(ccpText),
      pcd((aOff * 2) | 0x40000000),
      pcd(bOff),
      pcd((cOff * 2) | 0x40000000))

    val fib = ByteBuffer.allocate(fibLen).order(ByteOrder.LITTLE_ENDIAN)
    fib.putShort(0, 0xa5ec.toShort)
    fib.putShort(2, 0x00c1.toShort)
    fib.putShort(10, 0x0204.toShort) // fComplex | fWhichTblStm
    fib.putInt(24, decoyOff)
    fib.putInt(28, decoyOff + decoy.length)
    fib.putShort(32, csw.toShort)
    val lwOff = 34 + csw * 2
    fib.putShort(lwOff, cslw.toShort)
    fib.putInt(lwOff + 2 + 3 * 4, ccpText)
    val blobOff = lwOff + 2 + cslw * 4
    fib.putShort(blobOff, cbRgFcLcb.toShort)
    fib.putInt(blobOff + 2 + 33 * 8, 0)
    fib.putInt(blobOff + 2 + 33 * 8 + 4, clx.length)

    val wd = cat(fib.array(), decoy,
      pieceC.getBytes(cp1252),
      pieceA.getBytes(cp1252),
      pieceB.getBytes(java.nio.charset.StandardCharsets.UTF_16LE))
    CfbWriter.write(Seq("WordDocument" -> wd, "1Table" -> clx))
  }

  /** [[SynthDocs.writeCorpus]] over the heavy formats. */
  def writeCorpus(dir: java.nio.file.Path, nDocs: Long,
                  subdirs: Int = 64): Unit =
    SynthDocs.writeCorpusWith(dir, nDocs, subdirs)(fileName, bytesFor)
}
