package graft.extract

/** Magic-byte + filename MIME detection.
  *
  * Stand-in for the reference's `tika.detect(stream, filename)`
  * (ExtractTextProcessor.java:153,156). Covers the types the reference's
  * contract pins (ExtractTextProcessorTest.java:155-241): PDF, legacy
  * Word (OLE2/CFB), OOXML Word, with `text/plain` fallback — plus the
  * OOXML siblings sharing the zip container.
  */
object MimeDetect {
  val Pdf  = "application/pdf"
  val Doc  = "application/msword"
  val Xls  = "application/vnd.ms-excel"
  val Ppt  = "application/vnd.ms-powerpoint"
  val Docx = "application/vnd.openxmlformats-officedocument.wordprocessingml.document"
  val Xlsx = "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet"
  val Pptx = "application/vnd.openxmlformats-officedocument.presentationml.presentation"
  val Zip  = "application/zip"
  val Ole2 = "application/x-tika-msoffice"
  val Rtf  = "application/rtf"
  val Html = "text/html"
  val Text = "text/plain"
  val Jpeg = "image/jpeg"
  val Png  = "image/png"
  val Gif  = "image/gif"
  val Tiff = "image/tiff"
  val Mp4  = "video/mp4"
  val Mp4Audio = "audio/mp4"
  val Wav  = "audio/vnd.wave"
  val Mp3  = "audio/mpeg"
  val Odt  = "application/vnd.oasis.opendocument.text"
  val Ods  = "application/vnd.oasis.opendocument.spreadsheet"
  val Odp  = "application/vnd.oasis.opendocument.presentation"
  val Epub = "application/epub+zip"
  val Eml  = "message/rfc822"
  val OctetStream = "application/octet-stream"

  private val OleMagic = Array(0xd0, 0xcf, 0x11, 0xe0, 0xa1, 0xb1, 0x1a, 0xe1).map(_.toByte)

  def detect(bytes: Array[Byte], filename: String): String = {
    if (bytes == null || bytes.isEmpty) return OctetStream
    if (startsWith(bytes, "%PDF".getBytes)) return Pdf
    if (startsWith(bytes, OleMagic)) return oleSubtype(bytes, filename)
    if (startsWith(bytes, Array[Byte]('P', 'K', 3, 4))) return zipSubtype(bytes, filename)
    if (startsWith(bytes, "{\\rtf".getBytes)) return Rtf
    if (startsWith(bytes, Array(0xff, 0xd8, 0xff).map(_.toByte))) return Jpeg
    if (startsWith(bytes, Array(0x89, 'P', 'N', 'G').map(_.toByte))) return Png
    if (startsWith(bytes, "GIF87a".getBytes) ||
        startsWith(bytes, "GIF89a".getBytes)) return Gif
    // bare TIFF container: II*\0 (little-endian) / MM\0* (big-endian)
    if (startsWith(bytes, Array[Byte]('I', 'I', 0x2a, 0)) ||
        startsWith(bytes, Array[Byte]('M', 'M', 0, 0x2a))) return Tiff
    // ISO BMFF: box type `ftyp` at offset 4; major brand splits the
    // audio-only container from video (Tika's brand map, condensed)
    if (bytes.length >= 12 && bytes(4) == 'f' && bytes(5) == 't' &&
        bytes(6) == 'y' && bytes(7) == 'p') {
      val brand = new String(bytes, 8, 4, java.nio.charset.StandardCharsets.ISO_8859_1)
      return if (brand.startsWith("M4A") || brand.startsWith("M4B")) Mp4Audio else Mp4
    }
    if (startsWith(bytes, "RIFF".getBytes) && bytes.length >= 12 &&
        bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' &&
        bytes(11) == 'E') return Wav
    // MPEG audio: an ID3v2 tag, or a bare Layer-III frame-sync whose
    // header bits are all VALID (version/bitrate/samplerate not
    // reserved). Layer III only on the bare path — a UTF-16LE BOM
    // (FF FE) parses as a "valid" Layer-I header and must not match.
    if (startsWith(bytes, "ID3".getBytes)) return Mp3
    if (bytes.length >= 4 && (bytes(0) & 0xff) == 0xff &&
        (bytes(1) & 0xe0) == 0xe0 &&
        ((bytes(1) >> 3) & 3) != 1 &&     // version not reserved
        ((bytes(1) >> 1) & 3) == 1 &&     // layer III (= MP3)
        ((bytes(2) >> 4) & 15) != 15 &&   // bitrate index not "bad"
        ((bytes(2) >> 2) & 3) != 3)       // samplerate index not reserved
      return Mp3
    val head = new String(bytes, 0, math.min(bytes.length, 512),
      java.nio.charset.StandardCharsets.ISO_8859_1)
    if (looksLikeEmail(head) ||
        (isMostlyText(bytes) &&
         Option(filename).getOrElse("").toLowerCase.endsWith(".eml"))) return Eml
    val lower = head.toLowerCase
    if (lower.contains("<html") || lower.contains("<!doctype html")) return Html
    if (isMostlyText(bytes)) Text else OctetStream
  }

  /** RFC 5322 shape: the content opens with a header line and the
    * header block names at least two well-known message headers —
    * Tika's rfc822 magic uses the same anchored-header signal. Checked
    * BEFORE the html probe so an html-bodied email stays an email. */
  private def looksLikeEmail(head: String): Boolean = {
    val lines = head.split("\r?\n", -1).takeWhile(_.nonEmpty).take(40)
    if (lines.isEmpty) return false
    val headerLine = "^[A-Za-z][A-Za-z0-9-]{0,60}:.*$"
    if (!lines.head.matches(headerLine)) return false
    val known = Set("from", "to", "subject", "date", "received",
      "return-path", "message-id", "mime-version", "delivered-to")
    lines.count(l => l.matches(headerLine) &&
      known.contains(l.takeWhile(_ != ':').toLowerCase)) >= 2
  }

  /** OLE2 subtype from the container's own directory entries — the
    * authoritative signal Tika's container detector uses (the marker
    * stream names are fixed by each format's spec); filename extension
    * only as fallback for containers we can't parse. */
  private def oleSubtype(bytes: Array[Byte], filename: String): String = {
    val names: Set[String] =
      try new Cfb.CompoundFile(bytes).entries.map(_.name).toSet
      catch { case scala.util.control.NonFatal(_) => Set.empty }
    if (names("WordDocument")) Doc
    else if (names("Workbook") || names("Book")) Xls
    else if (names("PowerPoint Document")) Ppt
    else {
      val f = Option(filename).getOrElse("").toLowerCase
      if (f.endsWith(".xls")) Xls
      else if (f.endsWith(".ppt")) Ppt
      else Doc // reference pipeline default-routes OLE2 as Word
    }
  }

  /** OOXML files are zips; the content type lives in the inner paths.
    * ODF/EPUB zips carry an authoritative `mimetype` entry instead
    * (ODF 1.2 §3.3 / OCF §5.3 require it first and uncompressed) —
    * read it directly, the strongest signal the container offers. */
  private def zipSubtype(bytes: Array[Byte], filename: String): String = {
    val declared: Option[String] =
      try {
        val zin = new java.util.zip.ZipInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try Option(zin.getNextEntry).filter(_.getName == "mimetype")
          .map(_ => new String(zin.readAllBytes(),
            java.nio.charset.StandardCharsets.US_ASCII).trim)
        finally zin.close()
      } catch { case scala.util.control.NonFatal(_) => None }
    declared match {
      case Some(Odt) => return Odt
      case Some(Ods) => return Ods
      case Some(Odp) => return Odp
      case Some(Epub) => return Epub
      case _ =>
    }
    val probe = new String(bytes, 0, math.min(bytes.length, 8192),
      java.nio.charset.StandardCharsets.ISO_8859_1)
    if (probe.contains("word/")) Docx
    else if (probe.contains("xl/")) Xlsx
    else if (probe.contains("ppt/")) Pptx
    else {
      val f = Option(filename).getOrElse("").toLowerCase
      if (f.endsWith(".docx")) Docx
      else if (f.endsWith(".xlsx")) Xlsx
      else if (f.endsWith(".pptx")) Pptx
      else Zip
    }
  }

  private def startsWith(bytes: Array[Byte], prefix: Array[Byte]): Boolean =
    bytes.length >= prefix.length && java.util.Arrays.equals(
      java.util.Arrays.copyOfRange(bytes, 0, prefix.length), prefix)

  /** Printable/whitespace ratio heuristic over the first 512 bytes. */
  private def isMostlyText(bytes: Array[Byte]): Boolean = {
    val n = math.min(bytes.length, 512)
    var printable = 0
    var i = 0
    while (i < n) {
      val b = bytes(i) & 0xff
      if (b == 0) return false
      if (b >= 0x20 || b == '\n' || b == '\r' || b == '\t') printable += 1
      i += 1
    }
    printable.toDouble / n > 0.9
  }
}
