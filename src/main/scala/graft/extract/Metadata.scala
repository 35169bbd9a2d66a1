package graft.extract

/** Document-metadata extraction — the engine's `ExtractMediaMetadata`
  * analogue (56409-tika.xml:1726-1761: Tika metadata → attributes,
  * `Max Number of Attributes=5000`, `Max Attribute Length=2048`).
  *
  * Per-format sources:
  *  - PDF: the `/Info` dictionary's string values (Title, Author,
  *    Producer, CreationDate, …) located by key regex — tolerant of
  *    malformed xref, like the text path;
  *  - DOCX: `docProps/core.xml` + `docProps/app.xml` elements;
  *  - DOC: the [MS-OLEPS] SummaryInformation property set (author,
  *    app, timestamps, page/word/char counts) + CFB stream listing;
  *  - always: `Content-Type` and `Content-Length`.
  */
object Metadata {
  val MaxAttributes = 5000
  val MaxValueLength = 2048

  /** The processor's four config properties (56409-tika.xml:1726-1760):
    * attribute-count / value-length caps, `Metadata Key Filter` (regex a
    * key must fully match to be kept; None keeps all), and `Metadata Key
    * Prefix` (prepended to every surviving key). */
  final case class Options(maxAttributes: Int = MaxAttributes,
                           maxValueLength: Int = MaxValueLength,
                           keyFilter: Option[String] = None,
                           keyPrefix: String = "")

  def extract(bytes: Array[Byte], filename: String,
              opts: Options = Options()): Map[String, String] = {
    val mime = MimeDetect.detect(bytes, filename)
    val base = Map("Content-Type" -> mime, "Content-Length" -> bytes.length.toString)
    val specific = mime match {
      case MimeDetect.Pdf  => pdfInfo(bytes)
      case MimeDetect.Docx => docxProps(bytes)
      case MimeDetect.Doc  => docProps(bytes)
      case _               => Map.empty[String, String]
    }
    cap(base ++ specific, opts)
  }

  // compiled keyFilter patterns, memoized per executor — cap() runs per
  // ROW inside the metadata UDF, and Pattern.compile per row is pure waste
  private val filterCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.regex.Pattern]()

  private def cap(m: Map[String, String], opts: Options): Map[String, String] = {
    val kept = opts.keyFilter match {
      case Some(re) =>
        val p = filterCache.computeIfAbsent(re, java.util.regex.Pattern.compile(_))
        m.filter { case (k, _) => p.matcher(k).matches() }
      case None => m
    }
    kept.take(opts.maxAttributes).map { case (k, v) =>
      (opts.keyPrefix + k) ->
        (if (v.length > opts.maxValueLength) v.substring(0, opts.maxValueLength) else v)
    }
  }

  private val PdfInfoKeys =
    List("Title", "Author", "Subject", "Keywords", "Creator", "Producer",
      "CreationDate", "ModDate")

  private def pdfInfo(bytes: Array[Byte]): Map[String, String] = {
    // Raw scan sees uncompressed Info dicts; writers that compress the
    // xref (PDF 1.5+) serialize Info inside a /ObjStm, so scan those
    // inflated too. Raw wins on key collision (it is the newer
    // incremental-update generation when both exist).
    val raw = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    val objStm = PdfText.objectStreamText(bytes)
    def scan(txt: String): Map[String, String] =
      PdfInfoKeys.flatMap { key =>
        val p = java.util.regex.Pattern.compile("/" + key + "\\s*\\(((?:[^()\\\\]|\\\\.)*)\\)")
        val m = p.matcher(txt)
        if (m.find()) {
          val v = unescapePdf(m.group(1)).trim
          if (v.nonEmpty) Some(key -> v) else None
        } else None
      }.toMap
    scan(infoDictSlices(objStm)) ++ scan(raw)
  }

  /** Object streams serialize EVERY kind of dictionary — outlines also
    * carry `/Title` — so restrict the ObjStm scan to dictionary slices
    * that look like an Info dict: at least two distinct Info keys
    * present. (Slices are cut `<<`-to-next-`<<`; Info dicts don't nest
    * in practice.) */
  private def infoDictSlices(txt: String): String = {
    val out = new StringBuilder
    var s = txt.indexOf("<<")
    while (s >= 0) {
      val next = txt.indexOf("<<", s + 2)
      val end = math.min(if (next < 0) txt.length else next, s + 2000)
      val slice = txt.substring(s, end)
      if (PdfInfoKeys.count(k => slice.contains("/" + k)) >= 2)
        out.append(slice).append('\n')
      s = next
    }
    out.toString
  }

  private def unescapePdf(s: String): String =
    s.replace("\\(", "(").replace("\\)", ")").replace("\\\\", "\\")

  private def docxProps(bytes: Array[Byte]): Map[String, String] = {
    def propsOf(entry: String): Map[String, String] =
      DocxText.zipEntry(bytes, entry).map(xmlLeafText).getOrElse(Map.empty)
    propsOf("docProps/core.xml") ++ propsOf("docProps/app.xml")
  }

  /** Flat leaf-element text of a small XML doc, keyed by local name. */
  private def xmlLeafText(xml: Array[Byte]): Map[String, String] = {
    import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
    val xif = XMLInputFactory.newInstance()
    xif.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    xif.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    val r = xif.createXMLStreamReader(new java.io.ByteArrayInputStream(xml))
    val out = scala.collection.mutable.LinkedHashMap[String, String]()
    var current: String = null
    val text = new java.lang.StringBuilder()
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            current = r.getLocalName; text.setLength(0)
          case XMLStreamConstants.CHARACTERS if current != null =>
            text.append(r.getText)
          case XMLStreamConstants.END_ELEMENT =>
            val t = text.toString.trim
            if (current != null && current == r.getLocalName && t.nonEmpty)
              out.getOrElseUpdate(current, t)
            current = null; text.setLength(0)
          case _ =>
        }
      }
    } finally r.close()
    out.toMap
  }

  // [MS-OLEPS] SummaryInformation property ids → Tika-style names
  private val SummaryPropNames = Map(
    2 -> "Title", 3 -> "Subject", 4 -> "Author", 5 -> "Keywords",
    6 -> "Comments", 7 -> "Template", 8 -> "LastAuthor", 9 -> "RevNumber",
    11 -> "LastPrinted", 12 -> "CreateDtm", 13 -> "LastSaveDtm",
    14 -> "PageCount", 15 -> "WordCount", 16 -> "CharCount", 18 -> "AppName")

  private def docProps(bytes: Array[Byte]): Map[String, String] =
    try {
      val cf = new Cfb.CompoundFile(bytes)
      val summary = cf.stream("\u0005SummaryInformation")
        .map(parsePropertySet(_, SummaryPropNames)).getOrElse(Map.empty)
      val docSummary = cf.stream("\u0005DocumentSummaryInformation")
        .map(parsePropertySet(_, DocSummaryPropNames)).getOrElse(Map.empty)
      summary ++ docSummary ++ Map("Cfb-Streams" ->
        cf.entries.filter(_.objType == 2).map(_.name.filter(_ >= ' ')).sorted.mkString(","))
    } catch { case _: Exception => Map.empty }

  // [MS-OLEPS] DocumentSummaryInformation ids (the second OLE property
  // set Word writes) → POI/Tika-style names
  private val DocSummaryPropNames = Map(
    2 -> "Category", 3 -> "PresentationTarget", 4 -> "ByteCount",
    5 -> "LineCount", 6 -> "ParCount", 7 -> "SlideCount", 8 -> "NoteCount",
    9 -> "HiddenCount", 10 -> "MMClipCount", 11 -> "ScaleCrop",
    14 -> "Manager", 15 -> "Company", 16 -> "LinksUpToDate",
    17 -> "CharCountWithSpaces", 19 -> "SharedDoc", 22 -> "HyperlinksChanged",
    23 -> "AppVersion")

  /** Minimal [MS-OLEPS] property-set reader: first section's VT_LPSTR /
    * VT_I2 / VT_I4 / VT_BOOL / VT_FILETIME properties by id. */
  private def parsePropertySet(si: Array[Byte],
                               names: Map[Int, String]): Map[String, String] = {
    import java.nio.{ByteBuffer, ByteOrder}
    def u32(off: Int): Int = ByteBuffer.wrap(si, off, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
    def u64(off: Int): Long = ByteBuffer.wrap(si, off, 8).order(ByteOrder.LITTLE_ENDIAN).getLong
    if (si.length < 48 || (si(0) & 0xff) != 0xfe || (si(1) & 0xff) != 0xff) return Map.empty
    val secOff = u32(44)
    val nProps = u32(secOff + 4)
    (0 until math.min(nProps, MaxAttributes)).flatMap { i =>
      val pid = u32(secOff + 8 + i * 8)
      val pOff = secOff + u32(secOff + 12 + i * 8)
      if (pOff + 4 > si.length) None
      else names.get(pid).flatMap { name =>
        u32(pOff) match {
          case 30 => // VT_LPSTR: CodePage string, NUL-terminated
            val cch = u32(pOff + 4)
            if (cch <= 0 || pOff + 8 + cch > si.length) None
            else {
              val raw = new String(si, pOff + 8, cch,
                java.nio.charset.Charset.forName("windows-1252"))
              val v = raw.takeWhile(_ != '\u0000').trim
              if (v.nonEmpty) Some(name -> v) else None
            }
          case 2 | 3 => Some(name -> u32(pOff + 4).toString) // VT_I2/VT_I4
          case 11 => // VT_BOOL: 0xFFFF true / 0x0000 false
            Some(name -> ((u32(pOff + 4) & 0xffff) != 0).toString)
          case 64 => // VT_FILETIME: 100ns ticks since 1601-01-01
            val ticks = u64(pOff + 4)
            if (ticks == 0) None
            else {
              val instant = java.time.Instant.ofEpochMilli(
                ticks / 10000L - 11644473600000L)
              Some(name -> instant.toString)
            }
          case _ => None
        }
      }
    }.toMap
  }
}
