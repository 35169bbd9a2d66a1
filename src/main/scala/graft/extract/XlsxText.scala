package graft.extract

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

/** Text extraction from OOXML spreadsheets: shared-strings table +
  * per-sheet cell values, rows tab-separated / newline-terminated —
  * the cell-text shape Tika's parseToString emits for .xlsx (the
  * reference accepts any Tika-supported type through the same
  * processor, ExtractTextProcessor.java:174).
  */
object XlsxText {

  def extract(bytes: Array[Byte], maxLen: Int): String = {
    val shared = DocxText.zipEntry(bytes, "xl/sharedStrings.xml")
      .map(parseSharedStrings).getOrElse(Vector.empty)
    val out = new Bounded(maxLen)
    var sheetIdx = 1
    var found = true
    while (found && !out.isFull) {
      DocxText.zipEntry(bytes, s"xl/worksheets/sheet$sheetIdx.xml") match {
        case Some(xml) => parseSheet(xml, shared, out); sheetIdx += 1
        case None      => found = false
      }
    }
    if (sheetIdx == 1)
      throw new IllegalArgumentException("xlsx: no xl/worksheets/sheet1.xml")
    out.result().trim
  }

  private def parseSharedStrings(xml: Array[Byte]): Vector[String] = {
    val r = reader(xml)
    val out = Vector.newBuilder[String]
    val cur = new java.lang.StringBuilder()
    var inSi = false
    var inT = false
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "si" => inSi = true; cur.setLength(0)
              case "t" if inSi => inT = true
              case _ =>
            }
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA if inT =>
            cur.append(r.getText)
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "t" => inT = false
              case "si" => inSi = false; out += cur.toString
              case _ =>
            }
          case _ =>
        }
      }
    } finally r.close()
    out.result()
  }

  private def parseSheet(xml: Array[Byte], shared: Vector[String], out: Bounded): Unit = {
    val r = reader(xml)
    var cellType: String = null
    var inV = false
    val v = new java.lang.StringBuilder()
    var firstInRow = true
    try {
      while (r.hasNext && !out.isFull) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "row" => firstInRow = true
              case "c"   => cellType = r.getAttributeValue(null, "t")
              case "v" | "t" => inV = true; v.setLength(0)
              case _ =>
            }
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA if inV =>
            v.append(r.getText)
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "v" | "t" =>
                inV = false
                val text =
                  if (cellType == "s") // shared-string index
                    try shared(v.toString.trim.toInt)
                    catch { case _: Exception => v.toString }
                  else v.toString
                if (!firstInRow) out.append('\t')
                out.append(text)
                firstInRow = false
              case "row" => out.append('\n'); firstInRow = true
              case _ =>
            }
          case _ =>
        }
      }
    } finally r.close()
  }

  private def reader(xml: Array[Byte]) = {
    val xif = XMLInputFactory.newInstance()
    xif.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    xif.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    xif.createXMLStreamReader(new java.io.ByteArrayInputStream(xml))
  }
}
