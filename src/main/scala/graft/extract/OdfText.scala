package graft.extract

import java.io.ByteArrayInputStream
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

/** Text extraction from OpenDocument files (ODF 1.2, OASIS): the zip
  * container's `content.xml`, covering the three reference-relevant
  * bodies — text documents (`.odt`, `<text:p>`/`<text:h>` paragraphs),
  * spreadsheets (`.ods`, table cells tab-separated / rows
  * newline-separated, same shape as XlsxText), and presentations
  * (`.odp`, text frames in document order). The reference extracts
  * these via Tika's auto-detect (ETP.java:174-175 — OpenDocument is in
  * Tika 1.22's default parser set); this is the Spark-native analogue.
  *
  * Pure in-JDK: `java.util.zip.ZipInputStream` + StAX, streaming with
  * early stop at the max-length cap, mirroring DocxText.
  */
object OdfText {

  def extract(bytes: Array[Byte], maxLen: Int): String = {
    val xml = DocxText.zipEntry(bytes, "content.xml").getOrElse(
      throw new IllegalArgumentException("odf: no content.xml entry"))
    val out = new Bounded(maxLen)
    parseContentXml(new ByteArrayInputStream(xml), out)
    out.result().trim
  }

  /** ODF text model: character data inside `text:p`/`text:h` is
    * content; `text:tab`/`text:line-break`/`text:s` are explicit
    * whitespace marks; spreadsheet structure arrives as
    * `table:table-row`/`table:table-cell` wrappers AROUND paragraphs,
    * so cell separators are emitted at cell boundaries and the
    * paragraph newline is suppressed inside cells. */
  private def parseContentXml(in: java.io.InputStream, out: Bounded): Unit = {
    val xif = XMLInputFactory.newInstance()
    xif.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    xif.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    val r = xif.createXMLStreamReader(in)
    var textDepth = 0 // nested open text:p / text:h
    var cellDepth = 0 // nested open table:table-cell
    var cellsInRow = 0
    try {
      while (r.hasNext && !out.isFull) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "p" | "h" => textDepth += 1
              case "tab" if textDepth > 0 => out.append('\t')
              case "line-break" if textDepth > 0 => out.append('\n')
              case "s" if textDepth > 0 =>
                // <text:s text:c="n"/> encodes a run of n spaces
                val c = Option(r.getAttributeValue(null, "c"))
                  .flatMap(v => scala.util.Try(v.toInt).toOption)
                  .getOrElse(1)
                out.append(" " * math.max(1, math.min(c, 1 << 16)))
              case "table-row" => cellsInRow = 0
              case "table-cell" =>
                if (cellsInRow > 0) out.append('\t')
                cellsInRow += 1
                cellDepth += 1
              case _ =>
            }
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA
              if textDepth > 0 =>
            out.append(r.getText)
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "p" | "h" =>
                textDepth = math.max(0, textDepth - 1)
                // paragraphs inside a cell stay on the cell's row line
                if (cellDepth == 0) out.append('\n')
              case "table-cell" => cellDepth = math.max(0, cellDepth - 1)
              case "table-row" if cellsInRow > 0 => out.append('\n')
              case _ =>
            }
          case _ =>
        }
      }
    } finally r.close()
  }
}
