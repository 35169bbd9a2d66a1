package graft.extract

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

/** Text extraction from OOXML Word documents: the zip container's
  * `word/document.xml`, concatenating `<w:t>` runs with paragraph breaks
  * at `</w:p>`, tabs at `<w:tab/>`, line breaks at `<w:br/>` — the same
  * observable output shape as the reference's Tika path for its
  * simple.docx fixture (ExtractTextProcessorTest.java:129).
  *
  * Pure in-JDK: `java.util.zip.ZipInputStream` + StAX
  * (`javax.xml.stream`), streaming, with early stop at the max-length
  * cap.
  */
object DocxText {

  def extract(bytes: Array[Byte], maxLen: Int): String = {
    val out = new Bounded(maxLen)
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    try {
      var entry = zin.getNextEntry
      var done = false
      while (entry != null && !done) {
        if (entry.getName == "word/document.xml") {
          parseDocumentXml(zin, out)
          done = true
        }
        entry = zin.getNextEntry
      }
    } finally zin.close()
    out.result().trim
  }

  /** Reads a named zip entry fully (shared helper for metadata too). */
  private[extract] def zipEntry(bytes: Array[Byte], name: String): Option[Array[Byte]] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    try {
      var entry = zin.getNextEntry
      while (entry != null) {
        if (entry.getName == name) return Some(zin.readAllBytes())
        entry = zin.getNextEntry
      }
      None
    } finally zin.close()
  }

  private def parseDocumentXml(in: java.io.InputStream, out: Bounded): Unit = {
    val xif = XMLInputFactory.newInstance()
    xif.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    xif.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    val r = xif.createXMLStreamReader(in)
    var inT = false
    var paragraphHasText = false
    try {
      while (r.hasNext && !out.isFull) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "t"   => inT = true
              case "tab" => out.append('\t')
              case "br"  => out.append('\n')
              case "p"   => paragraphHasText = false
              case _     =>
            }
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA if inT =>
            out.append(r.getText)
            paragraphHasText = true
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "t" => inT = false
              case "p" => out.append('\n') // paragraph mark, even when empty
              case _   =>
            }
          case _ =>
        }
      }
    } finally r.close()
  }
}
