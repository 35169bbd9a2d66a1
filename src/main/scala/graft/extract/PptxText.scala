package graft.extract

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

/** Text extraction from OOXML presentations: `ppt/slides/slideN.xml`
  * text runs (`<a:t>`), one line per paragraph (`<a:p>`), slides in
  * numeric order — the slide-text shape of Tika's .pptx output.
  */
object PptxText {

  def extract(bytes: Array[Byte], maxLen: Int): String = {
    val out = new Bounded(maxLen)
    var idx = 1
    var found = true
    while (found && !out.isFull) {
      DocxText.zipEntry(bytes, s"ppt/slides/slide$idx.xml") match {
        case Some(xml) => parseSlide(xml, out); idx += 1
        case None      => found = false
      }
    }
    if (idx == 1)
      throw new IllegalArgumentException("pptx: no ppt/slides/slide1.xml")
    out.result().trim
  }

  private def parseSlide(xml: Array[Byte], out: Bounded): Unit = {
    val xif = XMLInputFactory.newInstance()
    xif.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    xif.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    val r = xif.createXMLStreamReader(new java.io.ByteArrayInputStream(xml))
    var inT = false
    try {
      while (r.hasNext && !out.isFull) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT if r.getLocalName == "t" => inT = true
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA if inT =>
            out.append(r.getText)
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "t" => inT = false
              case "p" => out.append('\n')
              case _   =>
            }
          case _ =>
        }
      }
    } finally r.close()
  }
}
