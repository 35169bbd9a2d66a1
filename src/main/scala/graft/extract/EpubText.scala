package graft.extract

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

/** Text extraction from EPUB containers (EPUB 3, also reads EPUB 2):
  * an EPUB is a zip whose reading order is NOT archive order — it is
  * the `<spine>` of the OPF package document, located via
  * `META-INF/container.xml`. This extractor resolves container.xml →
  * OPF → manifest(id → href) → spine(idref order), then strips each
  * content document through [[HtmlText]], chapters separated by a
  * blank line. Falls back to archive-order XHTML entries when the OPF
  * chain is absent/corrupt (degrade, never throw, matching the
  * reference's extract-whatever-Tika-detects posture, ETP.java:174).
  *
  * Pure in-JDK: zip + StAX; the per-chapter HtmlText pass reuses the
  * existing cap-aware stripper so maxLen stops mid-book.
  */
object EpubText {

  def extract(bytes: Array[Byte], maxLen: Int): String = {
    val entries = readEntries(bytes)
    val ordered = spineOrder(entries).getOrElse(
      entries.collect { case (n, _) if isContentDoc(n) => n })
    if (ordered.isEmpty)
      throw new IllegalArgumentException("epub: no content documents")
    val byName = entries.toMap
    val out = new Bounded(maxLen)
    var first = true
    ordered.foreach { name =>
      byName.get(name).foreach { body =>
        if (!out.isFull) {
          val t = HtmlText.extract(body, remaining(out, maxLen))
          if (t.nonEmpty) {
            if (!first) out.append("\n\n")
            out.append(t)
            first = false
          }
        }
      }
    }
    out.result().trim
  }

  private def remaining(out: Bounded, maxLen: Int): Int =
    if (maxLen < 0) -1 else math.max(0, maxLen - out.length)

  private def isContentDoc(name: String): Boolean = {
    val n = name.toLowerCase
    n.endsWith(".xhtml") || n.endsWith(".html") || n.endsWith(".htm")
  }

  /** All zip entries, archive order (EPUBs are small relative to the
    * executor; the corpus-scale parallelism is across documents, not
    * within one container). */
  private def readEntries(bytes: Array[Byte]): Vector[(String, Array[Byte])] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    val buf = Vector.newBuilder[(String, Array[Byte])]
    try {
      var e = zin.getNextEntry
      while (e != null) {
        if (!e.isDirectory) buf += ((e.getName, zin.readAllBytes()))
        e = zin.getNextEntry
      }
    } finally zin.close()
    buf.result()
  }

  /** container.xml → OPF path → spine-ordered content hrefs (resolved
    * against the OPF's directory). None on any structural gap. */
  private def spineOrder(entries: Vector[(String, Array[Byte])]): Option[Vector[String]] = {
    val byName = entries.toMap
    for {
      container <- byName.get("META-INF/container.xml")
      opfPath <- firstAttr(container, "rootfile", "full-path")
      opf <- byName.get(opfPath)
      order <- parseOpf(opf, opfDir(opfPath))
      if order.nonEmpty && order.forall(byName.contains)
    } yield order
  }

  private def opfDir(path: String): String = {
    val i = path.lastIndexOf('/')
    if (i < 0) "" else path.substring(0, i + 1)
  }

  private def firstAttr(xml: Array[Byte], element: String, attr: String): Option[String] = {
    val r = reader(xml)
    try {
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT &&
            r.getLocalName == element) {
          val v = r.getAttributeValue(null, attr)
          if (v != null) return Some(v)
        }
      }
      None
    } catch { case scala.util.control.NonFatal(_) => None }
    finally r.close()
  }

  /** One pass over the OPF: manifest id→href plus spine idref order
    * (the spine legally precedes the manifest, so both are collected
    * before resolving). */
  private def parseOpf(xml: Array[Byte], dir: String): Option[Vector[String]] = {
    val hrefs = scala.collection.mutable.Map[String, String]()
    val spine = Vector.newBuilder[String]
    val r = reader(xml)
    try {
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT) {
          r.getLocalName match {
            case "item" =>
              val id = r.getAttributeValue(null, "id")
              val href = r.getAttributeValue(null, "href")
              if (id != null && href != null) hrefs(id) = href
            case "itemref" =>
              val idref = r.getAttributeValue(null, "idref")
              if (idref != null) spine += idref
            case _ =>
          }
        }
      }
      val order = spine.result().flatMap(hrefs.get).map(dir + _)
        .filter(isContentDoc)
      Some(order)
    } catch { case scala.util.control.NonFatal(_) => None }
    finally r.close()
  }

  private def reader(xml: Array[Byte]) = {
    val xif = XMLInputFactory.newInstance()
    xif.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    xif.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    xif.createXMLStreamReader(new ByteArrayInputStream(xml))
  }
}
