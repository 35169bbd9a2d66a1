package graft.extract

/** The engine's core per-document transform — the Spark-side equivalent
  * of `ExtractTextProcessor.onTrigger` (ExtractTextProcessor.java:135-233):
  * detect MIME, extract plain text or XHTML under the max-length cap,
  * and report success/failure as data (the `wasError` flag that drives
  * the reference's REL_FAILURE route, ExtractTextProcessor.java:146,201).
  */
object TextExtractor {

  /** Result mirrors the FlowFile contract: new content + mime attrs +
    * error (null on success). */
  final case class Extracted(text: String, mimeType: String, origMimeType: String, error: String)

  val TextPlain = "text/plain"
  val TextHtml  = "text/html"

  /** maxLen: -1 = unlimited (ExtractTextProcessor.java:85 default). */
  def extract(bytes: Array[Byte], filename: String, maxLen: Int = -1,
              htmlOutput: Boolean = false): Extracted = {
    if (bytes == null)
      return Extracted(null, null, null, "null content")
    val mime = MimeDetect.detect(bytes, filename)
    try {
      // Paged XHTML path: PDF page segments each get Tika's
      // <div class="page"> wrapper (HtmlRender.renderPages).
      if (htmlOutput && mime == MimeDetect.Pdf) {
        val pages = PdfText.extractPages(bytes, maxLen)
        return Extracted(HtmlRender.renderPages(pages, filename, mime), TextHtml, mime, null)
      }
      val text = mime match {
        case MimeDetect.Pdf  => PdfText.extract(bytes, maxLen)
        case MimeDetect.Docx => DocxText.extract(bytes, maxLen)
        case MimeDetect.Doc  => DocText.extract(bytes, maxLen)
        case MimeDetect.Xlsx => XlsxText.extract(bytes, maxLen)
        case MimeDetect.Pptx => PptxText.extract(bytes, maxLen)
        case MimeDetect.Xls  => XlsText.extract(bytes, maxLen)
        case MimeDetect.Ppt  => PptText.extract(bytes, maxLen)
        case MimeDetect.Odt | MimeDetect.Ods | MimeDetect.Odp =>
          OdfText.extract(bytes, maxLen)
        case MimeDetect.Epub => EpubText.extract(bytes, maxLen)
        case MimeDetect.Eml  => EmlText.extract(bytes, maxLen)
        case MimeDetect.Zip =>
          throw new IllegalArgumentException(s"unsupported container type $mime")
        case MimeDetect.Jpeg | MimeDetect.Png | MimeDetect.Gif |
             MimeDetect.Tiff | MimeDetect.Mp4 | MimeDetect.Mp4Audio |
             MimeDetect.Wav | MimeDetect.Mp3 =>
          "" // media carry no text body (Tika parity: empty text +
             // metadata attributes; ExtractMediaMetadata is the payload)
        case MimeDetect.OctetStream =>
          throw new IllegalArgumentException("binary content with no known text structure")
        case MimeDetect.Rtf  => RtfText.extract(bytes, maxLen)
        case MimeDetect.Html => // strip markup, like the Tika path
          HtmlText.extract(bytes, maxLen)
        case _ => // text/plain and friends: bytes are the text
          val s = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
          val b = new Bounded(maxLen)
          b.append(s)
          b.result()
      }
      if (htmlOutput)
        Extracted(HtmlRender.render(text, filename, mime), TextHtml, mime, null)
      else
        Extracted(text, TextPlain, mime, null)
    } catch {
      case e: Exception =>
        Extracted(null, null, mime, s"${e.getClass.getSimpleName}: ${e.getMessage}")
    }
  }
}
