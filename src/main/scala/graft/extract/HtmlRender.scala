package graft.extract

/** XHTML rendering of extracted text — the engine's analogue of the
  * reference's HTML output mode (ExtractTextProcessor.java:158-172:
  * Tika SAX → identity transformer, `method=html, indent=yes, UTF-8`).
  * The shape follows Tika's ToXMLContentHandler envelope — XML
  * declaration, xhtml namespace, `Content-Type` meta in head, title,
  * `<p>` body paragraphs — with per-page `<div class="page">` wrappers
  * for paged formats ([[renderPages]]; Tika's PDF handler emits one div
  * per page). The reference's tests pin only `mime.type=text/html`
  * (ExtractTextProcessorTest.java:189), not the markup bytes.
  */
object HtmlRender {

  def render(text: String, title: String, contentType: String = null): String =
    renderBody(title, contentType, text.length + 256) { sb =>
      appendParagraphs(sb, text)
    }

  /** Paged variant: each segment's paragraphs wrapped in Tika's
    * `<div class="page">` envelope element. */
  def renderPages(pages: Seq[String], title: String, contentType: String = null): String =
    renderBody(title, contentType, pages.iterator.map(_.length + 32).sum + 256) { sb =>
      pages.foreach { page =>
        sb.append("<div class=\"page\">\n")
        appendParagraphs(sb, page)
        sb.append("</div>\n")
      }
    }

  // sizeHint ≈ escaped-output length: presized once so a ~100 KB doc
  // doesn't pay repeated buffer doublings on the per-document hot path
  private def renderBody(title: String, contentType: String, sizeHint: Int)
                        (body: java.lang.StringBuilder => Unit): String = {
    val sb = new java.lang.StringBuilder(math.max(sizeHint, 1024))
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>")
      .append("<html xmlns=\"http://www.w3.org/1999/xhtml\">\n<head>\n")
    if (contentType != null)
      sb.append("<meta name=\"Content-Type\" content=\"")
        .append(escape(contentType)).append("\"/>\n")
    sb.append("<title>").append(escape(title)).append("</title>\n</head>\n<body>\n")
    body(sb)
    sb.append("</body>\n</html>\n")
    sb.toString
  }

  private def appendParagraphs(sb: java.lang.StringBuilder, text: String): Unit =
    text.split("\n", -1).foreach { line =>
      val t = line.trim
      if (t.nonEmpty) sb.append("<p>").append(escape(t)).append("</p>\n")
    }

  def escape(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '&' => sb.append("&amp;")
        case '<' => sb.append("&lt;")
        case '>' => sb.append("&gt;")
        case '"' => sb.append("&quot;")
        case c   => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }
}
