package graft.extract

/** XHTML rendering of extracted text — the engine's analogue of the
  * reference's HTML output mode (ExtractTextProcessor.java:158-172:
  * Tika SAX → identity transformer, `method=html, indent=yes, UTF-8`).
  * The shape follows Tika's ToXMLContentHandler envelope — XML
  * declaration, xhtml namespace, `Content-Type` meta in head, title,
  * `<p>` body paragraphs — minus per-page `<div class="page">` wrappers
  * (our PDF extractor emits a single text stream, not page events).
  * The reference's tests pin only `mime.type=text/html`
  * (ExtractTextProcessorTest.java:189), not the markup bytes.
  */
object HtmlRender {

  def render(text: String, title: String, contentType: String = null): String = {
    val sb = new java.lang.StringBuilder(text.length + 256)
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>")
      .append("<html xmlns=\"http://www.w3.org/1999/xhtml\">\n<head>\n")
    if (contentType != null)
      sb.append("<meta name=\"Content-Type\" content=\"")
        .append(escape(contentType)).append("\"/>\n")
    sb.append("<title>").append(escape(title)).append("</title>\n</head>\n<body>\n")
    text.split("\n", -1).foreach { line =>
      val t = line.trim
      if (t.nonEmpty) sb.append("<p>").append(escape(t)).append("</p>\n")
    }
    sb.append("</body>\n</html>\n")
    sb.toString
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
