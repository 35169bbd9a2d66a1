package graft.extract

/** Minimal XHTML rendering of extracted text — the engine's analogue of
  * the reference's HTML output mode (ExtractTextProcessor.java:158-172:
  * Tika SAX → identity transformer, `method=html, indent=yes, UTF-8`).
  * The reference's tests pin only `mime.type=text/html`
  * (ExtractTextProcessorTest.java:189), not the markup bytes, so we
  * define and freeze our own shape: title head + one `<p>` per
  * non-empty line.
  */
object HtmlRender {

  def render(text: String, title: String): String = {
    val sb = new java.lang.StringBuilder(text.length + 256)
    sb.append("<html xmlns=\"http://www.w3.org/1999/xhtml\">\n<head>\n<title>")
      .append(escape(title))
      .append("</title>\n</head>\n<body>\n")
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
