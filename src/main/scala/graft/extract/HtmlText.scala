package graft.extract

/** Plain-text extraction from HTML bytes — the Tika-parity path for
  * `text/html` inputs (the reference's `parseToString` strips markup
  * for any detected type, ExtractTextProcessor.java:174). Single-pass
  * tag stripper: drops tags, `<script>`/`<style>` bodies and comments,
  * decodes the common entities, and emits newlines at block-level
  * boundaries. maxLen early-stop via [[Bounded]].
  */
object HtmlText {

  private val BlockTags = Set("p", "div", "br", "li", "tr", "h1", "h2", "h3",
    "h4", "h5", "h6", "table", "ul", "ol", "blockquote", "pre", "hr", "title")

  private val Entities = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> " ", "copy" -> "©", "reg" -> "®", "mdash" -> "—",
    "ndash" -> "–", "hellip" -> "…")

  def extract(bytes: Array[Byte], maxLen: Int): String = {
    val html = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    val out = new Bounded(maxLen)
    var i = 0
    val n = html.length
    var skipUntil: String = null // inside <script>/<style>
    var lastWasSpace = true
    while (i < n && !out.isFull) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val end = html.indexOf("-->", i)
          i = if (end < 0) n else end + 3
        } else {
          val close = html.indexOf('>', i)
          if (close < 0) i = n
          else {
            val inner = html.substring(i + 1, close).trim
            val isEnd = inner.startsWith("/")
            val name = inner.stripPrefix("/").takeWhile(ch =>
              Character.isLetterOrDigit(ch)).toLowerCase
            if (skipUntil != null) {
              if (isEnd && name == skipUntil) skipUntil = null
            } else if (!isEnd && (name == "script" || name == "style") &&
                       !inner.endsWith("/")) {
              skipUntil = name
            } else if (BlockTags.contains(name)) {
              out.append('\n'); lastWasSpace = true
            }
            i = close + 1
          }
        }
      } else if (skipUntil != null) {
        i += 1
      } else if (c == '&') {
        val semi = html.indexOf(';', i)
        if (semi > i && semi - i <= 8) {
          val ent = html.substring(i + 1, semi)
          val decoded =
            if (ent.startsWith("#x") || ent.startsWith("#X"))
              tryCodePoint(ent.substring(2), 16)
            else if (ent.startsWith("#")) tryCodePoint(ent.substring(1), 10)
            else Entities.get(ent.toLowerCase)
          decoded match {
            case Some(s) => out.append(s); lastWasSpace = s == " "; i = semi + 1
            case None    => out.append('&'); lastWasSpace = false; i += 1
          }
        } else { out.append('&'); lastWasSpace = false; i += 1 }
      } else if (Character.isWhitespace(c)) {
        if (!lastWasSpace) out.append(' ')
        lastWasSpace = true
        i += 1
      } else {
        out.append(c)
        lastWasSpace = false
        i += 1
      }
    }
    out.result().trim
  }

  private val HrefRe =
    """(?i)href\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))""".r

  /** (href, anchor-text) pairs from `<a>` tags in document order — the
    * link-graph feed of a web-corpus pipeline (anchors are both dedup
    * keys and quality signals). Handles double-/single-/un-quoted href
    * values and attributes in any order; the inner markup runs through
    * [[extract]], so nested tags strip and entities decode exactly
    * like body text. Anchors without an href yield no row; `<a>` does
    * not nest in HTML, so the scan resumes after each open tag. */
  def extractLinks(html: String): Seq[(String, String)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val lower = html.toLowerCase
    val n = html.length
    var i = 0
    while (i < n) {
      val open = lower.indexOf("<a", i)
      if (open < 0) i = n
      else if (open + 2 >= n) i = n
      else if (!Character.isWhitespace(html.charAt(open + 2)) &&
               html.charAt(open + 2) != '>') i = open + 2
      else {
        val close = html.indexOf('>', open)
        if (close < 0) i = n
        else {
          val href = HrefRe.findFirstMatchIn(html.substring(open, close))
            .map(m => Option(m.group(1)).orElse(Option(m.group(2)))
              .getOrElse(m.group(3)))
          val end = lower.indexOf("</a", close)
          val innerEnd = if (end < 0) n else end
          val text = extract(html.substring(close + 1, innerEnd)
            .getBytes(java.nio.charset.StandardCharsets.UTF_8), 1 << 20)
          href.foreach(h => out += h -> text)
          i = close + 1
        }
      }
    }
    out.toSeq
  }

  private def tryCodePoint(digits: String, radix: Int): Option[String] =
    try {
      val cp = Integer.parseInt(digits, radix)
      if (Character.isValidCodePoint(cp)) Some(new String(Character.toChars(cp)))
      else None
    } catch { case _: NumberFormatException => None }
}
