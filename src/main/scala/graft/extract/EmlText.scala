package graft.extract

import java.nio.charset.{Charset, StandardCharsets}

/** Text extraction from RFC 5322 email messages (`.eml`): the key
  * routing headers (Subject/From/To/Date, RFC 2047 encoded-words
  * decoded) followed by the message text. MIME structure (RFC 2045/6)
  * is honored — multipart bodies are split on the boundary,
  * `multipart/alternative` yields its best single representation
  * (text/plain preferred, text/html stripped via [[HtmlText]]
  * otherwise), other multiparts concatenate their text parts; base64
  * and quoted-printable transfer encodings are decoded with the
  * declared charset. The reference reaches the same surface through
  * Tika's RFC822 parser under auto-detect (ETP.java:174-175).
  *
  * Pure in-JDK: `java.util.Base64` + hand-rolled QP/2047 decoding.
  */
object EmlText {

  def extract(bytes: Array[Byte], maxLen: Int): String = {
    val raw = new String(bytes, StandardCharsets.ISO_8859_1) // byte-safe
    val (headers, body) = splitMessage(raw)
    val out = new Bounded(maxLen)
    Seq("Subject", "From", "To", "Date").foreach { h =>
      header(headers, h).foreach { v =>
        out.append(h); out.append(": "); out.append(decode2047(v)); out.append('\n')
      }
    }
    val text = bodyText(headers, body)
    if (text.nonEmpty) { out.append('\n'); out.append(text) }
    out.result().trim
  }

  /** Header block (unfolded) and body, split at the first empty line. */
  private def splitMessage(raw: String): (Vector[(String, String)], String) = {
    val norm = raw.replace("\r\n", "\n")
    val cut = norm.indexOf("\n\n")
    val (head, body) =
      if (cut < 0) (norm, "") else (norm.substring(0, cut), norm.substring(cut + 2))
    val headers = Vector.newBuilder[(String, String)]
    var name: String = null
    val value = new StringBuilder
    def flush(): Unit = if (name != null) { headers += ((name, value.toString)); name = null }
    head.split("\n", -1).foreach { line =>
      if (line.nonEmpty && (line.charAt(0) == ' ' || line.charAt(0) == '\t')) {
        if (name != null) { value.append(' '); value.append(line.trim) } // unfold
      } else {
        flush()
        val colon = line.indexOf(':')
        if (colon > 0) {
          name = line.substring(0, colon).trim
          value.clear(); value.append(line.substring(colon + 1).trim)
        }
      }
    }
    flush()
    (headers.result(), body)
  }

  private def header(hs: Vector[(String, String)], name: String): Option[String] =
    hs.collectFirst { case (n, v) if n.equalsIgnoreCase(name) => v }

  private def bodyText(headers: Vector[(String, String)], body: String): String = {
    val ct = header(headers, "Content-Type").getOrElse("text/plain")
    val mime = ct.takeWhile(_ != ';').trim.toLowerCase
    if (mime.startsWith("multipart/")) {
      param(ct, "boundary") match {
        case Some(b) =>
          val parts = splitParts(body, b).map { p =>
            val (hs, bd) = splitMessage(p)
            (header(hs, "Content-Type").getOrElse("text/plain")
               .takeWhile(_ != ';').trim.toLowerCase,
             () => bodyText(hs, bd))
          }
          if (mime == "multipart/alternative") {
            // best single representation: plain beats html beats first
            parts.find(_._1 == "text/plain")
              .orElse(parts.find(_._1 == "text/html"))
              .orElse(parts.headOption)
              .map(_._2()).getOrElse("")
          } else
            parts.filter(p => p._1.startsWith("text/") || p._1.startsWith("multipart/"))
              .map(_._2()).filter(_.nonEmpty).mkString("\n\n")
        case None => body.trim
      }
    } else {
      val decoded = transferDecode(headers, body)
      val cs = charsetOf(ct)
      val text = new String(decoded, cs)
      if (mime == "text/html")
        HtmlText.extract(text.getBytes(StandardCharsets.UTF_8), -1)
      else text.trim
    }
  }

  /** Parts between --boundary delimiter lines (RFC 2046 §5.1.1); the
    * preamble before the first delimiter and the epilogue after
    * --boundary-- are dropped. */
  private def splitParts(body: String, boundary: String): Vector[String] = {
    val delim = "--" + boundary
    val parts = Vector.newBuilder[String]
    var cur: StringBuilder = null
    var done = false
    body.split("\n", -1).foreach { line =>
      val t = line.stripTrailing()
      if (!done) {
        if (t == delim + "--") { if (cur != null) parts += cur.toString; cur = null; done = true }
        else if (t == delim) { if (cur != null) parts += cur.toString; cur = new StringBuilder }
        else if (cur != null) { cur.append(line); cur.append('\n') }
      }
    }
    if (cur != null) parts += cur.toString // unterminated final part: keep
    parts.result()
  }

  private def transferDecode(headers: Vector[(String, String)], body: String): Array[Byte] = {
    val enc = header(headers, "Content-Transfer-Encoding")
      .map(_.trim.toLowerCase).getOrElse("7bit")
    enc match {
      case "base64" =>
        try java.util.Base64.getMimeDecoder.decode(
          body.filterNot(c => c == '\n' || c == '\r'))
        catch { case _: IllegalArgumentException =>
          body.getBytes(StandardCharsets.ISO_8859_1) }
      case "quoted-printable" => decodeQp(body)
      case _ => body.getBytes(StandardCharsets.ISO_8859_1)
    }
  }

  /** RFC 2045 §6.7 quoted-printable: `=XX` hex escapes, `=\n` soft
    * line breaks; malformed escapes pass through literally. */
  private[extract] def decodeQp(s: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '=' && i + 1 < s.length && s.charAt(i + 1) == '\n') i += 2
      else if (c == '=' && i + 2 < s.length && isHex(s.charAt(i + 1)) && isHex(s.charAt(i + 2))) {
        out.write(Integer.parseInt(s.substring(i + 1, i + 3), 16))
        i += 3
      } else { out.write(c.toInt & 0xff); i += 1 }
    }
    out.toByteArray
  }

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'A' && c <= 'F') || (c >= 'a' && c <= 'f')

  /** RFC 2047 encoded-words in header values: `=?charset?B|Q?data?=`.
    * Q-encoding is QP with `_` as space (§4.2(2)). Undecodable words
    * stay literal. */
  private[extract] def decode2047(v: String): String = {
    val re = """=\?([^?]+)\?([BbQq])\?([^?]*)\?=""".r
    re.replaceAllIn(v, m => {
      val cs = safeCharset(m.group(1))
      val decoded =
        try {
          val bytes = m.group(2).toUpperCase match {
            case "B" => java.util.Base64.getMimeDecoder.decode(m.group(3))
            case _   => decodeQp(m.group(3).replace('_', ' '))
          }
          new String(bytes, cs)
        } catch { case scala.util.control.NonFatal(_) => m.matched }
      scala.util.matching.Regex.quoteReplacement(decoded)
    })
  }

  private def param(headerValue: String, name: String): Option[String] = {
    val re = ("""(?i)[;\s]""" + name + """\s*=\s*(?:"([^"]*)"|([^;\s]+))""").r
    re.findFirstMatchIn(headerValue).map(m => Option(m.group(1)).getOrElse(m.group(2)))
  }

  private def charsetOf(contentType: String): Charset =
    param(contentType, "charset").map(safeCharset).getOrElse(StandardCharsets.UTF_8)

  private def safeCharset(name: String): Charset =
    try Charset.forName(name.trim)
    catch { case scala.util.control.NonFatal(_) => StandardCharsets.UTF_8 }
}
