package graft.extract

/** Plain-text extraction from RTF (public RTF 1.9 spec): control words
  * are consumed, destination groups that never render (`fonttbl`,
  * `colortbl`, `stylesheet`, `info`, `pict`, any `\*` destination) are
  * skipped wholesale, `\par`/`\line` become newlines, `\tab` a tab,
  * `\'hh` decodes CP1252 bytes and `\uN` decodes unicode code units
  * (with the following fallback character skipped per spec).
  */
object RtfText {

  private val SkipDestinations = Set("fonttbl", "colortbl", "stylesheet",
    "info", "pict", "header", "footer", "generator", "themedata",
    "colorschememapping", "latentstyles", "datastore", "operator")

  def extract(bytes: Array[Byte], maxLen: Int): String = {
    val s = new String(bytes, java.nio.charset.Charset.forName("windows-1252"))
    require(s.startsWith("{\\rtf"), "not an RTF document")
    val out = new Bounded(maxLen)
    var i = 0
    val n = s.length
    var skipDepth = -1 // depth at which a skipped destination started
    var depth = 0
    var groupStart = false // just entered a group: next token may name a destination
    var pendingUnicodeSkip = 0
    while (i < n && !out.isFull) {
      val c = s.charAt(i)
      c match {
        case '{' => depth += 1; groupStart = true; i += 1
        case '}' =>
          if (skipDepth >= 0 && depth == skipDepth) skipDepth = -1
          depth -= 1; groupStart = false; i += 1
        case '\\' if i + 1 < n =>
          val next = s.charAt(i + 1)
          if (next == '\'') { // \'hh — CP1252 byte
            if (i + 3 < n) {
              if (skipDepth < 0) {
                try {
                  val b = Integer.parseInt(s.substring(i + 2, i + 4), 16)
                  if (pendingUnicodeSkip > 0) pendingUnicodeSkip -= 1
                  else out.append(new String(Array(b.toByte),
                    java.nio.charset.Charset.forName("windows-1252")))
                } catch { case _: NumberFormatException => }
              }
              i += 4
            } else i = n
          } else if (next == '*') { // \* — optional destination: skip group
            if (skipDepth < 0) skipDepth = depth
            i += 2
          } else if (!Character.isLetter(next)) { // escaped char \\ \{ \}
            if (skipDepth < 0) {
              if (pendingUnicodeSkip > 0) pendingUnicodeSkip -= 1
              else next match {
                case '\\' | '{' | '}' => out.append(next)
                case '~'              => out.append(' ') // non-breaking space
                case '\r' | '\n'      => out.append('\n') // \<newline> = \par
                case _                =>
              }
            }
            i += 2
          } else { // control word
            var j = i + 1
            while (j < n && Character.isLetter(s.charAt(j))) j += 1
            val word = s.substring(i + 1, j)
            var numStart = j
            if (j < n && (s.charAt(j) == '-' || Character.isDigit(s.charAt(j)))) {
              j += 1
              while (j < n && Character.isDigit(s.charAt(j))) j += 1
            }
            val param = if (j > numStart) s.substring(numStart, j) else ""
            if (j < n && s.charAt(j) == ' ') j += 1 // delimiter space consumed
            if (groupStart && SkipDestinations.contains(word) && skipDepth < 0)
              skipDepth = depth
            else if (skipDepth < 0) word match {
              case "par" | "line" | "sect" | "page" => out.append('\n')
              case "tab" | "cell"                   => out.append('\t')
              case "row"                            => out.append('\n')
              case "u" => // \uN — signed 16-bit unicode code unit
                try {
                  val cp = param.toInt
                  out.append((if (cp < 0) cp + 65536 else cp).toChar)
                  pendingUnicodeSkip = 1 // skip the fallback char
                } catch { case _: NumberFormatException => }
              case _ => // formatting word: ignore
            }
            groupStart = false
            i = j
          }
        case '\r' | '\n' => i += 1 // raw newlines are not document text
        case _ =>
          if (skipDepth < 0) {
            if (pendingUnicodeSkip > 0) pendingUnicodeSkip -= 1
            else out.append(c)
          }
          groupStart = false
          i += 1
      }
    }
    out.result().trim
  }
}
