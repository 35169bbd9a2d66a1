package graft.extract

import java.util.zip.Inflater

/** Plain-text extraction from PDF content streams, built directly on the
  * public PDF 1.x syntax (ISO 32000): walks `stream…endstream` spans,
  * inflates `/FlateDecode` data (java.util.zip), evaluates the text
  * operators `Tj`, `'`, `"`, `TJ`, and decodes CID-font hex strings
  * through the document's embedded ToUnicode CMaps
  * (`beginbfchar`/`beginbfrange` sections).
  *
  * Mirrors the observable behavior of the reference's
  * `tika.parseToString` path (ExtractTextProcessor.java:174-175) for its
  * PDF fixtures: whitespace layout is heuristic (as in any text
  * extractor), so tests assert trimmed prefixes and lengths, exactly as
  * the reference's own tests do (ExtractTextProcessorTest.java:68-69).
  *
  * Non-text streams (ICC profiles, XMP, fonts — big.pdf carries 79
  * streams) are rejected by a binary-noise guard rather than by chasing
  * the page tree: tolerant of malformed xref tables, single pass, no
  * random access — the shape that streams well inside a Spark UDF.
  */
object PdfText {

  def extract(bytes: Array[Byte], maxLen: Int): String = {
    val streams = decodeStreams(bytes)
    val cmap = glyphMap(streams)
    val out = new Bounded(maxLen)
    val it = streams.iterator
    while (!out.isFull && it.hasNext) {
      val data = it.next()
      if (looksLikeContent(data)) extractOps(data, out, cmap)
    }
    out.result().trim
  }

  /** Code → unicode for CID hex strings: ToUnicode CMaps first (the
    * authoritative source when present), then inverted `cmap` tables of
    * embedded TrueType fonts — the public fallback for Identity-H
    * fonts that ship no ToUnicode (common in CJK/multilingual PDFs;
    * Tika/PDFBox read the same font table). Identity-H means the
    * 2-byte codes ARE glyph ids, so gid→unicode from the font's own
    * unicode cmap recovers the text exactly. */
  private def glyphMap(streams: List[Array[Byte]]): Map[Int, String] = {
    val fromFonts = parseFontCmaps(streams)
    if (fromFonts.isEmpty) parseCMaps(streams)
    else fromFonts ++ parseCMaps(streams) // ToUnicode entries win
  }

  /** Per-CONTENT-STREAM text segments — the page approximation behind
    * the XHTML renderer's `<div class="page">` wrappers (Tika emits one
    * div per page; a PDF page's `/Contents` is one stream, or several
    * concatenated, so stream boundaries are page boundaries for the
    * overwhelming single-stream-per-page case without a page-tree
    * resolution pass). Concatenating the segments with newlines yields
    * the same text [[extract]] produces, under the same max-length
    * early-stop contract. */
  def extractPages(bytes: Array[Byte], maxLen: Int): List[String] = {
    val streams = decodeStreams(bytes)
    val cmap = glyphMap(streams)
    // ONE shared Bounded — the budget counts exactly the chars
    // [[extract]] counts (raw, untrimmed), so both paths stop at the
    // same point; pages are the per-stream slices of that one buffer
    val out = new Bounded(maxLen)
    val cuts = new scala.collection.mutable.ListBuffer[Int]
    val it = streams.iterator
    while (!out.isFull && it.hasNext) {
      val data = it.next()
      if (looksLikeContent(data)) {
        extractOps(data, out, cmap)
        cuts += out.length
      }
    }
    val full = out.result()
    var prev = 0
    cuts.toList.flatMap { end =>
      val seg = full.substring(prev, end).trim
      prev = end
      if (seg.nonEmpty) Some(seg) else None
    }
  }

  /** All decodable stream bodies, in document order. */
  private def decodeStreams(bytes: Array[Byte]): List[Array[Byte]] =
    rawStreams(bytes).map(_._2)

  /** Inflated bodies of `/ObjStm` (PDF 1.5+ compressed object) streams
    * as latin-1 text — where writers that compress the xref park the
    * `/Info` dictionary. Text extraction ignores these (object streams
    * hold serialized dictionaries, not content); [[Metadata]] scans
    * them for Info keys the raw-byte regex can't see. */
  private[extract] def objectStreamText(bytes: Array[Byte]): String =
    rawStreams(bytes).collect {
      case (dict, data) if dict.contains("/ObjStm") =>
        new String(data, java.nio.charset.StandardCharsets.ISO_8859_1)
    }.mkString("\n")

  /** (dictionary-text, decoded body) of every stream object. Encrypted
    * documents (standard security, empty user password — [[PdfCrypt]])
    * are transparently decrypted per object BEFORE filter decode
    * (writers compress then encrypt, so readers decrypt then inflate).
    * Cross-reference streams are never encrypted (ISO 32000 §7.5.8.2),
    * nor is the XMP metadata stream when `/EncryptMetadata false`. */
  private def rawStreams(bytes: Array[Byte]): List[(String, Array[Byte])] = {
    val dec = PdfCrypt.decryptor(bytes)
    val acc = new scala.collection.mutable.ListBuffer[(String, Array[Byte])]
    var from = 0
    while (from < bytes.length) {
      val s = indexOf(bytes, StreamKw, from)
      if (s < 0) from = bytes.length
      else {
        val e = indexOf(bytes, EndstreamKw, s)
        if (e < 0) from = bytes.length
        else {
          val dictStart = math.max(lastIndexOf(bytes, ObjKw, s), 0)
          val dict = ascii(bytes, dictStart, s)
          var dataStart = s + StreamKw.length
          if (dataStart < bytes.length && bytes(dataStart) == '\r') dataStart += 1
          if (dataStart < bytes.length && bytes(dataStart) == '\n') dataStart += 1
          var raw = java.util.Arrays.copyOfRange(bytes, dataStart, e)
          dec match {
            case Some(d) if !dict.contains("/XRef") &&
                (d.encryptMetadata || !dict.contains("/Metadata")) =>
              objGen(bytes, dictStart) match {
                case Some((num, gen)) => raw = d.decrypt(num, gen, raw)
                case None             => // no parseable header: leave as-is
              }
            case _ =>
          }
          val data =
            if (dict.contains("/FlateDecode")) inflate(raw)
            else if (dict.contains("Decode")) null // other filters: not text
            else raw
          if (data != null && data.nonEmpty) acc += ((dict, data))
          from = e + EndstreamKw.length
        }
      }
    }
    acc.toList
  }

  /** Parse the `N G` of an `N G obj` header by walking back from the
    * `obj` keyword at `objPos`; `None` when the match was actually the
    * tail of `endobj` or otherwise not a header. */
  private def objGen(bytes: Array[Byte], objPos: Int): Option[(Int, Int)] = {
    def digitsBack(end: Int): Option[(Int, Int)] = { // (value, startIdx)
      var i = end
      while (i > 0 && bytes(i - 1) >= '0' && bytes(i - 1) <= '9') i -= 1
      if (i == end) None
      else Some((ascii(bytes, i, end).toInt, i))
    }
    def wsBack(end: Int): Int = {
      var i = end
      while (i > 0 && (bytes(i - 1) == ' ' || bytes(i - 1) == '\r' ||
        bytes(i - 1) == '\n' || bytes(i - 1) == '\t')) i -= 1
      i
    }
    for {
      (gen, gs) <- digitsBack(wsBack(objPos))
      (num, _)  <- digitsBack(wsBack(gs))
    } yield (num, gen)
  }

  private val StreamKw = "stream".getBytes
  private val EndstreamKw = "endstream".getBytes
  private val ObjKw = "obj".getBytes

  // ---- ToUnicode CMap ------------------------------------------------

  /** Merged glyph-code → unicode map from every embedded ToUnicode CMap.
    * Font subsets in one document use disjoint-or-consistent code points
    * in practice, so a merged map avoids a full page-tree/resource-dict
    * resolution pass (we keep a single streaming scan).
    */
  private def parseCMaps(streams: List[Array[Byte]]): Map[Int, String] = {
    val out = scala.collection.mutable.HashMap[Int, String]()
    streams.foreach { data =>
      if (containsAscii(data, "beginbfchar") || containsAscii(data, "beginbfrange")) {
        val txt = ascii(data, 0, data.length)
        parseBfChar(txt, out)
        parseBfRange(txt, out)
      }
    }
    out.toMap
  }

  private val BfCharSection = java.util.regex.Pattern.compile(
    "beginbfchar(.*?)endbfchar", java.util.regex.Pattern.DOTALL)
  private val BfRangeSection = java.util.regex.Pattern.compile(
    "beginbfrange(.*?)endbfrange", java.util.regex.Pattern.DOTALL)
  private val HexPair = java.util.regex.Pattern.compile(
    "<([0-9a-fA-F]+)>\\s*<([0-9a-fA-F]+)>")
  private val RangeEntry = java.util.regex.Pattern.compile(
    "<([0-9a-fA-F]+)>\\s*<([0-9a-fA-F]+)>\\s*(<[0-9a-fA-F]+>|\\[[^\\]]*\\])")

  private def parseBfChar(txt: String, out: scala.collection.mutable.HashMap[Int, String]): Unit = {
    val sec = BfCharSection.matcher(txt)
    while (sec.find()) {
      val m = HexPair.matcher(sec.group(1))
      while (m.find()) {
        val code = Integer.parseInt(m.group(1), 16)
        out(code) = utf16be(m.group(2))
      }
    }
  }

  private def parseBfRange(txt: String, out: scala.collection.mutable.HashMap[Int, String]): Unit = {
    val sec = BfRangeSection.matcher(txt)
    while (sec.find()) {
      val m = RangeEntry.matcher(sec.group(1))
      while (m.find()) {
        val lo = Integer.parseInt(m.group(1), 16)
        val hi = Integer.parseInt(m.group(2), 16)
        val dst = m.group(3)
        if (hi - lo <= 65535) {
          if (dst.startsWith("<")) {
            val base = Integer.parseInt(dst.substring(1, dst.length - 1).take(8), 16)
            var c = lo
            while (c <= hi) { out(c) = utf16beFromCode(base + (c - lo)); c += 1 }
          } else { // array form: [<d1> <d2> …], one dst per code
            val items = "<([0-9a-fA-F]+)>".r.findAllMatchIn(dst).map(_.group(1)).toArray
            var k = 0
            while (k < items.length && lo + k <= hi) {
              out(lo + k) = utf16be(items(k)); k += 1
            }
          }
        }
      }
    }
  }

  /** Hex digits (multiple of 4) → UTF-16BE string. */
  private def utf16be(hex: String): String = {
    val sb = new java.lang.StringBuilder(hex.length / 4)
    var i = 0
    while (i + 4 <= hex.length) {
      sb.append(Integer.parseInt(hex.substring(i, i + 4), 16).toChar)
      i += 4
    }
    sb.toString
  }

  private def utf16beFromCode(code: Int): String =
    if (Character.isValidCodePoint(code)) new String(Character.toChars(code)) else ""

  // ---- embedded TrueType cmap (gid → unicode) ------------------------

  /** Inverted unicode cmaps of every embedded TrueType font
    * (`/FontFile2` stream bodies — recognizable by the sfnt magic, no
    * dict needed). Only the format-4 BMP subtable is read (the one
    * every subsetter emits); the inversion keeps the FIRST codepoint
    * per glyph (ligature/duplicate mappings pick the lowest). */
  private def parseFontCmaps(streams: List[Array[Byte]]): Map[Int, String] = {
    val out = scala.collection.mutable.HashMap[Int, String]()
    streams.foreach { data =>
      if (data.length > 12 && u32(data, 0) == 0x00010000L)
        try invertCmap(data, out)
        catch { case _: Exception => } // malformed font: ignore
    }
    out.toMap
  }

  private def invertCmap(f: Array[Byte], out: scala.collection.mutable.HashMap[Int, String]): Unit = {
    val numTables = u16(f, 4)
    var rec = 12
    var cmapOff = -1
    var t = 0
    while (t < numTables && rec + 16 <= f.length) {
      if (ascii(f, rec, rec + 4) == "cmap") cmapOff = u32(f, rec + 8).toInt
      rec += 16; t += 1
    }
    if (cmapOff < 0 || cmapOff + 4 > f.length) return
    val n = u16(f, cmapOff + 2)
    var best = -1
    var i = 0
    while (i < n && cmapOff + 4 + i * 8 + 8 <= f.length) {
      val base = cmapOff + 4 + i * 8
      val platform = u16(f, base)
      val encoding = u16(f, base + 2)
      val off = cmapOff + u32(f, base + 4).toInt
      // Windows/Unicode-BMP (3,1) preferred; Unicode platform (0,_) ok
      if (off + 2 <= f.length && u16(f, off) == 4 &&
          (best < 0 || (platform == 3 && encoding == 1))) best = off
      i += 1
    }
    if (best < 0) return
    val segX2 = u16(f, best + 6)
    val segs = segX2 / 2
    val endA = best + 14
    val startA = endA + segX2 + 2
    val deltaA = startA + segX2
    val rangeA = deltaA + segX2
    var s = 0
    while (s < segs) {
      val end = u16(f, endA + s * 2)
      val start = u16(f, startA + s * 2)
      val delta = u16(f, deltaA + s * 2)
      val ro = u16(f, rangeA + s * 2)
      if (start != 0xffff) {
        var c = start
        while (c <= end && c != 0x10000) {
          val gid =
            if (ro == 0) (c + delta) & 0xffff
            else {
              val gi = rangeA + s * 2 + ro + (c - start) * 2
              if (gi + 2 <= f.length) {
                val g = u16(f, gi)
                if (g == 0) 0 else (g + delta) & 0xffff
              } else 0
            }
          if (gid != 0 && !out.contains(gid))
            out(gid) = String.valueOf(c.toChar)
          c += 1
        }
      }
      s += 1
    }
  }

  private def u16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def u32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  // ---- content-stream heuristics ------------------------------------

  /** Content streams are operator soup — mostly printable ASCII with
    * BT/ET text blocks. Require a text operator and low binary ratio. */
  private def looksLikeContent(data: Array[Byte]): Boolean = {
    val n = math.min(data.length, 4096)
    if (n == 0) return false
    var bin = 0
    var i = 0
    while (i < n) {
      val b = data(i) & 0xff
      if (b == 0 || (b < 0x09) || (b > 0x0d && b < 0x20)) bin += 1
      i += 1
    }
    if (bin.toDouble / n > 0.05) return false
    val txt = ascii(data, 0, math.min(data.length, 1 << 16))
    txt.contains("BT") && (txt.contains("Tj") || txt.contains("TJ"))
  }

  /** Single-pass operand-stack evaluation of the text-showing operators. */
  private def extractOps(data: Array[Byte], out: Bounded, cmap: Map[Int, String]): Unit = {
    var i = 0
    val n = data.length
    val pending = new java.util.ArrayList[String]()
    var inArray = false
    var lastKern = 0.0

    def emitLine(): Unit = {
      var k = 0
      while (k < pending.size()) { out.append(pending.get(k)); k += 1 }
      pending.clear()
      out.append('\n')
    }
    def gap(): Unit =
      if (inArray && lastKern < -180.0 && !pending.isEmpty) pending.add(" ")

    while (i < n && !out.isFull) {
      val c = data(i) & 0xff
      c match {
        case '(' =>
          val (str, next) = literalString(data, i)
          gap(); pending.add(str); lastKern = 0.0
          i = next
        case '<' if i + 1 < n && (data(i + 1) & 0xff) != '<' =>
          val (str, next) = hexString(data, i, cmap)
          gap(); if (str.nonEmpty) pending.add(str); lastKern = 0.0
          i = next
        case '[' => inArray = true; lastKern = 0.0; i += 1
        case ']' => inArray = false; i += 1
        case '%' => // comment to EOL
          while (i < n && data(i) != '\n' && data(i) != '\r') i += 1
        case _ if c == '-' || c == '.' || (c >= '0' && c <= '9') =>
          val start = i
          i += 1
          while (i < n && { val b = data(i) & 0xff; b == '.' || (b >= '0' && b <= '9') }) i += 1
          if (inArray) {
            try lastKern = java.lang.Double.parseDouble(ascii(data, start, i))
            catch { case _: NumberFormatException => }
          }
        case _ if isRegular(c) =>
          val start = i
          i += 1
          while (i < n && isRegular(data(i) & 0xff)) i += 1
          ascii(data, start, i) match {
            case "Tj" | "'" | "\"" | "TJ" => emitLine()
            case "ET"                     => pending.clear() // unconsumed operands
            case _                        => // positioning/graphics ops
          }
        case _ => i += 1
      }
    }
  }

  /** PDF literal string: nested parens, backslash escapes, octal codes. */
  private[extract] def literalString(data: Array[Byte], open: Int): (String, Int) = {
    val sb = new java.lang.StringBuilder()
    var i = open + 1
    var depth = 1
    val n = data.length
    while (i < n && depth > 0) {
      val c = data(i) & 0xff
      c match {
        case '\\' if i + 1 < n =>
          val e = data(i + 1) & 0xff
          e match {
            case 'n'  => sb.append('\n'); i += 2
            case 'r'  => sb.append('\r'); i += 2
            case 't'  => sb.append('\t'); i += 2
            case 'b'  => sb.append('\b'); i += 2
            case 'f'  => sb.append('\f'); i += 2
            case '('  => sb.append('('); i += 2
            case ')'  => sb.append(')'); i += 2
            case '\\' => sb.append('\\'); i += 2
            case '\r' => i += 2; if (i < n && data(i) == '\n') i += 1 // continuation
            case '\n' => i += 2
            case d if d >= '0' && d <= '7' =>
              var v = 0; var k = 0; i += 1
              while (k < 3 && i < n && data(i) >= '0' && data(i) <= '7') {
                v = v * 8 + (data(i) - '0'); i += 1; k += 1
              }
              sb.append((v & 0xff).toChar)
            case other => sb.append(other.toChar); i += 2
          }
        case '(' => depth += 1; sb.append('('); i += 1
        case ')' =>
          depth -= 1
          if (depth > 0) sb.append(')')
          i += 1
        case _ => sb.append(c.toChar); i += 1
      }
    }
    (sb.toString, i)
  }

  /** PDF hex string: 2-byte CID codes through the ToUnicode map when one
    * exists; Latin-1 single bytes otherwise (with a printability guard,
    * since unmapped glyph IDs are noise, not text). */
  private def hexString(data: Array[Byte], open: Int, cmap: Map[Int, String]): (String, Int) = {
    val hex = new java.lang.StringBuilder()
    var i = open + 1
    val n = data.length
    while (i < n && data(i) != '>') {
      val c = data(i) & 0xff
      if (Character.digit(c, 16) >= 0) hex.append(c.toChar)
      i += 1
    }
    val end = if (i < n) i + 1 else i
    val h = hex.toString
    if (cmap.nonEmpty && h.length % 4 == 0 && h.nonEmpty) {
      val sb = new java.lang.StringBuilder(h.length / 4)
      var mapped = 0
      var k = 0
      while (k + 4 <= h.length) {
        val code = Integer.parseInt(h.substring(k, k + 4), 16)
        cmap.get(code) match {
          case Some(s) => sb.append(s); mapped += 1
          case None    => // unmapped glyph: drop
        }
        k += 4
      }
      val codes = h.length / 4
      if (mapped * 2 >= codes) (sb.toString, end)
      else (latin1Printable(h), end)
    } else (latin1Printable(h), end)
  }

  private def latin1Printable(hexDigits: String): String = {
    val sb = new java.lang.StringBuilder(hexDigits.length / 2)
    var i = 0
    var printable = 0
    while (i + 2 <= hexDigits.length) {
      val v = Integer.parseInt(hexDigits.substring(i, i + 2), 16)
      sb.append(v.toChar)
      if (v >= 0x20 && v < 0x7f) printable += 1
      i += 2
    }
    val s = sb.toString
    if (s.isEmpty || printable.toDouble / s.length <= 0.8) "" else s
  }

  private def isRegular(c: Int): Boolean =
    (c > 0x20 &&
      c != '(' && c != ')' && c != '<' && c != '>' && c != '[' && c != ']' &&
      c != '{' && c != '}' && c != '/' && c != '%')

  private def inflate(raw: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    try {
      inf.setInput(raw)
      val out = new java.io.ByteArrayOutputStream(math.max(raw.length * 4, 1024))
      val buf = new Array[Byte](8192)
      while (!inf.finished() && !inf.needsDictionary()) {
        val k = inf.inflate(buf)
        if (k == 0 && inf.needsInput()) return out.toByteArray // truncated
        out.write(buf, 0, k)
      }
      out.toByteArray
    } catch {
      case _: Exception => null
    } finally inf.end()
  }

  private def containsAscii(data: Array[Byte], needle: String): Boolean =
    indexOf(data, needle.getBytes, 0) >= 0

  private def ascii(b: Array[Byte], from: Int, until: Int): String =
    new String(b, from, until - from, java.nio.charset.StandardCharsets.ISO_8859_1)

  private def indexOf(hay: Array[Byte], needle: Array[Byte], from: Int): Int = {
    var i = math.max(from, 0)
    val limit = hay.length - needle.length
    while (i <= limit) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }

  private def lastIndexOf(hay: Array[Byte], needle: Array[Byte], before: Int): Int = {
    var i = math.min(before, hay.length) - needle.length
    while (i >= 0) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i -= 1
    }
    -1
  }
}
