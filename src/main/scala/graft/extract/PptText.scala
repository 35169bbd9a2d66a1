package graft.extract

import java.nio.{ByteBuffer, ByteOrder}

/** Text extraction from legacy PowerPoint (.ppt) files via the public
  * [MS-PPT] spec: the `PowerPoint Document` stream is a tree of
  * records — header `recVerAndInstance` u16 / `recType` u16 / `recLen`
  * i32, containers marked by recVer 0xF — and slide text lives in
  * TextCharsAtom (0x0FA0, UTF-16LE) and TextBytesAtom (0x0FA8, ANSI)
  * leaves. A depth-first walk in file order yields the text in
  * presentation order; PPT's `\r` paragraph marks normalize to `\n`,
  * matching the text shape of the other extractors.
  */
object PptText {

  private val TextCharsAtom = 0x0fa0
  private val TextBytesAtom = 0x0fa8
  private val Cp1252 = java.nio.charset.Charset.forName("windows-1252")

  /** Atom accumulator with an early-stop budget: atoms arrive in
    * document order and the output is their order-preserving join, so
    * once the budget of NORMALIZED characters is met the walk can stop
    * — memory and CPU stay O(maxLen) on a large deck with a small cap,
    * same contract as XlsxText's streaming Bounded. The budget counts
    * post-normalize survivors only (an atom of pure whitespace/control
    * runs contributes nothing), with slack headroom, so capped output
    * is identical to capping the full extraction. */
  private final class Collector(maxChars: Int) {
    val atoms = new scala.collection.mutable.ArrayBuffer[String]
    private var total = 0
    def full: Boolean = maxChars >= 0 && total > maxChars.toLong + 4096
    def add(s: String): Unit = {
      val n = normalize(s)
      if (n.nonEmpty) { atoms += n; total += n.length + 1 }
    }
  }

  def extract(bytes: Array[Byte], maxLen: Int): String = {
    val cf = new Cfb.CompoundFile(bytes)
    val ppt = cf.stream("PowerPoint Document")
      .getOrElse(throw new IllegalArgumentException("ppt: no PowerPoint Document stream"))

    val coll = new Collector(maxLen)
    walk(ppt, 0, ppt.length, coll, depth = 0)
    require(coll.atoms.nonEmpty || ppt.nonEmpty, "ppt: empty document stream")

    val text = coll.atoms.mkString("\n")
    val out = new Bounded(maxLen)
    out.append(text)
    out.result().trim
  }

  private def walk(buf: Array[Byte], from: Int, to: Int,
                   out: Collector, depth: Int): Unit = {
    if (depth > 32) return // malformed nesting guard
    var off = from
    while (off + 8 <= to && !out.full) {
      val verInst = (buf(off) & 0xff) | ((buf(off + 1) & 0xff) << 8)
      val typ = (buf(off + 2) & 0xff) | ((buf(off + 3) & 0xff) << 8)
      val len = ByteBuffer.wrap(buf, off + 4, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
      // subtraction form: `off + 8 + len` overflows Int for a hostile
      // len near MaxValue and would slip past an addition-form guard
      if (len < 0 || len > to - off - 8) return // truncated record: stop
      if ((verInst & 0x0f) == 0x0f) // container: recurse in file order
        walk(buf, off + 8, off + 8 + len, out, depth + 1)
      else if (typ == TextCharsAtom)
        out.add(new String(buf, off + 8, len - (len % 2),
          java.nio.charset.StandardCharsets.UTF_16LE))
      else if (typ == TextBytesAtom)
        out.add(new String(buf, off + 8, len, Cp1252))
      off += 8 + len
    }
  }

  /** `\r` paragraph mark and `\x0b` soft break → `\n`; drop control
    * chars PPT embeds in text runs. */
  private def normalize(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\r' => sb.append('\n')
        case c if c.toInt == 0x0b => sb.append('\n')
        case c if c >= 0x20 || c == '\n' || c == '\t' => sb.append(c)
        case _ =>
      }
      i += 1
    }
    sb.toString.trim
  }
}
