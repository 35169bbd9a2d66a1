package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Mojibake repair gate: double-encoded sequences re-decode, genuine
  * Latin-1 and clean text pass through byte-identical. Inputs are
  * built from explicit code points — several involve invisible C1
  * controls that a literal could silently lose. */
class FixMojibakeSpec extends AnyFunSuite {

  private def fix(s: String): String =
    FixMojibake.repair(UTF8String.fromString(s)).toString

  /** The double-encoding of `s`: its UTF-8 bytes read back as
    * Latin-1 code points. */
  private def broken(s: String): String =
    new String(s.getBytes("UTF-8").map(b => (b & 0xff).toChar))

  test("double-encoded UTF-8 re-decodes one level") {
    assert(fix(broken("café")) == "café")      // cafÃ© → café
    assert(fix(broken("n° 7")) == "n° 7")      // nÂ° → n°
    assert(fix(broken("éè")) == "éè")
    assert(fix(broken("€50")) == "€50")        // 3-byte € survives
    assert(fix(broken("ascii stays")) == "ascii stays")  // ASCII fixpoint
  }

  test("genuine Latin-1 text is untouched (invalid UTF-8 gate)") {
    // Ã + space: bytes C3 20, an illegal continuation → no repair
    assert(fix("Ã la carte") == "Ã la carte")
    // already-clean é: lone E9 is an illegal UTF-8 lead → no repair
    assert(fix("café") == "café")
    // lone °: B0 is a bare continuation byte → no repair
    assert(fix("90° angle") == "90° angle")
  }

  test("ASCII and non-Latin-1 text return the identical object") {
    val ascii = UTF8String.fromString("plain text")
    assert(FixMojibake.repair(ascii) eq ascii)
    val cjk = UTF8String.fromString("日本語") // chars > 0xFF
    assert(FixMojibake.repair(cjk) eq cjk)
  }

  test("overlong and surrogate encodings are rejected by the gate") {
    // C0 80 is an overlong NUL — structurally continuation-correct,
    // so only the overlong check refuses it
    assert(fix("\u00C0\u0080") == "\u00C0\u0080")
    // ED A0 80 is a UTF-8-encoded surrogate (U+D800)
    assert(fix("\u00ED\u00A0\u0080") == "\u00ED\u00A0\u0080")
    // F4 90 80 80 would be U+110000, beyond the Unicode ceiling
    assert(fix("\u00F4\u0090\u0080\u0080") == "\u00F4\u0090\u0080\u0080")
  }
}
