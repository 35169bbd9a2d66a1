package graft.extract

import org.scalatest.funsuite.AnyFunSuite

/** Encrypted-PDF (ISO 32000 §7.6 standard security) round trips: the
  * writer side ([[SecuredPdf]]) and reader side ([[PdfCrypt]] +
  * [[PdfText]]) share only the spec algorithms; key-derivation hex is
  * additionally pinned so a change in either side trips visibly rather
  * than canceling out. */
class PdfCryptSpec extends AnyFunSuite {

  test("RC4-128 (V2/R3) secured PDF extracts through decrypt→inflate") {
    val bytes = SecuredPdf.securedRc4()
    assert(PdfCrypt.decryptor(bytes).isDefined)
    assert(PdfText.extract(bytes, 4096) == SecuredPdf.Rc4Text)
  }

  test("AES-V2 (V4/R4) secured PDF extracts with IV-prefixed CBC body") {
    val bytes = SecuredPdf.securedAes()
    val d = PdfCrypt.decryptor(bytes)
    assert(d.isDefined && d.get.aes)
    assert(PdfText.extract(bytes, 4096) == SecuredPdf.AesText)
  }

  test("encrypted Info strings decrypt through the Info object's key") {
    val rc4 = Metadata.extract(SecuredPdf.securedRc4(), "secured_rc4.pdf")
    assert(rc4("Title") == SecuredPdf.Rc4Title)
    assert(rc4("Author") == "graft")
    assert(rc4("Content-Type") == "application/pdf")
    val aes = Metadata.extract(SecuredPdf.securedAes(), "secured_aes.pdf")
    assert(aes("Title") == SecuredPdf.AesTitle)
    assert(aes("Author") == "graft")
  }

  test("AES-256 (V5/R6) secured PDF extracts via the hardened hash path") {
    val bytes = SecuredPdf.securedAes256()
    val d = PdfCrypt.decryptor(bytes)
    assert(d.isDefined && d.get.v5 && d.get.fileKey.length == 32)
    assert(PdfText.extract(bytes, 4096) == SecuredPdf.AesV5Text)
    val m = Metadata.extract(bytes, "secured_aes256.pdf")
    assert(m("Title") == SecuredPdf.AesV5Title && m("Author") == "graft")
  }

  test("R6 hash pins: validation hash and wrapped key are stable") {
    def hex(b: Array[Byte]) = b.map(x => f"${x & 0xff}%02x").mkString
    val vSalt = (0 until 8).map(i => ((i * 29 + 5) & 0xff).toByte).toArray
    val h = PdfCrypt.hash2B(Array.empty, vSalt, Array.empty)
    assert(h.length == 32)
    // pinned from first correct run (regression guard; the round trip
    // through a V5 document is the behavioral check above)
    assert(hex(h) == PinR6Hash, s"R6 hash drifted: ${hex(h)}")
  }

  test("non-empty user password is rejected (no silent garbage)") {
    // flip one bit of /U in the RC4 fixture → password check must fail
    val bytes = SecuredPdf.securedRc4()
    val text = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    val ui = text.indexOf("/U <") + 4
    val corrupted = bytes.clone()
    corrupted(ui) = (if (bytes(ui) == '0') '1' else '0').toByte
    assert(PdfCrypt.decryptor(corrupted).isEmpty)
    // and the binary-noise guard keeps the un-decrypted stream out
    assert(PdfText.extract(corrupted, 4096).isEmpty)
  }

  test("malformed /Encrypt structures never throw (degrade to None/empty)") {
    val rng = new scala.util.Random(42) // deterministic
    val base = SecuredPdf.securedRc4()
    for (trial <- 0 until 50) {
      val mutated = base.clone()
      // flip a handful of bytes anywhere in the document
      for (_ <- 0 to trial % 7)
        mutated(rng.nextInt(mutated.length)) = rng.nextInt(256).toByte
      // must not throw — any outcome from garbage-in is acceptable
      PdfCrypt.decryptor(mutated)
      PdfText.extract(mutated, 2048)
      Metadata.extract(mutated, "m.pdf")
    }
    // truncations across the interesting boundaries
    for (len <- Seq(0, 1, 7, 64, base.length / 2, base.length - 3)) {
      val cut = java.util.Arrays.copyOf(base, len)
      PdfCrypt.decryptor(cut)
      PdfText.extract(cut, 2048)
    }
    // an /Encrypt ref pointing at a missing object
    val dangling = ("%PDF-1.4\ntrailer << /Root 1 0 R /Encrypt 99 0 R " +
      "/ID [<00112233445566778899aabbccddeeff>] >>").getBytes("ISO-8859-1")
    assert(PdfCrypt.decryptor(dangling).isEmpty)
  }

  test("unencrypted PDFs are untouched (no /Encrypt → None, fast path)") {
    val plain = ("%PDF-1.4\n1 0 obj << /Length 40 >> stream\n" +
      "BT /F1 12 Tf (Plain text here.) Tj ET\nendstream endobj\n" +
      "trailer << /Root 1 0 R >>\n%%EOF").getBytes("ISO-8859-1")
    assert(PdfCrypt.decryptor(plain).isEmpty)
    assert(PdfText.extract(plain, 4096) == "Plain text here.")
  }

  test("key-derivation pins: O, file key, U for empty/empty R3-128") {
    def hex(b: Array[Byte]) = b.map(x => f"${x & 0xff}%02x").mkString
    val id = (0 until 16).map(i => ((i * 37 + 11) & 0xff).toByte).toArray
    val o = PdfCrypt.computeO(Array.empty, Array.empty, r = 3, n = 16)
    val key = PdfCrypt.fileKey(Array.empty, o, -3904, id, r = 3, n = 16,
      encryptMetadata = true)
    val u = PdfCrypt.computeU(key, r = 3, id)
    // algorithm-2/3/5 outputs are deterministic functions of the spec
    // constants; pinned from first correct run (regression guard, not
    // an independent oracle — independence comes from the spec text)
    assert(o.length == 32 && u.length == 32 && key.length == 16)
    assert(hex(o) == PinO, s"O drifted: ${hex(o)}")
    assert(hex(key) == PinKey, s"file key drifted: ${hex(key)}")
    assert(hex(u.take(16)) == PinU16, s"U drifted: ${hex(u.take(16))}")
  }

  // first-run pins (see test above)
  private val PinO =
    "36451bd39d753b7c1d10922c28e6665aa4f3353fb0348b536893e3b1db5c579b"
  private val PinKey = "9fa5c69229f17c186fa9cab1bdd03905"
  private val PinU16 = "35c4af661ee9b9572a44d95d0dfd4e1c"
  private val PinR6Hash =
    "4466d000c15c7ae7d5c08956bb9ff29e3342c9945e51fe2809de144b0beae493"
}

/** Identity-H without ToUnicode: glyph ids resolve through the
  * embedded font's inverted format-4 cmap. */
class CidFontSpec extends AnyFunSuite {
  test("Identity-H hex codes decode via embedded TrueType cmap") {
    val bytes = CidFontPdf.sample()
    assert(PdfText.extract(bytes, 4096) == CidFontPdf.Text)
  }

  test("without the font table the same codes stay out (noise guard)") {
    val bytes = CidFontPdf.sample()
    // strip the FontFile2 stream: blank the sfnt magic so the font is
    // not recognized; extraction must yield nothing, not garbage
    val text = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    val fontObj = text.indexOf("8 0 obj")
    val sIdx = text.indexOf("stream", fontObj) + "stream\n".length
    val corrupted = bytes.clone()
    corrupted(sIdx) = 0x7f.toByte
    assert(PdfText.extract(corrupted, 4096).isEmpty)
  }
}
