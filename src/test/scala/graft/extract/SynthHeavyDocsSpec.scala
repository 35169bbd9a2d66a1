package graft.extract

import org.scalatest.funsuite.AnyFunSuite

/** The heavy synthetic corpus's contract (VERDICT r17 #3): FlateDecode
  * multi-stream PDFs, OLE2 piece-table .doc and AES-V2 encrypted PDFs
  * each detect to their real MIME type and extract EXACTLY the planted
  * expectation — the property the heavy extraction-ladder rung rests
  * on.
  */
class SynthHeavyDocsSpec extends AnyFunSuite {

  test("each heavy format extracts exactly the planted text") {
    val mimes = Map(
      "pdfz" -> MimeDetect.Pdf, "doc" -> MimeDetect.Doc,
      "pdfenc" -> MimeDetect.Pdf)
    for (i <- 0L until 12L) {
      val fmt = SynthHeavyDocs.formatFor(i)
      val r = TextExtractor.extract(
        SynthHeavyDocs.bytesFor(i), SynthHeavyDocs.fileName(i))
      assert(r.error == null, s"doc $i ($fmt): error=${r.error}")
      assert(r.origMimeType == mimes(fmt), s"doc $i ($fmt): ${r.origMimeType}")
      assert(r.text == SynthHeavyDocs.expectedText(i),
        s"doc $i ($fmt): '${r.text.take(80)}' != " +
          s"'${SynthHeavyDocs.expectedText(i).take(80)}'")
    }
  }

  test("the flate PDFs are genuinely multi-stream and compressed") {
    val bytes = SynthHeavyDocs.bytesFor(0L) // i=0 → pdfz
    val raw = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(raw.sliding("/FlateDecode".length).count(_ == "/FlateDecode") >= 2)
    // planted words must NOT appear in the raw bytes (they are inside
    // deflate streams) — extraction really inflates
    assert(!raw.contains(SynthHeavyDocs.textFor(0L).take(12)))
    assert(PdfText.extractPages(bytes, -1).length > 1) // the big.pdf property
  }

  test("the encrypted PDFs hide the plaintext until decryption") {
    val i = 2L // i=2 → pdfenc
    val raw = new String(SynthHeavyDocs.bytesFor(i),
      java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(!raw.contains(SynthHeavyDocs.textFor(i).take(12)))
  }

  test("bytes are deterministic across calls") {
    for (i <- 0L until 6L)
      assert(SynthHeavyDocs.bytesFor(i).toSeq == SynthHeavyDocs.bytesFor(i).toSeq)
  }
}
