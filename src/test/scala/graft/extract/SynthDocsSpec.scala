package graft.extract

import org.scalatest.funsuite.AnyFunSuite

/** The synthetic extraction corpus's contract: every generated format
  * detects to its real MIME type and extracts EXACTLY the planted
  * text — the property the extraction ladder and q_extract_synth's
  * analytic oracle rest on.
  */
class SynthDocsSpec extends AnyFunSuite {

  test("each format extracts exactly the planted text") {
    val mimes = Map(
      "pdf" -> MimeDetect.Pdf, "docx" -> MimeDetect.Docx,
      "odt" -> MimeDetect.Odt, "html" -> MimeDetect.Html,
      "txt" -> MimeDetect.Text)
    for (i <- 0L until 10L) {
      val fmt = SynthDocs.formatFor(i)
      val r = TextExtractor.extract(SynthDocs.bytesFor(i), SynthDocs.fileName(i))
      assert(r.error == null, s"doc $i ($fmt): error=${r.error}")
      assert(r.origMimeType == mimes(fmt), s"doc $i ($fmt): ${r.origMimeType}")
      assert(r.text == SynthDocs.expectedText(i),
        s"doc $i ($fmt): '${r.text.take(80)}' != '${SynthDocs.expectedText(i).take(80)}'")
    }
  }

  test("bytes are deterministic across calls") {
    for (i <- 0L until 5L)
      assert(SynthDocs.bytesFor(i).toSeq == SynthDocs.bytesFor(i).toSeq)
  }
}
