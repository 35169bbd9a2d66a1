package graft.extract

import org.scalatest.funsuite.AnyFunSuite

/** ODF / EPUB / EML extraction against the deterministic synthetic
  * fixtures (OpenDocFixtures — built from the public ODF 1.2, EPUB
  * OCF/OPF, and RFC 5322/2045/2046/2047 structure).
  */
class OpenDocSpec extends AnyFunSuite {

  test("odt: headings, paragraphs, text:s runs, tabs and line breaks") {
    val r = TextExtractor.extract(OpenDocFixtures.sampleOdt(), "report.odt")
    assert(r.error == null, s"error=${r.error}")
    assert(r.origMimeType == MimeDetect.Odt)
    assert(r.text ==
      "Annual Report\nRevenue grew  fast in fiscal 2020.\nNorth\t1500.25\nSouth\t42")
  }

  test("ods: cells tab-separated, rows newline-separated") {
    val r = TextExtractor.extract(OpenDocFixtures.sampleOds(), "sheet.ods")
    assert(r.error == null, s"error=${r.error}")
    assert(r.origMimeType == MimeDetect.Ods)
    assert(r.text == "Region\tUnits\tPrice\nwest\t7\t19.99")
  }

  test("odp: slide text frames in document order") {
    val r = TextExtractor.extract(OpenDocFixtures.sampleOdp(), "deck.odp")
    assert(r.error == null, s"error=${r.error}")
    assert(r.origMimeType == MimeDetect.Odp)
    assert(r.text == "Roadmap 2020\nFirst milestone\nClosing slide")
  }

  test("epub: chapters follow the OPF spine, not archive order") {
    // the fixture zip stores ch2 BEFORE ch1; the spine says ch1, ch2
    val r = TextExtractor.extract(OpenDocFixtures.sampleEpub(), "book.epub")
    assert(r.error == null, s"error=${r.error}")
    assert(r.origMimeType == MimeDetect.Epub)
    assert(r.text ==
      "Chapter One\n\nIt began quietly.\n\nChapter Two\n\nThe plot thickens.")
  }

  test("epub without an OPF chain degrades to archive-order content docs") {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    Seq("a.xhtml" -> "<html><body><p>alpha</p></body></html>",
        "b.xhtml" -> "<html><body><p>beta</p></body></html>").foreach {
      case (n, c) =>
        z.putNextEntry(new java.util.zip.ZipEntry(n))
        z.write(c.getBytes("UTF-8")); z.closeEntry()
    }
    z.close()
    assert(EpubText.extract(bos.toByteArray, -1) == "alpha\n\nbeta")
  }

  test("eml: decoded headers + preferred plain part of multipart/alternative") {
    val r = TextExtractor.extract(OpenDocFixtures.sampleEml(), "mail.eml")
    assert(r.error == null, s"error=${r.error}")
    assert(r.origMimeType == MimeDetect.Eml)
    assert(r.text ==
      "Subject: Café reçu — status\n" +
      "From: Ana Lima <ana@example.com>\n" +
      "To: Ops Team <ops@example.com>\n" +
      "Date: Wed, 1 Jan 2020 09:30:00 +0000\n" +
      "\n" +
      "The café order arrived — all 7 crates.\nNext delivery: 2020-02-01.")
  }

  test("eml: base64 body and html-only alternative") {
    val b64 = java.util.Base64.getEncoder.encodeToString(
      "tick tock".getBytes("UTF-8"))
    val eml = ("From: a@example.com\nTo: b@example.com\n" +
      "Content-Type: text/plain; charset=utf-8\n" +
      "Content-Transfer-Encoding: base64\n\n" + b64).getBytes("UTF-8")
    assert(EmlText.extract(eml, -1).endsWith("tick tock"))

    val htmlOnly = ("From: a@example.com\nSubject: hi\n" +
      "Content-Type: multipart/alternative; boundary=zz\n\n" +
      "--zz\nContent-Type: text/html\n\n<p>rich &amp; plain</p>\n--zz--\n")
      .getBytes("UTF-8")
    assert(EmlText.extract(htmlOnly, -1).endsWith("rich & plain"))
  }

  test("mime detection: odf family via the stored mimetype entry; eml via headers") {
    assert(MimeDetect.detect(OpenDocFixtures.sampleOdt(), "x.bin") == MimeDetect.Odt)
    assert(MimeDetect.detect(OpenDocFixtures.sampleOds(), "x.bin") == MimeDetect.Ods)
    assert(MimeDetect.detect(OpenDocFixtures.sampleOdp(), "x.bin") == MimeDetect.Odp)
    assert(MimeDetect.detect(OpenDocFixtures.sampleEpub(), "x.bin") == MimeDetect.Epub)
    assert(MimeDetect.detect(OpenDocFixtures.sampleEml(), "x.bin") == MimeDetect.Eml)
    // html-bodied EMAIL stays an email even though the probe sees <html
    val htmlMail = ("From: a@example.com\nSubject: hi\nDate: now\n" +
      "Content-Type: text/html\n\n<html><body>x</body></html>").getBytes("UTF-8")
    assert(MimeDetect.detect(htmlMail, "m.eml") == MimeDetect.Eml)
    // ordinary prose with one colon line is NOT an email
    val prose = "Note: this is a memo.\nIt has two lines.".getBytes("UTF-8")
    assert(MimeDetect.detect(prose, "memo.txt") == MimeDetect.Text)
  }

  test("all three formats respect the max-length cap") {
    Seq(OpenDocFixtures.sampleOdt() -> "a.odt",
        OpenDocFixtures.sampleEpub() -> "a.epub",
        OpenDocFixtures.sampleEml() -> "a.eml").foreach { case (bytes, name) =>
      val r = TextExtractor.extract(bytes, name, maxLen = 10)
      assert(r.error == null && r.text.length <= 10, s"$name: ${r.text}")
    }
  }
}
