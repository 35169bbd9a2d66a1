package graft.extract

import org.scalatest.funsuite.AnyFunSuite
import java.io.ByteArrayOutputStream
import java.util.zip.{ZipEntry, ZipOutputStream}

/** XLSX/PPTX extraction against minimal synthetic OOXML containers
  * (no binary fixtures exist for these formats in the reference — the
  * zips are built in-test from the public OOXML structure).
  */
class OoxmlSpec extends AnyFunSuite {

  private def zip(entries: (String, String)*): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    entries.foreach { case (name, content) =>
      z.putNextEntry(new ZipEntry(name))
      z.write(content.getBytes("UTF-8"))
      z.closeEntry()
    }
    z.close()
    bos.toByteArray
  }

  private val xlsxBytes = zip(
    "xl/sharedStrings.xml" ->
      """<?xml version="1.0"?>
        |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |<si><t>Name</t></si><si><t>Quarterly Revenue</t></si></sst>""".stripMargin,
    "xl/worksheets/sheet1.xml" ->
      """<?xml version="1.0"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |<sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>
        |<row r="2"><c r="A2"><v>42</v></c><c r="B2"><v>1234.5</v></c></row>
        |</sheetData></worksheet>""".stripMargin)

  private val pptxBytes = zip(
    "ppt/slides/slide1.xml" ->
      """<?xml version="1.0"?>
        |<p:sld xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main"
        |       xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main">
        |<p:txBody><a:p><a:r><a:t>Slide Title</a:t></a:r></a:p>
        |<a:p><a:r><a:t>First bullet</a:t></a:r></a:p></p:txBody></p:sld>""".stripMargin,
    "ppt/slides/slide2.xml" ->
      """<?xml version="1.0"?>
        |<p:sld xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main"
        |       xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main">
        |<p:txBody><a:p><a:r><a:t>Second slide</a:t></a:r></a:p></p:txBody></p:sld>""".stripMargin)

  test("xlsx extracts shared strings and cell values, tab/row separated") {
    val r = TextExtractor.extract(xlsxBytes, "book.xlsx")
    assert(r.error == null, s"error=${r.error}")
    assert(r.origMimeType == MimeDetect.Xlsx)
    assert(r.text == "Name\tQuarterly Revenue\n42\t1234.5")
  }

  test("pptx extracts slide text in slide order") {
    val r = TextExtractor.extract(pptxBytes, "deck.pptx")
    assert(r.error == null, s"error=${r.error}")
    assert(r.origMimeType == MimeDetect.Pptx)
    assert(r.text == "Slide Title\nFirst bullet\nSecond slide")
  }

  test("xlsx respects the max-length cap") {
    val r = TextExtractor.extract(xlsxBytes, "book.xlsx", maxLen = 4)
    assert(r.text.length <= 4)
  }

  test("plain zip with neither sheets nor slides still routes to failure") {
    val junk = zip("data/whatever.bin" -> "not an office doc")
    val r = TextExtractor.extract(junk, "archive.zip")
    assert(r.error != null)
  }

  test("rtf extracts text, skips font/color tables, decodes escapes") {
    val rtf = ("{\\rtf1\\ansi\\deff0{\\fonttbl{\\f0 Times New Roman;}}" +
      "{\\colortbl;\\red0\\green0\\blue0;}" +
      "{\\*\\generator Some Editor 1.0;}" +
      "\\f0\\fs24 Hello \\b bold\\b0  world\\par " +
      "Caf\\'e9 costs \\u8364?5\\par}").getBytes("windows-1252")
    val r = TextExtractor.extract(rtf, "note.rtf")
    assert(r.error == null, s"error=${r.error}")
    assert(r.origMimeType == "application/rtf")
    assert(r.text == "Hello bold world\nCaf\u00e9 costs \u20ac5")
    assert(TextExtractor.extract(rtf, "note.rtf", maxLen = 5).text.length <= 5)
  }
}
