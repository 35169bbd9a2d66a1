package graft.extract

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, ZipEntry, ZipOutputStream}

/** Deterministic OpenDocument / EPUB / EML fixtures for the
  * directory-ingest extraction queries (LegacyOffice-style: synthetic
  * bytes built from the public format specs, so the full extracted
  * text is golden-pinnable). The zips carry a fixed entry timestamp
  * and a STORED first `mimetype` entry exactly as ODF 1.2 §3.3 /
  * EPUB OCF §5.3 require — which is also what MimeDetect reads.
  */
object OpenDocFixtures {

  // fixed in-DOS-range timestamp: bytes are identical across runs
  private val FixedTime = 1577836800000L // 2020-01-01T00:00:00Z

  private def zip(mimetype: Option[String], entries: (String, String)*): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    mimetype.foreach { m =>
      val b = m.getBytes("US-ASCII")
      val e = new ZipEntry("mimetype")
      e.setMethod(ZipEntry.STORED)
      e.setSize(b.length)
      val crc = new CRC32
      crc.update(b)
      e.setCrc(crc.getValue)
      e.setTime(FixedTime)
      z.putNextEntry(e)
      z.write(b)
      z.closeEntry()
    }
    entries.foreach { case (name, content) =>
      val e = new ZipEntry(name)
      e.setTime(FixedTime)
      z.putNextEntry(e)
      z.write(content.getBytes("UTF-8"))
      z.closeEntry()
    }
    z.close()
    bos.toByteArray
  }

  /** ODT: headings + paragraphs with the explicit whitespace marks
    * (`text:s`, `text:tab`, `text:line-break`) the format replaces
    * literal runs with. */
  def sampleOdt(): Array[Byte] = zip(Some(MimeDetect.Odt),
    "content.xml" ->
      """<?xml version="1.0" encoding="UTF-8"?>
        |<office:document-content
        |  xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0"
        |  xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">
        |<office:body><office:text>
        |<text:h text:outline-level="1">Annual Report</text:h>
        |<text:p>Revenue grew<text:s text:c="2"/>fast in fiscal 2020.</text:p>
        |<text:p>North<text:tab/>1500.25<text:line-break/>South<text:tab/>42</text:p>
        |</office:text></office:body></office:document-content>""".stripMargin)

  /** ODS: a 2×3 sheet — cells tab-separated, rows newline-separated. */
  def sampleOds(): Array[Byte] = zip(Some(MimeDetect.Ods),
    "content.xml" ->
      """<?xml version="1.0" encoding="UTF-8"?>
        |<office:document-content
        |  xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0"
        |  xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0"
        |  xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">
        |<office:body><office:spreadsheet>
        |<table:table table:name="Sheet1">
        |<table:table-row>
        |  <table:table-cell><text:p>Region</text:p></table:table-cell>
        |  <table:table-cell><text:p>Units</text:p></table:table-cell>
        |  <table:table-cell><text:p>Price</text:p></table:table-cell>
        |</table:table-row>
        |<table:table-row>
        |  <table:table-cell><text:p>west</text:p></table:table-cell>
        |  <table:table-cell><text:p>7</text:p></table:table-cell>
        |  <table:table-cell><text:p>19.99</text:p></table:table-cell>
        |</table:table-row>
        |</table:table>
        |</office:spreadsheet></office:body></office:document-content>""".stripMargin)

  /** ODP: two slides of text frames in document order. */
  def sampleOdp(): Array[Byte] = zip(Some(MimeDetect.Odp),
    "content.xml" ->
      """<?xml version="1.0" encoding="UTF-8"?>
        |<office:document-content
        |  xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0"
        |  xmlns:draw="urn:oasis:names:tc:opendocument:xmlns:drawing:1.0"
        |  xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">
        |<office:body><office:presentation>
        |<draw:page draw:name="page1">
        |  <draw:frame><draw:text-box><text:p>Roadmap 2020</text:p>
        |  <text:p>First milestone</text:p></draw:text-box></draw:frame>
        |</draw:page>
        |<draw:page draw:name="page2">
        |  <draw:frame><draw:text-box><text:p>Closing slide</text:p></draw:text-box></draw:frame>
        |</draw:page>
        |</office:presentation></office:body></office:document-content>""".stripMargin)

  /** EPUB: the zip stores chapter TWO first — the OPF spine says
    * one-then-two, proving reading order follows the spine, not the
    * archive. */
  def sampleEpub(): Array[Byte] = zip(Some(MimeDetect.Epub),
    "META-INF/container.xml" ->
      """<?xml version="1.0"?>
        |<container xmlns="urn:oasis:names:tc:opendocument:xmlns:container" version="1.0">
        |<rootfiles><rootfile full-path="OEBPS/content.opf"
        |  media-type="application/oebps-package+xml"/></rootfiles>
        |</container>""".stripMargin,
    "OEBPS/ch2.xhtml" ->
      """<html><head><title></title></head>
        |<body><h1>Chapter Two</h1><p>The plot thickens.</p></body></html>""".stripMargin,
    "OEBPS/ch1.xhtml" ->
      """<html><head><title></title></head>
        |<body><h1>Chapter One</h1><p>It began quietly.</p></body></html>""".stripMargin,
    "OEBPS/content.opf" ->
      """<?xml version="1.0"?>
        |<package xmlns="http://www.idpf.org/2007/opf" version="3.0" unique-identifier="id">
        |<manifest>
        |  <item id="c1" href="ch1.xhtml" media-type="application/xhtml+xml"/>
        |  <item id="c2" href="ch2.xhtml" media-type="application/xhtml+xml"/>
        |</manifest>
        |<spine><itemref idref="c1"/><itemref idref="c2"/></spine>
        |</package>""".stripMargin)

  /** EML: multipart/alternative with a quoted-printable text/plain
    * part (preferred) and an html part (ignored), plus an RFC 2047
    * Q-encoded subject. */
  def sampleEml(): Array[Byte] =
    ("""Return-Path: <ana@example.com>
       |From: Ana Lima <ana@example.com>
       |To: Ops Team <ops@example.com>
       |Subject: =?UTF-8?Q?Caf=C3=A9_re=C3=A7u_=E2=80=94_status?=
       |Date: Wed, 1 Jan 2020 09:30:00 +0000
       |MIME-Version: 1.0
       |Content-Type: multipart/alternative; boundary="b42"
       |
       |preamble is ignored
       |--b42
       |Content-Type: text/plain; charset=utf-8
       |Content-Transfer-Encoding: quoted-printable
       |
       |The caf=C3=A9 order arrived =E2=80=94 all 7 crates.
       |Next delivery: 2020-02-01.
       |--b42
       |Content-Type: text/html; charset=utf-8
       |
       |<html><body><p>The café order arrived</p></body></html>
       |--b42--
       |epilogue is ignored
       |""".stripMargin).replace("\n", "\r\n").getBytes("UTF-8")

  /** Writes the five fixtures into `dir` (exact-set sync + atomic
    * per-file writes — see LegacyOffice.syncFixtureDir). */
  def writeFixtures(dir: java.nio.file.Path): Unit =
    LegacyOffice.syncFixtureDir(dir, Map(
      "report.odt" -> sampleOdt(),
      "sheet.ods" -> sampleOds(),
      "deck.odp" -> sampleOdp(),
      "book.epub" -> sampleEpub(),
      "mail.eml" -> sampleEml()))
}
