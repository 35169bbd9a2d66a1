package graft.extract

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, ZipEntry, ZipOutputStream}

/** Deterministic many-document corpus generator for the EXTRACTION
  * throughput ladder (VERDICT r16 #3): thousands of small real
  * containers — hand-built from the public format specs, like every
  * extraction fixture in this repo — so the binaryFile-scan + UDF
  * pipeline ([[graft.pipeline.DocPipeline]]) can be measured at
  * partition counts that exercise `maxPartitionBytes`, not just the
  * four reference fixtures. Everything derives from the document
  * index: no RNG state, bit-identical on every run (the
  * [[graft.SynthScale]] discipline).
  *
  * Five formats cycle by index — PDF (uncompressed content stream,
  * ISO 32000 text operators), DOCX (OOXML zip, `word/document.xml`),
  * ODT (ODF zip with its STORED `mimetype` first entry), HTML, and
  * plain text — and each document's extracted text equals its planted
  * text EXACTLY, so extraction over the corpus is oracle-checkable at
  * any size (`expectedText`).
  */
object SynthDocs {

  val Formats: Seq[String] = Seq("pdf", "docx", "odt", "html", "txt")

  /** Planted text for document `i`: 30–89 plain [a-z0-9 ] words. */
  def textFor(i: Long): String = {
    val n = 30 + (i % 60).toInt
    (0 until n).map { k =>
      val h = (i * 31 + k * 7) % 997
      s"w${h}s$k"
    }.mkString(" ")
  }

  def formatFor(i: Long): String = Formats((i % Formats.length).toInt)

  def fileName(i: Long): String = f"doc_$i%07d.${formatFor(i)}"

  /** What [[TextExtractor.extract]] returns for document `i` — the
    * generator's contract, pinned by SynthDocsSpec and the in-query
    * oracle of q_extract_synth. */
  def expectedText(i: Long): String = textFor(i)

  def bytesFor(i: Long): Array[Byte] = formatFor(i) match {
    case "pdf"  => pdfBytes(textFor(i))
    case "docx" => docxBytes(textFor(i))
    case "odt"  => odtBytes(textFor(i))
    case "html" => htmlBytes(textFor(i))
    case _      => textFor(i).getBytes("UTF-8")
  }

  /** Minimal valid-enough PDF: one uncompressed content stream whose
    * single `Tj` carries the text (no parens/backslashes in the
    * planted alphabet, so no string escaping is needed). */
  def pdfBytes(text: String): Array[Byte] = {
    val content = s"BT /F1 12 Tf ($text) Tj ET"
    (s"%PDF-1.4\n1 0 obj << /Length ${content.length} >>\nstream\n" +
      content + "\nendstream\nendobj\ntrailer << >>\n%%EOF\n")
      .getBytes("ISO-8859-1")
  }

  def docxBytes(text: String): Array[Byte] = zip(None,
    "word/document.xml" ->
      ("""<?xml version="1.0"?>""" +
        """<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">""" +
        s"""<w:body><w:p><w:r><w:t>$text</w:t></w:r></w:p></w:body></w:document>"""))

  def odtBytes(text: String): Array[Byte] = zip(Some(MimeDetect.Odt),
    "content.xml" ->
      ("""<?xml version="1.0" encoding="UTF-8"?>""" +
        """<office:document-content""" +
        """ xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0"""" +
        """ xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">""" +
        s"""<office:body><office:text><text:p>$text</text:p>""" +
        """</office:text></office:body></office:document-content>"""))

  def htmlBytes(text: String): Array[Byte] =
    s"<html><head><title></title></head><body><p>$text</p></body></html>"
      .getBytes("UTF-8")

  // fixed in-DOS-range timestamp: bytes identical across runs (the
  // OpenDocFixtures convention)
  private val FixedTime = 1577836800000L

  private def zip(mimetype: Option[String],
                  entries: (String, String)*): Array[Byte] = {
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

  /** Materialize documents [0, nDocs) under `dir`, fanned into
    * `subdirs` subdirectories so a distributed listing sees a real
    * tree, not one hot directory. Skips files that already exist AT
    * THE EXPECTED LENGTH (idempotent re-run); each file lands via a
    * uniquely-named temp + ATOMIC_MOVE, so neither a killed run nor a
    * concurrent writer (Verify and Bench share the fixed 500-doc
    * corpus dir) can leave a torn container for a later scan — the
    * losing racer's rename atomically replaces identical bytes. */
  def writeCorpus(dir: java.nio.file.Path, nDocs: Long,
                  subdirs: Int = 64): Unit =
    writeCorpusWith(dir, nDocs, subdirs)(fileName, bytesFor)

  /** The shared corpus writer behind [[SynthDocs]] and
    * [[SynthHeavyDocs]]: same tree fan-out, same atomic-per-file
    * discipline, parameterized on the per-index naming/content. */
  private[extract] def writeCorpusWith(dir: java.nio.file.Path, nDocs: Long,
                                       subdirs: Int)(
      name: Long => String, bytes: Long => Array[Byte]): Unit = {
    import java.nio.file.{Files, StandardCopyOption}
    (0 until subdirs).foreach(s =>
      Files.createDirectories(dir.resolve(f"d$s%03d")))
    var i = 0L
    while (i < nDocs) {
      val p = dir.resolve(f"d${i % subdirs}%03d").resolve(name(i))
      val b = bytes(i)
      // content compare, not length (ADVICE r18): bytes are
      // deterministic and ~7 KB, so a full equality check costs one
      // read — a same-length corrupted leftover (e.g. from the
      // pre-atomic writer) must be rewritten, not kept to fail the
      // oracle later with a misleading shape
      val intact = Files.exists(p) && Files.size(p) == b.length &&
        java.util.Arrays.equals(Files.readAllBytes(p), b)
      if (!intact) {
        val tmp = p.resolveSibling(
          p.getFileName.toString + ".tmp" + java.util.UUID.randomUUID())
        Files.write(tmp, b)
        Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE,
          StandardCopyOption.REPLACE_EXISTING)
      }
      i += 1
    }
  }
}
