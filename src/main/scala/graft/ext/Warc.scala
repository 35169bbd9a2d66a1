package graft.ext

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** WARC / WET shard ingestion (ISO 28500) — the container web-scale
  * corpora actually ship in (Common Crawl's `.warc.gz` / `.wet.gz`),
  * completing the shard-walker family beside [[Tar]], [[Zip]] and
  * [[Compressed]]. The reference flow reads a local directory
  * (`56409-tika.xml:2302`); at the 100 TB north star the S1-equivalent
  * source is a WARC shard, so the engine needs "split this stream into
  * records, or route a damaged record to the error side" as a map-only
  * operator.
  *
  * Format (public ISO 28500 / WARC 1.0): a record is a version line
  * `WARC/1.0` CRLF, named headers (`WARC-Type`, `Content-Length`,
  * optionally `WARC-Target-URI`, `WARC-Block-Digest`, …), a blank
  * line, `Content-Length` payload bytes, and a CRLF CRLF terminator.
  * Records concatenate into a stream; in the `.warc.gz` framing each
  * record is additionally its own gzip member (which is what makes the
  * format splittable — [[Compressed.splitInflateMembers]] provides
  * that layer, composed here by [[wetRecordMeta]]).
  *
  * Error contract (mirrors the gzip/tar walkers): a record whose
  * `WARC-Block-Digest` does not verify emits the error row and the
  * walk CONTINUES past it — `Content-Length` still pins the boundary;
  * a damaged version line / missing length / truncation makes the
  * boundary itself unknowable, so the remainder becomes one final
  * error record (resync-by-magic-scan is deliberately not attempted:
  * payloads may legally contain `WARC/1.0`, and splicing on a
  * false positive silently corrupts records — bounded loss plus an
  * error row is the honest contract).
  *
  * Scale shape: one narrow `flatMap` pass per shard (1→N, no shuffle
  * of the payload), per-record error isolation, and a declared-size
  * cap so a forged `Content-Length` cannot make one task allocate
  * unbounded memory.
  */
object Warc {

  /** Records claiming more than this are treated as malformed
    * (mirror of [[Compressed.MaxInflatedBytes]]). */
  val MaxRecordBytes: Int = 64 << 20

  private val Crlf = "\r\n".getBytes(UTF_8)

  final case class WarcMember(doc_id: Long, member_idx: Int,
                              warc_type: String, target_uri: String,
                              ok: Boolean, n_bytes: Long, payload_md5: String)
  implicit val warcMemberEnc: Encoder[WarcMember] = Encoders.product[WarcMember]

  private def md5Hex(bytes: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(bytes)
      .map(b => f"${b & 0xff}%02x").mkString

  // ---- writer -------------------------------------------------------

  /** One WARC 1.0 record: version line, fixed header order (so the
    * bytes are a pure function of the arguments), blank line, payload,
    * CRLF CRLF terminator. The block digest is the labelled-md5 form
    * the spec's `algorithm ":" digest-value` grammar allows. */
  def record(warcType: String, targetUri: Option[String],
             contentType: String, recordId: String, date: String,
             payload: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("WARC/1.0\r\n")
    sb.append(s"WARC-Type: $warcType\r\n")
    sb.append(s"WARC-Record-ID: <$recordId>\r\n")
    sb.append(s"WARC-Date: $date\r\n")
    targetUri.foreach(u => sb.append(s"WARC-Target-URI: $u\r\n"))
    sb.append(s"WARC-Block-Digest: md5:${md5Hex(payload)}\r\n")
    sb.append(s"Content-Type: $contentType\r\n")
    sb.append(s"Content-Length: ${payload.length}\r\n")
    sb.append("\r\n")
    val head = sb.toString.getBytes(UTF_8)
    val out = new Array[Byte](head.length + payload.length + 4)
    System.arraycopy(head, 0, out, 0, head.length)
    System.arraycopy(payload, 0, out, head.length, payload.length)
    System.arraycopy(Crlf, 0, out, head.length + payload.length, 2)
    System.arraycopy(Crlf, 0, out, head.length + payload.length + 2, 2)
    out
  }

  // ---- reader -------------------------------------------------------

  /** Parsed record: (warcType, targetUri, payload). `None` payload =
    * the error contract for that record. */
  final case class Parsed(warcType: String, targetUri: String,
                          payload: Option[Array[Byte]])

  private def indexOfCrlfCrlf(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n')
        return i
      i += 1
    }
    -1
  }

  /** Walk a concatenated-record WARC stream. Digest-damaged records
    * emit an error entry and the walk resyncs on `Content-Length`;
    * structural damage (bad version line, unparsable/over-cap length,
    * truncation, missing terminator) loses the boundary — the
    * remainder becomes one final error entry. */
  def splitRecords(bytes: Array[Byte]): Seq[Parsed] = {
    val out = Seq.newBuilder[Parsed]
    var pos = 0
    var lostSync = false
    while (pos < bytes.length && !lostSync) {
      val step: Option[(Parsed, Int)] = try {
        val version = new String(bytes, pos,
          math.min(8, bytes.length - pos), UTF_8)
        if (!version.startsWith("WARC/1.")) throw new java.io.IOException(
          "bad WARC version line")
        val hEnd = indexOfCrlfCrlf(bytes, pos)
        if (hEnd < 0) throw new java.io.IOException("unterminated header")
        val headerText = new String(bytes, pos, hEnd - pos, UTF_8)
        val headers: Map[String, String] = headerText.split("\r\n").drop(1)
          .flatMap { line =>
            val i = line.indexOf(':')
            if (i < 0) None
            else Some(line.substring(0, i).trim.toLowerCase ->
              line.substring(i + 1).trim)
          }.toMap
        val len = headers.get("content-length").map(_.toLong)
          .getOrElse(throw new java.io.IOException("missing Content-Length"))
        if (len < 0 || len > MaxRecordBytes) throw new java.io.IOException(
          s"Content-Length $len out of bounds")
        val pStart = hEnd + 4
        val pEnd = pStart + len.toInt
        if (pEnd + 4 > bytes.length) throw new java.io.IOException(
          "truncated record")
        if (!(bytes(pEnd) == '\r' && bytes(pEnd + 1) == '\n' &&
              bytes(pEnd + 2) == '\r' && bytes(pEnd + 3) == '\n'))
          throw new java.io.IOException("missing record terminator")
        val payload = java.util.Arrays.copyOfRange(bytes, pStart, pEnd)
        val digestOk = headers.get("warc-block-digest") match {
          case Some(d) if d.startsWith("md5:") =>
            d.substring(4).equalsIgnoreCase(md5Hex(payload))
          case _ => true // absent or foreign-algorithm digest: accept
        }
        val parsed =
          if (digestOk) Parsed(headers.getOrElse("warc-type", ""),
            headers.getOrElse("warc-target-uri", ""), Some(payload))
          else Parsed("", "", None) // digest damage: error row, boundary kept
        Some((parsed, pEnd + 4))
      } catch { case scala.util.control.NonFatal(_) => None }
      step match {
        case Some((rec, next)) =>
          out += rec
          pos = next
        case None => // structural damage: boundary unknowable
          out += Parsed("", "", None)
          lostSync = true
      }
    }
    out.result()
  }

  // ---- planted fixtures (the oracle-shared payload algebra) ---------

  /** The three deterministic payloads of the planted WARC stream; the
    * oracle rebuilds the same strings with `chr(13)||chr(10)` SQL. */
  private[ext] val WarcinfoPayload =
    "software: graft/1.0\r\nformat: WARC File Format 1.0\r\n"
  private[ext] val HttpPrefix =
    "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n<html><body><p>"
  private[ext] val HttpSuffix = "</p></body></html>"
  private[ext] val WarcDate = "2026-01-01T00:00:00Z"

  private[ext] def targetUriFor(id: Long) = s"https://example.com/doc/$id"

  /** Planted WARC stream: per doc, a warcinfo record, a response
    * record (minimal HTTP response wrapping the text in HTML), and a
    * conversion record (the plain text — the WET shape). For
    * `id % corruptEvery == 0` the LAST payload byte of the response
    * record is flipped AFTER the digest was computed — the walker must
    * fail THAT record on its block digest and resync on
    * Content-Length, keeping members 0 and 2 (per-record isolation,
    * the property the gzip-trailer and tar-checksum fixtures pin for
    * their walkers). */
  def warcPlantedCol(textCol: Column, idCol: Column,
                     corruptEvery: Int): Column = {
    val u = udf { (s: String, id: Long) =>
      val t = Option(s).getOrElse("")
      val info = record("warcinfo", None, "application/warc-fields",
        s"urn:uuid:doc-$id-0", WarcDate, WarcinfoPayload.getBytes(UTF_8))
      val resp = record("response", Some(targetUriFor(id)),
        "application/http; msgtype=response", s"urn:uuid:doc-$id-1",
        WarcDate, (HttpPrefix + t + HttpSuffix).getBytes(UTF_8))
      if (id % corruptEvery == 0) {
        // last payload byte sits 5 bytes from the record end (before
        // the CRLF CRLF terminator); the response payload is never
        // empty (the HTTP head alone is 74 bytes)
        resp(resp.length - 5) = (resp(resp.length - 5) ^ 0xff).toByte
      }
      val conv = record("conversion", Some(targetUriFor(id)), "text/plain",
        s"urn:uuid:doc-$id-2", WarcDate, t.getBytes(UTF_8))
      val bos = new ByteArrayOutputStream(info.length + resp.length + conv.length)
      bos.write(info); bos.write(resp); bos.write(conv)
      bos.toByteArray
    }
    u(textCol, idCol)
  }

  /** Per-record walk over a WARC-stream binary column — one output row
    * per record (1→N narrow, no shuffle): clean records emit (type,
    * target URI, payload byte count, payload md5); damaged ones the
    * error contract. */
  def recordMeta(df: DataFrame, idCol: String, binCol: String): Dataset[WarcMember] = {
    implicit val tupleEnc: Encoder[(Long, Array[Byte])] = Encoders.tuple(
      Encoders.scalaLong, Encoders.BINARY)
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        splitRecords(bytes).zipWithIndex.map {
          case (Parsed(tp, uri, Some(payload)), i) =>
            WarcMember(id, i, tp, uri, ok = true, payload.length.toLong,
              md5Hex(payload))
          case (Parsed(_, _, None), i) =>
            WarcMember(id, i, "", "", ok = false, 0L, "")
        }
      }
  }

  // ---- WET over gzip members (the .wet.gz on-the-wire framing) ------

  /** Planted `.wet.gz`-shaped shard: the doc's text in two equal
    * character slices (integer division, last slice takes the
    * remainder — the oracle's `substr` algebra), each slice a
    * `conversion` record, each record ITS OWN gzip member (the framing
    * that makes WARC splittable), members concatenated. For
    * `id % corruptEvery == 0` member 0's CRC trailer byte is flipped —
    * the gzip layer must fail THAT member while member 1 still decodes
    * and parses. */
  def wetGzPlantedCol(textCol: Column, idCol: Column,
                      corruptEvery: Int): Column = {
    val u = udf { (s: String, id: Long) =>
      val t = Option(s).getOrElse("")
      // slice at the CODE-POINT midpoint — the oracle slices with
      // DuckDB's code-point substr; UTF-16 code-unit math would split
      // a surrogate pair on supplementary-plane text
      val a = t.offsetByCodePoints(0, t.codePointCount(0, t.length) / 2)
      val slices = Seq(t.substring(0, a), t.substring(a))
      val members = slices.zipWithIndex.map { case (part, i) =>
        Compressed.gzip(record("conversion", Some(targetUriFor(id)),
          "text/plain", s"urn:uuid:doc-$id-$i", WarcDate,
          part.getBytes(UTF_8)))
      }.toArray
      if (id % corruptEvery == 0) {
        val m = members(0)
        m(m.length - 8) = (m(m.length - 8) ^ 0xff).toByte // first CRC byte
      }
      val bos = new ByteArrayOutputStream()
      members.foreach(bos.write)
      bos.toByteArray
    }
    u(textCol, idCol)
  }

  /** One document's WET-derivation outcome — see [[deriveWet]]. */
  final case class DerivedWet(doc_id: Long, response_ok: Boolean,
                              derived_md5: String, wet_md5: String,
                              derived_eq_wet: Boolean)
  implicit val derivedWetEnc: Encoder[DerivedWet] = Encoders.product[DerivedWet]

  /** Strip the HTTP message head (everything through the first
    * CRLF CRLF) from an `application/http` response payload. */
  private def httpBody(p: Array[Byte]): Array[Byte] = {
    val i = indexOfCrlfCrlf(p, 0)
    if (i < 0) p else java.util.Arrays.copyOfRange(p, i + 4, p.length)
  }

  /** The WET DERIVATION itself — the transform that turns a crawl's
    * WARC into its WET sibling: per document, take the `response`
    * record, strip the HTTP head, render the HTML body to text
    * ([[graft.extract.HtmlText]] — tags stripped, block tags to
    * newlines, entities decoded, whitespace collapsed), and compare
    * the result against the `conversion` record the archive ships.
    * Emits (response_ok, derived_md5, wet_md5, derived_eq_wet); a
    * digest-failed response degrades to the error row while the
    * conversion payload still reports. One narrow map pass — the
    * record bytes and the rendered text never shuffle. */
  def deriveWet(df: DataFrame, idCol: String, binCol: String): Dataset[DerivedWet] = {
    implicit val tupleEnc: Encoder[(Long, Array[Byte])] = Encoders.tuple(
      Encoders.scalaLong, Encoders.BINARY)
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .map { case (id, bytes) => deriveOne(id, bytes) }
  }

  /** Per-document derivation body of [[deriveWet]] — pure, for spec
    * coverage of the degraded paths without a session.
    *
    * Records are selected by WARC-Type, not position: real captures
    * interleave warcinfo/request/metadata records around the
    * response/conversion pair, and a positional match would render
    * the wrong payload on any such layout. A digest-damaged record
    * loses its type with its payload (the error contract), so a
    * stream whose response was the damaged record degrades to the
    * no-response row — while the conversion record still reports. */
  private[ext] def deriveOne(id: Long, bytes: Array[Byte]): DerivedWet = {
    val records = splitRecords(bytes)
    val conv = records.collectFirst {
      case Parsed("conversion", _, Some(p)) => p
    }
    val resp = records.collectFirst {
      case Parsed("response", _, Some(p)) => p
    }
    conv match {
      case None => DerivedWet(id, response_ok = false, "", "",
        derived_eq_wet = false)
      case Some(convPay) =>
        resp match {
          case Some(p) =>
            val derived = graft.extract.HtmlText.extract(
              httpBody(p), MaxRecordBytes)
            DerivedWet(id, response_ok = true,
              md5Hex(derived.getBytes(UTF_8)), md5Hex(convPay),
              derived == new String(convPay, UTF_8))
          case None =>
            DerivedWet(id, response_ok = false, "", md5Hex(convPay),
              derived_eq_wet = false)
        }
    }
  }

  /** A WET record with its decoded TEXT — what the extraction half of
    * the pipeline consumes ([[WarcMember]] carries the metadata
    * contract). `ok=false` members carry empty text. */
  final case class WetText(doc_id: Long, member_idx: Int, target_uri: String,
                           ok: Boolean, rec_text: String)
  implicit val wetTextEnc: Encoder[WetText] = Encoders.product[WetText]

  /** Composed `.wet.gz` walk emitting each conversion record's payload
    * TEXT (UTF-8) — the extraction that turns a WET shard into a
    * documents relation, ready for the curation gates downstream. Same
    * two-layer walk and per-member error isolation as
    * [[wetRecordMeta]]; still one narrow 1→N pass, no shuffle. */
  def wetRecordText(df: DataFrame, idCol: String, binCol: String): Dataset[WetText] = {
    implicit val tupleEnc: Encoder[(Long, Array[Byte])] = Encoders.tuple(
      Encoders.scalaLong, Encoders.BINARY)
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        Compressed.splitInflateMembers(bytes).zipWithIndex.map {
          case (Some(member), i) =>
            splitRecords(member) match {
              case Seq(Parsed(_, uri, Some(payload))) =>
                WetText(id, i, uri, ok = true, new String(payload, UTF_8))
              case _ => WetText(id, i, "", ok = false, "")
            }
          case (None, i) => WetText(id, i, "", ok = false, "")
        }
      }
  }

  /** Composed `.wet.gz` walk: gzip-member split (CRC-verified) → WARC
    * record parse per member → text payload fields. One narrow 1→N
    * pass; a member damaged at EITHER layer emits the error contract
    * without touching its neighbors. */
  def wetRecordMeta(df: DataFrame, idCol: String, binCol: String): Dataset[WarcMember] = {
    implicit val tupleEnc: Encoder[(Long, Array[Byte])] = Encoders.tuple(
      Encoders.scalaLong, Encoders.BINARY)
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        Compressed.splitInflateMembers(bytes).zipWithIndex.map {
          case (Some(member), i) =>
            splitRecords(member) match {
              case Seq(Parsed(tp, uri, Some(payload))) =>
                WarcMember(id, i, tp, uri, ok = true, payload.length.toLong,
                  md5Hex(payload))
              case _ => WarcMember(id, i, "", "", ok = false, 0L, "")
            }
          case (None, i) => WarcMember(id, i, "", "", ok = false, 0L, "")
        }
      }
  }
}
