package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets.UTF_8

/** WARC/WET record writer/walker (ISO 28500): byte-exact fixture
  * interop, round trip, digest verification with per-record resync,
  * structural-damage degradation, and the composed .wet.gz walk. */
class WarcSpec extends AnyFunSuite {

  private def md5(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(b)
      .map(x => f"${x & 0xff}%02x").mkString

  test("hand-written byte-exact WARC 1.0 fixture parses (interop)") {
    // authored from the ISO 28500 grammar, NOT via Warc.record — pins
    // the reader against the spec, not against our own writer
    val payload = "hello warc"
    val fixture = ("WARC/1.0\r\n" +
      "WARC-Type: resource\r\n" +
      "WARC-Record-ID: <urn:uuid:00000000-0000-0000-0000-000000000001>\r\n" +
      "WARC-Date: 2026-01-01T00:00:00Z\r\n" +
      "WARC-Target-URI: https://example.org/x\r\n" +
      "Content-Type: text/plain\r\n" +
      s"Content-Length: ${payload.getBytes(UTF_8).length}\r\n" +
      "\r\n" +
      payload +
      "\r\n\r\n").getBytes(UTF_8)
    val got = Warc.splitRecords(fixture)
    assert(got.length == 1)
    assert(got.head.warcType == "resource")
    assert(got.head.targetUri == "https://example.org/x")
    assert(new String(got.head.payload.get, UTF_8) == payload)
  }

  test("header names parse case-insensitively; unknown headers ignored") {
    val payload = "p"
    val fixture = ("WARC/1.0\r\n" +
      "warc-type: conversion\r\n" +
      "X-Custom-Header: whatever: nested colon\r\n" +
      "content-length: 1\r\n" +
      "\r\n" + payload + "\r\n\r\n").getBytes(UTF_8)
    val got = Warc.splitRecords(fixture)
    assert(got == Seq(Warc.Parsed("conversion", "", got.head.payload)))
    assert(new String(got.head.payload.get, UTF_8) == "p")
  }

  test("round trip: three records with digests survive") {
    val recs = Seq(
      Warc.record("warcinfo", None, "application/warc-fields",
        "urn:uuid:a", "2026-01-01T00:00:00Z", "software: graft\r\n".getBytes(UTF_8)),
      Warc.record("response", Some("https://e.com/1"),
        "application/http; msgtype=response", "urn:uuid:b",
        "2026-01-01T00:00:00Z", "HTTP/1.1 200 OK\r\n\r\nbody".getBytes(UTF_8)),
      Warc.record("conversion", Some("https://e.com/1"), "text/plain",
        "urn:uuid:c", "2026-01-01T00:00:00Z", Array.emptyByteArray))
    val stream = recs.reduce(_ ++ _)
    val got = Warc.splitRecords(stream)
    assert(got.map(_.warcType) == Seq("warcinfo", "response", "conversion"))
    assert(got.map(_.targetUri) == Seq("", "https://e.com/1", "https://e.com/1"))
    assert(got.forall(_.payload.isDefined))
    assert(new String(got(1).payload.get, UTF_8).endsWith("body"))
    assert(got(2).payload.get.isEmpty) // zero-length payload is legal
  }

  test("digest damage isolates ONE record; walk resyncs on Content-Length") {
    val mk = (i: Int, s: String) => Warc.record("conversion",
      Some(s"https://e.com/$i"), "text/plain", s"urn:uuid:$i",
      "2026-01-01T00:00:00Z", s.getBytes(UTF_8))
    val r0 = mk(0, "first"); val r1 = mk(1, "second"); val r2 = mk(2, "third")
    r1(r1.length - 5) = (r1(r1.length - 5) ^ 0xff).toByte // last payload byte
    val got = Warc.splitRecords(r0 ++ r1 ++ r2)
    assert(got.length == 3)
    assert(got(0).payload.isDefined && got(2).payload.isDefined)
    assert(got(1) == Warc.Parsed("", "", None))
    assert(new String(got(2).payload.get, UTF_8) == "third")
  }

  test("a record WITHOUT a digest header is accepted as-is") {
    val noDigest = ("WARC/1.0\r\n" +
      "WARC-Type: resource\r\n" +
      "Content-Length: 2\r\n" +
      "\r\nok\r\n\r\n").getBytes(UTF_8)
    assert(Warc.splitRecords(noDigest).head.payload.isDefined)
  }

  test("structural damage loses sync: remainder is one error record") {
    val r0 = Warc.record("conversion", None, "text/plain", "urn:uuid:0",
      "2026-01-01T00:00:00Z", "first".getBytes(UTF_8))
    val r1 = Warc.record("conversion", None, "text/plain", "urn:uuid:1",
      "2026-01-01T00:00:00Z", "second".getBytes(UTF_8))
    // damage the second record's version magic
    val stream = r0 ++ r1
    stream(r0.length) = 'X'
    val got = Warc.splitRecords(stream)
    assert(got.length == 2)
    assert(got(0).payload.isDefined && got(1) == Warc.Parsed("", "", None))
  }

  test("truncation / forged length / missing terminator degrade, never throw") {
    val r = Warc.record("resource", None, "text/plain", "urn:uuid:t",
      "2026-01-01T00:00:00Z", "payload bytes".getBytes(UTF_8))
    for (cut <- Seq(0, 4, 9, 40, r.length - 5, r.length - 1))
      assert(Warc.splitRecords(r.take(cut)).forall(_.payload.isEmpty) ||
        cut == 0)
    // forge the length far past the end
    val s = new String(r, UTF_8).replaceFirst("Content-Length: 13",
      "Content-Length: 99999999").getBytes(UTF_8)
    assert(Warc.splitRecords(s).forall(_.payload.isEmpty))
    // over the cap
    val huge = new String(r, UTF_8).replaceFirst("Content-Length: 13",
      s"Content-Length: ${Warc.MaxRecordBytes.toLong + 1}").getBytes(UTF_8)
    assert(Warc.splitRecords(huge).forall(_.payload.isEmpty))
  }

  test("payload may legally CONTAIN 'WARC/1.0' — length framing wins") {
    val tricky = "WARC/1.0\r\nWARC-Type: fake\r\n\r\nnot a record"
    val r0 = Warc.record("resource", None, "text/plain", "urn:uuid:0",
      "2026-01-01T00:00:00Z", tricky.getBytes(UTF_8))
    val r1 = Warc.record("resource", None, "text/plain", "urn:uuid:1",
      "2026-01-01T00:00:00Z", "after".getBytes(UTF_8))
    val got = Warc.splitRecords(r0 ++ r1)
    assert(got.length == 2)
    assert(new String(got(0).payload.get, UTF_8) == tricky)
    assert(new String(got(1).payload.get, UTF_8) == "after")
  }

  test("wet.gz composition: gzip CRC damage fails only that member") {
    val rec = (i: Int, s: String) => Compressed.gzip(
      Warc.record("conversion", Some(s"https://e.com/$i"), "text/plain",
        s"urn:uuid:$i", "2026-01-01T00:00:00Z", s.getBytes(UTF_8)))
    val m0 = rec(0, "alpha"); val m1 = rec(1, "beta")
    m0(m0.length - 8) = (m0(m0.length - 8) ^ 0xff).toByte
    val members = Compressed.splitInflateMembers(m0 ++ m1)
    assert(members.length == 2)
    assert(members(0).isEmpty) // CRC fail
    val parsed = Warc.splitRecords(members(1).get)
    assert(parsed.length == 1 &&
      new String(parsed.head.payload.get, UTF_8) == "beta")
  }

  test("WARC→WET derivation: happy path, digest damage, junk bytes") {
    val t = "hello wet world"
    val info = Warc.record("warcinfo", None, "application/warc-fields",
      "urn:uuid:i", "2026-01-01T00:00:00Z", "format: WARC\r\n".getBytes(UTF_8))
    val html = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
      s"<html><body><p>$t</p></body></html>").getBytes(UTF_8)
    val resp = Warc.record("response", Some("https://e.com/1"),
      "application/http; msgtype=response", "urn:uuid:r",
      "2026-01-01T00:00:00Z", html)
    val conv = Warc.record("conversion", Some("https://e.com/1"),
      "text/plain", "urn:uuid:c", "2026-01-01T00:00:00Z", t.getBytes(UTF_8))
    val good = Warc.deriveOne(1L, info ++ resp ++ conv)
    assert(good.response_ok && good.derived_eq_wet)
    assert(good.derived_md5 == md5(t.getBytes(UTF_8)))
    // digest-damaged response: conversion still reports, derive degrades
    val dmg = resp.clone()
    dmg(dmg.length - 5) = (dmg(dmg.length - 5) ^ 0xff).toByte
    val degraded = Warc.deriveOne(2L, info ++ dmg ++ conv)
    assert(!degraded.response_ok && degraded.derived_md5 == "" &&
      degraded.wet_md5 == md5(t.getBytes(UTF_8)) && !degraded.derived_eq_wet)
    // junk bytes: the error row, never a throw
    val junk = Warc.deriveOne(3L, Array.fill[Byte](64)(0x41))
    assert(!junk.response_ok && junk.derived_md5 == "" && junk.wet_md5 == "")
    // records select by TYPE, not position: a request record
    // interleaved before the response (the normal capture layout)
    // must not shift the match
    val req = Warc.record("request", Some("https://e.com/1"),
      "application/http; msgtype=request", "urn:uuid:q",
      "2026-01-01T00:00:00Z", "GET / HTTP/1.1\r\n\r\n".getBytes(UTF_8))
    val interleaved = Warc.deriveOne(4L, info ++ req ++ resp ++ conv)
    assert(interleaved.response_ok && interleaved.derived_eq_wet)
    // and a conversion-only stream (warcinfo, metadata, conversion)
    // reports the wet payload with NO response — never renders a
    // non-response payload as if it were one
    val meta = Warc.record("metadata", Some("https://e.com/1"),
      "application/warc-fields", "urn:uuid:m",
      "2026-01-01T00:00:00Z", "fetch: ok\r\n".getBytes(UTF_8))
    val noResp = Warc.deriveOne(5L, info ++ meta ++ conv)
    assert(!noResp.response_ok && noResp.derived_md5 == "" &&
      noResp.wet_md5 == md5(t.getBytes(UTF_8)))
  }

  test("writer digest matches an independent md5 of the payload") {
    val payload = "digest me".getBytes(UTF_8)
    val r = Warc.record("resource", None, "text/plain", "urn:uuid:d",
      "2026-01-01T00:00:00Z", payload)
    val text = new String(r, UTF_8)
    assert(text.contains(s"WARC-Block-Digest: md5:${md5(payload)}\r\n"))
    assert(text.contains(s"Content-Length: ${payload.length}\r\n"))
  }
}
