package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** ustar archive writer/walker: round trip, checksum verification,
  * per-member error isolation, termination, and GNU tar interop. */
class TarSpec extends AnyFunSuite {

  private def member(name: String, mtime: Long, text: String) =
    Tar.entry(name, mtime, text.getBytes("UTF-8"))

  test("round trip: names, mtimes, sizes, contents survive") {
    val a = Tar.archive(Seq(
      member("a.txt", 1700000001L, "hello tar"),
      member("dir/b.txt", 1700000002L, ""),
      member("c.bin", 1700000003L, "x" * 513))) // spans 2 content blocks
    val got = Tar.splitMembers(a)
    assert(got.map(m => (m._1, m._2)) == Seq(
      ("a.txt", 1700000001L), ("dir/b.txt", 1700000002L), ("c.bin", 1700000003L)))
    assert(got.map(_._3.get.length) == Seq(9, 0, 513))
    assert(new String(got.head._3.get, "UTF-8") == "hello tar")
  }

  test("checksum damage isolates ONE member; walk resyncs past it") {
    val e0 = member("ok0.txt", 1L, "first")
    val e1 = member("bad.txt", 2L, "second")
    val e2 = member("ok2.txt", 3L, "third")
    e1(148) = '7' // damage a checksum digit (size field intact)
    val got = Tar.splitMembers(Tar.archive(Seq(e0, e1, e2)))
    assert(got.length == 3)
    assert(got(0)._3.isDefined && got(2)._3.isDefined)
    assert(got(1) == (("", 0L, None)))
    assert(new String(got(2)._3.get, "UTF-8") == "third")
  }

  test("bad magic loses sync: remainder is one error member") {
    val e0 = member("ok.txt", 1L, "first")
    val e1 = member("junk.txt", 2L, "second")
    e1(257) = 'X' // magic destroyed — boundary unknowable
    val got = Tar.splitMembers(Tar.archive(Seq(e0, e1)))
    assert(got == Seq(("ok.txt", 1L, got(0)._3), ("", 0L, None)))
  }

  test("truncated archive and forged huge size degrade, never throw") {
    val a = Tar.archive(Seq(member("t.txt", 1L, "payload")))
    for (cut <- Seq(0, 100, 511, 513, 700)) Tar.splitMembers(a.take(cut))
    val forged = member("f.txt", 1L, "tiny")
    // forge a size far past the archive end (checksum now stale too)
    System.arraycopy("77777777777".getBytes, 0, forged, 124, 11)
    assert(Tar.splitMembers(Tar.archive(Seq(forged))).forall(_._3.isEmpty))
  }

  test("GNU tar reads our archives (interop)") {
    val tarBin = new java.io.File("/usr/bin/tar")
    assume(tarBin.canExecute, "system tar unavailable")
    val a = Tar.archive(Seq(
      member("x/one.txt", 1700000100L, "alpha"),
      member("x/two.txt", 1700000200L, "beta gamma")))
    val f = java.io.File.createTempFile("graft", ".tar")
    try {
      java.nio.file.Files.write(f.toPath, a)
      val p = new ProcessBuilder("/usr/bin/tar", "-tf", f.getAbsolutePath)
        .redirectErrorStream(true).start()
      val out = new String(p.getInputStream.readAllBytes, "UTF-8")
      assert(p.waitFor() == 0, s"tar -tf failed: $out")
      assert(out.linesIterator.toSeq == Seq("x/one.txt", "x/two.txt"))
    } finally { f.delete(); () }
  }
}
