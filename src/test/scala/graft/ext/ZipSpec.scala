package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** ZIP writer/walker: round trip through a real deflate codec,
  * per-member CRC isolation, central-directory termination, and
  * standard-tool interop (the JDK's own ZipInputStream + jar). */
class ZipSpec extends AnyFunSuite {

  private def entries = Seq(
    "a/one.txt" -> "alpha content".getBytes("UTF-8"),
    "a/two.txt" -> "".getBytes("UTF-8"),
    "three.txt" -> ("x" * 5000).getBytes("UTF-8")) // compresses hard

  test("round trip: names, sizes, contents survive the deflate cycle") {
    val got = Zip.splitMembers(Zip.archive(entries))
    assert(got.map(_._1) == Seq("a/one.txt", "a/two.txt", "three.txt"))
    assert(got.map(_._2.get.length) == Seq(13, 0, 5000))
    assert(new String(got.head._2.get, "UTF-8") == "alpha content")
  }

  test("a damaged member fails alone; neighbors resync on csize") {
    val arch = Zip.archive(entries)
    // flip a byte inside member 2's deflate data (3rd PK\3\4 header)
    var hits = 0; var i = 0; var target = -1
    while (target < 0 && i + 4 <= arch.length) {
      if (arch(i) == 'P' && arch(i + 1) == 'K' && arch(i + 2) == 3 &&
          arch(i + 3) == 4) { hits += 1; if (hits == 3) target = i }
      i += 1
    }
    val nameLen = (arch(target + 26) & 0xff) | ((arch(target + 27) & 0xff) << 8)
    val off = target + 30 + nameLen
    arch(off + 2) = (arch(off + 2) ^ 0xff).toByte
    val got = Zip.splitMembers(arch)
    assert(got.length == 3)
    assert(got(0)._2.isDefined && got(1)._2.isDefined)
    assert(got(2) == (("", None)))
  }

  test("truncated archives degrade, never throw") {
    val arch = Zip.archive(entries)
    for (cut <- Seq(0, 3, 29, 31, 60, arch.length - 5))
      Zip.splitMembers(arch.take(cut))
  }

  test("the JDK's own ZipInputStream reads our archives (interop)") {
    val zin = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(Zip.archive(entries)))
    val seen = Iterator.continually(zin.getNextEntry).takeWhile(_ != null)
      .map(e => e.getName -> new String(zin.readAllBytes(), "UTF-8")).toList
    zin.close()
    assert(seen.map(_._1) == entries.map(_._1))
    assert(seen.head._2 == "alpha content")
    // and java.util.zip.ZipFile (central-directory reader)
    val f = java.io.File.createTempFile("graft", ".zip")
    try {
      java.nio.file.Files.write(f.toPath, Zip.archive(entries))
      val zf = new java.util.zip.ZipFile(f)
      try assert(zf.size() == 3) finally zf.close()
    } finally { f.delete(); () }
  }
}
