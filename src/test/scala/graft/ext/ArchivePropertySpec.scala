package graft.ext

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck round-trip laws for the round's byte-level operators:
  * archive walkers (tar/zip), mojibake repair, CDC tiling. Driven by
  * deterministic seeds (no scalatestplus bridge in the offline cache —
  * the PropertySpec pattern). */
class ArchivePropertySpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int = 60): Seq[A] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  private val nameGen: Gen[String] = for {
    segs <- Gen.chooseNum(1, 3)
    parts <- Gen.listOfN(segs, Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString))
  } yield parts.mkString("/").take(90)

  private val contentGen: Gen[Array[Byte]] =
    Gen.chooseNum(0, 2000).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0, 255)).map(_.map(_.toByte).toArray))

  private val entriesGen: Gen[List[(String, Long, Array[Byte])]] = for {
    k <- Gen.chooseNum(1, 5)
    ns <- Gen.listOfN(k, nameGen)
    ms <- Gen.listOfN(k, Gen.chooseNum(0L, 4000000000L))
    cs <- Gen.listOfN(k, contentGen)
  } yield ns.lazyZip(ms).lazyZip(cs).toList

  test("∀ entries: tar round-trips names, mtimes, and bytes exactly") {
    for (entries <- samples(entriesGen)) {
      val arch = Tar.archive(entries.map { case (n, m, c) => Tar.entry(n, m, c) })
      val got = Tar.splitMembers(arch)
      assert(got.length == entries.length)
      got.zip(entries).foreach { case ((gn, gm, gc), (n, m, c)) =>
        assert(gn == n && gm == m)
        assert(java.util.Arrays.equals(gc.get, c), s"bytes differ for $n")
      }
    }
  }

  test("∀ entries: zip round-trips names and bytes through real deflate") {
    for (entries <- samples(entriesGen)) {
      val arch = Zip.archive(entries.map { case (n, _, c) => (n, c) })
      val got = Zip.splitMembers(arch)
      assert(got.length == entries.length)
      got.zip(entries).foreach { case ((gn, gc), (n, _, c)) =>
        assert(gn == n)
        assert(java.util.Arrays.equals(gc.get, c), s"bytes differ for $n")
      }
    }
  }

  test("∀ archives, cut points: truncated tar/zip walks never throw") {
    for ((entries, i) <- samples(entriesGen, 20).zipWithIndex) {
      val t = Tar.archive(entries.map { case (n, m, c) => Tar.entry(n, m, c) })
      val z = Zip.archive(entries.map { case (n, _, c) => (n, c) })
      for (cut <- Seq(i * 7 % (t.length + 1), t.length / 2, t.length - 1))
        Tar.splitMembers(t.take(cut))
      for (cut <- Seq(i * 13 % (z.length + 1), z.length / 2, z.length - 1))
        Zip.splitMembers(z.take(cut))
    }
  }

  test("∀ valid UTF-8 with non-ASCII: fix(doubleEncode(s)) == s") {
    import org.apache.spark.unsafe.types.UTF8String
    val strGen = Gen.nonEmptyListOf(Gen.frequency(
      5 -> Gen.asciiPrintableChar,
      2 -> Gen.oneOf('é', 'Å', 'ñ', 'ß', 'Ω', '€', '語'),
    )).map(_.mkString)
    for (s <- samples(strGen, 100) if s.exists(_ > 0x7f)) {
      val broken = new String(s.getBytes("UTF-8").map(b => (b & 0xff).toChar))
      val fixed = graft.functions.FixMojibake.repair(
        UTF8String.fromString(broken)).toString
      assert(fixed == s, s"round trip failed for ${s.take(20)}")
    }
  }

  test("∀ random patterns+text: Aho–Corasick equals brute-force counts") {
    // small alphabet forces dense overlaps, nestings, and shared
    // prefixes — the automaton's hard cases
    val patGen: Gen[List[String]] = Gen.chooseNum(1, 6).flatMap(k =>
      Gen.listOfN(k, Gen.chooseNum(1, 4).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))))
    val textGen: Gen[String] = Gen.chooseNum(0, 120).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString))
    def brute(text: String, p: String): Long =
      (0 to text.length - p.length)
        .count(i => text.regionMatches(i, p, 0, p.length)).toLong
    samples(Gen.zip(patGen, textGen), 120).foreach { case (ps0, text) =>
      val ps = ps0.distinct
      val got = KeywordTag.build(ps).countAll(text, ps.length).toSeq
      val want = ps.map(p => brute(text, p))
      assert(got == want, s"patterns=$ps text=$text got=$got want=$want")
    }
  }

  test("∀ ascii docs: CDC chunks tile [1, n] exactly with no overlap") {
    val docGen = Gen.chooseNum(0, 600).flatMap(n =>
      Gen.listOfN(n, Gen.asciiPrintableChar).map(_.mkString))
    import org.apache.spark.unsafe.types.UTF8String
    for (doc <- samples(docGen, 100)) {
      val b = graft.functions.CdcBoundaries
        .compute(UTF8String.fromString(doc)).toIntArray()
      // boundaries are strictly ascending, within (0, n]
      assert(b.sameElements(b.sorted.distinct))
      assert(b.forall(p => p >= 1 && p <= doc.getBytes("UTF-8").length))
    }
  }
}
