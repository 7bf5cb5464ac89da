package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Difflib

/** CPython parity for the difflib port (J2): every ratio must equal
  * CPython's SequenceMatcher.ratio() bit-for-bit (both sides compute
  * 2.0·M/T in IEEE doubles, so == is exact), and every n=1 close-match
  * choice must agree including the nlargest tie-break. Corpora generated
  * by CPython 3.11 difflib (test resources, incl. an autojunk-regime
  * fuzz set with len(b) ≥ 200). */
class DifflibSpec extends AnyFunSuite {

  private def lines(res: String): Seq[Array[String]] = {
    val in = getClass.getResourceAsStream(res)
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().map(_.split("\t", -1)).toVector finally src.close()
  }

  test("ratio parity with CPython on the config-key corpus") {
    var n = 0
    for (Array(k, w, r) <- lines("/difflib_ratio_corpus.tsv")) {
      assert(Difflib.ratio(k, w) == r.toDouble, s"ratio('$k','$w')")
      n += 1
    }
    assert(n >= 350)
  }

  test("ratio parity on random fuzz incl. the autojunk regime") {
    var n = 0
    for (Array(a, b, r) <- lines("/difflib_fuzz_corpus.tsv")) {
      assert(Difflib.ratio(a, b) == r.toDouble,
        s"ratio mismatch len=(${a.length},${b.length})")
      n += 1
    }
    assert(n >= 60)
  }

  test("get_close_matches(n=1, cutoff=0.6) parity incl. tie-breaks") {
    for (Array(w, m) <- lines("/difflib_close_corpus.tsv")) {
      val got = Difflib.closestMatch(w, graft.synth.Synth.knownKeys, 0.6)
      val want = if (m == "∅") None else Some(m)
      assert(got == want, s"closestMatch('$w')")
    }
    // the corpus exercises the documented tie-breaks:
    // 'биология 9' ties 7/8 at 0.9 → larger key 'биология 8';
    // 'математика' ties 5/6/7 → 'математика 7'
    assert(Difflib.closestMatch("биология 9", graft.synth.Synth.knownKeys).contains("биология 8"))
    assert(Difflib.closestMatch("математика", graft.synth.Synth.knownKeys).contains("математика 7"))
  }

  test("degenerate inputs") {
    assert(Difflib.ratio("", "") == 1.0)
    assert(Difflib.ratio("a", "") == 0.0)
    assert(Difflib.closestMatch("", graft.synth.Synth.knownKeys).isEmpty)
  }
}
