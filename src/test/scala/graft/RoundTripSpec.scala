package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.synth._

/** Generator → Extractor round trip over a large deterministic sample:
  * every template/dialect combination the workload mix produces must
  * extract to exactly the independently derived expected record. */
class RoundTripSpec extends AnyFunSuite {

  private def check(convId: String, turnIdx: Int): Unit = {
    val gt = TurnGen.genTurn(convId, turnIdx)
    val got = Extractor.extractOne(convId, turnIdx, gt.input.text)
    val exp = gt.expected
    assert(got == exp,
      s"\n--- payload (${gt.input.tool}) ---\n${gt.input.text.take(2500)}\n--- got ---\n$got\n--- exp ---\n$exp")
  }

  test("round trip: 3000 sampled turns across all templates and dialects") {
    for (c <- 0 until 1000; t <- 0 until 3) check(f"conv-$c%06d", t)
  }

  test("round trip is deterministic (same key → same bytes)") {
    val a = TurnGen.genTurn("conv-000042", 1)
    val b = TurnGen.genTurn("conv-000042", 1)
    assert(a == b)
  }
}
