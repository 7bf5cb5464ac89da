package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.core._

/** Property tests (SURVEY.md §5 item 3). Uses raw ScalaCheck Gen with
  * fixed seeds (the scalatestplus bridge isn't in the offline cache) —
  * deterministic 200-sample sweeps per property. */
class PropertySpec extends AnyFunSuite {

  private def forAll[A](g: Gen[A], n: Int = 200)(f: A => Unit): Unit =
    (0 until n).foreach { i => f(g.pureApply(Gen.Parameters.default, Seed(i.toLong))) }

  private def forAll2[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    (0 until 200).foreach { i =>
      f(ga.pureApply(Gen.Parameters.default, Seed(i.toLong)),
        gb.pureApply(Gen.Parameters.default, Seed(i.toLong + 7919)))
    }

  val cellGen: Gen[Cell] = for {
    x <- Gen.choose(0, 2300)
    y <- Gen.choose(1400, 3400)
    w <- Gen.choose(20, 300)
    h <- Gen.choose(20, 150)
    c <- Gen.choose(0.0, 1.0)
  } yield Cell(x, y, x + w, y + h, c)

  val cellsGen: Gen[Vector[Cell]] = Gen.containerOf[Vector, Cell](cellGen)

  test("W2 grouping invariant: partition of the gated input, x-monotone rows, y-monotone row order") {
    forAll(cellsGen) { cells =>
      val rows = TableDetect.extractTableRows(cells)
      val gated = cells.filter(c => c.conf >= 0.5 && c.y1 >= 1500 && c.y1 <= 3300)
      // every kept box exactly once
      assert(rows.flatten.sorted(Ordering.by((c: Cell) => (c.y1, c.x1, c.x2))) ==
        gated.sorted(Ordering.by((c: Cell) => (c.y1, c.x1, c.x2))))
      // within-row x-center monotone
      for (r <- rows; p <- r.sliding(2) if p.length == 2)
        assert(p(0).xCenter <= p(1).xCenter)
      // row order y-monotone by first-element y-center (rows close in
      // y-sorted order, so each row's min y-center is non-decreasing)
      val mins = rows.map(_.map(_.yCenter).min)
      for (p <- mins.sliding(2) if p.length == 2) assert(p(0) <= p(1) + 20.0)
    }
  }

  test("W3 cascade dedupe is idempotent and order-preserving") {
    forAll(cellsGen) { cells =>
      val sorted = cells.sortBy(_.xCenter)
      val once = TableDetect.cascadeDedupe(sorted)
      assert(TableDetect.cascadeDedupe(once) == once)
      assert(once.map(_.x1).sliding(2).forall(p => p.length < 2 || math.abs(p(1) - p(0)) > 50 || p(0) == p(1) && false))
      // survivors are a subsequence of the input
      var i = 0
      for (c <- once) { i = sorted.indexOf(c, i); assert(i >= 0); i += 1 }
    }
  }

  test("pipeline determinism: same payload twice → identical record") {
    forAll2(Gen.choose(0, 5000), Gen.choose(0, 5)) { (c: Int, t: Int) =>
      val conv = f"conv-$c%06d"
      val g = graft.synth.TurnGen.genTurn(conv, t)
      val a = Extractor.extractOne(conv, t, g.input.text)
      val b = Extractor.extractOne(conv, t, g.input.text)
      assert(a == b)
      assert(Json.turnJson(a) == Json.turnJson(b))
    }
  }

  test("total_score equals sum of displayed numeric scores") {
    forAll(Gen.choose(0, 5000)) { (c: Int) =>
      val conv = f"conv-$c%06d"
      val g = graft.synth.TurnGen.genTurn(conv, 0)
      val got = Extractor.extractOne(conv, 0, g.input.text)
      val numeric = got.scores.collect { case s if s.score.forall(_.isDigit) => s.score.toInt }
      assert(got.total_score == numeric.sum)
    }
  }

  test("span_offsets point at the exact payload substrings") {
    forAll(Gen.choose(0, 3000)) { (c: Int) =>
      val conv = f"conv-$c%06d"
      val g = graft.synth.TurnGen.genTurn(conv, 0)
      val got = Extractor.extractOne(conv, 0, g.input.text)
      // every offset range must be a non-empty in-bounds slice whose
      // text appears verbatim in extracted_text
      for (o <- got.span_offsets) {
        assert(o.start >= 0 && o.end <= g.input.text.length && o.start < o.end)
        val frag = g.input.text.substring(o.start, o.end)
        assert(got.extracted_text.contains(frag), s"missing fragment '$frag'")
      }
    }
  }

  test("extraction over a CharsView payload equals extraction over the String") {
    // the Spark boundary hands the core a reused char-buffer view; the
    // result must be indistinguishable from the String path across the
    // full workload mix (all dialects, all templates)
    val view = new CharsView
    for (i <- 0 until 600) {
      val g = graft.synth.TurnGen.genTurn(f"conv-cv-$i%05d", 0)
      val str = g.input.text
      view.ensure(str.length)
      str.getChars(0, str.length, view.arr, 0)
      view.len = str.length
      val a = Extractor.extractOne("c", 0, str)
      val b = Extractor.extractOne("c", 0, view)
      assert(a == b, s"CharsView path diverged on turn $i (${g.input.tool})")
    }
  }
}
