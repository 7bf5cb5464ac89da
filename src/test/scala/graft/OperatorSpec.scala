package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._

/** Per-operator unit tests for every SURVEY.md §2 row with logic,
  * including the Python-parity traps (§7.5 item 1-2). Regex
  * expectations are pinned against CPython re results (verified with
  * the exact reference patterns, app.py:123-140). */
class OperatorSpec extends AnyFunSuite {

  // ---- F2/F3: dual-regex parse, Python-parity corpus -------------
  val parity: Seq[(String, (Option[String], Option[String], Option[String]))] = Seq(
    "Всероссийская проверочная работа.Математика. 6 класс. Вариант 1" ->
      ((Some("математика"), Some("6"), Some("1"))),
    "Всероссийская проверочная работа.Русский язык. 7 класс. Вариант 1" ->
      ((Some("русский язык"), Some("7"), Some("1"))),
    "Всероссийская проверочная работа.История. 11 класс. Вариант 2" ->
      ((Some("история"), Some("11"), Some("2"))),
    // no variant digit → both patterns fail (reserve-region trigger)
    "Всероссийская проверочная работа.Математика. 7 класс. Вариант" ->
      ((None, None, None)),
    // pattern #1 fails (trailing word), #2 catches it
    "Всероссийская проверочная работа.Проверочная работа. Химия. 7 класс Вариант 3 осень" ->
      ((Some("химия"), Some("7"), Some("3"))),
    "Всероссийская проверочная работа.Проверочная работа без данных" ->
      ((None, None, None)),
    // leaked margin line: #1 fails, #2 still recovers (Python-verified)
    "ВПР 2024.Всероссийская проверочная работа.Математика. 6 класс. Вариант 1" ->
      ((Some("математика"), Some("6"), Some("1"))),
    // Python-verified misc (p1 on X. История…; double trailing dots)
    "X. История. 11 класс. Вариант 2.." -> ((Some("история"), Some("11"), Some("2"))),
    "Шапка.Предмет." -> ((None, None, None)),
    "без точек вообще 7 вариант 1" -> ((None, None, None)),
    "А. Б В. 12 пусто." -> ((None, None, None)),
    // case-insensitivity incl. Cyrillic "вариант"
    "Всероссийская проверочная работа.вариант. химия. 8 класс. вариант 3" ->
      ((Some("химия"), Some("8"), Some("3"))))

  for (((text, exp), i) <- parity.zipWithIndex)
    test(s"F2/F3 parse_hat_text parity #$i") {
      assert(Header.parseHatText(text) == exp, s"text: $text")
    }

  // ---- F1: char repair -------------------------------------------
  test("F1 repair mapping |!&?,\\n") {
    assert(Header.repair("a|b!c&d?e,f\ng") == "a1b1c8d7e.f.g")
  }

  // ---- F7: banker's rounding (pinned against CPython round(x,2)) --
  test("F7 bround2 = Python round-half-even on exact binary doubles") {
    assert(Extractor.bround2(0.125) == 0.12)
    assert(Extractor.bround2(0.135) == 0.14) // 0.135 binary is slightly above
    assert(Extractor.bround2(2.675) == 2.67) // binary slightly below
    assert(Extractor.bround2(0.645) == 0.65)
    assert(Extractor.bround2(0.155) == 0.15)
    assert(Extractor.bround2(1.0) == 1.0)
  }

  test("F7 bround2 fast path agrees with exact BigDecimal HALF_EVEN everywhere") {
    def exact(v: Double): Double =
      new java.math.BigDecimal(v)
        .setScale(2, java.math.RoundingMode.HALF_EVEN).doubleValue
    // dense grid, the x.xx5 near-tie family, and seeded random doubles
    var i = 0
    while (i <= 100000) {
      val v = i / 100000.0
      assert(Extractor.bround2(v) == exact(v), s"grid v=$v")
      i += 1
    }
    i = 0
    while (i <= 9995) {
      val v = (i * 10 + 5) / 10000.0 // 0.0005, 0.0015, ... tie candidates
      assert(Extractor.bround2(v) == exact(v), s"tie v=$v")
      val w = i / 1000.0 + 0.005
      assert(Extractor.bround2(w) == exact(w), s"tie w=$w")
      i += 1
    }
    val rng = new java.util.Random(42)
    i = 0
    while (i < 100000) {
      val v = rng.nextDouble()
      assert(Extractor.bround2(v) == exact(v), s"rand v=$v")
      i += 1
    }
  }

  // ---- W1/W2: y-sort + gap grouping fold ---------------------------
  private def cell(x: Double, y: Double, w: Double = 100, h: Double = 80, conf: Double = 0.9) =
    Cell(x, y, x + w, y + h, conf)

  test("W2 row grouping: prev-element comparison, not row anchor") {
    // y-centers 2000, 2015, 2030, 2045: each consecutive gap 15 ≤ 20,
    // but first-to-last is 45 — an anchor-based grouping would split;
    // the reference fold keeps ONE row (y_prev updates every element).
    val cells = Vector(cell(100, 1960), cell(200, 1975), cell(300, 1990), cell(400, 2005))
    val rows = TableDetect.extractTableRows(cells)
    assert(rows.length == 1 && rows(0).length == 4)
  }

  test("W2 new row on gap > 20 and within-row x-center sort") {
    val cells = Vector(cell(300, 1960), cell(100, 1960), cell(200, 2100), cell(50, 2100))
    val rows = TableDetect.extractTableRows(cells)
    assert(rows.length == 2)
    assert(rows(0).map(_.x1) == Vector(100.0, 300.0))
    assert(rows(1).map(_.x1) == Vector(50.0, 200.0))
  }

  test("P2 conf and y-band gates (y1 bounds, not center)") {
    val cells = Vector(
      cell(100, 1499), cell(200, 1500), cell(300, 3300), cell(400, 3301),
      cell(500, 2000, conf = 0.49), cell(600, 2000, conf = 0.5))
    val kept = TableDetect.extractTableRows(cells).flatten
    assert(kept.map(_.x1).toSet == Set(200.0, 300.0, 600.0))
  }

  // ---- W3: cascade dedupe ------------------------------------------
  test("W3 cascade dedupe pops repeatedly against the same survivor") {
    // x1: 0, 30, 60, 90, 200 — a lag-based filter would keep 0,60,200
    // (each consecutive gap 30); the reference cascade keeps 0 and 200:
    // 30,60,90 all pop against survivor 0 (gaps 30,60?… no: after
    // popping 30, next compares 60-0=60>50 → kept). Expected: 0,60,200.
    val v = Vector(0, 30, 60, 90, 200).map(x => cell(x, 2000))
    assert(TableDetect.cascadeDedupe(v).map(_.x1) == Vector(0.0, 60.0, 200.0))
    // and a true cascade: 0, 40, 45, 48, 120 → 40,45,48 all pop vs 0
    val w = Vector(0, 40, 45, 48, 120).map(x => cell(x, 2000))
    assert(TableDetect.cascadeDedupe(w).map(_.x1) == Vector(0.0, 120.0))
  }

  // ---- P5/P6: cell selection branches ------------------------------
  private def row(y: Double, xs: Seq[Double], w: Double = 100): Vector[Cell] =
    xs.map(x => cell(x, y, w)).toVector

  test("P6 filter_cells: 2 rows → [1:-2] both") {
    val rows = Vector(row(1960, Seq(0, 110, 220, 330, 440)), row(2100, Seq(0, 110, 220, 330, 440)))
    val Some((t, m)) = TableDetect.filterCells(rows)
    assert(t.map(_.x1) == Vector(110.0, 220.0) && m.map(_.x1) == Vector(110.0, 220.0))
  }

  test("P6 filter_cells: 4 rows, wide label → [1:] ++ [1:-2]") {
    val a = Seq(0.0, 210, 320, 430)
    val rows = Vector(row(1960, a), row(2100, a),
      row(2400, Seq(0.0, 210, 320, 430, 540), w = 100).updated(0, Cell(0, 2400, 200, 2480, 0.9)),
      row(2540, Seq(0.0, 210, 320, 430, 540)))
    val Some((t, m)) = TableDetect.filterCells(rows)
    assert(t.length == 3 + 2 && m.length == 3 + 2) // 3 from band A [1:], 2 from band B [1:-2]
  }

  test("P6 filter_cells: 4 rows, equal widths → [1:] ++ [:-2]") {
    val a = Seq(0.0, 210, 320, 430)
    val rows = Vector(row(1960, a), row(2100, a),
      row(2400, Seq(0.0, 210, 320, 430, 540)), row(2540, Seq(0.0, 210, 320, 430, 540)))
    val Some((t, m)) = TableDetect.filterCells(rows)
    assert(t.length == 3 + 3 && m.length == 3 + 3) // band B [:-2] keeps its label cell
  }

  test("P6 filter_cells: 6 rows → rows 1,4 and 2,5") {
    val title = row(1900, Seq(0.0), w = 2000)
    val a = Seq(0.0, 210, 320, 430)
    val b = Seq(0.0, 210, 320, 430, 540)
    val rows = Vector(title, row(2000, a), row(2140, a),
      row(2300, Seq(0.0), w = 2000).map(_.copy(y1 = 2300, y2 = 2380)), row(2400, b), row(2540, b))
    val Some((t, m)) = TableDetect.filterCells(rows)
    assert(t.length == 3 + 2 && m.length == 3 + 2)
  }

  test("P6 filter_cells: odd count → drop rows with ≤3 cells, else fail") {
    val a = Seq(0.0, 210, 320, 430)
    val stray = row(3000, Seq(0.0, 210)) // 2 cells ≤ 3 → dropped
    val rows = Vector(row(1960, a), row(2100, a),
      row(2400, Seq(0.0, 210, 320, 430, 540)), row(2540, Seq(0.0, 210, 320, 430, 540)), stray)
    assert(TableDetect.filterCells(rows).isDefined)
    // 3 rows of ≥4 cells each → filter keeps all 3 → still odd → None
    val bad = Vector(row(1960, a), row(2100, a), row(2400, a))
    assert(TableDetect.filterCells(bad).isEmpty)
  }

  // ---- M3/M4: classifier -------------------------------------------
  test("M3 glyph classes: digits, dash→10, x/х→11, unreadable→None") {
    assert(Classify.glyphClass("7").contains(7))
    assert(Classify.glyphClass("-").contains(10))
    assert(Classify.glyphClass("x").contains(11))
    assert(Classify.glyphClass("х").contains(11)) // cyrillic kha
    assert(Classify.glyphClass("X").contains(11))
    assert(Classify.glyphClass("Баллы").isEmpty)
    assert(Classify.glyphClass("12").isEmpty) // multi-digit cell is unreadable
    assert(Classify.glyphClass("").isEmpty)
  }

  test("M3 classifyCells: in-order, unreadable and empty cells skipped silently") {
    def glyphAt(x: Int, y: Int, t: String, conf: Double) =
      Span(0, x, y, x + 30, y + 40, "g", t, conf, -1, -1)
    def cellAt(x: Int, y: Int) = Cell(x - 10, y - 10, x + 40, y + 50, 0.9)
    val glyphs = Vector(
      glyphAt(100, 2000, "5", 0.97), glyphAt(300, 2000, "Ы", 0.9),
      glyphAt(500, 2000, "-", 0.8), glyphAt(700, 2000, "x", 0.75))
    val cells = Vector(
      cellAt(100, 2000), cellAt(300, 2000), // second is unreadable → skipped
      cellAt(900, 2000),                    // empty cell → skipped
      cellAt(500, 2000), cellAt(700, 2000))
    val r = Classify.classifyCells(glyphs, cells)
    assert(r.n == 3)
    assert(r.digits.take(3).toSeq == Seq(5, 10, 11))
    assert(r.probs.take(3).toSeq == Seq(0.97, 0.8, 0.75))
  }

  // ---- code path ----------------------------------------------------
  private def g(x: Int, y: Int, w: Int, h: Int, t: String) =
    Span(0, x, y, x + w, y + h, "g", t, 1.0, -1, -1)
  private val frame = Span(0, 1540, 100, 2340, 360, "box", "", 1.0, -1, -1)
  private val noise = Vector(g(1570, 150, 30, 80, "К"), g(1615, 150, 30, 80, "о"), g(1660, 150, 30, 80, "д"))

  test("code: drop-3 then digit fold") {
    val digits = Vector(g(1720, 140, 40, 120, "4"), g(1780, 140, 40, 120, "7"))
    assert(CodeRec.recognizeCode(frame +: (noise ++ digits)) == Right(Some("47")))
  }
  test("code: only noise after drop-3 → None without error") {
    assert(CodeRec.recognizeCode(frame +: noise) == Right(None))
  }
  test("code: empty region → Left (the caught-exception path)") {
    assert(CodeRec.recognizeCode(Vector.empty).isLeft)
  }
  test("code: area ≤ 100 specks are filtered (P3)") {
    val speck = g(1700, 300, 8, 8, "0") // area 64
    val digits = Vector(g(1720, 140, 40, 120, "5"))
    assert(CodeRec.recognizeCode(frame +: (noise ++ Vector(speck) ++ digits)) == Right(Some("5")))
  }
  test("code: classes 10/11 concatenate as '10'/'11' (reference str(argmax) quirk)") {
    val digits = Vector(g(1720, 140, 40, 120, "x"), g(1780, 140, 40, 120, "3"))
    assert(CodeRec.recognizeCode(frame +: (noise ++ digits)) == Right(Some("113")))
  }
  test("code: glyphs outside the 10px-shrunk frame are invisible") {
    val edge = g(1541, 140, 40, 120, "9") // x1 < frame.x1+10
    val in = g(1720, 140, 40, 120, "2")
    assert(CodeRec.recognizeCode(frame +: (noise ++ Vector(edge, in))) == Right(Some("2")))
  }

  // ---- W6: reading-order serialization ------------------------------
  test("W6 serializeRegion: y-then-x lines, spaces within, newlines between") {
    val spans = Vector(
      Span(0, 300, 100, 400, 140, "w", "b", 1.0, -1, -1),
      Span(0, 100, 100, 200, 140, "w", "a", 1.0, -1, -1),
      Span(0, 100, 200, 200, 240, "w", "c", 1.0, -1, -1),
      Span(0, 2000, 100, 2100, 140, "w", "far", 1.0, -1, -1)) // outside hat
    assert(Header.serializeRegion(spans, Layouts.Hat) == "a b\nc")
  }

  // ---- A1/W5: assembly semantics ------------------------------------
  test("A1/W5 special digits excluded from total; digits beyond tasks ignored") {
    import graft.synth._
    val spec = Synth.PageSpec("Математика", "6", "1", 0, false, None, false,
      Some("математика 6"), Synth.ConfigClean,
      Vector(Synth.CellSpec(5, 1.0), Synth.CellSpec(10, 1.0), Synth.CellSpec(11, 0.5),
        Synth.CellSpec(3, 1.0), Synth.CellSpec(0, 1.0), Synth.CellSpec(1, 1.0),
        Synth.CellSpec(2, 1.0), Synth.CellSpec(1, 1.0), Synth.CellSpec(1, 1.0),
        Synth.CellSpec(1, 1.0), Synth.CellSpec(1, 1.0), Synth.CellSpec(1, 1.0),
        Synth.CellSpec(4, 1.0)),
      7, "pdf", false, false, false, false)
    val (p, _, _) = Render.payload(spec)
    val got = Extractor.extractOne("c", 0, p)
    assert(got.total_score == 5 + 3 + 0 + 1 + 2 + 1 + 1 + 1 + 1 + 1 + 4)
    assert(got.scores.map(_.score) == Seq("5", "-", "x", "3", "0", "1", "2", "1", "1", "1", "1", "1", "4"))
    assert(got.warnings.exists(_.exists(_ == Messages.LowConfPrefix + "3")))
  }
}
