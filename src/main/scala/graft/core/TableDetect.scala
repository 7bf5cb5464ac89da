package graft.core

/** Rule-based table-cell detection + row grouping + cell selection —
  * the Spark-first replacement for the reference's YOLO detector and its
  * downstream geometry (utils/Yolo_cell_rec.py, utils/table_rec.py,
  * utils/table_rec_noconf.py). Everything here is a pure sequential
  * function over one turn's span array: the reference's per-image
  * geometry is tiny (7–27 cells), so the parallelism axis is across
  * turns, never within a page (SURVEY.md §1.2).
  */
object TableDetect {

  /** Thresholds — named constants matching the reference defaults. */
  val ConfThreshold  = 0.5   // Yolo_cell_rec.py:6,34
  val MinY           = 1500  // Yolo_cell_rec.py:6,34
  val MaxY           = 3300  // Yolo_cell_rec.py:34
  val RowThreshold   = 20.0  // Yolo_cell_rec.py:6,58
  val DupXGap        = 50.0  // table_rec.py:34; table_rec_noconf.py:110
  val WidthHeuristic = 30.0  // table_rec_noconf.py:57

  /** Detector profile — the analog of the two YOLO weight files
    * (cell_detect.pt vs cell_detect_extra.pt, app.py:47-48). The "extra"
    * detector is a higher-recall pass: it rescores faint cell boxes with
    * sqrt(conf) (contrast boost) before the standard 0.5 gate, so boxes
    * with conf ≥ 0.25 survive. Deterministic and monotone. */
  sealed trait Detector { def rescore(conf: Double): Double }
  case object MainDetector  extends Detector { def rescore(c: Double): Double = c }
  case object ExtraDetector extends Detector { def rescore(c: Double): Double = math.sqrt(c) }

  /** Span grid → detection boxes: every kind=="cell" span on page 0 is a
    * candidate cell (the detector "model call", Yolo_cell_rec.py:23). */
  def detectCells(spans: IndexedSeq[Span], det: Detector): IndexedSeq[Cell] = {
    var n = 0; var i = 0
    while (i < spans.length) {
      val s = spans(i); if (s.kind == "cell" && s.page == 0) n += 1; i += 1
    }
    val a = new Array[Cell](n); var o = 0; i = 0
    while (i < spans.length) {
      val s = spans(i)
      if (s.kind == "cell" && s.page == 0) {
        a(o) = Cell(s.x1, s.y1, s.x2, s.y2, det.rescore(s.conf)); o += 1
      }
      i += 1
    }
    scala.collection.immutable.ArraySeq.unsafeWrapArray(a)
  }

  /** Port of extract_table_rows (utils/Yolo_cell_rec.py:23-78):
    * 1. gate conf ≥ 0.5 AND 1500 ≤ y1 ≤ 3300 (the y-band is over the
    *    box TOP, not center — Yolo_cell_rec.py:34);
    * 2. sort by y-center;
    * 3. sequential gap grouping: new row when |yc - prev_yc| > 20,
    *    where prev_yc updates at EVERY element (a fold, not a
    *    lag-vs-anchor window — SURVEY.md W2 correctness trap);
    * 4. each closed row sorted by x-center. */
  def extractTableRows(cells: scala.collection.IndexedSeq[Cell]): IndexedSeq[IndexedSeq[Cell]] = {
    @inline def gate(c: Cell): Boolean =
      c.conf >= ConfThreshold && c.y1 >= MinY && c.y1 <= MaxY
    // exact-size gate pass; rows are contiguous runs of the y-sorted
    // array, each x-sorted in place and emitted as a slice
    var n = 0; var i = 0
    while (i < cells.length) { if (gate(cells(i))) n += 1; i += 1 }
    if (n == 0) return Vector.empty
    val arr = new Array[Cell](n); var o = 0; i = 0
    while (i < cells.length) { val c = cells(i); if (gate(c)) { arr(o) = c; o += 1 }; i += 1 }
    java.util.Arrays.sort(arr, Sorts.cellByYCenter)
    val rows = Vector.newBuilder[IndexedSeq[Cell]]
    var from = 0
    def close(until: Int): Unit = {
      java.util.Arrays.sort(arr, from, until, Sorts.cellByXCenter)
      rows += scala.collection.immutable.ArraySeq.unsafeWrapArray(
        java.util.Arrays.copyOfRange(arr, from, until))
      from = until
    }
    // prev-element gap semantics: yPrev updates at EVERY element (W2)
    var yPrev = arr(0).yCenter
    i = 1
    while (i < arr.length) {
      val yc = arr(i).yCenter
      if (math.abs(yc - yPrev) > RowThreshold) close(i)
      yPrev = yc
      i += 1
    }
    close(arr.length)
    rows.result()
  }

  /** Cascade near-duplicate dedupe (utils/table_rec.py:28-37;
    * table_rec_noconf.py:104-113): sequential while-pop — drop the next
    * cell when next.x1 - cur.x1 ≤ 50, and after a pop the SAME `cur` is
    * compared against the new next (pops cascade). NOT expressible as a
    * lag filter; must be this fold (SURVEY.md W3 trap). */
  def cascadeDedupe(cells: IndexedSeq[Cell]): IndexedSeq[Cell] = {
    if (cells.length < 2) return cells
    val out = Vector.newBuilder[Cell]
    var cur = cells(0)
    out += cur
    var i = 1
    while (i < cells.length) {
      val next = cells(i)
      if (math.abs(next.x1 - cur.x1) > DupXGap) {
        out += next
        cur = next
      }
      i += 1
    }
    out.result()
  }

  /** Config-path cell selection + recognition — the intended semantics
    * of recognize_table (utils/table_rec.py:10-97):
    *  - rows==1 layouts: detector sees [header row, value row]; take the
    *    value row minus the left label cell and the two trailing
    *    sum/signature cells: rows(1)[1:-2]  (table_rec.py:24).
    *  - rows==2 layouts: detector sees two header+value band pairs; take
    *    rows(1)[1:] ++ rows(3)[1:-2]        (table_rec.py:26).
    *  - anything else → None → caller falls back to the no-config path.
    *
    * DELIBERATE DEVIATION from the literal reference: table_rec.py:21-22
    * gates `len(table_rows) > 2 → None`, which makes its own rows==2
    * branch unreachable without an IndexError → HTTP 500 (app.py:242).
    * The committed golden fixture tests/test_data/bio7/response.json
    * carries config task names ("3.1"…"10.2"), which only the rows==2
    * branch can produce — so the intended behavior (and the one the
    * fixtures encode) is the 4-row slice. We implement the intent and
    * route every degenerate detection to the fallback instead of
    * crashing (SURVEY.md §2.2 P5).
    */
  def recognizeTable(
      spans: IndexedSeq[Span],
      glyphs: IndexedSeq[Span],
      cfg: TableLayout,
      det: Detector): Option[Classify.ScoreBuf] =
    recognizeTableFromRows(extractTableRows(detectCells(spans, det)), glyphs, cfg)

  /** Same, over pre-grouped rows — lets the caller detect+group once and
    * share the result between the config path and the same-detector
    * fallback (they run on identical detections). */
  def recognizeTableFromRows(
      rows: IndexedSeq[IndexedSeq[Cell]],
      glyphs: IndexedSeq[Span],
      cfg: TableLayout): Option[Classify.ScoreBuf] = {
    val selected: IndexedSeq[Cell] =
      if (cfg.rows == 1 && rows.length == 2)
        rows(1).slice(1, rows(1).length - 2)
      else if (cfg.rows == 2 && rows.length == 4)
        rows(1).drop(1) ++ rows(3).slice(1, rows(3).length - 2)
      else return None
    val deduped =
      if (selected.length != cfg.totalCells) cascadeDedupe(selected)
      else selected
    if (deduped.length != cfg.totalCells) return None
    // Per-cell classification; empty/unreadable cells silently skipped
    // (table_rec.py:58-65).
    Some(Classify.classifyCells(glyphs, deduped))
  }

  /** Port of filter_cells (utils/table_rec_noconf.py:25-65): split the
    * detected rows into (task-name cells, score cells) without a config.
    * Returns None when the shape is unusable. */
  def filterCells(rowsIn: IndexedSeq[IndexedSeq[Cell]])
      : Option[(IndexedSeq[Cell], IndexedSeq[Cell])] = {
    var rows = rowsIn
    if (rows.length % 2 != 0) {
      rows = rows.filter(_.length > 3) // drop stray short rows (:46)
      if (rows.length % 2 != 0) return None
    }
    rows.length match {
      case 2 =>
        Some((rows(0).slice(1, rows(0).length - 2),
              rows(1).slice(1, rows(1).length - 2)))
      case 4 =>
        // Width heuristic on the second band's header row (:54-60): a
        // wide first cell is a label → drop it; otherwise keep it and
        // trim the tail instead. (Reference would IndexError on a
        // <2-cell row → HTTP 500; we route to the failure path.)
        if (rows(2).length < 2) return None
        val firstW  = rows(2)(0).width
        val secondW = rows(2)(1).width
        if (firstW - secondW > WidthHeuristic)
          Some((rows(0).drop(1) ++ rows(2).slice(1, rows(2).length - 2),
                rows(1).drop(1) ++ rows(3).slice(1, rows(3).length - 2)))
        else
          Some((rows(0).drop(1) ++ rows(2).slice(0, rows(2).length - 2),
                rows(1).drop(1) ++ rows(3).slice(0, rows(3).length - 2)))
      case 6 =>
        Some((rows(1).drop(1) ++ rows(4).slice(1, rows(4).length - 2),
              rows(2).drop(1) ++ rows(5).slice(1, rows(5).length - 2)))
      case _ => None
    }
  }

  /** Port of recognize_table_all (utils/table_rec_noconf.py:68-179): the
    * no-config fallback. Tasks are renumbered positionally "1".."N"
    * (:119) regardless of what the page printed. */
  def recognizeTableAll(
      spans: IndexedSeq[Span],
      glyphs: IndexedSeq[Span],
      det: Detector): Option[(List[String], Classify.ScoreBuf)] =
    recognizeTableAllFromRows(extractTableRows(detectCells(spans, det)), glyphs)

  /** Same, over pre-grouped rows (see recognizeTableFromRows). */
  def recognizeTableAllFromRows(
      rows: IndexedSeq[IndexedSeq[Cell]],
      glyphs: IndexedSeq[Span]): Option[(List[String], Classify.ScoreBuf)] = {
    filterCells(rows).flatMap { case (taskCells, mnistCells0) =>
      if (taskCells.isEmpty || mnistCells0.isEmpty) None // falsy gate (:100-101)
      else {
        val mnistCells =
          if (mnistCells0.length != taskCells.length) cascadeDedupe(mnistCells0)
          else mnistCells0
        if (mnistCells.length != taskCells.length) None
        else {
          val tasks  = Layouts.positionalTasks(taskCells.length)
          val scores = Classify.classifyCells(glyphs, mnistCells)
          Some((tasks, scores))
        }
      }
    }
  }
}
