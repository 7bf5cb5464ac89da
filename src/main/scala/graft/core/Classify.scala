package graft.core

/** Deterministic cell/glyph classifier — replaces the reference's MNIST
  * CNNs (app.py:45-46; cnn_train/mnist_train_ext.py) with a rule-based
  * classifier over glyph spans, per the graft mandate (SURVEY.md §2.9).
  *
  * Class convention is the serve-side one (app.py:219, authoritative):
  * 0..9 digits, 10 = '-', 11 = 'x'. Confidence is the glyph span's own
  * legibility score (the analog of the CNN softmax max).
  */
object Classify {

  /** Glyph text → class 0..11; None = unreadable, the analog of
    * preprocess_image returning None (utils/table_rec.py:63-65) — the
    * caller silently skips such cells, as the reference does. */
  def glyphClass(txt: String): Option[Int] = {
    val c = glyphClassId(txt)
    if (c < 0) None else Some(c)
  }

  /** Allocation-free form: class 0..11, or -1 = unreadable. */
  def glyphClassId(txt: String): Int = {
    val t = txt.trim
    if (t.length == 1) classOfChar(t.charAt(0)) else -1
  }

  /** Same, over the span's (possibly deferred) text — no String
    * materialization; trim uses String.trim's <= ' ' rule. */
  def glyphClassIdOf(s: Span): Int = {
    var a = 0
    var b = s.textLen
    while (a < b && s.charAtText(a) <= ' ') a += 1
    while (b > a && s.charAtText(b - 1) <= ' ') b -= 1
    if (b - a == 1) classOfChar(s.charAtText(a)) else -1
  }

  private def classOfChar(c: Char): Int = {
    if (c.isDigit) return c - '0'
    if (c == '-' || c == '—') return 10            // dash / em-dash
    if (c == 'x' || c == 'X' || c == 'х' || c == 'Х') return 11 // latin/cyrillic kha
    -1
  }

  /** Classify the content of one detected cell box: pick the glyph span
    * whose center is nearest the cell center (the analog of the
    * nearest-center contour selection in
    * utils/mnist_preprocess_cell.py:10-37), then classify it.
    *
    * Returns None when the cell is empty or its glyph unreadable — the
    * reference skips those cells without error (utils/table_rec.py:58-65).
    */
  def classifyCell(glyphs: IndexedSeq[Span], cell: Cell): Option[(Int, Double)] = {
    val g = bestGlyph(glyphs, cell)
    if (g == null) None
    else {
      val c = glyphClassIdOf(g)
      if (c < 0) None else Some((c, g.conf))
    }
  }

  /** The nearest-center glyph fully inside the cell, or null — the
    * allocation-free core of classifyCell for the hot loop. */
  def bestGlyph(glyphs: IndexedSeq[Span], cell: Cell): Span = {
    val cx = cell.xCenter; val cy = cell.yCenter
    var best: Span = null
    var bestD = Double.MaxValue
    var i = 0
    while (i < glyphs.length) {
      val g = glyphs(i)
      // fully inside the (int-truncated) cell crop, as image[y1:y2, x1:x2]
      // with map(int, cell) does in utils/table_rec.py:54-56
      if (g.x1 >= cell.x1.toInt && g.y1 >= cell.y1.toInt &&
          g.x2 <= cell.x2.toInt && g.y2 <= cell.y2.toInt) {
        val dx = g.xCenter - cx; val dy = g.yCenter - cy
        val d = dx * dx + dy * dy
        if (d < bestD) { bestD = d; best = g }
      }
      i += 1
    }
    best
  }

  /** Packed per-cell classification results — primitive parallel arrays,
    * no per-score boxing (a List[(Int, Double)] was ~100 B/score of
    * tuple + box + cons garbage on the hot path). */
  final class ScoreBuf(val digits: Array[Int], val probs: Array[Double], val n: Int) {
    def isEmpty: Boolean = n == 0
    def nonEmpty: Boolean = n != 0
  }
  object ScoreBuf {
    val empty = new ScoreBuf(Array.emptyIntArray, Array.emptyDoubleArray, 0)
  }

  /** Classify every cell of a selection in order, silently skipping
    * empty/unreadable cells (utils/table_rec.py:58-65). */
  def classifyCells(glyphs: IndexedSeq[Span], cells: IndexedSeq[Cell]): ScoreBuf = {
    val ds = new Array[Int](cells.length)
    val ps = new Array[Double](cells.length)
    var n = 0
    var i = 0
    while (i < cells.length) {
      val g = bestGlyph(glyphs, cells(i))
      if (g != null) {
        val c = glyphClassIdOf(g)
        if (c >= 0) { ds(n) = c; ps(n) = g.conf; n += 1 }
      }
      i += 1
    }
    new ScoreBuf(ds, ps, n)
  }
}
