package graft.core

/** Text-density boilerplate classifier — Boilerpipe/Readability-style
  * block scoring (north star; SURVEY.md §2.10). Plays the role of the
  * reference's signal-from-background separation: preprocess_general's
  * Otsu thresholding + config.json's "only these regions matter"
  * (utils/preprocess_general.py:5-35).
  *
  * Decision rules, applied per block:
  *   1. structural blocks (any cell/box/glyph span) are always content —
  *      they are the document's geometry;
  *   2. link density > 1/3 → boilerplate (nav / footer / ad blocks);
  *   3. short page-furniture in the margin zones (all spans above y=60
  *      or below y=3340, ≤ 6 words) → boilerplate (running headers,
  *      page numbers — the pdffigures-style margin rule);
  *   4. unpositioned flow text (page 9) with < 10 words → boilerplate
  *      (chat filler around the document in a transcript turn);
  *   5. everything else → content.
  */
object Boiler {

  val MaxLinkDensity  = 1.0 / 3.0
  val MarginTopY      = 60
  val MarginBottomY   = 3340
  val MarginMaxWords  = 6
  val FlowMinWords    = 10

  def isContent(b: Block): Boolean = {
    if (b.structural) return true
    if (b.linkDensity > MaxLinkDensity) return false
    var anyPositioned = false
    var allMarginal = true
    var i = 0
    while (i < b.spans.length) {
      val s = b.spans(i)
      if (s.page != 9) {
        anyPositioned = true
        if (!(s.y2 <= MarginTopY || s.y1 >= MarginBottomY)) allMarginal = false
      }
      i += 1
    }
    if (anyPositioned) !(allMarginal && b.nWords <= MarginMaxWords)
    else b.nWords >= FlowMinWords
  }

  /** Strip boilerplate blocks; returns the surviving content spans in
    * input order (two-pass exact-size array — hot path). */
  def contentSpans(blocks: Vector[Block]): Array[Span] = {
    var n = 0
    var bi = 0
    while (bi < blocks.length) {
      if (isContent(blocks(bi))) n += blocks(bi).spans.length
      bi += 1
    }
    val out = new Array[Span](n)
    var o = 0
    bi = 0
    while (bi < blocks.length) {
      val b = blocks(bi)
      if (isContent(b)) {
        var j = 0
        while (j < b.spans.length) { out(o) = b.spans(j); o += 1; j += 1 }
      }
      bi += 1
    }
    out
  }
}
