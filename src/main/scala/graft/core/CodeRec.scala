package graft.core

/** Participant-code recognition — the span-grid analog of the contour
  * pipeline in utils/code_rec.py:9-99:
  *
  *   1. orientation correction (code_rec.py:35-37) — our synth payloads
  *      are upright, kept as a named identity stage for parity;
  *   2. largest component = the code frame box (code_rec.py:46-47);
  *   3. crop the frame, shrink by padding 10 px each side, clamped
  *      (code_rec.py:49-53);
  *   4. components inside the crop with area > 100 px² (:65-66);
  *   5. x-sort, drop the 3 leftmost (form-label noise, :69-72);
  *   6. classify each remaining glyph, concatenate `str(argmax)`
  *      (:84-97 — note class 10/11 would concatenate as "10"/"11",
  *      faithfully reproduced).
  *
  * Returns Left(()) where the reference would raise (caught at
  * app.py:188-191 → error string, code = null), Right(None) where it
  * returns None without error (no glyphs left after drop-3), and
  * Right(Some(code)) on success.
  */
object CodeRec {

  val MinGlyphArea = 100L // code_rec.py:65-66
  val Padding      = 10   // code_rec.py:49

  /** Identity orientation stage (parity with code_rec.py:35-37). */
  def correctOrientation(spans: IndexedSeq[Span]): IndexedSeq[Span] = spans

  def recognizeCode(regionSpans: IndexedSeq[Span]): Either[Unit, Option[String]] = {
    val spans = correctOrientation(regionSpans)
    if (spans.isEmpty) return Left(()) // max() on empty contours raises
    // Largest component = code frame. All spans compete, as all contours
    // do in the reference; the frame box is by construction the biggest.
    val frame = spans.maxBy(_.area)
    // Shrink by padding, clamp to non-negative extent.
    val cx1 = frame.x1 + Padding
    val cy1 = frame.y1 + Padding
    val cx2 = math.max(cx1, frame.x2 - Padding)
    val cy2 = math.max(cy1, frame.y2 - Padding)
    val crop = Bbox(cx1, cy1, cx2, cy2)
    // Digit components: glyph spans fully inside the crop, big enough.
    val inside = spans.filter(s =>
      s.kind == "g" && crop.containsFully(s) && s.area > MinGlyphArea)
    val sorted  = Sorts.sorted(inside, Sorts.spanByX1)
    val dropped = sorted.drop(3) // 3 leftmost = label noise (:69-72)
    if (dropped.isEmpty) return Right(None) // :74-75, no error
    val sb = new StringBuilder
    for (g <- dropped) {
      // preprocess failure → silently skipped (:94-97 via :91-92)
      val c = Classify.glyphClassIdOf(g)
      if (c >= 0) sb.append(c.toString)
    }
    Right(Some(sb.toString))
  }
}
