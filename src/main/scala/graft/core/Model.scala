package graft.core

/** Core data model — pure Scala, no Spark imports, so every extraction
  * stage is unit-testable without a SparkSession and the whole per-turn
  * pipeline runs as ONE fused per-row map (single encoder boundary, on
  * the output side only — inputs are consumed as CharSequence views).
  *
  * Shapes mirror the reference's abstractions (see SURVEY.md §1):
  *  - `Span`  ≈ a positioned text fragment on the canonical 2480×3505
  *    virtual grid (the analog of the reference's canonical raster,
  *    app.py:88-90), plus byte offsets into the original payload.
  *  - `Cell`  ≈ a detection box `[x1,y1,x2,y2] + conf`
  *    (utils/Yolo_cell_rec.py:34,44).
  *  - `ExtractedTurn` ≈ the response record (app.py:231-240) keyed by
  *    (conv_id, turn_idx), extended with extracted_text + span_offsets
  *    (north-star requirement).
  */
object Grid {
  /** Canonical page size — reference resizes every input to exactly this
    * (app.py:88-90, A4 @ 300 DPI). All bbox configs assume it. */
  val Width  = 2480
  val Height = 3505
}

/** Axis-aligned box, pixel coords on the canonical grid. */
final case class Bbox(x1: Int, y1: Int, x2: Int, y2: Int) {
  def width: Int  = x2 - x1
  def height: Int = y2 - y1
  def area: Long  = width.toLong * height.toLong
  /** Full containment — a span partially outside a pixel crop would be
    * garbled glyphs in the reference (app.py:93-96), so our semantic is
    * "readable iff fully inside". */
  def containsFully(s: Span): Boolean =
    s.x1 >= x1 && s.y1 >= y1 && s.x2 <= x2 && s.y2 <= y2
}

/** One positioned text fragment emitted by the tokenizer.
  *
  * kind: "w" word (hat/prose), "g" glyph (handwritten digit/mark),
  *       "cell" table-cell detection box (text empty),
  *       "box"  code-frame box (text empty).
  * conf: detection/legibility confidence in [0,1] — plays the role of
  *       YOLO box conf (kind=cell/box) or classifier softmax max
  *       (kind=g), both of which the reference gets from its models.
  * (start,end): char offsets of `text` in the original payload (for the
  *       span_offsets output; -1,-1 when the span carries no text). */
final case class Span(
    var page: Int,
    var x1: Int, var y1: Int, var x2: Int, var y2: Int,
    var kind: String,
    var text: String,
    var conf: Double,
    var start: Int,
    var end: Int,
    var src: CharSequence = null) {
  def yCenter: Double = (y1 + y2) / 2.0
  def xCenter: Double = (x1 + x2) / 2.0
  def area: Long      = (x2 - x1).toLong * (y2 - y1).toLong

  // Deferred text: tokenizers emitting payload-verbatim fragments pass
  // text = null and a shared `src` payload reference — the per-span
  // String (header + char copy) was measured GC churn at 32 threads.
  // Literal spans (generator, tests, empty cell/box text) keep `text`.
  def textLen: Int = if (text != null) text.length else end - start
  def charAtText(i: Int): Char =
    if (text != null) text.charAt(i) else src.charAt(start + i)
  /** Materialize (cold paths / tests only — hot paths use appendTo). */
  def textStr: String = if (text != null) text else src.subSequence(start, end).toString
  def appendTo(sb: java.lang.StringBuilder): Unit =
    if (text != null) sb.append(text) else sb.append(src, start, end)
}

/** Reusable char-array view of one turn's payload — the per-thread
  * decode target for the Spark boundary (UTF8String bytes → UTF-16
  * without a fresh java.lang.String per turn; Pipeline.decodeUtf8).
  * Same lifetime contract as SpanPool: valid until the thread's next
  * turn. The core consumes payloads as CharSequence, so tests and the
  * generator keep passing plain Strings. */
final class CharsView extends CharSequence {
  var arr: Array[Char] = new Array[Char](4096)
  var len: Int = 0
  def length: Int = len
  def charAt(i: Int): Char = arr(i)
  def subSequence(st: Int, en: Int): CharSequence = new String(arr, st, en - st)
  override def toString: String = new String(arr, 0, len)
  def ensure(cap: Int): Unit =
    if (arr.length < cap) arr = new Array[Char](math.max(cap, arr.length * 2))
}

/** Per-thread Span recycler for the tokenizer hot path. Spans live only
  * for one turn (the fused per-turn map consumes them fully and emits
  * plain strings/offsets; Span is never Spark-encoded), so the tokenizer
  * rents instances that are reset at the START of the next tokenize on
  * the same thread — ~65 spans × ~80 B/turn of garbage becomes zero
  * steady-state. Generator/test spans use the constructor and are
  * untouched. RULE: a tokenize result must be fully consumed before the
  * same thread tokenizes again (true everywhere: the pipeline is one
  * fused map per turn; Render's plain-dialect re-tokenize is consumed
  * inside the same genTurn call). */
final class SpanPool {
  private var arr = new Array[Span](256)
  private var n = 0
  /** Reusable span buffer for the positioned dialects (cleared, not
    * reallocated, per tokenize — same lifetime contract as the spans). */
  val scratch = new scala.collection.mutable.ArrayBuffer[Span](128)
  def reset(): Unit = { n = 0; scratch.clear() }
  def next(page: Int, x1: Int, y1: Int, x2: Int, y2: Int, kind: String,
      text: String, conf: Double, start: Int, end: Int, src: CharSequence): Span = {
    if (n == arr.length) arr = java.util.Arrays.copyOf(arr, arr.length * 2)
    var s = arr(n)
    if (s == null) {
      s = new Span(page, x1, y1, x2, y2, kind, text, conf, start, end, src)
      arr(n) = s; n += 1
      s
    } else {
      n += 1
      s.page = page; s.x1 = x1; s.y1 = y1; s.x2 = x2; s.y2 = y2
      s.kind = kind; s.text = text; s.conf = conf
      s.start = start; s.end = end; s.src = src
      s
    }
  }
}

object SpanPool {
  private val tl = ThreadLocal.withInitial(() => new SpanPool)
  def get(): SpanPool = tl.get()
}

/** Detection box, float coords — mirrors YOLO xyxy output
  * (utils/Yolo_cell_rec.py:44). */
final case class Cell(x1: Double, y1: Double, x2: Double, y2: Double, conf: Double) {
  def yCenter: Double = (y1 + y2) / 2.0
  def xCenter: Double = (x1 + x2) / 2.0
  def width: Double   = x2 - x1
}

/** One table layout entry of config.json (keyed "{subject} {grade}"). */
final case class TableLayout(
    table: Bbox,
    totalCells: Int,
    rows: Int,
    taskNumbers: String)

/** One scored task — score kept as string to carry '-' / 'x'
  * (app.py:219) without a union type; order in the Seq IS the task
  * order (Python dict insertion order in the reference response). */
final case class ScoreEntry(task: String, score: String, prob: Double)

/** (start,end) char offsets into the original turn payload. */
final case class SpanOffset(start: Int, end: Int)

/** Input row — exactly the driver input_hint shape. */
final case class TurnInput(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: java.sql.Timestamp)

/** Output row ≈ reference response record (app.py:231-240) +
  * extracted_text/span_offsets. errors/warnings are None when empty,
  * mirroring `errors if errors else None` (app.py:238-239). */
final case class ExtractedTurn(
    conv_id: String,
    turn_idx: Int,
    subject: Option[String],
    grade: Option[String],
    variant: Option[String],
    participant_code: Option[String],
    total_score: Int,
    scores: Seq[ScoreEntry],
    extracted_text: String,
    span_offsets: Seq[SpanOffset],
    errors: Option[Seq[String]],
    warnings: Option[Seq[String]])

object Messages {
  // Byte-for-byte the reference's user-facing strings (app.py).
  val HeaderError  = "Не удалось определить предмет, класс или вариант" // app.py:174
  val CodeError    = "Не удалось распознать код участника"              // app.py:191
  val TableError   = "Не удалось распознать таблицу"                    // app.py:208
  val ConfigMissWarning = "Не найдена существующая конфигурация для таблиц" // app.py:183
  val LowConfPrefix = "Низкая уверенность в заданиях: "                 // app.py:229
  // Row-level analog of the reference's HTTP-500 catch-all (app.py:242-245)
  val ProcessingErrorPrefix = "Не удалось обработать документ: "
}
