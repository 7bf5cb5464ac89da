package graft.core

import java.math.RoundingMode

/** The fused per-turn extraction pipeline — a faithful port of the
  * /recognize request lifecycle (app.py:150-240), §3.1 of SURVEY.md,
  * re-expressed over the span grid:
  *
  *   tokenize → boilerplate strip → hat parse (+ reserve-region retry)
  *   → config lookup → code recognition → table recognition
  *   (config path → no-config fallback → extra-detector fallback)
  *   → score assembly.
  *
  * Pure function: one payload string in, one ExtractedTurn out. Runs
  * inside a single typed mapPartitions on the cluster (one encoder
  * boundary, whole pipeline JVM-fused — SURVEY.md §4 item 4).
  */
object Extractor {

  /** Total function over arbitrary payloads: any parse/geometry failure
    * becomes an error ROW (the row-level analog of the reference's
    * HTTP-500 catch-all, app.py:242-245) — a malformed turn must never
    * fail a task on a 10^12-turn corpus. The error string carries only
    * the exception class, keeping output deterministic. */
  def extractOne(convId: String, turnIdx: Int, payload: CharSequence): ExtractedTurn =
    try extractOneUnsafe(convId, turnIdx, payload)
    catch {
      case scala.util.control.NonFatal(e) =>
        ExtractedTurn(convId, turnIdx, None, None, None, None, 0, Vector.empty,
          "", Vector.empty,
          Some(Vector(Messages.ProcessingErrorPrefix + e.getClass.getSimpleName)),
          None)
    }

  private def extractOneUnsafe(convId: String, turnIdx: Int, payload: CharSequence): ExtractedTurn = {
    val errors   = Vector.newBuilder[String]
    val warnings = Vector.newBuilder[String]

    // Tokenize + boilerplate strip (S4/S5 + §2.10). One exact-size
    // array of surviving spans; consumers filter in place (their
    // predicates all carry the page==0 check), so no intermediate
    // per-stage collections are materialized.
    val blocks  = Tokenizer.tokenize(payload)
    val contentArr = Boiler.contentSpans(blocks)
    val content = scala.collection.immutable.ArraySeq.unsafeWrapArray(contentArr)
    val glyphs  = {
      var n = 0; var i = 0
      while (i < contentArr.length) {
        val s = contentArr(i); if (s.kind == "g" && s.page == 0) n += 1; i += 1
      }
      val a = new Array[Span](n); var o = 0; i = 0
      while (i < contentArr.length) {
        val s = contentArr(i); if (s.kind == "g" && s.page == 0) { a(o) = s; o += 1 }; i += 1
      }
      scala.collection.immutable.ArraySeq.unsafeWrapArray(a)
    }

    // Hat extraction with reserve-region retry (app.py:162-174)
    var (subjOpt, gradeOpt, varOpt, _) = Header.recognizeHat(content, Layouts.Hat)
    if (isMissing(subjOpt) || isMissing(gradeOpt)) {
      val retry = Header.recognizeHat(content, Layouts.HatReserve)
      subjOpt = retry._1; gradeOpt = retry._2; varOpt = retry._3
    }
    if (isMissing(subjOpt) || isMissing(gradeOpt)) {
      errors += Messages.HeaderError
    }

    // Config lookup (app.py:177-183). NOTE the reference mutates
    // `subject` here: output subject is lowercased AND space-stripped.
    var subject = subjOpt
    var key: Option[String] = None
    if (!isMissing(subjOpt) && !isMissing(gradeOpt)) {
      subject = subjOpt.map(_.replace(" ", ""))
      val k = s"${subject.get} ${gradeOpt.get}"
      if (Layouts.configs.contains(k)) key = Some(k)
      else warnings += Messages.ConfigMissWarning
    }

    // Participant code (app.py:186-191)
    val codeSpans = content.filter(s => s.page == 0 && Layouts.Code.containsFully(s))
    val code: Option[String] = CodeRec.recognizeCode(codeSpans) match {
      case Left(_)  => errors += Messages.CodeError; None
      case Right(c) => c
    }

    // Table recognition: config path → noconf → extra detector
    // (app.py:193-201)
    var taskNumbers: List[String] = Nil
    var digits: Classify.ScoreBuf = Classify.ScoreBuf.empty
    // Detect+group once for the main detector — the config path and the
    // first fallback run on identical detections (same rescore).
    val mainRows = TableDetect.extractTableRows(
      TableDetect.detectCells(content, TableDetect.MainDetector))
    key.foreach { k =>
      val cfg = Layouts.configs(k)
      TableDetect.recognizeTableFromRows(mainRows, glyphs, cfg) match {
        case Some(d) =>
          digits = d
          taskNumbers = Layouts.taskLists(k)
        case None => ()
      }
    }
    if (key.isEmpty || digits.isEmpty) {
      val all = TableDetect.recognizeTableAllFromRows(mainRows, glyphs)
        .filter(_._2.nonEmpty)
        .orElse(TableDetect.recognizeTableAll(content, glyphs, TableDetect.ExtraDetector))
      all match {
        case Some((t, d)) => taskNumbers = t; digits = d
        case None         => taskNumbers = Nil; digits = Classify.ScoreBuf.empty
      }
    }

    // Assembly (app.py:204-229)
    val scores = Vector.newBuilder[ScoreEntry]
    var total = 0
    if (digits.isEmpty) {
      errors += Messages.TableError
    } else {
      val lowConf = Vector.newBuilder[String]
      var anyLow = false
      // positional zip truncated to the shorter side (app.py:213-220)
      var rem = taskNumbers
      var i = 0
      while (i < digits.n && rem.nonEmpty) {
        val digit = digits.digits(i)
        val prob = bround2(digits.probs(i))
        val task = rem.head
        val display =
          if (digit == 10) "-" else if (digit == 11) "x" else digit.toString
        scores += ScoreEntry(task, display, prob)
        if (prob < 0.6) { lowConf += task; anyLow = true }
        if (digit != 10 && digit != 11) total += digit
        rem = rem.tail
        i += 1
      }
      if (anyLow)
        warnings += Messages.LowConfPrefix + lowConf.result().mkString(", ")
    }

    // extracted_text + span_offsets (north star): reading-order
    // serialization of the surviving content text spans. First-page-only
    // rule (O4, app.py:62): page>0 spans are invisible; page 9 is the
    // off-grid home of kept flow text.
    val (extractedText, offsets) = serializeContent(content)

    val errs  = errors.result()
    val warns = warnings.result()
    ExtractedTurn(
      conv_id = convId,
      turn_idx = turnIdx,
      // Python None → null, but a matched-empty capture group stays ""
      // in the response — preserved verbatim (no empty-to-null cleanup).
      subject = subject,
      grade = gradeOpt,
      variant = varOpt,
      participant_code = code,
      total_score = total,
      scores = scores.result(),
      extracted_text = extractedText,
      span_offsets = offsets,
      errors = if (errs.nonEmpty) Some(errs) else None,
      warnings = if (warns.nonEmpty) Some(warns) else None)
  }

  /** Python truthiness: None and "" are both "missing" (app.py:168,173). */
  private def isMissing(o: Option[String]): Boolean = o.forall(_.isEmpty)

  /** Python str.split() — whitespace-delimited, empties dropped
    * (app.py:197). */
  def splitTasks(s: String): List[String] =
    s.split("\\s+").iterator.filter(_.nonEmpty).toList

  /** Python round(float, 2) is round-half-even on the exact binary
    * double — matched by BigDecimal's exact-double constructor +
    * HALF_EVEN (NOT Spark's `round`, which is HALF_UP; SURVEY.md F7).
    *
    * Fast path: v*100 carries ≤ |v|*100*2⁻⁵² relative error, so when its
    * fractional part is farther than 1e-9 from the 0.5 tie the rounding
    * direction of the exact decimal expansion is already decided and no
    * BigDecimal is needed (the per-score BigDecimal pair was measured
    * GC churn). Only near-ties take the exact slow path. */
  def bround2(v: Double): Double = {
    val scaled = v * 100.0
    val fl = Math.floor(scaled)
    val frac = scaled - fl
    if (Math.abs(frac - 0.5) > 1e-9)
      (if (frac > 0.5) fl + 1.0 else fl) / 100.0
    else
      new java.math.BigDecimal(v).setScale(2, RoundingMode.HALF_EVEN).doubleValue
  }

  /** Reading-order serialization of content spans that carry text:
    * order by (page, y1, x1); words on one line joined by ' ', lines by
    * '\n'. First-page-only rule (O4, app.py:62) folded in: page>0 spans
    * are invisible, page 9 is the off-grid home of kept flow text.
    * Offsets into the original payload for every serialized span that
    * has them. */
  def serializeContent(spans: IndexedSeq[Span]): (String, Vector[SpanOffset]) = {
    @inline def keep(s: Span): Boolean =
      (s.kind == "w" || s.kind == "g") && s.textLen > 0 &&
        (s.page == 0 || s.page == 9)
    // single counting pass → exact-size span array and builder capacity
    // (no filter-builder garbage, no StringBuilder growth copies)
    var n = 0; var cap = 0; var i = 0
    while (i < spans.length) {
      val s = spans(i); if (keep(s)) { n += 1; cap += s.textLen + 1 }
      i += 1
    }
    if (n == 0) return ("", Vector.empty)
    val arr = new Array[Span](n); var o = 0; i = 0
    while (i < spans.length) {
      val s = spans(i); if (keep(s)) { arr(o) = s; o += 1 }
      i += 1
    }
    java.util.Arrays.sort(arr, Sorts.spanReadingOrder)
    val sb = new java.lang.StringBuilder(cap)
    val offs = Vector.newBuilder[SpanOffset]
    var prevPage = 0
    var prevY = 0
    i = 0
    while (i < n) {
      val s = arr(i)
      if (i > 0) {
        if (s.page != prevPage || s.y1 != prevY) sb.append('\n') else sb.append(' ')
      }
      s.appendTo(sb)
      if (s.start >= 0) offs += SpanOffset(s.start, s.end)
      prevPage = s.page; prevY = s.y1
      i += 1
    }
    (sb.toString, offs.result())
  }
}
