package graft.synth

import graft.core._
import Synth._

/** Independent ground-truth derivation: given a PageSpec (the logical
  * page), predict the ExtractedTurn the reference semantics demand —
  * WITHOUT running the extractor's geometry. Fields are derived from
  * first principles per app.py:150-240; only extracted_text/span_offsets
  * reuse the canonical serialization rule (they ARE the spec of that
  * rule). Golden tests compare Extractor output against this.
  */
object Expected {

  def of(convId: String, turnIdx: Int, spec: PageSpec,
      spans: Vector[Span], boiler: Vector[Boolean]): ExtractedTurn = {
    val errors   = Vector.newBuilder[String]
    val warnings = Vector.newBuilder[String]

    // header fields
    val parsed = spec.headerStyle != 2
    val subject: Option[String] =
      if (parsed) Some(spec.displaySubject.toLowerCase(java.util.Locale.ROOT).replace(" ", ""))
      else None
    val grade   = if (parsed) Some(spec.grade) else None
    val variant = if (parsed) Some(spec.variant) else None
    if (!parsed) errors += Messages.HeaderError

    // config lookup
    val key: Option[String] = if (parsed) {
      val k = s"${subject.get} ${grade.get}"
      if (Layouts.configs.contains(k)) Some(k)
      else { warnings += Messages.ConfigMissWarning; None }
    } else None

    // code
    if (spec.codeMissingBox) errors += Messages.CodeError
    val code = if (spec.codeMissingBox) None else spec.code

    // table routing
    val n = spec.cells.length
    val tableOk = spec.tableKind != NoTable && n > 0
    val tasks: List[String] =
      if (!tableOk) Nil
      else if (key.isDefined && !spec.faintCells)
        Extractor.splitTasks(Layouts.configs(key.get).taskNumbers)
      else if (spec.tableKind == NoConfEqual)
        (1 to n + 1).map(_.toString).toList // band-B label cell counted as a task slot
      else (1 to n).map(_.toString).toList

    val scores = Vector.newBuilder[ScoreEntry]
    var total = 0
    if (!tableOk) {
      errors += Messages.TableError
    } else {
      val lowConf = Vector.newBuilder[String]
      var anyLow = false
      var i = 0
      for (c <- spec.cells) {
        val prob = Extractor.bround2(c.prob)
        if (i < tasks.length) {
          val task = tasks(i)
          val display =
            if (c.cls == 10) "-" else if (c.cls == 11) "x" else c.cls.toString
          scores += ScoreEntry(task, display, prob)
          if (prob < 0.6) { lowConf += task; anyLow = true }
          if (c.cls != 10 && c.cls != 11) total += c.cls
        }
        i += 1
      }
      if (anyLow)
        warnings += Messages.LowConfPrefix + lowConf.result().mkString(", ")
    }

    // extracted text: non-boilerplate spans, first page + flow only
    val contentSpans = spans.iterator.zip(boiler.iterator)
      .collect { case (s, b) if !b && (s.page == 0 || s.page == 9) => s }
      .toVector
    val (text, offs) = Extractor.serializeContent(contentSpans)

    val errs = errors.result(); val warns = warnings.result()
    ExtractedTurn(convId, turnIdx, subject, grade, variant, code, total,
      scores.result(), text, offs,
      if (errs.nonEmpty) Some(errs) else None,
      if (warns.nonEmpty) Some(warns) else None)
  }
}

/** One synthetic turn: payload + input row + expected output. */
object TurnGen {
  val Epoch = 1704067200000L // 2024-01-01T00:00:00Z — fixed, no wall clock

  final case class GeneratedTurn(input: TurnInput, expected: ExtractedTurn)

  def genTurn(convId: String, turnIdx: Int): GeneratedTurn = {
    val spec = Synth.specFor(convId, turnIdx)
    val (payload, spans, boiler) = Render.payload(spec)
    val rng = new Synth.Rng(Synth.turnSeed(convId, turnIdx) ^ 0x5ca1ab1eL)
    val role = rng.nextInt(3) match {
      case 0 => "user"; case 1 => "assistant"; case 2 => "tool"
    }
    val ts = new java.sql.Timestamp(Epoch + (math.abs(
      Synth.turnSeed(convId, turnIdx)) % (365L * 86400)) * 1000L + turnIdx * 1000L)
    val input = TurnInput(convId, turnIdx, role, payload, spec.dialect, ts)
    GeneratedTurn(input, Expected.of(convId, turnIdx, spec, spans, boiler))
  }

  /** Heavy-tailed turns-per-conversation (skew driver for the salted
    * repartition): ~80% short, 15% medium, 5% long. Pure in conv id. */
  def turnsPerConv(convId: String): Int = {
    val h = Synth.splitmix64(Synth.turnSeed(convId, -1))
    val r = ((h >>> 8) % 100).toInt
    if (r < 80) 1 + ((h >>> 16) % 4).toInt        // 1..4
    else if (r < 95) 5 + ((h >>> 16) % 12).toInt  // 5..16
    else 40 + ((h >>> 16) % 60).toInt             // 40..99 (skew tail)
  }
}
