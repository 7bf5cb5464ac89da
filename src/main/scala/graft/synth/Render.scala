package graft.synth

import graft.core._
import Synth._
import scala.collection.mutable.ArrayBuffer

/** Renders a PageSpec into the three payload dialects.
  *
  * Pixel geometry (pdf/html) keeps the reference's invariants:
  * header words inside the hat region (config.json regions.hat), code
  * frame inside the code region with ≥10px inner margins
  * (code_rec.py:49-53), table rows with y1 ∈ [1500,3300] and y-center
  * gaps > 20 between rows / ≤ 20 within (Yolo_cell_rec.py:34,58),
  * adjacent cell x1 gaps > 50 (the dedupe threshold), glyph areas
  * > 100 px² except deliberate specks (code_rec.py:65-66).
  */
object Render {

  /** Generator-side span: a Span minus offsets, plus a boilerplate tag. */
  final case class G(page: Int, x1: Int, y1: Int, x2: Int, y2: Int,
      kind: String, text: String, conf: Double, boiler: Boolean)

  val CellH = 80      // table cell height (pixel dialects)
  val CellGap = 10    // x gap between adjacent cells
  val TableX0 = 150

  // ----------------------------------------------------------------
  // pixel-space page composition (pdf + html share this)
  // ----------------------------------------------------------------
  def pageSpans(spec: PageSpec): Vector[G] = {
    val gs = new ArrayBuffer[G](128)

    def words(texts: Seq[String], x0: Int, y: Int, h: Int, boiler: Boolean,
        kind: String = "w", conf: Double = 1.0): Unit = {
      var x = x0
      for (t <- texts) {
        val w = 22 * t.length
        gs += G(0, x, y, x + w, y + h, kind, t, conf, boiler)
        x += w + 15
      }
    }

    // margin + footer page furniture (boilerplate; pdf only — html
    // replaces these with nav/footer blocks)
    if (spec.dialect == "pdf") {
      words(Seq("ВПР", "2024"), 40, 10, 30, boiler = true)
      words(Seq("ВПР", "2024", "стр.", "1"), 40, 3420, 30, boiler = true)
    }

    // header lines
    words(Seq("Всероссийская", "проверочная", "работа"), 40, 110, 40, boiler = false)
    val subjWords = spec.displaySubject.split(' ').toSeq
    spec.headerStyle match {
      case 0 =>
        // subject-first line → regex #1 path (app.py:123-132): the
        // pattern's ([^.]*) group must be the subject segment itself
        val lead = subjWords.init ++ Seq(subjWords.last + ".") ++
          Seq(spec.grade, "класс.", "Вариант")
        words(lead, 40, 190, 40, boiler = false)
        if (spec.hatOverflow)
          gs += G(0, 1495, 190, 1495 + 22 * spec.variant.length, 230, "w", spec.variant, 1.0, false)
        else {
          val used = lead.map(t => 22 * t.length + 15).sum
          words(Seq(spec.variant), 40 + used, 190, 40, boiler = false)
        }
      case 1 =>
        words(Seq("Проверочная", "работа.") ++ subjWords.init ++
          Seq(subjWords.last + ".") ++ Seq(spec.grade, "класс", "Вариант", spec.variant, "осень"),
          40, 190, 40, boiler = false)
      case _ =>
        words(Seq("Проверочная", "работа", "без", "данных"), 40, 190, 40, boiler = false)
    }

    // participant-code frame + glyphs (code region x 1489..2400)
    if (!spec.codeMissingBox) {
      gs += G(0, 1540, 100, 2340, 360, "box", "", 1.0, false)
      // 3 leftmost label glyphs = the drop-3 noise (code_rec.py:69-72)
      var x = 1570
      for (ch <- Seq("К", "о", "д")) {
        gs += G(0, x, 150, x + 30, 230, "g", ch, 1.0, false); x += 45
      }
      if (spec.specks) // area 64 ≤ 100 → must be dropped by the area filter
        gs += G(0, 1705, 300, 1713, 308, "g", "0", 1.0, false)
      spec.code.foreach { c =>
        var dx = 1720
        for (d <- c) {
          gs += G(0, dx, 140, dx + 40, 260, "g", d.toString, 1.0, false); dx += 60
        }
      }
      if (spec.specks)
        gs += G(0, 2300, 110, 2306, 116, "g", "1", 1.0, false)
    }

    // table
    val cellConf = if (spec.faintCells) 0.3 else 0.9
    val tasks: Vector[String] = spec.layoutKey match {
      case Some(k) => Extractor.splitTasks(Layouts.configs(k).taskNumbers).toVector
      case None    => (1 to spec.cells.length).map(_.toString).toVector
    }
    val sumTxt = spec.cells.filter(c => c.cls != 10 && c.cls != 11).map(_.cls).sum.toString

    /** One table row: cells with optional glyph content.
      * entries: (glyphText or null, glyphConf, cellWidth) */
    def row(y: Int, entries: Seq[(String, Double, Int)], dupAt: Int = -1): Unit = {
      var x = TableX0
      var i = 0
      for ((txt, gconf, w) <- entries) {
        gs += G(0, x, y, x + w, y + CellH, "cell", "", cellConf, false)
        if (txt != null && txt.nonEmpty) {
          val cx = x + w / 2
          gs += G(0, cx - 24, y + 10, cx + 24, y + 70, "g", txt, gconf, false)
        }
        if (i == dupAt) // near-duplicate detection box 30px right (≤50)
          gs += G(0, x + 30, y, x + 30 + w, y + CellH, "cell", "", cellConf, false)
        x += w + CellGap
        i += 1
      }
    }
    def taskW(n: Int): Int = math.max(75, 2250 / (n + 3) - CellGap)

    val n = spec.cells.length
    val oneBand = spec.tableKind == ConfigClean &&
      spec.layoutKey.exists(k => Layouts.configs(k).rows == 1) ||
      spec.tableKind == NoConfSingle ||
      (spec.tableKind == ConfigClean && spec.layoutKey.isEmpty)

    if (spec.tableKind == NoTable || n == 0) {
      // no table at all
    } else if (oneBand) {
      val w = taskW(n)
      val hdr = ("№", 1.0, w) +: tasks.map(t => (t, 1.0, w)) :+ (("Сумма", 1.0, w)) :+ (("Подп.", 1.0, w))
      val vls = ("Баллы", 1.0, w) +: spec.cells.map(c => (glyphOf(c.cls), c.prob, w)) :+
        ((sumTxt, 1.0, w)) :+ ((null: String, 1.0, w))
      row(2600, hdr)
      row(2720, vls, dupAt = if (spec.dupCell) 2 else -1)
    } else {
      // two-band layouts (config rows==2 and all noconf shapes)
      val nA = spec.nBandA
      val (tA, tB) = tasks.splitAt(nA)
      val (cA, cB) = spec.cells.splitAt(nA)
      val w = taskW(math.max(nA, n - nA))
      val wideLabel = spec.tableKind != NoConfEqual // band-B header label width drives filter_cells (:54-60)
      val labelW = if (wideLabel) w + 100 else w
      val titled = spec.tableKind == NoConfTitled
      val ys: Seq[Int] =
        if (titled) Seq(2360, 2450, 2570, 2740, 2840, 2960)
        else Seq(2450, 2570, 2800, 2920)
      var yi = 0
      def nextY(): Int = { val y = ys(yi); yi += 1; y }
      if (titled) row(nextY(), Seq(("Таблица", 1.0, 2000)))
      row(nextY(), ("№", 1.0, labelW) +: tA.map(t => (t, 1.0, w)))           // band A header
      row(nextY(), ("Баллы", 1.0, labelW) +: cA.map(c => (glyphOf(c.cls), c.prob, w)),
        dupAt = if (spec.dupCell) 1 else -1)                                  // band A values
      if (titled) row(nextY(), Seq(("Таблица", 1.0, 2000)))
      row(nextY(), ("№", 1.0, labelW) +: tB.map(t => (t, 1.0, w)) :+
        (("Сумма", 1.0, w)) :+ (("Подп.", 1.0, w)))                           // band B header
      row(nextY(), ("Баллы", 1.0, labelW) +: cB.map(c => (glyphOf(c.cls), c.prob, w)) :+
        ((sumTxt, 1.0, w)) :+ ((null: String, 1.0, w)))                       // band B values
      if (spec.tableKind == NoConfStray)
        row(3100, Seq(("Итого", 1.0, w), (sumTxt, 1.0, w)))
    }

    // extra PDF page (first-page-only rule O4: everything here must be
    // invisible to detection AND to extracted_text)
    if (spec.extraPage && spec.dialect == "pdf") {
      gs += G(1, 40, 110, 500, 150, "w", "Приложение", 1.0, false)
      gs += G(1, 150, 2600, 260, 2680, "cell", "", 0.9, false)
      gs += G(1, 170, 2610, 220, 2670, "g", "9", 1.0, false)
    }
    gs.toVector
  }

  def glyphOf(cls: Int): String =
    if (cls == 10) "-" else if (cls == 11) "x" else cls.toString

  // ----------------------------------------------------------------
  // PDF-span dump serialization
  // ----------------------------------------------------------------
  def toPdf(gs: Vector[G]): (String, Vector[Span]) = {
    val sb = new StringBuilder(gs.length * 40)
    val out = Vector.newBuilder[Span]
    sb.append(Tokenizer.PdfMagic).append('\n')
    var curPage = -1
    for (g <- gs.sortBy(x => (x.page, x.y1, x.x1))) {
      if (g.page != curPage) {
        curPage = g.page
        sb.append("P ").append(curPage).append(' ')
          .append(Grid.Width).append(' ').append(Grid.Height).append('\n')
      }
      sb.append("S ").append(g.x1).append(' ').append(g.y1).append(' ')
        .append(g.x2).append(' ').append(g.y2).append(' ')
        .append(g.kind).append(' ').append(fmtConf(g.conf))
      if (g.text.nonEmpty) {
        sb.append(' ')
        val s0 = sb.length
        sb.append(g.text)
        out += Span(g.page, g.x1, g.y1, g.x2, g.y2, g.kind, g.text, g.conf, s0, sb.length)
      } else {
        out += Span(g.page, g.x1, g.y1, g.x2, g.y2, g.kind, g.text, g.conf, -1, -1)
      }
      sb.append('\n')
    }
    (sb.result(), out.result())
  }

  // ----------------------------------------------------------------
  // HTML-ish serialization: positioned spans inside div.page; nav /
  // filler / footer provide the link-dense boilerplate blocks.
  // ----------------------------------------------------------------
  def toHtml(gs: Vector[G]): (String, Vector[Span]) = {
    val sb = new StringBuilder(gs.length * 90 + 512)
    val out = Vector.newBuilder[Span]
    sb.append("<html><head><title>ВПР скан</title></head><body>\n")
    sb.append("<nav><a href=\"/vpr\">Главная</a> <a href=\"/info\">Инфо</a> меню</nav>\n")
    sb.append("<div class=\"page\" data-page=\"0\">\n")
    for (g <- gs.sortBy(x => (x.page, x.y1, x.x1))) {
      sb.append("<").append(if (g.kind == "w" || g.kind == "g") "span" else "div")
        .append(" class=\"").append(g.kind).append("\" style=\"left:")
        .append(g.x1).append("px;top:").append(g.y1).append("px;width:")
        .append(g.x2 - g.x1).append("px;height:").append(g.y2 - g.y1)
        .append("px\" data-conf=\"").append(fmtConf(g.conf)).append('"')
      if (g.page != 0) sb.append(" data-page=\"").append(g.page).append('"')
      sb.append('>')
      if (g.text.nonEmpty) {
        val s0 = sb.length
        sb.append(g.text)
        out += Span(g.page, g.x1, g.y1, g.x2, g.y2, g.kind, g.text, g.conf, s0, sb.length)
      } else {
        out += Span(g.page, g.x1, g.y1, g.x2, g.y2, g.kind, g.text, g.conf, -1, -1)
      }
      sb.append(if (g.kind == "w" || g.kind == "g") "</span>\n" else "</div>\n")
    }
    sb.append("</div>\n")
    sb.append("<p>Вот отсканированный документ</p>\n")
    sb.append("<footer><a href=\"/about\">О проекте</a> <a href=\"/help\">Помощь</a></footer>\n")
    sb.append("</body></html>\n")
    (sb.result(), out.result())
  }

  private def fmtConf(c: Double): String =
    if (c == c.floor && c >= 0 && c < 10) s"${c.toInt}.0" else c.toString

  // ----------------------------------------------------------------
  // plain char-grid rendering (20×35 px per char cell)
  // ----------------------------------------------------------------
  def toPlain(spec: PageSpec): (String, Vector[Span]) = {
    val lines = ArrayBuffer.fill(100)(new StringBuilder)
    def put(row: Int, col: Int, s: String): Unit = {
      val l = lines(row)
      while (l.length < col) l.append(' ')
      if (l.length > col) l.setLength(col) // overwrite only at end in our layouts
      l.append(s)
    }
    // margin boilerplate (row 0 — must stay >70px above the next span
    // so the block builder isolates it; code box starts at row 4)
    put(0, 0, "ВПР 2024")
    // code box rows 4..6, cols 76..118
    if (!spec.codeMissingBox) {
      put(4, 76, "#" * 43)
      val inner = "К о д" + spec.code.map(c => " " + c.map(_.toString).mkString(" ")).getOrElse("")
      put(5, 76, "#")
      put(5, 78, inner)
      put(5, 118, "#")
      put(6, 76, "#" * 43)
    }
    // header
    put(8, 0, "Всероссийская проверочная работа")
    val subj = spec.displaySubject
    spec.headerStyle match {
      case 0 =>
        if (spec.hatOverflow) {
          put(10, 0, s"$subj. ${spec.grade} класс. Вариант")
          put(10, 75, spec.variant) // x1 = 1500 > hat x2, ≤ reserve x2
        } else put(10, 0, s"$subj. ${spec.grade} класс. Вариант ${spec.variant}")
      case 1 =>
        put(10, 0, s"Проверочная работа. $subj. ${spec.grade} класс Вариант ${spec.variant} осень")
      case _ =>
        put(10, 0, "Проверочная работа без данных")
    }

    // single-band table (plain pages are restricted to these shapes)
    val n = spec.cells.length
    if (spec.tableKind != NoTable && n > 0) {
      val tasks: Vector[String] = spec.layoutKey match {
        case Some(k) => Extractor.splitTasks(Layouts.configs(k).taskNumbers).toVector
        case None    => (1 to n).map(_.toString).toVector
      }
      val sumTxt = spec.cells.filter(c => c.cls != 10 && c.cls != 11).map(_.cls).sum.toString
      def rowLine(items: Seq[String]): String = {
        val sb = new StringBuilder("|")
        for (it <- items) { sb.append(pad5(it)).append('|') }
        sb.result()
      }
      val hdr = rowLine("№" +: tasks :+ "Сумма" :+ "Подп.")
      val vls = rowLine("Баллы" +: spec.cells.map(c => glyphOf(c.cls)) :+ sumTxt :+ "")
      val ruling = "+" + ("-" * (hdr.length - 2)) + "+"
      put(73, 0, ruling); put(74, 0, hdr); put(75, 0, ruling)
      put(76, 0, vls); put(77, 0, ruling)
    }

    val payload = lines.map(_.result()).mkString("\n")
    // re-tokenize to recover exact spans+offsets (the plain renderer's
    // inverse is the plain tokenizer by construction)
    val spans = Tokenizer.tokenize(payload).flatMap(_.spans)
    (payload, spans)
  }

  private def pad5(s: String): String = {
    val t = if (s.length > 5) s.take(5) else s
    t + (" " * (5 - t.length))
  }

  /** Render the payload + the full span list with offsets + parallel
    * boilerplate flags (for expected extracted_text). */
  def payload(spec: PageSpec): (String, Vector[Span], Vector[Boolean]) = spec.dialect match {
    case "pdf" =>
      val gs = pageSpans(spec)
      val sorted = gs.sortBy(x => (x.page, x.y1, x.x1))
      val (p, spans) = toPdf(gs)
      (p, spans, sorted.map(_.boiler))
    case "html" =>
      val gs = pageSpans(spec)
      val sorted = gs.sortBy(x => (x.page, x.y1, x.x1))
      val (p, spans) = toHtml(gs)
      (p, spans, sorted.map(_.boiler))
    case _ =>
      val (p, spans) = toPlain(spec)
      // plain boilerplate = the margin line (row 0) only
      (p, spans, spans.map(s => s.y2 <= Boiler.MarginTopY))
  }
}
