package graft.synth

import graft.core._
import scala.collection.mutable.ArrayBuffer

/** Deterministic synthetic-transcript generator.
  *
  * Renders logical exam title pages (the reference's input domain:
  * header sentence per app.py:123-140 grammar, participant-code box per
  * utils/code_rec.py, score-table grid per config.json layouts) into
  * per-turn `text` payloads in three dialects (pdf-span dump, html-ish,
  * plain char grid), together with the ground-truth ExtractedTurn each
  * page should produce. Everything is a pure function of
  * (conv_id, turn_idx) — no wall clock, no shared RNG state — so any
  * partition can be regenerated independently and runs are reproducible
  * across cluster sizes (SURVEY.md §7.1).
  */
object Synth {

  // ----------------------------------------------------------------
  // deterministic hashing (splitmix64 over a key)
  // ----------------------------------------------------------------
  def splitmix64(seed0: Long): Long = {
    var z = seed0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Cheap deterministic stream of values derived from one seed. */
  final class Rng(seed: Long) {
    private var s = seed
    def nextLong(): Long = { s = splitmix64(s); s }
    def nextInt(bound: Int): Int = {
      val v = (nextLong() >>> 1) % bound
      v.toInt
    }
    def nextDouble(): Double = (nextLong() >>> 11) * (1.0 / (1L << 53))
  }

  def turnSeed(convId: String, turnIdx: Int): Long = {
    var h = 1125899906842597L
    var i = 0
    while (i < convId.length) { h = 31 * h + convId.charAt(i); i += 1 }
    splitmix64(h * 1000003L + turnIdx)
  }

  // ----------------------------------------------------------------
  // page specification
  // ----------------------------------------------------------------
  final case class CellSpec(cls: Int, prob: Double) // cls 0..11 (10='-', 11='x')

  sealed trait TableKind
  case object ConfigClean   extends TableKind // known key, layout per config
  case object NoConfSingle  extends TableKind // unknown key, single band (+2 trailing both rows)
  case object NoConfWide    extends TableKind // unknown key, 4 rows, wide band-B label
  case object NoConfEqual   extends TableKind // unknown key, 4 rows, equal widths (shift case)
  case object NoConfTitled  extends TableKind // unknown key, 6 rows (band titles)
  case object NoConfStray   extends TableKind // unknown key, 5 rows (stray short row dropped)
  case object NoTable       extends TableKind // no table at all → table error

  final case class PageSpec(
      displaySubject: String,     // e.g. "Русский язык"
      grade: String,
      variant: String,
      headerStyle: Int,           // 0 regex#1, 1 regex#2-only, 2 unparseable
      hatOverflow: Boolean,       // variant digit only inside hat_reserve
      code: Option[String],
      codeMissingBox: Boolean,    // no frame at all → code error
      layoutKey: Option[String],  // Some → known config layout
      tableKind: TableKind,
      cells: Vector[CellSpec],
      nBandA: Int,                // band split for 2-band layouts
      dialect: String,            // "pdf" | "html" | "plain"
      dupCell: Boolean,           // near-duplicate value cell (cascade dedupe)
      faintCells: Boolean,        // detection conf 0.3 → only extra detector sees them
      specks: Boolean,            // tiny sub-area glyphs in the code box
      extraPage: Boolean)         // page-1 spans (pdf only; first-page rule)

  /** Known config keys → display subject (what the page prints). */
  val displayOf: Map[String, String] = Map(
    "математика 5" -> "Математика", "математика 6" -> "Математика",
    "математика 7" -> "Математика", "история 5" -> "История",
    "история 11" -> "История", "обществознание 6" -> "Обществознание",
    "русскийязык 7" -> "Русский язык", "русскийязык 8" -> "Русский язык",
    "биология 7" -> "Биология", "биология 8" -> "Биология",
    "география 11" -> "География", "физика 7" -> "Физика",
    "химия 8" -> "Химия")

  val knownKeys: Vector[String] = Layouts.configs.keysIterator.toVector
  val unknownSubjects: Vector[(String, String)] =
    Vector(("Информатика", "9"), ("Химия", "7"), ("Литература", "6"), ("Астрономия", "10"))

  // ----------------------------------------------------------------
  // spec sampling — the workload mix (percentages in SURVEY.md §7.2)
  // ----------------------------------------------------------------
  def specFor(convId: String, turnIdx: Int): PageSpec = {
    val rng = new Rng(turnSeed(convId, turnIdx))
    val dialect = rng.nextInt(10) match {
      case 0 | 1 | 2 | 3 => "pdf"
      case 4 | 5 | 6     => "html"
      case _             => "plain"
    }
    val roll = rng.nextInt(100)
    // plain dialect carries no conf/area metadata → keep it on the
    // clean & structural templates only
    val r = if (dialect == "plain" && roll >= 85) roll - 30 else roll

    def cellsFor(n: Int): Vector[CellSpec] = Vector.tabulate(n) { _ =>
      val pr = rng.nextInt(100)
      val prob =
        if (dialect == "plain") 1.0
        else if (pr < 70) 1.0
        else if (pr < 92) 0.60 + rng.nextInt(40) / 100.0   // 0.60..0.99
        else 0.40 + rng.nextInt(20) / 100.0                 // 0.40..0.59 → warning
      val cr = rng.nextInt(100)
      val cls =
        if (cr < 75) rng.nextInt(6)        // 0..5
        else if (cr < 88) 6 + rng.nextInt(4) // 6..9
        else if (cr < 96) 11               // 'x'
        else 10                            // '-'
      CellSpec(cls, prob)
    }

    def knownKey(): String = {
      val k = knownKeys(rng.nextInt(knownKeys.length))
      // plain grid fits rows==1 layouts best; remap rows==2 keys
      if (dialect == "plain" && Layouts.configs(k).rows == 2) "математика 6" else k
    }

    val base = PageSpec(
      displaySubject = "", grade = "", variant = (1 + rng.nextInt(4)).toString,
      headerStyle = 0, hatOverflow = false,
      code = if (rng.nextInt(10) < 7) Some((1 to 4 + rng.nextInt(3)).map(_ => rng.nextInt(10)).mkString) else None,
      codeMissingBox = false, layoutKey = None, tableKind = ConfigClean,
      cells = Vector.empty, nBandA = 0, dialect = dialect,
      dupCell = false, faintCells = false, specks = false, extraPage = false)

    def withKnown(spec: PageSpec): PageSpec = {
      val k = knownKey()
      val cfg = Layouts.configs(k)
      val n = cfg.totalCells
      spec.copy(displaySubject = displayOf(k), grade = k.split(' ').last,
        layoutKey = Some(k), cells = cellsFor(n), nBandA = (n + 1) / 2)
    }
    def withUnknown(spec: PageSpec, kind: TableKind): PageSpec = {
      val (s, g) = unknownSubjects(rng.nextInt(unknownSubjects.length))
      val n = 6 + rng.nextInt(8)
      spec.copy(displaySubject = s, grade = g, layoutKey = None,
        tableKind = kind, cells = cellsFor(n), nBandA = (n + 1) / 2)
    }

    val spec0 =
      if (r < 55) withKnown(base)                                   // clean config path
      else if (r < 63) withKnown(base).copy(hatOverflow = true)     // reserve-region retry
      else if (r < 68) withKnown(base).copy(headerStyle = 1)        // regex #2 fallback
      else if (r < 72) withUnknown(base, NoConfSingle).copy(headerStyle = 2) // header error
      else if (r < 76) withUnknown(base, NoConfSingle)
      else if (r < 79) withUnknown(base, NoConfWide)
      else if (r < 81) withUnknown(base, NoConfEqual)
      else if (r < 83) withUnknown(base, NoConfTitled)
      else if (r < 85) withUnknown(base, NoConfStray)
      else if (r < 90) withKnown(base).copy(faintCells = true)      // extra-detector rescue
      else if (r < 94) withKnown(base).copy(dupCell = true)         // cascade dedupe
      else if (r < 97) withKnown(base).copy(codeMissingBox = true, code = None)
      else withUnknown(base, NoTable).copy(cells = Vector.empty)    // table error
    val spec1 =
      if (spec0.dialect == "pdf")
        spec0.copy(specks = rng.nextInt(4) == 0, extraPage = rng.nextInt(4) == 0)
      else spec0
    spec1
  }
}
