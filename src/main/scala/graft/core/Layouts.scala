package graft.core

import scala.collection.immutable.ListMap

/** Static layout dimension table — a faithful Scala port of the
  * reference's config.json (regions at config.json:2-21, 13 subject
  * layouts at config.json:22-164). Loaded once per executor via
  * broadcast / closure capture (the analog of the module-level load at
  * app.py:40-42).
  */
object Layouts {

  /** Fixed page regions (config.json "regions"). */
  val Hat        = Bbox(0, 0, 1489, 400)
  val Code       = Bbox(1489, 0, 2400, 400)
  val HatReserve = Bbox(0, 0, 1600, 400)

  /** The 13 per-subject table layouts, keyed "{subject} {grade}" with the
    * subject lowercased and space-stripped (app.py:179-181). ListMap to
    * preserve source order (irrelevant to lookups, nice for tests). */
  val configs: ListMap[String, TableLayout] = ListMap(
    "математика 5" -> TableLayout(Bbox(133, 2733, 2499, 3120), 12, 1,
      "1 2 3 4 5 6 7 8(1) 8(2) 9 10(1) 10(2)"),
    "математика 6" -> TableLayout(Bbox(235, 2754, 2393, 3105), 13, 1,
      "1 2 3 4 5 6 7 8 9 10 11 12 13"),
    "математика 7" -> TableLayout(Bbox(180, 2774, 2400, 3222), 16, 1,
      "1 2 3 4 5 6 7 8 9 10 11 12 13 14 15 16"),
    "история 5" -> TableLayout(Bbox(212, 2809, 2400, 3150), 7, 1,
      "1 2 3 4 5 6 7"),
    "история 11" -> TableLayout(Bbox(180, 2850, 2400, 3222), 13, 1,
      "1 2 3 4 5 6 7 8 9 10К1 10К2 11 12"),
    "обществознание 6" -> TableLayout(Bbox(222, 2700, 2400, 3105), 15, 1,
      "1(1) 1(2) 2 3(1) 3(2) 4 5(1) 5(2) 6(1) 6(2) 7(1) 7(2) 8(1) 8(2) 8(3)"),
    "русскийязык 7" -> TableLayout(Bbox(222, 2500, 2400, 3135), 25, 2,
      "1К1 1К2 1К3 2К1 2К2 2К3 2К4 3(1) 3(2) 4(1) 4(2) 5 6 7(1) 7(2) 8(1) 8(2) 9 10 11(1) 11(2) 12 13(1) 13(2) 14"),
    "русскийязык 8" -> TableLayout(Bbox(180, 2540, 2400, 3105), 27, 2,
      "1К1 1К2 1К3 2К1 2К2 2К3 3(1) 3(2) 4(1) 4(2) 5 6 7 8 9 10 11(1) 11(2) 12 13 14(1) 14(2) 15(1) 15(2) 16(1) 16(2) 17"),
    "биология 7" -> TableLayout(Bbox(130, 2440, 2400, 3100), 19, 2,
      "1 2 3.1 3.2 4.1 4.2 5.1 5.2 6.1 6.2 7.1 7.2 8.1 8.2 9.1 9.2 9.3 10.1 10.2"),
    "биология 8" -> TableLayout(Bbox(130, 2550, 2400, 3160), 19, 2,
      "1 2 3.1 3.2 4.1 4.2 5.1 5.2 6.1 6.2 7.1 7.2 8.1 8.2 9.1 9.2 9.3 10.1 10.2"),
    "география 11" -> TableLayout(Bbox(219, 2770, 2400, 3200), 18, 1,
      "1 2 3 4 5 6 7 8 9 10 11 12 13 14 15 16 17К1 17К2"),
    "физика 7" -> TableLayout(Bbox(170, 2850, 2350, 3200), 11, 1,
      "1 2 3 4 5 6 7 8 9 10 11"),
    "химия 8" -> TableLayout(Bbox(180, 259, 2400, 3250), 23, 2,
      "1.1 1.2 2.1 2.2 3.1 3.2 4.1 4.2 4.3 4.4 5.1 5.2 6.1 6.2 6.3 6.4 6.5 7.1 7.2 7.3(1) 7.3(2) 8 9"),
  )

  /** Pre-split task-number lists (F5) — splitting per turn allocated a
    * regex pass + array + list for every config-path turn. */
  val taskLists: Map[String, List[String]] =
    configs.map { case (k, c) => k -> Extractor.splitTasks(c.taskNumbers) }

  /** Positional task names "1".."n" for the no-config path
    * (table_rec_noconf.py:119) — one shared list per length. */
  private val maxPositional = 64
  private val positional: Array[List[String]] = {
    val a = new Array[List[String]](maxPositional + 1)
    a(0) = Nil
    var n = 1
    while (n <= maxPositional) { a(n) = (1 to n).map(_.toString).toList; n += 1 }
    a
  }
  def positionalTasks(n: Int): List[String] =
    if (n <= maxPositional) positional(n) else (1 to n).map(_.toString).toList
}
