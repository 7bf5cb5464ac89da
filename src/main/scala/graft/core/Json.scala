package graft.core

/** Canonical response serializer (F9, app.py:231-240): the pinned
  * byte-format for golden equality. Mirrors the reference response
  * semantics: scores is an ordered map task → [score, prob] where
  * numeric scores serialize bare and '-'/'x' quoted (Python int vs str),
  * probs print in Python-repr style (shortest decimal, ≥1 fractional
  * digit: 1.0, 0.9, 0.98), errors/warnings are null when absent.
  * SURVEY.md §7.5 item 1: never rely on Double.toString.
  */
object Json {

  def esc(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '"'  => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.result()
  }

  /** Python-repr-style formatting for a 2dp-rounded probability. */
  def num(d: Double): String = {
    var bd = java.math.BigDecimal.valueOf(d).stripTrailingZeros()
    if (bd.scale() < 1) bd = bd.setScale(1)
    bd.toPlainString
  }

  private def strOrNull(o: Option[String]): String =
    o.map(v => "\"" + esc(v) + "\"").getOrElse("null")

  private def arrOrNull(o: Option[Seq[String]]): String =
    o.map(_.map(v => "\"" + esc(v) + "\"").mkString("[", ", ", "]")).getOrElse("null")

  private val AllDigits = "^\\d+$".r

  /** The reference-shaped response record (subject..warnings). */
  def responseJson(et: ExtractedTurn): String = {
    val sb = new StringBuilder(256)
    sb.append("{\"subject\": ").append(strOrNull(et.subject))
      .append(", \"grade\": ").append(strOrNull(et.grade))
      .append(", \"variant\": ").append(strOrNull(et.variant))
      .append(", \"participant_code\": ").append(strOrNull(et.participant_code))
      .append(", \"total_score\": ").append(et.total_score)
      .append(", \"scores\": {")
    var first = true
    for (s <- et.scores) {
      if (!first) sb.append(", ")
      first = false
      sb.append('"').append(esc(s.task)).append("\": [")
      s.score match {
        case AllDigits() => sb.append(s.score)
        case other       => sb.append('"').append(esc(other)).append('"')
      }
      sb.append(", ").append(num(s.prob)).append(']')
    }
    sb.append("}, \"errors\": ").append(arrOrNull(et.errors))
      .append(", \"warnings\": ").append(arrOrNull(et.warnings))
      .append('}')
    sb.result()
  }

  /** Full turn record: response + extraction extras, keyed — the golden
    * dump row format (ordered by (conv_id, turn_idx) upstream). */
  def turnJson(et: ExtractedTurn): String = {
    val sb = new StringBuilder(320)
    sb.append("{\"conv_id\": \"").append(esc(et.conv_id))
      .append("\", \"turn_idx\": ").append(et.turn_idx)
      .append(", \"response\": ").append(responseJson(et))
      .append(", \"extracted_text\": \"").append(esc(et.extracted_text))
      .append("\", \"span_offsets\": ")
      .append(et.span_offsets.map(o => s"[${o.start}, ${o.end}]").mkString("[", ", ", "]"))
      .append('}')
    sb.result()
  }
}
