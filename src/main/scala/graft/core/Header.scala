package graft.core

import java.util.regex.Pattern

/** Header ("hat") extraction: region slice → reading-order
  * serialization → character repair → dual-regex parse, the analog of
  * recognize_hat + parse_hat_text (app.py:99-141).
  */
object Header {

  /** Reading-order serialization of a region's word spans — replaces
    * Tesseract PSM 6 "uniform block" OCR (app.py:109-118): lines top to
    * bottom (grouped by identical line y1), words left to right joined
    * by a single space, lines joined by '\n', then trimmed (the
    * .strip() at app.py:113).
    */
  def serializeRegion(spans: IndexedSeq[Span], region: Bbox): String = {
    val words = Sorts.sorted(
      spans.filter(s => s.kind == "w" && s.page == 0 && region.containsFully(s)),
      Sorts.spanByYX)
    if (words.isEmpty) return ""
    val sb = new java.lang.StringBuilder
    var prevY = Integer.MIN_VALUE
    for (w <- words) {
      if (prevY == Integer.MIN_VALUE) ()
      else if (w.y1 != prevY) sb.append('\n')
      else sb.append(' ')
      w.appendTo(sb)
      prevY = w.y1
    }
    sb.toString.trim
  }

  /** OCR character repair (app.py:99-106,115-117). All source chars are
    * distinct and targets constant, so application order is free; we
    * keep the reference dict order anyway. */
  def repair(text: String): String = {
    val sb = new StringBuilder(text.length)
    var i = 0
    while (i < text.length) {
      sb.append(text.charAt(i) match {
        case '|' | '!' => '1'
        case '&'       => '8'
        case '?'       => '7'
        case ',' | '\n' => '.'
        case c         => c
      })
      i += 1
    }
    sb.result()
  }

  // Pattern #1 (app.py:123-126). Python re.IGNORECASE on str is
  // unicode-aware → Java needs CASE_INSENSITIVE | UNICODE_CASE.
  private val P1 = Pattern.compile(
    "^[^.]*\\.\\s*([^.]*)\\.\\s*(\\d{1,2})\\D*.*?(\\d)\\s*\\.{0,2}$",
    Pattern.CASE_INSENSITIVE | Pattern.UNICODE_CASE)
  // Pattern #2, the fallback (app.py:133-135).
  private val P2 = Pattern.compile(
    "\\.\\s*([А-Яа-яёЁ ]+)\\.\\s*(\\d{1,2})\\s*[^0-9]*.*?Вариант\\s*(\\d+)",
    Pattern.CASE_INSENSITIVE | Pattern.UNICODE_CASE)

  /** parse_hat_text (app.py:121-141): first pattern wins; both miss →
    * (None, None, None). Python re.search ≈ Matcher.find. Empty capture
    * groups are preserved (the caller's `not subject` check treats ""
    * as missing, faithfully handled in Assemble). */
  def parseHatText(text: String): (Option[String], Option[String], Option[String]) = {
    val m1 = P1.matcher(text)
    if (m1.find()) {
      return (Some(m1.group(1).toLowerCase(java.util.Locale.ROOT)), Some(m1.group(2)), Some(m1.group(3)))
    }
    val m2 = P2.matcher(text)
    if (m2.find()) {
      return (Some(m2.group(1).toLowerCase(java.util.Locale.ROOT)), Some(m2.group(2)), Some(m2.group(3)))
    }
    (None, None, None)
  }

  /** Full hat stage for one region: serialize → repair → parse.
    * Returns (subject, grade, variant, hatText). */
  def recognizeHat(spans: IndexedSeq[Span], region: Bbox)
      : (Option[String], Option[String], Option[String], String) = {
    val text = repair(serializeRegion(spans, region))
    val (s, g, v) = parseHatText(text)
    (s, g, v, text)
  }
}
