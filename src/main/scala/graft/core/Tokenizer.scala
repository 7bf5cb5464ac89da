package graft.core

import scala.collection.mutable.ArrayBuffer

/** A tokenized block: a group of spans that the boilerplate classifier
  * scores as a unit (Boilerpipe-style). linkChars counts characters
  * inside anchor tags (html dialect only). */
final case class Block(
    spans: IndexedSeq[Span],
    totalChars: Int,
    linkChars: Int,
    nWords: Int) {
  def linkDensity: Double =
    if (totalChars == 0) 0.0 else linkChars.toDouble / totalChars
  def structural: Boolean = spans.exists(s => s.kind != "w")
}

/** Payload tokenizers — one per dialect, all emitting positioned spans
  * on the canonical 2480×3505 grid (the analog of decode_image +
  * resize_to_target, app.py:74-90, which canonicalizes every input to
  * the same pixel space so config.json bboxes apply verbatim).
  *
  * All three are single-pass, index-tracking scanners (no regex, no
  * split) so the per-turn hot path stays allocation-light — the
  * "batched byte-stream/DOM tokenizer" stage of the north star.
  *
  * Dialect sniffing mirrors is_pdf's magic-byte check (app.py:54-56).
  */
object Tokenizer {

  sealed trait Dialect
  case object Pdf   extends Dialect
  case object Html  extends Dialect
  case object Plain extends Dialect

  val PdfMagic = "%GPDF1"

  // ---- CharSequence scan helpers (payloads arrive as String from
  // tests/generator and as a reused CharsView from the Spark boundary;
  // java.lang.String's indexOf/regionMatches don't exist on the
  // interface, so these are the loop equivalents) ----
  private def idxOf(s: CharSequence, ch: Char, from: Int): Int = s match {
    case str: String => str.indexOf(ch, from) // intrinsified SIMD scan
    case v: CharsView => // direct array scan, no virtual charAt per char
      val a = v.arr; val n = v.len
      var i = if (from < 0) 0 else from
      while (i < n) { if (a(i) == ch) return i; i += 1 }
      -1
    case _ =>
      var i = if (from < 0) 0 else from
      val n = s.length
      while (i < n) { if (s.charAt(i) == ch) return i; i += 1 }
      -1
  }
  private def startsWith(s: CharSequence, t: String): Boolean = {
    if (s.length < t.length) return false
    var i = 0
    while (i < t.length) { if (s.charAt(i) != t.charAt(i)) return false; i += 1 }
    true
  }
  private def regionMatchesExact(s: CharSequence, at: Int, t: String): Boolean = {
    if (at < 0 || at + t.length > s.length) return false
    var i = 0
    while (i < t.length) { if (s.charAt(at + i) != t.charAt(i)) return false; i += 1 }
    true
  }
  /** ASCII-case-insensitive region match (tag names are ASCII; mirrors
    * the semantics String.regionMatches(true, ...) had here). */
  private def regionMatchesCI(s: CharSequence, at: Int, t: String): Boolean = {
    if (at < 0 || at + t.length > s.length) return false
    var i = 0
    while (i < t.length) {
      val a = Character.toLowerCase(s.charAt(at + i))
      val b = Character.toLowerCase(t.charAt(i))
      if (a != b && Character.toUpperCase(s.charAt(at + i)) != Character.toUpperCase(t.charAt(i)))
        return false
      i += 1
    }
    true
  }

  /** Format sniff (S3): magic bytes first, markup second, plain last. */
  def sniff(payload: CharSequence): Dialect =
    if (startsWith(payload, PdfMagic)) Pdf
    else {
      var i = 0
      while (i < payload.length && Character.isWhitespace(payload.charAt(i))) i += 1
      if (i < payload.length && payload.charAt(i) == '<') Html else Plain
    }

  def tokenize(payload: CharSequence): Vector[Block] = {
    // rent spans from the per-thread pool — the PREVIOUS tokenize's
    // spans are dead by contract (one fused map per turn; see SpanPool)
    val pool = SpanPool.get()
    pool.reset()
    sniff(payload) match {
      case Pdf   => tokenizePdf(payload, pool)
      case Html  => tokenizeHtml(payload, pool)
      case Plain => tokenizePlain(payload, pool)
    }
  }

  // ------------------------------------------------------------------
  // PDF-span dump dialect
  //
  //   %GPDF1
  //   P <page> <width> <height>
  //   S <x1> <y1> <x2> <y2> <kind> <conf> <text…to end of line>
  //
  // The layout-parser analog of pdf_to_image (app.py:59-71): spans
  // arrive pre-positioned; we keep page indices (the first-page-only
  // rule O4 is applied downstream by the page==0 filters).
  // ------------------------------------------------------------------
  private def tokenizePdf(payload: CharSequence, pool: SpanPool): Vector[Block] = {
    val spans = pool.scratch
    val f = new FieldScanner(payload, 0, 0)
    var page = 0
    var i = 0
    val n = payload.length
    while (i < n) {
      val eol0 = idxOf(payload, '\n', i)
      val eol = if (eol0 < 0) n else eol0
      if (i < eol) {
        val c0 = payload.charAt(i)
        if (c0 == 'P' && i + 1 < eol && payload.charAt(i + 1) == ' ') {
          // P <page> <w> <h>
          f.aim(i + 2, eol)
          page = f.nextInt()
        } else if (c0 == 'S' && i + 1 < eol && payload.charAt(i + 1) == ' ') {
          f.aim(i + 2, eol)
          val x1 = f.nextInt(); val y1 = f.nextInt()
          val x2 = f.nextInt(); val y2 = f.nextInt()
          val kind = f.nextKind()
          val conf = f.nextDouble()
          f.rest()
          spans += (if (f.restStart < 0)
            pool.next(page, x1, y1, x2, y2, kind, "", conf, -1, -1, null)
          else
            pool.next(page, x1, y1, x2, y2, kind, null, conf, f.restStart, f.restEnd, payload))
        }
        // other lines (magic, comments) ignored
      }
      i = eol + 1
    }
    groupByLineGap(spans)
  }

  /** Space-separated field scanner over a [from, to) slice. Allocation-
    * free: kinds are interned constants, doubles hand-parsed in place,
    * the rest-of-line exposed as fields instead of a tuple. */
  private final class FieldScanner(s: CharSequence, from: Int, private var to: Int) {
    private var p = from
    var restStart: Int = -1
    var restEnd: Int = -1
    /** Re-aim the scanner at another [from, to) slice (reused per line). */
    def aim(from: Int, to: Int): Unit = { p = from; this.to = to; restStart = -1; restEnd = -1 }
    private def skipSpaces(): Unit = { while (p < to && s.charAt(p) == ' ') p += 1 }
    private def tokenEnd(): Int = {
      var q = p
      while (q < to && s.charAt(q) != ' ') q += 1
      q
    }
    /** Known span kinds come back interned; unknown kinds substring. */
    def nextKind(): String = {
      skipSpaces(); val st = p; val en = tokenEnd(); p = en
      val len = en - st
      if (len == 1) {
        s.charAt(st) match {
          case 'w' => return "w"
          case 'g' => return "g"
          case _   => ()
        }
      } else if (len == 4) {
        if (regionMatchesExact(s, st, "cell")) return "cell"
      } else if (len == 3) {
        if (regionMatchesExact(s, st, "box")) return "box"
      }
      s.subSequence(st, en).toString
    }
    def nextInt(): Int = {
      skipSpaces()
      var v = 0; var neg = false
      if (p < to && s.charAt(p) == '-') { neg = true; p += 1 }
      while (p < to && s.charAt(p) >= '0' && s.charAt(p) <= '9') {
        v = v * 10 + (s.charAt(p) - '0'); p += 1
      }
      if (neg) -v else v
    }
    /** Hand-parsed [-]digits[.digits]; anything fancier falls back to
      * Double.parseDouble on a substring. */
    def nextDouble(): Double = {
      skipSpaces(); val st = p; val en = tokenEnd(); p = en
      var q = st
      var neg = false
      if (q < en && s.charAt(q) == '-') { neg = true; q += 1 }
      var intPart = 0L; var any = false
      while (q < en && s.charAt(q) >= '0' && s.charAt(q) <= '9') {
        intPart = intPart * 10 + (s.charAt(q) - '0'); q += 1; any = true
      }
      var value = intPart.toDouble
      if (q < en && s.charAt(q) == '.') {
        q += 1
        var frac = 0L; var scale = 1L
        while (q < en && s.charAt(q) >= '0' && s.charAt(q) <= '9' && scale < 1000000000000000L) {
          frac = frac * 10 + (s.charAt(q) - '0'); scale *= 10; q += 1; any = true
        }
        value += frac.toDouble / scale.toDouble
      }
      if (q != en || !any) return java.lang.Double.parseDouble(s.subSequence(st, en).toString)
      if (neg) -value else value
    }
    /** Rest of the slice after one separating space → restStart/restEnd
      * fields; empty → (-1,-1). */
    def rest(): Unit = {
      if (p < to && s.charAt(p) == ' ') p += 1
      if (p >= to) { restStart = -1; restEnd = -1 }
      else { restStart = p; restEnd = to }
    }
  }

  // ------------------------------------------------------------------
  // HTML-ish dialect — lightweight DOM scan. Blocks are the direct
  // children of <body>; positioned spans carry
  //   class="w|g|cell|box" style="left:..px;top:..px;width:..px;height:..px"
  //   data-conf="0.97" data-page="0"
  // Anchor text inside a block accrues linkChars for the Boilerpipe
  // scoring. Generator payloads contain no HTML entities (documented
  // contract), so no entity decoding here.
  // ------------------------------------------------------------------
  private def tokenizeHtml(payload: CharSequence, pool: SpanPool): Vector[Block] = {
    val blocks = Vector.newBuilder[Block]
    var spans = new ArrayBuffer[Span](16)
    var totalChars = 0; var linkChars = 0; var nWords = 0
    var depth = 0          // depth relative to <body>; 1 = inside a top-level block
    var inBody = false
    var inAnchor = false
    var blockOpen = false
    // pending positioned attrs for the current element (depth>=1)
    var pKind: String = null; var pX = -1; var pY = -1; var pW = -1; var pH = -1
    var pConf = 1.0; var pPage = 0
    val attrSweep = new AttrSweep

    def flushBlock(): Unit = {
      if (blockOpen && (spans.nonEmpty || totalChars > 0)) {
        blocks += Block(scala.collection.immutable.ArraySeq.unsafeWrapArray(
          spans.toArray), totalChars, linkChars, nWords)
      }
      spans.clear()
      totalChars = 0; linkChars = 0; nWords = 0
      blockOpen = false
    }

    val n = payload.length
    var i = 0
    while (i < n) {
      val c = payload.charAt(i)
      if (c == '<') {
        val close = idxOf(payload, '>', i + 1)
        if (close < 0) { i = n }
        else {
          val isEnd = i + 1 < n && payload.charAt(i + 1) == '/'
          val nameStart = if (isEnd) i + 2 else i + 1
          var ne = nameStart
          while (ne < close && payload.charAt(ne) != ' ' && payload.charAt(ne) != '/' && payload.charAt(ne) != '>') ne += 1
          // in-place, case-insensitive tag checks (no substring/lowercase)
          def tagIs(t: String): Boolean =
            ne - nameStart == t.length && regionMatchesCI(payload, nameStart, t)
          val selfClosing = payload.charAt(close - 1) == '/' ||
            tagIs("br") || tagIs("hr") || tagIs("img") || tagIs("meta") || tagIs("link")
          if (!isEnd) {
            if (tagIs("body")) { inBody = true; depth = 0 }
            else if (inBody && !selfClosing) {
              depth += 1
              if (depth == 1) { flushBlock(); blockOpen = true }
              if (tagIs("a")) inAnchor = true
              // positioned element? one in-place sweep over the
              // attribute region [ne, close)
              attrSweep.reset()
              attrSweep.parse(payload, ne, close)
              if (attrSweep.kind != null) {
                pKind = attrSweep.kind
                pX = attrSweep.x; pY = attrSweep.y
                pW = attrSweep.w; pH = attrSweep.h
                pConf = attrSweep.conf
                pPage = attrSweep.page
                if (pKind == "cell" || pKind == "box") {
                  // no text node required; emit immediately
                  if (pX >= 0 && pY >= 0)
                    spans += pool.next(pPage, pX, pY, pX + pW, pY + pH, pKind, "", pConf, -1, -1, null)
                  pKind = null
                }
              }
            }
          } else { // end tag
            if (tagIs("body")) inBody = false
            else if (inBody) {
              if (tagIs("a")) inAnchor = false
              if (depth == 1) flushBlock()
              if (depth > 0) depth -= 1
              pKind = null
            }
          }
          i = close + 1
        }
      } else {
        // text node up to next '<'
        val lt0 = idxOf(payload, '<', i)
        val lt = if (lt0 < 0) n else lt0
        if (inBody && depth >= 1) {
          // trim the node
          var s0 = i; var e0 = lt
          while (s0 < e0 && Character.isWhitespace(payload.charAt(s0))) s0 += 1
          while (e0 > s0 && Character.isWhitespace(payload.charAt(e0 - 1))) e0 -= 1
          if (e0 > s0) {
            totalChars += e0 - s0
            if (inAnchor) linkChars += e0 - s0
            nWords += countWords(payload, s0, e0)
            if (pKind != null && pX >= 0 && pY >= 0) {
              spans += pool.next(pPage, pX, pY, pX + pW, pY + pH, pKind, null, pConf, s0, e0, payload)
              pKind = null
            } else if (!inAnchor) {
              // flow text without position: off-grid page 9 so it never
              // enters page-0 region ops but can survive as content
              spans += pool.next(9, 0, 0, 0, 0, "w", null, 1.0, s0, e0, payload)
            }
          }
        }
        i = lt
      }
    }
    flushBlock()
    blocks.result()
  }

  /** One-pass attribute scanner for a tag's [from, to) region —
    * extracts class kind, style px geometry, data-conf, data-page
    * without substrings or repeated needle probes. */
  private final class AttrSweep {
    var kind: String = null
    var x: Int = -1; var y: Int = -1; var w: Int = -1; var h: Int = -1
    var conf: Double = 1.0
    var page: Int = 0

    def reset(): Unit = { kind = null; x = -1; y = -1; w = -1; h = -1; conf = 1.0; page = 0 }

    def parse(s: CharSequence, from: Int, to: Int): Unit = {
      var i = from
      while (i < to) {
        while (i < to && (s.charAt(i) == ' ' || s.charAt(i) == '/')) i += 1
        val ns = i
        while (i < to && s.charAt(i) != '=' && s.charAt(i) != ' ') i += 1
        if (i < to && s.charAt(i) == '=' && i + 1 < to && s.charAt(i + 1) == '"') {
          val vs = i + 2
          var ve = vs
          while (ve < to && s.charAt(ve) != '"') ve += 1
          val nLen = i - ns
          if (nLen == 5 && regionMatchesExact(s, ns, "class")) {
            kind = (ve - vs) match {
              case 1 if s.charAt(vs) == 'w' => "w"
              case 1 if s.charAt(vs) == 'g' => "g"
              case 4 if regionMatchesExact(s, vs, "cell") => "cell"
              case 3 if regionMatchesExact(s, vs, "box")  => "box"
              case _ => null
            }
          } else if (nLen == 5 && regionMatchesExact(s, ns, "style")) {
            parseStyle(s, vs, ve)
          } else if (nLen == 9 && regionMatchesExact(s, ns, "data-conf")) {
            conf = parseDoubleIn(s, vs, ve, 1.0)
          } else if (nLen == 9 && regionMatchesExact(s, ns, "data-page")) {
            page = parseIntIn(s, vs, ve, 0)
          }
          i = ve + 1
        } else if (i < to) i += 1
      }
    }

    /** key:value; pairs — keys compared in place. */
    private def parseStyle(s: CharSequence, from: Int, to: Int): Unit = {
      var i = from
      while (i < to) {
        while (i < to && (s.charAt(i) == ' ' || s.charAt(i) == ';')) i += 1
        val ks = i
        while (i < to && s.charAt(i) != ':' && s.charAt(i) != ';') i += 1
        if (i < to && s.charAt(i) == ':') {
          val kLen = i - ks
          i += 1
          val vs = i
          while (i < to && s.charAt(i) != ';') i += 1
          val v = parseIntIn(s, vs, i, -1)
          if (kLen == 4 && regionMatchesExact(s, ks, "left")) x = v
          else if (kLen == 3 && regionMatchesExact(s, ks, "top")) y = v
          else if (kLen == 5 && regionMatchesExact(s, ks, "width")) w = v
          else if (kLen == 6 && regionMatchesExact(s, ks, "height")) h = v
        }
      }
    }
  }

  private def parseIntIn(s: CharSequence, from: Int, to: Int, dflt: Int): Int = {
    var p = from
    var v = 0; var any = false
    while (p < to && s.charAt(p) >= '0' && s.charAt(p) <= '9') {
      v = v * 10 + (s.charAt(p) - '0'); p += 1; any = true
    }
    if (any) v else dflt
  }

  /** Simple [-]digits[.digits] parsed in place; exotic forms fall back
    * to Double.parseDouble on a substring. */
  private def parseDoubleIn(s: CharSequence, from: Int, to: Int, dflt: Double): Double = {
    if (to <= from) return dflt
    var q = from
    var neg = false
    if (s.charAt(q) == '-') { neg = true; q += 1 }
    var intPart = 0L; var any = false
    while (q < to && s.charAt(q) >= '0' && s.charAt(q) <= '9') {
      intPart = intPart * 10 + (s.charAt(q) - '0'); q += 1; any = true
    }
    var value = intPart.toDouble
    if (q < to && s.charAt(q) == '.') {
      q += 1
      var frac = 0L; var scale = 1L
      while (q < to && s.charAt(q) >= '0' && s.charAt(q) <= '9' && scale < 1000000000000000L) {
        frac = frac * 10 + (s.charAt(q) - '0'); scale *= 10; q += 1; any = true
      }
      value += frac.toDouble / scale.toDouble
    }
    if (q != to || !any) return java.lang.Double.parseDouble(s.subSequence(from, to).toString)
    if (neg) -value else value
  }

  private def countWords(s: CharSequence): Int = countWords(s, 0, s.length)

  private def countWords(s: CharSequence, from: Int, to: Int): Int = {
    var c = 0; var inWord = false; var i = from
    while (i < to) {
      val w = !Character.isWhitespace(s.charAt(i))
      if (w && !inWord) c += 1
      inWord = w
      i += 1
    }
    c
  }

  // ------------------------------------------------------------------
  // Plain-text dialect — fixed char grid: column → x = col*CellW,
  // row → y = row*CellH (page fits 124 × 100 cells of 20×35 px on the
  // canonical 2480×3505 grid). Structure markers:
  //   '|' table row separators  → cell boxes + inner glyphs
  //   '+' ruling lines          → ignored
  //   '#' box borders/edges     → code-frame box + inner glyphs
  // Everything else → word spans.
  // ------------------------------------------------------------------
  val CellW = 20
  val CellH = 35

  private def tokenizePlain(payload: CharSequence, pool: SpanPool): Vector[Block] = {
    val spans = pool.scratch
    // open '#' boxes keyed by (colStart, colEnd): top border row + glyph buffer
    var boxTop = -1; var boxC0 = -1; var boxC1 = -1
    val boxGlyphs = new ArrayBuffer[(Int, Int, Int, Int, Int)]() // row,c0,c1,start,end

    var row = 0
    var i = 0
    val n = payload.length
    while (i < n) {
      val eol0 = idxOf(payload, '\n', i)
      val eol = if (eol0 < 0) n else eol0
      val lineStart = i
      var hasPipe = false; var hashRun = 0; var maxHashRun = 0
      var firstHash = -1; var lastHash = -1
      var j = i
      while (j < eol) {
        val ch = payload.charAt(j)
        if (ch == '|') hasPipe = true
        if (ch == '#') {
          if (firstHash < 0) firstHash = j - lineStart
          lastHash = j - lineStart
          hashRun += 1; if (hashRun > maxHashRun) maxHashRun = hashRun
        } else hashRun = 0
        j += 1
      }
      if (maxHashRun >= 5) {
        // box border line
        if (boxTop < 0) { boxTop = row; boxC0 = firstHash; boxC1 = lastHash }
        else {
          // closing border → emit box + its glyphs
          spans += pool.next(0, boxC0 * CellW, boxTop * CellH,
            (boxC1 + 1) * CellW, (row + 1) * CellH, "box", "", 1.0, -1, -1, null)
          for ((r, c0, c1, s0, e0) <- boxGlyphs)
            spans += pool.next(0, c0 * CellW, r * CellH, (c1 + 1) * CellW, (r + 1) * CellH,
              "g", null, 1.0, s0, e0, payload)
          boxGlyphs.clear()
          boxTop = -1
        }
      } else if (boxTop >= 0 && firstHash >= 0 && lastHash > firstHash) {
        // box content row: tokens between the edge '#'s are glyphs
        emitTokens(payload, lineStart, eol, row, firstHash + 1, lastHash - 1) {
          (c0, c1, s0, e0) => boxGlyphs += ((row, c0, c1, s0, e0))
        }
        // text left of the box on the same physical line → words
        emitTokens(payload, lineStart, eol, row, 0, firstHash - 1) {
          (c0, c1, s0, e0) =>
            spans += wordSpan(pool, payload, row, c0, c1, s0, e0)
        }
      } else if (hasPipe) {
        // table row: segments between pipes are cells
        var k = lineStart; var prevPipe = -1
        while (k <= eol) {
          val isPipe = k < eol && payload.charAt(k) == '|'
          if (isPipe) {
            val col = k - lineStart
            if (prevPipe >= 0) {
              val c0 = prevPipe; val c1 = col
              spans += pool.next(0, c0 * CellW, row * CellH,
                (c1 + 1) * CellW, (row + 1) * CellH, "cell", "", 1.0, -1, -1, null)
              emitTokens(payload, lineStart, eol, row, c0 + 1, c1 - 1) {
                (g0, g1, s0, e0) =>
                  spans += pool.next(0, g0 * CellW, row * CellH, (g1 + 1) * CellW,
                    (row + 1) * CellH, "g", null, 1.0, s0, e0, payload)
              }
            }
            prevPipe = col
          }
          k += 1
        }
      } else if (eol > lineStart && payload.charAt(lineStart) == '+') {
        // ruling line — ignored
      } else {
        emitTokens(payload, lineStart, eol, row, 0, Int.MaxValue) {
          (c0, c1, s0, e0) => spans += wordSpan(pool, payload, row, c0, c1, s0, e0)
        }
      }
      row += 1
      i = eol + 1
    }
    groupByLineGap(spans)
  }

  private def wordSpan(pool: SpanPool, payload: CharSequence, row: Int, c0: Int, c1: Int,
      s0: Int, e0: Int): Span =
    pool.next(0, c0 * CellW, row * CellH, (c1 + 1) * CellW, (row + 1) * CellH,
      "w", null, 1.0, s0, e0, payload)

  /** Emit whitespace-delimited tokens of a line restricted to columns
    * [colFrom, colTo]. Callback gets (colStart, colEnd, start, end) —
    * offsets only; spans defer text to the shared payload. */
  private def emitTokens(s: CharSequence, lineStart: Int, eol: Int, row: Int,
      colFrom: Int, colTo: Int)(f: (Int, Int, Int, Int) => Unit): Unit = {
    var j = lineStart + math.max(0, colFrom)
    val jEnd = if (colTo == Int.MaxValue) eol else math.min(eol, lineStart + colTo + 1)
    while (j < jEnd) {
      while (j < jEnd && s.charAt(j) == ' ') j += 1
      if (j < jEnd) {
        val st = j
        while (j < jEnd && s.charAt(j) != ' ') j += 1
        f(st - lineStart, j - 1 - lineStart, st, j)
      }
    }
  }

  /** Group a flat span list into line blocks by vertical gap — the
    * block builder for positioned dialects (pdf/plain): consecutive
    * spans (sorted by y1) whose y1 gap ≤ 70px share a block. */
  private def groupByLineGap(spans: scala.collection.IndexedSeq[Span]): Vector[Block] = {
    if (spans.isEmpty) return Vector.empty
    val sorted = Sorts.sorted(spans, Sorts.spanReadingOrder)
    val blocks = Vector.newBuilder[Block]
    // blocks are contiguous runs of the sorted array → emit slices
    // instead of per-block builder churn
    var from = 0
    var curWords = 0; var curChars = 0
    var prevY = 0; var prevPage = 0
    var i = 0
    def close(until: Int): Unit = {
      if (until > from) {
        blocks += Block(scala.collection.immutable.ArraySeq.unsafeWrapArray(
          java.util.Arrays.copyOfRange(sorted, from, until)), curChars, 0, curWords)
      }
      from = until; curWords = 0; curChars = 0
    }
    while (i < sorted.length) {
      val s = sorted(i)
      if (i > from && (s.page != prevPage || s.y1 - prevY > 70)) close(i)
      if (s.kind == "w" || s.kind == "g") { curWords += 1; curChars += s.textLen }
      prevY = s.y1; prevPage = s.page
      i += 1
    }
    close(sorted.length)
    blocks.result()
  }
}
