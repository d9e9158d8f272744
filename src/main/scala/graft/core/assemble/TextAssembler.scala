package graft.core.assemble

import graft.core.{Block, ExtractorConfig, Span}

/** Text + span assembly — THIS FILE OWNS THE BYTE CONTRACT.
  *
  * The analog of the reference's text emitter (collectText + displayText,
  * main/gtkDisplay.c:202-365) and its post-processing normalizer battery
  * (fixutf8.pl). Every rule here is order-sensitive and pinned by unit tests;
  * the FixtureGen oracle calls these same pure functions on its known
  * source-of-truth content strings, so segmentation+classification are tested
  * against an independently assembled expectation.
  *
  * Output contract:
  *   - kept blocks, document order, each normalized by [[normalizeBlock]];
  *   - blocks joined by "\n\n";
  *   - non-empty output always ends with exactly one "\n" (the reference
  *     ensures a trailing newline, main/gtkDisplay.c:326-332);
  *   - spans(i) = [begin, end) of block i's text in the output, kind = block
  *     kind; the trailing "\n" and the "\n\n" separators are outside spans.
  */
object TextAssembler {

  /** Ordered character-level normalizations (P1 analog, fixutf8.pl:16-45).
    * ORDER MATTERS; applied before whitespace collapse. */
  def normalizeChars(s: String): String = {
    if (s.isEmpty) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        // 1. soft hyphen stripped (fixutf8.pl soft-hyphen rule)
        case '\u00AD' =>
        // 2. zero-width chars stripped (ZWSP, ZWNJ, ZWJ, BOM)
        case '\u200B' | '\u200C' | '\u200D' | '\uFEFF' =>
        // 3. latin ligatures expanded
        case '\uFB00' => sb.append("ff")
        case '\uFB01' => sb.append("fi")
        case '\uFB02' => sb.append("fl")
        case '\uFB03' => sb.append("ffi")
        case '\uFB04' => sb.append("ffl")
        // 4. NBSP family -> plain space (NBSP, NNBSP, THIN SPACE)
        case '\u00A0' | '\u202F' | '\u2009' => sb.append(' ')
        case _ => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** Collapse every whitespace run to a single space and trim. */
  def collapseWhitespace(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    var pendingSpace = false
    var started = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (c.isWhitespace) { if (started) pendingSpace = true }
      else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
        started = true
      }
      i += 1
    }
    sb.toString
  }

  /** Full per-block normalization for the HTML branch. Semantically
    * IDENTICAL to `collapseWhitespace(normalizeChars(s))` (property-tested)
    * but fused into one pass — this runs once per block per document and the
    * intermediate copy showed up in kernel profiles. */
  def normalizeBlock(s: String): String = {
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var pendingSpace = false
    var started = false
    def emit(c: Char): Unit = {
      if (c.isWhitespace) { if (started) pendingSpace = true }
      else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
        started = true
      }
    }
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      c match {
        case '\u00AD' | '\u200B' | '\u200C' | '\u200D' | '\uFEFF' => // stripped
        case '\uFB00' => emit('f'); emit('f')
        case '\uFB01' => emit('f'); emit('i')
        case '\uFB02' => emit('f'); emit('l')
        case '\uFB03' => emit('f'); emit('f'); emit('i')
        case '\uFB04' => emit('f'); emit('f'); emit('l')
        case '\u00A0' | '\u202F' | '\u2009' => emit(' ')
        case other => emit(other)
      }
      i += 1
    }
    sb.toString
  }

  /** BiDi visual reordering for RTL documents (T4 analog: fribidi
    * log2vis with RTL base direction, main/gtkDisplay.c:306-337), via
    * java.text.Bidi. Applied per block (blocks are single logical lines
    * after whitespace collapse). Returns the input unchanged when no BiDi
    * processing is required. */
  def bidiVisual(line: String, rtlBase: Boolean): String = {
    if (line.isEmpty) return line
    if (!rtlBase) {
      // fast path: every RTL-directional code unit (Hebrew/Arabic blocks,
      // RLM/RLE/RLO marks, presentation forms) is >= U+0590, so a line of
      // smaller chars can never require BiDi — skips the toCharArray copy
      // + directionality scan for the (dominant) latin case
      var i = 0
      val nn = line.length
      while (i < nn && line.charAt(i) < '\u0590') i += 1
      if (i == nn) return line
      if (!java.text.Bidi.requiresBidi(line.toCharArray, 0, line.length)) return line
    }
    val base =
      if (rtlBase) java.text.Bidi.DIRECTION_DEFAULT_RIGHT_TO_LEFT
      else java.text.Bidi.DIRECTION_DEFAULT_LEFT_TO_RIGHT
    val bidi = new java.text.Bidi(line, base)
    if (bidi.isLeftToRight) return line
    val rc = bidi.getRunCount
    val levels = new Array[Byte](rc)
    val runs = new Array[AnyRef](rc)
    var i = 0
    while (i < rc) {
      levels(i) = bidi.getRunLevel(i).toByte
      val s = line.substring(bidi.getRunStart(i), bidi.getRunLimit(i))
      // odd (RTL) runs render right-to-left: reverse their clusters
      runs(i) = if ((bidi.getRunLevel(i) & 1) == 1) reverseRun(s) else s
      i += 1
    }
    java.text.Bidi.reorderVisually(levels, 0, runs, 0, rc)
    runs.mkString
  }

  /** Reverse an RTL run VISUALLY: combining marks stay attached after
    * their base (fribidi keeps clusters intact — the reference's reorder,
    * main/gtkDisplay.c:306-337) and surrogate pairs are never split. A
    * naive per-char reverse emitted mark-before-base sequences (breaking
    * the downstream yi-utf8/fixspell rules that match base+mark) and
    * ill-formed UTF-16 for supplementary-plane RTL scripts (round-3
    * review finding). */
  private def reverseRun(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var end = s.length
    var i = s.length
    while (i > 0) {
      val cp = s.codePointBefore(i)
      i -= Character.charCount(cp)
      val t = Character.getType(cp)
      val isMark = t == Character.NON_SPACING_MARK ||
        t == Character.COMBINING_SPACING_MARK || t == Character.ENCLOSING_MARK
      if (!isMark) { sb.append(s, i, end); end = i }
    }
    if (end > 0) sb.append(s, 0, end) // leading orphan marks: visual end
    sb.toString
  }

  /** Assemble kept blocks into (text, spans). */
  def assemble(kept: Seq[(String, String)]): (String, Vector[Span]) = {
    if (kept.isEmpty) return ("", Vector.empty)
    val sb = new java.lang.StringBuilder
    val spans = Vector.newBuilder[Span]
    var first = true
    kept.foreach { case (text, kind) =>
      if (!first) sb.append("\n\n")
      val begin = sb.length
      sb.append(text)
      spans += Span(begin, sb.length, kind)
      first = false
    }
    sb.append('\n')
    (sb.toString, spans.result())
  }

  /** End-to-end assembly of classified blocks for the HTML branch. */
  def assembleBlocks(
      classified: Seq[(Block, String)],
      cfg: ExtractorConfig,
      lang: String): (String, Vector[Span]) = {
    val rtl = cfg.rtlLangs.contains(lang)
    val pieces = classified.iterator.map { case (b, kind) =>
      val norm = normalizeBlock(b.text)
      (if (rtl) bidiVisual(norm, rtlBase = true) else norm, kind)
    }.filter(_._1.nonEmpty).toVector
    assemble(pieces)
  }
}
