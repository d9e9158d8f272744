package graft.core.pdf

import graft.core.{ExtractorConfig, Span}
import scala.collection.mutable.ArrayBuffer

/** Minimal deterministic PDF text extractor (PDFBox-style text-run ordering,
  * pure JVM, no deps) for uncompressed content streams.
  *
  * The analog of the reference's upstream PDF branch (pdftk burst +
  * ghostscript, main/Makefile:70-93) fused with its geometric line assembly:
  *  - text runs are collected with (page, x, y, fontSize) from BT..ET text
  *    objects (operators Tf, Td, TD, Tm, TL, T*, Tj, TJ, ', ");
  *  - runs group into lines by y-proximity (insertGlyph 3-case overlap
  *    analog, main/segment.c:160-274) and sort by x within a line
  *    (x-sorted insert, main/segment.c:230-247);
  *  - lines sort by (page, -y); ties broken by stream order — the total
  *    order required by SURVEY §7.4.4;
  *  - word spacing: gap > spaceFraction×charWidth emits
  *    max(1, floor(gap/charWidth) - 1) spaces (T1: collectText,
  *    main/gtkDisplay.c:202-224; spaceFraction default 0.60, main/ocr.h:62);
  *  - indentation: floor((x - minX)/charWidth) leading spaces (T2,
  *    main/gtkDisplay.c:290-304);
  *  - blank lines between paragraphs: floor(gap/lineHeight) - 1, clamped >=0,
  *    and if > 2 then n/2 + 1 (T3, main/gtkDisplay.c:263-274,341-355);
  *  - char-level normalization applied; whitespace is NOT collapsed (layout
  *    is the signal in this branch).
  *
  * charWidth := 0.5 × fontSize; lineHeight := pdfLineHeightFactor × fontSize.
  */
object PdfTextExtractor {

  final case class Run(page: Int, x: Double, y: Double, fontSize: Double, text: String, seq: Int)

  /** Extract (text, spans) from raw PDF bytes. Spans are one per output
    * line, kind = "line". Returns None on unparseable payloads.
    * @param rtl reverse column reading order (reference: RTL books process
    *            columns right-to-left, main/main.c:252-261) */
  def extract(bytes: Array[Byte], cfg: ExtractorConfig, rtl: Boolean = false): Option[(String, Vector[Span])] = {
    val content = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    val runs = parseRuns(content)
    if (runs.isEmpty) return None
    Some(assembleRuns(runs, cfg, rtl))
  }

  /** Parse every `stream...endstream` body as a content stream; one stream =
    * one page (matches generated fixtures; embedded non-text streams yield no
    * BT/ET runs and are harmless).
    *
    * Real-PDF affordances (VERDICT r1 fixes #2/#4):
    *  - `/Length` in the stream dict bounds the body when present (so a
    *    compressed body containing the byte pattern "endstream" cannot
    *    truncate the scan);
    *  - `/Filter /FlateDecode` bodies are inflated (java.util.zip — the
    *    compression every real-world PDF writer emits; the reference
    *    reaches arbitrary PDFs via ghostscript, main/Makefile:84-93);
    *  - `/Rotate 90|180|270` in the dict segment preceding the stream maps
    *    the page's runs back to display orientation (the reference deskews
    *    every page, main/readPicture.c:122-221). This mini-parser reads the
    *    rotation from the stream's own object dict segment — the common
    *    page-then-contents layout — not the full page-tree object graph. */
  private[pdf] def parseRuns(content: String): Vector[Run] = {
    val runs = new ArrayBuffer[Run](16)
    var page = 0
    var from = 0
    var seq = 0
    while (from < content.length) {
      val s = content.indexOf("stream", from)
      if (s < 0) { from = content.length }
      else {
        val dict = content.substring(from, s)
        var bodyStart = s + "stream".length
        if (bodyStart < content.length && content.charAt(bodyStart) == '\r') bodyStart += 1
        if (bodyStart < content.length && content.charAt(bodyStart) == '\n') bodyStart += 1
        val e = dictInt(dict, "/Length") match {
          case Some(n) if n >= 0 && bodyStart + n <= content.length &&
              content.indexOf("endstream", bodyStart + n) >= 0 &&
              content.indexOf("endstream", bodyStart + n) - (bodyStart + n) <= 2 =>
            bodyStart + n // trust /Length when endstream follows (± EOL)
          case _ => content.indexOf("endstream", bodyStart)
        }
        if (e < 0) { from = content.length }
        else {
          val raw = content.substring(bodyStart, e)
          val body =
            if (dict.contains("/FlateDecode")) inflate(raw).getOrElse("")
            else raw
          val before = runs.length
          seq = parseContentStream(body, page, runs, seq)
          dictInt(dict, "/Rotate").map(r => ((r % 360) + 360) % 360) match {
            case Some(rot) if rot == 90 || rot == 180 || rot == 270 =>
              var k = before
              while (k < runs.length) {
                val r = runs(k)
                // display = clockwise rotation of content coords (y-up):
                // 90 → (y,−x); 180 → (−x,−y); 270 → (−y,x). Translation is
                // irrelevant — ordering and indents use relative coords.
                val (dx, dy) = rot match {
                  case 90 => (r.y, -r.x)
                  case 180 => (-r.x, -r.y)
                  case _ => (-r.y, r.x)
                }
                runs(k) = r.copy(x = dx, y = dy)
                k += 1
              }
            case _ =>
          }
          page += 1
          from = content.indexOf("endstream", e) + "endstream".length
        }
      }
    }
    runs.toVector
  }

  /** Last `key <int>` in a dict segment, tolerant of whitespace. Requires
    * a non-name character after the key (so `/Length` never matches inside
    * `/Length1`/`/Length2` font-stream keys) and rejects indirect
    * references (`/Length 10 0 R` — the value lives in another object we
    * don't resolve; returning 10 would mis-bound the stream). */
  private def dictInt(dict: String, key: String): Option[Int] = {
    var i = dict.lastIndexOf(key)
    while (i >= 0 && i + key.length < dict.length && {
      val c = dict.charAt(i + key.length)
      Character.isLetterOrDigit(c) // e.g. /Length1 — not our key
    }) i = dict.lastIndexOf(key, i - 1)
    if (i < 0) None
    else {
      var j = i + key.length
      while (j < dict.length && dict.charAt(j).isWhitespace) j += 1
      val st = j
      if (j < dict.length && (dict.charAt(j) == '-' || dict.charAt(j) == '+')) j += 1
      while (j < dict.length && dict.charAt(j).isDigit) j += 1
      if (j == st) None
      else {
        // indirect reference? `<int> <gen> R`
        var k = j
        while (k < dict.length && dict.charAt(k).isWhitespace) k += 1
        val genStart = k
        while (k < dict.length && dict.charAt(k).isDigit) k += 1
        if (k > genStart) {
          var m = k
          while (m < dict.length && dict.charAt(m).isWhitespace) m += 1
          if (m < dict.length && dict.charAt(m) == 'R') return None
        }
        try Some(dict.substring(st, j).toInt)
        catch { case _: NumberFormatException => None }
      }
    }
  }

  /** Hard cap on an inflated stream body (round-4 review): deflate
    * amplifies up to ~1030×, so a 2 MB flate bomb would otherwise inflate
    * toward 2 GB and the resulting OutOfMemoryError — an Error, NOT
    * NonFatal — would escape the extractor's catch and kill the executor
    * instead of yielding one parse_error row. 64 MB is ~32× the payload
    * cap: far above any real content stream, far below OOM territory. */
  private val MaxInflatedBytes = 64 << 20

  /** Inflate a FlateDecode body (chars are latin-1-mapped bytes). None on
    * corrupt input — the page then contributes no runs, same taxonomy as a
    * non-text stream. */
  private def inflate(raw: String): Option[String] = {
    try {
      val in = raw.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      val inf = new java.util.zip.Inflater()
      try {
        inf.setInput(in)
        val out = new java.io.ByteArrayOutputStream(math.max(64, in.length * 4))
        val buf = new Array[Byte](8192)
        while (!inf.finished()) {
          val n = inf.inflate(buf)
          if (n == 0) {
            // a zlib header with FDICT set reports needsDictionary() and
            // inflates 0 bytes forever with needsInput() still false —
            // without this check the loop spins and the task HANGS
            // (round-4 review); PDFs never use preset dictionaries, so
            // any such stream is corrupt
            if (inf.needsDictionary())
              throw new java.util.zip.DataFormatException("deflate preset dictionary unsupported")
            if (inf.needsInput())
              throw new java.util.zip.DataFormatException("truncated deflate body")
            // any other zero-progress state: refuse rather than spin
            throw new java.util.zip.DataFormatException("deflate made no progress")
          }
          out.write(buf, 0, n)
          if (out.size > MaxInflatedBytes)
            throw new java.util.zip.DataFormatException("inflated stream exceeds cap (flate bomb)")
        }
        Some(new String(out.toByteArray, java.nio.charset.StandardCharsets.ISO_8859_1))
      } finally inf.end()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  // --- content-stream operator machine -------------------------------------

  private def parseContentStream(cs: String, page: Int, out: ArrayBuffer[Run], seq0: Int): Int = {
    var seq = seq0
    var i = 0
    val n = cs.length
    // text state
    var fontSize = 12.0
    var leading = 0.0
    var tx = 0.0
    var ty = 0.0
    var lineX = 0.0 // line start (Td is relative to line start)
    var lineY = 0.0
    var inText = false
    // operand stack: numbers and strings in order
    val nums = new ArrayBuffer[Double](6)
    var pendingStrings = new ArrayBuffer[String](2)
    // TJ array elements: Right(string) | Left(kerning adjustment)
    val pendingArray = new ArrayBuffer[Either[Double, String]](4)

    def emit(text: String): Unit = {
      if (text.nonEmpty) {
        out += Run(page, tx, ty, fontSize, text, seq)
        seq += 1
        tx += text.length * 0.5 * fontSize // advance estimate for same-line Tj runs
      }
    }

    while (i < n) {
      val c = cs.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '%') { // comment to EOL
        while (i < n && cs.charAt(i) != '\n') i += 1
      } else if (c == '(') {
        val (str, after) = parseLiteralString(cs, i)
        pendingStrings += str
        i = after
      } else if (c == '[') {
        // TJ array: strings interleaved with kerning numbers. A number k
        // displaces the NEXT string by −k/1000 × fontSize (PDF 32000-1
        // §9.4.3) — real-world PDFs encode word gaps exactly this way, so
        // kerning must reach the x advance for the T1 spacing rule.
        pendingArray.clear()
        i += 1
        while (i < n && cs.charAt(i) != ']') {
          val ch = cs.charAt(i)
          if (ch == '(') {
            val (str, after) = parseLiteralString(cs, i)
            pendingArray += Right(str); i = after
          } else if (ch == '<') {
            // hex string element — decode it; its digits must NOT fall
            // through to the number branch (they would be read as huge
            // kerning values and wreck the x positions)
            val e = cs.indexOf('>', i + 1)
            val hex = if (e < 0) cs.substring(i + 1) else cs.substring(i + 1, e)
            pendingArray += Right(decodeHexString(hex))
            i = if (e < 0) n else e + 1
          } else if (ch == '-' || ch == '+' || ch == '.' || ch.isDigit) {
            val st = i
            i += 1
            while (i < n && (cs.charAt(i).isDigit || cs.charAt(i) == '.')) i += 1
            try pendingArray += Left(cs.substring(st, i).toDouble)
            catch { case _: NumberFormatException => }
          } else i += 1
        }
        if (i < n) i += 1 // skip ']'
      } else if (c == '<' && i + 1 < n && cs.charAt(i + 1) != '<') {
        // hex string — decode as latin-1 bytes
        val e = cs.indexOf('>', i + 1)
        val hex = if (e < 0) cs.substring(i + 1) else cs.substring(i + 1, e)
        pendingStrings += decodeHexString(hex)
        i = if (e < 0) n else e + 1
      } else if (c == '<') { // dict << — skip to matching >>
        val e = cs.indexOf(">>", i + 2)
        i = if (e < 0) n else e + 2
      } else if (c == '/') { // name
        i += 1
        while (i < n && !cs.charAt(i).isWhitespace && "()[]<>/%".indexOf(cs.charAt(i)) < 0) i += 1
      } else if (c == '-' || c == '+' || c == '.' || c.isDigit) {
        val start = i
        i += 1
        while (i < n && (cs.charAt(i).isDigit || cs.charAt(i) == '.')) i += 1
        try nums += cs.substring(start, i).toDouble catch { case _: NumberFormatException => }
      } else {
        // operator token
        val start = i
        while (i < n && { val ch = cs.charAt(i); !ch.isWhitespace && "()[]<>/%".indexOf(ch) < 0 && !ch.isDigit }) i += 1
        val op = cs.substring(start, i)
        op match {
          case "BT" =>
            inText = true; tx = 0; ty = 0; lineX = 0; lineY = 0
          case "ET" => inText = false
          case "Tf" => if (nums.nonEmpty) fontSize = nums.last
          case "TL" => if (nums.nonEmpty) leading = nums.last
          case "Td" => if (nums.length >= 2) {
              lineX += nums(nums.length - 2); lineY += nums.last
              tx = lineX; ty = lineY
            }
          case "TD" => if (nums.length >= 2) {
              leading = -nums.last
              lineX += nums(nums.length - 2); lineY += nums.last
              tx = lineX; ty = lineY
            }
          case "Tm" => if (nums.length >= 6) {
              lineX = nums(nums.length - 2); lineY = nums.last
              tx = lineX; ty = lineY
            }
          case "T*" | "Tstar" =>
            lineY -= (if (leading != 0.0) leading else fontSize * 1.2)
            tx = lineX; ty = lineY
          case "Tj" =>
            if (inText && pendingStrings.nonEmpty) emit(pendingStrings.last)
          case "TJ" =>
            if (inText) {
              if (pendingArray.nonEmpty) pendingArray.foreach {
                case Right(s) => emit(s)
                case Left(adj) => tx -= adj / 1000.0 * fontSize
              }
              else if (pendingStrings.nonEmpty) emit(pendingStrings.last)
            }
          case "'" =>
            lineY -= (if (leading != 0.0) leading else fontSize * 1.2)
            tx = lineX; ty = lineY
            if (inText && pendingStrings.nonEmpty) emit(pendingStrings.last)
          case "\"" =>
            lineY -= (if (leading != 0.0) leading else fontSize * 1.2)
            tx = lineX; ty = lineY
            if (inText && pendingStrings.nonEmpty) emit(pendingStrings.last)
          case _ => // unknown operator: clear operands below
        }
        if (op.nonEmpty) { nums.clear(); pendingStrings = new ArrayBuffer[String](2); pendingArray.clear() }
        if (i == start) i += 1 // safety: never stall
      }
    }
    seq
  }

  /** Hex string body → latin-1 chars (PDF 32000-1 §7.3.4.3): non-hex chars
    * ignored; an ODD final digit is padded with 0 — `<48656C2>` ends with
    * 0x20, not a dropped byte (round-3 review: both call sites previously
    * duplicated this decode AND dropped the odd digit). */
  private[core] def decodeHexString(hex: String): String = {
    val clean = hex.filter(h => Character.digit(h, 16) >= 0)
    val sb = new java.lang.StringBuilder(clean.length / 2 + 1)
    var k = 0
    while (k + 1 < clean.length) {
      sb.append(Integer.parseInt(clean.substring(k, k + 2), 16).toChar); k += 2
    }
    if (k < clean.length) // odd digit count: final digit + assumed 0
      sb.append((Character.digit(clean.charAt(k), 16) * 16).toChar)
    sb.toString
  }

  /** PDF literal string at `i` (pointing at '('), with \-escapes and nested
    * parens. Returns (decoded, indexAfterClosingParen). */
  private[core] def parseLiteralString(cs: String, i0: Int): (String, Int) = {
    val sb = new java.lang.StringBuilder
    var i = i0 + 1
    var depth = 1
    val n = cs.length
    while (i < n && depth > 0) {
      val c = cs.charAt(i)
      if (c == '\\' && i + 1 < n) {
        val e = cs.charAt(i + 1)
        e match {
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'b' => sb.append('\b'); i += 2
          case 'f' => sb.append('\f'); i += 2
          case '(' => sb.append('('); i += 2
          case ')' => sb.append(')'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case d if d >= '0' && d <= '7' =>
            var k = i + 1
            var v = 0
            var cnt = 0
            while (k < n && cnt < 3 && cs.charAt(k) >= '0' && cs.charAt(k) <= '7') {
              v = v * 8 + (cs.charAt(k) - '0'); k += 1; cnt += 1
            }
            // §7.3.4.2: high-order overflow is ignored — \777 is byte 0xFF
            sb.append((v & 0xFF).toChar); i = k
          case '\n' => i += 2 // line continuation
          case '\r' => // §7.3.4.2: \CR and \CRLF are line continuations too
            i += 2     // (round-4 review: these fell through to the generic
                       // escape case and injected a raw CR into the run)
            if (i < n && cs.charAt(i) == '\n') i += 1
          case other => sb.append(other); i += 2
        }
      } else if (c == '(') { depth += 1; sb.append(c); i += 1 }
      else if (c == ')') { depth -= 1; if (depth > 0) sb.append(c); i += 1 }
      else { sb.append(c); i += 1 }
    }
    (sb.toString, i)
  }

  // --- layout assembly ------------------------------------------------------

  private final case class Line(page: Int, y: Double, fontSize: Double, runs: ArrayBuffer[Run]) {
    lazy val sortedRuns: ArrayBuffer[Run] = runs.sortBy(r => (r.x, r.seq))
    def minX: Double = sortedRuns.head.x
    def maxX: Double = {
      var m = Double.MinValue
      sortedRuns.foreach(r => m = math.max(m, r.x + r.text.length * 0.5 * r.fontSize))
      m
    }
  }

  /** Minimum gutter width (pt) for a column split (G2 analog: computeBorders
    * scans for min-black column dividers, main/segment.c:775-843). Wider
    * than any plausible word gap so intra-line spacing never fakes a
    * column boundary. */
  private val MinGutter = 36.0

  /** Recursive column split of one page's RUNS (the reference splits
    * columns BEFORE line assembly, main/main.c:252-261 — essential, because
    * same-y lines in different columns would otherwise merge): find a
    * vertical gutter no run crosses, with >= 2 runs on >= 2 distinct
    * baselines on each side; columns read left→right. */
  private def splitColumns(runs: ArrayBuffer[Run], depth: Int): ArrayBuffer[ArrayBuffer[Run]] = {
    if (depth <= 0 || runs.length < 4) return ArrayBuffer(runs)
    def endX(r: Run): Double = r.x + r.text.length * 0.5 * r.fontSize
    val byX = runs.sortBy(_.x)
    def distinctYs(rs: collection.Seq[Run]): Int = rs.map(r => math.round(r.y)).distinct.length
    var bestAt = -1
    var bestGap = MinGutter
    var maxReach = Double.MinValue
    var i = 0
    while (i < byX.length - 1) {
      maxReach = math.max(maxReach, endX(byX(i)))
      val gap = byX(i + 1).x - maxReach
      if (i >= 1 && i + 1 <= byX.length - 2 && gap > bestGap) {
        bestGap = gap; bestAt = i
      }
      i += 1
    }
    if (bestAt < 0) ArrayBuffer(runs)
    else {
      val left = byX.take(bestAt + 1)
      val right = byX.drop(bestAt + 1)
      if (distinctYs(left) < 2 || distinctYs(right) < 2) ArrayBuffer(runs)
      else splitColumns(left, depth - 1) ++ splitColumns(right, depth - 1)
    }
  }

  /** Whitespace-amplification caps (see assembleRuns). */
  private final val MaxBlankLines = 40
  private final val MaxLineWhitespace = 400

  /** floor-result → bounded non-negative Int; NaN/Infinity-safe. */
  private def clampCount(v: Double, max: Int): Int =
    if (v.isNaN || v <= 0.0) 0
    else if (v >= max.toDouble) max
    else v.toInt

  private def groupLines(runs: ArrayBuffer[Run], cfg: ExtractorConfig): ArrayBuffer[Line] = {
    val lines = new ArrayBuffer[Line]
    runs.foreach { r =>
      lines.find(l => math.abs(l.y - r.y) <= cfg.pdfLineYTolerance) match {
        case Some(l) => l.runs += r
        case None => lines += Line(r.page, r.y, r.fontSize, ArrayBuffer(r))
      }
    }
    lines
  }

  private[pdf] def assembleRuns(runs: Vector[Run], cfg: ExtractorConfig, rtl: Boolean = false): (String, Vector[Span]) = {
    // page → columns over RUNS (G2) → line grouping → (−y, seq) per column.
    // RTL documents read pages back-to-front (reference: pages.pl emits
    // the page list in reverse for RTL books) and columns right-to-left.
    val pages0 = runs.groupBy(_.page).toSeq.sortBy(_._1)
    val pages = if (rtl) pages0.reverse else pages0
    // each element: (column lines sorted top-to-bottom, column minX)
    val columns = pages.flatMap { case (_, pageRuns) =>
      val buf = new ArrayBuffer[Run](pageRuns.length)
      buf ++= pageRuns
      val cols = splitColumns(buf, depth = 2)
      val ordered = if (rtl) cols.reverse else cols // RTL: right column first
      ordered.map { colRuns =>
        val col = groupLines(colRuns, cfg)
        (col.sortBy(l => (-l.y, l.runs.map(_.seq).min)), colRuns.iterator.map(_.x).min)
      }
    }

    val sb = new java.lang.StringBuilder
    val spans = Vector.newBuilder[Span]
    var first = true
    columns.foreach { case (colLines, colMinX) =>
      var prevY = Double.NaN
      var firstInCol = true
      colLines.foreach { line =>
        val fs = line.runs.head.fontSize
        val charW = 0.5 * fs
        val lineH = cfg.pdfLineHeightFactor * fs
        // ALL whitespace counts are clamped: a hostile/degenerate PDF
        // (fontSize 0 => charW 0 => gap/charW = Infinity, or plain huge
        // coordinates) must produce a bounded row, never an
        // OutOfMemoryError that escapes the failure-is-data contract
        // (round-3 review finding; OOM is not NonFatal). The caps sit far
        // above anything a real layout produces (a page is ~66 lines tall
        // and ~100 chars wide at 12pt).
        if (!first) {
          if (firstInCol) {
            sb.append('\n') // column/page boundary: single break
          } else {
            val gap = prevY - line.y
            var blanks = clampCount(math.floor(gap / lineH) - 1, MaxBlankLines)
            if (blanks > 2) blanks = blanks / 2 + 1 // T3 halving rule
            sb.append('\n')
            var k = 0
            while (k < blanks) { sb.append('\n'); k += 1 }
          }
        }
        val begin = sb.length
        // indentation (T2) — relative to the COLUMN's left margin
        // (reference keeps margins per column, main/segment.c:164-165)
        val indent = clampCount(math.floor((line.minX - colMinX) / charW), MaxLineWhitespace)
        var k = 0
        while (k < indent) { sb.append(' '); k += 1 }
        // word spacing between runs (T1)
        var prevEnd = Double.NaN
        line.sortedRuns.foreach { r =>
          if (!prevEnd.isNaN) {
            val gap = r.x - prevEnd
            if (gap > cfg.pdfSpaceFraction * charW) {
              val nSpaces = math.max(1,
                clampCount(math.floor(gap / charW) - 1, MaxLineWhitespace))
              var j = 0
              while (j < nSpaces) { sb.append(' '); j += 1 }
            }
          }
          sb.append(graft.core.assemble.TextAssembler.normalizeChars(r.text))
          prevEnd = r.x + r.text.length * charW
        }
        spans += Span(begin, sb.length, graft.core.BlockKind.Line)
        prevY = line.y
        first = false
        firstInCol = false
      }
    }
    sb.append('\n')
    (sb.toString, spans.result())
  }
}
