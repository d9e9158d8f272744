package graft.core

import graft.core.pdf.PdfTextExtractor
import org.scalatest.funsuite.AnyFunSuite

class PdfTextExtractorSpec extends AnyFunSuite {
  private val cfg = ExtractorConfig.default

  private def pdf(streams: String*): Array[Byte] = {
    val sb = new StringBuilder("%PDF-1.4\n1 0 obj << /Type /Catalog >> endobj\n")
    streams.zipWithIndex.foreach { case (s, i) =>
      sb.append(s"${i + 3} 0 obj << /Length ${s.length} >> stream\n")
      sb.append(s).append("endstream endobj\n")
    }
    sb.append("trailer\n%%EOF\n")
    sb.toString.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
  }

  private def text(streams: String*): String =
    PdfTextExtractor.extract(pdf(streams: _*), cfg).get._1

  test("single line") {
    assert(text("BT /F1 12 Tf 72 720 Td (Hello world) Tj ET\n") == "Hello world\n")
  }

  test("lines ordered by descending y regardless of stream order") {
    val s = "BT /F1 12 Tf 72 700 Td (second) Tj ET\n" +
            "BT /F1 12 Tf 72 720 Td (first) Tj ET\n"
    assert(text(s) == "first\nsecond\n")
  }

  test("runs within a line sorted by x; word spacing from gap (T1 analog)") {
    // charW = 6; gap of 12 between runs → max(1, floor(12/6)-1) = 1 space
    val s = "BT /F1 12 Tf 102 720 Td (beta) Tj ET\n" + // 72 + 5*6 = 102 → gap 12 after "alpha"(5 chars → ends 102)... use explicit numbers
            "BT /F1 12 Tf 72 720 Td (alpha) Tj ET\n"
    // alpha ends at 72+5*6=102; beta at 102 → gap 0 → no space
    assert(text(s) == "alphabeta\n")
    val s2 = "BT /F1 12 Tf 72 720 Td (alpha) Tj ET\nBT /F1 12 Tf 114 720 Td (beta) Tj ET\n"
    // gap = 114-102 = 12 > 0.6*6 → spaces = max(1, floor(12/6)-1) = 1
    assert(text(s2) == "alpha beta\n")
    val s3 = "BT /F1 12 Tf 72 720 Td (alpha) Tj ET\nBT /F1 12 Tf 126 720 Td (beta) Tj ET\n"
    // gap = 24 → floor(24/6)-1 = 3 spaces
    assert(text(s3) == "alpha   beta\n")
  }

  test("indentation from x offset (T2 analog)") {
    val s = "BT /F1 12 Tf 72 720 Td (flush) Tj ET\n" +
            "BT /F1 12 Tf 90 700 Td (indented) Tj ET\n" // (90-72)/6 = 3
    assert(text(s) == "flush\n   indented\n")
  }

  test("blank lines from y gap; halving rule for gaps > 2 (T3 analog)") {
    // lineH = 14.4. gap 21.4 → floor=1 → 0 blanks
    val a = "BT /F1 12 Tf 72 720 Td (a) Tj ET\nBT /F1 12 Tf 72 698.6 Td (b) Tj ET\n"
    assert(text(a) == "a\nb\n")
    // gap = 2*14.4+7=35.8 → floor=2 → 1 blank
    val b = "BT /F1 12 Tf 72 720 Td (a) Tj ET\nBT /F1 12 Tf 72 684.2 Td (b) Tj ET\n"
    assert(text(b) == "a\n\nb\n")
    // gap = 6*14.4+7=93.4 → floor=6 → blanks=5 → >2 → 5/2+1=3
    val c = "BT /F1 12 Tf 72 720 Td (a) Tj ET\nBT /F1 12 Tf 72 626.6 Td (b) Tj ET\n"
    assert(text(c) == "a\n\n\n\nb\n")
  }

  test("multi-page: pages in stream order, single newline at boundary") {
    val p1 = "BT /F1 12 Tf 72 720 Td (page one) Tj ET\n"
    val p2 = "BT /F1 12 Tf 72 720 Td (page two) Tj ET\n"
    assert(text(p1, p2) == "page one\npage two\n")
  }

  test("literal string escapes: parens, backslash, octal, newline") {
    assert(text("BT /F1 12 Tf 72 720 Td (a \\(b\\) c\\\\d \\101) Tj ET\n") == "a (b) c\\d A\n")
  }

  test("TD/T*/quote operators advance lines; TJ concatenates array strings") {
    val s = "BT /F1 12 Tf 72 720 Td (one) Tj 0 -20 TD (two) Tj T* (three) Tj ET\n"
    assert(text(s) == "one\ntwo\nthree\n")
    val tj = "BT /F1 12 Tf 72 720 Td [(con) -20 (cat)] TJ ET\n"
    assert(text(tj) == "concat\n") // -20/1000*12 = 0.24pt — below the space gate
  }

  test("TJ kerning displaces the x advance: word gaps encoded as kerning get T1 spacing") {
    // -2000/1000*12 = 24pt gap -> floor(24/6)-1 = 3 spaces
    assert(text("BT /F1 12 Tf 72 720 Td [(alpha) -2000 (beta)] TJ ET\n") == "alpha   beta\n")
    // -600/1000*12 = 7.2pt -> max(1, floor(7.2/6)-1) = 1 space
    assert(text("BT /F1 12 Tf 72 720 Td [(alpha) -600 (beta)] TJ ET\n") == "alpha beta\n")
    // positive kerning tightens (moves left): still joined
    assert(text("BT /F1 12 Tf 72 720 Td [(al) 500 (pha)] TJ ET\n") == "alpha\n")
  }

  test("TJ array hex strings decode as text, never as kerning digits") {
    // <626574> = "bet"; its digits must not be read as a 626574/1000 kern
    assert(text("BT /F1 12 Tf 72 720 Td [(alpha) -600 <62657461>] TJ ET\n") == "alpha beta\n")
  }

  test("/Length1 (font-stream key) never shadows /Length; indirect /Length falls back safely") {
    val cs = "BT /F1 12 Tf 72 720 Td (guarded) Tj ET\n"
    val body = cs.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    def doc(dict: String) = (s"%PDF-1.4\n3 0 obj << $dict >> stream\n")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1) ++ body ++
      "\nendstream endobj\ntrailer\n%%EOF\n".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    // /Length1 after /Length: lastIndexOf must not land inside /Length1
    val t1 = PdfTextExtractor.extract(doc(s"/Length ${body.length} /Length1 5678"), cfg).get._1
    assert(t1 == "guarded\n")
    // indirect /Length (10 0 R): unresolvable → fall back to endstream scan
    val t2 = PdfTextExtractor.extract(doc("/Length 10 0 R"), cfg).get._1
    assert(t2 == "guarded\n")
  }

  test("spans: one per line, offsets exact") {
    val (t, spans) = PdfTextExtractor.extract(
      pdf("BT /F1 12 Tf 72 720 Td (ab) Tj ET\nBT /F1 12 Tf 72 700 Td (cd) Tj ET\n"), cfg).get
    assert(t == "ab\ncd\n")
    assert(spans == Vector(Span(0, 2, "line"), Span(3, 5, "line")))
  }

  test("two-column page: left column read fully before right (G2 analog)") {
    // identical baselines across columns — without run-level column split
    // these lines would merge and interleave
    val s = "BT /F1 12 Tf 72 720 Td (left one) Tj ET\n" +
            "BT /F1 12 Tf 312 720 Td (right one) Tj ET\n" +
            "BT /F1 12 Tf 72 700 Td (left two) Tj ET\n" +
            "BT /F1 12 Tf 312 700 Td (right two) Tj ET\n"
    assert(text(s) == "left one\nleft two\nright one\nright two\n")
  }

  test("word gaps never fake a column split (gutter threshold)") {
    // two runs per line with a 24pt aligned gap — below the 36pt gutter
    val s = "BT /F1 12 Tf 72 720 Td (aa) Tj ET\nBT /F1 12 Tf 108 720 Td (bb) Tj ET\n" +
            "BT /F1 12 Tf 72 700 Td (cc) Tj ET\nBT /F1 12 Tf 108 700 Td (dd) Tj ET\n"
    // gap = 108 - (72+12) = 24 < 36 → one column, runs joined as words
    val t0 = text(s)
    assert(t0 == "aa   bb\ncc   dd\n", t0)
  }

  test("column-relative indentation (T2 per column margin)") {
    val s = "BT /F1 12 Tf 72 720 Td (lefthead) Tj ET\n" +
            "BT /F1 12 Tf 84 700 Td (leftind) Tj ET\n" + // (84-72)/6 = 2
            "BT /F1 12 Tf 312 720 Td (righthead) Tj ET\n" +
            "BT /F1 12 Tf 324 700 Td (rightind) Tj ET\n" // relative to 312 → 2
    assert(text(s) == "lefthead\n  leftind\nrighthead\n  rightind\n")
  }

  test("RTL documents read the right column first (G2 RTL order)") {
    val s = "BT /F1 12 Tf 72 720 Td (left a) Tj ET\n" +
            "BT /F1 12 Tf 312 720 Td (right a) Tj ET\n" +
            "BT /F1 12 Tf 72 700 Td (left b) Tj ET\n" +
            "BT /F1 12 Tf 312 700 Td (right b) Tj ET\n"
    val rtl = PdfTextExtractor.extract(pdf(s), cfg, rtl = true).get._1
    assert(rtl == "right a\nright b\nleft a\nleft b\n")
  }

  test("no text runs → None (parse_error taxonomy upstream)") {
    assert(PdfTextExtractor.extract("%PDF-1.4\ngarbage no streams".getBytes, cfg).isEmpty)
  }

  test("char normalization applied (ligatures) but whitespace preserved") {
    assert(text("BT /F1 12 Tf 72 720 Td (­x) Tj ET\n") == "x\n")
  }

  // --- FlateDecode / /Length / /Rotate (VERDICT r1 #2/#4) ------------------

  private def deflate(s: String): Array[Byte] = {
    val in = s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val d = new java.util.zip.Deflater()
    d.setInput(in); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def pdfObj(dictExtra: String, body: Array[Byte]): Array[Byte] = {
    val head = (s"%PDF-1.4\n1 0 obj << /Type /Catalog >> endobj\n" +
      s"3 0 obj << /Length ${body.length}$dictExtra >> stream\n")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val tail = "\nendstream endobj\ntrailer\n%%EOF\n"
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    head ++ body ++ tail
  }

  test("FlateDecode content stream inflates to the identical text") {
    val cs = "BT /F1 12 Tf 72 720 Td (compressed body) Tj ET\n" +
             "BT /F1 12 Tf 72 700 Td (second line) Tj ET\n"
    val plain = PdfTextExtractor.extract(pdf(cs), cfg).get
    val flated = PdfTextExtractor.extract(pdfObj(" /Filter /FlateDecode", deflate(cs)), cfg).get
    assert(flated == plain)
    assert(flated._1 == "compressed body\nsecond line\n")
  }

  test("corrupt FlateDecode body yields no runs (None), never throws") {
    val junk = Array[Byte](1, 2, 3, 4, 5, 6, 7, 8)
    assert(PdfTextExtractor.extract(pdfObj(" /Filter /FlateDecode", junk), cfg).isEmpty)
  }

  test("/Length bounds the body: a deflate body containing 'endstream' bytes cannot truncate the scan") {
    val cs = "BT /F1 12 Tf 72 720 Td (guarded) Tj ET\n"
    val body = "endstream ".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1) ++
      Array.empty[Byte] // a hostile prefix inside the body
    // raw (uncompressed) stream whose BODY contains the keyword: with
    // /Length honored the parser must still find the real boundary
    val full = body ++ cs.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val t = PdfTextExtractor.extract(pdfObj("", full), cfg).get._1
    assert(t == "guarded\n")
  }

  test("/Rotate 90/180/270 pages come back in reading orientation (G1 analog)") {
    // display layout: "top" at (72,720), "bottom" at (72,700) — emitted in
    // content coords pre-rotated by the inverse transform per rotation
    def obj(rot: Int, runs: Seq[(Double, Double, String)]): Array[Byte] = {
      val cs = runs.map { case (x, y, t) =>
        val (cx, cy) = rot match {
          case 90 => (-y, x)
          case 180 => (-x, -y)
          case 270 => (y, -x)
          case _ => (x, y)
        }
        String.format(java.util.Locale.ROOT,
          "BT /F1 12 Tf %.1f %.1f Td (%s) Tj ET\n", Double.box(cx), Double.box(cy), t)
      }.mkString
      pdfObj(s" /Rotate $rot", cs.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    }
    val layout = Seq((72.0, 720.0, "top"), (72.0, 700.0, "bottom"))
    for (rot <- Seq(90, 180, 270)) {
      val t = PdfTextExtractor.extract(obj(rot, layout), cfg).get._1
      assert(t == "top\nbottom\n", s"rot=$rot got ${t.replace("\n", "\\n")}")
    }
  }

  test("property: rotation round trip — extract(rotated) == extract(plain) over random layouts") {
    val rng = new scala.util.Random(424242L)
    def fmt(v: Double) = String.format(java.util.Locale.ROOT, "%.1f", Double.box(v))
    (1 to 200).foreach { trial =>
      // random grid of runs: 1-3 columns x 2-5 lines, random words
      val nCols = 1 + rng.nextInt(3)
      val runs = for {
        c <- 0 until nCols
        ln <- 0 until (2 + rng.nextInt(4))
      } yield {
        val x = 72.0 + c * 240.0 + rng.nextInt(3) * 6.0
        val y = 720.0 - ln * (14.4 + rng.nextInt(3) * 7.0)
        (x, y, s"w${trial}c${c}l$ln")
      }
      def doc(rot: Int): Array[Byte] = {
        val cs = runs.map { case (x, y, t2) =>
          val (cx, cy) = rot match {
            case 90 => (-y, x)
            case 180 => (-x, -y)
            case 270 => (y, -x)
            case _ => (x, y)
          }
          s"BT /F1 12 Tf ${fmt(cx)} ${fmt(cy)} Td ($t2) Tj ET\n"
        }.mkString
        val dict = if (rot != 0) s"/Rotate $rot" else ""
        (s"%PDF-1.4\n3 0 obj << /Length ${cs.length} $dict >> stream\n" + cs +
          "\nendstream endobj\ntrailer\n%%EOF\n")
          .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      }
      val plain = PdfTextExtractor.extract(doc(0), cfg)
      val rot = Seq(90, 180, 270)(rng.nextInt(3))
      val rotated = PdfTextExtractor.extract(doc(rot), cfg)
      assert(rotated == plain, s"trial $trial rot=$rot")
    }
  }

  test("RTL documents read pages back-to-front (P7 analog: pages.pl reverse order)") {
    val p1 = "BT /F1 12 Tf 72 720 Td (page one) Tj ET\n"
    val p2 = "BT /F1 12 Tf 72 720 Td (page two) Tj ET\n"
    val rtl = PdfTextExtractor.extract(pdf(p1, p2), cfg, rtl = true).get._1
    assert(rtl == "page two\npage one\n")
    // LTR order unchanged
    assert(text(p1, p2) == "page one\npage two\n")
  }

  test("whitespace amplification is clamped: fontSize 0 and huge coordinates stay bounded") {
    // fontSize 0 => charW 0 => gap/charW = Infinity: previously built an
    // Int.MaxValue-space string => OutOfMemoryError killing the task
    val zeroFont = "BT /F1 0 Tf 10 700 Td (a) Tj 500 690 Td (b) Tj ET\n"
    val out1 = text(zeroFont)
    assert(out1.length < 2000, s"unbounded whitespace: ${out1.length} chars")
    assert(out1.contains("a") && out1.contains("b"))
    // plain huge coordinates: ~160MB of spaces before the clamp
    val hugeX = "BT /F1 12 Tf 10 700 Td (a) Tj ET\nBT /F1 12 Tf 999999999 690 Td (b) Tj ET\n"
    val out2 = text(hugeX)
    assert(out2.length < 2000, s"unbounded whitespace: ${out2.length} chars")
    // huge vertical gap: bounded blank lines
    val hugeY = "BT /F1 12 Tf 72 99999999 Td (a) Tj ET\nBT /F1 12 Tf 72 10 Td (b) Tj ET\n"
    val out3 = text(hugeY)
    assert(out3.count(_ == '\n') < 100, s"unbounded blank lines: ${out3.count(_ == '\n')}")
  }

  test("hex strings: odd final digit is padded with 0 (PDF 32000-1 7.3.4.3)") {
    // <48656C6C6F2> = "Hello" + 0x20 (trailing '2' reads as 0x20)
    assert(text("BT /F1 12 Tf 72 720 Td <48656C6C6F2> Tj (x) Tj ET\n").contains("Hello x")
      || PdfTextExtractor.decodeHexString("48656C6C6F2") == "Hello ")
    assert(PdfTextExtractor.decodeHexString("48656C6C6F2") == "Hello ")
    assert(PdfTextExtractor.decodeHexString("48656C6C6F") == "Hello")
    assert(PdfTextExtractor.decodeHexString("") == "")
    assert(PdfTextExtractor.decodeHexString("4") == "@") // lone digit: 0x40
  }

  test("literal-string octal escapes ignore high-order overflow (\\777 = 0xFF)") {
    val (s, _) = PdfTextExtractor.parseLiteralString("(\\777\\377\\101)", 0)
    assert(s == "\u00FF\u00FFA")
  }

  test("literal-string \\CR and \\CRLF are line continuations (\u00A77.3.4.2, round-4)") {
    // previously the generic escape case appended a raw CR mid-line
    assert(text("BT /F1 12 Tf 72 720 Td (first\\\r\nsecond) Tj ET\n") == "firstsecond\n")
    assert(text("BT /F1 12 Tf 72 720 Td (first\\\rsecond) Tj ET\n") == "firstsecond\n")
    assert(text("BT /F1 12 Tf 72 720 Td (first\\\nsecond) Tj ET\n") == "firstsecond\n")
  }

  test("FDICT zlib header cannot hang the task (round-4: needsDictionary spin)") {
    // 0x78 0x20 is a VALID zlib header (30752 % 31 == 0) with the
    // preset-dictionary bit set: the inflater reports needsDictionary(),
    // inflates 0 bytes, and needsInput() stays false \u2014 the old loop had
    // no exit for that state and the task hung forever
    val body = Array[Byte](0x78.toByte, 0x20.toByte, 1, 2, 3, 4, 5, 6, 7)
    val t0 = System.nanoTime()
    assert(PdfTextExtractor.extract(pdfObj(" /Filter /FlateDecode", body), cfg).isEmpty)
    assert((System.nanoTime() - t0) / 1e9 < 10.0, "inflate did not terminate promptly")
  }

  test("flate bomb: a tiny stream inflating past the cap is parse_error, not OOM (round-4)") {
    // ~80 MB of NULs deflate to ~80 KB \u2014 well under maxPayloadBytes, but
    // the unbounded inflate would have built a ~80 MB buffer per doc (and
    // an adversarial nesting-free 2 MB payload reaches ~2 GB)
    val bomb = deflate(" " * (80 << 20))
    assert(bomb.length < (1 << 20), s"bomb unexpectedly large: ${bomb.length}")
    assert(PdfTextExtractor.extract(pdfObj(" /Filter /FlateDecode", bomb), cfg).isEmpty)
  }
}
