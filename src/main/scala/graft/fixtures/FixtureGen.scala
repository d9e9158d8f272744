package graft.fixtures

import graft.core.{Span, Failure}
import graft.core.assemble.TextAssembler
import scala.util.Random
import scala.collection.mutable.ArrayBuffer

/** Deterministic synthetic web-page corpus generator + answer key.
  *
  * The analog of the reference's seeded text generator (main/makeLorem.pl)
  * fused with its `.template` answer-key discipline (main/template.c:32-109):
  * every generated page carries its expected extraction (text, spans,
  * failure) computed from the generator's source-of-truth block list — NOT
  * by running the extractor — so golden tests are a real oracle for
  * segmentation + classification. Only the assembly spec (TextAssembler,
  * which owns the byte contract) is shared between generator and engine.
  *
  * Fully index-addressable: `fixtureAt(seed, i)` derives everything from
  * (seed, i) via java.util.Random's specified LCG — no wall clock, no
  * global state — so a Spark job can generate the corpus distributed via
  * `spark.range(n).map(i => fixtureAt(seed, i))` with zero driver memory.
  *
  * Page mix: ~72% content HTML, ~8% boiler-only HTML (expected `empty`),
  * ~10% PDF, ~4% RTL HTML, ~3% garbage (`unsupported_payload`), ~3% empty
  * payloads (`empty`). One hot host carries ~30% of documents to exercise
  * salting/skew (FIXTURES.md §1).
  */
object FixtureGen {

  /** Generation-time truth for one KEPT block: its label, whitespace word
    * count, and how many of those words the generator wrapped in an <a>
    * (the classifier-feature answer key for the S9 `-T` diagnostics
    * surface, reference main/kd.c:225-235). */
  final case class ExpectedBlock(label: String, words: Int, linkWords: Int)

  final case class Expected(text: String, spans: Vector[Span], failure: String,
      blocks: Vector[ExpectedBlock] = Vector.empty)
  final case class Fixture(
      url: String,
      warc_ts: java.sql.Timestamp,
      html: Array[Byte],
      text: String,
      lang: String,
      expected: Expected)

  private val words: IndexedSeq[String] = Vector(
    "the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog", "and",
    "every", "morning", "light", "breaks", "across", "river", "valley",
    "people", "gather", "market", "stories", "travel", "faster", "than",
    "wind", "carries", "news", "from", "distant", "harbors", "while",
    "children", "learn", "letters", "merchants", "count", "coins", "under",
    "paper", "lanterns", "history", "remembers", "quiet", "hands", "that",
    "built", "bridges", "stone", "water", "archive", "records", "each",
    "season", "harvest", "winter", "summer", "library", "holds", "maps",
    "voyage", "captain", "signal", "garden", "museum", "window")

  private val fancyWords: IndexedSeq[String] = Vector(
    "café", "naïve", "coöperate", "résumé", "A&B", "x<y", "œuvre", "piñata")

  private val hebrewWords: IndexedSeq[String] = Vector(
    "שלום", "עולם",
    "ספר", "דבר", "ילד",
    "עיר", "בית", "מים",
    "אור", "דרך", "זמן",
    "לילה")

  private val navWords: IndexedSeq[String] = Vector(
    "Home", "About", "Contact", "Products", "Blog", "Archive", "Login",
    "Search", "Privacy", "Terms", "Sitemap", "Help")

  /** Index-addressable splitmix64-style seeding — THE shared mixer for
    * every deterministic generator (FixspellCorpus and MediaGen delegate
    * here; round-4 review found a third inline copy that had silently
    * dropped one mixing round). */
  private[graft] def rngFor(seed: Long, i: Long): Random = {
    var z = seed + i * 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    new Random(z ^ (z >>> 31))
  }

  private def pick(rng: Random, xs: IndexedSeq[String]): String = xs(rng.nextInt(xs.length))

  private def htmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** A sentence of `n` truth words; returns (truthText, messyHtml).
    * `linkWords` of them (from a random position) are wrapped in one <a>. */
  private def sentence(rng: Random, n: Int, linkWords: Int, wordlist: IndexedSeq[String]): (String, String) = {
    val ws = new ArrayBuffer[String](n)
    var k = 0
    while (k < n) {
      val w =
        if (wordlist.eq(words) && rng.nextInt(20) == 0) pick(rng, fancyWords)
        else pick(rng, wordlist)
      ws += (if (k == 0 && w.head.isLetter && w.head.isLower) w.head.toUpper + w.tail else w)
      k += 1
    }
    ws(n - 1) = ws(n - 1) + "."
    val truth = ws.mkString(" ")
    // messy emission: random whitespace, inline tags, entity forms
    val sb = new java.lang.StringBuilder
    val linkStart = if (linkWords > 0 && n > linkWords + 1) 1 + rng.nextInt(n - linkWords - 1) else -1
    k = 0
    while (k < n) {
      if (k > 0) sb.append(rng.nextInt(4) match {
        case 0 => " "
        case 1 => "  "
        case 2 => "\n"
        case _ => "\n  "
      })
      if (k == linkStart) sb.append("<a href=\"/l").append(rng.nextInt(100)).append("\">")
      val escaped = htmlEscape(ws(k))
      rng.nextInt(8) match {
        case 0 => sb.append("<b>").append(escaped).append("</b>")
        case 1 => sb.append("<em>").append(escaped).append("</em>")
        case _ => sb.append(escaped)
      }
      if (linkStart >= 0 && k == linkStart + linkWords - 1) sb.append("</a>")
      k += 1
    }
    (truth, sb.toString)
  }

  private def navList(rng: Random, n: Int): String = {
    val sb = new java.lang.StringBuilder("<ul>")
    var k = 0
    while (k < n) {
      sb.append("<li><a href=\"/p").append(rng.nextInt(50)).append("\">")
        .append(pick(rng, navWords)).append("</a></li>")
      k += 1
    }
    sb.append("</ul>").toString
  }

  private def host(rng: Random): String =
    if (rng.nextDouble() < 0.30) "hot.example.com"
    else s"site${rng.nextInt(400)}.example.org"

  def fixtureAt(seed: Long, i: Long): Fixture = {
    val rng = rngFor(seed, i)
    val h = host(rng)
    val url = s"https://$h/page/$i"
    val ts = new java.sql.Timestamp(1600000000000L + i * 1000L) // index-derived
    val kind = rng.nextInt(100)
    if (kind < 72) htmlFixture(rng, url, ts, rtl = false)
    else if (kind < 80) boilerOnlyFixture(rng, url, ts)
    else if (kind < 90) pdfFixture(rng, url, ts)
    else if (kind < 94) htmlFixture(rng, url, ts, rtl = true)
    else if (kind < 97) {
      val junk = new Array[Byte](64 + rng.nextInt(256))
      rng.nextBytes(junk)
      junk(0) = 0 // guarantee the NUL sniff rejects it
      Fixture(url, ts, junk, null, "en", Expected("", Vector.empty, Failure.Unsupported))
    } else
      Fixture(url, ts, Array.emptyByteArray, null, "en", Expected("", Vector.empty, Failure.Empty))
  }

  /** Content HTML page: header/nav chrome + content div (heading, paragraphs,
    * optional short fused block, optional list) + sidebar/comments/footer. */
  private def htmlFixture(rng: Random, url: String, ts: java.sql.Timestamp, rtl: Boolean): Fixture = {
    val lang = if (rtl) "he" else (if (rng.nextInt(10) == 0) "de" else "en")
    val wl = if (rtl) hebrewWords else words
    val truth = new ArrayBuffer[(String, String)] // (normalized+bidi text, kind)
    val truthBlocks = new ArrayBuffer[ExpectedBlock]
    val body = new java.lang.StringBuilder

    def addTruth(raw: String, kind: String, linkWords: Int = 0): Unit = {
      val norm = TextAssembler.normalizeBlock(raw)
      val vis = if (rtl) TextAssembler.bidiVisual(norm, rtlBase = true) else norm
      if (vis.nonEmpty) {
        truth += ((vis, kind))
        // word count is invariant under normalization and BiDi reordering,
        // so the generator's count IS the classifier's feature value
        truthBlocks += ExpectedBlock(kind, vis.split(" ").length, linkWords)
      }
    }

    body.append("<header id=\"masthead\"><h1><a href=\"/\">Site ")
      .append(rng.nextInt(1000)).append("</a></h1></header>")
    body.append("<nav class=\"main-nav\">").append(navList(rng, 3 + rng.nextInt(5))).append("</nav>")

    body.append("<div class=\"article-body\">")
    // heading
    if (rng.nextInt(10) < 8) {
      val (ht, hh) = sentence(rng, 3 + rng.nextInt(4), 0, wl)
      val tag = "h" + (1 + rng.nextInt(3))
      body.append("<").append(tag).append(">").append(hh).append("</").append(tag).append(">")
      addTruth(ht, "heading")
    }
    // paragraphs with optional short fused blocks strictly between them
    val nParas = 1 + rng.nextInt(5)
    var p = 0
    while (p < nParas) {
      val nw = 15 + rng.nextInt(46)
      val links0 = if (rng.nextInt(3) == 0) 1 + rng.nextInt(2) else 0
      // record only links sentence() will actually EMIT (it skips the <a>
      // when n <= linkWords + 1) — the x22 truth must never claim link
      // words the HTML does not contain (round-4 review; unreachable at
      // today's nw >= 15, but nothing enforced the invariant)
      val links = if (links0 > 0 && nw > links0 + 1) links0 else 0
      val (pt, ph) = sentence(rng, nw, links, wl)
      body.append("<p>").append(ph).append("</p>")
      addTruth(pt, "content", linkWords = links)
      if (p < nParas - 1 && rng.nextInt(4) == 0) {
        val (st, sh) = sentence(rng, 3 + rng.nextInt(5), 0, wl) // 3..7 words, no links → fusion
        body.append("<p>").append(sh).append("</p>")
        addTruth(st, "content")
      }
      p += 1
    }
    // content list
    if (rng.nextInt(3) == 0) {
      body.append("<ul>")
      var li = 0
      val nLi = 2 + rng.nextInt(3)
      while (li < nLi) {
        val (lt, lh) = sentence(rng, 10 + rng.nextInt(8), 0, wl)
        body.append("<li>").append(lh).append("</li>")
        addTruth(lt, "list")
        li += 1
      }
      body.append("</ul>")
    }
    body.append("</div>")

    // boiler tail
    body.append("<aside class=\"sidebar\">").append(navList(rng, 2 + rng.nextInt(4))).append("</aside>")
    if (rng.nextInt(2) == 0) {
      body.append("<div id=\"comments\">")
      var c = 0
      val nC = 1 + rng.nextInt(3)
      while (c < nC) {
        body.append("<p>").append(sentence(rng, 8 + rng.nextInt(20), 0, words)._2).append("</p>")
        c += 1
      }
      body.append("</div>")
    }
    body.append("<footer><p>").append(navList(rng, 2 + rng.nextInt(3))).append("</p></footer>")

    val doc = "<!doctype html><html><head><title>Fixture</title>" +
      "<meta charset=\"utf-8\"><script>var x = 1 < 2;</script>" +
      "<style>.a { color: red; }</style></head><body>" + body + "</body></html>"
    val (text, spans) = TextAssembler.assemble(truth.toVector)
    val failure = if (text.isEmpty) Failure.Empty else Failure.Ok
    val expectedBlocks = truthBlocks.toVector
    // serialization variant (tail draw — perturbs no content RNG): ~1/6 of
    // encodable non-RTL pages ship as declared windows-1252, putting the
    // cp1252 decode path on the corpus-wide byte-identity gate. Truth is
    // unchanged: decode(encode(doc)) is the identity for encodable docs.
    val cp1252 = java.nio.charset.Charset.forName("windows-1252")
    val bytes =
      if (rng.nextInt(6) == 0 && !rtl && cp1252.newEncoder().canEncode(doc))
        doc.replace("charset=\"utf-8\"", "charset=\"windows-1252\"").getBytes(cp1252)
      else doc.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    Fixture(url, ts, bytes, null, lang, Expected(text, spans, failure, expectedBlocks))
  }

  /** HTML page with ONLY chrome — expected `empty`. */
  private def boilerOnlyFixture(rng: Random, url: String, ts: java.sql.Timestamp): Fixture = {
    val body = new java.lang.StringBuilder
    body.append("<nav>").append(navList(rng, 4 + rng.nextInt(6))).append("</nav>")
    body.append("<div class=\"widget\"><p>").append(sentence(rng, 12, 0, words)._2).append("</p></div>")
    body.append("<footer>").append(navList(rng, 3)).append("</footer>")
    val doc = "<!doctype html><html><body>" + body + "</body></html>"
    Fixture(url, ts, doc.getBytes(java.nio.charset.StandardCharsets.UTF_8), null, "en",
      Expected("", Vector.empty, Failure.Empty))
  }

  /** Minimal PDF with known layout; expected text derived independently via
    * the T1/T2/T3 arithmetic (the generator plants gaps strictly between
    * rule boundaries so float rounding cannot flip a branch).
    *
    * Serialization variants (drawn AFTER all content draws, so enabling
    * them perturbs no content RNG): ~1/3 of PDFs get FlateDecode-compressed
    * content streams, ~1/5 get a /Rotate page rotation with coordinates
    * emitted in content space — both decode back to the identical truth. */
  private def pdfFixture(rng: Random, url: String, ts: java.sql.Timestamp): Fixture = {
    val fontSize = 12.0
    val charW = 6.0
    val lineH = 14.4
    val x0 = 72.0
    val nPages = 1 + rng.nextInt(2)
    val sbText = new java.lang.StringBuilder
    val spans = Vector.newBuilder[Span]
    // per page: (x, y, rawText) runs in DISPLAY coordinates
    val pageRuns = new ArrayBuffer[ArrayBuffer[(Double, Double, String)]](nPages)

    var firstLine = true
    var pg = 0
    while (pg < nPages) {
      val cs = new ArrayBuffer[(Double, Double, String)](16)
      if (rng.nextInt(5) == 0) {
        // TWO-COLUMN page (G2 coverage): left col at x=72, right at x=312 —
        // gutter >= 36pt guaranteed (left lines are <= 3 short words).
        // Expected reading order: whole left column, then right column,
        // single '\n' at the column boundary.
        var side = 0
        while (side < 2) {
          val x0 = if (side == 0) 72.0 else 312.0
          var y = 720.0
          val nL = 2 + rng.nextInt(2)
          var ln = 0
          while (ln < nL) {
            var blanks = 0
            if (ln > 0) {
              val g = if (rng.nextInt(3) == 0) 1 else 0
              y -= (lineH * (g + 1) + 7.0)
              blanks = g
            }
            val nw = 2 + rng.nextInt(2)
            val t = (0 until nw).map(_ => pick(rng, words)).mkString(" ")
            cs += ((x0, y, t))
            if (!firstLine) {
              sbText.append('\n')
              if (ln > 0) { var k = 0; while (k < blanks) { sbText.append('\n'); k += 1 } }
            }
            val begin = sbText.length
            sbText.append(t)
            spans += Span(begin, sbText.length, "line")
            firstLine = false
            ln += 1
          }
          side += 1
        }
        pageRuns += cs
        pg += 1
      } else {
      var y = 720.0
      val nLines = 2 + rng.nextInt(5)
      var ln = 0
      var prevWasLine = false
      while (ln < nLines) {
        // paragraph gap before this line?
        // the FULL gap from the previous line is decided here: g blank lines
        // → drop y by (g+1) lineHeights plus a 7pt guard so float rounding
        // never lands exactly on a rule boundary
        var blanks = 0
        if (prevWasLine) {
          val g = rng.nextInt(6) match {
            case 5 => 5 // exercise the T3 halving rule
            case 4 => 2
            case 3 => 1
            case _ => 0
          }
          y -= (lineH * (g + 1) + 7.0) // strictly inside (g+1, g+2) multiples
          blanks = if (g > 2) g / 2 + 1 else g
        }
        // first line of each PAGE pins that page's column minX = x0 so T2
        // column-relative indents are well-defined
        val indent = if (ln > 0 && rng.nextInt(4) == 0) 1 + rng.nextInt(4) else 0
        val nRuns = 1 + rng.nextInt(3)
        val runTexts = new ArrayBuffer[String](nRuns)
        var r = 0
        while (r < nRuns) {
          val nw = 2 + rng.nextInt(4)
          val t = (0 until nw).map(k => pick(rng, words)).mkString(" ")
          runTexts += (if (rng.nextInt(10) == 0) t + " (ok)" else t)
          r += 1
        }
        // emit runs with known x positions
        var x = x0 + indent * charW
        val lineText = new java.lang.StringBuilder
        lineText.append(" " * indent)
        r = 0
        while (r < nRuns) {
          val t = runTexts(r)
          if (r > 0) {
            val m = 1 + rng.nextInt(3) // m expected spaces
            x += (m + 1) * charW
            lineText.append(" " * m)
          }
          cs += ((x, y, t))
          lineText.append(t)
          x += t.length * charW
          r += 1
        }
        // expected assembly
        if (!firstLine) {
          sbText.append('\n')
          if (prevWasLine) { var k = 0; while (k < blanks) { sbText.append('\n'); k += 1 } }
        }
        val begin = sbText.length
        sbText.append(lineText)
        spans += Span(begin, sbText.length, "line")
        firstLine = false
        prevWasLine = true
        ln += 1
      }
      pageRuns += cs
      pg += 1
      prevWasLine = false // page boundary resets paragraph arithmetic
      }
    }
    sbText.append('\n')

    // serialization variants — tail draws only (see Scaladoc)
    val compress = rng.nextInt(3) == 0
    val rotation = if (rng.nextInt(5) == 0) (1 + rng.nextInt(3)) * 90 else 0

    // locale-pinned float formatting (ADVICE r1: the f-interpolator is
    // locale-sensitive — a comma-decimal JVM would emit "72,0" and silently
    // break the byte-identity oracle)
    def fmt1(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.1f", Double.box(v))

    val pdf = new java.lang.StringBuilder("%PDF-1.4\n")
    pdf.append("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    var oid = 3
    pageRuns.foreach { runs =>
      val cs = new java.lang.StringBuilder
      runs.foreach { case (x, y, t) =>
        // content coords = inverse of the extractor's display rotation
        // (90: display=(y,−x); 180: (−x,−y); 270: (−y,x))
        val (cx, cy) = rotation match {
          case 90 => (-y, x)
          case 180 => (-x, -y)
          case 270 => (y, -x)
          case _ => (x, y)
        }
        val escaped = t.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
        cs.append("BT /F1 12 Tf ").append(fmt1(cx)).append(' ').append(fmt1(cy))
          .append(" Td (").append(escaped).append(") Tj ET\n")
      }
      val body =
        if (compress) {
          val in = cs.toString.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
          val d = new java.util.zip.Deflater()
          d.setInput(in); d.finish()
          val out = new java.io.ByteArrayOutputStream(in.length)
          val buf = new Array[Byte](8192)
          while (!d.finished()) out.write(buf, 0, d.deflate(buf))
          d.end()
          new String(out.toByteArray, java.nio.charset.StandardCharsets.ISO_8859_1)
        } else cs.toString
      val filter = if (compress) " /Filter /FlateDecode" else ""
      val rot = if (rotation != 0) s" /Rotate $rotation" else ""
      pdf.append(s"$oid 0 obj << /Length ${body.length}$filter$rot >> stream\n")
      pdf.append(body)
      pdf.append("\nendstream endobj\n")
      oid += 1
    }
    pdf.append("trailer << /Root 1 0 R >>\n%%EOF\n")
    Fixture(url, ts, pdf.toString.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1),
      null, "en", Expected(sbText.toString, spans.result(), Failure.Ok))
  }
}
