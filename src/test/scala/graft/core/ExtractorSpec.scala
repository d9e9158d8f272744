package graft.core

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8

/** Golden end-to-end kernel tests with byte-pinned expected output —
  * the reference's `output.uyid` re-run-and-diff discipline (SURVEY §5.1). */
class ExtractorSpec extends AnyFunSuite {
  private def ex(html: String, lang: String = "en") =
    Extractor.default.extract("https://t.example/x", html.getBytes(UTF_8), lang)

  test("golden: chrome stripped, content kept — exact bytes") {
    val html =
      """<!doctype html><html><head><title>T</title></head><body>
        |<nav><ul><li><a href="/">Home</a></li><li><a href="/a">About</a></li></ul></nav>
        |<div class="post">
        |<h1>The Article Title</h1>
        |<p>This is the first paragraph of the article body with enough words to pass the content threshold easily.</p>
        |<p>Second paragraph follows with more meaningful prose so that it also counts as body text here.</p>
        |</div>
        |<footer><p><a href="/p">Privacy</a> <a href="/t">Terms</a></p></footer>
        |</body></html>""".stripMargin
    val r = ex(html)
    assert(r.failure == "ok")
    assert(r.text ==
      "The Article Title\n\n" +
      "This is the first paragraph of the article body with enough words to pass the content threshold easily.\n\n" +
      "Second paragraph follows with more meaningful prose so that it also counts as body text here.\n")
    assert(r.spans.map(_.kind) == Vector("heading", "content", "content"))
    assert(r.spans.head == Span(0, 17, "heading"))
    assert(r.n_blocks == 3 && r.n_chars == r.text.length)
  }

  test("golden: messy whitespace and entities normalize to pinned bytes") {
    val html = "<body><p>fish &amp;\n\n   chips &eacute;   with\tsalt and vinegar on the side today</p></body>"
    val r = ex(html)
    assert(r.text == "fish & chips é with salt and vinegar on the side today\n")
  }

  test("golden: RTL hebrew page gets visual reordering") {
    val heb = "שלום עולם ספר דבר ילד עיר בית מים אור דרך"
    val r = ex(s"<body><p>$heb</p></body>", lang = "he")
    assert(r.failure == "ok")
    val expected = graft.core.assemble.TextAssembler.bidiVisual(heb, rtlBase = true) + "\n"
    assert(r.text == expected)
    assert(r.text != heb + "\n") // reordering actually happened
  }

  test("taxonomy: empty payload") {
    val r = Extractor.default.extract("u", Array.emptyByteArray, "en")
    assert(r.failure == "empty" && r.text == "" && r.spans.isEmpty)
  }

  test("taxonomy: null payload") {
    assert(Extractor.default.extract("u", null, "en").failure == "empty")
  }

  test("taxonomy: binary garbage → unsupported_payload") {
    val junk = Array.tabulate[Byte](100)(i => if (i == 3) 0 else (i * 7).toByte)
    assert(Extractor.default.extract("u", junk, "en").failure == "unsupported_payload")
  }

  test("taxonomy: oversize payload") {
    val cfg = ExtractorConfig.default.copy(maxPayloadBytes = 10)
    val r = new Extractor(cfg).extract("u", "<p>0123456789abc</p>".getBytes(UTF_8), "en")
    assert(r.failure == "oversize")
  }

  test("taxonomy: boilerplate-only page → empty") {
    val r = ex("<body><nav><a href=/>Home</a></nav><footer>c</footer></body>")
    assert(r.failure == "empty" && r.text == "")
  }

  test("taxonomy: PDF with no text → parse_error") {
    val r = Extractor.default.extract("u", "%PDF-1.4\nnothing here".getBytes(UTF_8), "en")
    assert(r.failure == "parse_error")
  }

  test("PDF branch runs the post/spell pipeline like the HTML branch (round-4)") {
    // the reference pipe these passes port (fixutf8 | fixspell) is the
    // OCR/print-document pipeline — a repairing profile must repair PDF
    // output too, not just HTML
    val cfg = ExtractorConfig.default.copy(spellRepair = true, dictionary = Set("modern"))
    val pdf = ("%PDF-1.4\n1 0 obj << /Length 41 >> stream\n" +
      "BT /F1 12 Tf 72 720 Td (rnodern) Tj ET\nendstream endobj\n")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val r = new Extractor(cfg).extract("u", pdf, "en")
    assert(r.failure == "ok" && r.text == "modern\n", s"got '${r.text}'")
    // spans survive the rewrite
    assert(r.spans.nonEmpty && r.spans.head.begin == 0)
  }

  test("PDF payload routed to PDF branch") {
    val pdf = ("%PDF-1.4\n1 0 obj << /Length 44 >> stream\n" +
      "BT /F1 12 Tf 72 720 Td (Hello from pdf) Tj ET\nendstream endobj\n")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val r = Extractor.default.extract("u", pdf, "en")
    assert(r.failure == "ok" && r.text == "Hello from pdf\n")
    assert(r.spans == Vector(Span(0, 14, "line")))
  }

  test("charset: latin-1 meta sniff decodes high bytes") {
    val html = "<html><head><meta charset=\"iso-8859-1\"></head><body><p>" +
      "café naive words fill the paragraph up to ten or more tokens</p></body>"
    val bytes = html.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val r = Extractor.default.extract("u", bytes, "en")
    assert(r.text.startsWith("café"))
  }

  test("BOM stripped, UTF-8 decoded") {
    val body = "<body><p>plain utf8 paragraph with sufficient words to be kept as content</p></body>"
    val bytes = Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++ body.getBytes(UTF_8)
    assert(Extractor.default.extract("u", bytes, "en").failure == "ok")
  }

  test("determinism: same input → same bytes (speculation/retry safety)") {
    val html = "<body><p>deterministic output is required for spark task retries to be safe always</p></body>"
    val a = ex(html); val b = ex(html)
    assert(a == b)
  }

  test("spell repair integrated: span-preserving correction when enabled") {
    val cfg = ExtractorConfig.default.copy(
      spellRepair = true,
      dictionary = Set("modern", "world", "this", "paragraph", "contains",
        "enough", "ordinary", "words", "to", "be", "kept", "as", "content", "easily"))
    val html = "<body><p>This paragraph contains enough ordinary words to be " +
      "kept as content easily w0rld rnodern</p></body>"
    val r = new Extractor(cfg).extract("u", html.getBytes(UTF_8), "en")
    assert(r.failure == "ok")
    assert(r.text.contains("world") && r.text.contains("modern"))
    assert(!r.text.contains("w0rld") && !r.text.contains("rnodern"))
    assert(graft.core.Spans.invariantsHold(r.spans.toVector, r.text.length))
    // off by default: same page without the profile keeps the raw tokens
    val off = Extractor.default.extract("u", html.getBytes(UTF_8), "en")
    assert(off.text.contains("w0rld"))
  }

  test("per-corpus profiles select different thresholds (config over code)") {
    val html = "<body><p>short six word forum post here</p></body>" // 6 words
    val strict = new Extractor(ExtractorConfig.profile("news"))
      .extract("u", html.getBytes(UTF_8), "en")
    val forum = new Extractor(ExtractorConfig.profile("forum"))
      .extract("u", html.getBytes(UTF_8), "en")
    assert(strict.failure == "empty")   // 6 < 12 minimum words
    assert(forum.failure == "ok")       // 6 >= 5
    assert(ExtractorConfig.profile("nonexistent") == ExtractorConfig.default)
  }

  test("pathological page bounded by maxTokens, does not hang") {
    val html = "<body>" + ("<p>word one two three four five six seven eight nine ten</p>" * 20000)
    val cfg = ExtractorConfig.default.copy(maxTokens = 1000)
    val r = new Extractor(cfg).extract("u", html.getBytes(UTF_8), "en")
    assert(r.failure == "ok") // truncated but extracted
  }
}
