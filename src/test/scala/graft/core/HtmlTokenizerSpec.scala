package graft.core

import graft.core.html.HtmlTokenizer
import graft.core.html.HtmlTokenizer._
import org.scalatest.funsuite.AnyFunSuite

class HtmlTokenizerSpec extends AnyFunSuite {

  test("basic tags and text") {
    val t = tokenize("<p>hello <b>world</b></p>")
    assert(t == Vector(
      StartTag("p", Map.empty, false), Text("hello "),
      StartTag("b", Map.empty, false), Text("world"),
      EndTag("b"), EndTag("p")))
  }

  test("attributes: only id/class materialized (quoted, single-quoted, unquoted)") {
    val Seq(StartTag(n, attrs, sc)) =
      tokenize("""<a href="/x" class='y z' id=plain disabled>""").toSeq
    assert(n == "a" && !sc)
    // contract: id/class kept (the only attrs consumed downstream), others
    // scanned past without allocation
    assert(attrs == Map("class" -> "y z", "id" -> "plain"))
  }

  test("attribute values with '>' inside quotes do not end the tag") {
    val t = tokenize("""<div class="a>b">x</div>""")
    assert(t.head == StartTag("div", Map("class" -> "a>b"), false))
    assert(t(1) == Text("x"))
  }

  test("self-closing and void tags") {
    val t = tokenize("<br/><img src=x><hr />")
    assert(t.collect { case StartTag(n, _, _) => n } == Vector("br", "img", "hr"))
  }

  test("comments, doctype, CDATA, PI are skipped") {
    val t = tokenize("<!doctype html><!-- <p>no</p> --><![CDATA[zap]]><?xml v?>yes")
    assert(t == Vector(Text("yes")))
  }

  test("abrupt comment close: <!--> and <!---> are complete empty comments (round-4)") {
    // WHATWG 'abrupt-closing-of-empty-comment': with no later --> the old
    // scanner (which searched from lt+4) swallowed the document tail
    assert(tokenize("a<!-->rest") == Vector(Text("a"), Text("rest")))
    assert(tokenize("a<!--->rest") == Vector(Text("a"), Text("rest")))
    // a normal empty comment and a dash-bearing body still scan correctly
    assert(tokenize("a<!---->rest") == Vector(Text("a"), Text("rest")))
    assert(tokenize("a<!-- -- -->rest") == Vector(Text("a"), Text("rest")))
  }

  test("C1 numeric charrefs map through windows-1252 (WHATWG 13.2.5.80, round-4)") {
    // legacy-CMS curly quotes/apostrophes/ellipses — previously emitted as
    // invisible C1 control characters
    assert(decodeEntities("&#147;quoted&#148; it&#146;s&#133;") ==
      "“quoted” it’s…")
    assert(decodeEntities("&#x93;x&#x94; &#x80;") == "“x” €")
    assert(decodeEntities("&#150;&#151;") == "–—") // en/em dash
    // refs the WHATWG table leaves unmapped keep their value
    assert(decodeEntities("&#129;") == "")
    // the real C1 code points via charset decode are untouched (this
    // mapping is for NUMERIC REFERENCES only)
    assert(decodeEntities("") == "")
  }

  test("script/style raw text is consumed, not emitted") {
    val t = tokenize("<script>if (a < b) { x = '<p>'; }</script><style>a>b{}</style>ok")
    assert(t.collect { case Text(s) => s } == Vector("ok"))
    assert(t.collect { case StartTag(n, _, _) => n } == Vector("script", "style"))
  }

  test("title text is kept (for potential metadata) but marked by tags") {
    val t = tokenize("<title>My Page</title>")
    assert(t == Vector(StartTag("title", Map.empty, false), Text("My Page"), EndTag("title")))
  }

  test("case-insensitive tag names") {
    val t = tokenize("<P>x</P><DiV>y</dIv>")
    assert(t.collect { case StartTag(n, _, _) => n } == Vector("p", "div"))
    assert(t.collect { case EndTag(n) => n } == Vector("p", "div"))
  }

  test("entity decoding: named, decimal, hex, unknown passthrough") {
    assert(decodeEntities("a &amp; b") == "a & b")
    assert(decodeEntities("&lt;tag&gt;") == "<tag>")
    assert(decodeEntities("&#65;&#x42;") == "AB")
    assert(decodeEntities("&nbsp;") == " ")
    assert(decodeEntities("&bogus; &") == "&bogus; &")
    assert(decodeEntities("&eacute;") == "é")
  }

  test("malformed: stray < is text, unterminated tag, digits-only not a tag") {
    val t1 = tokenize("a < b")
    assert(t1.collect { case Text(s) => s }.mkString == "a < b")
    val t2 = tokenize("<p>x<")
    assert(t2.collect { case Text(s) => s }.mkString.startsWith("x"))
    val t3 = tokenize("<123>z")
    assert(t3.collect { case Text(s) => s }.mkString.contains("z"))
  }

  test("unterminated raw-text element does not loop or throw") {
    val t = tokenize("<script>var x = 1;")
    assert(t.head == StartTag("script", Map.empty, false))
  }

  test("maxTokens bounds work on pathological input") {
    val html = "<p>x</p>" * 10000
    val t = tokenize(html, maxTokens = 50)
    assert(t.length <= 50)
  }

  test("numeric refs: surrogate code points map to U+FFFD (HTML5), never lone surrogates") {
    import graft.core.html.HtmlTokenizer.decodeEntities
    assert(decodeEntities("a&#55296;b") == "a\uFFFDb")   // U+D800 decimal
    assert(decodeEntities("a&#xD800;b") == "a\uFFFDb")
    assert(decodeEntities("a&#xDFFF;b") == "a\uFFFDb")
    // above U+10FFFF and NUL also map to U+FFFD (WHATWG 13.2.5.80; ADVICE r2
    // — these previously fell through as literal text)
    assert(decodeEntities("a&#x110000;b") == "a�b")
    assert(decodeEntities("a&#0;b") == "a�b")
    assert(decodeEntities("a&#x0;b") == "a�b")
    // HTML5 ignores the "/" on non-void elements: <script/> still opens
    // script data — its source must never leak into the text stream
    // (round-3 review)
    val toks = graft.core.html.HtmlTokenizer.tokenize(
      "<div><script/>var nav = {x: 1 < 2};</script><p>article words</p></div>")
    assert(!toks.exists {
      case graft.core.html.HtmlTokenizer.Text(t) => t.contains("var nav")
      case _ => false
    }, s"script source leaked: $toks")
    // non-numeric garbage after &# is still literal passthrough — including
    // a leading minus, which Integer.parseInt would have accepted (round-3
    // review: &#-1; must NOT become U+FFFD, it is not a charref)
    assert(decodeEntities("a&#zz;b") == "a&#zz;b")
    assert(decodeEntities("a&#-1;b") == "a&#-1;b")
    assert(decodeEntities("a&#x-1;b") == "a&#x-1;b")
    // Int-overflowing numeric values are syntactically charrefs => U+FFFD
    // (previously a parse exception fell through as literal text)
    assert(decodeEntities("a&#x110000000;b") == "a�b")
    assert(decodeEntities("a&#4294967296;b") == "a�b")
    // astral-plane refs still decode to proper surrogate PAIRS
    assert(decodeEntities("a&#x1F600;b") == "a\uD83D\uDE00b")
  }

}
