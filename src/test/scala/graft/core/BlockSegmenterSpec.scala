package graft.core

import graft.core.html.{BlockSegmenter, HtmlTokenizer}
import org.scalatest.funsuite.AnyFunSuite

class BlockSegmenterSpec extends AnyFunSuite {
  private def seg(html: String) = BlockSegmenter.segment(HtmlTokenizer.tokenize(html))

  test("block-level tags split; inline tags do not (G9 inline-run merge analog)") {
    val b = seg("<p>one <b>two</b> three</p><p>four</p>")
    assert(b.map(_.text.trim) == Vector("one two three", "four"))
    assert(b.head.words == 3)
  }

  test("double <br> splits a block; single <br> does not (G4 fallback split analog)") {
    val b = seg("<div>alpha beta<br>gamma<br><br>delta</div>")
    assert(b.length == 2)
    assert(b(0).words == 3) // alpha beta gamma
    assert(b(1).text == "delta")
  }

  test("<title/> raw text never becomes a content block (round-4)") {
    // the tokenizer ignores the trailing '/' on raw-text elements and
    // consumes to </title>; the start token must not claim self-closing or
    // the segmenter skips the element push and the SEO title leaks into
    // content
    val b = seg("<html><title/>Ten Garden Tips For Summer | ExampleSite</title>" +
      "<body><p>real content paragraph with enough words to keep around</p></body>")
    assert(!b.exists(_.text.contains("Garden")), b.map(_.text).mkString("|"))
    assert(b.exists(_.text.contains("real content")))
  }

  test("stray unmatched end tag is ignored, not a block flush (round-4)") {
    // browsers drop a never-opened close tag in tree construction; the old
    // flush split an 11-word paragraph into two sub-minimum fragments
    val b = seg("<body><p>five words of lead in</div> then six more words finish the thought</p></body>")
    assert(b.exists(t => t.text.contains("lead in") && t.text.contains("finish the thought")),
      b.map(_.text).mkString("|"))
    // a MATCHED close still splits normally
    val b2 = seg("<body><div><p>first block here now</p></div><p>second block words</p></body>")
    assert(b2.length == 2)
  }

  test("link words counted per word, spanning pieces (F1 link-density feature)") {
    val b = seg("""<p>plain <a href="/x">linked words</a> tail</p>""")
    assert(b.head.words == 4)
    assert(b.head.linkWords == 2)
    assert(b.head.linkDensity == 0.5)
  }

  test("boilerplate containers taint nested blocks: tags and id/class") {
    val b = seg("<nav><p>menu item</p></nav><div id=\"comments\"><p>a comment here</p></div>" +
      "<div class=\"article\"><p>real content text</p></div>")
    assert(b.map(_.inBoilerContainer) == Vector(true, true, false))
  }

  test("headings and list items flagged") {
    val b = seg("<h2>Title Here</h2><ul><li>item one text</li></ul>")
    assert(b(0).isHeading && !b(0).isLi)
    assert(b(1).isLi && !b(1).isHeading)
  }

  test("script/style/title content never reaches blocks") {
    val b = seg("<head><title>T</title><style>p{}</style></head><body><p>x y</p></body>")
    assert(b.map(_.text.trim) == Vector("x y"))
  }

  test("entities decoded inside block text") {
    val b = seg("<p>fish &amp; chips &eacute;</p>")
    assert(b.head.text == "fish & chips é")
  }

  test("unclosed tags recover; whitespace-only text ignored") {
    val b = seg("<div><p>first para\n  <p>second para</div>   \n ")
    assert(b.map(_.text.trim) == Vector("first para", "second para"))
  }

  test("fission: embedded nav run splits out of a mixed block (G12 analog)") {
    val html = "<div>This paragraph has enough genuine words to stand on its own here " +
      """<a href="/a">Home</a> <a href="/b">About</a> <a href="/c">Contact</a> <a href="/d">Archive</a> """ +
      "and the prose continues after the embedded menu for several more words.</div>"
    val b = seg(html)
    assert(b.length == 3, b.map(_.text))
    assert(b(0).linkWords == 0 && b(0).words >= 10)
    assert(b(1).linkWords == b(1).words && b(1).words == 4) // the menu run
    assert(b(2).linkWords == 0 && b(2).words >= 10)
    assert(b(1).text == "Home About Contact Archive")
  }

  test("fission does not fire on short link runs or all-link blocks") {
    val short = seg("<p>words before <a href=x>two words</a> and plenty of text after that one here</p>")
    assert(short.length == 1)
    val allLink = seg("""<p><a href=x>Only linked words in here the whole block is one anchor text</a></p>""")
    assert(allLink.length == 1 && allLink.head.linkWords == allLink.head.words)
    val off = BlockSegmenter.segment(
      graft.core.html.HtmlTokenizer.tokenize("<p>text text text text text text text text text text " +
        "<a href=x>a b c d e</a> more more more more more more more more more more</p>"),
      fissionMinLinkRun = 0)
    assert(off.length == 1) // disabled by config
  }

  test("tagPath records open block ancestry") {
    val b = seg("<body><div><ul><li>x y z</li></ul></div></body>")
    assert(b.head.tagPath == "body/div/ul/li")
    assert(b.head.depth == 4)
  }

  test("omitted </head> (valid HTML5) implicitly closes: body text survives") {
    // round-3 review: without the implicit close, the head's skip state
    // swallowed the entire body of a conforming page
    val b = seg("<html><head><title>t</title><meta charset=utf-8>" +
      "<body><p>ten words of real article content go right here now</p></body></html>")
    assert(b.nonEmpty, "body was swallowed by the unclosed <head>")
    assert(b.head.text.contains("real article content"))
    assert(b.head.words == 10)
    // head CONTENT (title/style/script) must still not leak out
    val b2 = seg("<html><head><title>skip me</title><style>.x{}</style>" +
      "<div><p>six words of body text here</p></div>")
    assert(b2.exists(_.text.contains("six words")))
    assert(!b2.exists(_.text.contains("skip me")))
    // a properly closed head behaves as before
    val b3 = seg("<html><head><title>t</title></head><body><p>words in the body here</p></body>")
    assert(b3.exists(_.text.contains("words in the body")))
  }
}
