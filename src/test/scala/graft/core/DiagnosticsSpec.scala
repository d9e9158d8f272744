package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Per-block classifier diagnostics (S9 `-T` parity, reference
  * main/kd.c:225-235): the feature tuple + decision per candidate block.
  */
class DiagnosticsSpec extends AnyFunSuite {

  private val ex = new Extractor()

  test("hand-written page: features, labels, and drop reasons per candidate block") {
    val html =
      ("<html><body>" +
        "<nav><ul><li><a href='/a'>Home</a></li><li><a href='/b'>About</a></li></ul></nav>" +
        "<div class='article'>" +
        "<h2>A Fine Heading Here</h2>" +
        "<p>one two three four five six seven eight nine ten eleven twelve</p>" +
        "<p>short little bridge text</p>" +
        "<p>alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu</p>" +
        "</div>" +
        "<footer><p>copyright words and more chrome text that is long enough</p></footer>" +
        "</body></html>").getBytes("UTF-8")
    val d = ex.diagnostics("https://x.test/d", html, "en")
    // document order, one row per candidate block
    assert(d.map(_.label) == Seq(
      "dropped", "dropped", // the two nav list items
      "heading",
      "content", "content", "content", // para, fused bridge, para
      "dropped")) // footer paragraph (boiler container)
    val heading = d(2)
    assert(heading.words == 4 && heading.link_words == 0)
    assert(heading.tag_path.endsWith("h2"), heading.tag_path)
    val bridge = d(4)
    assert(bridge.words == 4 && bridge.kept) // fusion absorbed it
    val navItem = d(0)
    assert(!navItem.kept && navItem.link_words == navItem.words) // all-link chrome
    assert(navItem.tag_path.contains("nav"))
    // depth grows with nesting: nav li deeper than the top-level div's p
    assert(d(0).depth >= d(3).depth)
    // block ids are the candidate ordinals
    assert(d.map(_.block_id) == d.indices.toSeq)
  }

  test("non-HTML payloads yield no diagnostic rows") {
    assert(ex.diagnostics("u", Array.emptyByteArray, "en").isEmpty)
    assert(ex.diagnostics("u", "%PDF-1.4\nx".getBytes("ISO-8859-1"), "en").isEmpty)
    val junk = Array.fill[Byte](64)(0)
    assert(ex.diagnostics("u", junk, "en").isEmpty)
  }

  test("fixture parity: kept diagnostics align with generation-time expected blocks") {
    // the oracle contract behind x22: for every HTML fixture, the kept
    // blocks' (label, words, linkWords) equal FixtureGen's truth records,
    // in order
    var checked = 0
    (0L until 2000L).foreach { i =>
      val f = graft.fixtures.FixtureGen.fixtureAt(42L, i)
      val kept = ex.diagnostics(f.url, f.html, f.lang).filter(_.kept)
      val exp = f.expected.blocks
      assert(kept.length == exp.length,
        s"fixture $i (${f.url}): ${kept.length} kept vs ${exp.length} expected")
      kept.zip(exp).zipWithIndex.foreach { case ((got, want), j) =>
        assert(got.label == want.label && got.words == want.words &&
          got.link_words == want.linkWords,
          s"fixture $i block $j: got (${got.label},${got.words},${got.link_words}) " +
            s"want (${want.label},${want.words},${want.linkWords})")
      }
      if (exp.nonEmpty) checked += 1
    }
    assert(checked > 1000) // the corpus mix is ~76% content HTML
  }
}
