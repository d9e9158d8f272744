package graft.core

import graft.core.assemble.TextAssembler
import org.scalatest.funsuite.AnyFunSuite

class TextAssemblerSpec extends AnyFunSuite {
  import TextAssembler._

  test("normalizeChars: soft hyphen, zero-width, ligatures, NBSP \u2014 byte-pinned (P1 analog)") {
    assert(normalizeChars("co\u00ADop") == "coop")
    assert(normalizeChars("a\u200Bb\u200Cc\u200Dd\uFEFFe") == "abcde")
    assert(normalizeChars("\uFB01sh \uFB02y o\uFB00 su\uFB03x wa\uFB04e") == "fish fly off suffix waffle")
    assert(normalizeChars("a\u00A0b\u202Fc\u2009d") == "a b c d")
    assert(normalizeChars("") == "")
  }

  test("collapseWhitespace: runs to single space, trims both ends") {
    assert(collapseWhitespace("  a \n\t b  ") == "a b")
    assert(collapseWhitespace("\n\n") == "")
    assert(collapseWhitespace("x") == "x")
  }

  test("normalizer idempotence (property the reference regexes keep)") {
    val inputs = Seq("  a \u00A0 \uFB01b\u00AD  c  ", "plain text", "")
    inputs.foreach { s =>
      val once = normalizeBlock(s)
      assert(normalizeBlock(once) == once)
    }
  }

  test("assemble: \\n\\n joins, trailing newline, span offsets exact") {
    val (text, spans) = assemble(Seq(("Title", "heading"), ("Body text", "content")))
    assert(text == "Title\n\nBody text\n")
    assert(spans == Vector(Span(0, 5, "heading"), Span(7, 16, "content")))
    // spans slice back to their text
    spans.foreach(s => assert(text.substring(s.begin, s.end).nonEmpty))
    assert(text.substring(spans(1).begin, spans(1).end) == "Body text")
  }

  test("assemble: empty input \u2192 empty text, no trailing newline") {
    assert(assemble(Nil) == (("", Vector.empty)))
  }

  test("span invariants: ordered, non-overlapping, in-bounds") {
    val (text, spans) = assemble(Seq(("a", "content"), ("bb", "content"), ("ccc", "list")))
    var prevEnd = -1
    spans.foreach { s =>
      assert(s.begin >= 0 && s.begin < s.end && s.end <= text.length)
      assert(s.begin > prevEnd)
      prevEnd = s.end
    }
  }

  test("bidiVisual: pure LTR unchanged; RTL hebrew reversed (T4 analog)") {
    assert(bidiVisual("hello world", rtlBase = false) == "hello world")
    val heb = "\u05E9\u05DC\u05D5\u05DD" // shalom
    assert(bidiVisual(heb, rtlBase = true) == heb.reverse)
  }

  test("bidiVisual: mixed RTL with LTR embedding keeps LTR run order") {
    val heb = "\u05E9\u05DC\u05D5\u05DD"
    val mixed = s"$heb abc $heb"
    val vis = bidiVisual(mixed, rtlBase = true)
    // base RTL: visual order is last-logical-first; 'abc' stays forward
    assert(vis == heb.reverse + " abc " + heb.reverse)
    assert(vis.contains("abc"))
  }

  test("bidiVisual deterministic (retry/speculation safety)") {
    val s = "\u05E9\u05DC 123 abc \u05D5\u05DD"
    assert(bidiVisual(s, rtlBase = true) == bidiVisual(s, rtlBase = true))
  }

  test("bidiVisual: combining marks stay attached to their base in reversed runs") {
    // yod+hiriq then ayin: the naive char reverse put the hiriq BEFORE its
    // yod (round-3 review) \u2014 the cluster reverse keeps base+mark adjacent
    val marked = "\u05D9\u05B4\u05E2"
    val vis = bidiVisual(marked, rtlBase = true)
    assert(vis == "\u05E2\u05D9\u05B4", vis.map(c => f"${c.toInt}%04X").mkString(","))
    // surrogate pairs are never split (ill-formed UTF-16 would mutate
    // through UTF8String/parquet round trips)
    val astral = "\u05D0\uD83D\uDE00\u05D1" // alef, emoji, bet
    val visA = bidiVisual(astral, rtlBase = true)
    assert(!visA.zipWithIndex.exists { case (c, i) =>
      Character.isLowSurrogate(c) && (i == 0 || !Character.isHighSurrogate(visA.charAt(i - 1)))
    }, "lone surrogate produced")
    // unmarked text matches the plain reverse exactly (fixture byte contract)
    val heb = "\u05E9\u05DC\u05D5\u05DD"
    assert(bidiVisual(heb, rtlBase = true) == heb.reverse)
  }
}
