package graft.core

import graft.core.assemble.TextAssembler
import org.scalatest.funsuite.AnyFunSuite

class TextAssemblerSpec extends AnyFunSuite {
  import TextAssembler._

  test("normalizeChars: soft hyphen, zero-width, ligatures, NBSP — byte-pinned (P1 analog)") {
    assert(normalizeChars("co­op") == "coop")
    assert(normalizeChars("a​b‌c‍d﻿e") == "abcde")
    assert(normalizeChars("ﬁsh ﬂy oﬀ suﬃx waﬄe") == "fish fly off suffix waffle")
    assert(normalizeChars("a b c d") == "a b c d")
    assert(normalizeChars("") == "")
  }

  test("collapseWhitespace: runs to single space, trims both ends") {
    assert(collapseWhitespace("  a \n\t b  ") == "a b")
    assert(collapseWhitespace("\n\n") == "")
    assert(collapseWhitespace("x") == "x")
  }

  test("normalizer idempotence (property the reference regexes keep)") {
    val inputs = Seq("  a   ﬁb­  c  ", "plain text", "")
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

  test("assemble: empty input → empty text, no trailing newline") {
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
    val heb = "שלום" // shalom
    assert(bidiVisual(heb, rtlBase = true) == heb.reverse)
  }

  test("bidiVisual: mixed RTL with LTR embedding keeps LTR run order") {
    val heb = "שלום"
    val mixed = s"$heb abc $heb"
    val vis = bidiVisual(mixed, rtlBase = true)
    // base RTL: visual order is last-logical-first; 'abc' stays forward
    assert(vis == heb.reverse + " abc " + heb.reverse)
    assert(vis.contains("abc"))
  }

  test("bidiVisual deterministic (retry/speculation safety)") {
    val s = "של 123 abc ום"
    assert(bidiVisual(s, rtlBase = true) == bidiVisual(s, rtlBase = true))
  }
}
