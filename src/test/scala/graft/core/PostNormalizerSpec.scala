package graft.core

import graft.core.assemble.PostNormalizer
import org.scalatest.funsuite.AnyFunSuite

class PostNormalizerSpec extends AnyFunSuite {

  test("yi rules: double hyphen and intra-word hyphen (fixSholem analog)") {
    assert(PostNormalizer.apply("a--b", "yi") == "a―b")
    assert(PostNormalizer.apply("װארט-צײכן", "yi") == "װארט־צײכן")
    assert(PostNormalizer.apply("5-6", "yi") == "5-6") // digits: untouched
  }

  test("hy rule: unrecognized-glyph box becomes space (armenian.post analog)") {
    assert(PostNormalizer.apply("ա▯բ", "hy") == "ա բ")
  }

  test("gez rules: word-separator padding (geez.post analog)") {
    assert(PostNormalizer.apply("ሀለ፡ሐመ", "gez") == "ሀለ ፡ ሐመ")
  }

  test("unknown lang is a no-op") {
    assert(PostNormalizer.apply("a--b ▯", "en") == "a--b ▯")
  }

  test("applyWithSpans: offsets recomputed exactly when lengths change") {
    val (text, spans) = graft.core.assemble.TextAssembler.assemble(
      Seq(("ա▯բ", "content"), ("x▯y▯z", "content")))
    val (out, newSpans) = PostNormalizer.applyWithSpans(text, spans, "hy")
    assert(out == "ա բ\n\nx y z\n")
    assert(newSpans == Vector(Span(0, 3, "content"), Span(5, 10, "content")))
    newSpans.foreach(s => assert(out.substring(s.begin, s.end).nonEmpty))
    assert(Spans.invariantsHold(newSpans, out.length))
  }

  test("span point lookup (glyphAtXY analog)") {
    val spans = Vector(Span(0, 5, "heading"), Span(7, 12, "content"), Span(14, 20, "list"))
    assert(Spans.at(spans, 0).contains(Span(0, 5, "heading")))
    assert(Spans.at(spans, 4).contains(Span(0, 5, "heading")))
    assert(Spans.at(spans, 5).isEmpty) // separator
    assert(Spans.at(spans, 8).contains(Span(7, 12, "content")))
    assert(Spans.at(spans, 19).contains(Span(14, 20, "list")))
    assert(Spans.at(spans, 25).isEmpty)
    assert(Spans.overlapping(spans, 4, 8).map(_.kind) == Vector("heading", "content"))
  }
}
