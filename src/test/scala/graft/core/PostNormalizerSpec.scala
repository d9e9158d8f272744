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

  test("hy-latin: Western-Armenian transcription table (armenian.transcribe.pl:20-75)") {
    // \u0570\u0561\u0575 "hay": digraph \u0561\u0575 -> \u0251j (once), then \u0570 -> h
    assert(PostNormalizer.apply("\u0570\u0561\u0575", "hy-latin") == "h\u0251j")
    // \u0564\u0578\u0582 "du": digraph \u0578\u0582 -> u (once), then \u0564 -> t\u02B0
    assert(PostNormalizer.apply("\u0564\u0578\u0582", "hy-latin") == "t\u02B0u")
    // \u0578\u057D\u056F\u056B "voski": word-initial \u0578 -> vo, letters -> s g i
    assert(PostNormalizer.apply("\u0578\u057D\u056F\u056B", "hy-latin") == "vosgi")
    // Armenian punctuation: question/exclamation/apostrophe marks
    assert(PostNormalizer.apply("\u055E", "hy-latin") == "?")
    assert(PostNormalizer.apply("\u055C", "hy-latin") == "!")
    assert(PostNormalizer.apply("\u055A", "hy-latin") == "'")
    // unrecognized-glyph box becomes a space, as in hy
    assert(PostNormalizer.apply("a\u25AFb", "hy-latin") == "a b")
  }

  test("hy-latin: digraph rules fire once per segment (Perl s/// without /g)") {
    // "\u0578\u0582 \u0578\u0582" (ou ou): the \u0578\u0582->u digraph fires ONCE (first word);
    // the second word then hits \b\u0578 -> vo (also once, and the first word's
    // \u0578 is already consumed), and the leftover \u0582 maps globally to v \u2014
    // exactly the Perl cascade: s/\x{578}\x{582}/u/; s/\b\x{578}/vo/;
    // s/\x{582}/v/g  ==> "u vov".
    assert(PostNormalizer.apply("\u0578\u0582 \u0578\u0582", "hy-latin") == "u vov")
    // dead-alternative fidelity: in rule 7 (\u0575\u0561|\u056b\u0561|\u0565\u0561|\u0565\u0561\u0575) the 3-char \u0565\u0561\u0575
    // can never match \u2014 Perl/Java alternation is leftmost-first and its
    // 2-char prefix \u0565\u0561 precedes it; the reference has the identical order
    // (armenian.transcribe.pl:26). With the once-only \u0561\u0575 rule already
    // consumed by the first word, "\u057f\u0565\u0561\u0575" resolves via \u0565\u0561 + leftover \u0575:
    assert(PostNormalizer.apply("\u0561\u0575 \u057f\u0565\u0561\u0575", "hy-latin") == "\u0251j dj\u0251j")
  }

  test("yi-sholem: the reference's fixSholem table verbatim (fixSholem.pl:15-23)") {
    def f(s: String) = PostNormalizer.apply(s, "yi-sholem")
    // hyphen battery: -- -> horizontal bar, lone - -> Hebrew maqaf
    assert(f("a--b-c") == "a\u2015b\u05BEc")
    // internal final mem -> samekh; word-final mem untouched
    assert(f("\u05D0\u05DD\u05D0") == "\u05D0\u05E1\u05D0")
    assert(f("\u05D0\u05DD") == "\u05D0\u05DD")
    // blotch-only lines removed (multiline anchor)
    assert(f("x\n\u25AE \u25AE\u25AE\ny") == "x\n\ny")
    // Perl tr/()/)(/ is a SIMULTANEOUS swap
    assert(f("(\u05D0)") == ")\u05D0(")
    // quote shaping: ,,X -> lower quote; X.'' -> closing quote
    assert(f(",,\u05D0") == "\u201E\u05D0")
    assert(f("\u05D0.''") == "\u05D0.\u201C")
  }

  test("differential gold: rule-set ports reproduce the reference Perl scripts byte-for-byte") {
    // every `gold` string below is the LITERAL output of running the
    // actual reference script (perl 5, utf8) on the input line —
    // raismann.post.pl, fixSholem.pl, armenian.transcribe.pl
    // raismann.post.pl
    Seq(
      ("schwarz", "shvarts"),
      ("mujik", "muzhik"),
      ("sitzen will ich", "zitzn vil ikh"),
      ("viel und verdriessen", "fil und ferdrizn"),
      ("scheen ui nsch", "sheyn oy ntsh"),
      ("jim jogen", "yim yogn")
    ).foreach { case (in, gold) =>
      assert(PostNormalizer.apply(in, "yi-yivo") == gold, s"yi-yivo: $in")
    }
    // fixSholem.pl
    Seq(
      ("a--b-c und x---y", "a\u2015b\u05BEc und x\u2015y"),
      ("\u05E9\u05DC\u05D5\u05DD (\u05E2\u05D5\u05DC\u05DD) \u05DB\u0430\u05DD", "\u05E9\u05DC\u05D5\u05DD )\u05E2\u05D5\u05DC\u05DD( \u05DB\u0430\u05DD"),
      (",,\u05E6\u05D9\u05D8\u05D0\u05D8'' \u05D0\u05D5\u05DF \u05E0\u05D0\u05DA", "\u201E\u05E6\u05D9\u05D8\u05D0\u05D8\u201C \u05D0\u05D5\u05DF \u05E0\u05D0\u05DA"),
      ("\u05D0\u05DD\u05D0 \u05D0\u05DD", "\u05D0\u05E1\u05D0 \u05D0\u05DD")
    ).foreach { case (in, gold) =>
      assert(PostNormalizer.apply(in, "yi-sholem") == gold, s"yi-sholem: $in")
    }
    // armenian.transcribe.pl
    Seq(
      ("\u0570\u0561\u0575 \u0564\u0578\u0582 \u0578\u057D\u056F\u056B", "h\u0251j t\u02B0u vosgi"),
      ("\u0561\u0575 \u057F\u0565\u0561\u0575 \u0562\u0561\u0580\u0565\u0582", "\u0251j dj\u0251j p\u0251\u027E\u025Bv"),
      ("\u0565\u0580\u0565\u056D\u0561 \u0578\u0575\u0580", "j\u025B\u027E\u025B\u03C7\u0251 voj\u027E")
    ).foreach { case (in, gold) =>
      assert(PostNormalizer.apply(in, "hy-latin") == gold, s"hy-latin: $in")
    }
  }

  test("differential gold: hy-latin multi-line segment applies once-per-LINE rules per line") {
    // ADVICE r2: Perl s/// without /g fires once per <STDIN> line; a
    // multi-line segment must not under-apply. Gold is the literal output
    // of the actual armenian.transcribe.pl on these two lines — note the
    // second line's digraph rules fire again (a per-segment replaceFirst
    // would have spent them on line one).
    val in = "\u0576\u0578\u0582 \u0578\u0579 \u0565\u0578\n\u0578\u0582\u0582 \u0561\u0578 \u0565\u0565"
    val gold = "nu vot\u0283\u02B0 j\u025Bo\nuv \u0251o j\u025B\u025B"
    assert(PostNormalizer.apply(in, "hy-latin") == gold)
  }

  test("differential gold: yi-utf8 reproduces fixutf8.pl byte-for-byte") {
    // gold strings are the literal output of the reference fixutf8.pl
    Seq(
      ("\u05D5\u05D5\u05D0\u05E1 \u05D0\u05D9\u05D6 \u05D3\u05D0\u05E1", "\u05F0\u05D0\u05E1 \u05D0\u05D9\u05D6 \u05D3\u05D0\u05E1"),
      ("\u05E4\u05D0\u05E8 \u05D3\u05D9 \u05D5\u05D9\u05E0\u05D8", "\u05E4\u05BF\u05D0\u05E8 \u05D3\u05D9 \u05F1\u05E0\u05D8"),
      ("\u05E9\u05C2 \u05DB\u05BC \u05D5\u05BC \u05D0\u05B8 \u05D0\u05B7 \u05EA\u05BC \u05E4\u05BF \u05E4\u05BC", "\u05E9\u05C2 \u05DB\u05BC \u05D5\u05BC \u05D0\u05B8 \u05D0\u05B7 \u05EA\u05BC \u05E4\u05BF \u05E4\u05BC"),
      ("\u05D0 \u05D9\u05D9 \u05D2\u05D5\u05D8 ?", "\u05D0 \u05F2 \u05D2\u05D5\u05D8?"),
      ("\u05E4\u05BC\u05D0\u05E4\u05D9\u05E8 \u05D0\u05D5\u05DF \u05E4\u05BF\u05DC\u05D0\u05DD", "\u05E4\u05BC\u05D0\u05E4\u05BF\u05D9\u05E8 \u05D0\u05D5\u05DF \u05E4\u05BF\u05DC\u05D0\u05DD")
    ).foreach { case (in, gold) =>
      assert(PostNormalizer.apply(in, "yi-utf8") == gold, s"yi-utf8: $in")
    }
  }

  test("differential gold: yi-yivo Unicode edges (decomposed grave, umlaut word chars) match Perl") {
    // Perl's utf8 \w and the decomposed e+U+0300 alternative of
    // raismann.post.pl:36 — gold strings are the literal Perl output
    Seq(
      ("je\u0300 zikh", "ye tzikh"),
      ("gr\u00FC,ne w\u00E4lder", "gr\u00FC'ne v\u00E4lder"),
      ("j\u00E8 viel", "ye fil")
    ).foreach { case (in, gold) =>
      assert(PostNormalizer.apply(in, "yi-yivo") == gold, s"yi-yivo: $in")
    }
  }
}
