package graft.core

import graft.core.assemble.TextAssembler
import graft.functions.{Dedup, TextAnalysis}
import org.scalacheck.{Gen, Prop, Properties}
import java.nio.charset.StandardCharsets.UTF_8

/** ScalaCheck property suite (SURVEY §5.2: span invariants, idempotence,
  * determinism under arbitrary inputs — sbt's test framework runs
  * Properties natively). */
object KernelProperties extends Properties("graft.kernel") {

  private val anyBytes: Gen[Array[Byte]] =
    Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))

  private val htmlish: Gen[String] = for {
    n <- Gen.choose(0, 40)
    parts <- Gen.listOfN(n, Gen.oneOf(
      "<p>", "</p>", "<div class=\"x\">", "</div>", "<a href=z>", "</a>",
      "word", "two words", "&amp;", "&#65;", " ", "\n", "<br>", "<nav>",
      "</nav>", "<script>x</script>", "text with several words here"))
  } yield parts.mkString

  property("extract never throws and taxonomy is always valid") =
    Prop.forAll(anyBytes) { bytes =>
      val r = Extractor.default.extract("u", bytes, "en")
      Failure.all.contains(r.failure) && r.n_chars == r.text.length
    }

  property("span invariants hold for any html-ish input") =
    Prop.forAll(htmlish) { s =>
      val r = Extractor.default.extract("u", s.getBytes(UTF_8), "en")
      Spans.invariantsHold(r.spans.toVector, r.text.length)
    }

  property("extraction is deterministic") =
    Prop.forAll(htmlish) { s =>
      val b = s.getBytes(UTF_8)
      Extractor.default.extract("u", b, "he") == Extractor.default.extract("u", b, "he")
    }

  property("normalizeBlock idempotent") =
    Prop.forAll(Gen.asciiPrintableStr) { s =>
      val once = TextAssembler.normalizeBlock(s)
      TextAssembler.normalizeBlock(once) == once
    }

  property("jaccard is symmetric and bounded") =
    Prop.forAll(Gen.alphaNumStr, Gen.alphaNumStr) { (a, b) =>
      val j = Dedup.jaccardKernel(a, b, 3)
      j >= 0.0 && j <= 1.0 && j == Dedup.jaccardKernel(b, a, 3)
    }

  property("jaccard(x, x) == 1 for non-trivial x") =
    Prop.forAll(Gen.alphaNumStr.suchThat(_.length >= 3)) { a =>
      Dedup.jaccardKernel(a, a, 3) == 1.0
    }

  property("simhash of equal strings is equal; hamming bounded by 64") =
    Prop.forAll(Gen.alphaNumStr, Gen.alphaNumStr) { (a, b) =>
      val ha = Dedup.simhashKernel(a)
      val hb = Dedup.simhashKernel(b)
      ha == Dedup.simhashKernel(a) && Dedup.hammingKernel(ha, hb) <= 64
    }

  property("langId total: always a known code") =
    Prop.forAll(Gen.asciiPrintableStr) { s =>
      val l = TextAnalysis.langIdKernel(s)
      Set("en", "de", "fr", "es", "it", "zh", "he", "ar", "ru", "und").contains(l)
    }
}
