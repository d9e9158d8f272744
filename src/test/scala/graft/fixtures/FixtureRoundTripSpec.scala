package graft.fixtures

import graft.core.Extractor
import org.scalatest.funsuite.AnyFunSuite

/** The t2-tier correctness gate (FIXTURES.md §4): kernel output must be
  * byte-identical to the generation-time answer key across the full page
  * mix — HTML, PDF, RTL, boiler-only, garbage, empty. */
class FixtureRoundTripSpec extends AnyFunSuite {

  test("5000 fixtures: text, spans and failure byte-identical to answer key") {
    var i = 0L
    val failures = scala.collection.mutable.Map.empty[String, Int]
    while (i < 5000) {
      val f = FixtureGen.fixtureAt(42L, i)
      val got = Extractor.default.extract(f.url, f.html, f.lang)
      assert(got.failure == f.expected.failure, s"failure mismatch at i=$i ${f.url}")
      assert(got.text == f.expected.text, s"text mismatch at i=$i ${f.url}")
      assert(got.spans == f.expected.spans, s"spans mismatch at i=$i ${f.url}")
      failures(got.failure) = failures.getOrElse(got.failure, 0) + 1
      i += 1
    }
    // the mix covers every taxonomy class the generator emits
    assert(failures.keySet == Set("ok", "empty", "unsupported_payload"))
    assert(failures("ok") > 4000)
  }

  test("byte identity holds for a different seed (not seed-42-specific)") {
    var i = 0L
    while (i < 1500) {
      val f = FixtureGen.fixtureAt(20260816L, i)
      val got = Extractor.default.extract(f.url, f.html, f.lang)
      assert(got.failure == f.expected.failure && got.text == f.expected.text,
        s"mismatch at seed=20260816 i=$i ${f.url}")
      i += 1
    }
  }

  test("fixtureAt is deterministic and index-independent (distributed generation safe)") {
    val a = FixtureGen.fixtureAt(42L, 123L)
    val b = FixtureGen.fixtureAt(42L, 123L)
    assert(a.url == b.url && a.expected == b.expected)
    assert(java.util.Arrays.equals(a.html, b.html))
    // different seed → different corpus
    assert(FixtureGen.fixtureAt(43L, 123L).url != a.url ||
      !java.util.Arrays.equals(FixtureGen.fixtureAt(43L, 123L).html, a.html))
  }

  test("hot host carries ~30% of documents (skew fixture, FIXTURES.md §1)") {
    val n = 3000
    val hot = (0 until n).count(i => FixtureGen.fixtureAt(42L, i).url.contains("hot.example.com"))
    assert(hot > n * 0.25 && hot < n * 0.35, s"hot=$hot")
  }

  test("span invariants hold on every fixture (property check)") {
    var i = 0L
    while (i < 1000) {
      val e = FixtureGen.fixtureAt(42L, i).expected
      var prevEnd = -1
      e.spans.foreach { s =>
        assert(s.begin >= 0 && s.begin < s.end && s.end <= e.text.length, s"bounds at i=$i")
        assert(s.begin > prevEnd, s"overlap/order at i=$i")
        prevEnd = s.end
      }
      i += 1
    }
  }
}
