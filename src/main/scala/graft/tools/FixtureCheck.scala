package graft.tools

import graft.core.Extractor
import graft.fixtures.FixtureGen

/** Dev tool: run the kernel over N fixtures and diff against the answer key.
  * Prints the first few mismatches with context. Exit code 1 on any diff. */
object FixtureCheck {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 2000L
    val seed = 42L
    var bad = 0
    var shown = 0
    var i = 0L
    val failureCounts = scala.collection.mutable.Map.empty[String, Int]
    while (i < n) {
      val f = FixtureGen.fixtureAt(seed, i)
      val got = Extractor.default.extract(f.url, f.html, f.lang)
      failureCounts(got.failure) = failureCounts.getOrElse(got.failure, 0) + 1
      val ok = got.failure == f.expected.failure && got.text == f.expected.text &&
        got.spans == f.expected.spans
      if (!ok) {
        bad += 1
        if (shown < 5) {
          shown += 1
          println(s"=== MISMATCH i=$i url=${f.url} lang=${f.lang}")
          println(s"  failure: got=${got.failure} want=${f.expected.failure}")
          if (got.text != f.expected.text) {
            val g = got.text; val w = f.expected.text
            val d = (0 until math.min(g.length, w.length)).find(k => g(k) != w(k)).getOrElse(math.min(g.length, w.length))
            println(s"  text diff at char $d (gotLen=${g.length} wantLen=${w.length})")
            println(s"  got : ...${g.slice(math.max(0, d - 60), d + 60).replace("\n", "\\n")}...")
            println(s"  want: ...${w.slice(math.max(0, d - 60), d + 60).replace("\n", "\\n")}...")
          } else if (got.spans != f.expected.spans) {
            println(s"  span diff: got=${got.spans.take(5)} want=${f.expected.spans.take(5)}")
          }
        }
      }
      i += 1
    }
    println(s"checked $n fixtures: $bad mismatches; failures=$failureCounts")
    if (bad > 0) sys.exit(1)
  }
}
