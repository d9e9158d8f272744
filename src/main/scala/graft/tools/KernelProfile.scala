package graft.tools

import graft.core._
import graft.core.html.{BlockSegmenter, HtmlTokenizer}
import graft.fixtures.FixtureGen

/** Dev tool: per-stage kernel cost on pregenerated HTML payloads
  * (decode / tokenize / segment / classify / assemble), single thread. */
object KernelProfile {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 20000
    val cfg = ExtractorConfig.default
    // pregenerate HTML-only payloads
    val payloads = (0L until 200000L).iterator
      .map(i => FixtureGen.fixtureAt(42, i))
      .filter(f => f.html.length > 0 && !Extractor.isPdf(f.html) && Extractor.looksLikeHtml(f.html))
      .take(n).map(f => (f.html, f.lang)).toArray
    println(s"payloads: ${payloads.length}, avg bytes: ${payloads.map(_._1.length).sum / payloads.length}")

    def time[A](label: String, reps: Int)(body: => A): A = {
      var out: A = body // warm
      val t0 = System.nanoTime()
      var r = 0
      while (r < reps) { out = body; r += 1 }
      val secs = (System.nanoTime() - t0) / 1e9 / reps
      println(f"$label%-12s ${payloads.length / secs}%9.0f docs/s  (${secs * 1e9 / payloads.length}%7.0f ns/doc)")
      out
    }

    val decoded = time("decode", 3) { payloads.map(p => Extractor.decode(p._1)) }
    val tokens = time("tokenize", 3) { decoded.map(d => HtmlTokenizer.tokenize(d, cfg.maxTokens)) }
    val blocks = time("segment", 3) { tokens.map(t => BlockSegmenter.segment(t, cfg.fissionMinLinkRun, cfg.fissionMinTextWords)) }
    time("tok+seg-direct", 3) { decoded.map(d => BlockSegmenter.segmentDirect(d, cfg.fissionMinLinkRun, cfg.fissionMinTextWords, cfg.maxTokens)) }
    val kept = time("classify", 3) { blocks.map(b => classify.HeuristicClassifier.classify(b, cfg)) }
    time("assemble", 3) { kept.zip(payloads).map { case (k, (_, lang)) => assemble.TextAssembler.assembleBlocks(k, cfg, lang) } }
    time("end-to-end", 3) { payloads.map(p => Extractor.default.extract("u", p._1, p._2)) }
  }
}
