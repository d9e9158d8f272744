package graft.tools

import graft.core.{Extractor, ExtractorConfig}
import graft.core.html.{BlockSegmenter, HtmlTokenizer}
import graft.fixtures.FixtureGen

/** Dev tool: single-thread kernel stage breakdown over N fixtures. */
object KernelProfile {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 20000
    val fx = (0 until n).map(i => FixtureGen.fixtureAt(42L, i.toLong)).toArray
    val html = fx.filter(f => Extractor.looksLikeHtml(f.html))
    val decoded = html.map(f => Extractor.decode(f.html))
    val cfg = ExtractorConfig.default
    val ex = new Extractor(cfg)

    def timed(label: String, docs: Int, reps: Int = 3)(body: => Long): Unit = {
      body // warm
      var best = Long.MaxValue
      var out = 0L
      (0 until reps).foreach { _ =>
        val t0 = System.nanoTime()
        out = body
        best = math.min(best, System.nanoTime() - t0)
      }
      val perDoc = if (docs == 0) 0.0 else best / 1e3 / docs
      println(f"$label%-22s ${best / 1e6}%8.1f ms  ($perDoc%6.1f us/doc)  [$out]")
    }

    println(s"fixtures=$n htmlDocs=${html.length} avgBytes=${if (html.isEmpty) 0 else html.map(_.html.length).sum / html.length}")
    timed("decode", html.length) {
      var acc = 0L; html.foreach(f => acc += Extractor.decode(f.html).length); acc
    }
    timed("tokenize-only", html.length) {
      var acc = 0L
      decoded.foreach { d =>
        HtmlTokenizer.scan(d, cfg.maxTokens, new HtmlTokenizer.TokenSink {
          override def startTag(name: String, id: String, cls: String, sc: Boolean): Unit = { acc += 1 }
          override def endTag(name: String): Unit = { acc += 1 }
          override def text(h: String, s: Int, e: Int): Unit = { acc += e - s }
        })
      }
      acc
    }
    timed("tokenize+segment", html.length) {
      var acc = 0L
      decoded.foreach(d => acc += BlockSegmenter.segmentDirect(d, cfg.fissionMinLinkRun, cfg.fissionMinTextWords, cfg.maxTokens).length)
      acc
    }
    timed("full kernel", html.length) {
      var acc = 0L; html.foreach(f => acc += ex.extract(f.url, f.html, f.lang).n_chars); acc
    }
    val pdfs = fx.filter(f => Extractor.isPdf(f.html))
    println(s"pdfDocs=${pdfs.length}")
    timed("pdf kernel", pdfs.length) {
      var acc = 0L; pdfs.foreach(f => acc += ex.extract(f.url, f.html, f.lang).n_chars); acc
    }
  }
}
