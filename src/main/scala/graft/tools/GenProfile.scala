package graft.tools

/** Dev tool: single-thread cost of the deterministic corpus generators
  * (they sit in the timed path of every generated-corpus query and of
  * the scaling children). */
object GenProfile {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 20000
    def timed(label: String, docs: Int)(body: => Long): Unit = {
      body // warm
      var best = Long.MaxValue
      (0 until 3).foreach { _ =>
        val t0 = System.nanoTime()
        val out = body
        best = math.min(best, System.nanoTime() - t0)
        if (out == Long.MinValue) println("?") // keep body live
      }
      println(f"$label%-18s ${best / 1e6}%8.1f ms  (${best / 1e3 / docs}%6.1f us/doc)")
    }
    timed("fixtureAt", n) {
      var acc = 0L
      (0 until n).foreach(i => acc += graft.fixtures.FixtureGen.fixtureAt(42L, i.toLong).html.length)
      acc
    }
    timed("boiler docAt", n) {
      var acc = 0L
      (0 until n).foreach(i => acc += graft.fixtures.BoilerCorpus.docAt(42L, i.toLong)._1.length)
      acc
    }
    timed("pii lineAt", n) {
      var acc = 0L
      (0 until n).foreach(i => acc += graft.fixtures.PiiCorpus.lineAt(42L, i.toLong)._1.length)
      acc
    }
    timed("url lineAt", n) {
      var acc = 0L
      (0 until n).foreach(i => acc += graft.fixtures.UrlCorpus.lineAt(42L, i.toLong)._1.length)
      acc
    }
    timed("fixspell lineAt", n) {
      var acc = 0L
      (0 until n).foreach(i => acc += graft.fixtures.FixspellCorpus.lineAt(42L, i.toLong)._1.length)
      acc
    }
  }
}
