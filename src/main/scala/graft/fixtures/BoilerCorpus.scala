package graft.fixtures

/** Deterministic corpus for the line-level dedup surface (x32, the
  * CCNet/RefinedWeb-class operator): each doc interleaves lines from a
  * SHARED boilerplate pool (every pool line is used by ~1/4 of all docs,
  * so at any sensible threshold it is frequency-detectable) with content
  * lines salted by (doc, line) index (globally unique by construction).
  * The expected cleaned text = the content lines in order —
  * generation-time truth: membership is KNOWN as the doc is composed,
  * never computed by running the frequency counter.
  */
object BoilerCorpus {

  private val pool: IndexedSeq[String] = IndexedSeq(
    "Subscribe to our newsletter for weekly updates",
    "All rights reserved worldwide",
    "Click here to accept cookies and continue",
    "Follow us on social media for more",
    "Sign in to your account to comment",
    "Related articles you might enjoy",
    "This site uses tracking technologies",
    "Back to top of the page",
    "Terms of service and privacy policy apply",
    "Download our mobile application today",
    "Advertisement continues below this line",
    "Share this story with your friends")

  private val words = Array("the", "report", "covers", "new", "results",
    "from", "field", "measurements", "and", "shows", "clear", "trends",
    "across", "several", "regions", "during", "recent", "years")

  /** One doc by index: (raw text, expected cleaned text,
    * total lines, boilerplate lines). */
  def docAt(seed: Long, i: Long): (String, String, Int, Int) = {
    val rng = FixtureGen.rngFor(seed, i)
    val nLines = 4 + rng.nextInt(6)
    val raw = new scala.collection.mutable.ArrayBuffer[String]()
    val clean = new scala.collection.mutable.ArrayBuffer[String]()
    var nBoiler = 0
    var j = 0
    while (j < nLines) {
      if (rng.nextInt(3) == 0) {
        raw += pool(rng.nextInt(pool.length))
        nBoiler += 1
      } else {
        val n = 5 + rng.nextInt(8)
        val sb = new java.lang.StringBuilder
        var w = 0
        while (w < n) {
          if (w > 0) sb.append(' ')
          sb.append(words(rng.nextInt(words.length)))
          w += 1
        }
        // the salt makes this line GLOBALLY unique — it can never reach
        // any frequency threshold
        sb.append(" token").append(i).append('-').append(j)
        val line = sb.toString
        raw += line
        clean += line
      }
      j += 1
    }
    (raw.mkString("\n"), clean.mkString("\n"), nLines, nBoiler)
  }
}
