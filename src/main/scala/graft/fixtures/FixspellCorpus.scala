package graft.fixtures

import scala.util.Random

/** Deterministic corrupted-Yiddish corpus for the distributed fixspell
  * surface (x23): lines composed, by index, from a fixed table of
  * (corrupted word, expected repair) pairs. Every pair's repair outcome was
  * verified against the ACTUAL reference fixspell.pl (run in-sandbox with
  * [[okWords]] as its wordlist \u2014 the same differential run that pins
  * SpellRepairSpec's golds), so `lineAt` yields GENERATION-TIME truth: the
  * expected line is composed, never computed by running the repairer.
  */
object FixspellCorpus {

  /** (corrupted, perl-verified repair). Unchanged entries pin the negative
    * space: not-fixable words (word-final alef, unknown latin/digits) must
    * pass through byte-identically. */
  val pairs: Vector[(String, String)] = Vector(
    ("\u05D4\u05F2\u05E0\u05D8", "\u05D4\u05F2\u05B7\u05E0\u05D8"),
    ("\u05EA\u05D5\u05E8\u05D4", "\u05EA\u05BC\u05D5\u05E8\u05D4"),
    ("\u05DB\u05DC\u05DC", "\u05DB\u05BC\u05DC\u05DC"),
    ("\u05D1\u05DC\u05D5\u05DD", "\u05D1\u05BF\u05DC\u05D5\u05DD"),
    ("\u05D9\u05E2\u05E7\u05D1", "\u05D9\u05B4\u05E2\u05E7\u05D1"),
    ("\u05DE\u05E2\u05D9\u05DF", "\u05DE\u05E2\u05D9\u05B4\u05DF"),
    ("\u05DE\u05D0\u05DF", "\u05DE\u05D0\u05B7\u05DF"),
    ("\u05D9\u05D0\u05E8", "\u05D9\u05D0\u05B8\u05E8"),
    ("\u05E9\u05DE\u05D7\u05D4", "\u05E9\u05C2\u05DE\u05D7\u05D4"),
    ("\u05D1\u05D0\u05E0\u05D3", "\u05D1\u05D0\u05B7\u05E0\u05D3"),
    ("\u05D2\u05D0\u05D8", "\u05D2\u05D0\u05B8\u05D8"),
    ("\u05DE\u05D0\u05DF\u05D8\u05D0\u05D2", "\u05DE\u05D0\u05B7\u05DF\u05D8\u05D0\u05B8\u05D2"),
    ("\u05DE\u05D0\u05DE\u05D0", "\u05DE\u05D0\u05DE\u05D0"), // word-final alef: unfixable, stays broken
    ("\u05DE\u05D0\u05B7\u05E8\u05E1", "\u05DE\u05D0\u05B7\u05E8\u05E1"), // unknown but mark-blocked: unchanged
    ("xyz", "xyz"),
    ("123", "123"))

  /** The ok-word list the pairs were verified against (= SpellRepairSpec's
    * differential dictionary). */
  val okWords: Set[String] = Set(
    "\u05D4\u05F2\u05B7\u05E0\u05D8", "\u05EA\u05BC\u05D5\u05E8\u05D4", "\u05DB\u05BC\u05DC\u05DC", "\u05D1\u05BF\u05DC\u05D5\u05DD",
    "\u05D9\u05B4\u05E2\u05E7\u05D1", "\u05DE\u05E2\u05D9\u05B4\u05DF", "\u05DE\u05D0\u05B7\u05DF", "\u05D9\u05D0\u05B8\u05E8",
    "\u05E9\u05C2\u05DE\u05D7\u05D4", "\u05D1\u05D0\u05B7\u05E0\u05D3", "\u05D1\u05D0\u05B8\u05E0\u05D3", "\u05D2\u05D0\u05B8\u05D8",
    "\u05DE\u05D0\u05B7\u05DE\u05D0\u05B7", "\u05DE\u05D0\u05B7\u05DF\u05D8\u05D0\u05B8\u05D2")

  private def rngFor(seed: Long, i: Long): Random = FixtureGen.rngFor(seed, i)

  /** One corpus line by index: (corrupted text, expected repaired text). */
  def lineAt(seed: Long, i: Long): (String, String) = {
    val rng = rngFor(seed, i)
    val n = 4 + rng.nextInt(6)
    val idx = Vector.fill(n)(rng.nextInt(pairs.length))
    // occasional comma after a word: punctuation is a doit separator and
    // must pass through untouched
    val commaAt = if (rng.nextInt(3) == 0) rng.nextInt(n) else -1
    def join(f: ((String, String)) => String): String =
      idx.zipWithIndex.map { case (w, k) =>
        f(pairs(w)) + (if (k == commaAt) "," else "")
      }.mkString(" ")
    (join(_._1), join(_._2))
  }
}
