package graft.core.assemble

/** Dictionary spell repair — the P2 analog (fixspell.pl: init 19-41,
  * fixit 52-77, doit 79-103).
  *
  * Semantics carried over:
  *  - a broadcast ok-word set; words already in it pass through;
  *  - for each unknown word, an ORDERED substitution list is tried
  *    position-by-position, left-to-right, depth-first, FIRST ACCEPTING
  *    substitution wins (the reference's recursive first-match search);
  *  - corrections are memoized per corrector instance (fixspell.pl
  *    `%corrected` cache, lines 92-99) — per-partition cache in Spark;
  *  - hyphenated line-end words are re-joined before checking (fixspell.pl
  *    re-join, lines 85-90) — [[rejoinHyphenation]].
  *
  * The substitution table is config, not code; the default models common OCR/
  * mojibake confusions for latin text (the reference's table is
  * Yiddish-specific; the MECHANISM is what carries over).
  */
final class SpellRepair(
    dictionary: Set[String],
    substitutions: Seq[(String, String)] = SpellRepair.defaultSubstitutions,
    maxDepth: Int = 2) extends Serializable {

  @transient private lazy val memo = new java.util.HashMap[String, String]()

  def ok(word: String): Boolean = dictionary.contains(word.toLowerCase)

  /** Correct one word; returns it unchanged if no accepted correction. */
  def correct(word: String): String = {
    if (word.isEmpty || ok(word)) return word
    val cached = memo.get(word)
    if (cached != null) return cached
    val fixed = search(word, maxDepth).getOrElse(word)
    memo.put(word, fixed)
    fixed
  }

  /** Depth-first, ordered, first-accepting search (fixit analog). */
  private def search(word: String, depth: Int): Option[String] = {
    if (depth == 0) return None
    var i = 0
    while (i < word.length) {
      substitutions.foreach { case (from, to) =>
        if (word.startsWith(from, i)) {
          val candidate = word.substring(0, i) + to + word.substring(i + from.length)
          if (ok(candidate)) return Some(candidate)
          val deeper = search(candidate, depth - 1)
          if (deeper.isDefined) return deeper
        }
      }
      i += 1
    }
    None
  }

  /** Correct every word of a text, preserving all whitespace and leading/
    * trailing punctuation exactly. */
  def correctText(text: String): String = {
    if (text.isEmpty) return text
    val sb = new java.lang.StringBuilder(text.length)
    var i = 0
    val n = text.length
    while (i < n) {
      if (text.charAt(i).isWhitespace) { sb.append(text.charAt(i)); i += 1 }
      else {
        var j = i
        while (j < n && !text.charAt(j).isWhitespace) j += 1
        val token = text.substring(i, j)
        // strip leading/trailing punctuation, correct the core
        var a = 0
        var b = token.length
        while (a < b && !Character.isLetterOrDigit(token.charAt(a))) a += 1
        while (b > a && !Character.isLetterOrDigit(token.charAt(b - 1))) b -= 1
        if (a < b) {
          sb.append(token.substring(0, a))
          sb.append(correct(token.substring(a, b)))
          sb.append(token.substring(b))
        } else sb.append(token)
        i = j
      }
    }
    sb.toString
  }
}

object SpellRepair {
  /** Default confusion table — ordered (order is part of the contract). */
  val defaultSubstitutions: Seq[(String, String)] = Seq(
    "rn" -> "m", "m" -> "rn", "l" -> "I", "I" -> "l", "0" -> "o",
    "o" -> "0", "1" -> "l", "vv" -> "w", "cl" -> "d")

  /** Re-join words hyphenated at line end (fixspell.pl:85-90): `xxx-\nyyy`
    * → `xxxyyy\n` when the joined word is in the dictionary, else kept. */
  def rejoinHyphenation(text: String, dictionary: Set[String]): String = {
    if (!text.contains("-\n")) return text
    val p = java.util.regex.Pattern.compile("(\\S+)-\\n(\\S+)")
    val m = p.matcher(text)
    val sb = new java.lang.StringBuilder
    var last = 0
    while (m.find()) {
      sb.append(text, last, m.start)
      val joined = m.group(1) + m.group(2)
      if (dictionary.contains(joined.toLowerCase))
        sb.append(joined).append('\n')
      else
        sb.append(m.group(0))
      last = m.end
    }
    sb.append(text, last, text.length)
    sb.toString
  }
}
