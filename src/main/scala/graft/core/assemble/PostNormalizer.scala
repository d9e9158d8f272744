package graft.core.assemble

import graft.core.Span

/** Language-keyed post-processing passes — the P3-P5 analog (fixSholem.pl,
  * armenian.post.pl, geez.post.pl, raismann.post.pl): per-corpus cleanup is
  * CONFIG (ordered rule lists selected by `lang`), not code. Rules run after
  * assembly, on the final text, preserving the span structure: every rule
  * here is length-preserving or operates between spans, and
  * [[applyWithSpans]] re-derives offsets when lengths change.
  */
object PostNormalizer {

  /** One ordered substitution pass: regex → replacement. */
  final case class Rule(pattern: String, replacement: String) {
    @transient lazy val compiled: java.util.regex.Pattern =
      java.util.regex.Pattern.compile(pattern)
  }

  /** Per-language rule registries (the analog of per-book Makefile post
    * stages, main/Makefile:684-701). Order matters — P1 discipline. */
  val registry: Map[String, Seq[Rule]] = Map(
    // double-hyphen → horizontal bar; lone hyphen between letters →
    // hyphen-minus normalization (fixSholem.pl analog rules, generalized)
    "yi" -> Seq(
      Rule("--", "―"),
      Rule("(?<=\\p{L})-(?=\\p{L})", "־")),
    // Armenian: replace the unrecognized-glyph box with a space
    // (armenian.post.pl:▯→space)
    "hy" -> Seq(Rule("▯", " ")),
    // Geez: pad word separators (geez.post.pl: ፡/። spacing)
    "gez" -> Seq(
      Rule("\\s*፡\\s*", " ፡ "),
      Rule("\\s*።\\s*", " ። ")),
    // generic typographic cleanup available to any latin corpus
    "latin-cleanup" -> Seq(
      Rule("\\u2018|\\u2019", "'"),
      Rule("\\u201C|\\u201D", "\"")))

  /** Apply the `lang` registry (no-op for unknown langs). */
  def apply(text: String, lang: String): String =
    registry.get(lang) match {
      case None => text
      case Some(rules) => rules.foldLeft(text) { (t, r) =>
        r.compiled.matcher(t).replaceAll(
          java.util.regex.Matcher.quoteReplacement(r.replacement))
      }
    }

  /** Apply rules per span segment so offsets stay exact even when rule
    * replacements change lengths: each span's slice is rewritten
    * independently and offsets are recomputed. Text between spans (the
    * \n\n separators and trailing \n) passes through untouched. */
  def applyWithSpans(text: String, spans: Seq[Span], lang: String): (String, Vector[Span]) = {
    if (!registry.contains(lang) || spans.isEmpty) return (text, spans.toVector)
    val sb = new java.lang.StringBuilder(text.length)
    val out = Vector.newBuilder[Span]
    var cursor = 0
    spans.foreach { s =>
      sb.append(text, cursor, s.begin)
      val rewritten = apply(text.substring(s.begin, s.end), lang)
      val b = sb.length
      sb.append(rewritten)
      out += Span(b, sb.length, s.kind)
      cursor = s.end
    }
    sb.append(text, cursor, text.length)
    (sb.toString, out.result())
  }
}
