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

  /** One ordered substitution pass: regex → replacement. `global = false`
    * replaces only the FIRST match per segment — the analog of a Perl
    * `s///` without `/g`, which the reference's transliterators use for
    * context-sensitive digraphs (armenian.transcribe.pl:22-30 run once per
    * line; [[applyWithSpans]] runs rules once per span segment).
    * `raw = true` passes the replacement to the regex engine unquoted so
    * it may reference capture groups ($1) — needed for reference rules of
    * the form `s/ם(\p{L})/ס$1/` (fixSholem.pl:19). */
  final case class Rule(pattern: String, replacement: String,
      global: Boolean = true, raw: Boolean = false) {
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
    // Sholem-Aleykhem OCR fixes — the reference's table VERBATIM
    // (fixSholem.pl:15-23), in file order: hyphen normalization, internal
    // final-mem -> samekh, blotch-only line removal, simultaneous paren
    // swap (Perl tr/()/)(/ via a private-use placeholder), quote shaping.
    "yi-sholem" -> Seq(
      Rule("--", "\u2015"),
      Rule("[-\u2015][-\u2015]+", "\u2015"),
      Rule("-", "\u05BE"),
      Rule("\u05DD(\\p{L})", "\u05E1$1", raw = true),
      Rule("(?m)^ *\u25AE[\u25AE ]*$", ""),
      // simultaneous paren swap needs a placeholder; pre-existing U+E000
      // (private use \u2014 no sanctioned meaning) is neutralized to U+FFFD
      // FIRST so it can never masquerade as a swapped paren (the one
      // documented deviation from tr/()/)(/, which would leave it alone)
      Rule("\uE000", "\uFFFD"),
      Rule("\\(", "\uE000"),
      Rule("\\)", "("),
      Rule("\uE000", ")"),
      Rule("[',][,'](\\p{L})", "\u201E$1", raw = true),
      Rule("(\\p{L}\\p{M}*[.!?]?)[',][,']", "$1\u201C", raw = true)),
    // Raismann YIVO romanization - the reference's germanic->YIVO table
    // VERBATIM in file order (raismann.post.pl:15-57), bracketed by the
    // whole-text lowercase pre/post transforms (preTransforms below).
    // Uppercase in replacements shields already-converted text from later
    // lowercase-only rules, exactly as in the Perl; the duplicated viel
    // rule is kept as-is.
    "yi-yivo" -> Seq(
      Rule("i\\.", "i"),
      Rule("(?U)\\bsitzen\\b", "SITSEN"),
      Rule("(?U)\\bviel\\b", "FIL"),
      Rule("(?U)\\bviel\\b", "FIL"),
      Rule("(?U)\\bverdriessen\\b", "FERDRISEN"),
      Rule("ei", "AY"),
      Rule("ee", "EY"),
      Rule("ui", "OY"),
      Rule("nsch", "NTSH"),
      Rule("sch", "SH"),
      Rule("ch", "KH"),
      Rule("ss", "S"),
      Rule("tz", "TS"),
      Rule("c(?:k?)", "K"),
      Rule("z", "TS"),
      Rule("s(t|p)", "SH$1", raw = true),
      Rule("(?U)jim\\b", "YIM"),
      Rule("(?U)\\bjo", "YO"),
      Rule("(?iU)\\bj(?:e\u0300|\u00E8)", "YE"),
      Rule("j", "ZH"),
      Rule("u", "U"),
      Rule("ie", "I"),
      Rule("eh", "EY"),
      Rule("(?i)s([aeiou])", "Z$1", raw = true),
      Rule("(?U)\\b([iU])s\\b", "$1z", raw = true),
      Rule("\u00E8", "E"),
      Rule("w", "V"),
      Rule("aa", "A"),
      Rule("mm", "M"),
      Rule("rr", "R"),
      Rule("tt", "T"),
      Rule("ll", "L"),
      Rule("ff", "F"),
      Rule("(?U)'([\\s,])", ",$1", raw = true),
      Rule("(?U),'(?=\\w)", ",,"),
      Rule("(?U),,(?!\\w)", "''"),
      Rule("(?U)(\\w),(\\w)", "$1'$2", raw = true),
      Rule("(?i)([^mnv])en", "$1n", raw = true)),
    // Yiddish UTF-8 cleanup - fixutf8.pl VERBATIM (generated from the
    // script source): ligature composition, precomposed->base+mark
    // decomposition, rofe addition, OCR space-before-punct fix. The
    // soft-hyphen rule also exists upstream in normalizeChars; kept
    // here for table fidelity (idempotent).
    "yi-utf8" -> Seq(
      Rule("\u05D5\u05D5", "\u05F0"),
      Rule("\u05D5\u05D9", "\u05F1"),
      Rule("\u05D9\u05D9", "\u05F2"),
      Rule("\u05D9\u05B4\u05D9\u05B4", "\u05F2\u05B5"),
      Rule("\u05F2\u05B4", "\u05D9\u05D9\u05B4"),
      Rule("\u05F2\u05B4", "\u05D9\u05D9\u05B4"),
      Rule("\u05F1\u05B4", "\u05D5\u05D9\u05B4"),
      Rule("\u00AD", ""),
      Rule("\uFB2B", "\u05E9\u05C2"),
      Rule("\uFB3B", "\u05DB\u05BC"),
      Rule("\uFB35", "\u05D5\u05BC"),
      Rule("\uFB2F", "\u05D0\u05B8"),
      Rule("\uFB2E", "\u05D0\u05B7"),
      Rule("\uFB4A", "\u05EA\u05BC"),
      Rule("\uFB4E", "\u05E4\u05BF"),
      Rule("\uFB44", "\u05E4\u05BC"),
      Rule("\u05E4(?![\u05BC\u05BF])", "\u05E4\u05BF"),
      Rule(" ([\\?:,\\.!])", "$1", raw = true)),
    // generic typographic cleanup available to any latin corpus
    "latin-cleanup" -> Seq(
      Rule("\\u2018|\\u2019", "'"),
      Rule("\\u201C|\\u201D", "\"")),
    // Western-Armenian → Roman/IPA transcription — the reference's full
    // table (armenian.transcribe.pl:20-75), verbatim: the unrecognized-
    // glyph box first (line 20), then the ORDERED context-sensitive
    // digraph rules (lines 22-30; Perl s/// without /g = once per line →
    // global = false, once per span segment here), then the global
    // single-letter table (lines 31-72). (?U) makes \b Unicode-aware —
    // Java's default \b is ASCII-only and would never fire on Armenian.
    "hy-latin" -> (Seq(
      Rule("\u25AF", " "),
      Rule("\u0578\u0582", "u", global = false),
      Rule("(?U)\u0578\u0575\\b", "o", global = false),
      Rule("(?U)\\b\u0565", "j\u025B", global = false),
      Rule("(?U)\\b\u0578", "vo", global = false),
      Rule("\u0561\u0575", "\u0251j", global = false),
      // NOTE: the 4th alternative (3-char) is dead \u2014 its 2-char prefix
      // appears earlier and Perl/Java alternation is leftmost-first. The
      // reference has the same ordering (armenian.transcribe.pl:26), so
      // "\u0565\u0561\u0575" yields "j\u0251" + leftover "\u0575"\u2192"j";
      // we reproduce that behavior verbatim (pinned in PostNormalizerSpec).
      Rule("\u0575\u0561|\u056B\u0561|\u0565\u0561|\u0565\u0561\u0575", "j\u0251", global = false),
      Rule("\u0565\u0575|\u0567\u0575", "\u025Bj", global = false),
      Rule("\u0578\u0582\u0575|\u0578\u0575", "uj", global = false),
      Rule("\u0575\u0578\u0582|\u056B\u0582", "ju", global = false)) ++ Seq(
      "\u0561" -> "\u0251",       // ayb
      "\u0562" -> "p",            // pen (ben)
      "\u0563" -> "k\u02B0",      // kim (gim)
      "\u0564" -> "t\u02B0",      // ta (da)
      "\u0565" -> "\u025B",       // yech (ech)
      "\u0566" -> "z",            // za
      "\u0567" -> "\u025B",       // eh
      "\u0568" -> "\u0259",       // et
      "\u0569" -> "t\u02B0",      // to
      "\u056A" -> "\u0292",       // zhe
      "\u056B" -> "i",            // ini
      "\u056C" -> "l",            // liwn
      "\u053C" -> "L",            // liwn (capital)
      "\u056D" -> "\u03C7",       // xeh
      "\u056E" -> "dz",           // dza (ca)
      "\u056F" -> "g",            // gen (ken)
      "\u0570" -> "h",            // ho
      "\u0571" -> "ts\u02B0",     // tsa (ja)
      "\u0572" -> "\u0281",       // ghad
      "\u0573" -> "d\u0292",      // cheh (je)
      "\u0574" -> "m",            // men
      "\u0575" -> "j",            // hee (yi)
      "\u0576" -> "n",            // now
      "\u0577" -> "\u0283",       // sha
      "\u0578" -> "o",            // vo
      "\u0579" -> "t\u0283\u02B0", // cha
      "\u057A" -> "b",            // bey (peh)
      "\u057B" -> "t\u0283\u02B0", // che (jheh)
      "\u057C" -> "\u027E",       // ra
      "\u057D" -> "s",            // seh
      "\u057E" -> "v",            // vew
      "\u057F" -> "d",            // diun (tiwn)
      "\u0580" -> "\u027E",       // reh
      "\u0581" -> "ts\u02B0",     // co
      "\u0582" -> "v",            // yiwn
      "\u0583" -> "p\u02B0",      // piwr
      "\u0584" -> "k\u02B0",      // keh
      "\u0585" -> "o",            // oh
      "\u0586" -> "f",            // feh
      "\u055A" -> "'",            // apostrophe
      "\u055C" -> "!",            // exclamation mark
      "\u055E" -> "?"             // question mark
    ).map { case (p, r) => Rule(p, r) }))

  /** Whole-segment transforms around a rule set — the analog of
    * raismann.post.pl's `lc <STDIN>` / `print lc $text` bracketing, which
    * a substitution list alone cannot express. */
  val preTransforms: Map[String, String => String] = Map(
    "yi-yivo" -> (_.toLowerCase(java.util.Locale.ROOT)))
  val postTransforms: Map[String, String => String] = Map(
    "yi-yivo" -> (_.toLowerCase(java.util.Locale.ROOT)))

  /** Apply the `lang` registry (no-op for unknown langs). */
  def apply(text: String, lang: String): String =
    registry.get(lang) match {
      case None => text
      case Some(rules) =>
        val pre = preTransforms.get(lang).fold(text)(_(text))
        val out = rules.foldLeft(pre) { (t, r) =>
          val rep =
            if (r.raw) r.replacement
            else java.util.regex.Matcher.quoteReplacement(r.replacement)
          if (r.global) r.compiled.matcher(t).replaceAll(rep)
          // Perl s/// without /g fires once per LINE (the reference's
          // transliterators process <STDIN> line by line) — a multi-line
          // segment must apply the rule once per line, not once per
          // segment (ADVICE r2; multi-line golden in PostNormalizerSpec)
          else if (t.indexOf('\n') < 0) r.compiled.matcher(t).replaceFirst(rep)
          else t.split("\n", -1)
            .map(l => r.compiled.matcher(l).replaceFirst(rep))
            .mkString("\n")
        }
        postTransforms.get(lang).fold(out)(_(out))
    }

  /** Apply rules per span segment so offsets stay exact even when rule
    * replacements change lengths: delegates to [[graft.core.Spans.rewrite]]
    * (one home for the span-offset bookkeeping — round-3 review
    * deduplication). Text between spans passes through untouched. */
  def applyWithSpans(text: String, spans: Seq[Span], lang: String): (String, Vector[Span]) = {
    if (!registry.contains(lang) || spans.isEmpty) return (text, spans.toVector)
    graft.core.Spans.rewrite(text, spans)(apply(_, lang))
  }
}
