package graft.core

import graft.core.assemble.SpellRepair
import org.scalatest.funsuite.AnyFunSuite

class SpellRepairSpec extends AnyFunSuite {
  private val dict = Set("modern", "world", "window", "cool", "the", "hyphenated")

  test("known words pass through; unknown without fix unchanged") {
    val r = new SpellRepair(dict)
    assert(r.correct("world") == "world")
    assert(r.correct("zzzzq") == "zzzzq")
  }

  test("ordered first-accepting substitution (fixspell.pl fixit analog)") {
    val r = new SpellRepair(dict)
    assert(r.correct("rnodern") == "modern") // rn\u2192m at pos 0
    assert(r.correct("w0rld") == "world")    // 0\u2192o
    assert(r.correct("vvindovv") == "window") // two vv\u2192w via depth-2 recursion
  }

  test("position order: leftmost fix point wins") {
    val d = Set("corn", "com")
    val r = new SpellRepair(d, substitutions = Seq("rn" -> "m", "m" -> "rn"))
    // "corn" is ok already; "com" \u2192 tries m\u2192rn at pos 2 \u2192 "corn" ok
    assert(r.correct("com") == "com") // already in dict \u2014 unchanged
    val r2 = new SpellRepair(Set("corn"), substitutions = Seq("m" -> "rn"))
    assert(r2.correct("com") == "corn")
  }

  test("memoization returns identical results (fixspell %corrected analog)") {
    val r = new SpellRepair(dict)
    val first = r.correct("rnodern")
    assert(r.correct("rnodern") == first)
  }

  test("correctText preserves whitespace and punctuation exactly") {
    val r = new SpellRepair(dict)
    assert(r.correctText("the  w0rld,\n (c00l)") == "the  world,\n (cool)")
  }

  test("hyphen rejoin at line end only when joined word known (fixspell.pl:85-90)") {
    assert(SpellRepair.rejoinHyphenation("hyphen-\nated word", dict) == "hyphenated\n word")
    assert(SpellRepair.rejoinHyphenation("foo-\nbar", dict) == "foo-\nbar")
    assert(SpellRepair.rejoinHyphenation("no hyphens here", dict) == "no hyphens here")
  }

  // --- differential gold vs the ACTUAL reference fixspell.pl ---------------
  // The gold string below is the literal byte output of running
  // /root/reference/fixspell.pl (perl 5, utf8; $spellFile redirected to the
  // same synthetic ok-word list) on the input. The probe exercises every
  // correction of the verbatim table (SpellRepair.yiddishCorrections), the
  // rule ORDER (patah tried before qamats), fix stacking via fixit's
  // where+1 recursion, the (?=\P{M}) lookahead \u2014 including its subtle
  // consequence that a WORD-FINAL alef can never be fixed (lookahead needs
  // a following char), so "mama" stays broken \u2014 the maqaf line-end rejoin,
  // the %corrected cache path, and the dropped EOF remainder.
  private val yiOk = Set(
    "\u05D4\u05F2\u05B7\u05E0\u05D8", // haynt    (rule 1: double-yod + patah)
    "\u05EA\u05BC\u05D5\u05E8\u05D4", // toyre    (rule 2: tav + dagesh)
    "\u05DB\u05BC\u05DC\u05DC", // klal     (rule 3: kaf + dagesh)
    "\u05D1\u05BF\u05DC\u05D5\u05DD", // blum     (rule 4: vet + rafe)
    "\u05D9\u05B4\u05E2\u05E7\u05D1", // yekv     (rule 5: yod-ayin + hiriq)
    "\u05DE\u05E2\u05D9\u05B4\u05DF", // meyn     (rule 6: ayin-yod + hiriq)
    "\u05DE\u05D0\u05B7\u05DF", // man      (rule 7: alef + patah)
    "\u05D9\u05D0\u05B8\u05E8", // yor      (rule 8: alef + qamats)
    "\u05E9\u05C2\u05DE\u05D7\u05D4", // simkhe   (rule 9: shin + sin dot)
    "\u05D1\u05D0\u05B7\u05E0\u05D3", // ordering: patah candidate wins...
    "\u05D1\u05D0\u05B8\u05E0\u05D3", // ...over this equally-ok qamats one
    "\u05D2\u05D0\u05B8\u05D8", // got: patah cand NOT ok -> qamats
    "\u05DE\u05D0\u05B7\u05DE\u05D0\u05B7", // mama (UNREACHABLE: final alef)
    "\u05DE\u05D0\u05B7\u05DF\u05D8\u05D0\u05B8\u05D2") // man+tog (rejoin + stacking)

  test("differential gold: FixspellRepair reproduces fixspell.pl byte-for-byte") {
    import graft.core.assemble.FixspellRepair
    val in1 =
      "\u05D4\u05F2\u05E0\u05D8 \u05EA\u05D5\u05E8\u05D4 \u05DB\u05DC\u05DC\n" +
      "\u05D1\u05DC\u05D5\u05DD \u05D9\u05E2\u05E7\u05D1 \u05DE\u05E2\u05D9\u05DF\n" +
      "\u05DE\u05D0\u05DF, \u05D9\u05D0\u05E8! \u05E9\u05DE\u05D7\u05D4\n" +
      "\u05D1\u05D0\u05E0\u05D3 \u05D2\u05D0\u05D8 \u05DE\u05D0\u05DE\u05D0\n" +
      "\u05DE\u05D0\u05B7\u05E8\u05E1 xyz 123\n" +
      "\u05D3\u05E2\u05E8 \u05DE\u05D0\u05DF\u05BE\n" +
      "\u05D8\u05D0\u05D2 \u05DE\u05D0\u05DF\n" +
      "\u05DE\u05D0\u05DF \u05DE\u05D0\u05DF\n" +
      "\u05D0\u05D1\u05D2\u05BE\n"
    val gold =
      "\u05D4\u05F2\u05B7\u05E0\u05D8 \u05EA\u05BC\u05D5\u05E8\u05D4 \u05DB\u05BC\u05DC\u05DC\n" +
      "\u05D1\u05BF\u05DC\u05D5\u05DD \u05D9\u05B4\u05E2\u05E7\u05D1 \u05DE\u05E2\u05D9\u05B4\u05DF\n" +
      "\u05DE\u05D0\u05B7\u05DF, \u05D9\u05D0\u05B8\u05E8! \u05E9\u05C2\u05DE\u05D7\u05D4\n" +
      "\u05D1\u05D0\u05B7\u05E0\u05D3 \u05D2\u05D0\u05B8\u05D8 \u05DE\u05D0\u05DE\u05D0\n" +
      "\u05DE\u05D0\u05B7\u05E8\u05E1 xyz 123\n" +
      "\u05D3\u05E2\u05E8 \n" +
      "\u05DE\u05D0\u05B7\u05DF\u05D8\u05D0\u05B8\u05D2 \u05DE\u05D0\u05B7\u05DF\n" +
      "\u05DE\u05D0\u05B7\u05DF \u05DE\u05D0\u05B7\u05DF\n" +
      "\n"
    val r = new FixspellRepair(yiOk)
    assert(r.correctText(in1) == gold)
    // idempotence: repaired text is all ok words / unfixable parts
    assert(r.correctText(gold) == gold)
  }

  test("correctTextLossless: a block-final word+maqaf survives (block != EOF)") {
    import graft.core.assemble.FixspellRepair
    val r = new FixspellRepair(yiOk)
    // the verbatim path drops the stripped remainder at EOF (Perl-pinned)\u2026
    val in = "\u05DE\u05D0\u05DF \u05D0\u05D1\u05D2\u05BE\n"
    assert(r.correctText(in) == "\u05DE\u05D0\u05B7\u05DF \n")
    // \u2026the lossless path (what the extraction kernel uses per block slice)
    // re-attaches it verbatim before the terminator; the rest still repairs
    assert(r.correctTextLossless(in) == "\u05DE\u05D0\u05B7\u05DF \u05D0\u05D1\u05D2\u05BE\n")
    assert(r.correctTextLossless("\u05DE\u05D0\u05DF \u05D0\u05D1\u05D2\u05BE") == "\u05DE\u05D0\u05B7\u05DF \u05D0\u05D1\u05D2\u05BE")
    // without a dangling remainder the two are identical
    assert(r.correctTextLossless("\u05DE\u05D0\u05DF \u05EA\u05D5\u05E8\u05D4\n\u05DB\u05DC\u05DC") == r.correctText("\u05DE\u05D0\u05DF \u05EA\u05D5\u05E8\u05D4\n\u05DB\u05DC\u05DC"))
  }

  test("CRLF differential gold: $ must NOT match before \\r\\n (Perl semantics)") {
    import graft.core.assemble.FixspellRepair
    // gold = literal bytes from the actual /root/reference/fixspell.pl
    // (perl 5, utf8, wordlist = {מאַן, מאַןטאָג}) on this CR-bearing input:
    // Perl's `$` only matches before a final \n, so the \r BLOCKS the
    // word+maqaf hoist — the word still repairs in place (\r is \s, a
    // part separator) and the next line is NOT prefixed. Java's default
    // `$` matches before \r\n too, which hoisted the word (ADVICE r3).
    val r = new FixspellRepair(Set("מאַן", "מאַןטאָג"))
    val in = "דער מאן־\r\nטאג מאן\n"
    val gold = "דער מאַן־\r\nטאג מאַן\n"
    assert(r.correctText(in) == gold)
    // LF-only control: the hoist DOES fire and the joined word repairs
    assert(r.correctText("דער מאן־\nטאג מאן\n") == "דער \nמאַןטאָג מאַן\n")
  }

  test("fixit: adversarial all-correctable words terminate (node budget + part cap)") {
    import graft.core.assemble.FixspellRepair
    val r = new FixspellRepair(yiOk)
    // 30 consecutive alefs: both alef rules match at every position — the
    // unbounded Perl search is ~3^30 nodes; the budget must cut it off and
    // return the word unchanged (the no-fix-found answer) in bounded time
    val alefs = "א" * 30
    // thread CPU time, not wall clock: the parallel suite run contends for
    // cores and stretched the wall measurement past any fixed bound while
    // the bounded search did exactly the same WORK (round-6 flake)
    val cpu = java.lang.management.ManagementFactory.getThreadMXBean
    val t0 = cpu.getCurrentThreadCpuTime
    assert(r.fixWord(alefs) == alefs)
    assert((cpu.getCurrentThreadCpuTime - t0) / 1e9 < 10.0,
      "budget did not bound the search")
    // parts beyond maxPartLength skip the search entirely (StackOverflow guard)
    val deep = "א" * 500
    assert(r.fixWord(deep) == deep)
    // memo: the second call is a cache hit (same answer)
    assert(r.fixWord(alefs) == alefs)
  }

  test("fixit: word-final alef is unfixable (lookahead needs a following char)") {
    import graft.core.assemble.FixspellRepair
    val r = new FixspellRepair(yiOk)
    // mama: both alefs need marks, but the second is word-final
    assert(r.fixWord("\u05DE\u05D0\u05DE\u05D0") == "\u05DE\u05D0\u05DE\u05D0")
    // man: single non-final alef fixes
    assert(r.fixWord("\u05DE\u05D0\u05DF") == "\u05DE\u05D0\u05B7\u05DF")
  }
}
