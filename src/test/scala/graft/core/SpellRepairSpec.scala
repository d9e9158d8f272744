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
    assert(r.correct("rnodern") == "modern") // rn→m at pos 0
    assert(r.correct("w0rld") == "world")    // 0→o
    assert(r.correct("vvindovv") == "window") // two vv→w via depth-2 recursion
  }

  test("position order: leftmost fix point wins") {
    val d = Set("corn", "com")
    val r = new SpellRepair(d, substitutions = Seq("rn" -> "m", "m" -> "rn"))
    // "corn" is ok already; "com" → tries m→rn at pos 2 → "corn" ok
    assert(r.correct("com") == "com") // already in dict — unchanged
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
}
