package graft.core

import graft.core.classify.HeuristicClassifier
import org.scalatest.funsuite.AnyFunSuite

class ClassifierSpec extends AnyFunSuite {
  private val cfg = ExtractorConfig.default

  private def blk(text: String, words: Int, linkWords: Int = 0,
                  heading: Boolean = false, li: Boolean = false,
                  boiler: Boolean = false) =
    Block(text, words, linkWords, "body/div/p", 3, heading, li, boiler)

  private def kinds(bs: Block*): Vector[String] =
    HeuristicClassifier.classify(bs.toVector, cfg).map(_._2)

  test("long clean block is content; short is dropped (F7 threshold analog)") {
    assert(kinds(blk("x", 20)) == Vector("content"))
    assert(kinds(blk("x", 5)) == Vector.empty)
  }

  test("link density > 0.33 drops a block (Boilerpipe rule)") {
    assert(kinds(blk("x", 20, linkWords = 7)).isEmpty)   // 0.35 > 0.33 → dropped
    assert(kinds(blk("x", 20, linkWords = 6)) == Vector("content")) // 0.30 ≤ 0.33 → kept
  }

  test("link density boundary exact") {
    assert(kinds(blk("x", 30, linkWords = 10)).isEmpty)  // 0.333… > 0.33 → dropped
    assert(kinds(blk("x", 100, linkWords = 33)) == Vector("content")) // 0.33 ≤ 0.33 → kept
  }

  test("boiler container always drops, even long text (container rule precedence)") {
    assert(kinds(blk("x", 50, boiler = true)) == Vector.empty)
  }

  test("fusion: short clean block between two content blocks absorbed (G10 analog)") {
    val r = kinds(blk("a", 20), blk("b", 4), blk("c", 20))
    assert(r == Vector("content", "content", "content"))
  }

  test("fusion needs both neighbors kept") {
    assert(kinds(blk("a", 20), blk("b", 4)) == Vector("content"))
    assert(kinds(blk("b", 4), blk("c", 20)) == Vector("content"))
  }

  test("fusion rejects boiler shorts under both gates") {
    val boiler = kinds(blk("a", 20), blk("b", 4, boiler = true), blk("c", 20))
    assert(boiler == Vector("content", "content"))
    val cfgWordGate = cfg.copy(fusionScoreGate = false)
    val boiler2 = HeuristicClassifier.classify(
      Vector(blk("a", 20), blk("b", 4, boiler = true), blk("c", 20)), cfgWordGate).map(_._2)
    assert(boiler2 == Vector("content", "content"))
  }

  test("score gate vs word gate disagree: linky short between LONG paragraphs — score gate absorbs (G10 rule)") {
    // middle: 4 words, 2 linked → ld 0.5, fails the per-block word-gate cap
    // (fusionMaxLinkDensity 0.1). The score gate re-scores the MERGED
    // region: 44 words / 2 links → ld 0.045, distance 0 ≤ max(neighbors) —
    // absorbed (reference rule: merged distance ≤ max of parts,
    // main/segment.c:999-1025).
    val bs = Vector(blk("a", 20), blk("b", 4, linkWords = 2), blk("c", 20))
    assert(HeuristicClassifier.classify(bs, cfg).map(_._2) ==
      Vector("content", "content", "content"))
    // -A alwaysCombine-style override back to the word gate: rejected
    assert(HeuristicClassifier.classify(bs, cfg.copy(fusionScoreGate = false)).map(_._2) ==
      Vector("content", "content"))
  }

  test("score gate rejects when the merge degrades the region below the worse neighbor") {
    // neighbors are barely-content (10 words, ld 0.30 ≤ 0.33 → distance 0);
    // middle is a 5-word pure-link fragment. Merged: 25 words, 11 links →
    // ld 0.44 → distance 0.11 > max(0, 0) → fusion rejected.
    val bs = Vector(
      blk("a", 10, linkWords = 3),
      blk("b", 5, linkWords = 5),
      blk("c", 10, linkWords = 3))
    assert(HeuristicClassifier.classify(bs, cfg).map(_._2) ==
      Vector("content", "content"))
  }

  test("heading kept only when content follows before next heading") {
    val kept = kinds(blk("h", 3, heading = true), blk("p", 20))
    assert(kept == Vector("heading", "content"))
    val orphan = kinds(blk("h", 3, heading = true), blk("junk", 2))
    assert(orphan == Vector.empty)
    val blocked = kinds(blk("h1", 3, heading = true), blk("h2", 3, heading = true), blk("p", 20))
    assert(blocked == Vector("heading", "content"))
  }

  test("list items with enough words become list kind") {
    assert(kinds(blk("item", 12, li = true)) == Vector("list"))
  }
}
