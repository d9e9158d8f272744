package graft.core

/** Span utilities — the point-lookup analog (glyphAtXY,
  * main/segment.c:1078-1120): find the span covering a character offset.
  * Spans are ordered and non-overlapping (assembly invariant), so binary
  * search applies. */
object Spans {

  /** Span containing `offset`, if any (separators/trailing newline are
    * outside every span). O(log n). */
  def at(spans: IndexedSeq[Span], offset: Int): Option[Span] = {
    var lo = 0
    var hi = spans.length - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val s = spans(mid)
      if (offset < s.begin) hi = mid - 1
      else if (offset >= s.end) lo = mid + 1
      else return Some(s)
    }
    None
  }

  /** All spans intersecting [begin, end). */
  def overlapping(spans: IndexedSeq[Span], begin: Int, end: Int): IndexedSeq[Span] =
    spans.filter(s => s.begin < end && s.end > begin)

  /** Validate the assembly invariants (tests + debug). */
  def invariantsHold(spans: Seq[Span], textLen: Int): Boolean = {
    var prevEnd = -1
    spans.forall { s =>
      val ok = s.begin >= 0 && s.begin < s.end && s.end <= textLen && s.begin > prevEnd
      prevEnd = s.end
      ok
    }
  }
}
