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

  /** Rewrite each span's slice with `f`, recomputing offsets exactly;
    * text between spans passes through untouched. */
  def rewrite(text: String, spans: Seq[Span])(f: String => String): (String, Vector[Span]) = {
    if (spans.isEmpty) return (text, Vector.empty)
    val sb = new java.lang.StringBuilder(text.length)
    val out = Vector.newBuilder[Span]
    var cursor = 0
    spans.foreach { s =>
      sb.append(text, cursor, s.begin)
      val b = sb.length
      sb.append(f(text.substring(s.begin, s.end)))
      out += Span(b, sb.length, s.kind)
      cursor = s.end
    }
    sb.append(text, cursor, text.length)
    (sb.toString, out.result())
  }

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
