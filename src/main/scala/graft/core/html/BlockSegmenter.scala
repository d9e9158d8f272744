package graft.core.html

import graft.core.Block
import scala.collection.mutable.ArrayBuffer

/** Token stream → candidate text blocks.
  *
  * The analog of the reference's recursive XY-cut segmentation
  * (findCells, main/segment.c:278-352): where the reference splits a page at
  * blank pixel rows, we split the document at block-level tag boundaries;
  * inline tags (b, i, span, a, em, ...) do NOT split — that is the analog of
  * the horizontal-overlap glyph combine (overlapHorizontal,
  * main/segment.c:384-409). A run of 2+ <br> is the fallback split when no
  * block boundary exists (findLinesHarder analog, main/segment.c:354-382).
  *
  * Containers nav/header/footer/aside/form — or any element whose id/class
  * matches the boilerplate pattern — taint all nested blocks (feature, not a
  * drop: classification happens later, like the reference which labels
  * low-confidence glyphs rather than deleting them, main/kd.c:210-251).
  *
  * Implemented as a [[HtmlTokenizer.TokenSink]]: the kernel path
  * ([[segmentDirect]]) streams the scan straight into block accumulation —
  * no token objects, no intermediate piece strings; text decodes directly
  * into the per-block buffer with a parallel link-flag BitSet.
  */
object BlockSegmenter {

  private val blockTags = Set(
    "p", "div", "section", "article", "main", "aside", "nav", "header",
    "footer", "h1", "h2", "h3", "h4", "h5", "h6", "ul", "ol", "li",
    "table", "thead", "tbody", "tfoot", "tr", "td", "th", "blockquote",
    "pre", "figure", "figcaption", "form", "fieldset", "dl", "dt", "dd",
    "address", "hr", "body", "html", "head")

  private val boilerContainerTags = Set("nav", "header", "footer", "aside", "form")

  /** id/class substrings that mark a container as boilerplate — the
    * readability/trafilatura-class heuristic. */
  private val boilerIdClass =
    java.util.regex.Pattern.compile(
      "(?i)\\b(comment|sidebar|side-bar|footer|header|navbar|nav|menu|related|share|social|widget|promo|advert|ad-|banner|breadcrumb|cookie|subscribe|newsletter|pagination|masthead)")

  private val headingTags = Set("h1", "h2", "h3", "h4", "h5", "h6")

  /** Elements allowed inside <head>: anything ELSE implicitly closes an
    * open head (HTML5 optional-end-tag rule — </head> may be omitted;
    * without this, the head's skip state swallowed the whole body of a
    * conforming page; round-3 review finding). */
  private val headContentTags = Set(
    "base", "basefont", "bgsound", "link", "meta", "title", "noscript",
    "noframes", "style", "script", "template")

  /** Non-content subtrees skipped entirely. */
  private val skipTags = Set("script", "style", "noscript", "textarea", "head",
    "title", "svg", "iframe", "select", "option", "button", "datalist")

  // one hash lookup per tag instead of 5-8 Set lookups (each rehashing a
  // fresh substring) — the tag-classification bits fused into a bitmask
  private final val FBlock = 1
  private final val FBoilerTag = 2
  private final val FSkip = 4
  private final val FHeading = 8
  private final val FLi = 16
  private final val FVoid = 32
  private val tagFlags: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    def or(name: String, bit: Int): Unit =
      m.merge(name, Integer.valueOf(bit), (a, b) => Integer.valueOf(a | b))
    blockTags.foreach(or(_, FBlock))
    boilerContainerTags.foreach(or(_, FBoilerTag))
    skipTags.foreach(or(_, FSkip))
    headingTags.foreach(or(_, FHeading))
    or("li", FLi)
    HtmlTokenizer.voidElements.foreach(or(_, FVoid))
    m
  }
  private val ZeroFlags = Integer.valueOf(0)

  private final class OpenElem(
      val name: String,
      val flags: Int, // tagFlags bits | boiler-by-id/class folded into FBoilerTag
      val anchor: Boolean) {
    def isBlock: Boolean = (flags & FBlock) != 0
    def boiler: Boolean = (flags & FBoilerTag) != 0
    def skip: Boolean = (flags & FSkip) != 0
    def heading: Boolean = (flags & FHeading) != 0
    def li: Boolean = (flags & FLi) != 0
  }

  /** Word run inside a block: [begin,end) chars, link flag, word count. */
  private final case class Run(begin: Int, end: Int, isLink: Boolean, words: Int)

  /** The streaming segmenter. Collect blocks, then call [[result]]. */
  final class SegmentSink(fissionMinLinkRun: Int, fissionMinTextWords: Int)
      extends HtmlTokenizer.TokenSink {

    private val blocks = new ArrayBuffer[Block](32)
    private val stack = new ArrayBuffer[OpenElem](16)
    private val sb = new java.lang.StringBuilder(256)
    private val linkBits = new java.util.BitSet(256)
    private var blockHasLink = false // fast path: skip BitSet when no <a> text
    private var pendingBr = 0

    // maintained depth counters — O(1) per token (hottest loop in kernel)
    private var anchorDepthC = 0
    private var boilerDepthC = 0
    private var skipDepthC = 0
    private var blockDepthC = 0
    private var headingDepthC = 0
    private var liDepthC = 0
    private var headDepthC = 0

    private def tagPathNow: String = stack.iterator.filter(_.isBlock).map(_.name).mkString("/")

    private def push(e: OpenElem): Unit = {
      stack += e
      if (e.anchor) anchorDepthC += 1
      if (e.boiler) boilerDepthC += 1
      if (e.skip) skipDepthC += 1
      if (e.isBlock) blockDepthC += 1
      if (e.heading) headingDepthC += 1
      if (e.li) liDepthC += 1
      if (e.name == "head") headDepthC += 1
    }

    private def popFrom(idx: Int): Unit = {
      var k = stack.length - 1
      while (k >= idx) {
        val e = stack(k)
        if (e.anchor) anchorDepthC -= 1
        if (e.boiler) boilerDepthC -= 1
        if (e.skip) skipDepthC -= 1
        if (e.isBlock) blockDepthC -= 1
        if (e.heading) headingDepthC -= 1
        if (e.li) liDepthC -= 1
        if (e.name == "head") headDepthC -= 1
        k -= 1
      }
      stack.remove(idx, stack.length - idx)
    }

    private def emit(raw: String, begin: Int, end: Int, runs: Seq[Run]): Unit = {
      val words = runs.iterator.map(_.words).sum
      val linkWords = runs.iterator.filter(_.isLink).map(_.words).sum
      blocks += Block(
        text = raw.substring(begin, end),
        words = words,
        linkWords = linkWords,
        tagPath = tagPathNow,
        depth = blockDepthC,
        isHeading = headingDepthC > 0,
        isLi = liDepthC > 0,
        inBoilerContainer = boilerDepthC > 0)
    }

    private def flush(): Unit = {
      if (sb.length > 0) {
        // single pass over the buffer: word runs (maximal same-link-flag
        // word sequences) built with primitive locals — one Run allocation
        // per run boundary, not per word, and the BitSet is consulted only
        // when the block actually saw anchor text. An all-whitespace
        // buffer yields no runs and skips emission (the old separate
        // has-content pre-scan fused away).
        val wordRuns = ArrayBuffer.empty[Run]
        val n = sb.length
        var i = 0
        var runBegin = -1
        var runEnd = 0
        var runWords = 0
        var runLink = false
        while (i < n) {
          while (i < n && Character.isWhitespace(sb.charAt(i))) i += 1
          if (i < n) {
            val b = i
            var link = false
            if (blockHasLink) {
              while (i < n && !Character.isWhitespace(sb.charAt(i))) {
                if (linkBits.get(i)) link = true
                i += 1
              }
            } else {
              while (i < n && !Character.isWhitespace(sb.charAt(i))) i += 1
            }
            if (runBegin >= 0 && runLink == link) { runWords += 1; runEnd = i }
            else {
              if (runBegin >= 0) wordRuns += Run(runBegin, runEnd, runLink, runWords)
              runBegin = b; runEnd = i; runWords = 1; runLink = link
            }
          }
        }
        if (runBegin >= 0) wordRuns += Run(runBegin, runEnd, runLink, runWords)
        if (wordRuns.nonEmpty) {
          val raw = sb.toString
          // fission: big link runs inside a mixed block become own blocks
          // (wide-glyph split analog, splitWideGlyphs main/segment.c:1224-1386)
          val bigLinkRuns = wordRuns.count(r => r.isLink && r.words >= fissionMinLinkRun)
          val textWords = wordRuns.iterator.filterNot(_.isLink).map(_.words).sum
          if (fissionMinLinkRun > 0 && bigLinkRuns > 0 &&
              wordRuns.exists(r => !r.isLink) && textWords >= fissionMinTextWords) {
            var seg = ArrayBuffer.empty[Run]
            def flushSeg(): Unit = if (seg.nonEmpty) {
              emit(raw, seg.head.begin, seg.last.end, seg.toSeq)
              seg = ArrayBuffer.empty[Run]
            }
            wordRuns.foreach { r =>
              if (r.isLink && r.words >= fissionMinLinkRun) {
                flushSeg()
                emit(raw, r.begin, r.end, Seq(r))
              } else seg += r
            }
            flushSeg()
          } else if (wordRuns.nonEmpty) {
            emit(raw, 0, raw.length, wordRuns.toSeq)
          }
        }
        sb.setLength(0)
        if (blockHasLink) { linkBits.clear(); blockHasLink = false }
      }
      pendingBr = 0
    }

    private def append(piece: String, isLink: Boolean): Unit = {
      val b = sb.length
      sb.append(piece)
      if (isLink && sb.length > b) { linkBits.set(b, sb.length); blockHasLink = true }
    }

    override def startTag(name: String, id: String, cls: String, selfClosing: Boolean): Unit = {
      if (name == "br") {
        pendingBr += 1
        if (pendingBr >= 2) flush() // <br><br> = paragraph break (G4 analog)
        else append("\n", anchorDepthC > 0)
      } else if (name == "hr") {
        flush()
      } else {
        // implicit </head> (guarded by the counter — zero cost once closed)
        if (headDepthC > 0 && name != "head" && !headContentTags.contains(name)) {
          val hi = stack.lastIndexWhere(_.name == "head")
          if (hi >= 0) popFrom(hi)
        }
        val flags: Int = tagFlags.getOrDefault(name, ZeroFlags)
        if ((flags & FBlock) != 0) flush()
        if (!selfClosing && (flags & FVoid) == 0) {
          // short-circuit: a tag-level boiler container never pays the
          // id/class regex scan
          val boilerById = (flags & FBoilerTag) == 0 && (id != null || cls != null) && {
            val idClass = (if (id == null) "" else id) + " " + (if (cls == null) "" else cls)
            idClass.trim.nonEmpty && boilerIdClass.matcher(idClass).find()
          }
          push(new OpenElem(name,
            if (boilerById) flags | FBoilerTag else flags, name == "a"))
        }
        pendingBr = 0
      }
    }

    override def endTag(name: String): Unit = {
      // a stray end tag with NO matching open element is IGNORED, as in
      // browser tree construction (round-4 review: a never-opened </div>
      // flushed mid-paragraph, splitting one block into fragments that
      // each fell under minContentWords and were dropped)
      val idx = stack.lastIndexWhere(_.name == name)
      if (idx >= 0) {
        if ((tagFlags.getOrDefault(name, ZeroFlags) & FBlock) != 0) flush()
        popFrom(idx)
        pendingBr = 0
      }
    }

    override def text(html: String, start: Int, end: Int): Unit = {
      if (skipDepthC > 0) return
      var hasContent = false
      var i = start
      while (!hasContent && i < end) {
        if (!Character.isWhitespace(html.charAt(i))) hasContent = true
        i += 1
      }
      if (hasContent) {
        val b = sb.length
        HtmlTokenizer.decodeEntitiesInto(sb, html, start, end)
        if (anchorDepthC > 0 && sb.length > b) { linkBits.set(b, sb.length); blockHasLink = true }
        pendingBr = 0
      } else if (sb.length > 0) {
        // inter-word whitespace still separates words
        sb.append(' ')
      }
    }

    def result(): Vector[Block] = {
      flush()
      blocks.toVector
    }
  }

  /** Kernel fast path: scan straight into block accumulation. */
  def segmentDirect(
      html: String,
      fissionMinLinkRun: Int = 4,
      fissionMinTextWords: Int = 10,
      maxTokens: Int = Int.MaxValue): Vector[Block] = {
    val sink = new SegmentSink(fissionMinLinkRun, fissionMinTextWords)
    HtmlTokenizer.scan(html, maxTokens, sink)
    sink.result()
  }

  /** Compat path over materialized tokens (tests/tools). */
  def segment(
      tokens: IndexedSeq[HtmlTokenizer.Token],
      fissionMinLinkRun: Int = 4,
      fissionMinTextWords: Int = 10): Vector[Block] = {
    import HtmlTokenizer._
    val sink = new SegmentSink(fissionMinLinkRun, fissionMinTextWords)
    var i = 0
    while (i < tokens.length) {
      tokens(i) match {
        case StartTag(name, attrs, selfClosing) =>
          sink.startTag(name, attrs.getOrElse("id", null), attrs.getOrElse("class", null), selfClosing)
        case EndTag(name) => sink.endTag(name)
        case Text(value) => sink.text(value, 0, value.length)
      }
      i += 1
    }
    sink.result()
  }
}
