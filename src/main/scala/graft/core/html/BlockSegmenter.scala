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

  /** Non-content subtrees skipped entirely. */
  private val skipTags = Set("script", "style", "noscript", "textarea", "head",
    "title", "svg", "iframe", "select", "option", "button", "datalist")

  private final class OpenElem(
      val name: String,
      val isBlock: Boolean,
      val boiler: Boolean,
      val skip: Boolean,
      val anchor: Boolean)

  /** Word run inside a block: [begin,end) chars, link flag, word count. */
  private final case class Run(begin: Int, end: Int, isLink: Boolean, words: Int)

  /** Segment a token stream into blocks, preserving document order.
    *
    * @param fissionMinLinkRun when > 0, a contiguous run of at least this
    *   many fully-linked words inside a mixed block is SPLIT into its own
    *   block (wide-glyph fission analog, splitWideGlyphs
    *   main/segment.c:1224-1386: search for a split point, keep the split
    *   when the parts score better than the whole — here the "score" is
    *   the link-density classifier downstream, which can then keep the
    *   text part and drop the embedded nav). 0 disables fission.
    */
  def segment(
      tokens: IndexedSeq[HtmlTokenizer.Token],
      fissionMinLinkRun: Int = 4,
      fissionMinTextWords: Int = 10): Vector[Block] = {
    import HtmlTokenizer._
    val blocks = new ArrayBuffer[Block](32)
    val stack = new ArrayBuffer[OpenElem](16)

    // current block accumulator: (textPiece, isLink)
    var pieces = new ArrayBuffer[(String, Boolean)](8)
    var pendingBr = 0

    // maintained depth counters — O(1) per token instead of O(stack) scans
    // (the segmenter runs once per document at 10^12 scale; this is the
    // hottest loop in the kernel)
    var anchorDepthC = 0
    var boilerDepthC = 0
    var skipDepthC = 0
    var blockDepthC = 0
    var headingDepthC = 0
    var liDepthC = 0

    def anchorDepth: Int = anchorDepthC
    def boilerNow: Boolean = boilerDepthC > 0
    def skipNow: Boolean = skipDepthC > 0
    def blockDepth: Int = blockDepthC
    def tagPathNow: String = stack.iterator.filter(_.isBlock).map(_.name).mkString("/")
    def headingNow: Boolean = headingDepthC > 0
    def liNow: Boolean = liDepthC > 0

    def push(e: OpenElem): Unit = {
      stack += e
      if (e.anchor) anchorDepthC += 1
      if (e.boiler) boilerDepthC += 1
      if (e.skip) skipDepthC += 1
      if (e.isBlock) blockDepthC += 1
      if (headingTags.contains(e.name)) headingDepthC += 1
      if (e.name == "li") liDepthC += 1
    }

    def popFrom(idx: Int): Unit = {
      var k = stack.length - 1
      while (k >= idx) {
        val e = stack(k)
        if (e.anchor) anchorDepthC -= 1
        if (e.boiler) boilerDepthC -= 1
        if (e.skip) skipDepthC -= 1
        if (e.isBlock) blockDepthC -= 1
        if (headingTags.contains(e.name)) headingDepthC -= 1
        if (e.name == "li") liDepthC -= 1
        k -= 1
      }
      stack.remove(idx, stack.length - idx)
    }

    def emit(raw: String, begin: Int, end: Int, runs: Seq[Run]): Unit = {
      val words = runs.iterator.map(_.words).sum
      val linkWords = runs.iterator.filter(_.isLink).map(_.words).sum
      blocks += Block(
        text = raw.substring(begin, end),
        words = words,
        linkWords = linkWords,
        tagPath = tagPathNow,
        depth = blockDepth,
        isHeading = headingNow,
        isLi = liNow,
        inBoilerContainer = boilerNow)
    }

    def flush(): Unit = {
      if (pieces.nonEmpty) {
        val raw = pieces.iterator.map(_._1).mkString
        if (raw.exists(!_.isWhitespace)) {
          // per-char link flags, then word runs (maximal non-ws spans; a
          // word is a link word if any contributing char was inside an <a>)
          val flags = new Array[Boolean](raw.length)
          var off = 0
          pieces.foreach { case (txt, isLink) =>
            if (isLink) java.util.Arrays.fill(flags, off, off + txt.length, true)
            off += txt.length
          }
          val wordRuns = ArrayBuffer.empty[Run]
          var i = 0
          val n = raw.length
          while (i < n) {
            while (i < n && raw.charAt(i).isWhitespace) i += 1
            if (i < n) {
              val b = i
              var link = false
              while (i < n && !raw.charAt(i).isWhitespace) { if (flags(i)) link = true; i += 1 }
              // merge into previous run if same link flag
              if (wordRuns.nonEmpty && wordRuns.last.isLink == link) {
                val last = wordRuns.last
                wordRuns(wordRuns.length - 1) = Run(last.begin, i, link, last.words + 1)
              } else wordRuns += Run(b, i, link, 1)
            }
          }
          // fission: big link runs inside a mixed block become own blocks
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
        pieces = new ArrayBuffer[(String, Boolean)](8)
      }
      pendingBr = 0
    }

    var ti = 0
    val tn = tokens.length
    while (ti < tn) {
      tokens(ti) match {
      case StartTag(name, attrs, selfClosing) =>
        if (name == "br") {
          pendingBr += 1
          if (pendingBr >= 2) flush() // <br><br> = paragraph break (G4 analog)
          else pieces += (("\n", anchorDepth > 0))
        } else if (name == "hr") {
          flush()
        } else {
          val isBlock = blockTags.contains(name)
          if (isBlock) flush()
          if (!selfClosing && !HtmlTokenizer.voidElements.contains(name)) {
            val boiler = boilerContainerTags.contains(name) || (attrs.nonEmpty && {
              val idClass = attrs.getOrElse("id", "") + " " + attrs.getOrElse("class", "")
              idClass.trim.nonEmpty && boilerIdClass.matcher(idClass).find()
            })
            push(new OpenElem(
              name,
              isBlock,
              boiler,
              skipTags.contains(name),
              name == "a"))
          }
          pendingBr = 0
        }
      case EndTag(name) =>
        if (blockTags.contains(name)) flush()
        // pop up to and including the innermost matching open element
        val idx = stack.lastIndexWhere(_.name == name)
        if (idx >= 0) popFrom(idx)
        pendingBr = 0
      case Text(value) =>
        if (!skipNow && value.exists(!_.isWhitespace)) {
          pieces += ((HtmlTokenizer.decodeEntities(value), anchorDepth > 0))
          pendingBr = 0
        } else if (!skipNow && pieces.nonEmpty) {
          // inter-word whitespace still separates words
          pieces += ((" ", false))
        }
      }
      ti += 1
    }
    flush()
    blocks.toVector
  }
}
