package graft.core.html

import scala.collection.mutable.ArrayBuffer

/** Minimal, deterministic HTML tokenizer (no external deps).
  *
  * The analog of the reference's page reader + binarizer (S1/S2,
  * main/readPicture.c:36-117): raw payload bytes in, a clean token stream
  * out. Deliberately forgiving — real Common-Crawl HTML is malformed, and
  * like the reference (which never aborts on a bad page, it emits the
  * failure sentinel instead, main/ocr.h:208) the tokenizer never throws on
  * malformed markup; worst case it degrades to text.
  *
  * Handles: tags with quoted/unquoted attributes (only id/class are
  * materialized — the only attributes consumed downstream), self-closing
  * tags, comments, doctype, CDATA, raw-text elements (script/style/
  * noscript/textarea — consumed until the matching close tag), and
  * character references (named subset + numeric).
  *
  * The ONE scanning implementation is [[scan]], which drives a [[TokenSink]]
  * with ZERO per-token allocations for known tag names and text regions —
  * the extraction kernel's hottest loop. [[tokenize]] is a collecting sink
  * kept for tests/tools.
  */
object HtmlTokenizer {

  sealed trait Token
  final case class StartTag(name: String, attrs: Map[String, String], selfClosing: Boolean) extends Token
  final case class EndTag(name: String) extends Token
  final case class Text(value: String) extends Token

  /** Streaming consumer of the scan. `text` regions are RAW (entities not
    * decoded — decode lazily with [[decodeEntitiesInto]]). */
  trait TokenSink {
    /** @param id/cls null when the attribute is absent */
    def startTag(name: String, id: String, cls: String, selfClosing: Boolean): Unit
    def endTag(name: String): Unit
    def text(html: String, start: Int, end: Int): Unit
  }

  private val rawTextElements = Set("script", "style", "noscript", "textarea", "title")

  val voidElements: Set[String] = Set(
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr")

  /** Interned canonical tag names — region-matched without allocation. */
  private val knownNames: Array[String] = Array(
    "p", "div", "section", "article", "main", "aside", "nav", "header",
    "footer", "h1", "h2", "h3", "h4", "h5", "h6", "ul", "ol", "li",
    "table", "thead", "tbody", "tfoot", "tr", "td", "th", "blockquote",
    "pre", "figure", "figcaption", "form", "fieldset", "dl", "dt", "dd",
    "address", "hr", "body", "html", "head", "a", "b", "i", "em", "strong",
    "span", "small", "sub", "sup", "code", "label", "time", "abbr", "cite",
    "q", "s", "u", "mark", "br", "img", "script", "style", "noscript",
    "textarea", "title", "meta", "link", "input", "button", "select",
    "option", "iframe", "svg", "font", "center", "wbr", "source", "video",
    "audio", "picture", "canvas", "datalist", "base", "area", "col",
    "embed", "param", "track", "caption", "colgroup", "details", "summary",
    "dialog", "kbd", "samp", "var", "ins", "del", "big", "tt", "ruby")
  // bucketed by (first-lowercased-char, length) for O(bucket) probes
  private val nameBuckets: java.util.HashMap[Integer, Array[String]] = {
    val m = new java.util.HashMap[Integer, ArrayBuffer[String]]()
    knownNames.distinct.foreach { n =>
      val k = Integer.valueOf(n.charAt(0) * 64 + n.length)
      var b = m.get(k)
      if (b == null) { b = ArrayBuffer.empty[String]; m.put(k, b) }
      b += n
    }
    val out = new java.util.HashMap[Integer, Array[String]]()
    m.forEach((k, v) => out.put(k, v.toArray))
    out
  }

  /** Canonical lowercase tag name for html[start, start+len); interned for
    * known names (no allocation), substring+toLowerCase otherwise. */
  private def canonicalName(html: String, start: Int, len: Int): String = {
    if (len >= 1 && len <= 10) {
      val c0 = Character.toLowerCase(html.charAt(start))
      val bucket = nameBuckets.get(Integer.valueOf(c0 * 64 + len))
      if (bucket != null) {
        var bi = 0
        while (bi < bucket.length) {
          val cand = bucket(bi)
          if (html.regionMatches(true, start, cand, 0, len)) return cand
          bi += 1
        }
      }
    }
    html.substring(start, start + len).toLowerCase
  }

  /** Named character references we decode (the long tail falls through as
    * literal text, which is deterministic and harmless for extraction). */
  private val namedEntities: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> "\u00A0", "shy" -> "\u00AD", "mdash" -> "\u2014",
    "ndash" -> "\u2013", "hellip" -> "\u2026", "copy" -> "\u00A9",
    "reg" -> "\u00AE", "trade" -> "\u2122", "laquo" -> "\u00AB",
    "raquo" -> "\u00BB", "ldquo" -> "\u201C", "rdquo" -> "\u201D",
    "lsquo" -> "\u2018", "rsquo" -> "\u2019", "middot" -> "\u00B7",
    "bull" -> "\u2022", "deg" -> "\u00B0", "times" -> "\u00D7",
    "eacute" -> "\u00E9", "egrave" -> "\u00E8", "agrave" -> "\u00E0",
    "uuml" -> "\u00FC", "ouml" -> "\u00F6", "auml" -> "\u00E4",
    "szlig" -> "\u00DF", "ccedil" -> "\u00E7")

  /** WHATWG 13.2.5.80 numeric-character-reference end state: code points
    * 0x80–0x9F map through the windows-1252 table (same table the charset
    * decoder uses); entries the spec leaves unmapped keep their value. */
  private val c1RefMap: Array[Int] = Array(
    0x20AC, 0x81, 0x201A, 0x0192, 0x201E, 0x2026, 0x2020, 0x2021,
    0x02C6, 0x2030, 0x0160, 0x2039, 0x0152, 0x8D, 0x017D, 0x8F,
    0x90, 0x2018, 0x2019, 0x201C, 0x201D, 0x2022, 0x2013, 0x2014,
    0x02DC, 0x2122, 0x0161, 0x203A, 0x0153, 0x9D, 0x017E, 0x0178)

  /** Decode character references in a text run. */
  def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    decodeEntitiesInto(sb, s, 0, s.length)
    sb.toString
  }

  /** Decode character references of s[start,end) APPENDING into `sb` —
    * the allocation-free variant the kernel uses. Segments between '&'s are
    * bulk-copied (intrinsified), not iterated char by char. */
  def decodeEntitiesInto(sb: java.lang.StringBuilder, s: String, start: Int, end: Int): Unit = {
    var i = start
    while (i < end) {
      val amp = s.indexOf('&', i)
      if (amp < 0 || amp >= end) { sb.append(s, i, end); return }
      if (amp > i) sb.append(s, i, amp)
      i = amp
      val c = s.charAt(i)
      val semi = s.indexOf(';', i + 1)
      if (semi > i && semi < end && semi - i <= 12) {
        val body = s.substring(i + 1, semi)
        // HTML5 numeric-reference policy: surrogate code points (U+D800–
        // U+DFFF) and out-of-range values map to U+FFFD — appendCodePoint
        // would otherwise emit a LONE surrogate, ill-formed UTF-16 that
        // mutates through UTF8String/parquet round trips and breaks the
        // byte-identity/resume contract (ADVICE r1).
        // ...plus (ADVICE r2, WHATWG 13.2.5.80): NUL (&#0;) and
        // out-of-range values (> 0x10FFFF) also map to U+FFFD instead of
        // falling through as literal text.
        // cp is a Long: the 12-char body cap bounds digits well inside Long
        // range, so overflowing values (e.g. &#x110000000;) take the FFFD
        // branch instead of a parse exception's literal passthrough. A
        // syntactically non-numeric body (`&#-1;`, `&#zz;`) is NOT a
        // character reference per WHATWG and stays literal.
        // ...and (round-4 review, same WHATWG section): numeric references
        // in the C1 range (&#128;\u2013&#159;) map through the windows-1252
        // table (0x93 \u2192 U+201C "curly quote", etc.) \u2014 legacy-CMS pages use
        // these constantly, and emitting the raw C1 control put invisible
        // control chars in the corpus where punctuation belongs. Refs the
        // table leaves unmapped (0x81/0x8D/0x8F/0x90/0x9D) pass through.
        def appendRef(cp: Long): Unit =
          if (cp == 0 || cp > Character.MAX_CODE_POINT ||
              (cp >= Character.MIN_SURROGATE.toLong && cp <= Character.MAX_SURROGATE.toLong))
            sb.append('\uFFFD')
          else if (cp >= 0x80 && cp <= 0x9F)
            sb.appendCodePoint(c1RefMap((cp - 0x80).toInt))
          else sb.appendCodePoint(cp.toInt)
        def allDec(d: String): Boolean =
          d.nonEmpty && d.forall(ch => ch >= '0' && ch <= '9')
        def allHex(d: String): Boolean =
          d.nonEmpty && d.forall(ch => (ch >= '0' && ch <= '9') ||
            (ch >= 'a' && ch <= 'f') || (ch >= 'A' && ch <= 'F'))
        if (body.startsWith("#x") || body.startsWith("#X")) {
          val digits = body.substring(2)
          if (allHex(digits)) { appendRef(java.lang.Long.parseLong(digits, 16)); i = semi + 1 }
          else { sb.append(c); i += 1 }
        } else if (body.startsWith("#")) {
          val digits = body.substring(1)
          if (allDec(digits)) { appendRef(java.lang.Long.parseLong(digits)); i = semi + 1 }
          else { sb.append(c); i += 1 }
        } else namedEntities.get(body) match {
          case Some(rep) => sb.append(rep); i = semi + 1
          case None => sb.append(c); i += 1
        }
      } else { sb.append(c); i += 1 }
    }
  }

  /** Tokenize into a materialized sequence (tests/tools; the kernel drives
    * [[scan]] directly through the segmenter's sink). */
  def tokenize(html: String, maxTokens: Int = Int.MaxValue): IndexedSeq[Token] = {
    val out = new ArrayBuffer[Token](64)
    scan(html, maxTokens, new TokenSink {
      override def startTag(name: String, id: String, cls: String, selfClosing: Boolean): Unit = {
        var attrs = Map.empty[String, String]
        if (id != null) attrs += ("id" -> id)
        if (cls != null) attrs += ("class" -> cls)
        out += StartTag(name, attrs, selfClosing)
      }
      override def endTag(name: String): Unit = out += EndTag(name)
      override def text(html: String, start: Int, end: Int): Unit =
        out += Text(html.substring(start, end))
    })
    scala.collection.immutable.ArraySeq.unsafeWrapArray(out.toArray)
  }

  /** THE scanner. Emits at most `maxTokens` sink events (the analog of the
    * reference's size caps, main/ocr.h:53-56); excess input is dropped. */
  def scan(html: String, maxTokens: Int, sink: TokenSink): Unit = {
    val n = html.length
    var i = 0
    var textStart = 0
    var emitted = 0
    val tag = new TagResult

    def emitText(until: Int): Unit =
      if (until > textStart && emitted < maxTokens) {
        sink.text(html, textStart, until); emitted += 1
      }
    def emitStart(name: String, id: String, cls: String, selfClosing: Boolean): Unit =
      if (emitted < maxTokens) { sink.startTag(name, id, cls, selfClosing); emitted += 1 }
    def emitEnd(name: String): Unit =
      if (emitted < maxTokens) { sink.endTag(name); emitted += 1 }

    while (i < n && emitted < maxTokens) {
      val lt = html.indexOf('<', i)
      if (lt < 0) { emitText(n); i = n; textStart = n }
      else {
        if (lt + 1 >= n) { emitText(n); i = n; textStart = n }
        else {
          val next = html.charAt(lt + 1)
          if (next == '!') {
            emitText(lt)
            if (html.startsWith("<!--", lt)) {
              // WHATWG abrupt closing: <!--> and <!---> are complete
              // (empty) comments — the generic scan starts at lt+4, past
              // the closer's own dashes, and would otherwise swallow the
              // rest of the document when no later "-->" exists
              // (round-4 review)
              if (lt + 4 < n && html.charAt(lt + 4) == '>') i = lt + 5
              else if (lt + 5 < n && html.charAt(lt + 4) == '-' &&
                       html.charAt(lt + 5) == '>') i = lt + 6
              else {
                val end = html.indexOf("-->", lt + 4)
                i = if (end < 0) n else end + 3
              }
            } else if (html.regionMatches(true, lt, "<![CDATA[", 0, 9)) {
              val end = html.indexOf("]]>", lt + 9)
              i = if (end < 0) n else end + 3
            } else { // doctype / other declaration
              val end = html.indexOf('>', lt + 1)
              i = if (end < 0) n else end + 1
            }
            textStart = i
          } else if (next == '?') { // processing instruction
            emitText(lt)
            val end = html.indexOf('>', lt + 1)
            i = if (end < 0) n else end + 1
            textStart = i
          } else if (next == '/') {
            emitText(lt)
            val end = html.indexOf('>', lt + 2)
            if (end < 0) { i = n; textStart = n }
            else {
              // name = trimmed content; only letter/digit names are tags
              var s0 = lt + 2
              var e0 = end
              while (s0 < e0 && html.charAt(s0).isWhitespace) s0 += 1
              while (e0 > s0 && html.charAt(e0 - 1).isWhitespace) e0 -= 1
              var ok = e0 > s0
              var k = s0
              while (ok && k < e0) { if (!html.charAt(k).isLetterOrDigit) ok = false; k += 1 }
              if (ok) emitEnd(canonicalName(html, s0, e0 - s0))
              i = end + 1; textStart = i
            }
          } else if (Character.isLetter(next)) {
            emitText(lt)
            val after = parseStartTag(html, lt, tag)
            if (after < 0) {
              // not a real tag; the '<' stays in the text run
              i = lt + 1
            } else {
              // for raw-text elements the scanner below CONSUMES to the
              // close tag regardless of a trailing "/" (HTML5 ignores it
              // on non-void elements), so the start token must not claim
              // self-closing either — <title/> otherwise skipped the
              // segmenter's element push and leaked the title text into
              // content blocks (round-4 review)
              emitStart(tag.name, tag.id, tag.cls,
                tag.selfClosing && !rawTextElements.contains(tag.name))
              i = after
              // raw-text elements: skip to the matching close tag.
              // HTML5 IGNORES a trailing "/" on non-void elements, so
              // <script/> still opens script data — honoring selfClosing
              // here leaked JS source into the text stream (round-3 review)
              if (rawTextElements.contains(tag.name)) {
                val name = tag.name
                val close = indexOfCloseTag(html, i, name)
                if (name == "title") {
                  val end = if (close < 0) n else close
                  if (end > i) { if (emitted < maxTokens) { sink.text(html, i, end); emitted += 1 } }
                }
                if (close < 0) { i = n }
                else {
                  emitEnd(name)
                  val gtc = html.indexOf('>', close)
                  i = if (gtc < 0) n else gtc + 1
                }
              }
              textStart = i
            }
          } else { // stray '<'
            i = lt + 1
          }
        }
      }
    }
  }

  /** Per-scan mutable tag-parse result (one per scan call — thread-safe). */
  private final class TagResult {
    var name: String = null
    var id: String = null
    var cls: String = null
    var selfClosing: Boolean = false
  }

  /** Case-insensitive search for `</name` at a token boundary. */
  private def indexOfCloseTag(html: String, from: Int, name: String): Int = {
    val n = html.length
    val nameLen = name.length
    var i = from
    while (i <= n - nameLen - 2) {
      if (html.charAt(i) == '<' && html.charAt(i + 1) == '/' &&
          html.regionMatches(true, i + 2, name, 0, nameLen)) {
        val after = i + 2 + nameLen
        if (after >= n) return i
        val c = html.charAt(after)
        if (c == '>' || c.isWhitespace || c == '/') return i
      }
      i += 1
    }
    -1
  }

  /** Parse a start tag beginning at `lt` ('<') into `res`; returns index
    * just past '>', or -1 if malformed. Only id/class attribute values are
    * materialized. */
  private def parseStartTag(html: String, lt: Int, res: TagResult): Int = {
    val n = html.length
    var i = lt + 1
    val nameStart = i
    while (i < n && html.charAt(i).isLetterOrDigit) i += 1
    if (i == nameStart) return -1
    val name = canonicalName(html, nameStart, i - nameStart)
    var id: String = null
    var cls: String = null
    var selfClosing = false
    var done = false
    var ended = false
    while (!done && i < n) {
      while (i < n && html.charAt(i).isWhitespace) i += 1
      if (i >= n) { done = true }
      else {
        val c = html.charAt(i)
        if (c == '>') { i += 1; done = true; ended = true }
        else if (c == '/' && i + 1 < n && html.charAt(i + 1) == '>') {
          selfClosing = true; i += 2; done = true; ended = true
        } else if (c == '<') {
          // malformed: new tag opens before this one closes — end it here
          done = true; ended = true
        } else {
          // attribute
          val aStart = i
          while (i < n && { val ch = html.charAt(i); !ch.isWhitespace && ch != '=' && ch != '>' && ch != '/' }) i += 1
          val aLen = i - aStart
          val isId = aLen == 2 && html.regionMatches(true, aStart, "id", 0, 2)
          val isCls = aLen == 5 && html.regionMatches(true, aStart, "class", 0, 5)
          while (i < n && html.charAt(i).isWhitespace) i += 1
          if (i < n && html.charAt(i) == '=') {
            i += 1
            while (i < n && html.charAt(i).isWhitespace) i += 1
            if (i < n) {
              val q = html.charAt(i)
              if (q == '"' || q == '\'') {
                val vEnd = html.indexOf(q, i + 1)
                if (vEnd < 0) { // unterminated: consume to '>'
                  val gt = html.indexOf('>', i)
                  if (isId) id = decodeEntities(html.substring(i + 1, if (gt < 0) n else gt))
                  if (isCls) cls = decodeEntities(html.substring(i + 1, if (gt < 0) n else gt))
                  i = if (gt < 0) n else gt
                } else {
                  if (isId) id = decodeEntities(html.substring(i + 1, vEnd))
                  if (isCls) cls = decodeEntities(html.substring(i + 1, vEnd))
                  i = vEnd + 1
                }
              } else {
                val vStart = i
                while (i < n && { val ch = html.charAt(i); !ch.isWhitespace && ch != '>' }) i += 1
                if (isId) id = decodeEntities(html.substring(vStart, i))
                if (isCls) cls = decodeEntities(html.substring(vStart, i))
              }
            }
          } else if (aLen == 0) i += 1 // stray char; never stall
        }
      }
    }
    // unterminated tag at EOF is still emitted (old behavior)
    res.name = name
    res.id = id
    res.cls = cls
    res.selfClosing = selfClosing
    if (ended) i else n
  }
}
