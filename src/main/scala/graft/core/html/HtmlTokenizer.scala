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
  * Handles: tags with quoted/unquoted attributes, self-closing tags,
  * comments, doctype, CDATA, raw-text elements (script/style/noscript/
  * textarea — consumed until the matching close tag), and character
  * references (named subset + numeric).
  */
object HtmlTokenizer {

  sealed trait Token
  final case class StartTag(name: String, attrs: Map[String, String], selfClosing: Boolean) extends Token
  final case class EndTag(name: String) extends Token
  final case class Text(value: String) extends Token

  private val rawTextElements = Set("script", "style", "noscript", "textarea", "title")

  val voidElements: Set[String] = Set(
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr")

  /** Named character references we decode (the long tail falls through as
    * literal text, which is deterministic and harmless for extraction). */
  private val namedEntities: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> " ", "shy" -> "­", "mdash" -> "—",
    "ndash" -> "–", "hellip" -> "…", "copy" -> "©",
    "reg" -> "®", "trade" -> "™", "laquo" -> "«",
    "raquo" -> "»", "ldquo" -> "“", "rdquo" -> "”",
    "lsquo" -> "‘", "rsquo" -> "’", "middot" -> "·",
    "bull" -> "•", "deg" -> "°", "times" -> "×",
    "eacute" -> "é", "egrave" -> "è", "agrave" -> "à",
    "uuml" -> "ü", "ouml" -> "ö", "auml" -> "ä",
    "szlig" -> "ß", "ccedil" -> "ç")

  /** Decode character references in a text run. */
  def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 12) {
          val body = s.substring(i + 1, semi)
          if (body.startsWith("#x") || body.startsWith("#X")) {
            try {
              val cp = Integer.parseInt(body.substring(2), 16)
              if (Character.isValidCodePoint(cp)) { sb.appendCodePoint(cp); i = semi + 1 }
              else { sb.append(c); i += 1 }
            } catch { case _: NumberFormatException => sb.append(c); i += 1 }
          } else if (body.startsWith("#")) {
            try {
              val cp = Integer.parseInt(body.substring(1))
              if (Character.isValidCodePoint(cp)) { sb.appendCodePoint(cp); i = semi + 1 }
              else { sb.append(c); i += 1 }
            } catch { case _: NumberFormatException => sb.append(c); i += 1 }
          } else namedEntities.get(body) match {
            case Some(rep) => sb.append(rep); i = semi + 1
            case None => sb.append(c); i += 1
          }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Tokenize. `maxTokens` bounds work on pathological pages (the analog of
    * the reference's size caps, main/ocr.h:53-56); excess input is dropped.
    * Returns an array-backed IndexedSeq (the segmenter iterates by index —
    * measurably cheaper than Vector dispatch in the kernel hot loop).
    */
  def tokenize(html: String, maxTokens: Int = Int.MaxValue): IndexedSeq[Token] = {
    val out = new ArrayBuffer[Token](256)
    val n = html.length
    var i = 0
    var textStart = 0

    def flushText(until: Int): Unit =
      if (until > textStart) out += Text(html.substring(textStart, until))

    while (i < n && out.length < maxTokens) {
      val lt = html.indexOf('<', i)
      if (lt < 0) { flushText(n); i = n; textStart = n }
      else {
        if (lt + 1 >= n) { flushText(n); i = n; textStart = n }
        else {
          val next = html.charAt(lt + 1)
          if (next == '!') {
            flushText(lt)
            if (html.startsWith("<!--", lt)) {
              val end = html.indexOf("-->", lt + 4)
              i = if (end < 0) n else end + 3
            } else if (html.regionMatches(true, lt, "<![CDATA[", 0, 9)) {
              val end = html.indexOf("]]>", lt + 9)
              i = if (end < 0) n else end + 3
            } else { // doctype / other declaration
              val end = html.indexOf('>', lt + 1)
              i = if (end < 0) n else end + 1
            }
            textStart = i
          } else if (next == '?') { // processing instruction
            flushText(lt)
            val end = html.indexOf('>', lt + 1)
            i = if (end < 0) n else end + 1
            textStart = i
          } else if (next == '/') {
            flushText(lt)
            val end = html.indexOf('>', lt + 2)
            if (end < 0) { i = n; textStart = n }
            else {
              val name = html.substring(lt + 2, end).trim.toLowerCase
              if (name.nonEmpty && name.forall(ch => ch.isLetterOrDigit))
                out += EndTag(name)
              i = end + 1; textStart = i
            }
          } else if (Character.isLetter(next)) {
            flushText(lt)
            parseStartTag(html, lt) match {
              case Some((tag, after)) =>
                out += tag
                i = after
                // raw-text elements: skip to the matching close tag
                if (!tag.selfClosing && rawTextElements.contains(tag.name)) {
                  val close = indexOfCloseTag(html, i, tag.name)
                  if (tag.name == "title") {
                    val end = if (close < 0) n else close
                    if (end > i) out += Text(html.substring(i, end))
                  }
                  if (close < 0) { i = n }
                  else {
                    out += EndTag(tag.name)
                    val gtc = html.indexOf('>', close)
                    i = if (gtc < 0) n else gtc + 1
                  }
                }
                textStart = i
              case None => // not a real tag; treat '<' as text
                i = lt + 1
                // keep textStart where it was: the '<' stays in the text run
            }
          } else { // stray '<'
            i = lt + 1
          }
        }
      }
    }
    // If we bailed out mid-text because of maxTokens, nothing more to flush;
    // a flush can overshoot by one — trim to the strict bound.
    val trimmed = if (out.length > maxTokens) out.take(maxTokens) else out
    scala.collection.immutable.ArraySeq.unsafeWrapArray(trimmed.toArray)
  }

  /** Case-insensitive search for `</name` at a token boundary. */
  private def indexOfCloseTag(html: String, from: Int, name: String): Int = {
    val needle = "</" + name
    val n = html.length
    var i = from
    while (i <= n - needle.length) {
      if (html.regionMatches(true, i, needle, 0, needle.length)) {
        val after = i + needle.length
        if (after >= n) return i
        val c = html.charAt(after)
        if (c == '>' || c.isWhitespace || c == '/') return i
      }
      i += 1
    }
    -1
  }

  /** Parse a start tag beginning at `lt` (which points at '<').
    * Returns the token and the index just past '>'. None if malformed. */
  private def parseStartTag(html: String, lt: Int): Option[(StartTag, Int)] = {
    val n = html.length
    var i = lt + 1
    val nameStart = i
    while (i < n && (html.charAt(i).isLetterOrDigit)) i += 1
    if (i == nameStart) return None
    val name = html.substring(nameStart, i).toLowerCase
    var attrs = Map.empty[String, String]
    var selfClosing = false
    var done = false
    while (!done && i < n) {
      // skip whitespace
      while (i < n && html.charAt(i).isWhitespace) i += 1
      if (i >= n) return Some((StartTag(name, attrs, selfClosing = false), n))
      val c = html.charAt(i)
      if (c == '>') { i += 1; done = true }
      else if (c == '/' && i + 1 < n && html.charAt(i + 1) == '>') {
        selfClosing = true; i += 2; done = true
      } else if (c == '<') {
        // malformed: new tag opens before this one closes — end it here
        done = true
      } else {
        // attribute. Only `id` and `class` are ever consumed downstream
        // (boilerplate-container detection) — other values are scanned past
        // without materializing, which at 10^5 tags/doc is the difference
        // between one Map per tag and zero allocations per tag.
        val aStart = i
        while (i < n && { val ch = html.charAt(i); !ch.isWhitespace && ch != '=' && ch != '>' && ch != '/' }) i += 1
        val aLen = i - aStart
        val wanted =
          (aLen == 2 && html.regionMatches(true, aStart, "id", 0, 2)) ||
          (aLen == 5 && html.regionMatches(true, aStart, "class", 0, 5))
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
                if (wanted) attrs += (html.substring(aStart, aStart + aLen).toLowerCase ->
                  decodeEntities(html.substring(i + 1, if (gt < 0) n else gt)))
                i = if (gt < 0) n else gt
              } else {
                if (wanted) attrs += (html.substring(aStart, aStart + aLen).toLowerCase ->
                  decodeEntities(html.substring(i + 1, vEnd)))
                i = vEnd + 1
              }
            } else {
              val vStart = i
              while (i < n && { val ch = html.charAt(i); !ch.isWhitespace && ch != '>' }) i += 1
              if (wanted) attrs += (html.substring(aStart, aStart + aLen).toLowerCase ->
                decodeEntities(html.substring(vStart, i)))
            }
          }
        } else if (aLen == 0) i += 1 // stray char; advance to avoid infinite loop
      }
    }
    Some((StartTag(name, attrs, selfClosing), i))
  }
}
