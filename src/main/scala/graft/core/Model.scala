package graft.core

/** Core data model of the extraction engine (no Spark dependencies).
  *
  * Mirrors the reference's page/glyph/line data model (reference:
  * main/ocr.h:76-101) re-expressed for web payloads: the "glyph" becomes a
  * text [[Block]], the "page layout" a per-document `Vector[Block]`, and the
  * output surface is extracted text plus character-span offsets per url
  * (the analog of `.template` bbox rows, main/template.c:32-109).
  */
object Failure {
  val Ok = "ok"
  val Empty = "empty"
  val Unsupported = "unsupported_payload"
  val ParseError = "parse_error"
  val Oversize = "oversize"
  val all: Seq[String] = Seq(Ok, Empty, Unsupported, ParseError, Oversize)
}

/** Input row — exactly the BASELINE.json input_hint shape. */
final case class PageRow(
    url: String,
    warc_ts: java.sql.Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

/** Character-span offset into the extracted text (replaces the reference's
  * pixel bounding boxes, main/ocr.h:78-80). `end` exclusive. */
final case class Span(begin: Int, end: Int, kind: String)

/** Output row per document. */
final case class ExtractedRow(
    url: String,
    text: String,
    spans: Seq[Span],
    failure: String,
    n_blocks: Int,
    n_chars: Int,
    n_bytes_in: Long,
    lang: String)

/** Per-block classifier diagnostics row — the S9 `-T` feature-dump parity
  * surface (reference main/kd.c:225-235: per-glyph `(features, label)`
  * rows for classifier debugging). One row per CANDIDATE block, kept or
  * dropped, with the exact feature tuple the classifier saw. */
final case class BlockDiag(
    url: String,
    block_id: Int, // candidate index in document order
    label: String, // content/heading/list, or "dropped"
    kept: Boolean,
    words: Int,
    link_words: Int,
    tag_path: String,
    depth: Int)

/** Kind labels for spans/blocks. */
object BlockKind {
  val Content = "content"
  val Heading = "heading"
  val List = "list"
  val Line = "line" // PDF branch
}

/** A candidate text block produced by segmentation — the glyph/line analog
  * (reference glyph_t, main/ocr.h:76-87). Kept entirely inside the kernel,
  * never shuffled (reference frees lines per page, main/segment.c:1478-1512).
  *
  * @param text        raw concatenated text (pre-normalization)
  * @param words       whitespace-delimited word count
  * @param linkWords   words wholly/partly inside an <a>
  * @param tagPath     "/"-joined open block tags at creation (feature F1 analog)
  * @param depth       nesting depth of block-level elements
  * @param isHeading   h1..h6
  * @param isLi        list item
  * @param inBoilerContainer ancestor is nav/header/footer/aside/form or has a
  *                    boilerplate id/class (comment|sidebar|footer|nav|...)
  */
final case class Block(
    text: String,
    words: Int,
    linkWords: Int,
    tagPath: String,
    depth: Int,
    isHeading: Boolean,
    isLi: Boolean,
    inBoilerContainer: Boolean) {
  def linkDensity: Double = if (words == 0) 0.0 else linkWords.toDouble / words
}

/** Typed config — the analog of the reference's per-book flag bundles
  * (main/Makefile:684 `KAFKA = -H 600 -W 600 ...`; defaults main/ocr.h:44-69).
  * All thresholds documented; all deterministic.
  */
final case class ExtractorConfig(
    /** payloads larger than this are classified `oversize` (analog of
      * maxGlyphWidth/Height "it's a picture" caps, main/ocr.h:53-54) */
    maxPayloadBytes: Int = 2 * 1024 * 1024,
    /** hard cap on parsed HTML tokens per doc (analog MAXTREEDEPTH, ocr.h:56) */
    maxTokens: Int = 200000,
    /** link-density ceiling for content (Boilerpipe-class heuristic) */
    maxContentLinkDensity: Double = 0.33,
    /** minimum words for a standalone content block */
    minContentWords: Int = 10,
    /** fusion: short clean block between two content blocks is absorbed
      * (analog of classifier-guided combine, main/segment.c:999-1025) */
    fusionMaxWords: Int = 10,
    fusionMaxLinkDensity: Double = 0.1,
    fusionMinWords: Int = 3,
    /** fusion acceptance: true = score-compared (the reference's rule —
      * keep a merge only if the MERGED region's classification distance
      * does not exceed the worse neighbor, main/segment.c:999-1025);
      * false = the per-block word-count/link-density gate only (the
      * `-A alwaysCombine`-style override) */
    fusionScoreGate: Boolean = true,
    /** fission (wide-block split, G12 analog): a contiguous run of >= this
      * many fully-linked words inside a mixed block splits out (0 = off) */
    fissionMinLinkRun: Int = 4,
    fissionMinTextWords: Int = 10,
    /** languages that get BiDi visual reordering (reference RTL autodetect,
      * main/kd.c:700-711; fribidi reorder main/gtkDisplay.c:306-337) */
    rtlLangs: Set[String] = Set("he", "yi", "ar", "fa"),
    /** PDF assembly constants (T1-T3 analogs, main/gtkDisplay.c:202-365) */
    pdfSpaceFraction: Double = 0.6, // -s default 0.60, main/ocr.h:62
    pdfLineHeightFactor: Double = 1.2,
    pdfLineYTolerance: Double = 2.0,
    /** optional dictionary spell repair (P2, fixspell.pl) */
    spellRepair: Boolean = false,
    dictionary: Set[String] = Set.empty,
    /** which spell-repair pipeline: "latin" = the generalized OCR-confusion
      * mechanism; "yi" = the reference's fixspell.pl VERBATIM (regex
      * correction table, exact-match ok words, maqaf rejoin) */
    spellProfile: String = "latin")

object ExtractorConfig {
  val default: ExtractorConfig = ExtractorConfig()

  /** Per-corpus profiles — the analog of the reference's per-book flag
    * bundles (main/Makefile:684 `KAFKA = -H 600 -W 600 -d 10 ...`): tuning
    * is config selected by corpus, never code. */
  val profiles: Map[String, ExtractorConfig] = Map(
    "default" -> default,
    // news articles: long paragraphs, aggressive chrome stripping
    "news" -> default.copy(minContentWords = 12, maxContentLinkDensity = 0.25),
    // forums/comments corpora: short posts are the content — keep them,
    // and the "comments" id/class heuristic is wrong there by definition,
    // so fusion has to do more of the work
    "forum" -> default.copy(minContentWords = 5, fusionMaxWords = 16),
    // link-heavy reference/wiki pages: tolerate higher link density
    "wiki" -> default.copy(maxContentLinkDensity = 0.5, fissionMinLinkRun = 6),
    // strict dedup-corpus preparation: spell repair on
    "training-clean" -> default.copy(spellRepair = true),
    // Yiddish corpora: the reference's actual batch pipe
    // (main/Makefile:698-701 fixutf8 | fixspell): verbatim fixspell.pl
    // repair (dictionary supplied per corpus) over RTL assembly
    "yi" -> default.copy(spellRepair = true, spellProfile = "yi"))

  def profile(name: String): ExtractorConfig =
    profiles.getOrElse(name, default)
}
