package graft.clean

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic rule-based HTML → text extraction — the stage crawl
  * corpora enter the pipeline through (every text operator downstream
  * assumes extracted text). Explicitly NOT a browser: a fixed, ordered
  * chain of regex rules, chosen so the IDENTICAL chain runs in Spark
  * (Java regex) and DuckDB (RE2) — every pattern avoids constructs the
  * two engines treat differently (no backreferences, which RE2 lacks;
  * only `(?is)` inline flags, lazy quantifiers, `\b`, and ASCII classes,
  * which agree).
  *
  * Rules, in order:
  *   0. collapse SOURCE whitespace runs (incl. formatting newlines) to
  *      one space — markup newlines are layout, not structure; after
  *      this rule the only newlines in the value are the block
  *      boundaries rule 5a inserts
  *   1. drop script / style / noscript elements WITH content
  *   2. drop HTML comments
  *   3. drop the head element (script/style inside it already gone)
  *   4. drop boilerplate chrome elements with content: nav, header,
  *      footer, aside — the nav-chrome/footer rules of a crawl extractor
  *   5a. block-boundary tags (open or close: p, br, li, div, h1–h6, tr)
  *      → one NEWLINE — the Gopher/CCNet "line" unit is the block
  *      element, so duplicate-LINE statistics and line-level dedup see
  *      real lines instead of a word-window proxy (round-9 verdict #3)
  *   5b. every other remaining tag → one space
  *   6. decode the fixed entity set &nbsp; &lt; &gt; &quot; &#39; &amp;
  *      (&amp; LAST, so "&amp;lt;" decodes to the literal "&lt;", not "<")
  *   7. line-aware whitespace normalization: whitespace runs containing
  *      a newline → one newline (no empty lines, no spaces at line
  *      edges), space runs within a line → one space, then strip
  *      leading/trailing whitespace
  *
  * Caveat (documented, deterministic): element-removal rules are
  * non-greedy first-close matches, so a nested same-tag element
  * (<header> inside <header>) truncates at the inner close — both
  * engines truncate identically. Real-world chrome is rarely nested;
  * content inside a removed element is gone by design.
  *
  * Shape at scale: one narrow per-row projection — zero exchanges,
  * whole-stage-codegen regexp chain — so extraction runs at the stream
  * door ([[graft.streaming.DocStreams.htmlExtracted]]) exactly as in
  * batch.
  */
object HtmlFns {

  /** (pattern, is-regex) rule chain, shared by both engine renderings. */
  private val dropElements = Seq("script", "style", "noscript")
  private val chromeElements = Seq("nav", "header", "footer", "aside")
  private val entities = Seq(
    "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
    "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")

  private def elem(tag: String): String = s"(?is)<$tag\\b[^>]*>.*?</$tag>"

  /** Open OR close tag of any block-level element: each is a line
    * boundary (rule 5a). `br` has no close; self-closing `<br/>` matches
    * via `[^>]*`.
    */
  private val blockTag = "(?is)</?(p|br|li|div|h[1-6]|tr)\\b[^>]*>"

  /** Extracted text of an HTML column — the Spark rendering. */
  def htmlToText(c: Column): Column = {
    var out = regexp_replace(c, "\\s+", " ")
    for (t <- dropElements) out = regexp_replace(out, elem(t), " ")
    out = regexp_replace(out, "(?s)<!--.*?-->", " ")
    out = regexp_replace(out, elem("head"), " ")
    for (t <- chromeElements) out = regexp_replace(out, elem(t), " ")
    out = regexp_replace(out, blockTag, "\n")
    out = regexp_replace(out, "(?s)<[^>]*>", " ")
    for ((e, r) <- entities) out = replace(out, lit(e), lit(r))
    out = regexp_replace(out, "\\s*\\n\\s*", "\n")
    out = regexp_replace(out, "[ ]+", " ")
    regexp_replace(out, "(^\\s+)|(\\s+$)", "")
  }

  /** The identical chain in DuckDB's dialect, for oracles. */
  def htmlToTextDuck(e: String): String = {
    var out = e
    def re(p: String, repl: String = "' '"): Unit =
      out = s"regexp_replace($out, '$p', $repl, 'g')"
    re("\\s+")
    for (t <- dropElements) re(elem(t))
    re("(?s)<!--.*?-->")
    re(elem("head"))
    for (t <- chromeElements) re(elem(t))
    re(blockTag, "chr(10)")
    re("(?s)<[^>]*>")
    for ((en, r) <- entities) {
      val rr = if (r == "'") "''" else r
      out = s"replace($out, '$en', '$rr')"
    }
    re("\\s*\\n\\s*", "chr(10)")
    re("[ ]+")
    s"regexp_replace($out, '(^\\s+)|(\\s+$$)', '', 'g')"
  }

  // ------------------------------------------- page-structure signals

  /** Anchor element with its inner markup as group 1 — anchors don't
    * nest (HTML forbids it), so the non-greedy first-close match is the
    * element.
    */
  private val anchorRe = "(?is)<a\\b[^>]*>(.*?)</a>"
  private val anchorOpenRe = "(?is)<a\\b[^>]*>"
  private val paraOpenRe = "(?is)<p\\b[^>]*>"

  /** Meta-robots noindex, matched attribute-order-sensitively (name
    * before content, the order every generator emits) — a deterministic
    * simplification documented like the nested-element caveat above.
    */
  private val noindexRe = "(?is)<meta\\b[^>]*robots[^>]*noindex[^>]*>"

  /** Count of anchor open tags. */
  def nAnchors(c: Column): Column =
    size(regexp_extract_all(c, lit(anchorOpenRe), lit(0))).cast("long")

  /** Total visible characters inside anchors (inner tags stripped) —
    * the numerator of LINK DENSITY, the classic boilerplate
    * discriminator (Kohlschütter et al. 2010, public): navigation/chrome
    * pages put most of their text in links, articles don't.
    */
  def anchorChars(c: Column): Column =
    coalesce(aggregate(
      transform(regexp_extract_all(c, lit(anchorRe), lit(1)),
        m => length(regexp_replace(m, "(?s)<[^>]*>", "")).cast("long")),
      lit(0L), (acc, x) => acc + x), lit(0L))

  /** Count of paragraph open tags. */
  def nParagraphs(c: Column): Column =
    size(regexp_extract_all(c, lit(paraOpenRe), lit(0))).cast("long")

  /** 1 if the page carries a meta-robots noindex directive. */
  def noindex(c: Column): Column =
    when(c.rlike(noindexRe), 1L).otherwise(0L)

  /** DuckDB twins of the four signals, over an HTML expression. */
  def nAnchorsDuck(e: String): String =
    s"CAST(len(regexp_extract_all($e, '$anchorOpenRe')) AS BIGINT)"
  def anchorCharsDuck(e: String): String =
    s"""CAST(COALESCE(list_sum(list_transform(
       |  regexp_extract_all($e, '$anchorRe', 1),
       |  m -> length(regexp_replace(m, '(?s)<[^>]*>', '', 'g')))), 0) AS BIGINT)""".stripMargin
  def nParagraphsDuck(e: String): String =
    s"CAST(len(regexp_extract_all($e, '$paraOpenRe')) AS BIGINT)"
  def noindexDuck(e: String): String =
    s"CAST(CASE WHEN regexp_matches($e, '$noindexRe') THEN 1 ELSE 0 END AS BIGINT)"
}
