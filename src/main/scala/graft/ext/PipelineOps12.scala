package graft.ext

import graft.{Probe, Tables}
import graft.clean.{CleanFns, HtmlFns}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Round-9 additions (seventh wave): HTML → text extraction — the stage
  * crawl corpora enter the pipeline through. Every text operator so far
  * assumed extracted text; these probes pin the extractor itself
  * (rule-by-rule, cross-engine) and its composition with the quality
  * layer, on synthetic crawl pages built deterministically from the
  * documents table INSIDE the query, so both engines extract from
  * byte-identical HTML.
  */
object PipelineOps12 {

  /** The synthetic crawl page: real chrome shapes (nav with links, a
    * header banner, a tracking comment, an aside, an entity-bearing
    * footer) around the document text, plus an entity-bearing content
    * paragraph that must SURVIVE extraction. Shared template string —
    * Spark renders it with concat, the oracle with `||` — so the two
    * engines cannot drift.
    */
  private val pageParts = Seq(
    "<html><head><title>Doc ",                                    // + doc_id
    "</title><style>p{margin:0}</style><script>var t=\"<p>\";</script></head>" +
      "<body><nav><a href=\"/\">Home</a> | <a href=\"/about\">About</a></nav>" +
      "<header><h1>Corpus site</h1></header><!-- trk ",           // + doc_id
    " --><article><p>",                                           // + text
    "</p><p>Tom &amp; Jerry &lt;3 say &quot;hi&quot;&nbsp;&#39;ok&#39;</p>" +
      "</article><aside>Related links</aside>" +
      "<footer>&copy; 2026 Example &amp; Co.</footer></body></html>")

  /** (doc_id, lang, html): the synthetic crawl frame, Spark rendering. */
  private[ext] def crawlPages(docs: DataFrame): DataFrame = docs.select(
    col("doc_id"), col("lang"),
    concat(
      lit(pageParts(0)), col("doc_id").cast("string"),
      lit(pageParts(1)), col("doc_id").cast("string"),
      lit(pageParts(2)), col("text"),
      lit(pageParts(3))).as("html"))

  /** The identical page expression in DuckDB's dialect. */
  private[ext] def crawlHtmlDuck: String = pageParts.map(p => "'" + p.replace("'", "''") + "'")
    .zipAll(Seq("CAST(doc_id AS VARCHAR)", "CAST(doc_id AS VARCHAR)", "text"), "", "")
    .map { case (l, r) => if (r.isEmpty) l else s"$l || $r" }.mkString(" || ")

  /** X-HTML1 — HTML → text extraction over synthetic crawl pages:
    * script/style/head/comment/chrome drops, tag strip, entity decode,
    * whitespace collapse — the full [[HtmlFns]] rule chain, pinned
    * cross-engine rule for rule (both sides run the SAME ordered regex
    * chain on byte-identical pages). Extraction is one narrow codegen
    * projection: zero exchanges at any corpus size.
    */
  private val html1 = Probe(
    "x_html1_extract",
    s"""WITH h AS (
       |  SELECT doc_id, $crawlHtmlDuck AS html FROM documents),
       |x AS (SELECT doc_id, ${HtmlFns.htmlToTextDuck("html")} AS text FROM h)
       |SELECT doc_id, text,
       |  CAST(len(${CleanFns.tokensDuck("text")}) AS BIGINT) AS n_words
       |FROM x ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val pages = crawlPages(Tables.spread(s, dir, "documents"))
    graft.api.Corpus.fromHtml(pages).df
      .select(col("doc_id"), col("text"),
        size(CleanFns.tokens(col("text"))).cast("long").as("n_words"))
      .orderBy("doc_id")
  }

  /** X-HTML2 — extraction COMPOSED with the quality layer: crawl pages →
    * [[graft.api.Corpus.fromHtml]] → quality-rule gate → per-language
    * release rollup. Pins the interaction a real ingest hits: the gate's
    * word/char statistics are computed on EXTRACTED text (chrome words
    * must not count toward length or stopword signals), and the injected
    * entity paragraph shifts every document's stats identically in both
    * engines.
    */
  private val html2 = Probe(
    "x_html2_extract_gate",
    s"""WITH h AS (
       |  SELECT doc_id, lang, $crawlHtmlDuck AS html FROM documents),
       |x AS (SELECT doc_id, lang, ${HtmlFns.htmlToTextDuck("html")} AS text FROM h),
       |t AS (
       |  SELECT doc_id, lang, list_filter(string_split_regex(lower(text), '\\s+'), tkn -> tkn <> '') AS w
       |  FROM x),
       |m AS (
       |  SELECT doc_id, lang,
       |    CAST(len(w) AS BIGINT) AS n_words,
       |    CASE WHEN CAST(len(w) AS BIGINT) BETWEEN 10 AND 100000
       |          AND CAST(list_sum(list_transform(w, x -> length(x))) * 100 // nullif(len(w), 0) AS BIGINT) BETWEEN 200 AND 1000
       |          AND CAST(len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) * 1000000 // nullif(len(w), 0) AS BIGINT) >= 600000
       |          AND len(list_filter(w, x -> list_contains(['the','and','of','to','a','in','is','that'], x))) >= 2
       |         THEN 1 ELSE 0 END AS keep
       |  FROM t)
       |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(keep) AS BIGINT) AS n_kept,
       |  CAST(SUM(n_words) AS BIGINT) AS n_words
       |FROM m GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
    val pages = crawlPages(Tables(s, dir, "documents"))
    val extracted = graft.api.Corpus.fromHtml(pages).df
    PipelineOps3.addQualityRuleSignals(extracted.select(col("doc_id"), col("lang"), col("text")))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("keep")).cast("long").as("n_kept"),
        sum(col("n_words")).cast("long").as("n_words"))
      .orderBy("lang")
  }

  /** The planted duplicated-chrome page of x_html3: a promo paragraph
    * repeated above AND below the article body — the boilerplate shape
    * (subscribe banners, cookie notices) that line-level statistics are
    * designed to catch. Shared template, rendered by both engines.
    */
  private val promoPage = (
    "<html><body><p>Subscribe to our newsletter today</p><div>",
    "</div><p>Subscribe to our newsletter today</p></body></html>")

  /** X-HTML3 — duplicate-LINE statistics on block-structured extraction
    * (round-9 verdict #3's "done" probe): pages carry a planted promo
    * paragraph twice; extraction preserves block boundaries as newlines,
    * so line-aware segmentation ([[PipelineOps8.segmentsAuto]]) counts
    * the repeated promo LINE (`dup_line_ppm` > 0 for every page), while
    * the 16-word-window proxy ([[PipelineOps8.segments]]) straddles the
    * promo/body boundaries and misses it. Both counts are produced and
    * oracle-checked side by side; HtmlFnsSpec asserts the planted
    * catch/miss contrast.
    */
  private val html3 = Probe(
    "x_html3_dup_lines",
    s"""WITH h AS (
       |  SELECT doc_id, '${promoPage._1}' || text || '${promoPage._2}' AS html
       |  FROM documents),
       |x AS (SELECT doc_id, ${HtmlFns.htmlToTextDuck("html")} AS text FROM h),
       |t AS (SELECT doc_id, text, ${CleanFns.tokensDuck("text")} AS ws FROM x),
       |ln AS (SELECT doc_id, ${PipelineOps8.segsAutoDuck} AS segs FROM t),
       |lc AS (
       |  SELECT doc_id, substr(md5(seg), 1, 16) AS g, COUNT(*) AS c
       |  FROM ln, UNNEST(segs) AS u(seg) GROUP BY 1, 2),
       |lstat AS (
       |  SELECT doc_id, SUM(c) AS n_lines,
       |         SUM(c - 1) * 1000000 // SUM(c) AS dup_line_ppm
       |  FROM lc GROUP BY doc_id),
       |wsg AS (
       |  SELECT doc_id, ${PipelineOps8.segsDuck} AS segs FROM t WHERE len(ws) > 0),
       |wc AS (
       |  SELECT doc_id, substr(md5(seg), 1, 16) AS g, COUNT(*) AS c
       |  FROM wsg, UNNEST(segs) AS u(seg) GROUP BY 1, 2),
       |wstat AS (
       |  SELECT doc_id, SUM(c) AS n_word_segs,
       |         SUM(c - 1) * 1000000 // SUM(c) AS dup_word_ppm
       |  FROM wc GROUP BY doc_id)
       |SELECT lstat.doc_id,
       |  CAST(n_lines AS BIGINT) AS n_lines,
       |  CAST(dup_line_ppm AS BIGINT) AS dup_line_ppm,
       |  CAST(n_word_segs AS BIGINT) AS n_word_segs,
       |  CAST(dup_word_ppm AS BIGINT) AS dup_word_ppm
       |FROM lstat JOIN wstat ON wstat.doc_id = lstat.doc_id
       |ORDER BY lstat.doc_id""".stripMargin) { (s, dir) =>
    // ONE extraction pass (the regex chain is the probe's real cost) and
    // ONE tagged digest-keyed explode serving both granularities — the
    // two-branch oracle above is the plain relational form this fused
    // plan is hash-pinned against. Segments shuffle as 16-hex digests
    // (mirrored in the oracle), never raw line text.
    val pages = Tables(s, dir, "documents").select(col("doc_id"),
      concat(lit(promoPage._1), col("text"), lit(promoPage._2)).as("html"))
    val x = graft.api.Corpus.fromHtml(pages).df
    val tagged = x
      .select(col("doc_id"), col("text"), CleanFns.tokens(col("text")).as("ws"))
      .select(col("doc_id"), explode(expr(
        s"""concat(
           |  transform(${PipelineOps8.segsAutoSparkSql},
           |    sg -> named_struct('t', 'L', 'g', substring(md5(sg), 1, 16))),
           |  transform(CASE WHEN size(ws) > 0 THEN ${PipelineOps8.segsSparkSql}
           |                 ELSE filter(array(''), sg -> false) END,
           |    sg -> named_struct('t', 'W', 'g', substring(md5(sg), 1, 16))))""".stripMargin)).as("p"))
      .select(col("doc_id"), col("p.t").as("t"), col("p.g").as("g"))
    tagged
      .groupBy("doc_id", "t", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(
        coalesce(sum(when(col("t") === "L", col("c"))), lit(0L)).cast("long").as("n_lines"),
        expr("sum(CASE WHEN t = 'L' THEN c - 1 END) * 1000000" +
          " DIV sum(CASE WHEN t = 'L' THEN c END)").as("dup_line_ppm"),
        coalesce(sum(when(col("t") === "W", col("c"))), lit(0L)).cast("long").as("n_word_segs"),
        expr("sum(CASE WHEN t = 'W' THEN c - 1 END) * 1000000" +
          " DIV sum(CASE WHEN t = 'W' THEN c END)").as("dup_word_ppm"))
      .filter(col("n_lines") > 0 && col("n_word_segs") > 0)
      .orderBy("doc_id")
  }

  /** X-HTML4 — page-STRUCTURE signals: anchor count, anchor text mass,
    * paragraph count, meta-robots noindex, extracted-text length, and
    * LINK DENSITY (anchor chars per million extracted chars) — the
    * boilerplate-page discriminator (Kohlschütter et al. 2010: chrome
    * pages put their text in links) plus the politeness gate every crawl
    * must respect (noindex pages don't enter the corpus). Pages extend
    * the crawl template with a per-doc article anchor, a terms-of-service
    * footer link, and a noindex directive on every 5th doc, so all four
    * signals vary. One narrow regex projection — zero exchanges.
    */
  private val html4 = Probe(
    "x_html4_structure_signals",
    s"""WITH h AS (
       |  SELECT doc_id,
       |    '<html><head><title>D' || CAST(doc_id AS VARCHAR) ||
       |    (CASE WHEN doc_id % 5 = 0
       |          THEN '</title><meta name="robots" content="noindex,nofollow">'
       |          ELSE '</title>' END) ||
       |    '</head><body><nav><a href="/">Home</a> <a href="/a">About</a></nav><article><p>' ||
       |    text ||
       |    '</p><p><a href="/more">Read more about doc ' || CAST(doc_id AS VARCHAR) ||
       |    ' and related documents</a></p></article>' ||
       |    '<footer><a href="/tos">Terms of service</a></footer></body></html>' AS html
       |  FROM documents),
       |sg AS (
       |  SELECT doc_id,
       |    ${HtmlFns.nAnchorsDuck("html")} AS n_anchors,
       |    ${HtmlFns.anchorCharsDuck("html")} AS anchor_chars,
       |    ${HtmlFns.nParagraphsDuck("html")} AS n_paragraphs,
       |    ${HtmlFns.noindexDuck("html")} AS noindex,
       |    CAST(length(${HtmlFns.htmlToTextDuck("html")}) AS BIGINT) AS text_chars
       |  FROM h)
       |SELECT doc_id, n_anchors, anchor_chars, n_paragraphs, noindex, text_chars,
       |  CAST(anchor_chars * 1000000 // nullif(text_chars, 0) AS BIGINT) AS link_density_ppm
       |FROM sg ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val pages = Tables(s, dir, "documents").select(col("doc_id"),
      concat(
        lit("<html><head><title>D"), col("doc_id").cast("string"),
        when(col("doc_id") % 5 === 0,
          lit("</title><meta name=\"robots\" content=\"noindex,nofollow\">"))
          .otherwise(lit("</title>")),
        lit("</head><body><nav><a href=\"/\">Home</a> <a href=\"/a\">About</a></nav><article><p>"),
        col("text"),
        lit("</p><p><a href=\"/more\">Read more about doc "), col("doc_id").cast("string"),
        lit(" and related documents</a></p></article>"),
        lit("<footer><a href=\"/tos\">Terms of service</a></footer></body></html>")).as("html"))
    pages
      .select(col("doc_id"),
        HtmlFns.nAnchors(col("html")).as("n_anchors"),
        HtmlFns.anchorChars(col("html")).as("anchor_chars"),
        HtmlFns.nParagraphs(col("html")).as("n_paragraphs"),
        HtmlFns.noindex(col("html")).as("noindex"),
        length(HtmlFns.htmlToText(col("html"))).cast("long").as("text_chars"))
      .withColumn("link_density_ppm",
        expr("anchor_chars * 1000000 DIV nullif(text_chars, 0)"))
      .orderBy("doc_id")
  }

  /** X-SKT6 — the join ADVISOR wired to the x_skt4 primitive
    * ([[graft.util.Scale.adviseJoin]]): side counts, count-min join-size
    * estimate, per-side heaviest-key upper bounds, and the
    * broadcast/salt/shuffle verdict for lineitem ⋈ orders — every number
    * AND the strategy string recomputed relationally by the oracle
    * (thresholds here force the non-broadcast path so the skew rule is
    * exercised; ScaleSpec drives all three branches on planted shapes
    * against actual join plans).
    */
  private val skt6 = Probe(
    "x_skt6_join_advice",
    s"""WITH la AS (SELECT CAST(l_orderkey AS VARCHAR) AS k FROM lineitem),
       |ob AS (SELECT CAST(o_orderkey AS VARCHAR) AS k FROM orders),
       |ca AS (
       |  SELECT r, slot, COUNT(*) AS c FROM (
       |    SELECT 0 AS r, substr(md5(k), 1, 4) AS slot FROM la
       |    UNION ALL SELECT 1, substr(md5(k), 5, 4) FROM la
       |    UNION ALL SELECT 2, substr(md5(k), 9, 4) FROM la)
       |  GROUP BY r, slot),
       |cb AS (
       |  SELECT r, slot, COUNT(*) AS c FROM (
       |    SELECT 0 AS r, substr(md5(k), 1, 4) AS slot FROM ob
       |    UNION ALL SELECT 1, substr(md5(k), 5, 4) FROM ob
       |    UNION ALL SELECT 2, substr(md5(k), 9, 4) FROM ob)
       |  GROUP BY r, slot),
       |sa AS (SELECT MIN(n) AS n, MIN(mx) AS mx
       |       FROM (SELECT r, SUM(c) AS n, MAX(c) AS mx FROM ca GROUP BY r)),
       |sb AS (SELECT MIN(n) AS n, MIN(mx) AS mx
       |       FROM (SELECT r, SUM(c) AS n, MAX(c) AS mx FROM cb GROUP BY r)),
       |ip AS (SELECT MIN(dot) AS est FROM (
       |  SELECT ca.r, SUM(ca.c * cb.c) AS dot
       |  FROM ca JOIN cb ON ca.r = cb.r AND ca.slot = cb.slot GROUP BY ca.r))
       |SELECT CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
       |  CAST(COALESCE(ip.est, 0) AS BIGINT) AS est_join,
       |  CAST(sa.mx AS BIGINT) AS max_key_a, CAST(sb.mx AS BIGINT) AS max_key_b,
       |  CASE WHEN LEAST(sa.n, sb.n) <= 1000
       |         THEN CASE WHEN sa.n <= sb.n THEN 'broadcast_a' ELSE 'broadcast_b' END
       |       WHEN sa.mx * 32 >= 8 * sa.n OR sb.mx * 32 >= 8 * sb.n THEN 'salt'
       |       ELSE 'shuffle' END AS strategy
       |FROM sa, sb, ip ORDER BY n_a""".stripMargin) { (s, dir) =>
    import s.implicits._
    val adv = graft.util.Scale.adviseJoin(
      Tables(s, dir, "lineitem"), "l_orderkey",
      Tables(s, dir, "orders"), "o_orderkey",
      broadcastMaxRows = 1000L, skewRatio = 8L)
    Seq(adv).toDS().select(
      col("nA").as("n_a"), col("nB").as("n_b"), col("estJoin").as("est_join"),
      col("maxKeyA").as("max_key_a"), col("maxKeyB").as("max_key_b"),
      col("strategy"))
      .orderBy("n_a")
  }

  /** X-PACK5 — length batching under a SUBSTITUTED token denominator:
    * `n_tok_bpe` is planted as strlen(text) DIV 4 (a SQL-expressible
    * subword-count stand-in), and the oracle computes the batch layout
    * from the same expression. A hash match is only possible if
    * [[PipelineOps7.lengthBatches]] actually routes through the column —
    * the whitespace denominator would bucket every document differently.
    * (The REAL BPE denominator is the same code path with bpe_count's
    * output; x_tok1 pins that count, PipelineOps7Spec pins the
    * composition.)
    */
  private val pack5 = Probe(
    "x_pack5_bpe_denominated",
    """WITH d AS (
      |  SELECT doc_id, CAST(strlen(text) // 4 AS BIGINT) AS n_tok FROM documents),
      |b AS (
      |  SELECT doc_id, n_tok, n_tok // 16 AS bucket,
      |         (row_number() OVER (PARTITION BY n_tok // 16 ORDER BY n_tok, doc_id) - 1) // 8 AS batch
      |  FROM d)
      |SELECT bucket, batch, CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(max(n_tok) AS BIGINT) AS max_tok,
      |       CAST(sum(n_tok) AS BIGINT) AS sum_tok,
      |       CAST(count(*) * max(n_tok) - sum(n_tok) AS BIGINT) AS pad_waste
      |FROM b GROUP BY bucket, batch ORDER BY bucket, batch""".stripMargin) { (s, dir) =>
    PipelineOps7.lengthBatches(
      Tables(s, dir, "documents")
        .withColumn("n_tok_bpe", expr("CAST(octet_length(text) DIV 4 AS BIGINT)")))
      .orderBy("bucket", "batch")
  }

  /** X-MIX4 — the greedy token budget under the same substituted subword
    * denominator: `Corpus.takeTokenBudget` must fill against
    * `n_tok_bpe`, not whitespace words, when the column is present. The
    * oracle is x_mix3's single-window algebra with the substituted count
    * (sharded ≡ single window is already pinned by x_mix3b).
    */
  private val mix4 = Probe(
    "x_mix4_budget_bpe_denominated",
    """WITH d AS (
      |  SELECT doc_id, lang, CAST(strlen(text) // 4 AS BIGINT) AS n_tok FROM documents),
      |c AS (
      |  SELECT doc_id, lang, n_tok,
      |         sum(n_tok) OVER (PARTITION BY lang
      |                          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
      |                          ROWS UNBOUNDED PRECEDING) AS cum_tok
      |  FROM d)
      |SELECT doc_id, lang, n_tok, CAST(cum_tok AS BIGINT) AS cum_tok
      |FROM c WHERE cum_tok <= 2000 ORDER BY doc_id""".stripMargin) { (s, dir) =>
    graft.api.Corpus(
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("text"))
        .withColumn("n_tok_bpe", expr("CAST(octet_length(text) DIV 4 AS BIGINT)")))
      .takeTokenBudget(budget = 2000L)
      .df
      .select(col("doc_id"), col("lang"), col("n_tok_bpe").as("n_tok"), col("cum_tok"))
      .orderBy("doc_id")
  }

  val all: Seq[Probe] = Seq(html1, html2, html3, html4, skt6, pack5, mix4)
}
