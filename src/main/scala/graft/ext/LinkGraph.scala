package graft.ext

import graft.{Probe, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** The LINK-GRAPH tier of crawl planning: anchor extraction from raw
  * HTML → href resolution → canonical page-pair edges → host-level
  * graph → fixed-iteration PageRank (Brin–Page 1998, the public
  * algorithm) in exact integer arithmetic. Crawl schedulers rank hosts
  * by link centrality to decide fetch priority and recrawl budget
  * (CommonCrawl publishes exactly such host-level rank tables); until
  * this tier the frontier ordered hosts only by politeness and caps.
  *
  * Scale shape: extraction is one narrow regex projection + explode
  * (zero pre-shuffle state); the page-pair dedup and the host rollup
  * are each ONE exchange on their key; each PageRank iteration is one
  * host-keyed join + aggregation over the HOST graph — orders of
  * magnitude smaller than the page corpus — with per-iteration
  * materialization cutting the lineage tower (the
  * [[Dedup.connectedComponents]] discipline).
  *
  * Cross-engine exactness: ranks are parts-per-billion integers;
  * per-edge contributions use truncating division (`DIV` / `//` — both
  * engines truncate toward zero on non-negatives), so every sum is an
  * exact integer sum, order-independent under any shuffle. A float
  * PageRank could never hash-match across engines.
  */
object LinkGraph {

  /** Anchor-href extraction regex — group 1 is the attribute value.
    * Double-quoted hrefs only (the overwhelmingly dominant form; the
    * fixture uses it exclusively); evaluates identically under Java
    * regex and RE2 (lazy quantifier, `\b`, ASCII classes).
    */
  private[ext] val hrefRe = "(?is)<a\\b[^>]*?\\bhref\\s*=\\s*\"([^\"]*)\""
  private[ext] val hrefReDuck = "(?is)<a\\b[^>]*?\\bhref\\s*=\\s*\"([^\"]*)\""

  /** Resolve one href against its page URL — the deterministic subset
    * of RFC 3986 reference resolution a host-graph needs:
    *
    *   - absolute (`scheme://…`) → kept as-is (http/https only, checked
    *     after resolution);
    *   - scheme-relative (`//host/…`) → page scheme prepended;
    *   - path-absolute (`/…`) → page `scheme://host` prepended;
    *   - anything else (relative paths, `mailto:`, `javascript:`,
    *     fragments, empty) → NULL (dropped). Relative-path resolution
    *     needs dot-segment merging (RFC 3986 §5.2.4) — stateful and
    *     rarely load-bearing for HOST-level edges, so it is explicitly
    *     out of the rule chain.
    *
    * The href must already be entity-decoded where it came from HTML
    * ([[extractLinks]]/[[anchorTexts]] do this): resolution itself is
    * markup-agnostic — an HTTP Location header fed through this chain
    * ([[Frontier.redirectEdges]]) may legitimately contain a literal
    * `&amp;`, and decoding here would corrupt it.
    */
  def resolveHref(pageUrl: Column, href: Column): Column = {
    val scheme = regexp_extract(lower(pageUrl), "^([a-z][a-z0-9+.-]*)://", 1)
    val prefix = regexp_extract(pageUrl, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    val resolved = when(href.rlike("^[A-Za-z][A-Za-z0-9+.-]*://"), href)
      .when(href.startsWith("//"), concat(scheme, lit(":"), href))
      .when(href.startsWith("/"), concat(prefix, href))
      .otherwise(lit(null).cast("string"))
    when(resolved.rlike("^(?i)https?://"), resolved)
      .otherwise(lit(null).cast("string"))
  }

  /** The identical resolution chain in DuckDB's dialect (like the
    * Spark form, expects an already-entity-decoded href).
    */
  def resolveHrefDuck(pageUrl: String, href: String): String = {
    val scheme = s"regexp_extract(lower($pageUrl), '^([a-z][a-z0-9+.-]*)://', 1)"
    val prefix = s"regexp_extract($pageUrl, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1)"
    s"""(CASE WHEN regexp_matches(CASE
       |    WHEN regexp_matches($href, '^[A-Za-z][A-Za-z0-9+.-]*://') THEN $href
       |    WHEN starts_with($href, '//') THEN $scheme || ':' || $href
       |    WHEN starts_with($href, '/') THEN $prefix || $href
       |    ELSE NULL END, '^(?i)https?://')
       |  THEN CASE
       |    WHEN regexp_matches($href, '^[A-Za-z][A-Za-z0-9+.-]*://') THEN $href
       |    WHEN starts_with($href, '//') THEN $scheme || ':' || $href
       |    WHEN starts_with($href, '/') THEN $prefix || $href
       |    ELSE NULL END
       |  ELSE NULL END)""".stripMargin
  }

  /** Hostname of a canonical URL. */
  private def hostOf(c: Column): Column =
    regexp_extract(c, "^[a-z0-9+.-]+://([^/:?#]+)", 1)

  /** Extract and resolve every anchor from `(urlCol, htmlCol)` pages:
    * one row per KEPT link — (src, dst, src_host, dst_host), both
    * endpoints canonicalized ([[graft.clean.UrlFns.canonicalUrl]], so
    * tracking-param variants of the same target collapse). Narrow
    * regex + explode; no exchange.
    */
  def extractLinks(pages: DataFrame, urlCol: String = "url",
      htmlCol: String = "html"): DataFrame = {
    val raw = pages
      .select(col(urlCol).as("__u"),
        explode(regexp_extract_all(col(htmlCol), lit(hrefRe), lit(1))).as("__href"))
      // entity-decode AT the HTML layer (conformant markup escapes & as
      // &amp; inside attribute values); resolveHref itself stays
      // markup-agnostic so the redirect tier can reuse it on raw headers
      .select(col("__u"),
        resolveHref(col("__u"),
          regexp_replace(col("__href"), "&amp;", "&")).as("__r"))
      .filter(col("__r").isNotNull)
    val canon = raw.select(
      graft.clean.UrlFns.canonicalUrl(col("__u")).as("src"),
      graft.clean.UrlFns.canonicalUrl(col("__r")).as("dst"))
    canon.select(col("src"), col("dst"),
      hostOf(col("src")).as("src_host"), hostOf(col("dst")).as("dst_host"))
  }

  /** Host-level edge list from extracted links: page-pair duplicates
    * collapse FIRST (the same template link on every page of a host
    * must weigh by distinct target pages, not by page count), then the
    * host rollup counts distinct page pairs per (src_host, dst_host).
    * Self-edges drop — intra-host navigation is chrome, not
    * endorsement. Two key-locality exchanges total.
    */
  def hostGraph(links: DataFrame): DataFrame =
    links.select("src", "dst", "src_host", "dst_host").distinct()
      .filter(col("src_host") =!= col("dst_host"))
      .groupBy(col("src_host").as("src"), col("dst_host").as("dst"))
      .agg(count(lit(1)).as("n_pairs"))

  /** Fixed-iteration PageRank over a directed host edge list
    * (unweighted; `edges` needs columns src/dst, extra columns are
    * ignored, duplicate and self edges are dropped defensively).
    *
    * Exact-integer formulation (damping 0.85, rank mass 1e9 ppb):
    *   r0(v)   = 1e9 DIV n
    *   contrib = r(u) DIV out_deg(u)          per out-edge of u
    *   r'(v)   = (15% of 1e9) DIV n + (85 · Σ contrib) DIV 100
    * Dangling hosts contribute nothing (the classic simplified PR;
    * deterministic in both engines), no-inbound hosts hold teleport.
    * Truncating integer division end to end — order-independent sums,
    * immune to shuffle nondeterminism, and identical in DuckDB.
    *
    * Each iteration materializes (persist + count + plan reset) so the
    * analyzer never re-walks a k-deep join tower and a failed executor
    * recomputes one iteration, not the whole chain.
    */
  def pageRankHosts(edges0: DataFrame, iters: Int = 5,
      localMaxEdges: Long = 1000000L): DataFrame = {
    val s = edges0.sparkSession
    def reset(df: DataFrame): DataFrame = s.createDataFrame(df.rdd, df.schema)
    val edgesC = edges0.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nE = edgesC.count()
    if (nE == 0) {
      // fail BEFORE registering more cache entries, and drop the one
      // already made — a driver catching this and retrying must not
      // accumulate persisted frames (the no-leak property the spec pins)
      edgesC.unpersist()
      throw new IllegalArgumentException("pageRankHosts: empty graph")
    }
    if (nE <= localMaxEdges) {
      // LOCAL endgame (the connectedComponents localClosure gate): a
      // host graph under the bound is megabytes — iterating it as 5
      // distributed rounds pays persist+count+plan cycles to shuffle
      // kilobytes (measured: ~2 s of job churn for a 7-host fixture).
      // Same integer recurrence on the driver; LinkGraphSpec pins
      // local ≡ distributed.
      val es = edgesC.collect().map(r => (r.getString(0), r.getString(1)))
      edgesC.unpersist()
      val verts = es.iterator.flatMap(e => Iterator(e._1, e._2)).toSet.toArray.sorted
      val n = verts.length.toLong
      val idx = verts.zipWithIndex.toMap
      val outDeg = new Array[Long](verts.length)
      es.foreach { case (u, _) => outDeg(idx(u)) += 1 }
      var r = Array.fill(verts.length)(1000000000L / n)
      val tele = (1000000000L * 15L / 100L) / n
      var k = 0
      while (k < iters) {
        k += 1
        val in = new Array[Long](verts.length)
        es.foreach { case (u, v) => in(idx(v)) += r(idx(u)) / outDeg(idx(u)) }
        r = Array.tabulate(verts.length)(i => tele + 85L * in(i) / 100L)
      }
      import s.implicits._
      return verts.zip(r).toSeq.toDF("host", "rank_ppb")
    }
    val edges = reset(edgesC)
    val vertsC = edges.select(col("src").as("host"))
      .union(edges.select(col("dst").as("host"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = vertsC.count()
    require(n > 0, "pageRankHosts: empty graph")
    val verts = reset(vertsC)
    val degC = edges.groupBy(col("src")).agg(count(lit(1)).as("out_deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    degC.count()
    val deg = reset(degC)
    val r0 = 1000000000L / n
    val tele = (1000000000L * 15L / 100L) / n
    var cached = verts.select(col("host"), lit(r0).as("rank_ppb"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    cached.count()
    var ranks = reset(cached)
    var k = 0
    while (k < iters) {
      k += 1
      val sums = edges
        .join(ranks, edges("src") === ranks("host"))
        .join(deg, Seq("src"))
        .select(col("dst"), expr("rank_ppb DIV out_deg").as("__c"))
        .groupBy(col("dst")).agg(sum(col("__c")).as("__s"))
      val next = verts.join(sums, verts("host") === sums("dst"), "left")
        .select(col("host"),
          (lit(tele) + expr("(85 * coalesce(__s, CAST(0 AS BIGINT))) DIV 100")).as("rank_ppb"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      next.count()
      cached.unpersist()
      cached = next
      ranks = reset(next)
    }
    edgesC.unpersist(); vertsC.unpersist(); degC.unpersist()
    // the final frame stays persisted to pay for the caller's execution
    // (the connectedComponents contract); it is host-table sized
    ranks
  }

  // ------------------------------------------------------------ fixture

  /** The synthetic linked crawl page (the x_html1 discipline: one
    * shared template, Spark renders with concat, the oracle with `||`,
    * so both engines extract from byte-identical HTML). Per doc on host
    * h{doc_id%7}: an absolute cross-host link with an entity-escaped
    * tracking param (canonicalization must collapse variants), a hub
    * link every third doc (host h0 must emerge top-ranked), a
    * scheme-relative link, a path-absolute SELF link (extracted, then
    * dropped by the host graph), and a non-resolvable tail (mailto /
    * fragment / relative path) that must never extract.
    */
  private val parts = Seq(
    "<html><head><title>D ",
    "</title></head><body><p>See <a href=\"https://h",
    ".example.com/p/",
    "?utm_source=feed&amp;b=2\">partner</a> and <a href=\"//h",
    ".example.com/s/",
    "\">mirror</a>.</p>",
    "<a href=\"/self/",
    "\">me</a> <a href=\"mailto:x@y.z\">mail</a> <a href=\"#top\">top</a>" +
      " <a href=\"rel/p.html\">rel</a><p>",
    "</p></body></html>")

  private[graft] def linkedPages(docs: DataFrame): DataFrame = docs.select(
    col("doc_id"),
    concat(lit("https://h"), (col("doc_id") % 7).cast("string"),
      lit(".example.com/d/"), col("doc_id").cast("string")).as("url"),
    concat(
      lit(parts(0)), col("doc_id").cast("string"),
      lit(parts(1)), ((col("doc_id") + 1) % 7).cast("string"),
      lit(parts(2)), (col("doc_id") % 11).cast("string"),
      lit(parts(3)), ((col("doc_id") + 2) % 7).cast("string"),
      lit(parts(4)), (col("doc_id") % 5).cast("string"),
      lit(parts(5)),
      when(col("doc_id") % 3 === 0,
        lit("<a href=\"https://h0.example.com/hub\">hub</a>")).otherwise(lit("")),
      lit(parts(6)), (col("doc_id") % 4).cast("string"),
      lit(parts(7)), col("text"),
      lit(parts(8))).as("html"))

  private def q(s: String) = "'" + s.replace("'", "''") + "'"

  private[ext] val pageUrlDuck =
    "'https://h' || CAST(doc_id % 7 AS VARCHAR) || '.example.com/d/' || CAST(doc_id AS VARCHAR)"

  private[ext] val pageHtmlDuck =
    s"""${q(parts(0))} || CAST(doc_id AS VARCHAR) ||
       |${q(parts(1))} || CAST((doc_id + 1) % 7 AS VARCHAR) ||
       |${q(parts(2))} || CAST(doc_id % 11 AS VARCHAR) ||
       |${q(parts(3))} || CAST((doc_id + 2) % 7 AS VARCHAR) ||
       |${q(parts(4))} || CAST(doc_id % 5 AS VARCHAR) ||
       |${q(parts(5))} ||
       |CASE WHEN doc_id % 3 = 0
       |  THEN '<a href="https://h0.example.com/hub">hub</a>' ELSE '' END ||
       |${q(parts(6))} || CAST(doc_id % 4 AS VARCHAR) ||
       |${q(parts(7))} || text ||
       |${q(parts(8))}""".stripMargin

  /** Oracle CTEs shared by the link probes: pages → extracted hrefs →
    * resolution → canonical page pairs (`lk` raw, `pp` distinct).
    * `where` restricts the document slice (the increment probes split
    * released vs shard); `px` prefixes every CTE name so two chains can
    * coexist in one query.
    */
  private[ext] def linkBaseCtesDuck: String = linkBaseCtesDuck("", "")

  private[ext] def linkBaseCtesDuck(where: String, px: String): String = {
    val cu = graft.clean.UrlFns.canonicalUrlDuck _
    val w = if (where.isEmpty) "" else s" WHERE $where"
    s"""${px}pg AS (
       |  SELECT $pageUrlDuck AS url, $pageHtmlDuck AS html FROM documents$w),
       |${px}hr AS (
       |  SELECT url, unnest(regexp_extract_all(html, '$hrefReDuck', 1)) AS href
       |  FROM ${px}pg),
       |${px}rs AS (
       |  SELECT url, r FROM (
       |    SELECT url, ${resolveHrefDuck("url", "replace(href, '&amp;', '&')")} AS r
       |    FROM ${px}hr)
       |  WHERE r IS NOT NULL),
       |${px}lk AS (
       |  SELECT ${cu("url")} AS src, ${cu("r")} AS dst,
       |    regexp_extract(${cu("url")}, '^[a-z0-9+.-]+://([^/:?#]+)', 1) AS src_host,
       |    regexp_extract(${cu("r")}, '^[a-z0-9+.-]+://([^/:?#]+)', 1) AS dst_host
       |  FROM ${px}rs),
       |${px}pp AS (SELECT DISTINCT src, dst, src_host, dst_host FROM ${px}lk)""".stripMargin
  }

  /** `linkBaseCtesDuck` extended with the host edge rollup. */
  private[ext] def linkCtesDuck: String = linkCtesDuck("", "")

  private[ext] def linkCtesDuck(where: String, px: String): String =
    s"""${linkBaseCtesDuck(where, px)},
       |${px}hedges AS (
       |  SELECT src_host AS src, dst_host AS dst, COUNT(*) AS n_pairs
       |  FROM ${px}pp WHERE src_host <> dst_host GROUP BY 1, 2)""".stripMargin

  /** Fixed-iteration PR oracle CTEs over `<edges>` (src, dst); `px`
    * prefixes every CTE so two rank chains can coexist in one query.
    * The final ranks land in `<px>pr<iters>`.
    */
  private[ext] def pageRankCtesDuck(iters: Int): String =
    pageRankCtesDuck(iters, "hedges", "")

  private[ext] def pageRankCtesDuck(iters: Int, edges: String, px: String): String = {
    val init =
      s"""${px}he AS (SELECT DISTINCT src, dst FROM $edges WHERE src <> dst),
         |${px}verts AS (SELECT src AS host FROM ${px}he UNION SELECT dst FROM ${px}he),
         |${px}nv AS (SELECT COUNT(*) AS n FROM ${px}verts),
         |${px}deg AS (SELECT src, COUNT(*) AS out_deg FROM ${px}he GROUP BY src),
         |${px}pr0 AS (
         |  SELECT host, CAST(1000000000 AS BIGINT) // (SELECT n FROM ${px}nv) AS rank_ppb
         |  FROM ${px}verts)""".stripMargin
    val steps = (1 to iters).map { k =>
      s"""${px}pr$k AS (
         |  SELECT v.host,
         |    ((CAST(1000000000 AS BIGINT) * 15) // 100) // (SELECT n FROM ${px}nv)
         |      + (85 * COALESCE(c.s, 0)) // 100 AS rank_ppb
         |  FROM ${px}verts v LEFT JOIN (
         |    SELECT e.dst AS host, SUM(r.rank_ppb // d.out_deg) AS s
         |    FROM ${px}he e
         |    JOIN ${px}pr${k - 1} r ON r.host = e.src
         |    JOIN ${px}deg d ON d.src = e.src
         |    GROUP BY e.dst) c ON c.host = v.host)""".stripMargin
    }
    (init +: steps).mkString(",\n")
  }

  // ------------------------------------------------------------- probes

  /** X-LNK1 — anchor extraction + href resolution + canonicalization,
    * rolled up per host pair: n_raw counts every kept anchor, n_pairs
    * the distinct canonical page pairs (tracking-param variants and
    * template repeats collapse). Self-host rows PRESENT here — the
    * extraction tier reports what pages say; dropping chrome is the
    * graph stage's decision (x_lnk2). The oracle re-runs the regex,
    * the resolution CASE chain, and canonicalization relationally.
    */
  private val lnk1 = Probe(
    "x_lnk1_extract_links",
    s"""WITH $linkBaseCtesDuck,
       |agg AS (
       |  SELECT src_host, dst_host,
       |    CAST(COUNT(*) AS BIGINT) AS n_raw FROM lk GROUP BY 1, 2),
       |pagg AS (
       |  SELECT src_host, dst_host, CAST(COUNT(*) AS BIGINT) AS n_pairs
       |  FROM pp GROUP BY 1, 2)
       |SELECT a.src_host, a.dst_host, a.n_raw, p.n_pairs
       |FROM agg a JOIN pagg p USING (src_host, dst_host)
       |ORDER BY src_host, dst_host""".stripMargin) { (s, dir) =>
    val links = extractLinks(linkedPages(Tables(s, dir, "documents")))
    // ONE extraction pass: the first cut computed raw and distinct-pair
    // counts as two branches, re-running the regex chain twice; a
    // COUNT(DISTINCT src, dst) alongside the plain count folds both
    // into one Expand-based aggregate over a single scan
    links.groupBy("src_host", "dst_host")
      .agg(count(lit(1)).as("n_raw"),
        count_distinct(col("src"), col("dst")).as("n_pairs"))
      .orderBy("src_host", "dst_host")
  }

  /** X-LNK2 — the composed centrality pipeline: pages → extraction →
    * host graph → 5-iteration exact-integer PageRank. The oracle
    * recomputes every stage (regex, resolution, canonical dedup, host
    * rollup, all five iterations' truncating-division arithmetic) in
    * one nested query — the hub host h0 must emerge top-ranked from
    * extraction alone, nothing is pre-labeled.
    */
  private val lnk2 = Probe(
    "x_lnk2_host_rank",
    s"""WITH $linkCtesDuck,
       |${pageRankCtesDuck(5)}
       |SELECT host, CAST(rank_ppb AS BIGINT) AS rank_ppb
       |FROM pr5 ORDER BY rank_ppb DESC, host""".stripMargin) { (s, dir) =>
    val links = extractLinks(linkedPages(Tables(s, dir, "documents")))
    pageRankHosts(hostGraph(links), iters = 5)
      .select(col("host"), col("rank_ppb").cast("long").as("rank_ppb"))
      .orderBy(col("rank_ppb").desc, col("host"))
  }

  /** Anchor element regex — group 1 href, group 2 the inner markup
    * (anchors don't nest, so lazy-to-`</a>` is exact; the [[
    * graft.clean.HtmlFns]] anchorRe reasoning).
    */
  private[ext] val anchorRe =
    "(?is)<a\\b[^>]*?\\bhref\\s*=\\s*\"([^\"]*)\"[^>]*>(.*?)</a>"

  /** Extract (resolved target, anchor text) pairs: the href and inner
    * markup come from ONE pattern evaluated twice (group 1 / group 2 —
    * both engines lack multi-group extract-all), so the two arrays are
    * positionally aligned by construction; inner tags strip to spaces
    * before tokenization. Narrow regex work; no exchange.
    */
  def anchorTexts(pages: DataFrame, urlCol: String = "url",
      htmlCol: String = "html"): DataFrame = {
    val withArrays = pages.select(col(urlCol).as("__u"),
      regexp_extract_all(col(htmlCol), lit(anchorRe), lit(1)).as("__hs"),
      regexp_extract_all(col(htmlCol), lit(anchorRe), lit(2)).as("__ts"))
    val pos = withArrays
      .select(col("__u"), posexplode(col("__hs")).as(Seq("__i", "__href")),
        col("__ts"))
      .select(col("__u"), col("__href"),
        element_at(col("__ts"), col("__i") + 1).as("__inner"))
    pos.select(col("__u"),
        resolveHref(col("__u"),
          regexp_replace(col("__href"), "&amp;", "&")).as("__r"),
        col("__inner"))
      .filter(col("__r").isNotNull)
      .select(
        graft.clean.UrlFns.canonicalUrl(col("__r")).as("dst"),
        hostOf(graft.clean.UrlFns.canonicalUrl(col("__r"))).as("dst_host"),
        regexp_replace(col("__inner"), "<[^>]*>", " ").as("atext"))
  }

  /** X-LNK3 — the ANCHOR-TEXT index: what the web calls a page is a
    * first-class relevance/quality signal (anchor terms describe the
    * TARGET, which is why search engines index them against the linked
    * page, not the linking one). Per target host: term counts from all
    * inbound anchors' visible text, top-3 by (n desc, term asc). The
    * per-host window runs over the POST-aggregation (host, term) table
    * — rollup-sized, not corpus-sized. The oracle re-extracts both
    * regex groups positionally, re-resolves, strips tags, tokenizes,
    * and replays the window.
    */
  private val lnk3 = Probe(
    "x_lnk3_anchor_terms",
    s"""WITH pg AS (
       |  SELECT $pageUrlDuck AS url, $pageHtmlDuck AS html FROM documents),
       |ar AS (
       |  SELECT url, regexp_extract_all(html, '$anchorRe', 1) AS hs,
       |    regexp_extract_all(html, '$anchorRe', 2) AS ts
       |  FROM pg),
       |px AS (
       |  SELECT url, hs[i] AS href, ts[i] AS itext
       |  FROM ar, UNNEST(generate_series(1, len(hs))) AS t(i)),
       |rx AS (
       |  SELECT r, itext FROM (
       |    SELECT ${resolveHrefDuck("url", "replace(href, '&amp;', '&')")} AS r, itext
       |    FROM px)
       |  WHERE r IS NOT NULL),
       |tm AS (
       |  SELECT
       |    regexp_extract(${graft.clean.UrlFns.canonicalUrlDuck("r")},
       |      '^[a-z0-9+.-]+://([^/:?#]+)', 1) AS dst_host,
       |    unnest(${graft.clean.CleanFns.tokensDuck(
                 "lower(regexp_replace(itext, '<[^>]*>', ' ', 'g'))")}) AS term
       |  FROM rx),
       |tc AS (
       |  SELECT dst_host, term, CAST(COUNT(*) AS BIGINT) AS n
       |  FROM tm GROUP BY 1, 2),
       |rk AS (
       |  SELECT dst_host, term, n,
       |    CAST(row_number() OVER (PARTITION BY dst_host
       |      ORDER BY n DESC, term ASC) AS BIGINT) AS rk
       |  FROM tc)
       |SELECT dst_host, term, n, rk FROM rk WHERE rk <= 3
       |ORDER BY dst_host, rk""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val at = anchorTexts(linkedPages(Tables(s, dir, "documents")))
    at.select(col("dst_host"),
        explode(graft.clean.CleanFns.tokens(lower(col("atext")))).as("term"))
      .groupBy("dst_host", "term").agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("dst_host"))
          .orderBy(col("n").desc, col("term").asc)).cast("long"))
      .filter(col("rk") <= 3)
      .orderBy("dst_host", "rk")
  }

  /** X-LNK4 — the INCREMENTAL rank update (the x_pipe8 daily-increment
    * discipline on the planning side): the released crawl's host edges
    * and ranks persist as a parquet STORE (train-once); the steady
    * path extracts only the NEW shard's links, merges its host edges
    * into the store additively (page-pair sets across crawls are
    * disjoint by construction — a page belongs to one crawl — so edge
    * weights add), re-ranks the MERGED graph, and reports per-host
    * rank drift vs the stored table — the artifact a crawl scheduler
    * actually consumes (which hosts rose enough to re-budget). The
    * oracle recomputes BOTH rank chains from scratch (released slice
    * and full corpus) in one query — hash-match proves incremental
    * merge ≡ full recompute, the same guarantee x_ded9/x_pipe8 pin for
    * dedup tiers.
    */
  private val lnk4 = Probe(
    "x_lnk4_rank_increment",
    s"""WITH ${linkCtesDuck("doc_id % 5 <> 0", "o")},
       |${pageRankCtesDuck(5, "ohedges", "o")},
       |${linkCtesDuck("", "m")},
       |${pageRankCtesDuck(5, "mhedges", "m")}
       |SELECT m.host,
       |  CAST(COALESCE(o.rank_ppb, 0) AS BIGINT) AS old_ppb,
       |  CAST(m.rank_ppb AS BIGINT) AS new_ppb,
       |  CAST(m.rank_ppb - COALESCE(o.rank_ppb, 0) AS BIGINT) AS delta_ppb
       |FROM mpr5 m LEFT JOIN opr5 o ON o.host = m.host
       |ORDER BY m.host""".stripMargin) { (s, dir) =>
    val docs = Tables(s, dir, "documents")
    val store = graft.util.TrainOnce(s"linkstore:$dir") {
      val p = graft.util.TempDirs.scratch("graft_linkstore")
      hostGraph(extractLinks(linkedPages(docs.filter(col("doc_id") % 5 =!= 0))))
        .write.mode("overwrite").parquet(s"$p/edges")
      pageRankHosts(s.read.parquet(s"$p/edges"), iters = 5)
        .write.mode("overwrite").parquet(s"$p/ranks")
      p
    }
    val shardEdges =
      hostGraph(extractLinks(linkedPages(docs.filter(col("doc_id") % 5 === 0))))
    val merged = s.read.parquet(s"$store/edges").unionByName(shardEdges)
      .groupBy("src", "dst").agg(sum(col("n_pairs")).as("n_pairs"))
    val oldRanks = s.read.parquet(s"$store/ranks")
      .select(col("host"), col("rank_ppb").cast("long").as("old_ppb"))
    pageRankHosts(merged, iters = 5)
      .select(col("host"), col("rank_ppb").cast("long").as("new_ppb"))
      .join(oldRanks, Seq("host"), "left")
      .select(col("host"),
        coalesce(col("old_ppb"), lit(0L)).as("old_ppb"), col("new_ppb"),
        (col("new_ppb") - coalesce(col("old_ppb"), lit(0L))).as("delta_ppb"))
      .orderBy("host")
  }

  /** Pages whose anchors target OTHER DOCUMENTS' pages (the
    * x_lnk5 fixture): two cross-document anchors per page with term-y
    * visible text, targets spread mod 101 so at small SFs some targets
    * don't exist (their anchor text attaches to nothing — the join must
    * tolerate it).
    */
  private[graft] def anchorPages(docs: DataFrame): DataFrame = {
    def turl(t: Column) = concat(lit("https://h"), (t % 7).cast("string"),
      lit(".example.com/d/"), t.cast("string"))
    val t1 = (col("doc_id") * 3 + 1) % 101
    val t2 = (col("doc_id") * 5 + 2) % 101
    docs.select(col("doc_id"),
      concat(lit("https://h"), (col("doc_id") % 7).cast("string"),
        lit(".example.com/d/"), col("doc_id").cast("string")).as("url"),
      concat(
        lit("<html><body><a href=\""), turl(t1), lit("\">topic"),
        (t1 % 13).cast("string"), lit(" about"), (t1 % 5).cast("string"),
        lit("</a> <a href=\""), turl(t2), lit("\">ref"),
        (t2 % 11).cast("string"), lit("</a><p>"), col("text"),
        lit("</p></body></html>")).as("html"))
  }

  private val anchorPagesDuck: String = {
    def turl(t: String) =
      s"'https://h' || CAST(($t) % 7 AS VARCHAR) || '.example.com/d/' || CAST($t AS VARCHAR)"
    val t1 = "(doc_id * 3 + 1) % 101"
    val t2 = "(doc_id * 5 + 2) % 101"
    s"""SELECT doc_id, $pageUrlDuck AS url,
       |  '<html><body><a href="' || ${turl(t1)} || '">topic' ||
       |  CAST(($t1) % 13 AS VARCHAR) || ' about' || CAST(($t1) % 5 AS VARCHAR) ||
       |  '</a> <a href="' || ${turl(t2)} || '">ref' ||
       |  CAST(($t2) % 11 AS VARCHAR) ||
       |  '</a><p>' || text || '</p></body></html>' AS html
       |FROM documents""".stripMargin
  }

  /** X-LNK5 — anchor-text DOCUMENT EXPANSION for retrieval: the anchor
    * text of inbound links describes the TARGET page, so web search
    * indexes it WITH the target's own text (the classic public IR
    * design — it is how navigational queries find pages that never
    * contain their own name). Pipeline: pages → anchor extraction →
    * inbound anchor texts grouped per target page (sorted join for a
    * deterministic expansion string) → each document's text expanded →
    * BM25 top-5 (x_ret1's scorer) over the EXPANDED corpus. The oracle
    * recomputes extraction, resolution, the expansion string, and the
    * full tf/df/idf/length-normalized BM25 from first principles —
    * expansion must shift df/dl and the rankings identically in both
    * engines.
    */
  private val lnk5 = Probe(
    "x_lnk5_anchor_bm25",
    s"""WITH ap AS ($anchorPagesDuck),
       |ar AS (
       |  SELECT url, regexp_extract_all(html, '$anchorRe', 1) AS hs,
       |    regexp_extract_all(html, '$anchorRe', 2) AS ts
       |  FROM ap),
       |px AS (
       |  SELECT url, hs[i] AS href, ts[i] AS itext
       |  FROM ar, UNNEST(generate_series(1, len(hs))) AS t(i)),
       |rx AS (
       |  SELECT r, itext FROM (
       |    SELECT ${resolveHrefDuck("url", "replace(href, '&amp;', '&')")} AS r, itext
       |    FROM px)
       |  WHERE r IS NOT NULL),
       |ax AS (
       |  SELECT ${graft.clean.UrlFns.canonicalUrlDuck("r")} AS dst,
       |    trim(regexp_replace(itext, '<[^>]*>', ' ', 'g')) AS atext
       |  FROM rx),
       |ea AS (
       |  SELECT dst, array_to_string(list_sort(list(atext)), ' ') AS a
       |  FROM ax GROUP BY dst),
       |exp AS (
       |  SELECT d.doc_id,
       |    d.text || COALESCE(' ' || ea.a, '') AS text
       |  FROM documents d LEFT JOIN ea ON ea.dst = $pageUrlDuck),
       |t AS (
       |  SELECT doc_id, ${graft.clean.CleanFns.tokensDuck("text")} AS ws FROM exp),
       |tf AS (
       |  SELECT doc_id, w, COUNT(*) AS tf
       |  FROM (SELECT doc_id, UNNEST(ws) AS w FROM t) GROUP BY doc_id, w),
       |dl AS (SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY doc_id),
       |st AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS tot FROM dl),
       |dfq AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY w),
       |qt AS (
       |  SELECT DISTINCT doc_id AS q_id, w
       |  FROM (SELECT doc_id, UNNEST(ws) AS w FROM t WHERE doc_id < 5)),
       |sc AS (
       |  SELECT qt.q_id, tf.doc_id,
       |    SUM(ln((st.n_docs - dfq.df + 0.5) / (dfq.df + 0.5) + 1) *
       |        (tf.tf * 2.2) /
       |        (tf.tf + 1.2 * (0.25 + 0.75 * (dl.dl / (CAST(st.tot AS DOUBLE) / st.n_docs))))) AS s,
       |    COUNT(*) AS n_terms
       |  FROM tf
       |  JOIN qt ON qt.w = tf.w AND tf.doc_id <> qt.q_id
       |  JOIN dfq ON dfq.w = tf.w
       |  JOIN dl ON dl.doc_id = tf.doc_id, st
       |  GROUP BY qt.q_id, tf.doc_id)
       |SELECT q_id, CAST(rank AS BIGINT) AS rank, doc_id, score, CAST(n_terms AS BIGINT) AS n_terms
       |FROM (
       |  SELECT q_id, doc_id, round(s, 6) AS score, n_terms,
       |         row_number() OVER (PARTITION BY q_id ORDER BY round(s, 6) DESC, doc_id) AS rank
       |  FROM sc)
       |WHERE rank <= 5
       |ORDER BY q_id, rank""".stripMargin) { (s, dir) =>
    val docs = Tables(s, dir, "documents")
    val at = anchorTexts(anchorPages(docs))
      .select(col("dst"), trim(col("atext")).as("atext"))
    val ea = at.groupBy("dst")
      .agg(array_join(sort_array(collect_list(col("atext"))), " ").as("__a"))
    val pageUrl = concat(lit("https://h"), (col("doc_id") % 7).cast("string"),
      lit(".example.com/d/"), col("doc_id").cast("string"))
    val expandedPlan = docs.withColumn("__url", pageUrl)
      .join(ea, col("__url") === ea("dst"), "left")
      .select(col("doc_id"),
        concat(col("text"),
          when(col("__a").isNull, lit(""))
            .otherwise(concat(lit(" "), col("__a")))).as("text"))
    // stage the expanded corpus ONCE (the x_pipe8 discipline): BM25
    // consumes it from five branches (tf, dl, stats, df, queries) and
    // an unpersisted plan would re-run the HTML synthesis + anchor
    // extraction + expansion join once per branch
    val stage = graft.util.TempDirs.scratch("graft_lnk5")
    expandedPlan.write.mode("overwrite").parquet(s"$stage/exp")
    val expanded = s.read.parquet(s"$stage/exp")
    PipelineOps10.bm25TopK(expanded, expanded.filter(col("doc_id") < 5), k = 5)
      .orderBy("q_id", "rank")
  }

  val all: Seq[Probe] = Seq(lnk1, lnk2, lnk3, lnk4, lnk5)
}
