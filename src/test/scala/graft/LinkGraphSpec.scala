package graft

import graft.ext.LinkGraph
import org.apache.spark.sql.functions._

/** Link-graph edges the x_lnk hashes can't see: resolution rules one by
  * one, the host-graph dedup/self-loop policy, and PageRank against an
  * independent in-memory reference model (dangling mass, no-inbound
  * teleport, duplicate/self edge defense).
  */
class LinkGraphSpec extends SparkSuite {
  import spark.implicits._

  // the fixture both the native-vs-declarative parity pin and the
  // rule-by-rule expectations run over (RFC 3986 §5.2 incl. relative
  // merge + dot-segment traversal — round-13 verdict #3)
  private val resolvePage = "https://Site.example.com/dir/page?x=1"
  private val resolveCases = Seq(
    ("https://other.com/a", "https://other.com/a"), // absolute kept
    ("HTTP://UPPER.com/b", "HTTP://UPPER.com/b"), // scheme case-insensitive keep
    ("//cdn.com/lib.js", "https://cdn.com/lib.js"), // scheme-relative
    ("/root/x", "https://Site.example.com/root/x"), // path-absolute
    // resolution is markup-agnostic: an HTTP Location may LEGALLY
    // carry a literal '&amp;' — the entity decode lives at the HTML
    // layer (extractLinks/anchorTexts), pinned below
    ("/q?a=1&amp;b=2", "https://Site.example.com/q?a=1&amp;b=2"),
    ("ftp://files.com/x", null), // non-http(s) scheme
    ("mailto:a@b.c", null),
    ("javascript:void(0)", null),
    ("tel:+1-555-0100", null), // scheme-no-authority URI, not a relative path
    ("#frag", null),
    ("?y=2", null), // query-only self-reference mints no edge
    ("", null),
    // RFC 3986 §5.2.3 merge + §5.2.4 dot segments — "the wild norm"
    // for Location headers and half of real-page hrefs
    ("rel/path.html", "https://Site.example.com/dir/rel/path.html"),
    ("moved/x", "https://Site.example.com/dir/moved/x"),
    ("../up.html", "https://Site.example.com/up.html"),
    ("../../a/b", "https://Site.example.com/a/b"), // root-excess .. clamps
    ("./here.html", "https://Site.example.com/dir/here.html"),
    ("a/b/../c", "https://Site.example.com/dir/a/c"),
    ("rel/p?q=1&r=2", "https://Site.example.com/dir/rel/p?q=1&r=2"), // query rides along
    ("/a/b/../../c", "https://Site.example.com/c"), // dots in path-absolute too
    ("/a/./b/.", "https://Site.example.com/a/b/"))

  test("resolveHref: rule-by-rule resolution and drops (incl. relative merge)") {
    val got = resolveCases.map(_._1).toDF("href")
      .select(col("href"),
        LinkGraph.resolveHref(lit(resolvePage), col("href")).as("r"))
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    resolveCases.foreach { case (href, want) =>
      assert(got(href) == want, s"href=$href got=${got(href)} want=$want")
    }
  }

  test("resolveHref native == declarative twin, interpreted == codegen") {
    // pages chosen to stress every branch guard: http(s) bases with/
    // without a path, an authority-less base, a non-http base
    val pages = Seq(resolvePage, "https://h.com", "http://h.com/a/b/c?z#f",
      "ftp://x.com/d/", "not-a-url")
    val rows = for (p <- pages; (h, _) <- resolveCases) yield (p, h)
    val df = rows.toDF("page", "href")
    val native = df.select(col("page"), col("href"),
      LinkGraph.resolveHref(col("page"), col("href")).as("r")).collect()
    val decl = df.select(col("page"), col("href"),
      LinkGraph.resolveHrefDeclarative(col("page"), col("href")).as("r")).collect()
    assert(native.map(_.toSeq).toSeq == decl.map(_.toSeq).toSeq)
    // interpreted path (eval) == codegen path on the same fixture
    import org.apache.spark.unsafe.types.UTF8String
    rows.foreach { case (p, h) =>
      val viaEval = graft.functions.ResolveHref.compute(
        UTF8String.fromString(p), UTF8String.fromString(h))
      val got = Option(viaEval).map(_.toString).orNull
      val want = native.find(r => r.getString(0) == p && r.getString(1) == h)
        .map(_.getString(2)).orNull
      assert(got == want, s"page=$p href=$h eval=$got codegen=$want")
    }
  }

  test("extractLinks entity-decodes hrefs at the HTML layer") {
    val html = """<a href="https://a.com/q?x=1&amp;y=2">t</a>"""
    val got = graft.ext.LinkGraph.extractLinks(
        Seq(("https://s.com/p", html)).toDF("url", "html"))
      .collect().map(_.getString(1)).toList
    assert(got == List("https://a.com/q?x=1&y=2"), got.toString)
  }

  test("resolve → canonicalize composition dot-normalizes ALL reference forms") {
    // resolveHref only dot-merges path-absolute and relative refs; the
    // absolute and scheme-relative forms carry their dots into
    // canonical_url, whose §6.2.2.3 path step must collapse them — the
    // composed chain (what extractLinks/redirectEdges actually run)
    // yields ONE frontier key per resource regardless of form
    val page = "https://s.com/d/p"
    val forms = Seq(
      "https://t.com/a/../b", // absolute
      "//t.com/a/../b", // scheme-relative
      "/a/../b", // path-absolute (dst host differs: s.com)
      "../a/../b") // relative → /d/../a/../b → /b
    val got = forms.toDF("href")
      .select(graft.clean.UrlFns.canonicalUrl(
        LinkGraph.resolveHref(lit(page), col("href"))).as("c"))
      .collect().map(_.getString(0)).toList
    assert(got == List("https://t.com/b", "https://t.com/b",
      "https://s.com/b", "https://s.com/b"), got.toString)
  }

  test("extractLinks honors <base href>: first tag wins, relative base re-bases, absence falls back") {
    val pages = Seq(
      // absolute base: relative AND path-absolute hrefs re-base to b.com;
      // the second (decoy) base must lose to the first
      ("https://a.com/d/1",
        "<head><base href=\"https://b.com/bd/\"><base href=\"https://decoy.com/\"></head>" +
          "<body><a href=\"rel/x\">r</a> <a href=\"/abs/y\">a</a>" +
          " <a href=\"https://c.com/z\">c</a></body>"),
      // relative base: resolved against the page URL first
      ("https://a.com/d/2",
        "<base href='/bdir/sub/'><a href=\"../up/w\">u</a>"),
      // no base: page URL is the base
      ("https://a.com/d/3", "<a href=\"rel/p\">p</a>"))
      .toDF("url", "html")
    val got = LinkGraph.extractLinks(pages)
      .select("src", "dst").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(
      ("https://a.com/d/1", "https://b.com/bd/rel/x"),
      ("https://a.com/d/1", "https://b.com/abs/y"),
      ("https://a.com/d/1", "https://c.com/z"), // absolute href ignores base
      ("https://a.com/d/2", "https://a.com/bdir/up/w"),
      ("https://a.com/d/3", "https://a.com/d/rel/p")), got.toString)
  }

  test("nofollow: token-boundary rel match; hostGraph drops flagged pairs; quoted '>' survives") {
    val html = "<a rel=\"sponsored nofollow\" href=\"https://nf.com/x\">s</a>" +
      " <a rel='NOFOLLOW' href=\"https://nf2.com/y\">u</a>" + // case-insensitive, single-quoted
      " <a rel=nofollow href=\"https://nf3.com/z\">uq</a>" + // unquoted rel
      " <a rel=\"nofollowish\" href=\"https://ok.com/a\">decoy</a>" + // NOT the token
      " <a title=\"a>b\" href=\"https://ttl.com/c\">t</a>" + // quoted '>' in the region
      " <a href=\"https://plain.com/d\">p</a>" +
      // one followed + one nofollow anchor to the SAME target: the pair survives
      " <a rel=\"nofollow\" href=\"https://both.com/e\">n</a>" +
      " <a href=\"https://both.com/e\">f</a>"
    val links = LinkGraph.extractLinks(Seq(("https://src.com/p", html)).toDF("url", "html"))
    val flags = links.collect().map(r => (r.getString(1), r.getBoolean(4))).toSet
    assert(flags == Set(
      ("https://nf.com/x", true), ("https://nf2.com/y", true),
      ("https://nf3.com/z", true), ("https://ok.com/a", false),
      ("https://ttl.com/c", false), ("https://plain.com/d", false),
      ("https://both.com/e", true), ("https://both.com/e", false)), flags.toString)
    val ranked = LinkGraph.hostGraph(links).collect()
      .map(r => (r.getString(1), r.getLong(2))).toSet
    assert(ranked == Set(("ok.com", 1L), ("ttl.com", 1L), ("plain.com", 1L),
      ("both.com", 1L)), ranked.toString)
  }

  test("token boundaries are the explicit ws class: U+000B is NOT a boundary") {
    // ADVICE r15: Java \s includes vertical tab, RE2's does not — the
    // shared patterns now spell [ \t\n\r\f], so a rel value fusing
    // 'nofollow' to the next token with U+000B is ONE token (not the
    // nofollow token) in BOTH engines
    val html = "<a rel=\"nofollow\u000bx\" href=\"https://vt.com/a\">v</a>" +
      " <a rel=\"x\u000bnofollow\" href=\"https://vt2.com/b\">w</a>" +
      " <a rel=\"a nofollow\tb\" href=\"https://tab.com/c\">t</a>" // real boundaries
    val flags = LinkGraph.extractLinks(Seq(("https://s.com/p", html)).toDF("url", "html"))
      .collect().map(r => (r.getString(1), r.getBoolean(4))).toSet
    assert(flags == Set(
      ("https://vt.com/a", false), ("https://vt2.com/b", false),
      ("https://tab.com/c", true)), flags.toString)
  }

  test("anchorLoss surfaces attrRegion drops (apostrophe + unclosed quote)") {
    val pages = Seq(
      // HTML5-legal unquoted value with an apostrophe: dropped, counted
      ("https://a.com/1", "<a href=\"https://x.com/ok\">k</a><a href=/o'brien>b</a>"),
      // unclosed double quote: dropped, counted
      ("https://a.com/2", "<a href=\"https://x.com/ok\">k</a><a href=\"/broken>"),
      // quoted '>' in the region: matched, zero loss
      ("https://a.com/3", "<a title=\"a>b\" href=\"https://x.com/t\">t</a>"))
      .toDF("url", "html")
    val got = LinkGraph.anchorLoss(pages).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set(
      ("https://a.com/1", 2L, 1L, 1L),
      ("https://a.com/2", 2L, 1L, 1L),
      ("https://a.com/3", 1L, 1L, 0L)), got.toString)
  }

  test("hostGraph: page-pair dedup, self-host drop") {
    // two pages on a.com both carry the SAME target page twice (template
    // repeat) plus a self link; pair dedup must weigh the target once
    // per distinct (src,dst) page pair
    val links = Seq(
      ("https://a.com/p1", "https://b.com/t", "a.com", "b.com"),
      ("https://a.com/p1", "https://b.com/t", "a.com", "b.com"), // same anchor twice
      ("https://a.com/p2", "https://b.com/t", "a.com", "b.com"),
      ("https://a.com/p1", "https://a.com/self", "a.com", "a.com") // self-host
    ).toDF("src", "dst", "src_host", "dst_host")
    val got = LinkGraph.hostGraph(links).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toList
    assert(got == List(("a.com", "b.com", 2L)), got.toString)
  }

  /** Independent reference: the weighted, dangling-conserving integer
    * recurrence in plain Scala (the spec's second implementation).
    */
  private def refRank(es: Set[(String, String, Long)], iters: Int)
      : Map[String, Long] = {
    val verts = es.flatMap(e => Seq(e._1, e._2)).toList.sorted
    val n = verts.size.toLong
    val wOut = es.groupBy(_._1).map { case (s, xs) => s -> xs.toSeq.map(_._3).sum }
    var r = verts.map(_ -> 1000000000L / n).toMap
    val tele = (1000000000L * 15L / 100L) / n
    for (_ <- 1 to iters) {
      val in = es.toSeq.map { case (u, v, w) => v -> r(u) * w / wOut(u) }
        .groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2).sum }
      val dang = verts.filter(v => !wOut.contains(v)).map(r).sum
      r = verts.map(v =>
        v -> (tele + 85L * (in.getOrElse(v, 0L) + dang / n) / 100L)).toMap
    }
    r
  }

  test("pageRankHosts == in-memory reference model (dangling conserved, no-inbound)") {
    // a -> b, a -> c, b -> a; c dangling (its mass must REDISTRIBUTE,
    // not leak — round-13 verdict #6); d -> a gives a an extra inbound;
    // nothing points at d (teleport + dangling share only). Duplicate
    // and self edges planted — must be inert.
    val edges = Seq(
      ("a", "b"), ("a", "c"), ("b", "a"), ("d", "a"),
      ("a", "b"), // duplicate
      ("b", "b") // self loop
    ).toDF("src", "dst")
    val got = LinkGraph.pageRankHosts(edges, iters = 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val want = refRank(Set(("a", "b", 1L), ("a", "c", 1L), ("b", "a", 1L),
      ("d", "a", 1L)), 5)
    assert(got == want, s"got=$got want=$want")
    // shape: a has two inbound sources; d is teleport + dangling share
    // (STRICTLY more than bare teleport — conservation is visible)
    val tele = (1000000000L * 15L / 100L) / 4L
    assert(got("a") > got("b") && got("d") > tele)
    // mass conservation: Σ rank stays 1e9 minus only truncation slack
    // (≤ ~n lost ppb per division site per iteration)
    val total = got.values.sum
    assert(total <= 1000000000L && total >= 1000000000L - 4 * 5 * 10,
      s"mass=$total")
    // the distributed loop (local endgame gated OFF) computes the same
    // recurrence — the gate is a route choice, never a semantics choice
    val dist = LinkGraph.pageRankHosts(edges, iters = 5, localMaxEdges = -1L)
      .collect().map(r2 => (r2.getString(0), r2.getLong(1))).toMap
    assert(dist == got, s"distributed=$dist local=$got")
  }

  test("pageRankHosts uses n_pairs edge weights (local == distributed == model)") {
    // b and c both link to exactly {a, d}, but b's edge to a carries
    // 9 distinct page pairs vs 1 to d (and c the mirror image) — under
    // unweighted PR a and d would tie; weighted contributions must
    // separate them per the n_pairs ratios (round-13 verdict #4)
    val edges = Seq(
      ("b", "a", 9L), ("b", "d", 1L),
      ("c", "a", 1L), ("c", "d", 9L),
      ("a", "b", 2L), ("d", "b", 2L)
    ).toDF("src", "dst", "n_pairs")
    val got = LinkGraph.pageRankHosts(edges, iters = 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val want = refRank(edges.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet, 5)
    assert(got == want, s"got=$got want=$want")
    val dist = LinkGraph.pageRankHosts(edges, iters = 5, localMaxEdges = -1L)
      .collect().map(r2 => (r2.getString(0), r2.getLong(1))).toMap
    assert(dist == got, s"distributed=$dist local=$got")
    // a ends above d: symmetric graph except a's inbound weight skew
    // feeds the a->b->a cycle
    assert(got("a") != got("d"), s"weights ignored: $got")
  }

  test("anchorTexts: positional href/text alignment, tag strip, drops") {
    val html = """<p><a href="https://a.com/x">first <b>bold</b> term</a>
      |<a class="z" href="/local">self text</a>
      |<a href="mailto:x@y.z">never</a>
      |<a href="https://b.com/y">plain</a></p>""".stripMargin
    val got = graft.ext.LinkGraph.anchorTexts(
        Seq(("https://site.com/p", html)).toDF("url", "html"))
      .collect().map(r => (r.getString(1), r.getString(2).trim.replaceAll("\\s+", " ")))
      .sortBy(_._2)
    // mailto dropped; inner tags stripped to spaces; alignment holds
    // even with the dropped anchor between kept ones
    assert(got.toList == List(
      ("a.com", "first bold term"),
      ("b.com", "plain"),
      ("site.com", "self text")), got.toList.toString)
  }

  test("pageRankHosts leaves no persisted intermediates behind (except the result)") {
    val edges = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    // gate the local endgame OFF — the leak property is about the
    // distributed loop's intermediates
    val out = LinkGraph.pageRankHosts(edges, iters = 3, localMaxEdges = -1L)
    out.collect()
    // the final frame's cache is the documented survivor; everything
    // else (edges, verts, deg, prior iterations) must be unpersisted
    val added = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(added.size <= 1, s"leaked ${added.size} persisted RDDs")
  }

  /** The naive single-window take rankWeightedBudget replaced (and the
    * x_lnk6 oracle still runs) — the reference the two-phase form must
    * match row for row.
    */
  private def naiveBudget(docsWithHost: org.apache.spark.sql.DataFrame,
      ranks: org.apache.spark.sql.DataFrame, slotsPerUnit: Int = 20) = {
    import org.apache.spark.sql.expressions.Window
    val wr = docsWithHost
      .join(ranks.select(col("host"), col("rank_ppb").cast("long").as("rank_ppb")),
        Seq("host"), "left")
      .withColumn("rank_ppb", coalesce(col("rank_ppb"), lit(0L)))
    val counts = wr.groupBy("host", "rank_ppb")
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("n_take", expr(
        s"least(n_docs, 1 + (rank_ppb * $slotsPerUnit) DIV 1000000000)"))
    val taken = wr
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("host")).orderBy(col("doc_id").asc)))
      .join(counts.select("host", "n_take"), Seq("host"))
      .filter(col("__rn") <= col("n_take"))
      .groupBy("host").agg(sum(col("doc_id")).as("taken_sum"))
    counts.join(taken, Seq("host"), "left")
      .select(col("host"), col("rank_ppb"),
        col("n_docs").cast("long").as("n_docs"),
        col("n_take").cast("long").as("n_take"),
        coalesce(col("taken_sum"), lit(0L)).as("taken_sum"))
  }

  test("rankWeightedBudget two-phase == naive window on a planted mega-host") {
    // one host holds 20,000 docs with a full-mass rank (n_take binds at
    // 1 + 20 = 21 — every salt shard and the phase-2 boundary exercised),
    // siblings small: a rank-0 host (n_take = 1) and an unranked host
    val docs = ((1L to 20000L).map(i => (i * 3 + 1, "mega.com")) ++
        (1L to 40L).map(i => (1000000L + i, "small.com")) ++
        Seq((2000001L, "norank.com"), (2000002L, "norank.com")))
      .toDF("doc_id", "host")
    val ranks = Seq(("mega.com", 999999999L), ("small.com", 0L))
      .toDF("host", "rank_ppb")
    val cols = Seq("host", "rank_ppb", "n_docs", "n_take", "taken_sum")
    for (salts <- Seq(4, 16)) {
      val got = LinkGraph.rankWeightedBudget(docs, ranks, salts = salts)
        .select(cols.map(col): _*)
      val want = naiveBudget(docs, ranks).select(cols.map(col): _*)
      assert(got.exceptAll(want).count() == 0L && want.exceptAll(got).count() == 0L,
        s"two-phase diverged from the naive window at salts=$salts")
    }
  }

  test("rankWeightedBudget plan pin: the take's row-level windows partition by (host, salt)") {
    val docs = (1L to 1000L).map(i => (i, "m.com")).toDF("doc_id", "host")
    val ranks = Seq(("m.com", 500000000L)).toDF("host", "rank_ppb")
    val plan = LinkGraph.rankWeightedBudget(docs, ranks)
      .queryExecution.optimizedPlan.toString
    val windows = plan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windows.nonEmpty, plan)
    // phase 1 (rn1) must carry the salt in its partition spec — no
    // window over the doc table may partition by host alone; phase 2
    // (rnk) re-ranks the ≤ salts·n_take survivors, which is bounded
    val phase1 = windows.filter(_.contains("rn1"))
    assert(phase1.nonEmpty, plan)
    // the salt lands as a projected pmod alias (_w0) inside the rn1
    // window's partition spec
    assert(phase1.forall(w => w.contains("_w0")), plan)
    assert(plan.contains("pmod(doc_id"), plan)
  }
}
