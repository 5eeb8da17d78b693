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

  test("resolveHref: rule-by-rule resolution and drops") {
    val page = "https://Site.example.com/dir/page?x=1"
    val cases = Seq(
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
      ("#frag", null),
      ("rel/path.html", null), // relative paths are out of the rule chain
      ("", null))
    val got = cases.map(_._1).toDF("href")
      .select(col("href"),
        LinkGraph.resolveHref(lit(page), col("href")).as("r"))
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    cases.foreach { case (href, want) =>
      assert(got(href) == want, s"href=$href got=${got(href)} want=$want")
    }
  }

  test("extractLinks entity-decodes hrefs at the HTML layer") {
    val html = """<a href="https://a.com/q?x=1&amp;y=2">t</a>"""
    val got = graft.ext.LinkGraph.extractLinks(
        Seq(("https://s.com/p", html)).toDF("url", "html"))
      .collect().map(_.getString(1)).toList
    assert(got == List("https://a.com/q?x=1&y=2"), got.toString)
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

  test("pageRankHosts == in-memory reference model (dangling + no-inbound)") {
    // a -> b, a -> c, b -> a; c dangling (mass leaks, classic simplified
    // PR); d -> a gives a an extra inbound; nothing points at d
    // (teleport only). Duplicate and self edges planted — must be inert.
    val edges = Seq(
      ("a", "b"), ("a", "c"), ("b", "a"), ("d", "a"),
      ("a", "b"), // duplicate
      ("b", "b") // self loop
    ).toDF("src", "dst")
    val got = LinkGraph.pageRankHosts(edges, iters = 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap

    // independent reference: same integer formulation, plain Scala
    val es = Set(("a", "b"), ("a", "c"), ("b", "a"), ("d", "a"))
    val verts = es.flatMap(e => Seq(e._1, e._2)).toList.sorted
    val n = verts.size.toLong
    val deg = es.groupBy(_._1).map { case (s, xs) => s -> xs.size.toLong }
    var r = verts.map(_ -> 1000000000L / n).toMap
    val tele = (1000000000L * 15L / 100L) / n
    for (_ <- 1 to 5) {
      val in = es.toSeq.map { case (u, v) => v -> r(u) / deg(u) }
        .groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2).sum }
      r = verts.map(v => v -> (tele + 85L * in.getOrElse(v, 0L) / 100L)).toMap
    }
    assert(got == r, s"got=$got want=$r")
    // sanity on the shape: a has two inbound sources, d teleport-only
    assert(got("a") > got("b") && got("d") == tele)
    // the distributed loop (local endgame gated OFF) computes the same
    // recurrence — the gate is a route choice, never a semantics choice
    val dist = LinkGraph.pageRankHosts(edges, iters = 5, localMaxEdges = -1L)
      .collect().map(r2 => (r2.getString(0), r2.getLong(1))).toMap
    assert(dist == got, s"distributed=$dist local=$got")
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
}
