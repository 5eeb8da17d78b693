package graft

import org.apache.spark.sql.functions._
import graft.clean.HtmlFns

/** HTML → text extraction: rule-by-rule planted fixtures (chrome drop,
  * script/style containment, entity decode order, the documented
  * nested-element truncation), the Corpus entry point, and streaming ≡
  * batch parity of the shared rule chain.
  */
class HtmlFnsSpec extends SparkSuite {
  import spark.implicits._

  private def extract(html: String): String =
    Seq(html).toDF("html").select(HtmlFns.htmlToText(col("html"))).collect()(0).getString(0)

  test("chrome elements (nav/header/footer/aside) drop WITH their content") {
    val html = "<body><nav><a href='/'>Home</a> About</nav>" +
      "<header><h1>Banner words</h1></header>" +
      "<p>real content stays</p>" +
      "<aside>related links</aside><footer>copyright footer</footer></body>"
    assert(extract(html) == "real content stays")
  }

  test("script/style/noscript content never leaks, even fake markup inside") {
    val html = "<head><style>p{margin:0}</style>" +
      "<script>var t = \"<p>fake paragraph</p>\";</script></head>" +
      "<body><noscript>enable js</noscript><p>kept</p></body>"
    assert(extract(html) == "kept")
  }

  test("head element drops entirely (title is not content)") {
    assert(extract("<head><title>Site Title</title></head><body>body text</body>")
      == "body text")
  }

  test("entity decode: fixed set, &amp; decoded LAST") {
    assert(extract("<p>Tom &amp; Jerry &lt;3 say &quot;hi&quot;&nbsp;&#39;ok&#39;</p>")
      == "Tom & Jerry <3 say \"hi\" 'ok'")
    // double-encoded stays one level encoded: &amp;lt; -> literal "&lt;"
    assert(extract("<p>&amp;lt;</p>") == "&lt;")
  }

  test("comments drop; whitespace runs collapse; output is trimmed") {
    // source newlines are layout (collapsed); block tags are the ONLY
    // newline source, so the two <p> blocks land on separate lines
    assert(extract("  <p>a</p> <!-- tracking\n pixel --> \n\t <p>b\n\nc</p> ")
      == "a\nb c")
  }

  test("documented caveat: nested same-tag element truncates at inner close") {
    // non-greedy first-close: the outer <header> closes at the INNER
    // </header>, so the tail of the outer element survives as text —
    // deterministic, identical in both engines (HtmlFns scaladoc)
    assert(extract("<header>outer <header>inner</header> tail</header><p>x</p>")
      == "tail\nx")
  }

  test("block-level tags emit line boundaries; inline tags emit spaces") {
    // p/br/li/div/h1-6/tr are boundaries (open or close, self-closing
    // included); b/em/span/a are not — Gopher/CCNet line statistics see
    // real lines (round-9 verdict #3)
    assert(extract("<p>one <b>bold</b> line</p><p>two</p>") == "one bold line\ntwo")
    assert(extract("first<br/>second<br>third") == "first\nsecond\nthird")
    assert(extract("<ul><li>alpha</li><li>beta</li></ul><h2>head</h2><div>body</div>")
      == "alpha\nbeta\nhead\nbody")
    assert(extract("<table><tr><td>r1c1</td><td>r1c2</td></tr><tr><td>r2</td></tr></table>")
      == "r1c1 r1c2\nr2")
    // no empty lines, no spaces at line edges
    assert(extract("<p> padded </p>\n\n<p></p><p>next</p>") == "padded\nnext")
  }

  test("planted duplicated promo paragraph: caught by dup-LINE count, missed by word-window proxy") {
    val s = spark
    import s.implicits._
    // the x_html3 contrast on a hand-planted page: the promo <p> repeats
    // above and below a 40-word body
    val body = (1 to 40).map(i => s"w$i").mkString(" ")
    val page = s"<html><body><p>Subscribe to our newsletter today</p><div>$body</div>" +
      "<p>Subscribe to our newsletter today</p></body></html>"
    val x = graft.api.Corpus.fromHtml(Seq((1L, page)).toDF("doc_id", "html")).df
    val lines = graft.ext.PipelineOps8.segmentsAuto(x)
      .groupBy("doc_id", "seg").count().collect()
    // 3 lines: promo (x2, ONE group with count 2) + body
    assert(lines.map(_.getLong(2)).sorted.toSeq == Seq(1L, 2L))
    val words = graft.ext.PipelineOps8.segments(x)
      .groupBy("doc_id", "seg").count().collect()
    // 50 tokens -> 4 word-window segments, all distinct: the proxy misses
    assert(words.length == 4 && words.forall(_.getLong(2) == 1L))
  }

  test("Corpus.fromHtml extracts text, drops markup column, refreshes n_chars") {
    val pages = Seq((1L, "<body><nav>chrome</nav><p>five real words here now</p></body>", 999L))
      .toDF("doc_id", "html", "n_chars")
    val out = graft.api.Corpus.fromHtml(pages).df.collect()(0)
    assert(out.getAs[String]("text") == "five real words here now")
    assert(out.getAs[Long]("n_chars") == 24L, "n_chars must describe the EXTRACTED text")
    assert(!graft.api.Corpus.fromHtml(pages).df.columns.contains("html"))
  }

  test("fromHtml with htmlCol == \"text\" extracts in place, drops nothing") {
    val pages = Seq((1L, "<body><nav>x</nav><p>kept words</p></body>", "en"))
      .toDF("doc_id", "text", "lang")
    val out = graft.api.Corpus.fromHtml(pages, htmlCol = "text").df
    assert(out.columns.toSet == Set("doc_id", "text", "lang"))
    assert(out.collect()(0).getAs[String]("text") == "kept words")
    val streamed = graft.streaming.DocStreams.htmlExtracted(pages, htmlCol = "text")
    assert(streamed.collect()(0).getAs[String]("text") == "kept words")
  }

  test("structure signals: anchors, link density numerator, noindex edges") {
    import graft.clean.HtmlFns
    val s = spark
    import s.implicits._
    val rows = Seq(
      // inner tags inside an anchor stripped from the char count: "Bold link" = 9
      (1L, "<body><a href=\"/x\"><b>Bold</b> link</a><p>text here</p></body>"),
      // empty anchor counts as an anchor, contributes 0 chars
      (2L, "<body><a href=\"/y\"></a><p>t</p></body>"),
      // uppercase tag + attribute-order noindex variant; two paragraphs
      (3L, "<HTML><META NAME=\"ROBOTS\" CONTENT=\"NOINDEX\"><P>a</P><p>b</p></HTML>"),
      // robots meta WITHOUT noindex does not trip the flag
      (4L, "<meta name=\"robots\" content=\"index,follow\"><p>c</p>"),
      (5L, "no markup at all")).toDF("doc_id", "html")
    val got = rows.select(col("doc_id"),
        HtmlFns.nAnchors(col("html")).as("na"),
        HtmlFns.anchorChars(col("html")).as("ac"),
        HtmlFns.nParagraphs(col("html")).as("np"),
        HtmlFns.noindex(col("html")).as("ni"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toList
    assert(got == List(
      (1L, 1L, 9L, 1L, 0L),
      (2L, 1L, 0L, 1L, 0L),
      (3L, 0L, 0L, 2L, 1L),
      (4L, 0L, 0L, 1L, 0L),
      (5L, 0L, 0L, 0L, 0L)), got.mkString(", "))
  }

  test("streaming extraction == batch extraction on the same pages") {
    val dir = "/root/testdata/sf0.001"
    def pages(df: org.apache.spark.sql.DataFrame) = df.select(col("doc_id"),
      concat(lit("<body><nav>Home | About</nav><p>"), col("text"),
        lit("</p><footer>c</footer></body>")).as("html"))
    val streaming = graft.streaming.DocStreams.htmlExtracted(
      pages(graft.streaming.DocStreams.readStream(spark, dir)))
    val q = streaming.writeStream.outputMode("append")
      .format("memory").queryName("html_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("html_out").orderBy("doc_id").collect().toSeq
      val want = graft.streaming.DocStreams.htmlExtracted(
        pages(Tables(spark, dir, "documents"))).orderBy("doc_id").collect().toSeq
      assert(got.nonEmpty && got == want)
    } finally q.stop()
  }
}
