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
    assert(extract("  <p>a</p> <!-- tracking\n pixel --> \n\t <p>b\n\nc</p> ")
      == "a b c")
  }

  test("documented caveat: nested same-tag element truncates at inner close") {
    // non-greedy first-close: the outer <header> closes at the INNER
    // </header>, so the tail of the outer element survives as text —
    // deterministic, identical in both engines (HtmlFns scaladoc)
    assert(extract("<header>outer <header>inner</header> tail</header><p>x</p>")
      == "tail x")
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
