package graft

import graft.ext.PageSignals
import org.apache.spark.sql.functions._

/** Canonical-link and meta-refresh edges the x_lnk7/x_url14 hashes
  * can't see: rel token boundaries, first-wins selection, base
  * interaction, quote/whitespace tolerance in refresh content, and the
  * self-reload shadow rule.
  */
class PageSignalsSpec extends SparkSuite {
  import spark.implicits._

  test("canonicalTargets: rel token filter, first wins, base resolution, no-link pages absent") {
    val pages = Seq(
      // stylesheet link first (skipped), then TWO canonical links —
      // the first wins; multi-token rel counts; 'canonicalish' does not
      ("https://a.com/p?s=1",
        "<link rel=\"stylesheet\" href=\"/css\">" +
          "<link rel=\"alternate canonical\" href=\"https://a.com/c1\">" +
          "<link rel=\"canonical\" href=\"https://a.com/c2\">"),
      ("https://a.com/q", "<link rel=\"canonicalish\" href=\"https://a.com/nope\">"),
      // relative canonical resolves against <base href>
      ("https://a.com/r",
        "<base href=\"https://b.com/dir/\"><link rel=canonical href=art>"),
      ("https://a.com/nolink", "<p>plain</p>"))
      .toDF("url", "html")
    val got = PageSignals.canonicalTargets(pages).collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(got == Map(
      "https://a.com/p?s=1" -> "https://a.com/c1",
      "https://a.com/r" -> "https://b.com/dir/art"), got.toString)
  }

  test("metaRefreshEdges: forms, self-reload shadow, decoys, first wins") {
    val pages = Seq(
      // quoted url, leading zero delay
      ("https://a.com/1", "<meta http-equiv=\"refresh\" content=\"0; url=/new\">"),
      // uppercase equiv, single-quoted attr, quoted url part
      ("https://a.com/2", "<meta http-equiv=REFRESH content='7;URL=\"https://x.com/t\"'>"),
      // bare delay = self reload, SHADOWS the later redirecting refresh
      ("https://a.com/3", "<meta http-equiv=\"refresh\" content=\"30\">" +
        "<meta http-equiv=\"refresh\" content=\"1; url=/late\">"),
      // http-equiv carrying something else; body text decoy
      ("https://a.com/4", "<meta http-equiv=\"content-type\" content=\"text/html\">" +
        "<p>content=\"0; url=/fake\"</p>"),
      // whitespace-tolerant parse
      ("https://a.com/5", "<meta http-equiv=\"refresh\" content=\" 12 ;  Url =  /sp \">"))
      .toDF("url", "html")
    val got = PageSignals.metaRefreshEdges(pages).collect()
      .map(r => (r.getString(0), (r.getString(1), r.getLong(2)))).toMap
    assert(got == Map(
      "https://a.com/1" -> (("https://a.com/new", 0L)),
      "https://a.com/2" -> (("https://x.com/t", 7L)),
      "https://a.com/5" -> (("https://a.com/sp", 12L))), got.toString)
  }
}
