package graft

import org.apache.spark.sql.functions._
import graft.clean.EncodingFns

/** Encoding repair: planted mojibake round trips, BOM/C1 stripping,
  * double-encoding pass semantics, no-false-fire guarantees on clean
  * text, and streaming ≡ batch parity.
  */
class EncodingFnsSpec extends SparkSuite {
  import spark.implicits._

  private def repair(s: String, passes: Int = 1): String =
    graft.api.Corpus(Seq((1L, s)).toDF("doc_id", "text"))
      .repairEncoding(passes).df.collect()(0).getAs[String]("text")

  test("the Ã©-class common table round-trips to the intended characters") {
    assert(repair("CafÃ©") == "Café")
    assert(repair("naÃ¯ve rÃ©sumÃ©") == "naïve résumé")
    assert(repair("dÃ©jÃ  vu") == "déjà vu") // nbsp continuation
    assert(repair("Ã­ndice") == "índice")    // soft-hyphen continuation
    assert(repair("KÃ¶ln, ZÃ¼rich, EspaÃ±a, FranÃ§ais") == "Köln, Zürich, España, Français")
    assert(repair("â€œquotedâ€ â€” â€˜oneâ€™ â€¦ â€¢ â‚¬5 XÂ®") ==
      "“quoted” — ‘one’ … • €5 X®")
    assert(repair("Â«xÂ» 5Â° aÂ·b Â¿quÃ©? Â¡sÃ­!") == "«x» 5° a·b ¿qué? ¡sí!")
  }

  test("BOM strips everywhere, C1 controls drop") {
    assert(repair("﻿start mid﻿dle end﻿") == "start middle end")
    assert(repair("abcd") == "abcd")
  }

  test("double encoding unwinds one level per pass") {
    assert(repair("ÃƒÂ©", passes = 1) == "Ã©")
    assert(repair("ÃƒÂ©", passes = 2) == "é")
  }

  test("double-encoded à and í unwind despite invisible continuations") {
    // à's continuation renders as "Â"+nbsp — which the single-level table
    // normalizes to a plain space — and í's as "Â"+soft-hyphen, which no
    // single-level rule covers: both need their composite entries
    assert(repair("dÃƒÂ©jÃƒÂ\u00a0 vu", passes = 2) == "déjà vu")
    assert(repair("ÃƒÂ\u00adntimo", passes = 2) == "íntimo")
    // the composite's output feeds the LATER single-level rule within
    // the same pass, so these two repair fully in ONE pass
    assert(repair("ÃƒÂ\u00a0", passes = 1) == "à")
    assert(repair("ÃƒÂ\u00ad", passes = 1) == "í")
  }

  test("clean text never fires: legit accents, quotes, and plain ASCII are untouched") {
    for (s <- Seq(
      "déjà vu — “fine” text…",
      "plain ascii with 'quotes' & symbols <ok>",
      // Ã before a PLAIN space is legit text (Portuguese "sÃO" style
      // false positives are the reason the table keys on nbsp, not space)
      "Ã is a letter",
      "ελληνικά 中文 русский")) {
      assert(repair(s) == s, s)
    }
  }

  test("repair refreshes carried n_chars to the repaired text") {
    val out = graft.api.Corpus(
      Seq((1L, "﻿CafÃ©", 999L)).toDF("doc_id", "text", "n_chars"))
      .repairEncoding().df.collect()(0)
    assert(out.getAs[String]("text") == "Café")
    assert(out.getAs[Long]("n_chars") == 4L)
  }

  test("streaming repair == batch repair on damaged pages") {
    val dir = "/root/testdata/sf0.001"
    def damage(df: org.apache.spark.sql.DataFrame) = df.select(col("doc_id"),
      concat(lit(graft.ext.PipelineOps15.planted), col("text")).as("text"))
    val streaming = graft.streaming.DocStreams.encodingRepaired(
      damage(graft.streaming.DocStreams.readStream(spark, dir)))
    val q = streaming.writeStream.outputMode("append")
      .format("memory").queryName("enc_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("enc_out").orderBy("doc_id").collect().toSeq
      val want = graft.streaming.DocStreams.encodingRepaired(
        damage(Tables(spark, dir, "documents"))).orderBy("doc_id").collect().toSeq
      assert(got.nonEmpty && got == want)
    } finally q.stop()
  }
}
