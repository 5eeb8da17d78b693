package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.ext.Dedup
import graft.functions.NfkcCasefold

/** Script normalization for cross-lingual near-dedup: known NFKC+casefold
  * mappings, interpreted ≡ codegen, and the two x_ded23 pins —
  * normalization CHANGES candidates (a fullwidth copy becomes an LSH
  * pair) but never the verdict algebra (identical output on an
  * already-normalized corpus).
  */
class NfkcCasefoldSpec extends SparkSuite {
  import spark.implicits._

  private def norm(s: String): String = {
    graft.GraftExtensions.register(spark)
    Seq(s).toDF("t").select(expr("nfkc_casefold(t)")).collect()(0).getString(0)
  }

  test("known mappings: fullwidth, ligatures, case; ASCII == lower()") {
    assert(norm("Ｆｕｌｌｗｉｄｔｈ") == "fullwidth")
    assert(norm("maﬁa") == "mafia") // U+FB01 LATIN SMALL LIGATURE FI
    assert(norm("Hello World 123") == "hello world 123")
    // documented simplification: Locale.ROOT lowercase, not full casefold
    assert(norm("Straße") == "straße")
    // compatibility digits/spaces: superscript 2, no-break space
    assert(norm("x² y") == "x2 y")
  }

  test("interpreted eval == codegen-backed DataFrame result") {
    val e = NfkcCasefold(org.apache.spark.sql.catalyst.expressions.Literal
      .create("x", org.apache.spark.sql.types.StringType))
    val samples = Seq("ＡＢＣ def", "MiXeD Case", "", "ﬁﬂ ①")
    samples.foreach { s =>
      assert(e.compute(UTF8String.fromString(s)).toString == norm(s))
    }
  }

  test("normalization creates cross-script LSH candidates the plain chain misses") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    def fullwidth(s: String): String = s.map {
      case ' ' => ' '
      case c if c >= 'a' && c <= 'z' => (c - 'a' + 0xFF41).toChar
      case c => c
    }
    val docs = Seq((1L, base), (2L, fullwidth(base)),
      (3L, "completely different content nothing shared here at all ok")).toDF("doc_id", "text")
    def pairs(bands: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
      val a = bands.select(col("doc_id").as("a_id"), col("band"), col("sig"))
      val b = bands.select(col("doc_id").as("b_id"), col("band").as("band_b"), col("sig").as("sig_b"))
      a.join(b, a("band") === b("band_b") && a("sig") === b("sig_b") && a("a_id") < b("b_id"))
        .select("a_id", "b_id").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(pairs(Dedup.minhashBandsNormalized(docs)) == Set((1L, 2L)),
      "fullwidth copy must become a candidate of its ASCII original")
    assert(pairs(Dedup.minhashBands(docs)).isEmpty,
      "the unnormalized chain shares no shingles across scripts")
  }

  test("verdict algebra unchanged: normalized == plain on a normalized corpus") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .withColumn("text", lower(col("text"))) // already NFKC-normal ASCII
    val got = Dedup.minhashBandsNormalized(docs)
      .orderBy("doc_id", "band").collect().toSeq
    val want = Dedup.minhashBands(docs)
      .orderBy("doc_id", "band").collect().toSeq
    assert(got.nonEmpty && got == want)
  }
}
