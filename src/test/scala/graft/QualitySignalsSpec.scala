package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Native quality_signals ≡ the HOF tower it replaced in
  * addQualityRuleSignals (the x_txt11 path); interpreted ≡ codegen.
  */
class QualitySignalsSpec extends SparkSuite {
  private val dir = "/root/testdata/sf0.001"

  /** The pre-round-7 declarative form, kept verbatim as the reference. */
  private def hofSignals(docs: DataFrame): DataFrame =
    docs
      .withColumn("__w", graft.clean.CleanFns.tokens(lower(col("text"))))
      .withColumn("n_words", size(col("__w")).cast("long"))
      .withColumn("mean_len_c",
        expr("aggregate(__w, 0L, (acc, x) -> acc + length(x)) * 100 DIV nullif(size(__w), 0)"))
      .withColumn("alpha_ppm",
        expr("size(filter(__w, x -> x rlike '[a-z]')) * 1000000L DIV nullif(size(__w), 0)"))
      .withColumn("stop_hits",
        expr("size(filter(__w, x -> array_contains(array('the','and','of','to','a','in','is','that'), x)))")
          .cast("long"))
      .withColumn("keep", expr(
        """CAST(CASE WHEN n_words BETWEEN 10 AND 100000 AND mean_len_c BETWEEN 200 AND 1000
          |  AND alpha_ppm >= 600000 AND stop_hits >= 2 THEN 1 ELSE 0 END AS BIGINT)""".stripMargin))
      .drop("__w")

  private val cols = Seq("n_words", "mean_len_c", "alpha_ppm", "stop_hits", "keep")

  private def assertSame(docs: DataFrame): Unit = {
    val nat = graft.ext.PipelineOps3.addQualityRuleSignals(docs)
      .select("doc_id", cols: _*)
    val hof = hofSignals(docs).select("doc_id", cols: _*)
    assert(nat.exceptAll(hof).count() == 0L && hof.exceptAll(nat).count() == 0L,
      "native quality_signals diverged from the HOF tower")
  }

  test("native == HOF tower on the real corpus") {
    assertSame(Tables(spark, dir, "documents"))
  }

  test("native == HOF tower on edge cases") {
    import spark.implicits._
    val docs = Seq(
      (1L, ""),                                       // empty -> 0 words, null ratios
      (2L, "   \t\n\f\r  "),                    // whitespace-only (every \s class)
      (3L, "The AND Of tO a In IS THAT"),             // stopwords via lower()
      (4L, "thee island although toto a2z"),          // near-stopwords must NOT hit
      (5L, "naïve café 中文 字 mixed ascii123 42 --"), // multibyte chars + no-alpha tokens
      (6L, ("the quick brown fox is running over that lazy dog in a field of rye and barley " * 3)),
      (7L, "x " * 15),                                // 15 one-char words -> mean_len_c = 100
      (8L, "²³ ¼½ ©®")                                // multibyte, zero alpha
    ).toDF("doc_id", "text")
    assertSame(docs)
  }

  test("interpreted eval == codegen-backed DataFrame result") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val texts = Seq("the cat sat", "", "  a  ", "中文 the 字", "tabs\there\tand the end")
    val viaDf = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"), expr("quality_signals(text)").as("q"))
      .select(col("id"), col("q.n_words"), col("q.sum_len"), col("q.n_alpha"), col("q.n_stop"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val r = graft.functions.QualitySignals.compute(UTF8String.fromString(t))
      assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == viaDf(i.toLong),
        s"text=$t")
    }
  }

  test("exact counters on a hand-computed document") {
    val r = graft.functions.QualitySignals.compute(
      UTF8String.fromString("the naïve cat is in 中文 42 the"))
    assert(r.getLong(0) == 8L)   // n_words
    assert(r.getLong(1) == 22L)  // chars: 3+5+3+2+2+2+2+3 (naïve=5, 中文=2)
    assert(r.getLong(2) == 6L)   // alpha: all but 中文 and 42
    assert(r.getLong(3) == 4L)   // the x2, is, in
  }
}
