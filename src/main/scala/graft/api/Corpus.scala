package graft.api

import graft.ext.Similarity
import graft.GraftExtensions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fluent corpus-pipeline API: composes the engine's text/dedup/similarity
  * operators into the standard pre-training data flow. Every stage is a
  * lazy DataFrame transformation — nothing executes until an action — so
  * chained stages fuse into one plan wherever Catalyst allows.
  *
  * {{{
  * Corpus(spark, "/data/sf0.01")
  *   .withQualitySignals()
  *   .filterQuality(minWords = 5, maxWords = 2000)
  *   .dedupExact()
  *   .withFingerprints()
  *   .df
  * }}}
  */
final case class Corpus(df: DataFrame) {

  private def chain(f: DataFrame => DataFrame): Corpus = Corpus(f(df))

  /** Whitespace tokenization column (idempotent). */
  def withTokens(col_ : String = "text"): Corpus =
    chain(_.withColumn("ws", split(col(col_), " ")))

  /** Quality signals: char/word counts, letter ratio (ppm), stopword ratio. */
  def withQualitySignals(): Corpus = withTokens().chain {
    _.withColumn("len_chars", length(col("text")).cast("long"))
      .withColumn("n_words", size(col("ws")).cast("long"))
      .withColumn("letter_ppm",
        expr("(CAST(length(regexp_replace(text, '[^a-z]', '')) AS BIGINT) * 1000000) DIV len_chars"))
  }

  /** Length gate — the standard corpus filter. */
  def filterQuality(minWords: Long, maxWords: Long): Corpus =
    chain(_.filter(col("n_words").between(minWords, maxWords)))

  /** Exact dedup on content hash; deterministic smallest-id survivor. */
  def dedupExact(idCol: String = "doc_id", textCol: String = "text"): Corpus = chain { d =>
    val w = Window.partitionBy(md5(col(textCol))).orderBy(col(idCol))
    d.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Near-dup candidate REMOVAL by MinHash-LSH: drops the higher-id doc of
    * every full-band collision (see ext.Dedup.x_ded2 for the checked
    * candidate-generation semantics).
    */
  def dedupNearMinHash(): Corpus = chain { d =>
    val words = d.select(col("doc_id"), split(col("text"), " ").as("ws0"))
      .filter(size(col("ws0")) >= 3)
    val shingles = words.select(col("doc_id"), explode(expr(
      "transform(sequence(1, size(ws0) - 2), i -> concat_ws(' ', element_at(ws0, i), element_at(ws0, i + 1), element_at(ws0, i + 2)))"))
      .as("s")).distinct()
    val mins = (0 to 7).map(h => min(md5(concat(lit(s"$h|"), col("s")))).as(s"mh$h"))
    val sig = shingles.groupBy("doc_id").agg(mins.head, mins.tail: _*)
    val bands = sig.select(col("doc_id"), explode(array(
      struct(lit(0L).as("band"), concat_ws("|", (0 to 3).map(h => col(s"mh$h")): _*).as("sigv")),
      struct(lit(1L).as("band"), concat_ws("|", (4 to 7).map(h => col(s"mh$h")): _*).as("sigv"))))
      .as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.sigv").as("sigv"))
    val a = bands.select(col("doc_id").as("a_id"), col("band"), col("sigv"))
    val b = bands.select(col("doc_id").as("b_id"), col("band").as("band_b"), col("sigv").as("sigv_b"))
    val losers = a.join(b,
        a("band") === b("band_b") && a("sigv") === b("sigv_b") && a("a_id") < b("b_id"))
      .select(col("b_id").as("doc_id")).distinct()
    d.join(losers, Seq("doc_id"), "left_anti")
  }

  /** Content + bag-of-words fingerprints (rolling_hash needs
    * GraftExtensions registered on the session).
    */
  def withFingerprints(): Corpus = chain { d =>
    GraftExtensions.register(d.sparkSession)
    d.withColumn("content_fp", expr("rolling_hash(text)"))
      .withColumn("bow_fp",
        md5(array_join(array_sort(array_distinct(split(col("text"), " "))), " ")))
  }

  /** Keep documents whose declared language is in the allow-list. */
  def filterLanguages(langs: String*): Corpus =
    chain(_.filter(col("lang").isin(langs: _*)))
}

object Corpus {
  /** Entry point over the standard documents table. */
  def apply(spark: SparkSession, dir: String): Corpus =
    Corpus(graft.Tables(spark, dir, "documents"))

  /** Embedding-side entry: quantized vectors + norms, ready for
    * similarity operators (shares Similarity.intVec).
    */
  def vectors(spark: SparkSession, dir: String): DataFrame = {
    GraftExtensions.register(spark)
    graft.Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"), expr(Similarity.intVec).as("v"))
      .withColumn("n2", expr("dot_d(v, v)"))
  }
}
