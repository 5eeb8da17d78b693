package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Native ngram_md5 ≡ the declarative sort(distinct(transform(md5))) form
  * it replaces in novelty scoring; interpreted ≡ codegen.
  */
class NgramMd5Spec extends SparkSuite {
  private val dir = "/root/testdata/sf0.001"

  private def declarative(n: Int) = expr(
    s"""array_sort(array_distinct(transform(sequence(1, size(__ws) - ${n - 1}),
       |  i -> md5(concat_ws(' ', ${(0 until n).map(j => s"element_at(__ws, i + $j)").mkString(", ")})))))""".stripMargin)

  test("expression == declarative HOF form on the real corpus (n = 4 and 2)") {
    GraftExtensions.register(spark)
    val docs = Tables(spark, dir, "documents")
    for (n <- Seq(2, 4)) {
      val both = docs
        .withColumn("__ws", graft.clean.CleanFns.tokens(col("text")))
        .filter(size(col("__ws")) >= n)
        .select(col("doc_id"), expr(s"ngram_md5(text, $n)").as("nat"),
          declarative(n).as("dec"))
      val diff = both.filter(col("nat") =!= col("dec")).count()
      assert(diff == 0L, s"n=$n: native diverged from declarative on $diff docs")
      assert(both.count() > 0)
    }
  }

  test("edge cases: short docs empty, dirty whitespace, duplicate grams collapse") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val d = Seq(
      (1L, "a b c"),            // < 4 tokens -> empty
      (2L, "a\t b\n c   d e"),  // dirty whitespace, same tokens as doc 3
      (3L, "a b c d e"),
      (4L, "a b c d a b c d a b c d")) // repeats collapse via distinct
      .toDF("doc_id", "text")
      .select(col("doc_id"), expr("ngram_md5(text, 4)").as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(d(1L).isEmpty)
    assert(d(2L) == d(3L))
    assert(d(4L).length == 4) // 4 distinct grams of the repeated text
    assert(d(3L) == d(3L).sorted)
  }

  test("interpreted eval == codegen-backed DataFrame result") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val texts = Seq("x y z w v", "one two three four", "  lots\tof   space  here now ")
    val viaDf = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text").select(col("id"), expr("ngram_md5(text, 4)").as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val interp = graft.functions.NgramMd5.compute(UTF8String.fromString(t), 4)
      val strs = (0 until interp.numElements())
        .map(k => interp.getUTF8String(k).toString)
      assert(strs == viaDf(i.toLong), s"text=$t")
    }
  }
}
