package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** lev_bytes: parity with codepoint Levenshtein on single-byte text, the
  * byte-edit upper bound on multibyte text, and interpreted == codegen.
  */
class LevBytesSpec extends SparkSuite {
  import spark.implicits._

  private def lv(a: String, b: String): Long =
    graft.functions.LevBytes.compute(
      UTF8String.fromString(a), UTF8String.fromString(b))

  test("classic fixtures and edges") {
    assert(lv("kitten", "sitting") == 3L)
    assert(lv("", "") == 0L)
    assert(lv("", "abc") == 3L)
    assert(lv("abc", "") == 3L)
    assert(lv("same", "same") == 0L)
    assert(lv("abcd", "abxd") == 1L)
  }

  test("equals Spark's builtin levenshtein on random ASCII strings") {
    val r = new scala.util.Random(7)
    val words = Vector("key", "agg", "row", "scan", "slow", "fast", "a", "the")
    def doc() = (1 to r.nextInt(40) + 1).map(_ => words(r.nextInt(words.size))).mkString(" ")
    val pairs = (1 to 200).map(_ => (doc(), doc()))
    pairs.foreach { case (a, b) =>
      assert(lv(a, b) ==
        UTF8String.fromString(a).levenshteinDistance(UTF8String.fromString(b)).toLong,
        s"mismatch on ($a, $b)")
    }
  }

  test("multibyte text: byte distance upper-bounds codepoint distance") {
    val a = "café au lait"
    val b = "cafe au lait"
    val cp = UTF8String.fromString(a).levenshteinDistance(UTF8String.fromString(b)).toLong
    assert(lv(a, b) >= cp)
  }

  test("interpreted == codegen through SQL, null-safe") {
    graft.GraftExtensions.register(spark)
    val df = Seq(("kitten", "sitting"), ("abc", "abc"), (null, "x"), ("x", null))
      .toDF("a", "b")
    val viaSql = df.select(expr("lev_bytes(a, b)").as("d")).collect().map(r =>
      if (r.isNullAt(0)) null else r.getLong(0))
    assert(viaSql.toSeq == Seq(3L, 0L, null, null))
    // force the interpreted path via eval on a literal expression
    import org.apache.spark.sql.catalyst.expressions.Literal
    val interp = graft.functions.LevBytes(Literal("kitten"), Literal("sitting")).eval(null)
    assert(interp == 3L)
  }
}
