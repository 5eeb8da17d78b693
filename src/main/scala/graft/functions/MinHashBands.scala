package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash LSH band signatures of a document, computed per row in ONE
  * narrow pass — exactly `ext.Dedup.minhashBands`'s semantics:
  *
  *   - 3-word shingles over the shared whitespace tokenizer
  *     (`Tok.split` ≡ `CleanFns.tokens`: split on whitespace runs, empty
  *     tokens dropped); docs under 3 tokens yield an EMPTY array (explode
  *     then produces no rows, matching the declarative `size >= 3` filter);
  *   - 8 min-hashes: per shingle s and hash h in 0..7, md5 of "h|s"; the
  *     min is over the lowercase-hex strings, which equals unsigned
  *     byte-wise comparison on the raw 16-byte digests (computed that
  *     way — no per-shingle hex conversion);
  *   - 2 band signatures: md5 of "0:mh0|1:mh1|2:mh2|3:mh3" and
  *     "4:mh4|...|7:mh7".
  *
  * Why native: the declarative form explodes one row per shingle and
  * aggregates 8 sibling mins per doc — a corpus-wide keyed shuffle before
  * any candidate is generated. This expression emits both band sigs inside
  * the scan's codegen loop: signature generation costs zero exchanges at
  * any corpus size; the only remaining shuffle in the LSH path is the
  * band-bucket join itself. x_ded2b verifies it against x_ded2's exact
  * DuckDB oracle.
  */
case class MinHashBands(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_bands"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"minhash_bands expects STRING input, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any =
    MinHashBands.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashBands.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): MinHashBands =
    copy(child = newChild)
}

object MinHashBands {

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val hexChars = "0123456789abcdef".toCharArray

  private def toHex(d: Array[Byte]): String = {
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexChars((d(i) & 0xff) >>> 4)
      out(2 * i + 1) = hexChars(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Unsigned byte-wise less-than == lexicographic order of the hex form. */
  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val x = a(i) & 0xff; val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  /** Shared by the interpreted and codegen paths — they cannot diverge. */
  def compute(s: UTF8String): ArrayData = {
    val words = Tok.split(s.toString)
    if (words.length < 3) return new GenericArrayData(Array.empty[Any])
    val digest = md5.get()
    val mins = new Array[Array[Byte]](8)
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    var i = 0
    while (i <= words.length - 3) {
      val shingle = words(i) + " " + words(i + 1) + " " + words(i + 2)
      var h = 0
      while (h < 8) {
        val d = digest.digest((h.toString + "|" + shingle).getBytes(utf8))
        if (mins(h) == null || less(d, mins(h))) mins(h) = d
        h += 1
      }
      i += 1
    }
    def bandSig(from: Int): UTF8String = {
      val sb = new StringBuilder(4 * 35)
      var h = from
      while (h < from + 4) {
        if (h > from) sb.append('|')
        sb.append(h).append(':').append(toHex(mins(h)))
        h += 1
      }
      UTF8String.fromString(toHex(digest.digest(sb.toString.getBytes(utf8))))
    }
    new GenericArrayData(Array[Any](bandSig(0), bandSig(4)))
  }

  /** Column API (requires GraftExtensions registration). */
  def minhash_bands(c: Column): Column =
    org.apache.spark.sql.functions.call_function("minhash_bands", c)
}
