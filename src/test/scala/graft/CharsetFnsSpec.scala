package graft

import graft.clean.CharsetFns
import org.apache.spark.sql.functions._

/** Declared-charset decode: byte-level pins on the cp1252 table, the
  * HTML5 label folding, resolution precedence, and the fixture round
  * trip.
  */
class CharsetFnsSpec extends SparkSuite {

  import spark.implicits._

  private def decodeOne(bytes: Array[Byte], contentType: String): (String, String) = {
    val df = Seq((bytes, contentType)).toDF("bin", "content_type")
    val cs = CharsetFns.resolveCharset(col("content_type"), col("bin"))
    val r = df.select(cs.as("cs"),
      CharsetFns.decodeCharset(col("bin"), cs).as("t")).collect()(0)
    (r.getString(0), r.getString(1))
  }

  test("cp1252 specials decode: 0x80-0x9F carry Windows-1252 meanings") {
    val bytes = Array(0x93, 'H', 'i', 0x94, ' ', 0x80, 0x99, 0x96, 0x85)
      .map(_.toByte)
    val (cs, t) = decodeOne(bytes, "text/html; charset=windows-1252")
    assert(cs == "windows-1252" && t == "“Hi” €™–…", s"$cs / $t")
  }

  test("Latin-1 family labels fold into windows-1252 (HTML5 rule)") {
    val bytes = Array[Byte](0x80.toByte, 0xE9.toByte) // € then é
    for (label <- Seq("iso-8859-1", "latin1", "ISO-8859-1", "us-ascii", "cp1252"))
      assert(decodeOne(bytes, s"text/html; charset=$label") == ("windows-1252", "€é"),
        label)
  }

  test("the five cp1252-undefined bytes keep their C1 identity") {
    val bytes = Array(0x81, 0x8D, 0x8F, 0x90, 0x9D).map(_.toByte)
    val (_, t) = decodeOne(bytes, "text/html; charset=windows-1252")
    assert(t == "", t.map(_.toInt).mkString(","))
  }

  test("utf-8 declared decodes multibyte sequences") {
    val bytes = "déjà €".getBytes("UTF-8")
    assert(decodeOne(bytes, "text/html; charset=UTF-8") == ("utf-8", "déjà €"))
  }

  test("resolution precedence: Content-Type beats meta beats default") {
    val page1252 = "<meta charset=\"utf-8\">x".getBytes("ISO-8859-1")
    // header says 1252, meta says utf-8: header wins
    assert(decodeOne(page1252, "text/html; charset=windows-1252")._1 == "windows-1252")
    // no header charset: meta wins
    assert(decodeOne(page1252, "text/html")._1 == "utf-8")
    // nothing anywhere: default (utf-8)
    assert(decodeOne("plain".getBytes("UTF-8"), "text/html")._1 == "utf-8")
    // http-equiv form sniffs too
    val equiv = ("<meta http-equiv=\"Content-Type\" " +
      "content=\"text/html; charset=windows-1252\">").getBytes("ISO-8859-1")
    assert(decodeOne(equiv, "text/html")._1 == "windows-1252")
  }

  test("an unknown label falls through to the next source") {
    val page = "<meta charset=\"windows-1252\">y".getBytes("ISO-8859-1")
    assert(decodeOne(page, "text/html; charset=klingon")._1 == "windows-1252")
  }

  test("charsetStatus: unsupported labels are authoritative at their tier") {
    def statusOf(bytes: Array[Byte], ct: String): String =
      Seq((bytes, ct)).toDF("bin", "content_type")
        .select(CharsetFns.charsetStatus(col("content_type"), col("bin")).as("s"))
        .collect()(0).getString(0)
    // declared Shift_JIS: detected, NOT fallen through to meta/default
    val metaUtf8 = "<meta charset=\"utf-8\">x".getBytes("ISO-8859-1")
    assert(statusOf(metaUtf8, "text/html; charset=Shift_JIS") == "unsupported:shift_jis")
    // meta-only GBK detected when the header carries no charset
    val metaGbk = "<meta charset=\"GBK\">x".getBytes("ISO-8859-1")
    assert(statusOf(metaGbk, "text/html") == "unsupported:gbk")
    // unrecognized garbage labels still fall through (header garbage →
    // meta; nothing → default), matching resolveCharset
    val meta1252 = "<meta charset=\"windows-1252\">y".getBytes("ISO-8859-1")
    assert(statusOf(meta1252, "text/html; charset=klingon") == "windows-1252")
    assert(statusOf("plain".getBytes("UTF-8"), "text/html") == "utf-8")
    // supported labels resolve exactly like resolveCharset
    assert(statusOf(metaUtf8, "text/html; charset=latin-1") == "windows-1252")
  }

  test("fixture round trip: unfix + ISO-8859-1 bytes decode back exactly") {
    val original = graft.ext.PipelineOps16.planted2 + "plain ascii tail"
    val df = Seq(original).toDF("t")
      .select(encode(CharsetFns.cp1252Unfix(col("t")), "ISO-8859-1").as("bin"))
    val got = df.select(
      CharsetFns.decodeCharset(col("bin"), lit("windows-1252")).as("t"))
      .collect()(0).getString(0)
    assert(got == original, got)
  }
}
