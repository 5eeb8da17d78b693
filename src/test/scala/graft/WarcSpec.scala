package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.sources.Warc
import org.apache.spark.sql.functions._

/** Splittable WARC reader: hostile framing fixtures (magic inside a
  * payload, truncated tail, header-less noise between records), and the
  * split contract — many tiny Hadoop splits must yield exactly the
  * single-split record set.
  */
class WarcSpec extends SparkSuite {

  private def record(url: String, payload: String, extra: String = ""): String = {
    val bytes = payload.getBytes(StandardCharsets.UTF_8).length
    s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $url\r\n" +
      s"${extra}Content-Length: $bytes\r\n\r\n$payload\r\n\r\n"
  }

  private def writeWarc(content: String): String = {
    val dir = graft.util.TempDirs.scratch("warc_spec")
    Files.write(Paths.get(dir, "f.warc"), content.getBytes(StandardCharsets.UTF_8))
    dir
  }

  test("payload embedding the record magic is read intact (length-directed)") {
    val evil = "before WARC/1.0\r\nWARC-Type: fake\r\n\r\n after"
    val dir = writeWarc(record("http://a/1", evil) + record("http://a/2", "plain"))
    val rows = Warc.readRecords(spark, dir).orderBy("offset")
      .collect().map(r => (r.getString(2), r.getString(4))).toList
    assert(rows == List(("http://a/1", evil), ("http://a/2", "plain")))
  }

  test("truncated tail record is dropped, earlier records survive") {
    val full = record("http://a/1", "complete payload")
    val truncated = "WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: http://a/2\r\n" +
      "Content-Length: 1000\r\n\r\nonly a few bytes"
    val dir = writeWarc(full + truncated)
    val rows = Warc.readRecords(spark, dir).collect()
    assert(rows.length == 1 && rows(0).getString(2) == "http://a/1")
  }

  test("header-less noise between records is skipped by the sync scan") {
    val dir = writeWarc(
      record("http://a/1", "one") + "garbage bytes WARC/1.0\r\nnot: headers" +
        "no blank line terminator here just noise \r\n" + record("http://a/2", "two"))
    val rows = Warc.readRecords(spark, dir).orderBy("offset")
      .collect().map(_.getString(2)).toList
    assert(rows == List("http://a/1", "http://a/2"))
  }

  test("many tiny splits == one split, record for record") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val out = graft.util.TempDirs.scratch("warc_spec_split")
    docs.select(Warc.responseRecord(
        concat(lit("https://ex.com/doc/"), col("doc_id").cast("string")),
        concat(lit("<p>"), col("text"), lit("</p>"))).as("value"))
      .coalesce(1).write.mode("overwrite").text(out)
    def rows(split: Option[Long]) = Warc.readRecords(spark, out, split)
      .select("url", "content_length", "payload")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).sorted.toSeq
    val single = rows(None)
    val many = rows(Some(2048L))
    assert(single.nonEmpty && many == single)
    // and every record round-trips its exact byte length
    assert(single.forall { case (_, cl, p) =>
      cl == p.getBytes(StandardCharsets.UTF_8).length })
  }

  test("unicode payload round-trips byte-exactly through Content-Length") {
    val payload = "héllo wörld — ünïcode 你好   end"
    val dir = writeWarc(record("http://u/1", payload))
    val rows = Warc.readRecords(spark, dir).collect()
    assert(rows.length == 1 && rows(0).getString(4) == payload)
    assert(rows(0).getLong(3) == payload.getBytes(StandardCharsets.UTF_8).length)
  }
}
