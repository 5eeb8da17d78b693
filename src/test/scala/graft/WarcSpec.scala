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
      .select("offset", "url", "content_length", "payload")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
      .sorted.toSeq
    val single = rows(None)
    val many = rows(Some(2048L))
    // offset included: the reported record position is split-invariant
    assert(single.nonEmpty && many == single)
    // and every record round-trips its exact byte length
    assert(single.forall { case (_, _, cl, p) =>
      cl == p.getBytes(StandardCharsets.UTF_8).length })
  }

  test("a record whose magic starts exactly at a split boundary is emitted ONCE") {
    val r1 = record("http://a/1", "first record payload")
    val r2 = record("http://a/2", "second record payload")
    val dir = writeWarc(r1 + r2)
    // split size = |r1| puts the boundary exactly at r2's magic: reader 0
    // must NOT claim it (ownership = the split the magic BEGINS in)
    val rows = Warc.readRecords(spark, dir,
        Some(r1.getBytes(StandardCharsets.UTF_8).length.toLong))
      .collect().map(_.getString(2)).sorted.toList
    assert(rows == List("http://a/1", "http://a/2"), rows.mkString(", "))
  }

  test("an embedded HTTP response (Content-Length, no WARC-Type) is not a record") {
    // the common false-sync candidate: payload is a raw HTTP response
    val http = "WARC/1.0\r\nHTTP/1.1 200 OK\r\nContent-Length: 5\r\n\r\nhello"
    val dir = writeWarc(record("http://a/1", http) + record("http://a/2", "two"))
    // force tiny splits so mid-payload syncs actually happen
    val rows = Warc.readRecords(spark, dir, Some(64L))
      .collect().map(_.getString(2)).sorted.toList
    assert(rows == List("http://a/1", "http://a/2"), rows.mkString(", "))
  }

  test("decorated or absurd Content-Length values don't kill the scan") {
    val good = record("http://a/1", "fine")
    val decorated = "WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: http://a/2\r\n" +
      "Content-Length: 3;chunked\r\n\r\nabc\r\n\r\n"
    val absurd = "WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: http://a/3\r\n" +
      "Content-Length: 99999999999999999999999\r\n\r\nxyz\r\n\r\n"
    val dir = writeWarc(good + decorated + absurd)
    val rows = Warc.readRecords(spark, dir)
      .collect().map(r => (r.getString(2), r.getLong(3))).sortBy(_._1).toList
    // decorated length parses leniently (3); the absurd length rejects its
    // candidate record rather than directing a near-infinite read
    assert(rows == List(("http://a/1", 4L), ("http://a/2", 3L)), rows.mkString(", "))
  }

  test("false sync with a stray Content-Length resolves headers at the LAST magic") {
    // the round-10 ADVICE scenario: a false magic whose junk prefix
    // carries a Content-Length line but no CRLFCRLF, directly before a
    // real record — the junk length must NOT be applied past the real
    // record's header end (it would misframe the record), and the
    // emitted offset must point at the REAL magic, not the false sync
    val r1 = record("http://a/1", "first payload")
    val junk = "WARC/1.0\r\nContent-Length: 2\r\nnoise with no blank line "
    val r2 = record("http://a/2", "second payload intact")
    val dir = writeWarc(r1 + junk + r2)
    val rows = Warc.readRecords(spark, dir).orderBy("offset")
      .collect().map(r => (r.getLong(0), r.getString(2), r.getString(4))).toList
    val r2Offset = (r1 + junk).getBytes(StandardCharsets.UTF_8).length.toLong
    assert(rows == List(
      (0L, "http://a/1", "first payload"),
      (r2Offset, "http://a/2", "second payload intact")), rows.mkString(", "))
  }

  test("a header VALUE ending in the magic text does not steal the anchor") {
    // 'WARC-Conformance: WARC/1.0' is a legal header whose value ends
    // with the magic bytes: the last-magic anchor must fall back to the
    // true record start when the decorative match doesn't resolve
    val dir = writeWarc(
      record("http://a/1", "payload one", extra = "WARC-Conformance: WARC/1.0\r\n") +
        record("http://a/2", "payload two"))
    val rows = Warc.readRecords(spark, dir).orderBy("offset")
      .collect().map(r => (r.getLong(0), r.getString(2), r.getString(4))).toList
    assert(rows.map(_._2) == List("http://a/1", "http://a/2"), rows.mkString(", "))
    assert(rows.map(_._3) == List("payload one", "payload two"), rows.mkString(", "))
    assert(rows.head._1 == 0L, s"offset must be the true magic: ${rows.head}")
  }

  test("a decorative magic BEFORE WARC-Type does not clip the headers") {
    // header order is unconstrained by the spec: the decorative value
    // precedes WARC-Type here, so a latest-anchor scheme would anchor at
    // it, clip WARC-Target-URI, and misreport the offset — the earliest
    // WELL-FORMED anchor (the true magic at 0) must win
    val manual = "WARC/1.0\r\nWARC-Target-URI: http://a/1\r\n" +
      "WARC-Conformance: WARC/1.0\r\nWARC-Type: response\r\n" +
      "Content-Length: 7\r\n\r\npayload\r\n\r\n"
    val dir = writeWarc(manual + record("http://a/2", "two"))
    val rows = Warc.readRecords(spark, dir).orderBy("offset")
      .collect().map(r => (r.getLong(0), r.getString(2), r.getString(4))).toList
    assert(rows == List((0L, "http://a/1", "payload"),
      (manual.getBytes(StandardCharsets.UTF_8).length.toLong, "http://a/2", "two")),
      rows.mkString(", "))
  }

  test("a valid record larger than the buffered cap is skipped with exact framing") {
    val hc = spark.sparkContext.hadoopConfiguration
    hc.setLong(graft.sources.WarcInputFormat.MaxBufferedBytesKey, 16L)
    try {
      val dir = writeWarc(
        record("http://a/1", "tiny") +
          record("http://a/2", "x" * 40) + // over the 16-byte cap: skipped
          record("http://a/3", "ok"))
      val rows = Warc.readRecords(spark, dir)
        .collect().map(_.getString(2)).sorted.toList
      assert(rows == List("http://a/1", "http://a/3"), rows.mkString(", "))
    } finally hc.unset(graft.sources.WarcInputFormat.MaxBufferedBytesKey)
  }

  test("gzipped archive reads as a whole-file stream, identical records") {
    val content = record("http://g/1", "first gz payload") +
      record("http://g/2", "second gz payload with ünïcode")
    val dir = graft.util.TempDirs.scratch("warc_spec_gz")
    val gz = new java.util.zip.GZIPOutputStream(
      java.nio.file.Files.newOutputStream(Paths.get(dir, "f.warc.gz")))
    gz.write(content.getBytes(StandardCharsets.UTF_8)); gz.close()
    val got = Warc.readRecords(spark, dir)
      .collect().map(r => (r.getString(2), r.getString(4))).sorted.toList
    val plain = Warc.readRecords(spark, writeWarc(content))
      .collect().map(r => (r.getString(2), r.getString(4))).sorted.toList
    assert(got == plain && got.size == 2, got.mkString(", "))
  }

  test("MULTI-MEMBER gzip (the shipped per-record .warc.gz form) reads every member") {
    // real crawl dumps are one gzip member PER RECORD concatenated; the
    // codec must keep reading past the first member boundary
    val dir = graft.util.TempDirs.scratch("warc_spec_gzm")
    val out = java.nio.file.Files.newOutputStream(Paths.get(dir, "f.warc.gz"))
    for (r <- Seq(record("http://m/1", "member one"),
        record("http://m/2", "member two"), record("http://m/3", "member three"))) {
      val gz = new java.util.zip.GZIPOutputStream(out)
      gz.write(r.getBytes(StandardCharsets.UTF_8))
      gz.finish() // close the MEMBER, keep the file stream open
    }
    out.close()
    val rows = Warc.readRecords(spark, dir)
      .collect().map(_.getString(2)).sorted.toList
    assert(rows == List("http://m/1", "http://m/2", "http://m/3"), rows.mkString(", "))
  }

  test("truncated gzip stream drops the malformed tail, keeps complete records") {
    val content = record("http://t/1", "complete record") +
      record("http://t/2", "this record will be cut")
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(content.getBytes(StandardCharsets.UTF_8)); gz.close()
    val bytes = bos.toByteArray
    val dir = graft.util.TempDirs.scratch("warc_spec_gztrunc")
    java.nio.file.Files.write(Paths.get(dir, "f.warc.gz"),
      java.util.Arrays.copyOf(bytes, bytes.length - 20)) // cut mid-stream
    // must not fail the job: every record completed before the corruption
    // survives, the torn tail drops (plain-path truncated-tail semantics)
    val rows = Warc.readRecords(spark, dir).collect().map(_.getString(2)).toList
    assert(rows.nonEmpty && rows.head == "http://t/1", rows.mkString(", "))
  }

  test("record-addressed access == sequential scan, record for record (plain)") {
    import spark.implicits._
    val content = record("http://r/1", "first payload") +
      record("http://r/2", "second — with ünïcode") +
      record("http://r/3", "third payload here")
    val dir = writeWarc(content)
    val scanned = Warc.readRecords(spark, dir)
      .select("offset", "warc_type", "url", "content_length", "payload")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getString(4))).sortBy(_._1).toList
    // fetch each scanned record BY ITS OFFSET through the point reader
    val entries = scanned.map(_._1)
      .map(off => (s"$dir/f.warc", off, -1L)).toDF("path", "offset", "length")
    val fetched = Warc.readRecordsAt(entries)
      .select("offset", "warc_type", "url", "content_length", "payload")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getString(4))).sortBy(_._1).toList
    assert(scanned.size == 3 && fetched == scanned,
      s"${fetched.take(2)} vs ${scanned.take(2)}")
  }

  test("record-addressed access fetches ONE gzip member by (offset, length)") {
    import spark.implicits._
    // the shipped CommonCrawl form: one gzip member per record; the CDX
    // triple addresses the member
    val recs = Seq(record("http://g/1", "member one"),
      record("http://g/2", "member two — target"), record("http://g/3", "member three"))
    val dir = graft.util.TempDirs.scratch("warc_spec_cdx_gz")
    val file = Paths.get(dir, "f.warc.gz")
    val members = recs.map { r =>
      val bos = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(r.getBytes(StandardCharsets.UTF_8)); gz.close()
      bos.toByteArray
    }
    Files.write(file, members.flatten.toArray)
    val offsets = members.scanLeft(0L)(_ + _.length)
    // fetch only the MIDDLE member
    val entries = Seq((file.toString, offsets(1), members(1).length.toLong))
      .toDF("path", "offset", "length")
    val got = Warc.readRecordsAt(entries)
      .collect().map(r => (r.getString(2), r.getString(4))).toList
    assert(got == List(("http://g/2", "member two — target")), got.mkString(", "))
  }

  test("a stale index entry (no magic at offset) fails loudly, not silently") {
    import spark.implicits._
    val dir = writeWarc(record("http://s/1", "payload"))
    val entries = Seq((s"$dir/f.warc", 7L, -1L)).toDF("path", "offset", "length")
    val e = intercept[org.apache.spark.SparkException] {
      Warc.readRecordsAt(entries).collect()
    }
    assert(e.getMessage != null)
  }

  test("binary sink + binary read: non-UTF-8 bytes round-trip exactly") {
    import spark.implicits._
    // cp1252 bytes (0x93 0x94 0x80: invalid UTF-8) — the payload the
    // text-sink staging path cannot carry
    val evil = Array(0x93, 'H', 'i', 0x94, ' ', 0x80, 0xE9).map(_.toByte)
    val plain = "plain ascii".getBytes(StandardCharsets.UTF_8)
    val dir = graft.util.TempDirs.scratch("warc_spec_bin") + "/a"
    Warc.writeRecords(
      Seq(("http://b/1", evil), ("http://b/2", plain)).toDF("url", "payload"),
      dir)
    val got = Warc.readRecordsBinary(spark, dir)
      .collect().map(r => (r.getString(2), r.getAs[Array[Byte]](4).toSeq)).sortBy(_._1).toList
    assert(got == List(("http://b/1", evil.toSeq), ("http://b/2", plain.toSeq)),
      got.map(x => (x._1, x._2.map(b => b & 0xff).mkString(","))).mkString(" | "))
    // and the STRING reader sees the same records for UTF-8-safe payloads
    val viaString = Warc.readRecords(spark, dir)
      .collect().map(r => (r.getString(2), r.getLong(3))).sortBy(_._1).toList
    assert(viaString.map(_._1) == List("http://b/1", "http://b/2"))
    assert(viaString(1)._2 == plain.length.toLong)
  }

  test("binary read == string read, record for record, on UTF-8 archives") {
    val content = record("http://c/1", "héllo wörld") + record("http://c/2", "two")
    val dir = writeWarc(content)
    val a = Warc.readRecords(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(2), r.getLong(3),
        r.getString(4))).sortBy(_._1).toList
    val b = Warc.readRecordsBinary(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(2), r.getLong(3),
        new String(r.getAs[Array[Byte]](4), StandardCharsets.UTF_8))).sortBy(_._1).toList
    assert(a == b && a.size == 2, s"$a vs $b")
  }

  test("unicode payload round-trips byte-exactly through Content-Length") {
    val payload = "héllo wörld — ünïcode 你好   end"
    val dir = writeWarc(record("http://u/1", payload))
    val rows = Warc.readRecords(spark, dir).collect()
    assert(rows.length == 1 && rows(0).getString(4) == payload)
    assert(rows(0).getLong(3) == payload.getBytes(StandardCharsets.UTF_8).length)
  }
}
