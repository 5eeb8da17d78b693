package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._

/** HTTP transfer/content coding decode (x_warc7's operator tier), the
  * gzip-member sink + writer-emitted CDX (x_warc4's production path),
  * and the reader's exception-origin salvage discipline.
  *
  * Lives in `graft.sources` to reach the package-private byte walkers —
  * the probes pin end-to-end hashes; these pin the hostile edges.
  */
class WarcCodingsSpec extends graft.SparkSuite {

  private def ascii(s: String) = s.getBytes(StandardCharsets.US_ASCII)

  private def gzip(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(b); g.close()
    bos.toByteArray
  }

  // ------------------------------------------------------------ dechunk

  test("dechunk handles extensions, varied sizes, and skips trailers") {
    val body = ascii("5;ext=v\r\nhello\r\n6\r\n world\r\n0\r\nX-Trailer: t\r\nX-T2: u\r\n\r\n")
    assert(new String(Warc.dechunk(body), StandardCharsets.US_ASCII) == "hello world")
  }

  test("dechunk of the zero-chunk-only body is empty") {
    assert(Warc.dechunk(ascii("0\r\n\r\n")).isEmpty)
  }

  test("dechunk fails LOUDLY on malformed framing") {
    // bad hex, missing CRLF after data, overrunning chunk
    intercept[IllegalArgumentException](Warc.dechunk(ascii("zz\r\nhello\r\n0\r\n\r\n")))
    intercept[IllegalArgumentException](Warc.dechunk(ascii("5\r\nhelloX0\r\n\r\n")))
    intercept[IllegalArgumentException](Warc.dechunk(ascii("ff\r\nshort\r\n0\r\n\r\n")))
  }

  test("uppercase hex chunk sizes parse") {
    val body = ascii("A\r\n0123456789\r\n0\r\n\r\n")
    assert(Warc.dechunk(body).length == 10)
  }

  test("zero-padded chunk sizes are legal (fixed-width writers)") {
    val body = ascii("00000005\r\nhello\r\n0\r\n\r\n")
    assert(new String(Warc.dechunk(body), StandardCharsets.US_ASCII) == "hello")
  }

  test("bytes after the terminating chunk are framing damage, loud") {
    intercept[IllegalArgumentException](
      Warc.dechunk(ascii("5\r\nhello\r\n0\r\n\r\nGARBAGE!")))
  }

  test("lenient decodeHttpBodies salvages a corrupt record, strict fails") {
    import spark.implicits._
    val good = Warc.encodeBodyForFixture(ascii("a good body " * 10), 1)
    val rows = Seq(
      graft.sources.HttpEncodedBody("http://ok", good._1, null, "gzip"),
      graft.sources.HttpEncodedBody("http://bad", ascii("not gzip at all"), null, "gzip"))
    val out = Warc.decodeHttpBodies(rows.toDS()).collect().sortBy(_.url)
    assert(out.length == 2)
    val bad = out.find(_.url == "http://bad").get
    val ok = out.find(_.url == "http://ok").get
    assert(bad.error != null && bad.body.isEmpty, bad.error)
    assert(ok.error == null && ok.body.nonEmpty)
    intercept[org.apache.spark.SparkException](
      Warc.decodeHttpBodies(rows.toDS(), lenient = false).collect())
  }

  test("a NULL body cell decodes as empty — never an NPE task death") {
    import spark.implicits._
    // legal in the documented DataFrame input (an upstream outer join
    // leaves body null); pre-fix this NPE'd inside dechunk /
    // ByteArrayInputStream and killed the task on every retry — the
    // exact one-bad-record job death the lenient contract promises to
    // prevent (ADVICE r12)
    val rows = Seq(
      graft.sources.HttpEncodedBody("http://null-identity", null, null, null),
      graft.sources.HttpEncodedBody("http://null-chunked", null, "chunked", null),
      graft.sources.HttpEncodedBody("http://ok", ascii("fine"), null, null))
    val out = Warc.decodeHttpBodies(rows.toDS()).collect().sortBy(_.url)
    assert(out.length == 3)
    // identity null: empty body, NO error — an empty body is a valid decode
    val ni = out.find(_.url == "http://null-identity").get
    assert(ni.body.isEmpty && ni.error == null, s"error=${ni.error}")
    // chunked null: empty bytes are malformed chunk framing → salvage
    val nc = out.find(_.url == "http://null-chunked").get
    assert(nc.body.isEmpty && nc.error != null, "chunked-null must salvage loudly")
    assert(out.find(_.url == "http://ok").get.body.nonEmpty)
    // the column-preserving form takes the same path
    val df = Seq(("u1", null.asInstanceOf[Array[Byte]], null.asInstanceOf[String],
      null.asInstanceOf[String])).toDF("url", "body", "te", "ce")
    val got = Warc.decodeHttpBodyColumn(df).collect()(0)
    assert(got.getAs[Array[Byte]]("body").isEmpty &&
      got.getAs[String]("body_error") == null)
  }

  test("decodeHttpBodyColumn preserves every other column and salvages") {
    import spark.implicits._
    val good = Warc.encodeBodyForFixture(ascii("column preserving body " * 8), 4)
    val df = Seq(
      ("u1", 200, "text/html", good._1, good._2, good._3),
      ("u2", 404, "application/pdf", ascii("junk"), null, "gzip"))
      .toDF("url", "status", "ct", "body", "te", "ce")
    val out = Warc.decodeHttpBodyColumn(df).collect().sortBy(_.getString(0))
    assert(out.map(_.schema.fieldNames.toList).head ==
      List("url", "status", "ct", "body", "te", "ce", "body_error"))
    val u1 = out(0); val u2 = out(1)
    // carried columns intact, body decoded in place
    assert(u1.getInt(1) == 200 && u1.getString(2) == "text/html" &&
      u1.getAs[String]("body_error") == null &&
      new String(u1.getAs[Array[Byte]]("body"), StandardCharsets.US_ASCII)
        .startsWith("column preserving"))
    // the corrupt row salvages: empty body, error populated, row kept
    assert(u2.getInt(1) == 404 && u2.getAs[String]("body_error") != null &&
      u2.getAs[Array[Byte]]("body").isEmpty)
  }

  test("malformed-header rejection is counted even when a later sync resolves") {
    // one scan window, two magics: the first candidate has WARC-Type +
    // a plausible Content-Length but a colon-less header line (rejected
    // SOLELY by well-formedness); the second is a genuine record. The
    // reader must emit the second AND count the first — pre-fix the
    // early return on the resolved sync skipped the counter entirely,
    // so the drop was invisible (ADVICE r12).
    val body = "hello"
    val bytes = ascii(
      "WARC/1.0\r\n" +
        "bad line with no colon\r\n" +
        "WARC-Type: response\r\n" +
        s"Content-Length: ${body.length}\r\n" +
        "WARC/1.0\r\n" +
        "WARC-Type: response\r\n" +
        s"Content-Length: ${body.length}\r\n" +
        "\r\n" + body)
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_ctr")
    val f = dir.resolve("a.warc")
    java.nio.file.Files.write(f, bytes)
    val conf = new org.apache.hadoop.conf.Configuration()
    // TaskAttemptContextImpl's default DummyReporter mints a FRESH
    // Counters per getCounter call, so reads never see increments —
    // back the context with one shared Counters instance
    val counters = new org.apache.hadoop.mapreduce.Counters()
    val reporter = new org.apache.hadoop.mapreduce.StatusReporter {
      override def getCounter(e: Enum[_]): org.apache.hadoop.mapreduce.Counter =
        counters.findCounter(e)
      override def getCounter(g: String, n: String): org.apache.hadoop.mapreduce.Counter =
        counters.findCounter(g, n)
      override def progress(): Unit = ()
      override def setStatus(s: String): Unit = ()
      override def getProgress: Float = 0f
    }
    val ctx = new org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl(
      conf, new org.apache.hadoop.mapreduce.TaskAttemptID(), reporter)
    val split = new org.apache.hadoop.mapreduce.lib.input.FileSplit(
      new org.apache.hadoop.fs.Path(f.toUri), 0, bytes.length, Array.empty)
    val reader = new WarcRecordReader()
    try {
      reader.initialize(split, ctx)
      assert(reader.nextKeyValue(), "the well-formed record must still emit")
      val rec = reader.getCurrentValue.toString
      assert(rec.startsWith("WARC/1.0\r\nWARC-Type: response"), rec.take(40))
      assert(rec.endsWith(body))
      assert(!reader.nextKeyValue())
      val n = ctx.getCounter(WarcInputFormat.CounterGroup,
        WarcInputFormat.RejectedMalformedHeaders).getValue
      assert(n == 1L, s"rejection counter = $n, expected 1")
    } finally {
      reader.close()
      graft.util.TempDirs.deleteRecursively(dir)
    }
  }

  test("readCdx on an archive with no committed segments reads zero rows") {
    val dir = graft.util.TempDirs.scratch("warc_cdx_empty")
    assert(Warc.readCdx(spark, dir).count() == 0L)
  }

  // ------------------------------------------------------------ inflate

  test("inflateBody: gzip and x-gzip round-trip") {
    val payload = ascii("the quick brown fox " * 20)
    assert(Warc.inflateBody(gzip(payload), "gzip").toSeq == payload.toSeq)
    assert(Warc.inflateBody(gzip(payload), "x-gzip").toSeq == payload.toSeq)
  }

  test("inflateBody: zlib-wrapped deflate (the RFC form)") {
    val payload = ascii("zlib wrapped deflate body " * 10)
    val d = new java.util.zip.Deflater()
    d.setInput(payload); d.finish()
    val bos = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
    d.end()
    assert(Warc.inflateBody(bos.toByteArray, "deflate").toSeq == payload.toSeq)
  }

  test("inflateBody: RAW deflate under the 'deflate' label sniffs correctly") {
    // real servers ship raw DEFLATE under Content-Encoding: deflate;
    // the two-byte zlib test must route it to the nowrap inflater
    val payload = ascii("raw deflate without the zlib wrapper " * 8)
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    d.setInput(payload); d.finish()
    val bos = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
    d.end()
    assert(Warc.inflateBody(bos.toByteArray, "deflate").toSeq == payload.toSeq)
  }

  test("unknown codings fail loudly, identity passes through untouched") {
    intercept[IllegalArgumentException](Warc.inflateBody(ascii("x"), "br"))
    intercept[IllegalArgumentException](
      Warc.decodeHttpBodyBytes(ascii("x"), "gzip", null)) // gzip is not a TE here
    val b = ascii("plain")
    assert(Warc.decodeHttpBodyBytes(b, null, null) eq b)
    assert(Warc.decodeHttpBodyBytes(b, "identity", "identity") eq b)
  }

  test("chunked + gzip compose in wire order (dechunk first)") {
    val payload = ascii("composed codings body " * 12)
    val (enc, te, ce) = Warc.encodeBodyForFixture(payload, 4)
    assert(te == "chunked" && ce == "gzip")
    assert(Warc.decodeHttpBodyBytes(enc, te, ce).toSeq == payload.toSeq)
  }

  // ------------------------------------- gz-member sink + writer CDX

  test("gz sink: writer-emitted CDX point fetches == sequential scan") {
    import spark.implicits._
    val rows = (1 to 20).map(i =>
      (s"https://ex.com/p/$i", s"<p>payload number $i — ünïcode</p>"
        .getBytes(StandardCharsets.UTF_8)))
    val dir = graft.util.TempDirs.scratch("warc_gz_sink") + "/a"
    Warc.writeRecordsGz(rows.toDF("url", "payload"), dir)
    val seq = Warc.readRecords(spark, s"$dir/seg-*/part-*.warc.gz")
      .select("url", "content_length", "payload")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).sortBy(_._1)
    val viaCdx = Warc.readRecordsAt(Warc.readCdx(spark, dir)
        .select("path", "offset", "length"))
      .select("url", "content_length", "payload")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).sortBy(_._1)
    assert(seq.length == 20 && seq.toSeq == viaCdx.toSeq)
  }

  test("gz sink records carry mandatory WARC-Record-ID and WARC-Date") {
    import spark.implicits._
    val dir = graft.util.TempDirs.scratch("warc_gz_hdrs") + "/a"
    Warc.writeRecordsGz(Seq(("https://ex.com/1",
      "body".getBytes(StandardCharsets.UTF_8))).toDF("url", "payload"), dir)
    val cdx = Warc.readCdx(spark, dir).collect()
    assert(cdx.length == 1)
    val member = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(new java.net.URI(cdx(0).getString(1)).getPath))
    val rec = new String(Warc.inflateBody(member, "gzip"), StandardCharsets.UTF_8)
    assert(rec.contains("WARC-Record-ID: <urn:uuid:"), rec)
    assert(rec.contains(s"WARC-Date: ${Warc.DefaultWarcDate}"), rec)
    // deterministic: same (url, payload) → same id across runs
    val dir2 = graft.util.TempDirs.scratch("warc_gz_hdrs") + "/b"
    Warc.writeRecordsGz(Seq(("https://ex.com/1",
      "body".getBytes(StandardCharsets.UTF_8))).toDF("url", "payload"), dir2)
    val cdx2 = Warc.readCdx(spark, dir2).collect()
    val member2 = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(new java.net.URI(cdx2(0).getString(1)).getPath))
    assert(member2.toSeq == member.toSeq)
  }

  test("plain sink + point reader round-trip a NON-ASCII target URI") {
    import spark.implicits._
    // the point reader decodes headers as UTF-8 (same as the scanning
    // readers) — a byte-to-char append would hand back mojibake
    val url = "https://ex.com/döc/路径"
    val dir = graft.util.TempDirs.scratch("warc_uri") + "/a"
    Warc.writeRecords(Seq((url, "p".getBytes(StandardCharsets.UTF_8)))
      .toDF("url", "payload"), dir)
    val part = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".warc")).head.getAbsolutePath
    val got = Warc.readRecordsAt(
      Seq((part, 0L, -1L)).toDF("path", "offset", "length")).collect()
    assert(got.length == 1 && got(0).getString(2) == url, got.toSeq)
    val scanned = Warc.readRecords(spark, dir).collect()
    assert(scanned.length == 1 && scanned(0).getString(2) == url)
  }

  // ----------------------------------------- salvage origin discipline

  test("UpstreamIOException (tagged filesystem fault) is never a salvage") {
    val fsFault = new WarcInputFormat.UpstreamIOException(
      new java.io.IOException("Invalid token: crc check failed on RPC"))
    assert(!WarcInputFormat.isCorruptStream(fsFault))
    // even wrapped deeper by a codec layer, the tag in the cause chain wins
    val wrapped = new java.io.IOException("read error", fsFault)
    assert(!WarcInputFormat.isCorruptStream(wrapped))
    // while decompressor-origin corruption still salvages
    assert(WarcInputFormat.isCorruptStream(
      new java.io.IOException("invalid distance too far back")))
    assert(WarcInputFormat.isCorruptStream(new java.io.EOFException()))
  }

  test("TaggingInputStream tags IOExceptions from the raw stream") {
    val failing = new java.io.InputStream {
      override def read(): Int = throw new java.io.IOException("transient fs fault")
    }
    val tagged = new WarcInputFormat.TaggingInputStream(failing)
    val e = intercept[java.io.IOException](tagged.read())
    assert(e.isInstanceOf[WarcInputFormat.UpstreamIOException])
    assert(e.getMessage == "transient fs fault")
  }
}
