package graft.sources

import java.nio.charset.StandardCharsets
import org.apache.spark.sql.functions._

/** Revisit-tier edges the x_warc9 hash can't see: real payload elision
  * (byte-counted), digest header round-trip, and the loud NULL on an
  * unresolvable revisit.
  */
class RevisitSpec extends graft.SparkSuite {
  import spark.implicits._

  private def dirSize(d: String): Long = {
    def go(f: java.io.File): Long =
      if (f.isDirectory) Option(f.listFiles).map(_.map(go).sum).getOrElse(0L)
      else f.length()
    go(new java.io.File(d))
  }

  test("revisit records elide payloads: the archive shrinks by the unchanged bytes") {
    val docs = (1 to 20).map(i => (s"https://h.com/p/$i", "body " * 50 + i)).toDF("url", "payload")
    val base = java.nio.file.Files.createTempDirectory("graft_revisit").toString
    try {
      Warc.writeRecords(docs.select(col("url"),
        col("payload").cast("binary").as("payload")), s"$base/day1")
      val known = Warc.readRecords(spark, s"$base/day1/part-*.warc")
        .select(Revisit.payloadDigest(col("payload")).as("digest"))
      // day 2: identical content -> every record must be a revisit
      Revisit.writeRecordsWithRevisits(docs, known, s"$base/day2")
      val d2 = Revisit.readRecordsDigest(spark, s"$base/day2/part-*.warc")
      assert(d2.count() == 20)
      assert(d2.filter(col("warc_type") === "revisit").count() == 20)
      assert(d2.filter(col("content_length") =!= 0).count() == 0)
      // elision is real bytes, not bookkeeping: each ~255-byte payload
      // vanishes, partially offset by the digest+profile headers
      // (~115 bytes) the revisit form adds — net > 100 bytes/record
      assert(dirSize(s"$base/day2") < dirSize(s"$base/day1") - 20 * 100,
        s"day1=${dirSize(s"$base/day1")} day2=${dirSize(s"$base/day2")}")
      // digest header round-trips and matches the day-1 payload digest
      val dd = d2.select("payload_digest").distinct().collect().map(_.getString(0))
      val want = Warc.readRecords(spark, s"$base/day1/part-*.warc")
        .select(Revisit.payloadDigest(col("payload"))).distinct()
        .collect().map(_.getString(0))
      assert(dd.sorted.toSeq == want.sorted.toSeq)
    } finally graft.util.TempDirs.deleteRecursively(new java.io.File(base))
  }

  test("NULL url/payload rows write as empty fields; NULL warc_type passes through resolve") {
    // ADVICE r13: the writer must be null-tolerant like decodeHttpBodyBytes
    // (no task NPE), and resolveRevisits' split must be null-SAFE (a NULL
    // warc_type row passes through as a response instead of vanishing)
    val docs = Seq(
      (Some("https://h.com/ok"), Some("body")),
      (None: Option[String], Some("orphan payload")),
      (Some("https://h.com/null-payload"), None: Option[String])
    ).toDF("url", "payload")
    val base = java.nio.file.Files.createTempDirectory("graft_revisit_null").toString
    try {
      Revisit.writeRecordsWithRevisits(docs,
        Seq.empty[String].toDF("digest"), s"$base/arch")
      val back = Revisit.readRecordsDigest(spark, s"$base/arch/part-*.warc")
      assert(back.count() == 3, "all three rows must write, none may NPE")
      // NULL warc_type must survive the resolve split (null-safe <=>)
      val typed = back.withColumn("warc_type",
        when(col("url") === "https://h.com/ok", lit(null).cast("string"))
          .otherwise(col("warc_type")))
      val store = Seq.empty[(String, String)].toDF("digest", "payload")
      assert(Revisit.resolveRevisits(typed, store).count() == 3,
        "a NULL-typed record must pass through as a response, not vanish")
    } finally graft.util.TempDirs.deleteRecursively(new java.io.File(base))
  }

  test("revisit records carry the WARC/1.0 profile URI matching the version line") {
    // ADVICE r13: external consumers key on version+profile — the writer
    // emits WARC/1.0 records, so the profile must be the 1.0 URI
    val docs = Seq(("https://h.com/x", "same")).toDF("url", "payload")
    val base = java.nio.file.Files.createTempDirectory("graft_revisit_prof").toString
    try {
      val known = Seq(("same")).toDF("payload")
        .select(Revisit.payloadDigest(col("payload")).as("digest"))
      Revisit.writeRecordsWithRevisits(docs, known, s"$base/arch")
      val warcFile = new java.io.File(s"$base/arch").listFiles()
        .filter(_.getName.endsWith(".warc")).head
      val raw = new String(
        java.nio.file.Files.readAllBytes(warcFile.toPath), StandardCharsets.UTF_8)
      assert(raw.startsWith("WARC/1.0\r\n"))
      assert(raw.contains(
        "WARC-Profile: http://netpreserve.org/warc/1.0/revisit/identical-payload-digest"),
        raw.take(400))
      assert(!raw.contains("warc/1.1/revisit"))
    } finally graft.util.TempDirs.deleteRecursively(new java.io.File(base))
  }

  test("an unresolvable revisit resolves to NULL text — loud, never empty") {
    val recs = Seq(
      (0L, "revisit", "https://h.com/a", 0L, "", "deadbeef" * 4),
      (1L, "response", "https://h.com/b", 4L, "body", "aa" * 16)
    ).toDF("offset", "warc_type", "url", "content_length", "payload", "payload_digest")
    val store = Seq(("cafebabe" * 4, "stored")).toDF("digest", "payload")
    val got = Revisit.resolveRevisits(recs, store)
      .collect().map(r => (r.getString(0), r.getString(3))).toMap
    assert(got("https://h.com/a") == null, "missing digest must surface as NULL")
    assert(got("https://h.com/b") == "body")
  }
}
