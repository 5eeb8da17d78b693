package graft.sources

import graft.{Probe, Tables}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.io.{LongWritable, Text}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WARC scan over the splittable [[WarcInputFormat]]: the CommonCrawl
  * container parsed to (offset, warc_type, url, content_length,
  * payload) — the tier in FRONT of HTML extraction (`Corpus.fromHtml`),
  * so the full crawl path reads: .warc → records → extract → every text
  * operator. Record parsing is per-row and stateless; the scan
  * parallelizes per Hadoop split with O(one record) memory.
  */
object Warc {

  val schema: StructType = StructType(Seq(
    StructField("offset", LongType, nullable = false),
    StructField("warc_type", StringType, nullable = true),
    StructField("url", StringType, nullable = true),
    StructField("content_length", LongType, nullable = false),
    StructField("payload", StringType, nullable = false)))

  /** DataFrame over every record of the WARC file(s) at `path`.
    * `maxSplitBytes` bounds the Hadoop split size (else block sizing
    * applies). Payloads decode as UTF-8 text — binary payloads belong
    * to the multimodal tier (`ext.Multimodal`), not this reader.
    */
  def readRecords(spark: SparkSession, path: String,
      maxSplitBytes: Option[Long] = None): DataFrame = {
    val conf = new Configuration(spark.sparkContext.hadoopConfiguration)
    maxSplitBytes.foreach { b =>
      conf.set("mapreduce.input.fileinputformat.split.maxsize", b.toString)
    }
    val rows = spark.sparkContext
      .newAPIHadoopFile(path, classOf[WarcInputFormat],
        classOf[LongWritable], classOf[Text], conf)
      .map { case (off, t) =>
        val s = new String(t.copyBytes(), java.nio.charset.StandardCharsets.UTF_8)
        val hEnd = s.indexOf("\r\n\r\n")
        val headers = s.substring(0, hEnd).split("\r\n").drop(1).flatMap { line =>
          val c = line.indexOf(':')
          if (c < 0) None
          else Some(line.substring(0, c).toLowerCase(java.util.Locale.ROOT) ->
            line.substring(c + 1).trim)
        }.toMap
        val payload = s.substring(hEnd + 4)
        Row(off.get(), headers.get("warc-type").orNull,
          headers.get("warc-target-uri").orNull,
          headers.get("content-length").map(_.toLong).getOrElse(-1L), payload)
      }
    spark.createDataFrame(rows, schema)
  }

  /** One WARC response record as a STRING column — the writer half of
    * the probe's round trip, built declaratively (Content-Length is the
    * payload's UTF-8 BYTE length via octet_length). Written through the
    * text sink, whose per-row '\n' lands between records where the
    * reader's sync scan skips it.
    */
  def responseRecord(url: org.apache.spark.sql.Column,
      payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat(lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "), url,
      lit("\r\nContent-Length: "), octet_length(payload).cast("string"),
      lit("\r\n\r\n"), payload, lit("\r\n"))

  /** X-WARC1 — WARC round trip: documents render as response records
    * (HTML payload, exact byte Content-Length), write through the text
    * sink, and read back through the SPLITTABLE record reader; the
    * oracle recomputes type/URI/byte-length/payload fingerprint straight
    * from the documents table, so any framing, length, or decode error
    * in the source breaks the hash. WarcSpec additionally pins
    * multi-split ≡ single-split, payloads embedding the record magic,
    * and truncated-tail drop semantics.
    */
  private val warc1 = Probe(
    "x_warc1_roundtrip",
    """SELECT doc_id, 'response' AS warc_type,
      |  CAST(strlen(payload) AS BIGINT) AS content_length,
      |  md5(payload) AS payload_fp
      |FROM (
      |  SELECT doc_id,
      |    '<html><body><p>' || text || '</p></body></html>' AS payload
      |  FROM documents)
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val out = graft.util.TempDirs.scratch("graft_warc_rt")
    Tables(s, dir, "documents")
      .select(responseRecord(
        concat(lit("https://ex"), (col("doc_id") % 7).cast("string"),
          lit(".com/doc/"), col("doc_id").cast("string")),
        concat(lit("<html><body><p>"), col("text"), lit("</p></body></html>")))
        .as("value"))
      .write.mode("overwrite").text(out)
    readRecords(s, out)
      .select(
        regexp_extract(col("url"), "/doc/([0-9]+)$", 1).cast("long").as("doc_id"),
        col("warc_type"), col("content_length"),
        md5(col("payload")).as("payload_fp"))
      .orderBy("doc_id")
  }

  val all: Seq[Probe] = Seq(warc1)
}
