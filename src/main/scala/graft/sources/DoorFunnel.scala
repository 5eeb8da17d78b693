package graft.sources

import graft.{Probe, Tables}
import org.apache.spark.sql.functions._

/** The crawl-door FUNNEL — per-host attrition through every drop stage
  * of the composed front door, in ONE scan: HTTP status → content-type
  * → wire-coding decode (lenient salvage) → charset honesty → quality
  * gate. The observability table an ingest operator reviews daily: a
  * hot `3_coding` cell means a crawler shipped broken framing, a hot
  * `4_charset` cell a locale the decode tier doesn't cover — and
  * WITHOUT the funnel those pages would just be silently missing.
  *
  * Each document drops at its FIRST failing stage (the door's actual
  * short-circuit order), so the cells partition the corpus exactly:
  * sum(n_docs) per host = docs scanned. Shape: one splittable archive
  * scan, the narrow decode tiers, one exchange for the (host, stage)
  * rollup.
  */
object DoorFunnel {

  /** X-PIPE11 — the door funnel over a fixture that plants one failure
    * per stage (mod-11 lanes): 404s, application/pdf, a declared-gzip
    * body that is NOT gzip (the lenient salvage's error column feeds
    * the funnel — round-12's decode tier made this stage observable
    * instead of job-killing), a declared Shift_JIS page (the charset
    * honesty drop), and a two-word page the quality gate rejects;
    * everything else wire-codes genuinely (identity or gzip by parity)
    * and must come out `kept` unless the quality rule says otherwise.
    * The oracle recomputes every stage from the planted assignment and
    * the quality verdicts from first principles over the extracted
    * text of the pages that reach stage 5.
    */
  private val pipe11 = Probe(
    "x_pipe11_door_funnel",
    s"""WITH d AS (
       |  SELECT doc_id, doc_id % 7 AS h, doc_id % 11 AS m,
       |    CASE WHEN doc_id % 11 = 5 THEN 'tiny doc' ELSE text END AS btext
       |  FROM documents),
       |x AS (
       |  SELECT doc_id, h, m,
       |    CASE WHEN m IN (1, 2, 3, 4) THEN ''
       |         ELSE ${graft.clean.HtmlFns.htmlToTextDuck(
                  "'<html><body><p>' || btext || '</p></body></html>'")} END AS text
       |  FROM d),
       |t AS (
       |  SELECT doc_id, h, m,
       |    list_filter(string_split_regex(lower(text), '\\s+'), tkn -> tkn <> '') AS w
       |  FROM x),
       |q AS (
       |  SELECT doc_id, h, m,
       |    CAST(len(w) AS BIGINT) AS n_words,
       |    CAST(list_sum(list_transform(w, y -> length(y))) * 100 // nullif(len(w), 0) AS BIGINT) AS mean_len_c,
       |    CAST(len(list_filter(w, y -> regexp_matches(y, '[a-z]'))) * 1000000 // nullif(len(w), 0) AS BIGINT) AS alpha_ppm,
       |    CAST(len(list_filter(w, y -> list_contains(['the','and','of','to','a','in','is','that'], y))) AS BIGINT) AS stop_hits
       |  FROM t),
       |k AS (
       |  SELECT doc_id, h, m,
       |    CASE WHEN n_words BETWEEN 10 AND 100000 AND mean_len_c BETWEEN 200 AND 1000
       |         AND alpha_ppm >= 600000 AND stop_hits >= 2 THEN 1 ELSE 0 END AS keep
       |  FROM q),
       |st AS (
       |  SELECT h,
       |    CASE WHEN m = 1 THEN '1_status'
       |         WHEN m = 2 THEN '2_ctype'
       |         WHEN m = 3 THEN '3_coding'
       |         WHEN m = 4 THEN '4_charset'
       |         WHEN keep = 0 THEN '5_quality'
       |         ELSE 'kept' END AS stage
       |  FROM k)
       |SELECT 'ex' || CAST(h AS VARCHAR) || '.com' AS host, stage,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs
       |FROM st GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    import s.implicits._
    val out = graft.util.TrainOnce(s"door_funnel:$dir") {
      val p = graft.util.TempDirs.scratch("graft_funnel")
      val payloads = Tables(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .mapPartitions(_.map { case (id, text) =>
          val m = id % 11
          val url = s"https://ex${id % 7}.com/doc/$id"
          val status = if (m == 1) 404 else 200
          val ct =
            if (m == 2) "application/pdf"
            else if (m == 4) "text/html; charset=shift_jis"
            else "text/html; charset=utf-8"
          val bodyText = if (m == 5) "tiny doc" else text
          val bodyBytes = s"<html><body><p>$bodyText</p></body></html>"
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          // lane 3: headers DECLARE gzip but the bytes are not — the
          // decode tier must salvage with an error, feeding the funnel
          val (enc, te, ce) =
            if (m == 3) ("definitely not a gzip stream"
              .getBytes(java.nio.charset.StandardCharsets.US_ASCII), null, "gzip")
            else Warc.encodeBodyForFixture(bodyBytes, if (id % 2 == 0) 1 else 0)
          val head = new StringBuilder(s"HTTP/1.1 $status " +
            (if (status == 200) "OK" else "Error") + s"\r\nContent-Type: $ct\r\n")
          if (te != null) head.append(s"Transfer-Encoding: $te\r\n")
          if (ce != null) head.append(s"Content-Encoding: $ce\r\n")
          if (te == null) head.append(s"Content-Length: ${enc.length}\r\n")
          head.append("\r\n")
          (url, head.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8) ++ enc)
        }).toDF("url", "payload")
      Warc.writeRecords(payloads, s"$p/archive")
      s"$p/archive"
    }
    val pstr = decode(col("payload"), "ISO-8859-1")
    val base = Warc.readRecordsBinary(s, out)
      .filter(col("warc_type") === "response")
      .select(col("url"),
        Warc.httpStatus(pstr).as("status"),
        Warc.httpContentType(pstr).as("mt"),
        Warc.httpContentTypeFull(pstr).as("ct"),
        Warc.httpTransferEncoding(pstr).as("te"),
        Warc.httpContentEncoding(pstr).as("ce"),
        encode(Warc.httpBody(pstr), "ISO-8859-1").as("body"))
    // the four pre-quality drop conditions are derived ONCE (__stage14 is
    // null exactly when a page reaches extraction): text extraction and
    // stage assignment cannot disagree, preserving the cells-partition-
    // the-corpus invariant
    val dec = Warc.decodeHttpBodyColumn(base)
      .withColumn("cs", graft.clean.CharsetFns.charsetStatus(col("ct"), col("body")))
      .withColumn("__stage14",
        when(col("status").isNull || col("status") =!= 200, "1_status")
          .when(col("mt").isNull || col("mt") =!= "text/html", "2_ctype")
          .when(col("body_error").isNotNull, "3_coding")
          .when(!graft.clean.CharsetFns.charsetSupported(col("cs")), "4_charset"))
      .withColumn("text", when(col("__stage14").isNull,
        graft.clean.HtmlFns.htmlToText(
          graft.clean.CharsetFns.decodeCharset(col("body"), col("cs"))))
        .otherwise(lit("")))
    graft.ext.PipelineOps3.addQualityRuleSignals(dec)
      .withColumn("stage", coalesce(col("__stage14"),
        when(col("keep") === 0, "5_quality").otherwise("kept")))
      .groupBy(regexp_extract(col("url"), "^[a-z]+://([^/]+)", 1).as("host"),
        col("stage"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("host", "stage")
  }

  val all: Seq[Probe] = Seq(pipe11)
}
