package graft.sources

import graft.{Probe, Tables}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.io.{LongWritable, Text}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sitemap ingestion — the crawl DISCOVERY tier: sitemap.xml files
  * (sitemaps.org protocol, public) parsed to frontier entries through
  * the same splittable XML machinery as the OSM source
  * ([[graft.osm.XmlElementInputFormat]] with rowTag `url`), so a
  * multi-GB sitemap scans in place across splits. Entry fields extract
  * with shared-syntax regexes (the HtmlFns cross-engine discipline) and
  * the standard XML entity escapes in `<loc>` decode (`&amp;` is how a
  * conformant writer escapes `&` in URLs — an undecoded loc would break
  * query-parameter canonicalization downstream).
  */
object Sitemap {

  private val entities = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&apos;" -> "'", "&amp;" -> "&")

  private def field(tag: String): Column => Column = elem =>
    regexp_extract(elem, s"(?s)<$tag>\\s*(.*?)\\s*</$tag>", 1)

  /** &amp; LAST, so double-escaped text decodes one level — the
    * HtmlFns rule order (SitemapSpec pins it).
    */
  private def decodeEntities(c: Column): Column =
    entities.foldLeft(c) { case (acc, (k, v)) => replace(acc, lit(k), lit(v)) }

  /** DataFrame of every `<url>` entry under `path`: (loc, lastmod,
    * changefreq, priority) — loc entity-decoded, absent fields ''.
    * Splittable exactly like the OSM scan; `maxSplitBytes` bounds the
    * Hadoop split size.
    */
  def readUrlEntries(spark: SparkSession, path: String,
      maxSplitBytes: Option[Long] = None): DataFrame = {
    val conf = new Configuration(spark.sparkContext.hadoopConfiguration)
    conf.set(graft.osm.XmlElementInputFormat.ROW_TAG_KEY, "url")
    maxSplitBytes.foreach { b =>
      conf.set("mapreduce.input.fileinputformat.split.maxsize", b.toString)
    }
    val rows = spark.sparkContext
      .newAPIHadoopFile(path, classOf[graft.osm.XmlElementInputFormat],
        classOf[LongWritable], classOf[Text], conf)
      .map { case (_, t) =>
        Row(new String(t.copyBytes(), java.nio.charset.StandardCharsets.UTF_8))
      }
    val elems = spark.createDataFrame(rows,
      StructType(Seq(StructField("elem", StringType, nullable = false))))
    elems.select(
      decodeEntities(field("loc")(col("elem"))).as("loc"),
      field("lastmod")(col("elem")).as("lastmod"),
      field("changefreq")(col("elem")).as("changefreq"),
      field("priority")(col("elem")).as("priority"))
  }

  /** X-URL7 — sitemap DISCOVERY composed with frontier canonicalization:
    * documents render as sitemap `<url>` entries (entity-escaped locs
    * with tracking params, per-doc lastmod dates, colliding canonical
    * paths), write as one sitemap.xml (urlset wrapper included), read
    * back through the SPLITTABLE element reader, entity-decode,
    * canonicalize, and roll up per host — entries, distinct canonical
    * pages, and the lastmod range (the recrawl scheduler's freshness
    * table). The oracle recomputes entry construction, entity decode,
    * canonicalization, and the rollup from the documents table.
    */
  private val url7 = Probe(
    "x_url7_sitemap_ingest",
    s"""WITH d AS (
       |  SELECT doc_id,
       |    'https://Ex' || CAST(doc_id % 7 AS VARCHAR) || '.com/p/' ||
       |      CAST(doc_id % 11 AS VARCHAR) ||
       |      '?utm_source=feed&id=' || CAST(doc_id % 5 AS VARCHAR) AS raw_loc,
       |    '2026-' || lpad(CAST(1 + doc_id % 12 AS VARCHAR), 2, '0') || '-' ||
       |      lpad(CAST(1 + doc_id % 28 AS VARCHAR), 2, '0') AS lastmod
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, lastmod,
       |    ${graft.clean.UrlFns.canonicalUrlDuck("raw_loc")} AS canon
       |  FROM d),
       |h AS (
       |  SELECT regexp_extract(canon, '^[a-z0-9+.-]+://([^/:?#]+)', 1) AS host,
       |    canon, lastmod
       |  FROM c)
       |SELECT host, CAST(COUNT(*) AS BIGINT) AS n_entries,
       |  CAST(COUNT(DISTINCT canon) AS BIGINT) AS n_canonical,
       |  MIN(lastmod) AS lastmod_min, MAX(lastmod) AS lastmod_max
       |FROM h GROUP BY host ORDER BY host""".stripMargin) { (s, dir) =>
    val out = graft.util.TrainOnce(s"sitemap:$dir") {
      val p = graft.util.TempDirs.scratch("graft_sitemap")
      // loc is entity-ESCAPED in the file (the & in the query becomes
      // &amp;, as a conformant sitemap writer emits) and wrapped in the
      // urlset envelope; ordered single-file write = the file a site
      // serves
      val entry = concat(
        lit("<url><loc>https://Ex"), (col("doc_id") % 7).cast("string"),
        lit(".com/p/"), (col("doc_id") % 11).cast("string"),
        lit("?utm_source=feed&amp;id="), (col("doc_id") % 5).cast("string"),
        lit("</loc><lastmod>2026-"),
        lpad((col("doc_id") % 12 + 1).cast("string"), 2, "0"), lit("-"),
        lpad((col("doc_id") % 28 + 1).cast("string"), 2, "0"),
        lit("</lastmod></url>"))
      Tables(s, dir, "documents")
        .select(col("doc_id").as("ord"), entry.as("value"))
        .unionAll(s.range(1).select(lit(-1L).as("ord"),
          lit("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
            "<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">").as("value")))
        .unionAll(s.range(1).select(lit(Long.MaxValue).as("ord"),
          lit("</urlset>").as("value")))
        .repartition(1).sortWithinPartitions("ord")
        .select("value")
        .write.mode("overwrite").text(p)
      p
    }
    val entries = readUrlEntries(s, out)
    entries
      .select(graft.clean.UrlFns.canonicalUrl(col("loc")).as("canon"),
        col("lastmod"))
      .groupBy(regexp_extract(col("canon"), "^[a-z0-9+.-]+://([^/:?#]+)", 1).as("host"))
      .agg(count(lit(1)).as("n_entries"),
        countDistinct(col("canon")).as("n_canonical"),
        min(col("lastmod")).as("lastmod_min"),
        max(col("lastmod")).as("lastmod_max"))
      .orderBy("host")
  }

  val all: Seq[Probe] = Seq(url7)
}
