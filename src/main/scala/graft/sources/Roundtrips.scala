package graft.sources

import graft.{Probe, Tables}
import org.apache.spark.sql.functions._

/** Sink/scan round-trip probes beyond parquet and CSV (the OSM S4/S5
  * pair): each probe writes the documents table through another format
  * Spark ships natively, reads it back, and surfaces a content
  * fingerprint — hash-checked against the DuckDB oracle reading the
  * ORIGINAL parquet, so any fidelity loss in the sink or the scan
  * (encoding, type mapping, row loss) breaks the gate.
  *
  * Scale notes: both writes shard per task (no coalesce — an N-executor
  * cluster writes N-way parallel); both scans are splittable (ORC stripes;
  * JSON-lines splits at line boundaries). JSON is schema-on-read — the
  * read supplies the writer's schema explicitly, the honest contract for
  * a landing-zone format (inference is a second full scan AND can widen
  * types).
  */
object Roundtrips {

  private def rt(spark: org.apache.spark.sql.SparkSession, dir: String,
      fmt: String, options: Map[String, String] = Map.empty): org.apache.spark.sql.DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val out = graft.util.TempDirs.scratch(s"graft_rt_$fmt")
    docs.write.mode("overwrite").format(fmt).options(options).save(out)
    spark.read.schema(docs.schema).format(fmt).options(options).load(out)
      .select(col("doc_id"), col("lang"), col("source"),
        col("n_chars").cast("long").as("n_chars"),
        md5(col("text")).as("content_fp"))
      .orderBy("doc_id")
  }

  private val oracle =
    """SELECT doc_id, lang, source, CAST(n_chars AS BIGINT) AS n_chars,
      |       md5(text) AS content_fp
      |FROM documents ORDER BY doc_id""".stripMargin

  /** X-SRC1 — ORC sink + scan round-trip (Spark-native columnar sibling
    * of parquet; stripe-splittable, predicate-pushdown-capable).
    */
  private val src1 = Probe("x_src1_orc_roundtrip", oracle)((s, dir) => rt(s, dir, "orc"))

  /** X-SRC2 — JSON-lines sink + scan round-trip: the landing-zone text
    * format. Every byte of `text` (newlines, unicode, quotes) must
    * survive JSON escaping both ways for the fingerprint to match.
    */
  private val src2 = Probe("x_src2_json_roundtrip", oracle)((s, dir) => rt(s, dir, "json"))

  /** X-SRC3 — GZIP-compressed JSON-lines round-trip: the crawl
    * interchange format as it actually arrives (WET/WARC-derived dumps
    * ship gzipped). Codec caveat at scale, stated where the operator
    * lives: plain .gz files are NOT splittable — one stream per file —
    * so ingest parallelism equals file count; dumps arrive as many
    * shard files, which is exactly what the sharded write produces.
    */
  private val src3 = Probe("x_src3_jsonl_gzip_roundtrip", oracle)((s, dir) =>
    rt(s, dir, "json", Map("compression" -> "gzip")))

  val all: Seq[Probe] = Seq(src1, src2, src3)
}
