package graft.ext

import graft.{Probe, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column conventions: media as opaque BINARY content plus a
  * typed metadata struct, with decode/feature-extract as batched
  * per-partition transforms.
  *
  * The container has no image/audio codecs, so `decodeStub` is a
  * clearly-marked deterministic fake — but the Spark-side plumbing is real:
  * the schema convention, the Dataset[MediaRow] encoder, the mapPartitions
  * batch shape (one codec init per partition, NOT per row — the pattern
  * that matters at 100 TB), and the metadata-only pushdown path.
  */
object Multimodal {

  /** Schema convention for a multimodal column bundle. */
  case class MediaMeta(mime: String, n_bytes: Long, sha_prefix: String)
  case class MediaRow(doc_id: Long, content: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(doc_id: Long, mime: String, n_bytes: Long, feature: Array[Double])

  /** Build the binary bundle from the documents table (UTF-8 bytes stand in
    * for real media content; at 100 TB this is `spark.read.format("binaryFile")`
    * or parquet with a BINARY column).
    */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables(spark, dir, "documents")
      .select(col("doc_id"),
        encode(col("text"), "utf-8").as("content"),
        struct(
          lit("text/plain").as("mime"),
          octet_length(col("text")).cast("long").as("n_bytes"),
          substring(md5(col("text")), 1, 8).as("sha_prefix")).as("meta"))
      .as[MediaRow]
  }

  /** STUB decode: a real codec would parse `content` here. Deterministic
    * fake: 4 "features" derived from byte statistics. Batched per
    * partition so a real codec is initialized once per task.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init would go here (codec handles, model weights, ...)
      rows.map { r =>
        val bytes = r.content
        val n = bytes.length.max(1)
        val sum = bytes.foldLeft(0L)((a, b) => a + (b & 0xff))
        val feature = Array[Double](
          n.toDouble,
          sum.toDouble / n,
          bytes.count(_ == ' '.toByte).toDouble,
          (sum % 251).toDouble)
        MediaFeatures(r.doc_id, r.meta.mime, r.meta.n_bytes, feature)
      }
    }
  }

  /** X-MM1 — metadata-only path (oracle-checked): byte length, content
    * hash prefix, mime. The scan should never materialize `content` when
    * only metadata is projected.
    */
  private val mm1 = Probe(
    "x_mm1_binary_metadata",
    """SELECT doc_id, 'text/plain' AS mime,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  substr(md5(text), 1, 8) AS sha_prefix,
      |  lang, source
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Tables(s, dir, "documents").select(
      col("doc_id"), lit("text/plain").as("mime"),
      octet_length(col("text")).cast("long").as("n_bytes"),
      substring(md5(col("text")), 1, 8).as("sha_prefix"),
      col("lang"), col("source"))
      .orderBy("doc_id")
  }

  /** X-MM2 — the full binary pipeline: binary bundle → batched feature
    * extraction (stubbed decode) → aggregate. The feature math is integer
    * / exact, so even the stub is oracle-checkable.
    */
  private val mm2 = Probe(
    "x_mm2_binary_features",
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  CAST(len(string_split(text, ' ')) - 1 AS BIGINT) AS n_spaces,
      |  CAST(list_sum(list_transform(range(1, length(text) + 1),
      |       i -> ascii(substr(text, CAST(i AS INT), 1)))) % 251 AS BIGINT) AS byte_mod
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    extractFeatures(mediaTable(s, dir))
      .select(col("doc_id"),
        element_at(col("feature"), 1).cast("long").as("n_bytes"),
        element_at(col("feature"), 3).cast("long").as("n_spaces"),
        element_at(col("feature"), 4).cast("long").as("byte_mod"))
      .orderBy("doc_id")
  }

  /** X-MM3 — frame sampling: treat each document as a fake "video" whose
    * frame count derives from its metadata; emit every 5th frame as its own
    * row with a per-frame fingerprint. The plumbing is the real thing —
    * sequence + explode fans one media row out to per-frame records that
    * downstream decode/embed stages consume in parallel; only the frame
    * bytes are faked (no codecs in this container).
    */
  private val mm3 = Probe(
    "x_mm3_frame_sample",
    """SELECT doc_id, CAST(f AS BIGINT) AS frame_idx,
      |       md5(doc_id || ':' || f) AS frame_fp
      |FROM (SELECT doc_id, unnest(range(0, (n_chars % 50) + 1, 5)) AS f
      |      FROM documents)
      |ORDER BY doc_id, frame_idx""".stripMargin) { (s, dir) =>
    Tables(s, dir, "documents")
      .withColumn("n_frames", (col("n_chars") % 50 + 1).cast("int"))
      .select(col("doc_id"),
        explode(expr("sequence(0, n_frames - 1, 5)")).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        md5(concat(col("doc_id").cast("string"), lit(":"),
          col("frame_idx").cast("string"))).as("frame_fp"))
      .orderBy("doc_id", "frame_idx")
  }

  /** STUB resize: a real implementation decodes, scales, re-encodes. The
    * deterministic fake preserves the plumbing contract: metadata-driven,
    * per-row, output carries the requested dimensions plus a content tag.
    */
  def resizeStub(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition scaler init would go here
      rows.map { r =>
        MediaFeatures(r.doc_id, r.meta.mime, r.meta.n_bytes,
          Array(w.toDouble, h.toDouble, r.content.length.toDouble))
      }
    }
  }

  val all: Seq[Probe] = Seq(mm1, mm2, mm3)
}
