package graft.ext

import graft.{Probe, Tables}
import graft.clean.EncodingFns
import org.apache.spark.sql.functions._

/** Round-10 additions (tenth wave): encoding repair — the ftfy-lite
  * mojibake/BOM/C1 stage ([[graft.clean.EncodingFns]]) that runs before
  * any text statistic, pinned cross-engine on planted fixtures built
  * deterministically INSIDE the query (the x_html1 discipline: both
  * engines repair byte-identical text).
  */
object PipelineOps15 {

  /** The planted damage prefix: a scattered BOM, cp1252-rendered curly
    * quotes / em dash, single- and double-mojibake accents (nbsp and
    * soft-hyphen continuations included), guillemets, and a C1 control —
    * one sample per rule family of the repair chain.
    */
  private[graft] val planted =
    "\ufeffCafÃ© â€œnaÃ¯veâ€\u009d â€” dÃ©jÃ\u00a0 vu ÃƒÂ© Â«xÂ»\u0085 end: "

  /** X-ENC1 — encoding repair over planted-damage documents: BOM strip,
    * the ordered mojibake common table (incl. the one-level-per-pass
    * double-encoding behavior: "ÃƒÂ©" → "Ã©" after ONE pass), C1 drop —
    * byte-exact against the DuckDB twin of the same chain, with the
    * repaired length beside it (the n_chars every downstream gate sees).
    */
  private val enc1 = Probe(
    "x_enc1_repair_encoding",
    s"""WITH d AS (
       |  SELECT doc_id, ${EncodingFns.sqlLit(planted)} || text AS text FROM documents),
       |r AS (SELECT doc_id, ${EncodingFns.repairEncodingDuck("text")} AS text FROM d)
       |SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n_chars
       |FROM r ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val damaged = Tables(s, dir, "documents")
      .select(col("doc_id"), concat(lit(planted), col("text")).as("text"))
    graft.api.Corpus(damaged).repairEncoding().df
      .select(col("doc_id"), col("text"), length(col("text")).cast("long").as("n_chars"))
      .orderBy("doc_id")
  }

  val all: Seq[Probe] = Seq(enc1)
}
