package graft.ext

import graft.{Probe, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted sketch store — the train-once / query-many regime for corpus
  * summaries, the [[BandIndex]] / [[IvfIndex]] pattern applied to sketches:
  * a 100 TB corpus is scanned ONCE to produce kilobytes of sketch state;
  * every later frequency / cardinality question is answered from the store
  * without touching corpus text. Cells merge by addition (count-min) or
  * k-minimum union (KMV), so shards sketch independently and the store
  * combines them — SketchStoreSpec pins merged == whole-corpus.
  */
object SketchStore {

  /** Write the count-min cells of `docs` as the persisted sketch. */
  def buildCms(docs: DataFrame, path: String): Unit =
    PipelineOps8.countMinCells(docs)
      .coalesce(1) // <= 768 rows: one file IS the right layout
      .write.mode("overwrite").parquet(path)

  def loadCms(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Merge two persisted sketches: cell-wise addition — the property that
    * lets shards sketch independently.
    */
  def mergeCms(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("r"), col("slot")).agg(sum(col("c")).as("c"))

  /** X-SKT1B — the count-min probe through the PERSISTED store: the sketch
    * is built once, written as parquet, read back, and queried — and must
    * produce x_skt1's identical table (shared oracle SQL). This pins the
    * full round trip (schema, types, cell values) rather than just the
    * in-memory algebra.
    */
  private val skt1b = Probe(
    "x_skt1b_countmin_stored", PipelineOps8.countMinOracleSql) { (s, dir) =>
    val docs = Tables(s, dir, "documents")
    // store built train-once per corpus dir; steady times the scoring read
    val path = graft.util.TrainOnce(s"cms_store:$dir") {
      val p = graft.util.TempDirs.scratch("graft_cms_store")
      buildCms(docs, p)
      p
    }
    PipelineOps8.estimateTopTokens(docs, loadCms(s, path))
  }

  val all: Seq[Probe] = Seq(skt1b)
}
