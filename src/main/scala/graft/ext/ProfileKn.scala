package graft.ext

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only stage profiler for the KN-LM tier (guide §1: decide where the
  * seconds go — tokenize, explode+digest, the type aggregation, the table
  * derivations, or the scoring joins — before restructuring anything).
  * Usage: runMain graft.ext.ProfileKn <sfDir> [reps]
  */
object ProfileKn {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def docs = Tables(spark, sfDir, "documents")
    def sdocs = Tables.spread(spark, sfDir, "documents")

    def timed(name: String)(f: => Unit): Unit = {
      val ts = (1 to reps).map { _ =>
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
        val t0 = System.nanoTime()
        f
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[profile] $name%-40s min=${ts.min}%6.3f all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warm-up
    noop(KnLm.knScore(docs, docs))

    timed("tokenize (plain scan)") { noop(PipelineOps10.docTokens(docs)) }
    timed("tokenize (spread)") { noop(PipelineOps10.docTokens(sdocs)) }
    timed("trigram explode+digest (plain)") {
      noop(KnLm.trigramsTok(PipelineOps10.docTokens(docs)).select(
        col("doc_id"),
        substring(md5(concat_ws(" ", col("a"), col("b"), col("c"))), 1, 16).as("h3")))
    }
    timed("trigram explode+digest (spread)") {
      noop(KnLm.trigramsTok(PipelineOps10.docTokens(sdocs)).select(
        col("doc_id"),
        substring(md5(concat_ws(" ", col("a"), col("b"), col("c"))), 1, 16).as("h3")))
    }
    timed("trigramTypes agg (spread)") { noop(KnLm.trigramTypesForProfile(PipelineOps10.docTokens(sdocs))) }
    timed("bigramTypes agg (spread)") { noop(KnLm.bigramTypesForProfile(PipelineOps10.docTokens(sdocs))) }
    timed("x_txt22 knScore full") { noop(KnLm.knScore(docs, docs)) }
    timed("x_txt22 staged variant") { noop(KnLm.knScoreStagedForProfile(docs)) }

    // ---- stored-path (x_txt22d / pipe8-KN) table-side fixed costs ----
    val storePath = graft.util.TrainOnce(s"kn_store:$sfDir") {
      val p = graft.util.TempDirs.scratch("graft_kn_store")
      KnLm.buildKn(docs, p)
      p
    }
    def tables = KnLm.loadKnTables(spark, storePath)
    timed("stored: t3 noop") { noop(tables.t3) }
    timed("stored: ctx agg noop") { noop(tables.ctx) }
    timed("stored: mid agg noop") { noop(tables.mid) }
    timed("stored: u2 noop") { noop(tables.u2) }
    timed("stored: sc noop") { noop(tables.sc) }
    import spark.implicits._
    val oneDoc = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    timed("stored: score 1-row stream (fixed cost)") {
      noop(KnLm.knScoreWithTok(PipelineOps10.docTokens(oneDoc), tables))
    }
    timed("x_txt22d full (stored)") {
      noop(KnLm.knScoreWithTok(PipelineOps10.docTokens(docs), tables))
    }

    // cardinalities: is the type/occurrence ratio worth per-type digests?
    val tok = PipelineOps10.docTokens(sdocs)
    val tri = KnLm.trigramsTok(tok)
    val occ = tri.count()
    val types = tri.select(substring(md5(concat_ws(" ", col("a"), col("b"), col("c"))), 1, 16)).distinct().count()
    println(s"[profile] trigram occurrences=$occ types=$types ratio=${occ.toDouble / types}")
    spark.stop()
  }
}
