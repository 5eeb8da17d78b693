package graft.ext

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only stage profiler for the link tier (guide §1: decide whether
  * the seconds go to planning, scan CPU, or shuffle before changing
  * anything). Times each sub-stage of the composed queries through the
  * noop sink, and separately times analysis+optimization alone
  * (queryExecution.executedPlan forced, no job run).
  * Usage: runMain graft.ProfileLink <sfDir> [reps]
  */
object ProfileLink {
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

    def timed(name: String)(f: => Unit): Unit = {
      val ts = (1 to reps).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        f
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[profile] $name%-34s min=${ts.min}%6.3f all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // planning only: force analysis + optimization + physical planning
    def plan(df: DataFrame): Unit = { df.queryExecution.executedPlan; () }

    // warm-up
    noop(LinkGraph.extractLinks(LinkGraph.linkedPages(docs)))

    timed("pages (render only)") { noop(LinkGraph.linkedPages(docs)) }
    timed("extractLinks PLAN-ONLY") { plan(LinkGraph.extractLinks(LinkGraph.linkedPages(docs))) }
    timed("extractLinks noop") { noop(LinkGraph.extractLinks(LinkGraph.linkedPages(docs))) }
    timed("  base-only (effectiveBase)") {
      noop(LinkGraph.linkedPages(docs).select(
        LinkGraph.effectiveBase(col("url"), col("html")).as("b")))
    }
    timed("  anchors-scan-only") {
      noop(LinkGraph.linkedPages(docs).select(
        explode(regexp_extract_all(col("html"), lit(LinkGraph.aOpenRe), lit(1))).as("a")))
    }
    timed("  scan+attrs (href+rel)") {
      noop(LinkGraph.linkedPages(docs).select(
        explode(regexp_extract_all(col("html"), lit(LinkGraph.aOpenRe), lit(1))).as("a"))
        .select(LinkGraph.hrefOfAttrs(col("a")).as("h"),
          LinkGraph.nofollowOfAttrs(col("a")).as("nf")))
    }
    timed("hostGraph PLAN-ONLY") { plan(LinkGraph.hostGraph(
      LinkGraph.extractLinks(LinkGraph.linkedPages(docs)))) }
    timed("hostGraph noop") { noop(LinkGraph.hostGraph(
      LinkGraph.extractLinks(LinkGraph.linkedPages(docs)))) }
    timed("x_lnk2 full (rank)") {
      noop(LinkGraph.pageRankHosts(LinkGraph.hostGraph(
        LinkGraph.extractLinks(LinkGraph.linkedPages(docs))), iters = 5)
        .select(col("host"), col("rank_ppb").cast("long").as("rank_ppb"))
        .orderBy(col("rank_ppb").desc, col("host")))
    }
    timed("anchorTexts PLAN-ONLY") { plan(LinkGraph.anchorTexts(LinkGraph.linkedPages(docs))) }
    timed("anchorTexts noop") { noop(LinkGraph.anchorTexts(LinkGraph.linkedPages(docs))) }
    spark.stop()
  }
}
