package graft.ext

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only stage profiler for the x_pipe8 daily-increment steady path
  * (guide §1: find the serial stage in the 504-line plan before touching
  * anything). Times each staged sub-job of the per-shard run separately:
  * Bloom exact tier, band near-dup tier, segment novelty tier, the flags
  * assembly, KN scoring through the merged store, and the IVF cell join.
  * Usage: runMain graft.ext.ProfilePipe8 <sfDir> [reps]
  */
object ProfilePipe8 {
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

    def timed(name: String)(f: => Unit): Unit = {
      val ts = (1 to reps).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        f
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[profile] $name%-40s min=${ts.min}%6.3f all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = Tables(spark, sfDir, "documents")
    // build the train-once artifacts (not timed; TrainOnce caches them)
    noop(PipelineOps16.pipe8ForProfile(spark, sfDir))
    val art = graft.util.TrainOnce[String](s"pipe8:$sfDir")(
      sys.error("artifacts must already exist"))
    val shard = PipelineOps16.pipe8ShardForProfile(docs)

    timed("x_pipe8 full steady") { noop(PipelineOps16.pipe8ForProfile(spark, sfDir)) }
    timed("x_pipe8 full steady (spreads OFF)") {
      spark.conf.set("spark.graft.scan.minPartitions", "1")
      try noop(PipelineOps16.pipe8ForProfile(spark, sfDir))
      finally spark.conf.unset("spark.graft.scan.minPartitions")
    }
    timed("flags only (spreads ON)") {
      noop(PipelineOps16.pipe8FlagsForProfile(spark, art,
        Tables.spreadDf(PipelineOps16.pipe8ShardForProfile(docs)),
        graft.util.TempDirs.scratch("p8prof_fl_on")))
    }
    timed("flags only (spreads OFF)") {
      spark.conf.set("spark.graft.scan.minPartitions", "1")
      try noop(PipelineOps16.pipe8FlagsForProfile(spark, art,
        PipelineOps16.pipe8ShardForProfile(docs),
        graft.util.TempDirs.scratch("p8prof_fl_off")))
      finally spark.conf.unset("spark.graft.scan.minPartitions")
    }
    // hypothesis: keep the stage writes at their existing shuffle's
    // partition count (no AQE coalesce) so the read-backs parallelize
    // WITHOUT any new exchange
    timed("flags only (no AQE coalesce, spreads OFF)") {
      spark.conf.set("spark.graft.scan.minPartitions", "1")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      try noop(PipelineOps16.pipe8FlagsForProfile(spark, art,
        PipelineOps16.pipe8ShardForProfile(docs),
        graft.util.TempDirs.scratch("p8prof_fl_nc")))
      finally {
        spark.conf.unset("spark.sql.adaptive.coalescePartitions.enabled")
        spark.conf.unset("spark.graft.scan.minPartitions")
      }
    }
    timed("shard render only") { noop(shard) }
    timed("A: bloom mark+stage") {
      val run = graft.util.TempDirs.scratch("p8prof_a")
      val (m, k) = BloomIndex.loadMeta(spark, s"$art/bloom_idx")
      shard.join(
        BloomIndex.markDuplicates(shard, BloomIndex.load(spark, s"$art/bloom_idx"),
            spark.read.parquet(s"$art/digests"), m, k)
          .select(col("doc_id"), col("is_dup").cast("long").as("is_exact")),
        Seq("doc_id"))
        .write.mode("overwrite").parquet(s"$run/a")
    }
    // stage B/C inputs from one fixed staging of A so the tiers time alone
    val runFixed = graft.util.TempDirs.scratch("p8prof_fix")
    val (m, k) = BloomIndex.loadMeta(spark, s"$art/bloom_idx")
    shard.join(
      BloomIndex.markDuplicates(shard, BloomIndex.load(spark, s"$art/bloom_idx"),
          spark.read.parquet(s"$art/digests"), m, k)
        .select(col("doc_id"), col("is_dup").cast("long").as("is_exact")),
      Seq("doc_id"))
      .write.mode("overwrite").parquet(s"$runFixed/a")
    val survA = spark.read.parquet(s"$runFixed/a").filter(col("is_exact") === 0)
    timed("B: band collide+stage") {
      val run = graft.util.TempDirs.scratch("p8prof_b")
      survA
        .join(BandIndex.collidingNewIds(survA, BandIndex.load(spark, s"$art/bands_idx"))
          .withColumn("is_near", lit(1L)), Seq("doc_id"), "left")
        .withColumn("is_near", coalesce(col("is_near"), lit(0L)))
        .write.mode("overwrite").parquet(s"$run/b")
    }
    survA
      .join(BandIndex.collidingNewIds(survA, BandIndex.load(spark, s"$art/bands_idx"))
        .withColumn("is_near", lit(1L)), Seq("doc_id"), "left")
      .withColumn("is_near", coalesce(col("is_near"), lit(0L)))
      .write.mode("overwrite").parquet(s"$runFixed/b")
    val survB = spark.read.parquet(s"$runFixed/b").filter(col("is_near") === 0)
    timed("C: segment novelty") {
      noop(survB.join(
        SegIndex.newSegmentCounts(survB, SegIndex.load(spark, s"$art/seg_idx")),
        Seq("doc_id"), "left"))
    }
    val flags = PipelineOps16.pipe8FlagsForProfile(spark, art, shard,
      graft.util.TempDirs.scratch("p8prof_flags"))
    timed("KN score of kept") {
      noop(KnLm.knScoreWithTok(
        PipelineOps10.docTokens(flags.filter(col("kept") === 1L)),
        KnLm.loadKnTypes(spark, s"$art/kn_merged")))
    }
    timed("IVF cells read+join") {
      noop(flags.join(
        spark.read.parquet(s"$art/ivf/assignments")
          .filter(col("vec_id") % 4 === 0)
          .select(col("vec_id").as("doc_id"), col("cell").cast("long").as("ivf_cell")),
        Seq("doc_id"), "left"))
    }
    spark.stop()
  }
}
