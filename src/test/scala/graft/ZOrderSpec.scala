package graft

import graft.util.Scale
import org.apache.spark.sql.functions._

/** Z-order layout: writing in Morton-curve order clusters BOTH dimensions
  * per file (every contiguous curve slice is a quadrant), which is what
  * lets parquet min/max stats skip files for range predicates on either
  * column. A single-column sort clusters only its own column — the other
  * dimension spans the full range in every file.
  */
class ZOrderSpec extends SparkSuite {

  test("z-order write bounds per-file ranges in BOTH dimensions; x-sort does not") {
    val s = spark
    import s.implicits._
    // full 256x256 grid, one row per cell
    val grid = s.range(0, 65536L).select(
      (col("id") / 256).cast("long").as("x"),
      pmod(col("id"), lit(256L)).as("y"))
      .withColumn("zv", Scale.zValue2(col("x"), col("y"), bits = 8))

    def fileRanges(sorted: org.apache.spark.sql.DataFrame): Array[(Long, Long)] = {
      val out = java.nio.file.Files.createTempDirectory("zorder").toString
      sorted.write.mode("overwrite").parquet(out)
      s.read.parquet(out)
        .groupBy(input_file_name())
        .agg((max("x") - min("x")).as("xr"), (max("y") - min("y")).as("yr"))
        .collect().map(r => (r.getLong(1), r.getLong(2)))
    }

    // 16 contiguous curve slices ~= 16 64x64 quadrants. Range-partitioner
    // boundaries are SAMPLED, not quadrant-aligned, so a slice straddling
    // a top-level curve corner spans that dimension — the clustering
    // claim is per-layout, not per-file: nearly all files bounded, and
    // the mean range far below full-width in BOTH dimensions.
    val z = fileRanges(grid.repartitionByRange(16, col("zv")).sortWithinPartitions("zv"))
    assert(z.length == 16)
    assert(z.count { case (xr, _) => xr <= 128 } >= 14, s"x ranges: ${z.mkString(",")}")
    assert(z.count { case (_, yr) => yr <= 128 } >= 14, s"y ranges: ${z.mkString(",")}")
    assert(z.map(_._1).sum / z.length <= 128 && z.map(_._2).sum / z.length <= 128,
      s"mean per-file range must be far below 255: ${z.mkString(",")}")

    // the single-column sort baseline: x clusters, y spans the full range
    val xs = fileRanges(grid.repartitionByRange(16, col("x")).sortWithinPartitions("x"))
    assert(xs.forall { case (xr, _) => xr <= 32 })
    assert(xs.forall { case (_, yr) => yr == 255L },
      s"x-sorted files should span all of y: ${xs.mkString(",")}")
  }

  test("zValue2 matches a hand-computed interleave") {
    val s = spark
    import s.implicits._
    val r = Seq((5L, 3L)).toDF("x", "y") // x=101b -> bits 0,2 @ even; y=11b -> bits 0,1 @ odd
      .select(Scale.zValue2(col("x"), col("y"), bits = 4).as("z"))
      .head().getLong(0)
    // x bits: 1@0->pos0, 0@1, 1@2->pos4; y bits: 1@0->pos1, 1@1->pos3
    assert(r == ((1L << 0) | (1L << 4) | (1L << 1) | (1L << 3)), s"got $r")
  }
}
