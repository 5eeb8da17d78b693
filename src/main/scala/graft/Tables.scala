package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  * All reads go through here so filter pushdown / column pruning apply to a
  * plain parquet scan — at 100 TB these become partitioned/bucketed reads
  * without touching call sites.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is TIMESTAMP(NANOS) parquet, which Spark's vectorized
      // reader rejects; read the raw int64 nanos and convert (values are
      // µs-aligned, so DIV 1000 is lossless).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
}
