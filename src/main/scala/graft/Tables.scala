package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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
      // events.ts has shipped as TIMESTAMP(NANOS) in some testdata
      // generations (which Spark's vectorized reader can only surface as a
      // raw int64 under nanosAsLong) and as TIMESTAMP(MICROS,
      // isAdjustedToUTC=false) in others (which reads as TIMESTAMP_NTZ).
      // Dispatch on the type the scan ACTUALLY produced and normalize to a
      // session-tz TIMESTAMP either way, so a regenerated file can never
      // silently change query semantics again; anything unexpected fails
      // loudly here at load rather than per-query downstream.
      setEventsConfs(spark)
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.withColumn("ts", normalizeEventsTs(raw.schema("ts").dataType))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }

  /** The type the parquet scan surfaces for events.ts in this testdata
    * generation (requires nanosAsLong so a NANOS file is readable at all —
    * set it session-wide here, harmless for every other type).
    */
  def eventsTsScanType(spark: SparkSession, dir: String): org.apache.spark.sql.types.DataType = {
    setEventsConfs(spark)
    spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType
  }

  /** Session confs the events load depends on: nanosAsLong (a NANOS file is
    * unreadable without it) and UTC session timezone — the NTZ→TIMESTAMP
    * cast in [[normalizeEventsTs]] is value-preserving ONLY under UTC, so a
    * foreign session (built outside Bench/Verify/tests) with a local tz
    * must not silently shift every event time relative to the oracle.
    */
  private def setEventsConfs(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
  }

  /** ts normalized to a session-tz TIMESTAMP from whichever encoding the
    * scan produced. Shared by the batch loader and the streaming source so
    * the two can never diverge on a testdata regeneration.
    */
  def normalizeEventsTs(scanned: org.apache.spark.sql.types.DataType): Column = scanned match {
    case LongType         => expr("timestamp_micros(ts DIV 1000)") // ns → µs, lossless (values µs-aligned)
    case TimestampNTZType => col("ts").cast(TimestampType) // value-preserving under UTC session tz
    case TimestampType    => col("ts")
    case other => throw new IllegalStateException(
      s"events.ts: expected INT64 nanos, TIMESTAMP_NTZ, or TIMESTAMP; scan produced $other")
  }
}
