package graft

import graft.streaming.EventStreams
import graft.streaming.EventStreams.{Event, Session}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Incremental sessionization across micro-batches (MemoryStream-driven):
  * a session spanning two batches must be emitted ONCE, merged — not
  * split — and only after the watermark closes it.
  */
class StreamingSessionSpec extends SparkSuite {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("session spanning micro-batches merges; timeout closes it once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[Event]
    val sessions = EventStreams.sessionizeStreaming(
      input.toDS().withWatermark("ts", "0 seconds").as[Event])

    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    try {
      // batch 1: two events 5 minutes apart (one open session)
      input.addData(
        Event(1, ts("2024-01-01 10:00:00"), 7L, "click", 1.0),
        Event(2, ts("2024-01-01 10:05:00"), 7L, "click", 1.0))
      q.processAllAvailable()
      assert(spark.table("sess_out").count() == 0) // still open

      // batch 2: continues the same session (10:20 < 10:05 + 30min)
      input.addData(Event(3, ts("2024-01-01 10:20:00"), 7L, "click", 1.0))
      q.processAllAvailable()
      assert(spark.table("sess_out").count() == 0) // still open, merged

      // batch 3: an event far in the future advances the watermark past
      // 10:20 + 30min -> the session times out and is emitted ONCE, merged
      input.addData(Event(9, ts("2024-01-01 23:00:00"), 8L, "click", 1.0))
      q.processAllAvailable()
      val out = spark.table("sess_out").as[Session].collect().toSeq
      assert(out.length == 1, s"expected one closed session, got $out")
      val s7 = out.head
      assert(s7.user_id == 7L)
      assert(s7.n_events == 3L) // batches 1+2 merged, not split
      assert(s7.start_us == ts("2024-01-01 10:00:00").getTime * 1000)
      assert(s7.end_us == ts("2024-01-01 10:20:00").getTime * 1000)
    } finally q.stop()
  }

  test("RocksDB state store: session_window streaming agg matches batch") {
    // HDFS-backed in-memory state is the local default; RocksDB is the
    // backend that holds at 100 TB state sizes (spill-to-disk, incremental
    // checkpointing). The SAME query must produce the SAME result under it.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[Event]
    def agg(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), unix_micros(col("sw.start")).as("start_us"), col("n_events"))
    val q = agg(input.toDS().withWatermark("ts", "0 seconds").toDF())
      .writeStream.outputMode("append").format("memory").queryName("rocks_out").start()
    try {
      val events = Seq(
        Event(1, ts("2024-01-01 10:00:00"), 7L, "click", 1.0),
        Event(2, ts("2024-01-01 10:05:00"), 7L, "click", 1.0),
        Event(3, ts("2024-01-01 12:00:00"), 7L, "click", 1.0),
        Event(4, ts("2024-01-01 10:01:00"), 8L, "click", 1.0))
      input.addData(events: _*); q.processAllAvailable()
      // sentinel far in the future closes every session
      input.addData(Event(9, ts("2024-01-02 12:00:00"), 9L, "click", 1.0))
      q.processAllAvailable()
      val got = spark.table("rocks_out").filter(col("user_id") < 9)
        .orderBy("user_id", "start_us")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val want = agg(events.toDS().toDF()).orderBy("user_id", "start_us")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got.nonEmpty && got == want, s"rocksdb $got != batch $want")
    } finally {
      q.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("native session_window streaming: cross-batch merge matches the batch form") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[Event]
    // the SAME declaration as p_evt3_session_window's batch aggregation
    def sessions(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), unix_micros(col("sw.start")).as("start_us"),
        unix_micros(col("sw.end")).as("end_us"), col("n_events"))

    val q = sessions(input.toDS().withWatermark("ts", "0 seconds").toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("swin_out").start()
    try {
      val batch1 = Seq(
        Event(1, ts("2024-01-01 10:00:00"), 7L, "click", 1.0),
        Event(2, ts("2024-01-01 10:05:00"), 7L, "click", 1.0))
      val batch2 = Seq(Event(3, ts("2024-01-01 10:20:00"), 7L, "click", 1.0))
      val sentinel = Seq(Event(9, ts("2024-01-01 23:00:00"), 8L, "click", 1.0))
      input.addData(batch1: _*); q.processAllAvailable()
      input.addData(batch2: _*); q.processAllAvailable()
      // watermark must pass end-of-session before append mode emits it
      input.addData(sentinel: _*); q.processAllAvailable()

      val got = spark.table("swin_out").filter(col("user_id") === 7L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      val want = sessions((batch1 ++ batch2).toDS().toDF())
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      assert(got.length == 1, s"session split across batches: $got")
      assert(got == want, s"stream $got != batch $want")
    } finally q.stop()
  }
}
