package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface over the events table: watermarked tumbling
  * windows and custom stateful sessionization.
  *
  * The transforms are written against a plain DataFrame so the SAME code
  * runs in batch (correctness/oracle path) and streaming (readStream) —
  * the Spark-native way to keep one definition of a windowed aggregation.
  */
object EventStreams {

  /** events schema as stored, with ts at whatever type this testdata
    * generation's encoding scans as (int64-nanos → LongType under
    * nanosAsLong; TIMESTAMP(MICROS, isAdjustedToUTC=false) → TIMESTAMP_NTZ).
    * The streaming file source needs an explicit schema, so probe the batch
    * scan once — a fixed guess here is exactly what broke when the data was
    * regenerated with a different encoding.
    */
  def rawSchema(tsType: org.apache.spark.sql.types.DataType): StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", tsType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Streaming scan of the events parquet (file-source; at scale this is a
    * directory the ingest keeps appending to, or a Kafka source with the
    * same downstream plan). ts is normalized to a session-tz TIMESTAMP via
    * the same dispatch as the batch loader (graft.Tables), so batch and
    * stream can never disagree on event time.
    */
  def readStream(spark: SparkSession, dir: String): DataFrame = {
    val tsType = graft.Tables.eventsTsScanType(spark, dir)
    spark.readStream.schema(rawSchema(tsType)).format("parquet")
      .option("pathGlobFilter", "events.parquet") // file source wants a dir
      .load(dir)
      .withColumn("ts", graft.Tables.normalizeEventsTs(tsType))
  }

  /** Tumbling 5-minute windowed aggregate with a 10-minute watermark.
    * Works identically on a batch DataFrame (watermark is a no-op there).
    */
  def tumblingAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value").cast("decimal(18,2)"))
        .cast("decimal(18,2)").as("sum_value"))
      .select(unix_micros(col("window.start")).as("win_start_us"),
        col("event_type"), col("n"), col("sum_value"))

  /** Idempotent ingestion — p_evt6's semantics at the stream door: one
    * event per (user, type, hour bucket), duplicates from retries /
    * at-least-once redelivery dropped by stateful dropDuplicates. The
    * watermark bounds state: buckets older than 2 hours of event time are
    * evicted, which is what makes this runnable forever. Batch keeps the
    * earliest event per bucket (the oracle-checked window form); the
    * stream keeps the first ARRIVAL — the kept-event identity may differ,
    * the surviving BUCKET set cannot (StreamingSpec pins it).
    */
  def dedupHourly(events: DataFrame): DataFrame =
    events
      .withColumn("h", date_trunc("hour", col("ts")))
      .withWatermark("h", "2 hours")
      .dropDuplicates("user_id", "event_type", "h")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("h")).as("hour_us"), col("event_id"))

  /** Stream-door rate-anomaly detection — p_evt7b's static-baseline
    * regime as a stream: hourly tumbling counts per type (watermark-
    * bounded state) z-scored against a RELEASED baseline table
    * (types-sized stream-static broadcast, built batch-side with
    * `ext.PipelineOps10.rateBaseline`). The trailing-window form
    * (p_evt7) needs 24 buckets of history per type — state a stream
    * restart loses; the released-baseline form is the deployable one,
    * and StreamingSpec pins stream ≡ batch on the scored buckets.
    */
  def rateAnomalies(events: DataFrame, baseline: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("event_type"), unix_micros(col("window.start")).as("hour_us"),
        col("n").cast("long").as("n"))
      .join(broadcast(baseline), Seq("event_type"), "left")
      .withColumn("z", when(col("nb") >= 12 && col("sd") > 0,
        round((col("n") - col("mu")) / col("sd"), 4)))
      .withColumn("is_anomaly", coalesce(col("z") >= 2 || col("z") <= -2, lit(false)))
      .select(col("event_type"), col("hour_us"), col("n"), col("z"), col("is_anomaly"))

  // ---- stateful sessionization (flatMapGroupsWithState) ----

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  case class SessionState(startUs: Long, lastUs: Long, n: Long, sum: Double)
  case class Session(user_id: Long, start_us: Long, end_us: Long,
      n_events: Long, sum_value: Double)

  private val gapUs = 30L * 60 * 1000000

  private def micros(t: java.sql.Timestamp): Long = {
    val i = t.toInstant; i.getEpochSecond * 1000000L + i.getNano / 1000
  }

  /** The shared gap-splitting state machine: fold a user's (sorted) events
    * into an optional carried-over open session, returning (closed
    * sessions, new open session). Out-of-order events that merge into the
    * open session extend its bounds with min/max — they never regress
    * lastUs (which would re-arm the timeout too early and emit
    * end_us < start_us).
    */
  private def foldEvents(userId: Long, carried: Option[SessionState],
      sorted: Seq[Event]): (Seq[Session], Option[SessionState]) = {
    val closed = scala.collection.mutable.ListBuffer.empty[Session]
    var cur = carried
    sorted.foreach { e =>
      val us = micros(e.ts)
      cur match {
        case Some(st) if us - st.lastUs <= gapUs =>
          cur = Some(SessionState(math.min(st.startUs, us), math.max(st.lastUs, us),
            st.n + 1, st.sum + e.value))
        case Some(st) =>
          closed += Session(userId, st.startUs, st.lastUs, st.n, st.sum)
          cur = Some(SessionState(us, us, 1, e.value))
        case None =>
          cur = Some(SessionState(us, us, 1, e.value))
      }
    }
    (closed.toSeq, cur)
  }

  /** Incremental streaming sessionization (the production form): the open
    * session lives in state across micro-batches; a session is emitted
    * exactly once — either when a later event breaks the 30-minute gap or
    * when the event-time timeout fires (watermark passed last event + gap).
    * Requires a watermark on ts upstream. NOT for batch use: timeouts
    * never fire there, so the final open session would be lost — use
    * sessionize for batch.
    */
  def sessionizeStreaming(events: Dataset[Event]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed lastUs + gap: the open session is closed
            val st = state.get
            state.remove()
            Iterator.single(Session(userId, st.startUs, st.lastUs, st.n, st.sum))
          } else {
            val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
            val (closed, cur) = foldEvents(userId, state.getOption, sorted)
            cur.foreach { st =>
              state.update(st) // keep the open session across batches
              state.setTimeoutTimestamp((st.lastUs + gapUs) / 1000) // ms
            }
            closed.iterator
          }
      }
  }

  /** 30-minute-gap sessions per user — BATCH-complete semantics: each
    * group arrives in one call, sessions (including the final open one)
    * are emitted at end-of-group. The batch-equivalent lag/cumsum form is
    * oracle-checked as p_evt2_sessionize.
    */
  def sessionize(events: Dataset[Event]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
          val (closed, cur) = foldEvents(userId, state.getOption, sorted)
          (closed ++ cur.map(st =>
            Session(userId, st.startUs, st.lastUs, st.n, st.sum))).iterator
      }
  }
}
