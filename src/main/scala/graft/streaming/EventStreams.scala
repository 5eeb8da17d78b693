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

  /** events schema as stored (ts is int64 TIMESTAMP(NANOS) in the parquet;
    * read as long and converted, matching graft.Tables).
    */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Streaming scan of the events parquet (file-source; at scale this is a
    * directory the ingest keeps appending to, or a Kafka source with the
    * same downstream plan).
    */
  def readStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream.schema(rawSchema).format("parquet")
      .option("pathGlobFilter", "events.parquet") // file source wants a dir
      .load(dir)
      .withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
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

  // ---- stateful sessionization (flatMapGroupsWithState) ----

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  case class SessionState(startUs: Long, lastUs: Long, n: Long, sum: Double)
  case class Session(user_id: Long, start_us: Long, end_us: Long, n_events: Long)

  /** 30-minute-gap sessions per user via custom state — BATCH-complete
    * semantics: each group arrives in one call, sessions (including the
    * final open one) are emitted at end-of-group. A continuous-streaming
    * deployment needs event-time timeout + watermark eviction to close
    * sessions across micro-batches (SURVEY.md §9 backlog); the
    * batch-equivalent lag/cumsum form is oracle-checked as
    * p_evt2_sessionize.
    */
  /** Incremental streaming sessionization (the production form): the open
    * session lives in state across micro-batches; a session is emitted
    * exactly once — either when a later event breaks the 30-minute gap or
    * when the event-time timeout fires (watermark passed last event + gap).
    * Requires a watermark on ts upstream.
    */
  def sessionizeStreaming(events: Dataset[Event]): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapUs = 30L * 60 * 1000000

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          def micros(t: java.sql.Timestamp): Long = {
            val i = t.toInstant; i.getEpochSecond * 1000000L + i.getNano / 1000
          }
          if (state.hasTimedOut) {
            // watermark passed lastUs + gap: the open session is closed
            val st = state.get
            state.remove()
            Iterator.single(Session(userId, st.startUs, st.lastUs, st.n))
          } else {
            val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
            val closed = scala.collection.mutable.ListBuffer.empty[Session]
            var cur: Option[SessionState] = state.getOption
            sorted.foreach { e =>
              val us = micros(e.ts)
              cur match {
                case Some(st) if us - st.lastUs <= gapUs =>
                  cur = Some(st.copy(lastUs = us, n = st.n + 1, sum = st.sum + e.value))
                case Some(st) =>
                  closed += Session(userId, st.startUs, st.lastUs, st.n)
                  cur = Some(SessionState(us, us, 1, e.value))
                case None =>
                  cur = Some(SessionState(us, us, 1, e.value))
              }
            }
            cur match {
              case Some(st) =>
                state.update(st) // keep the open session across batches
                state.setTimeoutTimestamp((st.lastUs + gapUs) / 1000) // ms
              case None => ()
            }
            closed.iterator
          }
      }
  }

  def sessionize(events: Dataset[Event]): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapUs = 30L * 60 * 1000000

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessionState], Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[List[SessionState]]) =>
          // batch mode: all of a user's events arrive in one call; sort and
          // split on gaps. (In production streaming this would use event-time
          // timeout to close sessions incrementally.)
          def micros(t: java.sql.Timestamp): Long = {
            val i = t.toInstant; i.getEpochSecond * 1000000L + i.getNano / 1000
          }
          val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
          val sessions = scala.collection.mutable.ListBuffer.empty[Session]
          var cur: Option[SessionState] = state.getOption.flatMap(_.headOption)
          sorted.foreach { e =>
            val us = micros(e.ts)
            cur match {
              case Some(st) if us - st.lastUs <= gapUs =>
                cur = Some(st.copy(lastUs = us, n = st.n + 1, sum = st.sum + e.value))
              case Some(st) =>
                sessions += Session(userId, st.startUs, st.lastUs, st.n)
                cur = Some(SessionState(us, us, 1, e.value))
              case None =>
                cur = Some(SessionState(us, us, 1, e.value))
            }
          }
          cur.foreach(st => sessions += Session(userId, st.startUs, st.lastUs, st.n))
          state.update(Nil)
          sessions.iterator
      }
  }
}
