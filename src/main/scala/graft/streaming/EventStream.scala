package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Structured Streaming operators (SURVEY.md §2.10).
  *
  * The reference has no streaming — its crawl rounds are iterative batch —
  * but the engine keeps the frontier drain `foreachBatch`-shaped so the same
  * round logic can run under `Trigger.AvailableNow`. This module adds the
  * streaming operators a training-data pipeline needs over an event/page
  * firehose: watermarked tumbling-window aggregation and stateful
  * sessionization (mapGroupsWithState).
  */
object EventStream {

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class SessionState(nEvents: Long, sumValue: Double, startMs: Long, lastMs: Long)
  final case class SessionOut(user_id: Long, n_events: Long, sum_value: Double,
      duration_ms: Long)

  /** File-source stream over an events parquet dir (testdata events schema).
    * Watermarks require TIMESTAMP (with local tz); the testdata stores
    * TIMESTAMP_NTZ, so cast.
    */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(dir).schema
    spark.readStream.schema(schema).parquet(dir)
      .withColumn("ts", col("ts").cast("timestamp"))
  }

  /** Watermarked hourly tumbling-window aggregation (the streaming form of
    * the batch s1_windowed_agg query).
    */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
      .select(col("window.start").as("hour"), col("event_type"), col("n"), col("sum_value"))

  /** Stateful per-user sessionization with a 30-minute inactivity gap —
    * KeyValueGroupedDataset.flatMapGroupsWithState with event-time timeout.
    */
  def sessionize(spark: SparkSession, events: Dataset[Event],
      gapMs: Long = 30 * 60 * 1000L): Dataset[SessionOut] = {
    import spark.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(userId, s.nEvents, s.sumValue, s.lastMs - s.startMs))
          } else {
            val events = batch.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            events.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastMs <= gapMs =>
                  cur = Some(SessionState(s.nEvents + 1, s.sumValue + e.value, s.startMs, t))
                case Some(s) =>
                  closed ::= SessionOut(userId, s.nEvents, s.sumValue, s.lastMs - s.startMs)
                  cur = Some(SessionState(1, e.value, t, t))
                case None =>
                  cur = Some(SessionState(1, e.value, t, t))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastMs + gapMs)
            }
            closed.reverseIterator
          }
      }
  }

  /** Run a streaming query to completion over static input
    * (Trigger.AvailableNow + memory sink) — the smoke-test harness shape.
    *
    * Teardown matters: with Spark's auto-created TEMP checkpoint the location
    * is deleted on query stop, but the JVM-global StateStore maintenance
    * thread can fire afterwards against the deleted dir and dump a stack
    * trace into stdout/stderr (it polluted the round-1 bench output). Use an
    * explicit checkpoint dir that outlives the query, and stop() explicitly.
    */
  private def runWith(df: DataFrame, name: String, mode: OutputMode): DataFrame = {
    val ckpt = graft.util.TempDirs.create(s"graft-ckpt-$name-")
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .option("checkpointLocation", ckpt.toString)
      .outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q.stop()
    df.sparkSession.table(name)
  }

  def runToMemory(df: DataFrame, name: String): DataFrame =
    runWith(df, name, OutputMode.Append)

  /** Complete-mode variant for aggregations that need it. */
  def runAggToMemory(df: DataFrame, name: String): DataFrame =
    runWith(df, name, OutputMode.Complete)
}
