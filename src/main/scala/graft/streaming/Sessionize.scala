package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization — the custom-state streaming op
  * (`flatMapGroupsWithState`) a training-data ingest pipeline needs for
  * user/document activity grouping. Additive surface (the reference has
  * no streaming, SURVEY §2.9).
  *
  * Scale: state is one open session per key (constant size); closed
  * sessions emit as soon as a later event proves the gap, and idle state
  * expires via event-time timeout at the watermark — no unbounded growth.
  */
object Sessionize {

  final case class Event(user_id: Long, ts_micros: Long, value: Double,
                         event_ts: java.sql.Timestamp)
  final case class Open(start: Long, last: Long, n: Long, sum: Double)
  final case class Session(user_id: Long, start_micros: Long, end_micros: Long,
                           n_events: Long, sum_value: Double)

  /** Streaming sessionize: emits a session once a subsequent event (or the
    * watermark timeout) closes it.
    */
  def stream(events: DataFrame, gapMinutes: Int): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMicros = gapMinutes * 60L * 1000000L
    events
      .withColumn("ts_micros", graft.core.EventTime.micros(events))
      .withColumn("event_ts", timestamp_micros(col("ts_micros")))
      .withWatermark("event_ts", "2 hours")
      // keep the watermarked column in the projection — dropping it would
      // strip the watermark the event-time timeout needs
      .select(col("user_id"), col("ts_micros"),
        col("value").cast("double").as("value"),
        col("event_ts"))
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[Event], state: GroupState[Open]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(uid, s.start, s.last, s.n, s.sum))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts_micros)
            val closed = scala.collection.mutable.ArrayBuffer.empty[Session]
            var open = state.getOption
            sorted.foreach { e =>
              open match {
                case Some(o) if e.ts_micros - o.last > gapMicros =>
                  closed += Session(uid, o.start, o.last, o.n, o.sum)
                  open = Some(Open(e.ts_micros, e.ts_micros, 1, e.value))
                case Some(o) =>
                  open = Some(Open(o.start, math.max(o.last, e.ts_micros),
                    o.n + 1, o.sum + e.value))
                case None =>
                  open = Some(Open(e.ts_micros, e.ts_micros, 1, e.value))
              }
            }
            open.foreach { o =>
              state.update(o)
              // expire the open session once the watermark passes its gap
              state.setTimeoutTimestamp((o.last + gapMicros) / 1000L)
            }
            closed.iterator
          }
      }
  }

  /** Batch twin: same gap rule via a lag window (for tests and backfill). */
  def batch(events: DataFrame, gapMinutes: Int): DataFrame = {
    val gapMicros = gapMinutes * 60L * 1000000L
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_micros"))
    events
      .select(col("user_id"),
        graft.core.EventTime.micros(events).as("ts_micros"),
        col("value").cast("double").as("value"))
      .withColumn("prev", lag(col("ts_micros"), 1).over(w))
      .withColumn("new_session",
        when(col("prev").isNull || col("ts_micros") - col("prev") > gapMicros, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts_micros")).as("start_micros"),
        max(col("ts_micros")).as("end_micros"),
        count(lit(1)).as("n_events"),
        sum(col("value")).as("sum_value"))
      .drop("session_id")
  }
}
