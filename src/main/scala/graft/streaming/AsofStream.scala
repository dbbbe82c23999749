package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming point-in-time (as-of) enrichment — the stream twin of
  * `ops/AsofJoin.asofLeft`: each probe is matched to the latest quote at or
  * before its event time, per key. Additive streaming surface (SURVEY
  * §2.9; the reference has none).
  *
  * Correctness model: a probe is NOT matched when it arrives — it buffers
  * in state until the watermark passes its event time, at which point no
  * earlier-or-equal-time quote can still be admitted, and the match is
  * final. This makes the operator event-time-correct under arbitrary
  * arrival reordering WITHIN the watermark delay (quotes later than that
  * are the standard streaming late-data caveat). AsofStreamSpec feeds the
  * same data shuffled across micro-batches and gates equality with the
  * batch twin.
  *
  * Scale: per-key state holds only (a) probes inside the watermark horizon
  * and (b) quotes from the latest one below the watermark forward — both
  * bounded by the horizon, pruned every invocation; idle keys expire via
  * event-time timeout after `retentionHours`.
  */
object AsofStream {

  final case class Tick(key: Long, ts_micros: Long, is_probe: Boolean,
                        seq: Long, value: Double,
                        event_ts: java.sql.Timestamp)
  final case class Quote(ts: Long, seq: Long, value: Double)
  final case class Probe(ts: Long, seq: Long)
  final case class Buf(quotes: Vector[Quote], probes: Vector[Probe])
  final case class Matched(key: Long, p_seq: Long, p_ts_micros: Long,
                           q_seq: Option[Long], q_value: Option[Double])

  /** `ticks` needs columns (key long, ts_micros long, is_probe boolean,
    * seq long, value double). `delay` is the watermark (out-of-order
    * tolerance); matches emit once the watermark passes the probe.
    */
  def asof(ticks: DataFrame, delay: String = "2 hours",
           retentionHours: Int = 24): Dataset[Matched] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .withColumn("event_ts", timestamp_micros(col("ts_micros")))
      .withWatermark("event_ts", delay)
      .select(col("key"), col("ts_micros"), col("is_probe"), col("seq"),
        col("value").cast("double").as("value"), col("event_ts"))
      .as[Tick]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, rows: Iterator[Tick], state: GroupState[Buf]) =>
          val st = state.getOption.getOrElse(Buf(Vector.empty, Vector.empty))
          val in = rows.toVector
          val quotes = (st.quotes ++ in.filterNot(_.is_probe)
            .map(t => Quote(t.ts_micros, t.seq, t.value)))
            .sortBy(q => (q.ts, q.seq))
          val probes = (st.probes ++ in.filter(_.is_probe)
            .map(t => Probe(t.ts_micros, t.seq)))
            .sortBy(p => (p.ts, p.seq))
          val wm = state.getCurrentWatermarkMs() * 1000L
          // probes strictly below the watermark are final: any
          // still-unseen quote at or before them would itself be late
          val (ready, pending) = probes.partition(_.ts < wm)
          val out = ready.map { p =>
            // latest quote with ts <= probe ts; sorted asc, ties end with
            // max seq — the batch twin's dedupe rule
            val i = quotes.lastIndexWhere(q => q.ts <= p.ts)
            if (i < 0) Matched(key, p.seq, p.ts, None, None)
            else Matched(key, p.seq, p.ts,
              Some(quotes(i).seq), Some(quotes(i).value))
          }
          // future probes have ts >= wm: only the latest quote below the
          // watermark (and everything after it) can still match
          val cut = quotes.lastIndexWhere(_.ts < wm)
          val keptQuotes = if (cut > 0) quotes.drop(cut) else quotes
          // a RETENTION timeout (only ever armed when no probes were
          // pending — see the getOrElse below) firing on an idle key IS
          // the expiry: drop the quote buffer too. Quotes alone are never
          // empty once a key has seen one, so keying removal off buffer
          // emptiness would retain every key forever. A probe-wake
          // timeout (st.probes non-empty at entry) must NOT expire the
          // quotes — later probes may still need them.
          val idleExpired = state.hasTimedOut && in.isEmpty && st.probes.isEmpty
          if (idleExpired || (pending.isEmpty && keptQuotes.isEmpty)) {
            state.remove()
          } else {
            state.update(Buf(keptQuotes, pending))
            val wake = pending.headOption.map(_.ts / 1000L + 1)
              .getOrElse(wm / 1000L + retentionHours * 3600L * 1000L)
            state.setTimeoutTimestamp(math.max(wake, wm / 1000L + 1))
          }
          out.iterator
      }
  }

  /** Adapter: the events-table shape (purchases probe views) used by the
    * stream==batch gate.
    */
  def purchasesVsViews(events: DataFrame): Dataset[Matched] = {
    val ticks = events
      .filter(col("event_type").isin("purchase", "view"))
      .select(col("user_id").as("key"),
        graft.core.EventTime.micros(events).as("ts_micros"),
        (col("event_type") === "purchase").as("is_probe"),
        col("event_id").as("seq"), col("value"))
    asof(ticks)
  }
}
