package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession
import graft.streaming.{AsofStream, Sessionize}

/** State-boundedness gates for the streaming twins at volume: 1M events
  * through AsofStream and Sessionize. The claim both operators make —
  * state is horizon-pruned per key and idle keys expire — has to show up
  * in `stateOperators.numRowsTotal`: the peak tracks ACTIVE KEYS, never
  * total events, and once the watermark leaves the traffic behind the
  * rows drain to ~nothing. An unbounded-buffer bug (pruning broken,
  * timeout never armed) fails the peak gate; a key-leak bug (idle state
  * never removed) fails the drain gate.
  */
class StreamStateScaleSpec extends AnyFunSuite {

  private val nEvents = 1000000
  private val nKeys = 1000

  lazy val spark: SparkSession = GraftSession.local(8)

  /** Max state rows across the streaming progress log. */
  private def peakStateRows(q: StreamingQuery): Long =
    q.recentProgress.flatMap(_.stateOperators.map(_.numRowsTotal)).max

  private def lastStateRows(q: StreamingQuery): Long =
    q.recentProgress.reverseIterator
      .flatMap(_.stateOperators.headOption.map(_.numRowsTotal))
      .nextOption().getOrElse(-1L)

  test("asof stream: 1M events, state rows track keys and drain on idle") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    // key = i mod nKeys; one event per key per 6 s round, every 5th a
    // probe — 1000 rounds ≈ 100 minutes of event time, watermark 1 minute
    def tick(i: Int) = (
      (i % nKeys).toLong,                      // key
      (i / nKeys).toLong * 6000000L,           // ts_micros, 6 s rounds
      i % 5 == 0,                              // is_probe
      i.toLong,                                // seq
      1.0)                                     // value
    val ms = MemoryStream[(Long, Long, Boolean, Long, Double)]
    val out = AsofStream.asof(
      ms.toDF.toDF("key", "ts_micros", "is_probe", "seq", "value"),
      delay = "1 minute", retentionHours = 1)
    val q = out.toDF.writeStream.format("memory")
      .queryName("asof_state_scale").outputMode("append").start()
    val batches = 10
    val per = nEvents / batches
    (0 until batches).foreach { b =>
      ms.addData((b * per) until ((b + 1) * per) map tick)
      q.processAllAvailable()
    }
    val peak = peakStateRows(q)
    // far-future sentinel pushes the watermark past every key's
    // retention timeout; two batches because a batch's watermark takes
    // effect in the next one
    val sentinel = (nKeys + 1L, 100L * 3600L * 1000000L, false, -1L, 0.0)
    ms.addData(Seq(sentinel)); q.processAllAvailable()
    ms.addData(Seq(sentinel.copy(_4 = -2L))); q.processAllAvailable()
    val drained = lastStateRows(q)
    val matched = s.table("asof_state_scale").count()
    q.stop()
    // every probe below the final watermark got matched exactly once
    assert(matched > nEvents / 5 * 9 / 10, s"only $matched matches emitted")
    // state rows are per-key entries: the peak must track the key count
    // (small slack for the sentinel key), never the 1M events buffered
    assert(peak <= nKeys + 8,
      s"peak state $peak rows for $nKeys keys — state grows with events?")
    assert(drained <= 8,
      s"$drained state rows after retention passed — idle keys leak")
  }

  test("sessionize stream: 1M events, one open session per key, drains on idle") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    // ts here is the events-table long-nanos shape (EventTime dispatches);
    // every 100th round jumps the key past the 5-minute gap so sessions
    // actually close mid-stream rather than only at the timeout
    def ev(i: Int) = (
      (i % nKeys).toLong,
      ((i / nKeys).toLong * 6000000L +
        (i / nKeys / 100L) * 600000000L) * 1000L, // +10 min jump per 100 rounds
      1.0)
    val ms = MemoryStream[(Long, Long, Double)]
    val out = Sessionize.stream(
      ms.toDF.toDF("user_id", "ts", "value"), gapMinutes = 5)
    val q = out.toDF.writeStream.format("memory")
      .queryName("sess_state_scale").outputMode("append").start()
    val batches = 10
    val per = nEvents / batches
    (0 until batches).foreach { b =>
      ms.addData((b * per) until ((b + 1) * per) map ev)
      q.processAllAvailable()
    }
    val peak = peakStateRows(q)
    // sentinel far past every open session's gap + the 2 h watermark
    val sentinel = (nKeys + 1L, 1000L * 3600L * 1000000000L, 0.0)
    ms.addData(Seq(sentinel)); q.processAllAvailable()
    ms.addData(Seq(sentinel.copy(_2 = sentinel._2 + 1000L))); q.processAllAvailable()
    val drained = lastStateRows(q)
    val sessions = s.table("sess_state_scale").count()
    q.stop()
    // 10 gap jumps per key close 10 mid-stream sessions each, plus the
    // timeout-closed tail
    assert(sessions >= nKeys * 9, s"only $sessions sessions for $nKeys keys")
    assert(peak <= nKeys + 8,
      s"peak state $peak rows for $nKeys keys — open sessions leak")
    assert(drained <= 8,
      s"$drained state rows after the gap+watermark passed — keys leak")
  }
}
