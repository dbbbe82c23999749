package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{GraftSession, Tables}
import graft.ops.AsofJoin
import graft.streaming.{AsofStream, EventStream}

/** Streaming as-of enrichment vs the batch twin: exact equality under
  * cross-batch arrival reordering (the event-time-correctness claim), and
  * the events-table adapter against the batch operator.
  */
class AsofStreamSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = GraftSession.local(4)

  test("stream == batch under out-of-order arrival within the watermark") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext

    // (key, ts_micros, is_probe, seq, value): 6 keys, 90 s of micros-time
    val rnd = new scala.util.Random(7)
    val ticks = Seq.tabulate(600) { i =>
      (rnd.nextInt(6).toLong, rnd.nextInt(90000000).toLong,
        rnd.nextBoolean(), i.toLong, rnd.nextDouble())
    }
    // three contiguous 30 s chunks, each internally shuffled — disorder
    // stays within the 1 min watermark, so no row is late
    val chunks = ticks.groupBy(_._2 / 30000000L).toSeq.sortBy(_._1)
      .map(c => rnd.shuffle(c._2))
    val sentinel = (99L, 10000000000L, false, 9999L, 0.0)

    val ms = MemoryStream[(Long, Long, Boolean, Long, Double)]
    val out = AsofStream.asof(
      ms.toDF.toDF("key", "ts_micros", "is_probe", "seq", "value"),
      delay = "1 minute")
    val q = out.toDF.writeStream.format("memory")
      .queryName("asof_stream_test").outputMode("append").start()
    chunks.foreach { c => ms.addData(c); q.processAllAvailable() }
    // two sentinel batches: the watermark computed at a batch's end only
    // takes effect in the NEXT batch
    ms.addData(Seq(sentinel)); q.processAllAvailable()
    ms.addData(Seq(sentinel.copy(_4 = 10000L))); q.processAllAvailable()
    q.stop()

    val got = s.table("asof_stream_test").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet

    val probes = ticks.filter(_._3).map(t => (t._1, t._2, t._4))
      .toDF("k", "ts", "p_seq")
    val quotes = ticks.filterNot(_._3).map(t => (t._1, t._2, t._4, t._5))
      .toDF("k", "ts", "q_seq", "q_value")
    val want = AsofJoin.asofLeft(probes, quotes, "k", "ts", quoteSeq = "q_seq")
      .collect().map(r => (r.getLong(0), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet

    assert(got == want,
      s"stream != batch: missing=${(want diff got).take(3)} extra=${(got diff want).take(3)}")
  }

  test("events adapter: streamed matches agree with the batch operator") {
    val events = Tables.events(spark, dir)
    val got = EventStream.runToMemory(
      AsofStream.purchasesVsViews(EventStream.readEvents(spark, dir)).toDF(),
      "asof_events_test", "append")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet

    val tsUs = graft.core.EventTime.micros(events)
    val probes = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("k"), tsUs.as("ts"),
        col("event_id").as("p_seq"))
    val quotes = events.filter(col("event_type") === "view")
      .select(col("user_id").as("k"), tsUs.as("ts"),
        col("event_id").as("q_seq"), col("value").as("q_value"))
    val want = AsofJoin.asofLeft(probes, quotes, "k", "ts", quoteSeq = "q_seq")
      .collect().map(r => (r.getLong(0), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet

    // probes inside the final 2 h watermark horizon never flush (no
    // sentinel advances the watermark past the last event)
    val maxTs = events.agg(max(graft.core.EventTime.micros(events))).head().getLong(0)
    val tail = probes.filter(col("ts") >= maxTs - 2L * 3600 * 1000000).count()
    assert(got.subsetOf(want),
      s"stream emitted non-batch matches: ${(got diff want).take(3)}")
    assert(got.size >= want.size - tail,
      s"stream lost finalized matches: ${got.size} vs ${want.size} (tail=$tail)")
  }
}
