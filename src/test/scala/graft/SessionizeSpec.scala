package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{GraftSession, Tables}
import graft.ops.Percentiles
import graft.streaming.{EventStream, Sessionize}

/** Gap-sessionization (stream vs batch twin) and sort-based exact
  * percentiles vs the buffering built-in.
  */
class SessionizeSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = GraftSession.local(4)

  test("batch sessionization: sessions partition each user's events") {
    val events = Tables.events(spark, dir)
    val sessions = Sessionize.batch(events, gapMinutes = 120).cache()
    val perUser = sessions.groupBy("user_id")
      .agg(sum("n_events").as("n"), count(lit(1)).as("n_sessions"))
    val truth = events.groupBy("user_id").agg(count(lit(1)).as("n_true"))
    // every event lands in exactly one session
    assert(perUser.join(truth, "user_id")
      .filter(col("n") =!= col("n_true")).count() == 0)
    // sessions within a user never overlap and respect the gap
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("start_micros")
    val bad = sessions
      .withColumn("prev_end", lag(col("end_micros"), 1).over(w))
      .filter(col("prev_end").isNotNull &&
        col("start_micros") - col("prev_end") <= 120L * 60 * 1000000)
      .count()
    assert(bad == 0, s"$bad sessions violate the gap")
    sessions.unpersist()
  }

  test("streaming sessionization agrees with the batch twin") {
    val sessions = Sessionize.stream(
      EventStream.readEvents(spark, dir), gapMinutes = 120)
    val got = EventStream.runToMemory(sessions.toDF(), "sessions_test", "append")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val batch = Sessionize.batch(Tables.events(spark, dir), gapMinutes = 120)
      .select("user_id", "start_micros", "end_micros", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // stream emits sessions closed by a later event (and possibly, after a
    // watermark-advance cleanup batch, the final open ones): always a
    // subset of batch, missing at most one open session per user
    assert(got.subsetOf(batch), s"stream emitted non-batch sessions: ${got.diff(batch).take(3)}")
    val nUsers = batch.map(_._1).size
    assert(got.size >= batch.size - nUsers,
      s"stream lost closed sessions: ${got.size} vs batch ${batch.size}")
  }

  test("sort-based exact percentiles match the buffering built-in") {
    val events = Tables.events(spark, dir)
    val a = Percentiles.sortBased(events, "event_type", "value", Seq(0.5, 0.95, 0.99))
      .orderBy("event_type").collect()
    val b = Percentiles.builtin(events, "event_type", "value", Seq(0.5, 0.95, 0.99))
      .orderBy("event_type").collect()
    assert(a.length == b.length && a.nonEmpty)
    a.zip(b).foreach { case (x, y) =>
      assert(x.getString(0) == y.getString(0))
      for (i <- 1 to 3)
        assert(math.abs(x.getDouble(i) - y.getDouble(i)) < 1e-9,
          s"${x.getString(0)} p$i: ${x.getDouble(i)} vs ${y.getDouble(i)}")
    }
  }
}
