package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** Structured Streaming surface over the events table: the reference has no
  * streaming (SURVEY §2.9), so this is the additive training-pipeline
  * surface — windowed rollups with watermarked late-data handling and
  * streaming dedup, the two stateful ops an ingest pipeline needs.
  *
  * Scale notes: windowed aggregation state is bounded by the watermark
  * horizon; dedup state by the watermark too (event_id seen-set expires).
  * Both shuffle on the group key only — the same partial/final aggregation
  * as the batch rollup.
  */
object EventStream {

  /** The events schema as the driver generates it (`ts` has shipped both
    * as TIMESTAMP(NANOS)-as-long and TIMESTAMP(MICROS) — see
    * [[graft.core.EventTime]] for the dispatch).
    */
  def eventsSchema(spark: SparkSession, sfDir: String): StructType =
    spark.read.parquet(s"$sfDir/events.parquet").schema

  /** File-source stream of the events table. The streaming file source
    * requires a directory; the driver testdata is a single parquet file, so
    * stage it into a temp dir once (a real deployment points this at the
    * ingest directory and new files stream in incrementally).
    */
  def readEvents(spark: SparkSession, sfDir: String): DataFrame = {
    val schema = eventsSchema(spark, sfDir)
    val src = java.nio.file.Paths.get(s"$sfDir/events.parquet")
    val dir =
      if (java.nio.file.Files.isDirectory(src)) src
      else {
        val d = java.nio.file.Files.createTempDirectory("events_stream")
        java.nio.file.Files.copy(src, d.resolve("events.parquet"))
        d
      }
    spark.readStream.schema(schema).parquet(dir.toString)
  }

  /** 1-hour tumbling-window rollup with a 2-hour watermark. */
  def hourlyRollup(events: DataFrame): DataFrame =
    events
      .withColumn("event_ts", graft.core.EventTime.eventTs(events))
      .withWatermark("event_ts", "2 hours")
      .groupBy(window(col("event_ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Streaming exact dedup on event_id within the watermark horizon. */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withColumn("event_ts", graft.core.EventTime.eventTs(events))
      .withWatermark("event_ts", "2 hours")
      .dropDuplicates("event_id")

  /** Run a streaming DataFrame to completion against the (finite) file
    * source and return the collected result from the memory sink.
    */
  def runToMemory(df: DataFrame, name: String, outputMode: String): DataFrame = {
    val q: StreamingQuery = df.writeStream
      .format("memory").queryName(name).outputMode(outputMode).start()
    q.processAllAvailable()
    q.stop()
    df.sparkSession.table(name)
  }
}
