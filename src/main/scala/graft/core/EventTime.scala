package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Canonical event-time access for the `events` table across fixture
  * revisions. The driver has shipped `ts` in two shapes:
  *
  *  - INT64 TIMESTAMP(NANOS), which Spark's reader surfaces as plain long
  *    nanoseconds under `spark.sql.legacy.parquet.nanosAsLong`;
  *  - TIMESTAMP(MICROS), which Spark reads as TIMESTAMP_NTZ.
  *
  * Every consumer (e-family queries, streaming adapters, specs) goes
  * through this one dispatch so a fixture-schema change is a no-op here
  * instead of a dozen broken `ts div 1000` call sites. Sessions run UTC
  * (GraftSession), so the NTZ wall clock IS the instant and the computed
  * epoch-micros agree exactly with DuckDB's `epoch_ns(ts) // 1000` /
  * `epoch_us(ts)` on the same file.
  */
object EventTime {

  /** Epoch-microseconds as a BIGINT column, whatever the stored shape. */
  def micros(df: DataFrame, name: String = "ts"): Column =
    df.schema(name).dataType match {
      case LongType => expr(s"cast($name div 1000 as long)") // int64 nanos
      case TimestampNTZType => unix_micros(col(name).cast(TimestampType))
      case TimestampType => unix_micros(col(name))
      case other => throw new IllegalArgumentException(
        s"unsupported event-time type for column '$name': $other")
    }

  /** TIMESTAMP event-time column (watermark-able), micros precision. */
  def eventTs(df: DataFrame, name: String = "ts"): Column =
    timestamp_micros(micros(df, name))
}
