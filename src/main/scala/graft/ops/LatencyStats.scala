package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Latency / throughput statistics (A2/A5) mirroring the reference's
  * `compute_lat_stats` (`/root/reference/apps/nvdb_ivf_eval.cpp:144-168`)
  * and the bench sink's bytes-per-query accounting
  * (`/root/reference/apps/nvdb_bench.cpp:369-425`).
  */
object LatencyStats {

  final case class Stats(avg: Double, p50: Double, p95: Double, p99: Double,
                         qps: Double, n: Int)

  /** Linear-interpolated percentile over a sorted sample, exactly the
    * reference's formula: idx = p*(n-1); v = s[lo]*(1-frac) + s[lo+1]*frac.
    */
  def percentileInterp(sorted: IndexedSeq[Double], p: Double): Double = {
    require(sorted.nonEmpty, "percentile of empty sample")
    val idx = p * (sorted.length - 1)
    val lo = math.floor(idx).toInt
    val hi = math.min(lo + 1, sorted.length - 1)
    val frac = idx - lo
    sorted(lo) * (1.0 - frac) + sorted(hi) * frac
  }

  /** avg / p50 / p95 / p99 / QPS over per-query latencies (seconds). */
  def ofLatencies(samples: Seq[Double]): Stats = {
    val s = samples.sorted.toIndexedSeq
    val avg = s.sum / s.length
    Stats(avg,
      percentileInterp(s, 0.50), percentileInterp(s, 0.95),
      percentileInterp(s, 0.99),
      qps = if (avg > 0) 1.0 / avg else 0.0, n = s.length)
  }

  /** Distributed flavor: same stats over a DataFrame latency column.
    * Spark's exact `percentile` uses the same linear interpolation, so the
    * two paths agree (gated in LatencyStatsSpec).
    */
  def ofColumn(df: DataFrame, latCol: String): DataFrame =
    df.agg(
      avg(col(latCol)).as("avg"),
      expr(s"percentile($latCol, array(0.5D, 0.95D, 0.99D))").as("pcts"),
      count(lit(1)).as("n"))
      .select(col("avg"),
        col("pcts").getItem(0).as("p50"),
        col("pcts").getItem(1).as("p95"),
        col("pcts").getItem(2).as("p99"),
        (lit(1.0) / col("avg")).as("qps"),
        col("n"))

  /** Bytes-per-query for a full flat scan of an N×D float table plus the
    * implied effective bandwidth (`nvdb_bench.cpp:412-424`): every query
    * streams the whole base once.
    */
  def scanBytesPerQuery(nRows: Long, dim: Int, bytesPerElem: Int = 4): Long =
    nRows * dim.toLong * bytesPerElem
}
