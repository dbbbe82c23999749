package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession
import graft.ops.LatencyStats

/** A2 latency stats: the local percentile must use the reference's linear
  * interpolation (`/root/reference/apps/nvdb_ivf_eval.cpp:144-168`) and
  * agree with Spark's exact `percentile` (same formula) on the same data.
  */
class LatencyStatsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)

  test("percentileInterp matches the reference formula on known samples") {
    val s = Vector(1.0, 2.0, 3.0, 4.0)
    // idx = p*(n-1): p50 -> 1.5 -> 2.5; p95 -> 2.85 -> 3.85
    assert(LatencyStats.percentileInterp(s, 0.5) == 2.5)
    assert(math.abs(LatencyStats.percentileInterp(s, 0.95) - 3.85) < 1e-12)
    assert(LatencyStats.percentileInterp(s, 0.0) == 1.0)
    assert(LatencyStats.percentileInterp(s, 1.0) == 4.0)
    assert(LatencyStats.percentileInterp(Vector(7.0), 0.99) == 7.0)
  }

  test("local stats agree with the distributed column flavor") {
    val samples = Seq(0.012, 0.015, 0.011, 0.031, 0.017, 0.013, 0.044, 0.012)
    val local = LatencyStats.ofLatencies(samples)
    val s = spark
    import s.implicits._
    val row = LatencyStats.ofColumn(samples.toDF("lat"), "lat").collect()(0)
    assert(math.abs(local.avg - row.getDouble(0)) < 1e-12)
    assert(math.abs(local.p50 - row.getDouble(1)) < 1e-12)
    assert(math.abs(local.p95 - row.getDouble(2)) < 1e-12)
    assert(math.abs(local.p99 - row.getDouble(3)) < 1e-12)
    assert(math.abs(local.qps - row.getDouble(4)) < 1e-9)
    assert(local.n == 8 && row.getLong(5) == 8L)
  }

  test("scan bytes per query") {
    assert(LatencyStats.scanBytesPerQuery(2000, 64) == 2000L * 64 * 4)
  }
}
