package graft

import org.apache.spark.sql.SparkSession

/** Benchmark harness mirroring the reference's discipline
  * (`/root/reference/apps/nvdb_bench.cpp:317-322` warmup; repeated measured
  * runs per `Performance.md:406`): one warmup action per query (JIT +
  * codegen + shuffle-file warm), then `runs` timed actions, report the
  * median. Output: one JSON line the driver records as BENCH_r{N}.json.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timeOne(fn: () => Unit): Double = {
      val t0 = System.nanoTime()
      fn()
      (System.nanoTime() - t0) / 1e9
    }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, q) =>
      val secs =
        try {
          val action = () => { q(spark, sfDir).count(); () }
          action() // warmup: codegen, JIT, broadcast build
          val times = Seq.fill(runs)(timeOne(action)).sorted
          times(times.length / 2) // median
        } catch { case _: Throwable => -1.0 }
      name -> secs
    }
    val qs = results.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
