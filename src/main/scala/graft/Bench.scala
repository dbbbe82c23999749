package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, size => asize}

import graft.core.Tables
import graft.ops.LatencyStats

/** Benchmark harness mirroring the reference's discipline
  * (`/root/reference/apps/nvdb_bench.cpp:317-322` warmup; repeated measured
  * runs per `Performance.md:406`): one warmup action per query (JIT +
  * codegen + shuffle-file warm), then `runs` timed actions; the per-run
  * samples feed avg/p50/p95/p99/QPS (`compute_lat_stats`,
  * `apps/nvdb_ivf_eval.cpp:144-168`) and the headline value is the median.
  *
  * The timed action is a noop-format write — `count()` would let Catalyst
  * prune projections and eliminate sorts, under-timing every projection
  * query; the noop sink materializes every output row.
  *
  * Output: ONE COMPACT machine JSON line on stdout (run is forked with
  * StdoutOutput so sbt can't prefix it), printed after `spark.stop()` so it
  * is the last line the program emits. The driver only captures the final
  * ~2000 bytes of output, so the machine line carries just the total and
  * per-query medians; the full per-query stats (avg/p50/p95/p99/QPS,
  * bytes/query) live in BENCH_LOCAL.json.
  */
object Bench {

  @volatile private var calSink = 0.0

  /** One dependent-chain FMA block in a METHOD (C2-compiled after a few
    * calls — never OSR, see the HalfDecodeProbe methodology note).
    */
  private def calChunk(seed: Double): Double = {
    var x = seed
    var i = 0
    while (i < 100000) { x = x * 1.0000000001 + 1e-12; i += 1 }
    x
  }

  /** Fixed all-core CPU work, timed — the box-speed calibration channel.
    * Two same-code sweeps 15 min apart read 26.9 vs 30.0 s totals
    * (r13, idle box, zero steal): the inflation is a uniform
    * multiplicative box factor (consistent with host-side thermal /
    * frequency state), not a code property. Timing identical work at
    * sweep start and end puts that factor IN the artifact, so
    * cross-round query ratios can be read against the calibration ratio
    * before anything is called a regression.
    */
  private def calibrate(threads: Int): Double = {
    val warm = new Thread(() => { calSink += calChunk(1.0) })
    warm.start(); warm.join()
    var w = 0
    while (w < 30) { calSink += calChunk(w.toDouble); w += 1 } // JIT warm
    val t0 = System.nanoTime()
    val ts = (0 until threads).map { t =>
      val th = new Thread(() => {
        var x = 1.0 + t
        var c = 0
        while (c < 600) { x = calChunk(x); c += 1 }
        calSink += x
      })
      th.start(); th
    }
    ts.foreach(_.join())
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // ≥5 runs: a sample of 2-3 lets one JIT/GC outlier shift the median
    // (r2's q1 read 3.1 s p50 from a 15 s outlier run).
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "5").toInt
    val spark = graft.core.GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-bench"),
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timeOne(fn: () => Unit): Double = {
      val t0 = System.nanoTime()
      fn()
      (System.nanoTime() - t0) / 1e9
    }

    // Two GCs with a drain window between: the first enqueues the dead
    // broadcast/shuffle weak refs of the runs just finished, Spark's
    // ContextCleaner then performs its ASYNC deletions inside the sleep
    // instead of inside the next query's timed runs (r5: e4 read a
    // 10.6 s p99 from exactly this — cleaner work for the d-family's
    // shuffles landing mid-sample), and the second GC reclaims what the
    // cleaner released. Dead time between queries only — never timed.
    def settle(): Unit = {
      System.gc()
      Thread.sleep(400)
      System.gc()
    }

    // dev aid: SPARK_GRAFT_BENCH_ONLY=v6_dot_l2_recall,d2_minhash
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val cal0 = calibrate(cpus.toInt)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val results = selected.map { case (name, q) =>
      val samples =
        try {
          val action = () => q(spark, sfDir).write
            .format("noop").mode("overwrite").save()
          action() // warmup: codegen, JIT, broadcast build
          settle() // heap + cleaner quiet before timing starts
          val first = timeOne(action)
          // sub-second queries are scheduler/GC-noise-dominated: 5-run
          // medians swung ±1.5× round-over-round on untouched code (r4
          // verdict). Widen their sample so the median settles; the extra
          // runs cost little exactly because the queries are fast.
          val n = if (first < 1.0) math.max(runs, 9) else runs
          first +: Seq.fill(n - 1)(timeOne(action))
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          Seq.empty[Double]
        }
      // between queries (outside any timed region): without this, heap
      // pressure and deferred cleaner work build up until a stall lands
      // inside some later query's timed run (measured: a 230 s q1 sample
      // in a 37-query sweep, a 10.6 s e4 p99 in the 56-query r5 sweep)
      settle()
      (name, samples)
    }

    // A5: dataset geometry → bytes/query for the flat-scan family.
    val (nVec, dim) =
      try {
        val e = Tables.embeddings(spark, sfDir)
        (e.count(), e.select(asize(col("embedding"))).head().getInt(0))
      } catch { case _: Throwable => (0L, 0) }
    val scanBytes = LatencyStats.scanBytesPerQuery(nVec, dim)

    def j(d: Double): String =
      if (d.isNaN || d.isInfinite) "null" else f"$d%.6f"
    def j4(d: Double): String =
      if (d.isNaN || d.isInfinite) "null" else f"$d%.4f"
    val medians = results.map { case (name, s) =>
      name -> (if (s.isEmpty) -1.0 else s.sorted.apply(s.length / 2))
    }
    val qs = medians.map { case (k, v) => s""""$k":${j4(v)}""" }.mkString("{", ",", "}")
    val stats = results.collect { case (name, s) if s.nonEmpty =>
      val st = LatencyStats.ofLatencies(s)
      val bw = name match {
        case "v1_knn_dot" | "v2_knn_l2" if st.avg > 0 && scanBytes > 0 =>
          s""","bytes_per_query":$scanBytes,"gb_per_sec":${j(scanBytes / st.avg / 1e9)}"""
        case _ => ""
      }
      // run-to-run variance belongs in the artifact: a median alone cannot
      // distinguish a real regression from scheduler/JIT noise (the r7
      // p/q-family read 2-3.7× with zero code changes — settling that
      // required exactly these numbers)
      val sd = math.sqrt(s.map(x => (x - st.avg) * (x - st.avg)).sum / s.length)
      val spread =
        s""","min":${j(s.min)},"max":${j(s.max)},"sd":${j(sd)},"n":${s.length}"""
      s""""$name":{"avg":${j(st.avg)},"p50":${j(st.p50)},"p95":${j(st.p95)},"p99":${j(st.p99)},"qps":${j(st.qps)}$spread$bw}"""
    }.mkString("{", ",", "}")
    val cal1 = calibrate(cpus.toInt)
    val total = medians.map(_._2).filter(_ >= 0).sum
    // Compact machine line: total + per-query medians (+ the two-point
    // box calibration). Must stay well under the driver's ~2000-byte tail
    // window (with sbt's trailing "[success]" line inside the same window).
    val calJ = s""""calib":[${j4(cal0)},${j4(cal1)}]"""
    val machineLine =
      s"""{"metric":"total","value":${j4(total)},"unit":"sec",$calJ,"queries":$qs,"sf":"$sfDir"}"""
    val fullLine =
      s"""{"metric":"total","value":${j(total)},"unit":"sec",$calJ,"queries":$qs,"stats":$stats,"n_vectors":$nVec,"dim":$dim,"sf":"$sfDir"}"""
    // subset runs are a dev aid — never let them clobber the full artifact
    if (only.isEmpty)
      try java.nio.file.Files.writeString(
        java.nio.file.Paths.get("BENCH_LOCAL.json"), fullLine + "\n")
      catch { case _: Throwable => () }
    spark.stop() // stop BEFORE printing so no Spark shutdown output trails the line
    println(machineLine)
    System.out.flush()
  }
}
