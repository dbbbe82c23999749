package graft.tools

import graft.functions.expressions.{PqOps, Simd}

/** Throwaway-style diagnostic for the pq4 register-shuffle kernel:
  * correctness vs the scalar twin plus a single-thread throughput point
  * (the number that decides whether `selectFrom` intrinsified to
  * vpermb/vpshufb or fell back to scalar).
  */
object Pq4Probe {
  def main(args: Array[String]): Unit = {
    println(s"pq4Available=${Simd.pq4Available}")
    val rnd = new scala.util.Random(7)
    val m4 = 96
    val spMax = m4 / 2
    val blob = Array.fill[Byte](spMax * 64)(rnd.nextInt(256).toByte)
    val tables = Array.fill[Byte](m4 * 64)(rnd.nextInt(256).toByte)
    val a = new Array[Short](64)
    val b = new Array[Short](64)
    Simd.pq4Group(blob, 0, m4, tables, a)
    PqOps.pq4GroupRef(blob, 0, m4, tables, b)
    println(s"match=${a.sameElements(b)}")
    // throughput: simulate 1M rows = 15625 groups, one query
    val groups = 15625
    val big = Array.fill[Byte](spMax * 64 * 64)(rnd.nextInt(256).toByte)
    var sink = 0L
    (0 until 3).foreach { round =>
      val t0 = System.nanoTime()
      var g = 0
      while (g < groups) {
        Simd.pq4Group(big, (g % 64) * spMax * 64, m4, tables, a)
        sink += a(0)
        g += 1
      }
      val dt = (System.nanoTime() - t0) / 1e6
      println(f"simd round $round: $dt%.1f ms for 1M rows (one query)")
    }
    (0 until 3).foreach { round =>
      val t0 = System.nanoTime()
      var g = 0
      while (g < groups) {
        PqOps.pq4GroupRef(big, (g % 64) * spMax * 64, m4, tables, a)
        sink += a(0)
        g += 1
      }
      val dt = (System.nanoTime() - t0) / 1e6
      println(f"ref  round $round: $dt%.1f ms for 1M rows (one query)")
    }
    println(s"sink=$sink")

    // `ivf` arg: stage timing of the IVF-pruned fastscan against the
    // cached 1M BenchScale corpus + index (driver LUT prep vs the Spark
    // candidate job vs the refined operating point).
    if (args.contains("ivf")) {
      import org.apache.spark.sql.functions._
      val spark = graft.core.GraftSession.local(32)
      spark.sparkContext.setLogLevel("WARN")
      val base = spark.read.parquet("target/scale_vectors_1000000_384_lr8")
      val queries = base.filter(col("id") < 16)
        .select(col("id").as("qid"), col("vec").as("qvec")).cache()
      queries.count()
      val idx = graft.ops.Pq.buildOrGetIvf4(spark, base,
        "annscale_1000000_lr8", nlist = 1024, m4 = 96, ntrain = 200000)
      val someCells = (0 until 1024 by 8).map(Int.box)
      (0 until 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = spark.read.parquet(idx.path)
          .filter(col("cluster_id").isInCollection(someCells)).count()
        println(f"raw pruned read run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s rows=$n")
      }
      val reused = spark.read.parquet(idx.path)
      (0 until 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = reused.filter(col("cluster_id").isInCollection(someCells)).count()
        println(f"reused-handle read run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s rows=$n")
      }
      (0 until 4).foreach { i =>
        val t0 = System.nanoTime()
        val n = graft.ops.Pq.searchFastScanIvf(idx, spark, queries, 8, 50)
          .count()
        println(f"cand stage run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s rows=$n")
      }
      (0 until 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = graft.ops.Pq.searchFastScanIvfRefined(base, idx, queries,
          nprobe = 8, k = 10, refineK = 50).count()
        println(f"refined run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s rows=$n")
      }
      spark.stop()
    }
  }
}
