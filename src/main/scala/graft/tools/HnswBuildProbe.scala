package graft.tools

import graft.core.GraftSession
import graft.ops.{Hnsw, Metric}

/** Build-throughput diagnostic for one HNSW shard at the BENCH_SCALE mid
  * operating point (1M/32 shards = 31,250 rows, 384d intrinsic-48,
  * m=16, efC=200): wall time + a sampling profile of the builder thread
  * so the optimization target is measured, not guessed (r11 task 4 —
  * the 404 s mid build had no recorded profile).
  */
object HnswBuildProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 31250
    val m = if (args.length > 1) args(1).toInt else 16
    val efC = if (args.length > 2) args(2).toInt else 200
    val spark = GraftSession.local(8)
    val rows = SyntheticVectors.lowRankFast(spark, n, 384, intrinsic = 48)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    println(s"corpus: ${rows.length} rows x 384d (intrinsic 48), m=$m efC=$efC")

    val hist = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var sampling = true
    val builder = new Thread(() => {
      val t0 = System.nanoTime()
      val g = Hnsw.probeBuild(rows, m, efC, seed = 42L, Metric.Dot)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"build: $dt%.1f s  (${rows.length / dt}%.0f inserts/s)  n=${g.size}")
    }, "hnsw-builder")
    val sampler = new Thread(() => {
      while (sampling) {
        val st = builder.getStackTrace
        // innermost graft frame = where the time is
        val frame = st.find(f => f.getClassName.startsWith("graft"))
          .map(f => s"${f.getClassName.split('.').last}.${f.getMethodName}")
          .getOrElse(if (st.isEmpty) "<done>" else st.head.getMethodName)
        hist.merge(frame, 1, (a, b) => a + b)
        Thread.sleep(1)
      }
    }, "sampler")
    builder.start(); sampler.setDaemon(true); sampler.start()
    builder.join(); sampling = false
    val total = hist.values.stream.mapToInt(_.intValue).sum.toDouble
    import scala.jdk.CollectionConverters._
    hist.asScala.toSeq.sortBy(-_._2).take(18).foreach { case (f, c) =>
      println(f"${c / total * 100}%5.1f%%  $f")
    }
    spark.stop()
  }
}
