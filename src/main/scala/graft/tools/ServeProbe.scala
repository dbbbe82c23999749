package graft.tools

import graft.core.GraftSession
import graft.ops.{Hnsw, Metric}

/** A/B probe for the HNSW serve-walk bookkeeping work (r14): builds ONE
  * single-shard graph, then measures per-query latency of the SAME graph
  * with and without the layer-0 CSR adjacency (freeze()'s flat-array
  * snapshot vs the ragged links path), interleaved A/B/A so box drift
  * can't masquerade as a code effect. Results are bit-identical by
  * construction (same neighbor values in the same order), asserted here
  * on every measured query.
  *
  * Usage: runMain graft.tools.ServeProbe [n] [m] [efC] [efSearch]
  */
object ServeProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 200000
    val m = if (args.length > 1) args(1).toInt else 16
    val efC = if (args.length > 2) args(2).toInt else 100
    val ef = if (args.length > 3) args(3).toInt else 64
    val k = 10
    val spark = GraftSession.local(8)
    spark.sparkContext.setLogLevel("WARN")
    val rows = SyntheticVectors.lowRankFast(spark, n, 384, intrinsic = 48)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    println(s"corpus: ${rows.length} x 384d, m=$m efC=$efC ef=$ef")
    val t0 = System.nanoTime()
    val g = Hnsw.probeBuild(rows, m, efC, seed = 42L, Metric.Dot)
    println(f"build: ${(System.nanoTime() - t0) / 1e9}%.1f s")

    val qs = SyntheticVectors.lowRankFast(spark, 256, 384, intrinsic = 48,
      seed = 7L).collect().map(_.getSeq[Float](1).toArray)

    def measure(label: String, facc: Boolean = false): Double = {
      qs.take(32).foreach(g.search(_, k, ef, facc)) // JIT + cache warm
      val lat = qs.map { q =>
        val t = System.nanoTime()
        g.search(q, k, ef, facc)
        (System.nanoTime() - t) / 1e3
      }
      java.util.Arrays.sort(lat)
      val p50 = lat(lat.length / 2)
      println(f"$label%-12s p50=${p50}%8.1f us  p95=${lat((lat.length * 0.95).toInt)}%8.1f us  avg=${lat.sum / lat.length}%8.1f us")
      p50
    }

    // equality gate first: CSR and ragged walks must return identical rows
    val withCsr = qs.take(64).map(g.search(_, k, ef).toSeq)
    g.dropCsr()
    val without = qs.take(64).map(g.search(_, k, ef).toSeq)
    require(withCsr.sameElements(without), "CSR walk diverged from ragged walk")
    println("equality: CSR == ragged on 64 queries")

    g.freeze() // restore CSR
    // sweep the touch-ahead depth (0 = gather-only), interleaved with the
    // ragged baseline; repeat the ladder so drift shows as disagreement
    for (pass <- 1 to 2) {
      g.dropCsr()
      measure(s"ragged#$pass")
      g.freeze()
      for (tl <- Seq(0, 4, 8, 24)) {
        Hnsw.touchLines = tl
        measure(s"touch=$tl#$pass")
      }
      Hnsw.touchLines = 8
      measure(s"facc+t8#$pass", facc = true)
      Hnsw.touchLines = 0
      measure(s"facc+t0#$pass", facc = true)
    }
    Hnsw.touchLines = 24

    // i8-quantized serve flavor: beam over the int8 sidecar, exact
    // re-rank of the ef survivors; overlap vs the contract path rides
    // beside the latency
    val tQ = System.nanoTime()
    g.quantizeStore()
    println(f"quantizeStore: ${(System.nanoTime() - tQ) / 1e9}%.2f s")
    var ovl = 0L
    qs.foreach { q =>
      val got = g.searchI8(q, k, ef).map(_._1).toSet
      val want = g.search(q, k, ef).map(_._1).toSet
      ovl += got.intersect(want).size
    }
    println(f"i8 overlap vs contract: ${ovl.toDouble / (qs.length * k)}%.4f")

    // ef frontier vs TRUE ground truth, both walks. NOT overlap-vs-
    // contract: a wide quantized beam + exact re-rank finds true
    // neighbors the ef=64 contract walk itself MISSES, so overlap
    // against that fallible reference FALLS as quality rises (measured:
    // 0.956 @ efq=64 → 0.76 @ efq=128 while GT recall climbed). The
    // honest axis is recall-at-k against the exact scan, p50 beside it —
    // the flavor is worth shipping only if its curve sits left of the
    // contract curve at matched recall.
    val qWithId = SyntheticVectors.lowRankFast(spark, 256, 384,
      intrinsic = 48, seed = 7L).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    val gtMap = graft.ops.Search.groundTruth(
        SyntheticVectors.lowRankFast(spark, n, 384, intrinsic = 48),
        SyntheticVectors.lowRankFast(spark, 256, 384, intrinsic = 48,
          seed = 7L)
          .withColumnRenamed("id", "qid").withColumnRenamed("vec", "qvec"),
        k, Metric.Dot)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    for (efq <- Seq(32, 48, 64, 96, 128)) {
      def sweep(label: String, fn: Array[Float] => Array[(Long, Double)]): Unit = {
        var hits = 0L
        qWithId.foreach { case (qid, q) =>
          hits += fn(q).map(_._1).toSet.intersect(gtMap(qid)).size
        }
        qWithId.take(32).foreach { case (_, q) => fn(q) }
        val lat = qWithId.map { case (_, q) =>
          val t = System.nanoTime()
          fn(q)
          (System.nanoTime() - t) / 1e3
        }
        java.util.Arrays.sort(lat)
        println(f"$label ef=$efq%-4d recall=${hits.toDouble / (qWithId.length * k)}%.4f" +
          f"  p50=${lat(lat.length / 2)}%8.1f us  p95=${lat((lat.length * 0.95).toInt)}%8.1f us")
      }
      sweep("contract", g.search(_, k, efq))
      sweep("i8      ", g.searchI8(_, k, efq))
    }

    for (pass <- 1 to 2) {
      qs.take(32).foreach(g.searchI8(_, k, ef))
      val lat = qs.map { q =>
        val t = System.nanoTime()
        g.searchI8(q, k, ef)
        (System.nanoTime() - t) / 1e3
      }
      java.util.Arrays.sort(lat)
      println(f"i8#$pass%-8s p50=${lat(lat.length / 2)}%8.1f us  p95=${lat((lat.length * 0.95).toInt)}%8.1f us  avg=${lat.sum / lat.length}%8.1f us")
      measure(s"contract#$pass")
    }

    // evals/query: the kernel-work axis
    val e0 = g.evals
    qs.foreach(g.search(_, k, ef))
    println(f"evals/query: ${(g.evals - e0).toDouble / qs.length}%.0f")

    // attribution: sample the serve thread's innermost frame at ~1 kHz
    // over a sustained serve loop (the HnswBuildProbe methodology)
    val hist = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var sampling = true
    val server = new Thread(() => {
      var r = 0
      while (sampling) {
        qs.foreach(g.search(_, k, ef))
        r += 1
      }
    }, "serve-loop")
    val sampler = new Thread(() => {
      while (sampling) {
        val st = server.getStackTrace
        val frame = st.find(f => f.getClassName.startsWith("graft") ||
            f.getClassName.startsWith("jdk.incubator"))
          .map(f => s"${f.getClassName.split('.').last}.${f.getMethodName}")
          .getOrElse(if (st.isEmpty) "<done>" else st.head.getMethodName)
        hist.merge(frame, 1, (a, b) => a + b)
        Thread.sleep(1)
      }
    }, "sampler")
    server.start(); sampler.start()
    Thread.sleep(8000)
    sampling = false
    server.join(); sampler.join()
    val total = hist.values.stream.mapToInt(_.intValue).sum.toDouble
    println("-- serve-walk frame histogram --")
    hist.entrySet.stream
      .sorted((x, y) => y.getValue - x.getValue)
      .limit(15)
      .forEach(e => println(f"  ${e.getValue / total * 100}%5.1f%%  ${e.getKey}"))
    spark.stop()
  }
}
