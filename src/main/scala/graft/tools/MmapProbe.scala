package graft.tools

import graft.core.GraftSession
import graft.ops.{Hnsw, Metric}

/** r14 spike (verdict task #6): the off-heap/mmap packed store, measured.
  *
  * Compares the three warm paths for a single-shard graph —
  * deterministic rebuild (the only option before r14), heap load from a
  * [[graft.ops.Hnsw.ShardGraph.writeStore]] file, and mmap of the same
  * file's payload — then serves the SAME query set from the heap-loaded
  * and mapped graphs interleaved A/B/A, with GC collection counts and
  * time sampled around each sustained-serve window. Results are
  * equality-asserted between flavors (the BB kernel twins are bitwise).
  *
  * Usage: runMain graft.tools.MmapProbe [n] [ef]
  * The store file caches under target/ so re-runs skip the build.
  */
object MmapProbe {
  private def gcStats(): (Long, Long) = {
    import scala.jdk.CollectionConverters._
    val beans = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala
    (beans.map(_.getCollectionCount).sum, beans.map(_.getCollectionTime).sum)
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 200000
    val ef = if (args.length > 1) args(1).toInt else 64
    val k = 10
    val store = s"target/mmap_probe_$n.graph"
    val spark = GraftSession.local(8)
    spark.sparkContext.setLogLevel("WARN")

    if (!new java.io.File(store).isFile) {
      val rows = SyntheticVectors.lowRankFast(spark, n, 384, intrinsic = 48)
        .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
        .sortBy(_._1)
      val t0 = System.nanoTime()
      val g = Hnsw.probeBuild(rows, 16, 100, seed = 42L, Metric.Dot)
      println(f"build (the pre-r14 warm path): ${(System.nanoTime() - t0) / 1e9}%.1f s")
      val t1 = System.nanoTime()
      g.writeStore(store)
      println(f"writeStore: ${(System.nanoTime() - t1) / 1e9}%.2f s  (${new java.io.File(store).length / 1e6}%.0f MB)")
    }

    val tH = System.nanoTime()
    val heap = Hnsw.readStore(store)
    println(f"readStore(heap):   ${(System.nanoTime() - tH) / 1e9}%.2f s")
    val tM = System.nanoTime()
    val mapped = Hnsw.readStore(store, mapped = true)
    println(f"readStore(mapped): ${(System.nanoTime() - tM) / 1e9}%.3f s")

    val qs = SyntheticVectors.lowRankFast(spark, 256, 384, intrinsic = 48,
      seed = 7L).collect().map(_.getSeq[Float](1).toArray)
    require(qs.take(64).forall(q =>
        heap.search(q, k, ef).toSeq == mapped.search(q, k, ef).toSeq),
      "mapped serve diverged from heap serve")
    println("equality: mapped == heap on 64 queries")

    def measure(label: String, g: graft.ops.Hnsw.ShardGraph): Double = {
      qs.take(32).foreach(g.search(_, k, ef))
      val (gc0, gt0) = gcStats()
      val t0 = System.nanoTime()
      val lat = qs.map { q =>
        val t = System.nanoTime()
        g.search(q, k, ef)
        (System.nanoTime() - t) / 1e3
      }
      // sustained window for the GC axis: ~4 s of continuous serve
      var reps = 0
      while ((System.nanoTime() - t0) < 4e9) { qs.foreach(g.search(_, k, ef)); reps += 1 }
      val (gc1, gt1) = gcStats()
      java.util.Arrays.sort(lat)
      val p50 = lat(lat.length / 2)
      println(f"$label%-8s p50=${p50}%8.1f us  p95=${lat((lat.length * 0.95).toInt)}%8.1f us" +
        f"  gc=${gc1 - gc0}%3d collections/${gt1 - gt0}%4d ms over ${reps + 1} sweeps")
      p50
    }
    for (pass <- 1 to 2) {
      measure(s"heap#$pass", heap)
      measure(s"mmap#$pass", mapped)
    }

    // v2-store axis: persist the i8 sidecar WITH the graph, restore both
    // ways, and serve the quantized flavor — warm cost becomes I/O (no
    // n·dim quantize pass) and the mapped codes stay off-heap
    val storeI8 = s"target/mmap_probe_${n}_i8.graph"
    val tQ = System.nanoTime()
    heap.quantizeStore()
    println(f"quantizeStore (the non-persisted warm cost): ${(System.nanoTime() - tQ) / 1e9}%.2f s")
    if (!new java.io.File(storeI8).isFile) heap.writeStore(storeI8)
    val tH8 = System.nanoTime()
    val heap8 = Hnsw.readStore(storeI8)
    println(f"readStore(heap, +i8 sidecar):   ${(System.nanoTime() - tH8) / 1e9}%.2f s")
    val tM8 = System.nanoTime()
    val mapped8 = Hnsw.readStore(storeI8, mapped = true)
    println(f"readStore(mapped, +i8 sidecar): ${(System.nanoTime() - tM8) / 1e9}%.3f s")
    require(qs.take(64).forall(q =>
        heap8.searchI8(q, k, ef).toSeq == mapped8.searchI8(q, k, ef).toSeq),
      "mapped i8 serve diverged from heap i8 serve")
    println("equality: mapped i8 == heap i8 on 64 queries")
    def measureI8(label: String, g: graft.ops.Hnsw.ShardGraph): Unit = {
      qs.take(32).foreach(g.searchI8(_, k, ef))
      val (gc0, gt0) = gcStats()
      val t0 = System.nanoTime()
      val lat = qs.map { q =>
        val t = System.nanoTime()
        g.searchI8(q, k, ef)
        (System.nanoTime() - t) / 1e3
      }
      var reps = 0
      while ((System.nanoTime() - t0) < 4e9) { qs.foreach(g.searchI8(_, k, ef)); reps += 1 }
      val (gc1, gt1) = gcStats()
      java.util.Arrays.sort(lat)
      println(f"$label%-8s p50=${lat(lat.length / 2)}%8.1f us  p95=${lat((lat.length * 0.95).toInt)}%8.1f us" +
        f"  gc=${gc1 - gc0}%3d collections/${gt1 - gt0}%4d ms over ${reps + 1} sweeps")
    }
    for (pass <- 1 to 2) {
      measureI8(s"heap-i8#$pass", heap8)
      measureI8(s"mmap-i8#$pass", mapped8)
    }
    spark.stop()
  }
}
