package graft.tools

import graft.core.GraftSession
import graft.ops.{Hnsw, Metric}

/** Crossover sweep for the r15 auto serve flavor ([[Hnsw.ShardGraph.autoI8]]):
  * load the cached 500K single-graph store (built by BenchScale —
  * `target/scale_hnsw_store_500000/shard_0.graph`, m=16 efC=100 Dot,
  * lr8 corpus), quantize, and ladder efSearch over contract / i8 / auto
  * on an in-distribution (easy) and an off-distribution (hard-walk
  * proxy) query set. The recorded crossover sets `Hnsw.autoI8Bytes`'
  * default; the done-gate is auto ≈ min(contract, i8) p50 at every
  * rung (auto IS one of the two walks — the probe verifies the pick
  * lands on the faster one in each regime).
  *
  * Run: sbt 'runMain graft.tools.AutoFlavorProbe [storePath]'
  */
object AutoFlavorProbe {
  def main(args: Array[String]): Unit = {
    val store =
      if (args.length > 0) args(0)
      else "target/scale_hnsw_store_500000/shard_0.graph"
    val spark = GraftSession.local(8)
    spark.sparkContext.setLogLevel("WARN")
    val g = Hnsw.readStore(store)
    val tQ = System.nanoTime()
    if (!g.i8Available) g.quantizeStore()
    println(f"graph loaded: quantize ${(System.nanoTime() - tQ) / 1e9}%.2f s")

    def qset(intrinsic: Int, seed: Long) =
      SyntheticVectors.lowRankFast(spark, 256, 384, intrinsic = intrinsic,
        seed = seed).collect().map(_.getSeq[Float](1).toArray)
    // easy: the corpus's own low-rank distribution (beams converge fast,
    // hub rows cache); hard-walk proxy: full-rank off-distribution
    // queries against the same graph (beams wander, gathers scatter)
    val regimes = Seq(("easy_lr8", qset(8, 7L)), ("hard_fullrank", qset(384, 11L)))

    val k = 10
    // r16: the MEASURED per-graph crossover (ShardGraph.calibrateFlavor)
    // replaces the byte heuristic once run — sweep both pickers: pass 0
    // uncalibrated (byte heuristic, the r15 behavior), pass 1 after
    // calibration on the graph's own rows. The done-gate extends to the
    // hard ladder: the calibrated pick must land within noise of
    // min(contract, i8) in BOTH regimes, where the byte heuristic leaned
    // on luck for hard walks (hardness-blind — the r15 verdict caveat).
    val efLadder = Seq(16, 64, 128, 256, 512, 1024)
    for (calibrated <- Seq(false, true)) {
      if (calibrated) {
        val tC = System.nanoTime()
        val cross = g.calibrateFlavor(efLadder.toArray, sampleQ = 32)
        println(f"calibrateFlavor: crossover ef=$cross " +
          f"(${(System.nanoTime() - tC) / 1e9}%.2f s)")
      }
      for ((regime, qs) <- regimes; ef <- efLadder) {
        def p50(fn: Array[Float] => Unit): Double = {
          qs.take(32).foreach(fn)
          val lat = qs.map { q =>
            val t = System.nanoTime(); fn(q); (System.nanoTime() - t) / 1e3
          }
          java.util.Arrays.sort(lat)
          lat(lat.length / 2)
        }
        val c = p50(q => { g.search(q, k, ef); () })
        val i = p50(q => { g.searchI8(q, k, ef); () })
        val pick = g.autoI8(ef)
        val a = p50(q => {
          if (pick) g.searchI8(q, k, ef) else g.search(q, k, ef); ()
        })
        val walkMb = math.min(g.flatBytes,
          ef.toLong * 16 * 384 * 4) / 1e6
        val tag = if (calibrated) "auto_cal" else "auto_byte"
        println(f"[$tag] $regime%-14s ef=$ef%-5d contract=$c%8.1f us  i8=$i%8.1f us" +
          f"  auto=$a%8.1f us (pick=${if (pick) "i8" else "contract"}, walk≈$walkMb%.1f MB)")
      }
    }
    spark.stop()
  }
}
