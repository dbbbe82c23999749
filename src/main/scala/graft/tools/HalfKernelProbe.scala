package graft.tools

import graft.functions.expressions.{Simd, VectorKernels}

/** Throwaway-style diagnostic for the f16 graph-kernel question (r12
  * verdict task #4): is the fused f16 gather tile faster than the f32
  * tile on this box for an HNSW-build-shaped access pattern? The build's
  * beam expansion gathers ~4-row tiles at RANDOM indices over a shard's
  * vector table (≈31k × 384d per shard at 1M/32 — 48 MB f32, 24 MB f16,
  * both past L2), with 32 shard builds sharing DRAM concurrently.
  * Measures single-thread and 16-thread aggregate tile throughput.
  */
object HalfKernelProbe {
  def main(args: Array[String]): Unit = {
    println(s"halfKernelsAvailable=${Simd.halfKernelsAvailable}")
    val n = 31250
    val d = 384
    val rnd = new scala.util.Random(7)
    val rowsF = Array.fill(n)(Array.fill(d)(rnd.nextFloat() * 2 - 1))
    val rowsH = rowsF.map(_.map(VectorKernels.floatToHalf))
    val q = Array.fill(d)(rnd.nextFloat() * 2 - 1)
    val nTiles = 200000

    def bench(tag: String, op: (Array[Int], Array[Double]) => Unit): Unit = {
      val idx = Array.fill(4 * nTiles)(rnd.nextInt(n))
      val out = new Array[Double](4)
      var sink = 0.0
      (0 until 3).foreach { round =>
        val t0 = System.nanoTime()
        var t = 0
        while (t < nTiles) {
          op(java.util.Arrays.copyOfRange(idx, 4 * t, 4 * t + 4), out)
          sink += out(0)
          t += 1
        }
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[half] $tag round $round: ${nTiles * 4 / sec / 1e6}%8.2f Mdist/s  ($sec%5.2f s)")
      }
      println(s"[half] sink=$sink")
    }
    bench("f32 dot4At ", (ix, out) =>
      Simd.dot4At(q, rowsF, ix(0), ix(1), ix(2), ix(3), d, out))
    bench("f16 dotH4At", (ix, out) =>
      Simd.dotHalf4At(q, rowsH, ix(0), ix(1), ix(2), ix(3), d, out))
    bench("f32 dot x4 ", (ix, out) => {
      out(0) = Simd.dot(q, rowsF(ix(0)), d); out(1) = Simd.dot(q, rowsF(ix(1)), d)
      out(2) = Simd.dot(q, rowsF(ix(2)), d); out(3) = Simd.dot(q, rowsF(ix(3)), d)
    })
    bench("f16 dotH x4", (ix, out) => {
      out(0) = Simd.dotHalf(q, rowsH(ix(0)), d); out(1) = Simd.dotHalf(q, rowsH(ix(1)), d)
      out(2) = Simd.dotHalf(q, rowsH(ix(2)), d); out(3) = Simd.dotHalf(q, rowsH(ix(3)), d)
    })

    // 16-thread aggregate: concurrent shard builds share DRAM bandwidth —
    // where halved row bytes should show up hardest
    def benchMt(tag: String, half: Boolean): Unit = {
      val threads = 16
      (0 until 2).foreach { round =>
        val t0 = System.nanoTime()
        val ts = (0 until threads).map { tid =>
          val th = new Thread(() => {
            val r = new scala.util.Random(tid)
            val out = new Array[Double](4)
            var t = 0
            var s = 0.0
            while (t < nTiles / 2) {
              val a = r.nextInt(n); val b = r.nextInt(n)
              val c = r.nextInt(n); val e = r.nextInt(n)
              if (half) Simd.dotHalf4At(q, rowsH, a, b, c, e, d, out)
              else Simd.dot4At(q, rowsF, a, b, c, e, d, out)
              s += out(0)
              t += 1
            }
            if (s == Double.MinValue) println("") // keep s live
          })
          th.start(); th
        }
        ts.foreach(_.join())
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[half] $tag x$threads round $round: ${threads.toLong * (nTiles / 2) * 4 / sec / 1e6}%8.2f Mdist/s agg ($sec%5.2f s)")
      }
    }
    benchMt("f32 mt ", half = false)
    benchMt("f16 mt ", half = true)
  }
}
