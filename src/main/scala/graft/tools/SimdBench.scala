package graft.tools

import graft.functions.expressions.{Simd, VectorKernels}

/** Scratch microbench: single-thread scalar vs Vector-API dot at the
  * 384-d scan shape, plus the 4-query register tile — the kernel-level
  * numbers behind the BENCH_SCALE scan family. Measured on the round-8
  * box (AVX-512, 16 float lanes): scalar ≈ 340 ms, Simd.dot ≈ 143 ms
  * (2.4×), and dot4 scores 4 queries in ≈ 304 ms where 4 single dots
  * take ≈ 572 ms (1.85× — the shared row load+widening).
  *
  * Not a JMH harness: interleave + repetition keep it honest enough for
  * a 2× decision, no further.
  */
object SimdBench {
  def main(args: Array[String]): Unit = {
    val rng = new scala.util.Random(1)
    val dim = args.lift(0).map(_.toInt).getOrElse(384)
    val n = 20000
    val base = Array.fill(n)(Array.fill(dim)(rng.nextFloat()))
    val qs = Array.fill(4)(Array.fill(dim)(rng.nextFloat()))
    val q = qs(0)
    def scalarDot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < dim) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    var sink = 0.0
    val out = new Array[Double](4)
    for (_ <- 1 to 30) { // JIT warmup, all paths
      var i = 0
      while (i < n) {
        sink += scalarDot(q, base(i)) + Simd.dot(q, base(i), dim)
        Simd.dot4(base(i), qs, 0, dim, out, 0); sink += out(3)
        i += 1
      }
    }
    for (trial <- 1 to 3) {
      val t0 = System.nanoTime()
      for (_ <- 1 to 50) { var i = 0; while (i < n) { sink += scalarDot(q, base(i)); i += 1 } }
      val t1 = System.nanoTime()
      for (_ <- 1 to 50) { var i = 0; while (i < n) { sink += Simd.dot(q, base(i), dim); i += 1 } }
      val t2 = System.nanoTime()
      // 4 scores per row pass: compare against 4× the single-dot loop
      for (_ <- 1 to 50) { var i = 0; while (i < n) { Simd.dot4(base(i), qs, 0, dim, out, 0); sink += out(0); i += 1 } }
      val t3 = System.nanoTime()
      println(f"trial$trial dim=$dim scalar ${(t1 - t0) / 1e6}%8.1f ms   simd ${(t2 - t1) / 1e6}%8.1f ms (${(t1 - t0).toDouble / (t2 - t1)}%4.2fx)   dot4/4q ${(t3 - t2) / 1e6}%8.1f ms (${4.0 * (t2 - t1) / (t3 - t2)}%4.2fx vs 4 single dots)")
    }
    println(s"lanes=${Simd.floatLanes} simdEnabled=${VectorKernels.simdEnabled} sink=$sink")
  }
}
