package graft.tools

import graft.functions.expressions.{Simd, VectorKernels}

object SimdBench {
  def main(args: Array[String]): Unit = {
    val rng = new scala.util.Random(1)
    val dim = 384
    val n = 20000
    val base = Array.fill(n)(Array.fill(dim)(rng.nextFloat()))
    val q = Array.fill(dim)(rng.nextFloat())
    def scalarDot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < dim) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    var sink = 0.0
    // warmup both
    for (_ <- 1 to 30) { var i = 0; while (i < n) { sink += scalarDot(q, base(i)); sink += Simd.dot(q, base(i), dim); i += 1 } }
    for (trial <- 1 to 3) {
      val t0 = System.nanoTime()
      for (_ <- 1 to 50) { var i = 0; while (i < n) { sink += scalarDot(q, base(i)); i += 1 } }
      val t1 = System.nanoTime()
      for (_ <- 1 to 50) { var i = 0; while (i < n) { sink += Simd.dot(q, base(i), dim); i += 1 } }
      val t2 = System.nanoTime()
      println(f"trial$trial scalar ${(t1-t0)/1e6}%8.1f ms   simd ${(t2-t1)/1e6}%8.1f ms   speedup ${(t1-t0).toDouble/(t2-t1)}%5.2f")
    }
    println(s"lanes=${Simd.floatLanes} sink=$sink")
  }
}
