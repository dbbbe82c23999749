package graft.tools

import jdk.incubator.vector.{FloatVector, IntVector, ShortVector, VectorOperators}

import graft.functions.expressions.{Simd, VectorKernels}

/** Isolate which op in the f16 vector decode fails to intrinsify.
  *
  * Methodology note (burned once): Vector-API loops compiled via OSR
  * (one call, huge loop) often do NOT intrinsify — every variant here is
  * a small METHOD called thousands of times so C2 compiles it whole.
  */
object HalfDecodeProbe {
  private val SS = ShortVector.SPECIES_PREFERRED
  private val FS = FloatVector.SPECIES_PREFERRED
  private val IS = IntVector.SPECIES_PREFERRED
  private val MAGIC = java.lang.Float.intBitsToFloat(113 << 23)

  private def halfLanesLocal(x16: IntVector): FloatVector = {
    val x = x16.and(0x7fff)
    val sign = x16.and(0x8000).lanewise(VectorOperators.LSHL, 16)
    val base = x.lanewise(VectorOperators.LSHL, 13).add(112 << 23)
    val isInf = x.compare(VectorOperators.GE, 0x7c00)
    val isSub = x.compare(VectorOperators.LT, 0x0400)
    val inf = base.add(112 << 23)
    val sub = base.add(1 << 23).reinterpretAsFloats()
      .sub(MAGIC).reinterpretAsInts()
    base.blend(inf, isInf).blend(sub, isSub).or(sign).reinterpretAsFloats()
  }

  // each variant decodes ONE 384-elem row per call
  private def viaS2I(h: Array[Short], out: Array[Float]): Unit = {
    val step = FS.length(); val step2 = SS.length()
    var i = 0
    while (i < h.length) {
      val sv = ShortVector.fromArray(SS, h, i)
      var p = 0
      while (p < 2) {
        halfLanesLocal(sv.convert(VectorOperators.S2I, p).asInstanceOf[IntVector])
          .intoArray(out, i + p * step)
        p += 1
      }
      i += step2
    }
  }

  private def viaIntPacked(packed: Array[Int], outLo: Array[Float],
                           outHi: Array[Float]): Unit = {
    val is = IS.length()
    var i = 0
    while (i < packed.length) {
      val iv = IntVector.fromArray(IS, packed, i)
      halfLanesLocal(iv.and(0xffff)).intoArray(outLo, i)
      halfLanesLocal(iv.lanewise(VectorOperators.LSHR, 16)).intoArray(outHi, i)
      i += is
    }
  }

  private def viaScalar(h: Array[Short], out: Array[Float]): Unit = {
    var i = 0
    while (i < h.length) { out(i) = VectorKernels.halfToFloat(h(i)); i += 1 }
  }

  // f16 dot with int-packed rows + pre-swizzled query (evens, odds):
  // decode lo/hi halves, fma each against its query half — no S2I, no
  // re-zip. Accumulation: separate double-lane accs per half.
  private def dotPacked(qEven: Array[Float], qOdd: Array[Float],
                        packed: Array[Int]): Double = {
    import jdk.incubator.vector.DoubleVector
    val DS = DoubleVector.SPECIES_PREFERRED
    var accL0 = DoubleVector.zero(DS); var accL1 = DoubleVector.zero(DS)
    var accH0 = DoubleVector.zero(DS); var accH1 = DoubleVector.zero(DS)
    val is = IS.length()
    var i = 0
    while (i < packed.length) {
      val iv = IntVector.fromArray(IS, packed, i)
      val lo = halfLanesLocal(iv.and(0xffff))
      val hi = halfLanesLocal(iv.lanewise(VectorOperators.LSHR, 16))
      val qe = FloatVector.fromArray(FS, qEven, i)
      val qo = FloatVector.fromArray(FS, qOdd, i)
      accL0 = lo.convert(VectorOperators.F2D, 0).asInstanceOf[DoubleVector]
        .fma(qe.convert(VectorOperators.F2D, 0).asInstanceOf[DoubleVector], accL0)
      accL1 = lo.convert(VectorOperators.F2D, 1).asInstanceOf[DoubleVector]
        .fma(qe.convert(VectorOperators.F2D, 1).asInstanceOf[DoubleVector], accL1)
      accH0 = hi.convert(VectorOperators.F2D, 0).asInstanceOf[DoubleVector]
        .fma(qo.convert(VectorOperators.F2D, 0).asInstanceOf[DoubleVector], accH0)
      accH1 = hi.convert(VectorOperators.F2D, 1).asInstanceOf[DoubleVector]
        .fma(qo.convert(VectorOperators.F2D, 1).asInstanceOf[DoubleVector], accH1)
      i += is
    }
    accL0.add(accL1).add(accH0.add(accH1)).reduceLanes(VectorOperators.ADD)
  }

  def main(args: Array[String]): Unit = {
    val d = 384
    val nRows = 4096
    val rnd = new scala.util.Random(7)
    val rowsH = Array.fill(nRows)(Array.fill(d)(
      VectorKernels.floatToHalf(rnd.nextFloat() * 2 - 1)))
    val rowsP = rowsH.map { h =>
      Array.tabulate(d / 2)(j => (h(2 * j) & 0xffff) | ((h(2 * j + 1) & 0xffff) << 16))
    }
    val rowsF = rowsH.map { h => h.map(VectorKernels.halfToFloat) }
    val q = Array.fill(d)(rnd.nextFloat() * 2 - 1)
    val qEven = Array.tabulate(d / 2)(j => q(2 * j))
    val qOdd = Array.tabulate(d / 2)(j => q(2 * j + 1))
    val out = new Array[Float](d)
    val outLo = new Array[Float](d / 2)
    val outHi = new Array[Float](d / 2)

    def bench(tag: String, perRow: Int => Unit): Unit = {
      (0 until 4).foreach { r =>
        val t0 = System.nanoTime()
        var i = 0
        while (i < nRows * 8) { perRow(i % nRows); i += 1 }
        val sec = (System.nanoTime() - t0) / 1e9
        if (r >= 2) println(f"[probe] $tag: ${nRows * 8L * d / sec / 1e6}%8.1f Melem/s")
      }
    }
    bench("scalar decode ", i => viaScalar(rowsH(i), out))
    bench("S2I decode    ", i => viaS2I(rowsH(i), out))
    bench("int-packed dec", i => viaIntPacked(rowsP(i), outLo, outHi))
    var sink = 0.0
    bench("packed dot    ", i => sink += dotPacked(qEven, qOdd, rowsP(i)))
    bench("f32 dot       ", i => sink += Simd.dot(q, rowsF(i), d))
    bench("dotHalf (S2I) ", i => sink += Simd.dotHalf(q, rowsH(i), d))
    println(s"[probe] sink=$sink ${out(17)} ${outLo(3)} ${outHi(3)}")
  }
}
