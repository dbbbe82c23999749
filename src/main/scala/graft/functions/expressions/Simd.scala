package graft.functions.expressions

import jdk.incubator.vector.{DoubleVector, FloatVector, VectorOperators}

/** Explicit SIMD kernels via the JDK Vector API — the Spark-side analogue
  * of the reference's runtime-dispatched AVX2+FMA kernel family
  * (`/root/reference/src/simd_dot.cpp:26-66`: one `vfmadd` per 8 floats,
  * scalar fallback when the ISA lacks AVX2).
  *
  * Precision contract — stricter than the reference's. The reference lets
  * its SIMD path accumulate in FLOAT (`_mm256_fmadd_ps`) while its scalar
  * fallback accumulates in double, so its two paths drift by ~1e-4
  * relative on long rows. Our oracle gate (DuckDB hash compare at 1e-9
  * rounding) cannot absorb that, so these kernels widen each float lane
  * pair to DOUBLE lanes and FMA in double: a float×float product is exact
  * in double (24+24 ≤ 53 mantissa bits), so every lane's running sum
  * performs the IDENTICAL single-rounded adds as the scalar kernel over
  * that lane's stride-subsequence. The only difference from sequential
  * scalar accumulation is the lane interleave + final reduction order —
  * a deterministic ~1e-15-relative reassociation, far under every oracle
  * tolerance and property-gated by SimdSpec.
  *
  * Dispatch lives in [[VectorKernels]] (`-Dgraft.simd=off` forces scalar,
  * mirroring the reference's `set_force_scalar`, `src/simd_dot.cpp:14-16`);
  * this object is only loaded behind a linkage-failure guard so a JVM
  * without `jdk.incubator.vector` degrades to the scalar kernels.
  */
object Simd {

  private val FS = FloatVector.SPECIES_PREFERRED
  private val DS = DoubleVector.SPECIES_PREFERRED

  /** Probed by [[VectorKernels.simdEnabled]]; any linkage/availability
    * failure is caught there. Same-shape float/double species are required
    * so `convert(F2D, part)` is the shape-preserving intrinsic form.
    */
  def available: Boolean =
    FS.length() >= 8 && FS.vectorBitSize() == DS.vectorBitSize()

  /** Lane width exposed for specs/diagnostics. */
  def floatLanes: Int = FS.length()

  /** dot(a, b) over the first `n` elements, double-accumulated. */
  def dot(a: Array[Float], b: Array[Float], n: Int): Double = {
    var acc0 = DoubleVector.zero(DS)
    var acc1 = DoubleVector.zero(DS)
    val step = FS.length()
    val upper = FS.loopBound(n)
    var i = 0
    while (i < upper) {
      val va = FloatVector.fromArray(FS, a, i)
      val vb = FloatVector.fromArray(FS, b, i)
      acc0 = va.convert(VectorOperators.F2D, 0).asInstanceOf[DoubleVector]
        .fma(vb.convert(VectorOperators.F2D, 0).asInstanceOf[DoubleVector], acc0)
      acc1 = va.convert(VectorOperators.F2D, 1).asInstanceOf[DoubleVector]
        .fma(vb.convert(VectorOperators.F2D, 1).asInstanceOf[DoubleVector], acc1)
      i += step
    }
    var s = acc0.add(acc1).reduceLanes(VectorOperators.ADD)
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  /** Squared L2 over the first `n` elements. Lane math: `d = a - b` in
    * double (same single rounding as the scalar kernel), then `fma(d, d)`
    * — one rounding where the scalar kernel's `acc + d*d` takes two, a
    * ≤1-ulp-per-element divergence inside the same reassociation budget.
    */
  def l2Sq(a: Array[Float], b: Array[Float], n: Int): Double = {
    var acc0 = DoubleVector.zero(DS)
    var acc1 = DoubleVector.zero(DS)
    val step = FS.length()
    val upper = FS.loopBound(n)
    var i = 0
    while (i < upper) {
      val va = FloatVector.fromArray(FS, a, i)
      val vb = FloatVector.fromArray(FS, b, i)
      val d0 = va.convert(VectorOperators.F2D, 0).asInstanceOf[DoubleVector]
        .sub(vb.convert(VectorOperators.F2D, 0).asInstanceOf[DoubleVector])
      val d1 = va.convert(VectorOperators.F2D, 1).asInstanceOf[DoubleVector]
        .sub(vb.convert(VectorOperators.F2D, 1).asInstanceOf[DoubleVector])
      acc0 = d0.fma(d0, acc0)
      acc1 = d1.fma(d1, acc1)
      i += step
    }
    var s = acc0.add(acc1).reduceLanes(VectorOperators.ADD)
    while (i < n) { val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1 }
    s
  }

  /** Sum of squares over the whole array (norm2 = sqrt of this). */
  def sumSq(a: Array[Float]): Double = {
    val n = a.length
    var acc0 = DoubleVector.zero(DS)
    var acc1 = DoubleVector.zero(DS)
    val step = FS.length()
    val upper = FS.loopBound(n)
    var i = 0
    while (i < upper) {
      val va = FloatVector.fromArray(FS, a, i)
      val v0 = va.convert(VectorOperators.F2D, 0).asInstanceOf[DoubleVector]
      val v1 = va.convert(VectorOperators.F2D, 1).asInstanceOf[DoubleVector]
      acc0 = v0.fma(v0, acc0)
      acc1 = v1.fma(v1, acc1)
      i += step
    }
    var s = acc0.add(acc1).reduceLanes(VectorOperators.ADD)
    while (i < n) { s += a(i).toDouble * a(i).toDouble; i += 1 }
    s
  }
}
