package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.expressions.{BatchScore, Simd, VectorKernels}

/** The Vector-API SIMD kernels (`Simd`) vs their scalar definitions.
  *
  * The contract under test (see `Simd`'s Scaladoc): lane-wise double-FMA
  * accumulation performs the same single-rounded adds as the scalar
  * kernel over each lane's stride-subsequence, so SIMD and scalar results
  * differ only by reassociation — deterministic, and ≤ ~1e-13 relative on
  * O(1)-magnitude rows — never enough to cross an oracle rounding
  * boundary or flip a rank on real data.
  */
class SimdSpec extends AnyFunSuite {

  private val rng = new scala.util.Random(7)
  /** lengths below, at, and far past one lane width, with odd tails */
  private def randVec(): Array[Float] =
    Array.fill(16 + rng.nextInt(685))(rng.nextFloat() * 2 - 1)
  private def forAllPairs(f: (Array[Float], Array[Float]) => Unit): Unit =
    (1 to 200).foreach { _ =>
      val a = randVec()
      f(a, a.map(x => 1.0f - x))
    }

  private def scalarDot(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var acc = 0.0; var i = 0
    while (i < n) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }
  private def scalarL2(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var acc = 0.0; var i = 0
    while (i < n) { val d = a(i).toDouble - b(i).toDouble; acc += d * d; i += 1 }
    acc
  }

  test("SIMD is live on this platform (AVX-capable, module enabled)") {
    assert(VectorKernels.simdEnabled,
      "jdk.incubator.vector missing or species too narrow — the scalar " +
        "fallback would still be correct, but this box is known AVX-512")
    assert(Simd.floatLanes >= 8)
  }

  test("dot: SIMD agrees with the scalar definition to reassociation error") {
    forAllPairs { (a, b) =>
      val n = math.min(a.length, b.length)
      val s = scalarDot(a, b)
      val v = Simd.dot(a, b, n)
      assert(math.abs(v - s) <= 1e-12 * math.max(1.0, math.abs(s)),
        s"n=$n simd=$v scalar=$s")
    }
  }

  test("l2Sq/sumSq: SIMD agrees with the scalar definition") {
    forAllPairs { (a, b) =>
      val n = a.length
      assert(math.abs(Simd.l2Sq(a, b, n) - scalarL2(a, b)) <=
        1e-12 * math.max(1.0, scalarL2(a, b)))
      val ss = scalarDot(a, a)
      assert(math.abs(Simd.sumSq(a) - ss) <= 1e-12 * math.max(1.0, ss))
    }
  }

  test("SIMD results are deterministic call-to-call (bitwise)") {
    val a = randVec().take(383) // odd length: exercises the tail
    val b = randVec().take(383)
    val n = math.min(a.length, b.length)
    val d1 = Simd.dot(a, b, n)
    val l1 = Simd.l2Sq(a, b, n)
    (1 to 5).foreach { _ =>
      assert(java.lang.Double.doubleToRawLongBits(Simd.dot(a, b, n)) ==
        java.lang.Double.doubleToRawLongBits(d1))
      assert(java.lang.Double.doubleToRawLongBits(Simd.l2Sq(a, b, n)) ==
        java.lang.Double.doubleToRawLongBits(l1))
    }
  }

  test("rank stability: SIMD and scalar dot induce the same top-k order") {
    val dim = 384
    val q = Array.fill(dim)(rng.nextFloat() * 2 - 1)
    val base = Array.fill(500)(Array.fill(dim)(rng.nextFloat() * 2 - 1))
    val bySimd = base.zipWithIndex
      .map { case (v, i) => (i, Simd.dot(q, v, dim)) }.sortBy(-_._2).map(_._1)
    val byScalar = base.zipWithIndex
      .map { case (v, i) => (i, scalarDot(q, v)) }.sortBy(-_._2).map(_._1)
    assert(bySimd.toSeq == byScalar.toSeq)
  }

  test("dot4 tile is bitwise-identical to four independent dots") {
    (1 to 50).foreach { _ =>
      val n = 16 + rng.nextInt(685)
      val a = Array.fill(n)(rng.nextFloat() * 2 - 1)
      val qs = Array.fill(6)(Array.fill(n)(rng.nextFloat() * 2 - 1))
      val out = new Array[Double](4)
      Simd.dot4(a, qs, 1, n, out, 0) // offset 1: exercises qoff
      (0 until 4).foreach { j =>
        assert(java.lang.Double.doubleToRawLongBits(out(j)) ==
          java.lang.Double.doubleToRawLongBits(Simd.dot(a, qs(1 + j), n)),
          s"pair $j diverged at n=$n")
      }
    }
  }

  test("l2Sq4 tile is bitwise-identical to four independent l2Sq") {
    (1 to 50).foreach { _ =>
      val n = 16 + rng.nextInt(685)
      val a = Array.fill(n)(rng.nextFloat() * 2 - 1)
      val qs = Array.fill(5)(Array.fill(n)(rng.nextFloat() * 2 - 1))
      val out = new Array[Double](4)
      Simd.l2Sq4(a, qs, 1, n, out, 0)
      (0 until 4).foreach { j =>
        assert(java.lang.Double.doubleToRawLongBits(out(j)) ==
          java.lang.Double.doubleToRawLongBits(Simd.l2Sq(a, qs(1 + j), n)),
          s"pair $j diverged at n=$n")
      }
    }
  }

  test("flat-offset kernels are bitwise twins of their array siblings") {
    // the HNSW packed store reads rows at flat(off + i); every -Off kernel
    // must produce the EXACT bits of its array sibling or graphs built
    // over the two storages would diverge
    val rng2 = new scala.util.Random(11)
    (1 to 50).foreach { _ =>
      val n = 16 + rng2.nextInt(685)
      val a = Array.fill(n)(rng2.nextFloat() * 2 - 1)
      val rows = Array.fill(5)(Array.fill(n)(rng2.nextFloat() * 2 - 1))
      // pack rows at random non-zero offsets into one flat buffer
      val pad = rng2.nextInt(7)
      val flat = new Array[Float](pad + 5 * n)
      val offs = Array.tabulate(5)(j => pad + j * n)
      rows.zipWithIndex.foreach { case (r, j) =>
        System.arraycopy(r, 0, flat, offs(j), n)
      }
      def bits(d: Double) = java.lang.Double.doubleToRawLongBits(d)
      (0 until 5).foreach { j =>
        assert(bits(Simd.dotOff(a, flat, offs(j), n)) ==
          bits(Simd.dot(a, rows(j), n)), s"dotOff diverged n=$n")
        assert(bits(Simd.l2SqOff(a, flat, offs(j), n)) ==
          bits(Simd.l2Sq(a, rows(j), n)), s"l2SqOff diverged n=$n")
        assert(bits(Simd.sumSqOff(flat, offs(j), n)) ==
          bits(Simd.sumSq(rows(j))), s"sumSqOff diverged n=$n")
        assert(bits(Simd.dotFOff(a, flat, offs(j), n)) ==
          bits(Simd.dotF(a, rows(j), n)), s"dotFOff diverged n=$n")
        assert(bits(Simd.l2SqFOff(a, flat, offs(j), n)) ==
          bits(Simd.l2SqF(a, rows(j), n)), s"l2SqFOff diverged n=$n")
      }
      val outA = new Array[Double](4); val outF = new Array[Double](4)
      Simd.dot4At(a, rows, 1, 2, 3, 4, n, outA)
      Simd.dot4AtOff(a, flat, offs(1), offs(2), offs(3), offs(4), n, outF)
      (0 until 4).foreach(j => assert(bits(outA(j)) == bits(outF(j)), "dot4AtOff"))
      Simd.l2Sq4At(a, rows, 1, 2, 3, 4, n, outA)
      Simd.l2Sq4AtOff(a, flat, offs(1), offs(2), offs(3), offs(4), n, outF)
      (0 until 4).foreach(j => assert(bits(outA(j)) == bits(outF(j)), "l2Sq4AtOff"))
      Simd.dot4AtF(a, rows, 1, 2, 3, 4, n, outA)
      Simd.dot4AtFOff(a, flat, offs(1), offs(2), offs(3), offs(4), n, outF)
      (0 until 4).foreach(j => assert(bits(outA(j)) == bits(outF(j)), "dot4AtFOff"))
      Simd.l2Sq4AtF(a, rows, 1, 2, 3, 4, n, outA)
      Simd.l2Sq4AtFOff(a, flat, offs(1), offs(2), offs(3), offs(4), n, outF)
      (0 until 4).foreach(j => assert(bits(outA(j)) == bits(outF(j)), "l2Sq4AtFOff"))
    }
    // scalar (simd-off) twins through the VectorKernels dispatchers too
    val a = Array.fill(13)(rng2.nextFloat()) // below SimdMinLen: scalar path
    val row = Array.fill(13)(rng2.nextFloat())
    val flat = new Array[Float](20)
    System.arraycopy(row, 0, flat, 5, 13)
    def bits(d: Double) = java.lang.Double.doubleToRawLongBits(d)
    assert(bits(VectorKernels.dotOff(a, flat, 5, 13)) ==
      bits(VectorKernels.dot(a, row)))
    assert(bits(VectorKernels.l2SqOff(a, flat, 5, 13)) ==
      bits(VectorKernels.l2Sq(a, row)))
    assert(bits(VectorKernels.cosineOff(a, flat, 5, 13)) ==
      bits(VectorKernels.cosine(a, row)))
  }

  test("ByteBuffer kernels are bitwise twins of the -Off family") {
    // the mmap-store serve path (r14) reads rows from a little-endian
    // ByteBuffer; every BB kernel must produce the EXACT bits of the
    // array twin over the same payload — mapped graphs would otherwise
    // diverge from the graphs they were saved from
    val rng2 = new scala.util.Random(13)
    def bits(d: Double) = java.lang.Double.doubleToRawLongBits(d)
    (1 to 50).foreach { _ =>
      val n = 16 + rng2.nextInt(685)
      val a = Array.fill(n)(rng2.nextFloat() * 2 - 1)
      val pad = rng2.nextInt(7)
      val flat = Array.fill(pad + 5 * n)(rng2.nextFloat() * 2 - 1)
      val offs = Array.tabulate(5)(j => pad + j * n)
      // the exact payload, as a direct little-endian buffer (mmap's shape)
      val bb = java.nio.ByteBuffer.allocateDirect(flat.length * 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.asFloatBuffer().put(flat)
      (0 until 5).foreach { j =>
        assert(bits(Simd.dotOffBB(a, bb, offs(j), n)) ==
          bits(Simd.dotOff(a, flat, offs(j), n)), s"dotOffBB diverged n=$n")
        assert(bits(Simd.l2SqOffBB(a, bb, offs(j), n)) ==
          bits(Simd.l2SqOff(a, flat, offs(j), n)), s"l2SqOffBB diverged n=$n")
        assert(bits(Simd.sumSqOffBB(bb, offs(j), n)) ==
          bits(Simd.sumSqOff(flat, offs(j), n)), s"sumSqOffBB diverged n=$n")
      }
      val outA = new Array[Double](4); val outB = new Array[Double](4)
      Simd.dot4AtOff(a, flat, offs(1), offs(2), offs(3), offs(4), n, outA)
      Simd.dot4AtOffBB(a, bb, offs(1), offs(2), offs(3), offs(4), n, outB)
      (0 until 4).foreach(j => assert(bits(outA(j)) == bits(outB(j)), "dot4AtOffBB"))
      Simd.l2Sq4AtOff(a, flat, offs(1), offs(2), offs(3), offs(4), n, outA)
      Simd.l2Sq4AtOffBB(a, bb, offs(1), offs(2), offs(3), offs(4), n, outB)
      (0 until 4).foreach(j => assert(bits(outA(j)) == bits(outB(j)), "l2Sq4AtOffBB"))
      // i8 sidecar twins (v2 mapped store): byte offsets, float acc
      val codes = Array.fill(pad + 5 * n)((rng2.nextInt(255) - 127).toByte)
      val cbb = java.nio.ByteBuffer.allocateDirect(codes.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      cbb.put(codes.clone()); cbb.clear()
      def fbits(f: Float) = java.lang.Float.floatToRawIntBits(f)
      (0 until 5).foreach { j =>
        assert(fbits(Simd.dotI8FBB(a, cbb, offs(j), n)) ==
          fbits(Simd.dotI8F(a, codes, offs(j), n)), s"dotI8FBB diverged n=$n")
      }
      val out8A = new Array[Float](4); val out8B = new Array[Float](4)
      Simd.dotI8F4At(a, codes, offs(1), offs(2), offs(3), offs(4), n, out8A)
      Simd.dotI8F4AtBB(a, cbb, offs(1), offs(2), offs(3), offs(4), n, out8B)
      (0 until 4).foreach(j =>
        assert(fbits(out8A(j)) == fbits(out8B(j)), "dotI8F4AtBB"))
    }
    // scalar dispatch twins (below SimdMinLen) including cosine
    val a = Array.fill(13)(rng2.nextFloat())
    val row = Array.fill(13)(rng2.nextFloat())
    val flat = new Array[Float](20)
    System.arraycopy(row, 0, flat, 5, 13)
    val bb = java.nio.ByteBuffer.allocateDirect(80)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.asFloatBuffer().put(flat)
    assert(bits(VectorKernels.dotOffBB(a, bb, 5, 13)) ==
      bits(VectorKernels.dotOff(a, flat, 5, 13)))
    assert(bits(VectorKernels.l2SqOffBB(a, bb, 5, 13)) ==
      bits(VectorKernels.l2SqOff(a, flat, 5, 13)))
    assert(bits(VectorKernels.cosineOffBB(a, bb, 5, 13)) ==
      bits(VectorKernels.cosineOff(a, flat, 5, 13)))
    val codes13 = Array.fill(20)((rng2.nextInt(255) - 127).toByte)
    val cbb13 = java.nio.ByteBuffer.allocateDirect(20)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    cbb13.put(codes13.clone()); cbb13.clear()
    assert(java.lang.Float.floatToRawIntBits(
      VectorKernels.dotI8FOffBB(a, cbb13, 5, 13)) ==
      java.lang.Float.floatToRawIntBits(
        VectorKernels.dotI8FOff(a, codes13, 5, 13)))
  }

  test("float-acc serving kernels track the double-lane contract within " +
       "the documented n·eps_f32 budget") {
    // dotF/l2SqF/dot4AtF/l2Sq4AtF are the OPT-IN serve flavors — never
    // bitwise-comparable, but they must stay inside the ~n·2^-24 relative
    // band the scaladoc promises (a kernel bug would blow far past it)
    forAllPairs { (a, b) =>
      val n = math.min(a.length, b.length)
      val budget = n * 1.2e-7 * (1.0 + n.toDouble / 64)
      val sD = Simd.dot(a, b, n)
      assert(math.abs(Simd.dotF(a, b, n) - sD) <=
        budget * math.max(1.0, a.map(x => math.abs(x.toDouble)).sum),
        s"dotF outside the float-acc budget at n=$n")
      val sL = Simd.l2Sq(a, b, n)
      assert(math.abs(Simd.l2SqF(a, b, n) - sL) <=
        budget * math.max(1.0, sL), s"l2SqF outside the budget at n=$n")
    }
    (1 to 20).foreach { _ =>
      val n = 16 + rng.nextInt(685)
      val a = Array.fill(n)(rng.nextFloat() * 2 - 1)
      val rows = Array.fill(6)(Array.fill(n)(rng.nextFloat() * 2 - 1))
      val outF = new Array[Double](4)
      val budget = n * 1.2e-7 * (1.0 + n.toDouble / 64)
      Simd.dot4AtF(a, rows, 1, 2, 3, 4, n, outF)
      (0 until 4).foreach { j =>
        val d = Simd.dot(a, rows(1 + j), n)
        assert(math.abs(outF(j) - d) <=
          budget * math.max(1.0, a.map(x => math.abs(x.toDouble)).sum))
      }
      Simd.l2Sq4AtF(a, rows, 1, 2, 3, 4, n, outF)
      (0 until 4).foreach { j =>
        val d = Simd.l2Sq(a, rows(1 + j), n)
        assert(math.abs(outF(j) - d) <= budget * math.max(1.0, d))
      }
    }
  }

  test("batched cosine with hoisted norms == per-pair cosine (bitwise)") {
    val dim = 100
    val x = Array.fill(dim)(rng.nextFloat() * 2 - 1)
    val qs = Array.fill(7)(Array.fill(dim)(rng.nextFloat() * 2 - 1))
    val got = BatchScore.scores(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(x), qs, BatchScore.MCos)
    (0 until 7).foreach { j =>
      assert(java.lang.Double.doubleToRawLongBits(got.getDouble(j)) ==
        java.lang.Double.doubleToRawLongBits(VectorKernels.cosine(x, qs(j))),
        s"cosine pair $j diverged")
    }
  }

  test("vector f16 decode == scalar halfToFloat, bitwise, ALL 65536 patterns") {
    assume(Simd.halfKernelsAvailable)
    val bits = Array.tabulate(65536)(i => i.toShort)
    val out = new Array[Float](65536)
    Simd.halfLanesDecode(bits, out)
    var i = 0
    while (i < 65536) {
      val want = VectorKernels.halfToFloat(bits(i))
      assert(java.lang.Float.floatToRawIntBits(out(i))
        == java.lang.Float.floatToRawIntBits(want),
        f"decode mismatch at 0x$i%04x: got=${out(i)} want=$want")
      i += 1
    }
  }

  test("fused dotHalf/l2SqHalf == decode-then-SIMD, bitwise; 4-wide tiles " +
    "== per-pair") {
    assume(Simd.halfKernelsAvailable)
    val dims = Seq(384, 64, 32, 96, 100, 17, 48) // 32-aligned, 16-block straggler, ragged
    dims.foreach { d =>
      val rows = Array.fill(4)(Array.fill(d)(
        VectorKernels.floatToHalf(rng.nextFloat() * 2 - 1)))
      val q = Array.fill(d)(rng.nextFloat() * 2 - 1)
      rows.foreach { h =>
        val decoded = new Array[Float](d)
        var i = 0
        while (i < d) { decoded(i) = VectorKernels.halfToFloat(h(i)); i += 1 }
        val wantDot = Simd.dot(q, decoded, d)
        val gotDot = Simd.dotHalf(q, h, d)
        assert(java.lang.Double.doubleToRawLongBits(gotDot)
          == java.lang.Double.doubleToRawLongBits(wantDot), s"dotHalf d=$d")
        val wantL2 = Simd.l2Sq(q, decoded, d)
        val gotL2 = Simd.l2SqHalf(q, h, d)
        assert(java.lang.Double.doubleToRawLongBits(gotL2)
          == java.lang.Double.doubleToRawLongBits(wantL2), s"l2SqHalf d=$d")
      }
      val out = new Array[Double](4)
      Simd.dotHalf4At(q, rows, 0, 1, 2, 3, d, out)
      (0 until 4).foreach { j =>
        assert(java.lang.Double.doubleToRawLongBits(out(j))
          == java.lang.Double.doubleToRawLongBits(Simd.dotHalf(q, rows(j), d)),
          s"dotHalf4At lane $j d=$d")
      }
      Simd.l2SqHalf4At(q, rows, 0, 1, 2, 3, d, out)
      (0 until 4).foreach { j =>
        assert(java.lang.Double.doubleToRawLongBits(out(j))
          == java.lang.Double.doubleToRawLongBits(Simd.l2SqHalf(q, rows(j), d)),
          s"l2SqHalf4At lane $j d=$d")
      }
    }
  }

  test("per-pair dotI8/dotHalf stay bit-identical to their batched hoists") {
    // dotI8/dotHalf route through the same widen/decode + dot shape as
    // BatchScore.scoresI8/scoresHalf — identity must hold with SIMD live.
    val dim = 200
    val v = Array.fill(dim)(rng.nextFloat() * 2 - 1)
    val q = Array.fill(dim)(rng.nextFloat() * 2 - 1)
    val s = VectorKernels.i8Scale(v)
    val codes = VectorKernels.i8Codes(v, s)
    val widened = codes.map(_.toFloat)
    assert(java.lang.Double.doubleToRawLongBits(VectorKernels.dotI8(q, codes, s)) ==
      java.lang.Double.doubleToRawLongBits(VectorKernels.dot(q, widened) * s))
    val bits = v.map(VectorKernels.floatToHalf)
    val decoded = bits.map(VectorKernels.halfToFloat)
    assert(java.lang.Double.doubleToRawLongBits(VectorKernels.dotHalf(q, bits)) ==
      java.lang.Double.doubleToRawLongBits(VectorKernels.dot(q, decoded)))
  }
}
