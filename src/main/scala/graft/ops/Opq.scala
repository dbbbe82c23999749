package graft.ops

import breeze.linalg.{svd, DenseMatrix}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

import graft.functions.expressions.MatVec

/** OPQ: learn an orthogonal rotation that minimizes PQ quantization error
  * before product-quantizing — the reference's OPQ-PQ variant
  * (`/root/reference/apps/nvdb_ivfpq_build.cpp:78-91`, +0.07 recall at
  * equal footprint per `Performance.md:629-630`).
  *
  * Algorithm (OPQ-NP, alternating optimization): rotate the training
  * sample, refresh per-subspace codebooks, reconstruct, then solve the
  * orthogonal Procrustes problem R = U·Vᵀ from SVD(Xᵀ·X̂) and repeat.
  *
  * Scale design: the alternating loop runs driver-side on the SAME
  * bounded deterministic training prefix the PQ/IVF trainers use (FAISS
  * trains `OPQMatrix` on a bounded sample too); d×d SVD is trivial. The
  * learned rotation then applies to the full table as a codegen matrix ×
  * vector expression — narrow, shuffle-free, broadcast-free.
  */
object Opq {

  def rotate(vec: Column, r: Array[Array[Float]]): Column =
    Bridge.column(MatVec(Bridge.expression(vec), r))

  /** Driver-side Lloyd k-means on a subspace (deterministic: seeded by
    * `seed`, init = evenly strided sample). Small inputs only — this runs
    * inside the OPQ alternating loop on the bounded training sample.
    */
  private def kmeansLocal(pts: Array[Array[Double]], k: Int, iters: Int,
                          seed: Long): Array[Array[Double]] = {
    val n = pts.length
    val kk = math.min(k, n)
    val stride = math.max(n / kk, 1)
    val cents = Array.tabulate(kk)(c => pts((c * stride) % n).clone())
    val assign = new Array[Int](n)
    var it = 0
    while (it < iters) {
      var i = 0
      while (i < n) {
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < kk) {
          var d = 0.0
          var j = 0
          val cent = cents(c)
          while (j < cent.length) { val t = pts(i)(j) - cent(j); d += t * t; j += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        assign(i) = best
        i += 1
      }
      val sums = Array.fill(kk)(new Array[Double](pts(0).length))
      val counts = new Array[Int](kk)
      i = 0
      while (i < n) {
        val c = assign(i)
        counts(c) += 1
        var j = 0
        while (j < pts(i).length) { sums(c)(j) += pts(i)(j); j += 1 }
        i += 1
      }
      var c = 0
      while (c < kk) {
        if (counts(c) > 0) {
          var j = 0
          while (j < sums(c).length) { cents(c)(j) = sums(c)(j) / counts(c); j += 1 }
        }
        c += 1
      }
      it += 1
    }
    cents
  }

  /** Hard cap on the driver-side OPQ training sample — the same
    * bounded-sample policy as FAISS's `OPQMatrix` (which subsamples its
    * training set to a fixed cap; rotation quality saturates well below
    * it). Driver memory is the binding constraint: the loop holds X, Y
    * and Ŷ as n×d doubles, ≈ 3·n·d·8 bytes + k-means temporaries — at the
    * cap with d=1024 that is ≈ 1.6 GiB, comfortably inside the 16 GiB
    * driver heap; the d×d SVD is trivial. Everything downstream (rotate,
    * encode, search) is distributed.
    */
  val MaxTrain = 65536

  /** Learn the OPQ rotation on the deterministic id-prefix sample.
    * Returns the d×d orthogonal matrix R (row-major; apply as y = R·x).
    */
  def trainRotation(base: DataFrame, m: Int, ksub: Int, ntrain: Int,
                    iters: Int = 8, seed: Long = 42L,
                    vecCol: String = "vec", idCol: String = "id"): Array[Array[Float]] = {
    require(ntrain <= MaxTrain,
      s"OPQ trains driver-side on a bounded sample: ntrain=$ntrain > $MaxTrain. " +
        "Rotation quality saturates with tens of thousands of points " +
        "(FAISS OPQMatrix applies the same cap); pass ntrain <= MaxTrain.")
    // id-prefix via range predicate (ids are dense positional, SURVEY §1.1):
    // pushes to the scan instead of a global TakeOrdered over every partition
    val x = Ivf.trainSample(base, ntrain, idCol)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val n = x.length
    require(n >= ksub,
      s"training sample has $n rows < ksub=$ksub: trainers contract on " +
        s"dense positional '$idCol' (SURVEY §1.1) — mint ids with " +
        "Ingest.withPositionalIds before indexing derived tables")
    val d = x(0).length
    require(d % m == 0, s"dim $d not divisible by m=$m")
    val dsub = d / m
    val xMat = DenseMatrix.tabulate(n, d)((i, j) => x(i)(j))
    var r = DenseMatrix.eye[Double](d)
    var it = 0
    while (it < iters) {
      val y = xMat * r // n × d rotated
      // refresh codebooks per subspace; reconstruct ŷ
      val yHat = DenseMatrix.zeros[Double](n, d)
      var s = 0
      while (s < m) {
        val sub = Array.tabulate(n)(i =>
          Array.tabulate(dsub)(j => y(i, s * dsub + j)))
        val cents = kmeansLocal(sub, ksub, iters = 10, seed + s)
        var i = 0
        while (i < n) {
          var best = 0
          var bestD = Double.MaxValue
          var c = 0
          while (c < cents.length) {
            var dd = 0.0
            var j = 0
            while (j < dsub) { val t = sub(i)(j) - cents(c)(j); dd += t * t; j += 1 }
            if (dd < bestD) { bestD = dd; best = c }
            c += 1
          }
          var j = 0
          while (j < dsub) { yHat(i, s * dsub + j) = cents(best)(j); j += 1 }
          i += 1
        }
        s += 1
      }
      // Procrustes: min_R ||X·R − Ŷ||_F  ⇒  R = U·Vᵀ of SVD(Xᵀ·Ŷ)
      val res = svd(xMat.t * yHat)
      r = res.U * res.Vt
      it += 1
    }
    // row-major float rotation applying as y = R·x: y_j = Σ_i x_i·R(i,j)
    // ⇒ kernel row j holds column j of r
    Array.tabulate(d)(j => Array.tabulate(d)(i => r(i, j).toFloat))
  }

  /** Rotate base + queries, then everything downstream is plain PQ. */
  def rotateTable(df: DataFrame, r: Array[Array[Float]],
                  vecCol: String): DataFrame =
    df.withColumn(vecCol, rotate(col(vecCol), r))

  private val rotCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Float]]]()

  /** Build-once cached rotation (training is DDL, like the IVF/PQ caches);
    * persisted on disk for cross-JVM reuse.
    */
  def trainRotationCached(cacheKey: String, base: => DataFrame, m: Int,
                          ksub: Int, ntrain: Int, iters: Int = 8,
                          seed: Long = 42L): Array[Array[Float]] = {
    // |t6 versions the codebook trainer (graft Lloyd; see Ivf.buildOrGet)
    val key = s"$cacheKey|$m|$ksub|$ntrain|$iters|$seed|t6"
    rotCache.computeIfAbsent(key, _ => {
      new java.io.File("target/opq_cache").mkdirs()
      val file = s"target/opq_cache/${Ivf.cacheDigest(key)}.rot.bin"
      Ivf.loadMatrix(file).getOrElse {
        val r = trainRotation(base, m, ksub, ntrain, iters, seed)
        Ivf.saveMatrix(file, r)
        r
      }
    })
  }
}
