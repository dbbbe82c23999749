package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.expressions.VectorKernels

/** Deterministic distributed Lloyd's k-means over float vectors — the
  * coarse-quantizer trainer behind [[Ivf.train]].
  *
  * Why not MLlib: the r7/r8 builds measured MLlib KMeans at 327–443 s for
  * the BENCH_SCALE operating point (200k × 384d × nlist=1024) against the
  * reference's 13.9 s FAISS train at nlist=4096 (`Performance.md:578-579`).
  * The gap is not the math — one Lloyd iteration here is 200k×1024 SIMD
  * L2 evals ≈ 157 GFLOP — it is MLlib's per-row Vector boxing and
  * generic-aggregation plumbing. This trainer is the Spark shape the task
  * actually wants: the bounded sample is cached once, every iteration is
  * ONE `mapPartitions` pass that fuses assignment (SIMD
  * [[VectorKernels.l2Sq]], the same kernel the probe scan runs) with the
  * per-cluster sum/count accumulation, and the per-partition partials are
  * combined on the driver in PARTITION ORDER so the float reduction is
  * deterministic run-to-run — the property every seeded oracle build
  * (a1/a6/a7/a9) contracts on. FAISS's own clustering policy is kept:
  * bounded iterations, seeded sample init, empty clusters re-seeded by
  * splitting the largest (`faiss/Clustering.cpp` semantics, re-expressed).
  *
  * Scale shape: cost is sample-bound (corpus-independent — [[Ivf.train]]
  * caps the sample at nlist × maxPointsPerCentroid like FAISS), and the
  * sample is coalesced to ≤ `maxParts` partitions so the driver-side
  * ordered combine moves ≤ maxParts × k × dim × 8 B per iteration —
  * bounded regardless of cluster size. Per-iteration partials beat a
  * treeAggregate here precisely because tree combine order is
  * scheduling-dependent, which would break run-to-run determinism.
  */
object Kmeans {

  /** Train `k` centroids on `sample`'s `vecCol`. Returns k × dim floats.
    *
    * Init: k ≥ 256 seeds from a seeded content-hash draw (FAISS's
    * uniform-init economics — at large k the spread advantage of
    * k-means++ is negligible but its O(k²·d) cost is not); smaller k runs
    * driver-side k-means++ with 4 FAISS-nredo-style restarts on a seeded
    * subsample, keeping the lowest-quantization-error seeding — spread
    * that measurably lifts probe recall on tiny fixtures.
    *
    * Determinism: the init draw orders by a seeded hash of vector
    * CONTENT, so it is independent of partition layout entirely; the
    * Lloyd sums depend on layout only through the partition-ordered
    * combine, which is fixed given a fixed input layout and config. Same
    * contract as the seeded HNSW build.
    */
  def fit(sample: DataFrame, k: Int, seed: Long, maxIter: Int = 25,
          tol: Double = 1e-4, vecCol: String = "vec",
          maxParts: Int = 64): Array[Array[Float]] = {
    val spark = sample.sparkSession
    import spark.implicits._
    val rdd0 = sample.select(col(vecCol)).as[Array[Float]].rdd
    val rdd = rdd0.coalesce(math.min(maxParts, math.max(1, rdd0.getNumPartitions)))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val n = rdd.count()
      require(n >= k, s"k-means sample has $n rows < k=$k")
      val dim = rdd.first().length

      // Init draw by smallest seeded CONTENT hash — a TakeOrdered over the
      // sample (driver-bounded at subN rows), NOT rdd.takeSample, whose
      // draw depends on the partition layout: a layout change (different
      // session defaults, file split planning) would silently reseed the
      // quantizer, and fixture-sized corpora are threshold-sensitive to
      // that luck (measured ±0.04 probe recall across draws at n=500).
      def hashDraw(m: Int): Array[Array[Float]] =
        sample.select(col(vecCol))
          .orderBy(xxhash64(col(vecCol), lit(seed)))
          .limit(m).as[Array[Float]].collect()
          // 64-bit content hashes only collide for duplicate vectors,
          // whose relative order is value-irrelevant — no tie-break needed

      // Small problems (every sf-fixture index, and any sub-codebook on a
      // modest sample) run ENTIRELY on the driver with FAISS's nredo
      // semantics — full Lloyd from 4 k-means++ seedings, keep the
      // lowest-quantization-error run. A single shot is one local optimum
      // whose quality swings ±0.05 probe recall with the init draw on a
      // 500-row fixture; best-of-4 restarts removes that luck for the
      // price of milliseconds at this size.
      if (k < 256 && n <= 16384)
        // content-hash sort: the collected order (and with it the ++ draw)
        // must not depend on the partition layout either
        return localFit(rdd.collect().sortBy(contentHash64),
          k, dim, seed, maxIter, tol, nredo = 4)

      var cents: Array[Array[Float]] =
        if (k >= 256) hashDraw(k)
        else
          // distributed mid-size path: k-means++ spread on a bounded
          // driver subsample seeds ONE distributed Lloyd run
          kmeansPlusPlus(
            hashDraw(math.min(n, math.max(k.toLong * 40, 4096L)).toInt), k, seed)

      var iter = 0
      var moved = Double.MaxValue
      while (iter < maxIter && moved > tol) {
        val tIter = System.nanoTime()
        val bc = spark.sparkContext.broadcast(cents)
        val partials = rdd
          .mapPartitionsWithIndex { (pid, it) =>
            val cs = bc.value
            // norm lower bound (MLlib's findClosest pruning): for L2,
            // ‖x−c‖ ≥ |‖x‖−‖c‖|, so a centroid whose norm gap already
            // exceeds the best-so-far distance needs no full kernel eval.
            // On clusterable data this skips MOST of the k evals — the
            // difference between 13 s and ~2 s per iteration at
            // 200k×384d×k=1024.
            val cnorms = cs.map(VectorKernels.norm2)
            val sums = new Array[Double](k * dim)
            val counts = new Array[Long](k)
            it.foreach { v =>
              val c = nearestBounded(v, cs, cnorms)
              counts(c) += 1
              var i = 0
              val off = c * dim
              while (i < dim) { sums(off + i) += v(i); i += 1 }
            }
            Iterator.single((pid, sums, counts))
          }
          .collect()
          .sortBy(_._1) // partition-ordered combine: deterministic floats
        val sums = new Array[Double](k * dim)
        val counts = new Array[Long](k)
        partials.foreach { case (_, s, c) =>
          var i = 0
          while (i < sums.length) { sums(i) += s(i); i += 1 }
          var j = 0
          while (j < k) { counts(j) += c(j); j += 1 }
        }
        bc.destroy()
        val next = Array.tabulate(k) { c =>
          if (counts(c) == 0L) null // re-seeded below
          else {
            val off = c * dim
            Array.tabulate(dim)(i => (sums(off + i) / counts(c)).toFloat)
          }
        }
        reseedEmpties(next, counts, seed + iter)
        moved = 0.0
        var c = 0
        while (c < k) {
          val d = math.sqrt(VectorKernels.l2Sq(cents(c), next(c)))
          if (d > moved) moved = d
          c += 1
        }
        cents = next
        iter += 1
        if (verbose) println(
          f"[kmeans] iter $iter%2d  ${(System.nanoTime() - tIter) / 1e9}%6.2f s  max_move=$moved%.6f")
      }
      cents
    } finally rdd.unpersist(blocking = false)
  }

  private val verbose = java.lang.Boolean.getBoolean("graft.kmeans.log")

  /** FNV-1a over the float bit patterns — a driver-side stand-in for the
    * seeded xxhash64 content draw, used only to fix the local-path point
    * order independently of partition layout.
    */
  private def contentHash64(v: Array[Float]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < v.length) {
      var b = java.lang.Float.floatToRawIntBits(v(i)).toLong & 0xffffffffL
      var j = 0
      while (j < 4) { h ^= b & 0xff; h *= 0x100000001b3L; b >>>= 8; j += 1 }
      i += 1
    }
    h
  }

  /** Driver-local Lloyd with FAISS-nredo restarts for small samples: full
    * k-means from `nredo` k-means++ seedings, keeping the run with the
    * lowest total quantization error. Same assignment rule, empty-cluster
    * policy, and tol stop as the distributed path.
    */
  private[graft] def localFit(pts: Array[Array[Float]], k: Int, dim: Int,
                              seed: Long, maxIter: Int, tol: Double,
                              nredo: Int): Array[Array[Float]] = {
    var bestErr = Double.MaxValue
    var best: Array[Array[Float]] = null
    var r = 0
    while (r < nredo) {
      var cents = kmeansPlusPlus(pts, k, seed + r * 7919L)
      var iter = 0
      var moved = Double.MaxValue
      val sums = new Array[Double](k * dim)
      val counts = new Array[Long](k)
      while (iter < maxIter && moved > tol) {
        java.util.Arrays.fill(sums, 0.0)
        java.util.Arrays.fill(counts, 0L)
        val cnorms = cents.map(VectorKernels.norm2)
        pts.foreach { v =>
          val c = nearestBounded(v, cents, cnorms)
          counts(c) += 1
          val off = c * dim
          var i = 0
          while (i < dim) { sums(off + i) += v(i); i += 1 }
        }
        val next = Array.tabulate(k) { c =>
          if (counts(c) == 0L) null
          else {
            val off = c * dim
            Array.tabulate(dim)(i => (sums(off + i) / counts(c)).toFloat)
          }
        }
        reseedEmpties(next, counts, seed + iter)
        moved = 0.0
        var c = 0
        while (c < k) {
          val d = math.sqrt(VectorKernels.l2Sq(cents(c), next(c)))
          if (d > moved) moved = d
          c += 1
        }
        cents = next
        iter += 1
      }
      val cnorms = cents.map(VectorKernels.norm2)
      var err = 0.0
      pts.foreach { v =>
        err += VectorKernels.l2Sq(v, cents(nearestBounded(v, cents, cnorms)))
      }
      if (verbose) println(f"[kmeans] local redo $r err=$err%.4f")
      if (err < bestErr) { bestErr = err; best = cents }
      r += 1
    }
    best
  }

  /** Index of the L2-nearest centroid with the norm lower-bound skip.
    * Ties (including bound-ineligible exact ties) resolve to the lowest
    * index via strict `<`, the same rule as `CentroidOps.argminL2`, so
    * training-time and serving-time assignment can never disagree.
    */
  private def nearestBounded(v: Array[Float], cs: Array[Array[Float]],
                             cnorms: Array[Double]): Int = {
    val vn = VectorKernels.norm2(v)
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cs.length) {
      val gap = vn - cnorms(c)
      if (gap * gap < bestD) {
        val d = VectorKernels.l2Sq(v, cs(c))
        if (d < bestD) { bestD = d; best = c }
      }
      c += 1
    }
    best
  }

  /** FAISS `Clustering.cpp` empty-cluster policy, re-expressed: an empty
    * cluster re-seeds from the LARGEST cluster's centroid, nudged by a
    * seeded ±1e-3 relative perturbation so the pair separates on the next
    * assignment pass. Deterministic: largest-count tie-breaks to the
    * lowest index and the perturbation RNG is seeded per (seed, slot).
    */
  private def reseedEmpties(cents: Array[Array[Float]], counts: Array[Long],
                            seed: Long): Unit = {
    var c = 0
    while (c < cents.length) {
      if (cents(c) == null) {
        var big = 0
        var i = 1
        while (i < counts.length) { if (counts(i) > counts(big)) big = i; i += 1 }
        val src = cents(big)
        require(src != null, "k-means degenerate: every cluster empty")
        val rng = new scala.util.Random(seed ^ (c.toLong << 17))
        cents(c) = src.map(x => x * (1f + (rng.nextFloat() - 0.5f) * 2e-3f))
      }
      c += 1
    }
  }

  /** Driver-side k-means++ seeding (Arthur & Vassilvitskii 2007) over a
    * bounded subsample — O(k · |sub| · dim) with the SIMD kernel.
    */
  private[graft] def kmeansPlusPlus(sub: Array[Array[Float]], k: Int,
                                  seed: Long): Array[Array[Float]] = {
    require(sub.length >= k, s"k-means++ subsample ${sub.length} < k=$k")
    val rng = new scala.util.Random(seed)
    val picked = new Array[Array[Float]](k)
    picked(0) = sub(rng.nextInt(sub.length))
    val d2 = sub.map(v => VectorKernels.l2Sq(v, picked(0)))
    var c = 1
    while (c < k) {
      val total = d2.sum
      var pick = 0
      if (total > 0) {
        var r = rng.nextDouble() * total
        var i = 0
        while (i < sub.length && r >= d2(i)) { r -= d2(i); i += 1 }
        pick = math.min(i, sub.length - 1)
      } else pick = rng.nextInt(sub.length)
      picked(c) = sub(pick)
      var i = 0
      while (i < sub.length) {
        val d = VectorKernels.l2Sq(sub(i), picked(c))
        if (d < d2(i)) d2(i) = d
        i += 1
      }
      c += 1
    }
    picked
  }
}
