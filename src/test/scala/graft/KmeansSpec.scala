package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession
import graft.ops.Kmeans

/** The fused-SIMD Lloyd trainer behind Ivf.train (see Kmeans's Scaladoc):
  * run-to-run determinism (the property the seeded index oracles contract
  * on), no empty clusters after the FAISS-style re-seed, the norm-bound
  * skip's exactness (same argmin as the unpruned rule), and k-means++
  * seeding beating a uniform draw on spread-sensitive data.
  */
class KmeansSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)

  private def synth(n: Int, dim: Int, seed: Long) = {
    import spark.implicits._
    val rng = new scala.util.Random(seed)
    val centers = Array.fill(8)(Array.fill(dim)(rng.nextFloat() * 4 - 2))
    (0 until n).map { i =>
      val c = centers(i % 8)
      c.map(x => x + (rng.nextFloat() - 0.5f) * 0.2f)
    }.toDF("vec")
  }

  test("fit is deterministic run-to-run (bitwise centroids)") {
    val df = synth(2000, 24, seed = 3)
    val a = Kmeans.fit(df, k = 16, seed = 7L, maxIter = 5)
    val b = Kmeans.fit(df, k = 16, seed = 7L, maxIter = 5)
    assert(a.length == 16 && b.length == 16)
    a.zip(b).foreach { case (ca, cb) =>
      assert(ca.sameElements(cb), "same seed+input must give bitwise-equal centroids")
    }
    val c = Kmeans.fit(df, k = 16, seed = 8L, maxIter = 5)
    assert(!a.zip(c).forall { case (x, y) => x.sameElements(y) },
      "different seed should draw a different init")
  }

  test("clusters the planted mixture: low quantization error, no empties") {
    import spark.implicits._
    val df = synth(4000, 24, seed = 5).cache()
    val cents = Kmeans.fit(df, k = 8, seed = 42L, maxIter = 10)
    val rows = df.as[Array[Float]].collect()
    val assign = rows.map { v =>
      cents.zipWithIndex.minBy { case (c, _) =>
        graft.functions.expressions.VectorKernels.l2Sq(v, c) }._2
    }
    assert(assign.distinct.length == 8, "an empty cluster survived training")
    val mse = rows.zip(assign).map { case (v, a) =>
      graft.functions.expressions.VectorKernels.l2Sq(v, cents(a)) }.sum / rows.length
    // planted noise is U(-0.1, 0.1)^24: per-dim var 0.1^2/3 → mse ≈ 0.08.
    // A collapsed/degenerate fit reads the between-center variance (≈ 4².)
    assert(mse < 0.2, s"quantization error $mse says the mixture was not recovered")
  }

  test("distributed large-k path (k >= 256) is deterministic and covers all clusters") {
    import spark.implicits._
    // n > 16384 forces the distributed Lloyd; k = 256 takes the
    // content-hash uniform init — the exact path the 1M nlist=1024 build runs
    val rng = new scala.util.Random(11)
    val df = (0 until 20000).map(_ => Array.fill(12)(rng.nextFloat())).toDF("vec").cache()
    val a = Kmeans.fit(df, k = 256, seed = 5L, maxIter = 3)
    val b = Kmeans.fit(df, k = 256, seed = 5L, maxIter = 3)
    assert(a.zip(b).forall { case (x, y) => x.sameElements(y) },
      "distributed path not deterministic run-to-run")
    assert(a.length == 256 && a.forall(_ != null))
    df.unpersist()
  }

  test("two-level combine path (> 8 sample partitions) is deterministic run-to-run") {
    import spark.implicits._
    // > combineGroupSize partitions forces the executor-side group fold;
    // k >= 256 + n > 16384 forces the distributed Lloyd. The association
    // tree is a pure function of the partition layout, so two runs over
    // the SAME layout must be bitwise identical.
    val rng = new scala.util.Random(23)
    val df = (0 until 20000).map(_ => Array.fill(12)(rng.nextFloat()))
      .toDF("vec").repartition(20).cache()
    df.count()
    val a = Kmeans.fit(df, k = 256, seed = 5L, maxIter = 3)
    val b = Kmeans.fit(df, k = 256, seed = 5L, maxIter = 3)
    assert(a.zip(b).forall { case (x, y) => x.sameElements(y) },
      "two-level combine not deterministic run-to-run")
    assert(a.length == 256 && a.forall(_ != null))
    df.unpersist()
  }

  test("mirrored combine == distributed combine, bitwise (flat and two-level)") {
    import spark.implicits._
    // The r11 mirrored combine ships assignments and rebuilds partials on
    // the driver through the distributed combine's exact association tree
    // — so forcing the mirror OFF must reproduce bitwise-identical
    // centroids, on BOTH the flat (<= 8 partitions) and the two-level
    // (> 8 partitions) fold shapes.
    val rng = new scala.util.Random(31)
    val df = (0 until 20000).map(_ => Array.fill(12)(rng.nextFloat()))
      .toDF("vec").cache()
    df.count()
    def run(parts: Int): (Array[Array[Float]], Array[Array[Float]]) = {
      // maxParts drives the internal content-hash layout, so it selects
      // the fold shape: <= 8 exercises the flat tree, > 8 the two-level
      val mirrored = Kmeans.fit(df, k = 256, seed = 5L, maxIter = 3, maxParts = parts)
      System.setProperty("graft.kmeans.mirror", "false")
      val distributed =
        try Kmeans.fit(df, k = 256, seed = 5L, maxIter = 3, maxParts = parts)
        finally System.clearProperty("graft.kmeans.mirror")
      (mirrored, distributed)
    }
    for (parts <- Seq(4, 20)) {
      val (m, d) = run(parts)
      assert(m.zip(d).forall { case (x, y) => x.sameElements(y) },
        s"mirrored combine diverged from the distributed combine at maxParts=$parts")
    }
    df.unpersist()
  }

  test("Hamerly skip path == full-rescan trainer, bitwise (many iterations)") {
    import spark.implicits._
    // The skip test (u < l after directed-rounding adjustments) certifies
    // a strictly-unique argmin, so assignments — and the folded centroids —
    // must be BITWISE identical to the trainer that rescans every point
    // every iteration. Planted mixture + exact duplicate points keep
    // near-tie pressure on the bounds; maxIter high enough that late
    // iterations are dominated by skips (the path under test).
    val rng = new scala.util.Random(47)
    val centers = Array.fill(24)(Array.fill(16)(rng.nextFloat() * 4 - 2))
    val pts = (0 until 24000).map { i =>
      val c = centers(i % 24)
      if (i % 7 == 0) c.clone() // exact duplicates: tie pressure
      else c.map(x => x + (rng.nextFloat() - 0.5f) * 0.3f)
    }
    val df = pts.toDF("vec").cache()
    df.count()
    val fast = Kmeans.fit(df, k = 256, seed = 11L, maxIter = 12)
    System.setProperty("graft.kmeans.hamerly", "false")
    val slow =
      try Kmeans.fit(df, k = 256, seed = 11L, maxIter = 12)
      finally System.clearProperty("graft.kmeans.hamerly")
    assert(fast.zip(slow).forall { case (x, y) => x.sameElements(y) },
      "Hamerly-skip trainer diverged from the full-rescan trainer")
    df.unpersist()
  }

  test("assignment-stability early stop == full trainer at the stop " +
    "iteration, bitwise; off by default") {
    import spark.implicits._
    // n > 16384 + k = 256 forces the distributed Lloyd (the mirrored
    // path, where the stability counter lives). stableFrac=0.5 fires as
    // soon as under half the sample changes assignment — early, so the
    // gate exercises a genuine mid-run stop.
    val df = synth(20000, 24, seed = 9)
    val stopped = Kmeans.fit(df, k = 256, seed = 5L, maxIter = 12,
      stableFrac = 0.5)
    val iters = Kmeans.lastRunIters.get()
    assert(iters > 0 && iters < 12, s"early stop never fired (iters=$iters)")
    // stopping must be the ONLY difference: the full trainer capped at
    // the same iteration count produces bitwise-identical centroids
    val capped = Kmeans.fit(df, k = 256, seed = 5L, maxIter = iters)
    assert(stopped.length == capped.length)
    assert(stopped.zip(capped).forall { case (x, y) => x.sameElements(y) },
      "early-stopped centroids diverge from the iteration-capped trainer")
    // and stableFrac=0 (the default) keeps running past the stability
    // point (it can still stop on the movement tol, which is unchanged)
    val full = Kmeans.fit(df, k = 256, seed = 5L, maxIter = 12)
    assert(Kmeans.lastRunIters.get() >= iters,
      "default run stopped before the stability point")
    assert(full.length == 256)
  }

  test("k-means++ seeding spreads over a uniform draw (planted far cluster)") {
    // 31 tight points + 1 far outlier cluster: uniform seeding misses the
    // outlier with high probability; D² seeding must pick it
    val pts = Array.fill(31)(Array.fill(8)(0.0f + util.Random.nextFloat() * 0.01f)) :+
      Array.fill(8)(50.0f)
    val picked = Kmeans.kmeansPlusPlus(pts, k = 2, seed = 1L)
    assert(picked.exists(_.exists(_ > 25f)),
      "k-means++ failed to seed the distant mass")
  }
}
