package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.GraftSession
import graft.functions.expressions.{CentroidOps, Simd, VectorKernels}

/** Scratch: driver-side dissection of the k-means assignment cost at the
  * nlist=4096 operating point — how many kernel evals does the norm-bound
  * window actually admit on the lowRank-8 corpus, and where does the
  * per-point time go (window size vs per-candidate overhead)? Informs
  * whether the next train-path lever is tighter pruning (triangle-
  * inequality / center-movement bounds) or a faster kernel (float-acc
  * screening).
  */
object MicroArgmin {
  def main(args: Array[String]): Unit = {
    val k = args.lift(0).map(_.toInt).getOrElse(4096)
    val nPts = args.lift(1).map(_.toInt).getOrElse(20000)
    val spark: SparkSession = GraftSession.configure(
      SparkSession.builder().master("local[32]"), shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val base = spark.read.parquet("target/scale_vectors_1000000_384_lr8")
    val pts = base.filter(col("id") < nPts).orderBy("id")
      .select("vec").as[Array[Float]].collect()
    // init draw ~ what hashDraw picks: k sample vectors (content-hash order
    // is as good as random for this diagnostic)
    val cents = base.filter(col("id") >= 500000L && col("id") < 500000L + k)
      .orderBy("id").select("vec").as[Array[Float]].collect()
    spark.stop()
    println(s"[micro] pts=${pts.length} cents=${cents.length} dim=${pts(0).length}")

    val norms = cents.map(VectorKernels.norm2)
    val order = Array.range(0, k).sortBy(c => (norms(c), c))
    val sortedNorms = order.map(norms)
    println(f"[micro] centroid norm range: ${sortedNorms.head}%.4f .. ${sortedNorms.last}%.4f")

    def best3(f: () => Unit): Double = {
      f() // warmup: JIT
      (1 to 3).map { _ =>
        val t = System.nanoTime(); f(); (System.nanoTime() - t) / 1e9
      }.min
    }

    // (a) evals admitted by the DYNAMIC window (replicates argminNormOrdered
    // with a counter, untiled)
    var evals = 0L
    val t0 = System.nanoTime()
    pts.foreach { x =>
      val xn = VectorKernels.norm2(x)
      var lo = 0; var hi = k
      while (lo < hi) { val mid = (lo + hi) >>> 1; if (sortedNorms(mid) < xn) lo = mid + 1 else hi = mid }
      var down = lo - 1; var up = lo
      var downDone = down < 0; var upDone = up >= k
      var best = Int.MaxValue; var bestD = Double.MaxValue
      while (!downDone || !upDone) {
        val takeDown = !downDone && (upDone || xn - sortedNorms(down) <= sortedNorms(up) - xn)
        val pos = if (takeDown) down else up
        val gap = xn - sortedNorms(pos)
        if (gap * gap * CentroidOps.PruneSlack < bestD) {
          val c = order(pos)
          val d = VectorKernels.l2Sq(x, cents(c))
          evals += 1
          if (d < bestD || (d == bestD && c < best)) { bestD = d; best = c }
          if (takeDown) { down -= 1; downDone = down < 0 } else { up += 1; upDone = up >= k }
        } else if (takeDown) downDone = true else upDone = true
      }
    }
    val dynSec = (System.nanoTime() - t0) / 1e9
    println(f"[micro] dynamic-window untiled: ${evals.toDouble / pts.length}%.1f evals/pt of $k, ${dynSec}%.2f s (${dynSec / pts.length * 1e6}%.1f us/pt)")

    // (b) the shipped tiled argmin, wall only (best of 3, warmed)
    var sink = 0
    val tiledSec = best3(() =>
      pts.foreach { x => sink ^= CentroidOps.argminNormOrdered(x, cents, order, sortedNorms) })
    println(f"[micro] tiled argmin: ${tiledSec}%.2f s (${tiledSec / pts.length * 1e6}%.1f us/pt) sink=$sink")

    // (b2) the screened (GEMM-shaped) argmin — float-dot screen + exact
    // shortlist; this is what argminL2F dispatches to at k >= 128
    val scrSec = best3(() => pts.foreach { x => sink ^= CentroidOps.argminL2F(x, cents) })
    println(f"[micro] screened argmin: ${scrSec}%.2f s (${scrSec / pts.length * 1e6}%.1f us/pt) sink=$sink")

    // (b3) the BATCHED screened assign (blocked over points × centroid
    // chunks — the FAISS GEMM shape; per-point L3 traffic /16)
    val outB = new Array[Int](pts.length)
    val batSec = best3(() => CentroidOps.assignBatch(pts, pts.length, cents, outB))
    println(f"[micro] batched screened assign: ${batSec}%.2f s (${batSec / pts.length * 1e6}%.1f us/pt)")

    // (b4) PARALLEL batched screened assign: same work split across T
    // threads over disjoint point slices — isolates the shared-resource
    // wall (L3/RAM bandwidth on the broadcast centroid matrix, allocator,
    // frequency throttle) from single-thread kernel speed. Perfect scaling
    // would match (b3)/T.
    for (t <- Seq(8, 16, 32)) {
      val per = (pts.length + t - 1) / t
      val outP = new Array[Int](pts.length)
      def runPar(): Unit = {
        val threads = (0 until t).map { ti =>
          val lo = ti * per
          val hi = math.min(lo + per, pts.length)
          new Thread(() => {
            if (hi > lo) {
              val slice = java.util.Arrays.copyOfRange(
                pts.asInstanceOf[Array[AnyRef]], lo, hi).asInstanceOf[Array[Array[Float]]]
              val o = new Array[Int](hi - lo)
              CentroidOps.assignBatch(slice, hi - lo, cents, o)
              System.arraycopy(o, 0, outP, lo, hi - lo)
            }
          })
        }
        threads.foreach(_.start())
        threads.foreach(_.join())
      }
      val parSec = best3(() => runPar())
      println(f"[micro] parallel($t) batched assign: ${parSec}%.2f s (${parSec / pts.length * 1e6}%.2f us/pt, scaling ${batSec / parSec}%.1fx of ${t}x)")
      require(java.util.Arrays.equals(outP, outB), "parallel assign diverged")
    }

    // (c) legacy index-order bounded scan (1 rep — slow and already known)
    val t2 = System.nanoTime()
    pts.foreach { x => sink ^= CentroidOps.argminL2Direct(x, cents, norms) }
    val legacySec = (System.nanoTime() - t2) / 1e9
    println(f"[micro] legacy bounded scan: ${legacySec}%.2f s (${legacySec / pts.length * 1e6}%.1f us/pt)")

    // (d) raw kernel ceiling: exhaustive tiled evals, no pruning
    val nProbe = math.min(2000, pts.length)
    val out = new Array[Double](4)
    val t3 = System.nanoTime()
    var p = 0
    while (p < nProbe) {
      val x = pts(p)
      var c = 0
      while (c + 4 <= k) { Simd.l2Sq4At(x, cents, c, c + 1, c + 2, c + 3, 384, out); c += 4 }
      p += 1
    }
    val exSec = (System.nanoTime() - t3) / 1e9
    println(f"[micro] exhaustive tiled: ${exSec / nProbe * 1e6}%.1f us/pt ($k evals/pt)")
    println(f"[micro] implied kernel: ${exSec / nProbe / k * 1e9}%.1f ns/eval")
  }
}
