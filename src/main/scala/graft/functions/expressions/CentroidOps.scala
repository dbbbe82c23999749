package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Centroid assignment kernels for the IVF index
  * (`/root/reference/apps/nvdb_ivf_build.cpp:69-92` assignment;
  * `apps/nvdb_ivf_eval.cpp:403-489` probe).
  *
  * The centroid table is tiny (nlist × dim floats) and rides into codegen
  * as a reference object — every executor scans rows against an in-memory
  * centroid matrix, no join, no shuffle. This is the Spark analogue of
  * FAISS's coarse quantizer living in RAM next to the scan.
  */
object CentroidOps {

  /** Per-matrix centroid norms, keyed by the broadcast reference object's
    * identity (same pattern as BatchScore's query-norm cache): weak keys
    * die with the codegen reference, a PER-THREAD last-entry pair serves
    * the hot loop without a lock (and without cross-job ping-pong when two
    * scans use different matrices), and a benign race recomputes
    * bitwise-equal doubles.
    */
  private val normCache = new java.util.WeakHashMap[Array[Array[Float]], Array[Double]]()
  private val normLast =
    new ThreadLocal[(Array[Array[Float]], Array[Double])]()
  private def normsOf(cs: Array[Array[Float]]): Array[Double] = {
    val last = normLast.get()
    if (last != null && (last._1 eq cs)) return last._2
    val n = normCache.synchronized {
      var got = normCache.get(cs)
      if (got == null) {
        got = cs.map(VectorKernels.norm2)
        normCache.put(cs, got)
      }
      got
    }
    normLast.set((cs, n))
    n
  }

  /** Relative slack on the norm-bound prune: the bound ‖x−c‖ ≥ |‖x‖−‖c‖|
    * is exact in real arithmetic but checked with ROUNDED norms (SIMD
    * sumSq + sqrt), so a degenerate near-collinear near-tie could see the
    * computed gap² land a few ulps above bestDist while the full kernel
    * would have come in just under it. Shrinking gap² by 1e-9 relative
    * covers every realistic rounding of the two norms (error ~1e-15
    * relative each) at zero measurable pruning cost; the same constant is
    * used by `Kmeans.nearestBounded` so train/serve assignment stays
    * consistent. A wrong skip would now need the norm-difference
    * cancellation to lose >1e-9 relative — only possible when an
    * almost-exact duplicate centroid is simultaneously within ~1e-9
    * relative of the pruned one's norm gap, i.e. far beyond any float
    * input this engine can represent distinctly.
    */
  final val PruneSlack = 1.0 - 1e-9

  /** Index of the L2-nearest centroid, with the norm lower-bound skip
    * (‖x−c‖ ≥ |‖x‖−‖c‖|): a centroid whose norm gap already exceeds the
    * best distance so far cannot win the argmin, so the skip does not
    * change the assignment (up to the [[PruneSlack]]-covered FP caveat) —
    * it only cuts the kernel evals ~8× on clusterable data (the
    * 1M×nlist=1024 assign pass measured 15.7 s without it; the same bound
    * inside `Kmeans` cut its iteration 8×). Ties keep the lowest index
    * via strict `<`, matching `Kmeans`'s training-time rule.
    */
  def argminL2(v: ArrayData, centroids: Array[Array[Float]]): Int = {
    val x = v.toFloatArray()
    val norms = normsOf(centroids)
    val xn = VectorKernels.norm2(x)
    var best = 0
    var bestDist = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val gap = xn - norms(c)
      if (gap * gap * PruneSlack < bestDist) {
        val d = VectorKernels.l2Sq(x, centroids(c))
        if (d < bestDist) { bestDist = d; best = c }
      }
      c += 1
    }
    best
  }

  /** ids of the `nprobe` L2-nearest centroids, nearest first */
  def topNprobe(v: ArrayData, centroids: Array[Array[Float]], nprobe: Int): ArrayData = {
    val x = v.toFloatArray()
    val n = centroids.length
    val k = math.min(nprobe, n)
    val dist = new Array[Double](n)
    var c = 0
    while (c < n) { dist(c) = VectorKernels.l2Sq(x, centroids(c)); c += 1 }
    // selection of k smallest (k and n are both small: nlist <= few thousand)
    val picked = new Array[Int](k)
    val used = new Array[Boolean](n)
    var j = 0
    while (j < k) {
      var best = -1
      var bestDist = Double.MaxValue
      var i = 0
      while (i < n) {
        if (!used(i) && dist(i) < bestDist) { bestDist = dist(i); best = i }
        i += 1
      }
      used(best) = true
      picked(j) = best
      j += 1
    }
    new GenericArrayData(picked)
  }
}

/** `nearest_centroid(vec)`: id of the closest centroid (cluster assign). */
case class NearestCentroid(child: Expression, centroids: Array[Array[Float]])
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = IntegerType
  override def nullSafeEval(v: Any): Any =
    CentroidOps.argminL2(v.asInstanceOf[ArrayData], centroids)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, "float[][]")
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.expressions.CentroidOps.argminL2($v, $ref)")
  }
  override def prettyName: String = "nearest_centroid"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `nearest_centroids(vec, nprobe)`: the nprobe closest centroid ids. */
case class NearestCentroids(child: Expression, centroids: Array[Array[Float]], nprobe: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    CentroidOps.topNprobe(v.asInstanceOf[ArrayData], centroids, nprobe)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, "float[][]")
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.expressions.CentroidOps.topNprobe($v, $ref, $nprobe)")
  }
  override def prettyName: String = "nearest_centroids"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
