package graft.tools

import org.apache.spark.sql.functions._

import graft.ops.{Metric, Opq, Pq, Search}

/** Refine-budget frontier sweep for the IVF-fastscan operating point
  * (r12 verdict task #1): the r11 `ann_pq4_ivf_probe_np{4,8,16,32}` points
  * saturate at recall 0.95 with refineK fixed at 50, while the reference's
  * PQ+Refine headline reads 0.9743 @ R=50 and 0.9758 @ R=100
  * (`/root/reference/Performance.md:623,708-711`). This sweeps
  * refineK × nprobe on [[Pq.searchFastScanIvfRefined]] over the cached 1M
  * BenchScale corpus, and optionally the OPQ-rotated composition
  * (FAISS `IndexIVFPQFastScan` + `OPQMatrix`) to see whether the 4-bit
  * codebook ceiling — not the refine budget — binds.
  *
  * Usage: runMain graft.tools.RefineTune [opq]
  */
object RefineTune {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val annN = 1000000L
    val dim = 384
    val k = 10
    val base = spark.read.parquet(s"target/scale_vectors_${annN}_${dim}_lr8")
    val queries = base.filter(col("id") < 16)
      .select(col("id").as("qid"), col("vec").as("qvec")).cache()
    queries.count()
    val gt = Search.groundTruth(base, queries, k, Metric.Dot).cache()
    gt.count()
    def recallOf(pred: org.apache.spark.sql.DataFrame): Double =
      graft.ops.Ivf.meanRecall(pred, gt, k).collect()(0).getDouble(0)

    def sweep(tag: String, b: org.apache.spark.sql.DataFrame,
              qs: org.apache.spark.sql.DataFrame, idx: Pq.Index): Unit = {
      for (np <- Seq(8, 16); rk <- Seq(50, 100, 200, 400)) {
        Pq.releaseBroadcasts()
        val warm = Pq.searchFastScanIvfRefined(b, idx, qs, np, k, rk)
        warm.count() // warm run: plan + JIT
        val t0 = System.nanoTime()
        val pred = Pq.searchFastScanIvfRefined(b, idx, qs, np, k, rk)
        val rows = pred.count()
        val sec = (System.nanoTime() - t0) / 1e9
        val rec = recallOf(pred)
        println(f"[tune] $tag np=$np%3d rk=$rk%4d  recall=$rec%.4f  sec=$sec%6.3f  rows=$rows")
      }
    }

    val idx = Pq.buildOrGetIvf4(spark, base, s"annscale_${annN}_lr8",
      nlist = 1024, m4 = dim / 4, ntrain = 200000)
    sweep("pq4     ", base, queries, idx)

    if (args.contains("opq")) {
      // OPQ-rotated composition: rotate base+queries with the learned
      // orthogonal R, then the whole IVF+pq4 pipeline runs in rotated
      // space. Orthogonal invariance keeps L2/dot rankings identical, so
      // recall vs the unrotated GT is well-defined on ids.
      val rot = Opq.trainRotationCached(s"annscale_${annN}_lr8|pq4opq",
        base, m = dim / 4, ksub = 16, ntrain = 65536)
      val rotPath = s"target/scale_vectors_${annN}_${dim}_lr8_opq4"
      if (!new java.io.File(s"$rotPath/_SUCCESS").isFile)
        Opq.rotateTable(base, rot, "vec").write.mode("overwrite").parquet(rotPath)
      val rotBase = spark.read.parquet(rotPath)
      val rotQs = queries.select(col("qid"), Opq.rotate(col("qvec"), rot).as("qvec")).cache()
      rotQs.count()
      val idxO = Pq.buildOrGetIvf4(spark, rotBase, s"annscale_${annN}_lr8|opq",
        nlist = 1024, m4 = dim / 4, ntrain = 200000)
      sweep("pq4+opq ", rotBase, rotQs, idxO)
    }
    spark.stop()
  }
}
