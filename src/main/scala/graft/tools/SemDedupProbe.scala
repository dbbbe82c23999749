package graft.tools

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Ivf}

/** One-off: SemDeDup cost/shape at 200k×384d over the cached 1M corpus
  * and 1024-cluster quantizer (tau sensitivity + candidate volume).
  */
object SemDedupProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val base = spark.read.parquet("target/scale_vectors_1000000_384_lr8")
    val idx = Ivf.buildOrGet(spark, base, "annscale_1000000_lr8",
      nlist = 1024, ntrain = 200000)
    val sub = base.filter(col("id") < 200000)
      .select(col("id").as("vec_id"), col("vec").as("embedding"))
    val nCand = Ivf.assign(sub, idx.centroids, "embedding")
      .groupBy("cluster_id").count()
      .agg(sum(col("count") * (col("count") - 1) / 2).cast("long"))
      .head().getLong(0)
    println(f"[semprobe] pairs_checked=$nCand  all_pairs_ratio=${nCand / (200000.0 * 199999 / 2)}%.6f")
    for (tau <- args.map(_.toDouble).toSeq match {
      case s if s.nonEmpty => s
      case _ => Seq(0.99)
    }) {
      val t0 = System.nanoTime()
      val nPairs = Dedup.semanticCandidates(sub, idx.centroids)
        .filter(col("cos") >= tau).count()
      val tCand = (System.nanoTime() - t0) / 1e9
      println(f"[semprobe] tau=$tau  dup_pairs=$nPairs  cand_stage=$tCand%.1f s")
      if (nPairs < 5000000) {
        val t1 = System.nanoTime()
        val dropped = Dedup.semanticDedup(sub, idx.centroids, tau)
          .filter(!col("keep")).count()
        println(f"[semprobe] tau=$tau  n_dropped=$dropped  full_op=${(System.nanoTime() - t1) / 1e9}%.1f s")
      } else println(s"[semprobe] tau=$tau: dup graph too large, skipping CC")
    }
    spark.stop()
  }
}
