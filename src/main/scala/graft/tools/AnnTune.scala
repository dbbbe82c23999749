package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.GraftSession
import graft.ops.{Eval, Ivf, Metric, Search}

/** Scratch frontier explorer for the IVF probe on the synthetic scale
  * corpus (the [[SyntheticVectors.lowRank]] manifold): prints recall and
  * scanned-rows per nprobe plus the inverted-list balance tail, so the
  * corpus/nlist operating point for `BenchScale` can be picked from data
  * rather than guessed. A healthy corpus shows BOTH a recall curve that
  * climbs with nprobe (not pinned at 1.0) and near-balanced lists
  * (max/mean within a small factor — the scanned-rows axis is
  * meaningless when a handful of lists hold the corpus).
  *
  * Args: n dim nlist intrinsic nQueries (defaults 200000 384 256 8 16).
  */
object AnnTune {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toLong).getOrElse(200000L)
    val dim = args.lift(1).map(_.toInt).getOrElse(384)
    val nlist = args.lift(2).map(_.toInt).getOrElse(256)
    val intrinsic = args.lift(3).map(_.toInt).getOrElse(8)
    val nQ = args.lift(4).map(_.toInt).getOrElse(16)
    val spark: SparkSession = GraftSession.configure(
      SparkSession.builder().master("local[32]"), shufflePartitions = 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = SyntheticVectors.lowRank(spark, n, dim, intrinsic).cache()
    base.count()
    val queries = base.filter(col("id") < nQ)
      .select(col("id").as("qid"), col("vec").as("qvec")).cache()
    val gt = Search.groundTruth(base, queries, 10, Metric.Dot).cache()
    gt.count()
    val idx = Ivf.buildOrGet(spark, base, s"anntune_${n}_${dim}_${intrinsic}",
      nlist = nlist, ntrain = math.min(n, 200000L).toInt)
    val clustered = idx.clustered(spark).cache()
    val sizes = clustered.groupBy("cluster_id").count().cache()
    val bal = sizes.agg(min("count"), avg("count"), max("count"),
      expr("percentile(count, 0.99)"), count(lit(1))).collect()(0)
    println(s"TUNE lists=${bal.getLong(4)} min=${bal.getLong(0)} " +
      f"mean=${bal.getDouble(1)}%.0f p99=${bal.getDouble(3)}%.0f max=${bal.getLong(2)}")
    def scanned(np: Int): Long =
      queries.select(explode(Ivf.nearestCentroids(col("qvec"), idx.centroids, np))
          .as("cluster_id"))
        .join(sizes, Seq("cluster_id"))
        .agg(sum("count")).collect()(0).getLong(0)
    for (np <- Seq(1, 2, 4, 8, 16, 32))
      if (np <= nlist) {
        val r = Ivf.meanRecall(
          Ivf.search(clustered, queries, idx.centroids, np, 10), gt, 10)
          .collect()(0).getDouble(0)
        println(f"TUNE nprobe=$np%3d recall=$r%.4f scanned=${scanned(np)} " +
          f"frac=${scanned(np).toDouble / (n * nQ)}%.5f")
      }
    Eval.lshSweep(spark, base, queries, gt, k = 10,
      points = Seq((12, 4, 0), (12, 4, 8), (12, 8, 8)), runs = 1,
      emit = l => println(s"TUNE $l"))
    spark.stop()
  }
}
