package graft.tools

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.GraftSession
import graft.ops.{Ivf, Metric, Search}

/** Scratch trainer-economics explorer: wall-time and quantizer quality of
  * MLlib KMeans configs at the BENCH_SCALE training operating point
  * (200k sample × 384d × nlist=1024), so the `Ivf.train` defaults (init
  * mode, iteration budget, points-per-centroid cap) are picked from
  * measurement — the reference's build trains nlist=4096 in 13.9 s
  * (`Performance.md:578-579`), ~30× under the r7 MLlib build.
  *
  * Quality axes: mean squared quantization error on a held-out slice, and
  * nprobe=4/8 recall@10 on the 200k lowRank corpus (the axis the 1M
  * frontier is graded on).
  *
  * Args: n dim nlist ntrain (defaults 200000 384 1024 200000).
  */
object TrainTune {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toLong).getOrElse(200000L)
    val dim = args.lift(1).map(_.toInt).getOrElse(384)
    val nlist = args.lift(2).map(_.toInt).getOrElse(1024)
    val ntrain = args.lift(3).map(_.toInt).getOrElse(200000)
    val spark: SparkSession = GraftSession.configure(
      SparkSession.builder().master("local[32]"), shufflePartitions = 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = SyntheticVectors.lowRank(spark, n, dim, intrinsic = 8).cache()
    base.count()
    val queries = base.filter(col("id") < 16)
      .select(col("id").as("qid"), col("vec").as("qvec")).cache()
    val gt = Search.groundTruth(base, queries, 10, Metric.Dot).cache()
    gt.count()
    val feat = base.filter(col("id") < ntrain)
      .select(array_to_vector(col("vec")).as("features")).cache()
    feat.count()
    val holdout = base.filter(col("id") >= n - 20000)

    def run(tag: String, init: String, maxIter: Int, sample: Int): Unit = {
      val f = if (sample >= ntrain) feat
        else base.filter(col("id") < sample)
          .select(array_to_vector(col("vec")).as("features"))
      val t0 = System.nanoTime()
      val model = new KMeans().setK(nlist).setSeed(42L).setMaxIter(maxIter)
        .setInitMode(init).setFeaturesCol("features").fit(f)
      val sec = (System.nanoTime() - t0) / 1e9
      val cents = model.clusterCenters.map(_.toArray.map(_.toFloat))
      val assigned = Ivf.assign(base, cents).cache()
      assigned.count()
      val mse = holdout.select(
        graft.functions.VectorFunctions.l2Sq(col("vec"),
          element_at(typedLit(cents.map(_.toSeq).toSeq),
            Ivf.nearestCentroid(col("vec"), cents) + 1)).as("d"))
        .agg(avg("d")).collect()(0).getDouble(0)
      def recall(np: Int): Double =
        Ivf.meanRecall(Ivf.search(assigned, queries, cents, np, 10), gt, 10)
          .collect()(0).getDouble(0)
      val r4 = recall(4); val r8 = recall(8)
      val sizes = assigned.groupBy("cluster_id").count()
        .agg(max("count"), count(lit(1))).collect()(0)
      println(f"[traintune] $tag%-28s ${sec}%7.1f s  mse=$mse%.5f  r@np4=$r4%.3f r@np8=$r8%.3f  maxlist=${sizes.getLong(0)} lists=${sizes.getLong(1)}")
      assigned.unpersist()
    }

    def runGraft(tag: String, maxIter: Int): Unit = {
      val t0 = System.nanoTime()
      val cents = Ivf.train(base, nlist, ntrain, seed = 42L, maxIter = maxIter)
      val sec = (System.nanoTime() - t0) / 1e9
      val assigned = Ivf.assign(base, cents).cache()
      assigned.count()
      val mse = holdout.select(
        graft.functions.VectorFunctions.l2Sq(col("vec"),
          element_at(typedLit(cents.map(_.toSeq).toSeq),
            Ivf.nearestCentroid(col("vec"), cents) + 1)).as("d"))
        .agg(avg("d")).collect()(0).getDouble(0)
      def recall(np: Int): Double =
        Ivf.meanRecall(Ivf.search(assigned, queries, cents, np, 10), gt, 10)
          .collect()(0).getDouble(0)
      val r4 = recall(4); val r8 = recall(8)
      val sizes = assigned.groupBy("cluster_id").count()
        .agg(max("count"), count(lit(1))).collect()(0)
      println(f"[traintune] $tag%-28s ${sec}%7.1f s  mse=$mse%.5f  r@np4=$r4%.3f r@np8=$r8%.3f  maxlist=${sizes.getLong(0)} lists=${sizes.getLong(1)}")
      assigned.unpersist()
    }

    runGraft("graft_lloyd_it25", 25)
    run("random_it25_full", "random", 25, ntrain)
    spark.stop()
  }
}
