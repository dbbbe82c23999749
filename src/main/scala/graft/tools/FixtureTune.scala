package graft.tools

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{GraftSession, Tables}
import graft.ops.{Ivf, Kmeans, Metric, Search}

/** Scratch: fixture-scale (sf0.01 embeddings, 500 rows) trainer
  * comparison — quantization error AND probe recall for the graft Lloyd
  * trainer vs MLlib k-means||, to decide whether spec thresholds
  * calibrated on MLlib draws need recalibration for the new trainer.
  */
object FixtureTune {
  def main(args: Array[String]): Unit = {
    System.setProperty("graft.kmeans.log", "true")
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.01")
    val spark: SparkSession = GraftSession.local(8)
    spark.sparkContext.setLogLevel("WARN")
    val base = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("id"), col("embedding").as("vec")).cache()
    val n = base.count()
    val queries = base.filter(col("id") < 8)
      .select(col("id").as("qid"), col("vec").as("qvec")).cache()
    val gt = Search.groundTruth(base, queries, 10, Metric.Dot).cache()
    gt.count()

    def eval(tag: String, cents: Array[Array[Float]]): Unit = {
      val assigned = Ivf.assign(base, cents).cache()
      assigned.count()
      val mse = base.select(
        graft.functions.VectorFunctions.l2Sq(col("vec"),
          element_at(typedLit(cents.map(_.toSeq).toSeq),
            Ivf.nearestCentroid(col("vec"), cents) + 1)).as("d"))
        .agg(avg("d")).collect()(0).getDouble(0)
      def recall(np: Int): Double =
        Ivf.meanRecall(Ivf.search(assigned, queries, cents, np, 10), gt, 10)
          .collect()(0).getDouble(0)
      println(f"[fixturetune] $tag%-24s n=$n mse=$mse%.5f r@np4=${recall(4)}%.4f r@np8=${recall(8)}%.4f")
      assigned.unpersist()
    }

    for (nredo <- Seq(4, 8, 16, 32)) {
      System.setProperty("graft.kmeans.nredo", nredo.toString)
      eval(s"graft_lloyd_nredo$nredo", Ivf.train(base, nlist = 16, ntrain = 500))
    }
    System.clearProperty("graft.kmeans.nredo")
    val feat = base.filter(col("id") < 500)
      .select(array_to_vector(col("vec")).as("features"))
    val m = new KMeans().setK(16).setSeed(42L).setMaxIter(25)
      .setInitMode("k-means||").setFeaturesCol("features").fit(feat)
    eval("mllib_kmeans||", m.clusterCenters.map(_.toArray.map(_.toFloat)))
    spark.stop()
  }
}
