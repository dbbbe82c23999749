package graft.ops

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

import graft.functions.VectorFunctions
import graft.functions.expressions.{NearestCentroid, NearestCentroids}

/** IVF (inverted-file) index: coarse k-means quantizer + cluster-pruned
  * search — the Spark-native re-expression of the reference's FAISS IVF path
  * (`apps/nvdb_ivf_build.cpp`, `apps/nvdb_ivf_eval.cpp:403-489`).
  *
  * Scale design:
  *  - train: MLlib KMeans on a bounded sample (`ntrain` rows), like the
  *    reference's train-on-first-200K.
  *  - assign: centroid matrix broadcast as a codegen reference object; the
  *    full base streams through a narrow projection — no join, no shuffle.
  *  - store: the assigned table is written partitioned/bucketed by
  *    cluster_id, so probing reads only `nprobe/nlist` of the data
  *    (partition pruning = FAISS's inverted-list skipping).
  *  - probe: per-query nprobe nearest centroids explode into (qid, cluster)
  *    pairs, broadcast-joined against the clustered base; only matching
  *    clusters are scored, then per-query top-k reduces map-side.
  */
object Ivf {

  /** Train nlist coarse centroids; returns the centroid matrix. */
  def train(base: DataFrame, nlist: Int, ntrain: Int = 200000, seed: Long = 42L,
            vecCol: String = "vec"): Array[Array[Float]] = {
    val feat = base.select(array_to_vector(col(vecCol)).as("features")).limit(ntrain)
    val model = new KMeans().setK(nlist).setSeed(seed).setMaxIter(20)
      .setFeaturesCol("features").fit(feat)
    model.clusterCenters.map(_.toArray.map(_.toFloat))
  }

  def nearestCentroid(vec: Column, centroids: Array[Array[Float]]): Column =
    Bridge.column(NearestCentroid(Bridge.expression(vec), centroids))

  def nearestCentroids(vec: Column, centroids: Array[Array[Float]], nprobe: Int): Column =
    Bridge.column(NearestCentroids(Bridge.expression(vec), centroids, nprobe))

  /** Assign every base row to its nearest centroid (narrow, shuffle-free). */
  def assign(base: DataFrame, centroids: Array[Array[Float]],
             vecCol: String = "vec"): DataFrame =
    base.withColumn("cluster_id", nearestCentroid(col(vecCol), centroids))

  /** Write the assigned base partitioned by cluster_id — the on-disk
    * inverted lists. Probing then prunes partitions at file level.
    */
  def writeClustered(assigned: DataFrame, path: String): Unit =
    assigned.write.mode("overwrite").partitionBy("cluster_id").parquet(path)

  /** IVF probe search: score only the `nprobe` nearest clusters per query.
    *
    * assignedBase: (idCol, vecCol, cluster_id); queries: (qid, qvec).
    * Returns (qid, id, score, rank) — top-k by `metric`.
    */
  def search(assignedBase: DataFrame, queries: DataFrame,
             centroids: Array[Array[Float]], nprobe: Int, k: Int,
             metric: Metric = Metric.Dot,
             idCol: String = "id", vecCol: String = "vec"): DataFrame = {
    val probed = queries.select(col("qid"), col("qvec"),
      explode(nearestCentroids(col("qvec"), centroids, nprobe)).as("cluster_id"))
    val scoreCol = metric match {
      case Metric.Dot    => VectorFunctions.dot(col(vecCol), col("qvec"))
      case Metric.Cosine => VectorFunctions.cosine(col(vecCol), col("qvec"))
      case Metric.L2     => VectorFunctions.l2Sq(col(vecCol), col("qvec"))
    }
    val scored = assignedBase
      .join(broadcast(probed), Seq("cluster_id"))
      .select(col("qid"), col(idCol).as("gid"), scoreCol.as("score"))
    TopK.perGroup(scored, "qid", "gid", "score", k, metric.larger)
  }

  /** End-to-end IVF recall evaluation vs the exact scan
    * (`apps/nvdb_ivf_eval.cpp` recall loop): returns one row
    * (mean_recall, n_queries).
    */
  def recallVsExact(base: DataFrame, queries: DataFrame, nlist: Int, nprobe: Int,
                    k: Int, ntrain: Int = 200000, seed: Long = 42L): DataFrame = {
    val cents = train(base, nlist, ntrain, seed)
    val assigned = assign(base, cents)
    val pred = search(assigned, queries, cents, nprobe, k)
      .groupBy("qid").agg(collect_list(col("id")).as("pred_ids"))
    val gt = Search.groundTruth(base, queries, k, Metric.Dot)
    pred.join(gt, Seq("qid"))
      .select((size(array_intersect(col("pred_ids"), col("gt_ids"))).cast("double") / k).as("recall"))
      .agg(avg(col("recall")).as("mean_recall"), count(lit(1)).as("n_queries"))
  }
}
