package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.Ivf

/** Incremental IVF index maintenance — the online half of index DDL.
  * Additive surface (the reference has no streaming, SURVEY §2.9; its
  * index lifecycle is build-then-serve): a production ingest pipeline
  * appends new vectors continuously, and re-clustering the whole corpus
  * per batch is not an option at 100 TB.
  *
  * Design mirrors FAISS's own add-after-train split (and the reference's
  * `nvdb_ivf_build` train→add staging, `apps/nvdb_ivf_build.cpp:59-92`):
  * the coarse quantizer is FROZEN at training time; arriving vectors are
  * assigned to their nearest centroid with the broadcast-centroid codegen
  * expression — a narrow, shuffle-free map — and appended to the
  * cluster-partitioned table. Probing sees new rows on the next scan
  * (partition pruning keeps working: appends land inside their
  * cluster_id=... directory). Centroid RE-training stays an offline DDL
  * decision (drift monitoring is the operator's call), exactly as with
  * any IVF deployment.
  */
object IndexStream {

  /** Assign a micro-batch/stream of (id, vec) rows to frozen centroids.
    * Narrow projection — valid on both batch and streaming DataFrames;
    * stream==batch equality is gated in IndexStreamSpec.
    */
  def assign(vectors: DataFrame, centroids: Array[Array[Float]],
             vecCol: String = "vec"): DataFrame =
    Ivf.assign(vectors, centroids, vecCol)

  /** Continuous append into the clustered (partitioned) index table.
    * Exactly-once via the file-sink commit log + checkpoint; each
    * micro-batch writes only the cluster partitions it touches.
    */
  def appendStream(vectors: DataFrame, centroids: Array[Array[Float]],
                   tablePath: String, checkpoint: String,
                   vecCol: String = "vec"): StreamingQuery =
    assign(vectors, centroids, vecCol)
      .writeStream
      .partitionBy("cluster_id")
      .format("parquet")
      .option("path", tablePath)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
}
