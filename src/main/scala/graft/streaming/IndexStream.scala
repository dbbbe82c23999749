package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.{Hnsw, Ivf, Metric}

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

  /** Continuous UPSERT into a warmed HNSW shard group — the graph-index
    * twin of [[appendStream]] (r16; see [[graft.ops.Hnsw.upsertWarmed]]
    * for routing/replace semantics and the append-only == rebuild
    * guarantee). Each micro-batch shuffles once on the shard key and
    * mutates the executor-cached graphs in place; the group must be
    * warmed BEFORE the stream starts (loud-miss contract).
    *
    * Replay semantics: the checkpoint gives at-least-once batch
    * delivery into a non-transactional sink, and an upsert replay is
    * SEMANTICALLY idempotent — the replayed ids tombstone their live
    * twins and re-insert, so the live (id → vector) map is unchanged —
    * but each replay leaves tombstones ([[graft.ops.Hnsw.compactWarmed]]
    * reclaims them, restoring the canonical graph). Persist with
    * [[graft.ops.Hnsw.saveWarmed]] on the caller's checkpoint cadence.
    */
  def upsertHnswStream(vectors: DataFrame, cacheKey: String, nShards: Int,
                       checkpoint: String,
                       metric: Metric = Metric.Dot, m: Int = 16,
                       efConstruction: Int = 100, seed: Long = 42L,
                       centroids: Array[Array[Float]] = null,
                       createMissing: Boolean = false): StreamingQuery =
    vectors.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Hnsw.upsertWarmed(batch, cacheKey, nShards, metric, m,
          efConstruction, seed, centroids,
          createMissing = createMissing).count()
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
}
