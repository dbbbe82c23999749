package graft.ops



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
  *  - train: fused-SIMD Lloyd k-means ([[Kmeans]]) on a bounded sample, like the
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

  /** Train nlist coarse centroids; returns the centroid matrix.
    * The training sample is the deterministic id-prefix (the reference
    * trains on the first `ntrain` rows). Ids are dense positional by
    * construction (SURVEY §1.1), so `id < ntrain` IS that prefix — as a
    * pushed-down range predicate it prunes row groups at the scan, where
    * an `orderBy(id).limit(ntrain)` would scan every partition and funnel
    * per-partition TakeOrdered heaps through the driver at 100 TB.
    */
  /** The deterministic id-prefix training sample, as a pushdown-prunable
    * range predicate. Shared by Ivf/Pq/Opq training.
    */
  private[graft] def trainSample(base: DataFrame, ntrain: Int,
                                 idCol: String): DataFrame =
    base.filter(col(idCol) < ntrain)

  /** Train follows FAISS's clustering economics (`Clustering.cpp` policy,
    * the build the reference pays in `nvdb_ivf_build`): a bounded
    * iteration count (25 — FAISS's own niter default) with an early stop
    * on centroid movement, the max-points-per-centroid subsample cap
    * (FAISS default 256/centroid; beyond it extra sample rows buy no
    * centroid quality, only iteration cost), and an adaptive init (seeded
    * uniform draw at nlist ≥ 256, driver k-means++ spread below — see
    * [[Kmeans.fit]]). The Lloyd loop itself is [[Kmeans]] — one fused
    * SIMD assign+accumulate pass per iteration with a deterministic
    * partition-ordered reduce — replacing the r7 MLlib trainer whose
    * boxing/plumbing overhead measured 327–443 s at 200k×384d×nlist=1024
    * (reference trains nlist=4096 in 13.9 s, `Performance.md:578-579`).
    */
  def train(base: DataFrame, nlist: Int, ntrain: Int = 200000, seed: Long = 42L,
            vecCol: String = "vec", idCol: String = "id",
            maxIter: Int = 25, maxPointsPerCentroid: Int = 256,
            stableFrac: Double = 0.033): Array[Array[Float]] = {
    val cap = nlist.toLong * maxPointsPerCentroid
    val feat = trainSample(base, math.min(ntrain.toLong, cap).toInt, idCol)
    // the id-prefix contract (dense positional ids) violated — e.g. sparse
    // composite ids — surfaces here as a degenerate sample; fail with the
    // contract named instead of an obscure trainer error downstream
    val got = feat.count()
    require(got >= nlist,
      s"training sample has $got rows < nlist=$nlist: trainers contract on " +
        s"dense positional '$idCol' (SURVEY §1.1) — mint ids with " +
        "Ingest.withPositionalIds before indexing derived tables")
    // coarse-quantizer restarts select by the retrieval-recall proxy, not
    // quantization error (see Kmeans.localFit's selection rationale).
    // SCOPE: restarts exist only on Kmeans.fit's driver-local path
    // (k < 256 && sample ≤ 16384 — every sf-fixture index), where the r8
    // MSE-vs-recall measurement was made. At production nlist (e.g. 4096)
    // the distributed Lloyd path runs a SINGLE seeded-init run, FAISS's
    // own nredo=1 default at scale, and the flag is ignored — the fixture
    // rationale is not assumed to transfer.
    Kmeans.fit(feat, nlist, seed, maxIter, vecCol = vecCol,
      selectByRecall = true, stableFrac = stableFrac)
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
    * Repartitioned on cluster_id first: a raw partitionBy writes one file
    * per (input partition × cluster), which at nlist=1024 over a 12-split
    * corpus is ~12k small files — the classic partitioned-write explosion;
    * clustering the shuffle first caps it at one file per inverted list.
    */
  def writeClustered(assigned: DataFrame, path: String): Unit = {
    assigned.repartition(col("cluster_id"))
      .write.mode("overwrite").partitionBy("cluster_id").parquet(path)
    invalidateClustered(path)
  }

  /** Append a batch to an index's clustered table under the FROZEN
    * coarse quantizer (FAISS's add-after-train split; the batch twin of
    * [[graft.streaming.IndexStream.appendStream]] for maintaining a
    * [[buildOrGet]] artifact in place). Assignment is the broadcast-
    * centroid codegen expression — narrow, shuffle-free — and the
    * append lands inside the touched cluster_id partitions only, so
    * partition pruning keeps working over the grown table. Invalidates
    * the session relation cache (the grown table must re-list its
    * files).
    *
    * `token` (r17) routes the batch through [[graft.io.StagedAppend]]'s
    * crash-safe stage-then-commit protocol (see [[graft.ops.Pq.appendIvf4]]
    * — same semantics: idempotent per token, old generation servable
    * under any crash, re-call recovers). `token = null` keeps the direct
    * in-place append for one-shot scratch artifacts.
    *
    * Returns the number of rows appended (the recorded count when the
    * token was already committed).
    */
  def appendClustered(idx: Index, rows: DataFrame,
                      idCol: String = "id", vecCol: String = "vec",
                      token: String = null): Long = {
    val batch = rows.select(col(idCol).cast("long").as("id"),
      col(vecCol).as("vec"))
    // repartition on the partition column like writeClustered — a raw
    // partitionBy append writes one file per (input split x touched
    // cluster), and a continuously maintained table accumulates that
    // small-file explosion per batch
    def writeTo(path: String, mode: String): Unit =
      assign(batch, idx.centroids)
        .repartition(col("cluster_id"))
        .write.mode(mode).partitionBy("cluster_id")
        .parquet(path)
    val n =
      if (token == null) {
        val n0 = batch.count()
        writeTo(idx.clusteredPath, "append")
        n0
      } else
        graft.io.StagedAppend.run(idx.clusteredPath, token, batch.count()) {
          stage => writeTo(stage, "overwrite")
        }
    invalidateClustered(idx.clusteredPath)
    n
  }

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
    // STATIC partition pruning: the union of probed inverted lists is
    // known before the scan — a driver-bounded Q×nprobe id set — so it
    // goes into the scan as an IN predicate on the partition column
    // (FAISS's inverted-list skipping as metadata-level file pruning).
    // Relying on runtime DPP instead left the full corpus scan in the
    // plan at 1M×384d: probe latency matched the exact scan no matter
    // how few lists were probed.
    val probedIds = probed.select("cluster_id").distinct().collect().map(_.get(0))
    val scoreCol = metric match {
      case Metric.Dot    => VectorFunctions.dot(col(vecCol), col("qvec"))
      case Metric.Cosine => VectorFunctions.cosine(col(vecCol), col("qvec"))
      case Metric.L2     => VectorFunctions.l2Sq(col(vecCol), col("qvec"))
    }
    val scored = assignedBase
      .filter(col("cluster_id").isInCollection(probedIds.toSeq))
      .join(broadcast(probed), Seq("cluster_id"))
      .select(col("qid"), col(idCol).as("gid"), scoreCol.as("score"))
    TopK.perGroup(scored, "qid", "gid", "score", k, metric.larger)
  }

  /** A built IVF index: centroid matrix + on-disk clustered base table.
    * Index construction is DDL — build once, probe many times
    * (the reference separates `nvdb_ivf_build` from `nvdb_ivf_eval`).
    */
  final case class Index(centroids: Array[Array[Float]], clusteredPath: String) {
    /** The clustered table, through a session-keyed relation cache: a raw
      * `spark.read.parquet` re-runs partition discovery over every
      * cluster_id directory on EVERY call (the same per-call tax the pq4
      * blockedRelation cache retired — measured 1.66 s vs 0.14 s at 1024
      * dirs), which a repeated consumer (the bench loop, a serving
      * session, the clustered-refine fetch) pays for nothing.
      */
    def clustered(spark: org.apache.spark.sql.SparkSession): DataFrame = {
      purgeStoppedClustered()
      clusteredCache.computeIfAbsent(
        s"${graft.core.GraftSession.uuid(spark)}|$clusteredPath",
        _ => spark.read.parquet(clusteredPath))
    }
  }

  private val clusteredCache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  /** Drop cached relations bound to stopped sessions (each DataFrame pins
    * its SparkSession — without eviction the map leaks sessions for the
    * JVM's life) — the AnnSql.purgeStopped discipline.
    */
  private def purgeStoppedClustered(): Unit =
    clusteredCache.entrySet().removeIf(
      e => e.getValue.sparkSession.sparkContext.isStopped)

  /** Invalidate cached relations for `path` across all sessions — called
    * after a (re)write so a rebuilt clustered table never serves the old
    * file listing.
    */
  private[ops] def invalidateClustered(path: String): Unit =
    clusteredCache.keySet().removeIf(_.endsWith(s"|$path"))

  private val indexCache =
    new java.util.concurrent.ConcurrentHashMap[String, Index]()

  /** Collision-resistant on-disk cache name for a full cache key — a 32-bit
    * hashCode would let two distinct (cacheKey, params) tuples silently
    * share (and corrupt) one artifact path.
    */
  private[graft] def cacheDigest(key: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(16).map(b => f"$b%02x").mkString

  /** Persist/load a small float matrix (centroids, codebook slices) next
    * to the clustered table — the index artifact survives the JVM, like
    * the reference's on-disk FAISS index files. CRC32C-framed since r17
    * ([[graft.io.CheckedBlob]]; a flipped centroid float would silently
    * re-route assignments) — legacy unframed files stay readable.
    */
  private[graft] def saveMatrix(file: String, m: Array[Array[Float]]): Unit =
    graft.io.CheckedBlob.write(file) { out =>
      out.writeInt(m.length)
      out.writeInt(if (m.isEmpty) 0 else m(0).length)
      m.foreach(_.foreach(out.writeFloat))
    }

  private[graft] def loadMatrix(file: String): Option[Array[Array[Float]]] =
    graft.io.CheckedBlob.read(file) { in =>
      val rows = in.readInt()
      val cols = in.readInt()
      Array.fill(rows)(Array.fill(cols)(in.readFloat()))
    }

  /** Build (or fetch the already-built) IVF index for `base`: train
    * centroids, assign every row, write partitioned by cluster_id. Keyed by
    * (cacheKey, nlist, ntrain, seed) so repeated query executions — e.g.
    * the bench loop — pay the build exactly once; the on-disk artifact
    * (clustered table + centroid matrix) is reused across JVMs too.
    */
  def buildOrGet(spark: org.apache.spark.sql.SparkSession, base: => DataFrame,
                 cacheKey: String, nlist: Int, ntrain: Int,
                 seed: Long = 42L,
                 onPhase: (String, Double) => Unit = (_, _) => ()): Index = {
    // "t6" versions the trainer (the graft fused-SIMD Lloyd, hash-draw /
    // nredo init): cached artifacts from an older trainer must MISS, not
    // serve silently — bump this tag whenever trainer semantics change
    val key = s"$cacheKey|$nlist|$ntrain|$seed|t6"
    indexCache.computeIfAbsent(key, _ => {
      val path = s"target/ivf_cache/${cacheDigest(key)}"
      val centFile = s"$path.centroids.bin"
      loadMatrix(centFile) match {
        case Some(c) if new java.io.File(s"$path/_SUCCESS").isFile =>
          Index(c, path)
        case _ =>
          // phase split: train cost is corpus-independent (bounded sample),
          // assign+write is the full-corpus pass — the axis that scales
          val t0 = System.nanoTime()
          val cents = train(base, nlist, ntrain, seed)
          val t1 = System.nanoTime()
          onPhase("train", (t1 - t0) / 1e9)
          writeClustered(assign(base, cents), path)
          onPhase("assign_write", (System.nanoTime() - t1) / 1e9)
          saveMatrix(centFile, cents)
          Index(cents, path)
      }
    })
  }

  // GT is likewise cached across executions — the reference does the same
  // via its gtbin cache (`apps/nvdb_ivf_eval.cpp:355-383`).
  private val gtCache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  def cachedGroundTruth(cacheKey: String, base: => DataFrame,
                        queries: => DataFrame, k: Int,
                        metric: Metric = Metric.Dot): DataFrame =
    // cached DataFrames are session-bound: key on sessionUUID (unique for
    // the JVM's life — identityHashCode could collide a new session onto
    // a DataFrame bound to a stopped, GC'd one)
    gtCache.computeIfAbsent(
      s"${graft.core.GraftSession.uuid(base.sparkSession)}|$cacheKey|$k|$metric", _ => {
      val gt = Search.groundTruth(base, queries, k, metric).cache()
      gt.count() // materialize once
      gt
    })

  /** Composite probe→refine pipeline (`apps/nvdb_ivf_eval.cpp:310-782`):
    * IVF probe for `k_search = max(refine_k, k)` candidates, then exact-L2
    * refine down to k. When `refineK <= k` the refine join is SKIPPED at
    * plan-construction time — it cannot change a top-k result
    * (`ivf_eval.cpp:329`, threshold effect in `Performance.md:656-657`).
    *
    * `pipeline` mirrors the reference's `PIPELINE=staged|interleaved` knob
    * (`ivf_eval.cpp:465-466,666`): both produce IDENTICAL results; they
    * differ in composition. `staged` materializes per-query candidate
    * lists between the stages (stage A then stage B, the reference's
    * batched-refine accounting); `interleaved` fuses probe output straight
    * into the base equi-join — no collect_list barrier, one less
    * aggregation, the per-query-composed flavor.
    */
  def searchRefined(assignedBase: DataFrame, queries: DataFrame,
                    centroids: Array[Array[Float]], nprobe: Int, k: Int,
                    refineK: Int, metric: Metric = Metric.Dot,
                    idCol: String = "id", vecCol: String = "vec",
                    pipeline: String = "staged"): DataFrame = {
    require(pipeline == "staged" || pipeline == "interleaved",
      s"unknown pipeline flavor '$pipeline'")
    if (refineK <= k) search(assignedBase, queries, centroids, nprobe, k, metric, idCol, vecCol)
    else {
      val kSearch = math.max(refineK, k)
      val cands = search(assignedBase, queries, centroids, nprobe, kSearch, metric, idCol, vecCol)
      // Candidate sides are Q×k_search rows — bounded by the query batch,
      // always ≪ the base — so they carry an explicit broadcast hint: the
      // base then streams in place. Without it, Catalyst has no stats for
      // the probe-derived side and sort-merge-joins, shuffle-writing the
      // ENTIRE base per refine (measured 1.56 GB at 1M×384d for a
      // 6,400-row candidate set).
      if (pipeline == "staged") {
        val lists = cands
          .groupBy("qid").agg(collect_list(col("id")).as("cand_ids"))
          .join(queries, Seq("qid"))
          .select(col("qid"), col("qvec"), col("cand_ids"))
        Search.refine(assignedBase.select(col(idCol), col(vecCol)),
          broadcast(lists), k, idCol, vecCol)
      } else {
        val scored = broadcast(cands.select(col("qid"), col("id")))
          .join(assignedBase.select(col(idCol).as("id"), col(vecCol).as("base_vec")), Seq("id"))
          .join(broadcast(queries), Seq("qid"))
          .select(col("qid"), col("id"),
            graft.functions.VectorFunctions.l2Sq(col("base_vec"), col("qvec")).as("dist"))
        TopK.perGroup(scored, "qid", "id", "dist", k, larger = false)
      }
    }
  }

  /** Mean recall@k of predictions vs ground truth: one row
    * (mean_recall, n_queries). pred: (qid, id, ...) top-k rows.
    * The denominator is EVERY ground-truth query — a query with zero
    * predictions (possible under sparse LSH configs) scores 0 hits
    * rather than dropping out, matching the reference's divide-by-all-Q
    * (`apps/nvdb_hnsw_eval.cpp:185`).
    */
  def meanRecall(pred: DataFrame, gt: DataFrame, k: Int): DataFrame =
    gt.join(pred.groupBy("qid").agg(collect_list(col("id")).as("pred_ids")),
        Seq("qid"), "left")
      .select((coalesce(size(array_intersect(col("pred_ids"), col("gt_ids"))), lit(0))
        .cast("double") / k).as("recall"))
      .agg(avg(col("recall")).as("mean_recall"), count(lit(1)).as("n_queries"))

  /** Exact-integer recall scalars: one row (n_hits, n_queries,
    * mean_recall). Unlike [[meanRecall]]'s avg() over per-query doubles
    * (summation-order-dependent across engines), total-hits with ONE
    * division `n_hits / (k·n_queries)` is IEEE-exact — this is the
    * hash-oracle-safe recall shape (a1–a4).
    */
  def recallHits(pred: DataFrame, gt: DataFrame, k: Int): DataFrame =
    gt.join(pred.groupBy("qid").agg(collect_list(col("id")).as("pred_ids")),
        Seq("qid"), "left")
      .agg(sum(coalesce(size(array_intersect(col("pred_ids"), col("gt_ids"))), lit(0)))
        .cast("long").as("n_hits"), count(lit(1)).as("n_queries"))
      .select(col("n_hits"), col("n_queries"),
        (col("n_hits").cast("double") / (lit(k.toLong) * col("n_queries")))
          .as("mean_recall"))

  /** End-to-end IVF recall evaluation vs the exact scan
    * (`apps/nvdb_ivf_eval.cpp` recall loop): returns one row
    * (mean_recall, n_queries). Index build + GT are cached DDL — the
    * repeated-execution cost is probe + recall only.
    */
  def recallVsExact(base: DataFrame, queries: DataFrame, nlist: Int, nprobe: Int,
                    k: Int, ntrain: Int = 200000, seed: Long = 42L,
                    cacheKey: String = ""): DataFrame = {
    val spark = base.sparkSession
    val idx = buildOrGet(spark, base, cacheKey, nlist, ntrain, seed)
    val pred = search(idx.clustered(spark), queries, idx.centroids, nprobe, k)
    val gt =
      if (cacheKey.nonEmpty) cachedGroundTruth(cacheKey, base, queries, k, Metric.Dot)
      else Search.groundTruth(base, queries, k, Metric.Dot)
    meanRecall(pred, gt, k)
  }
}
