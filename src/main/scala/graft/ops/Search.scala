package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Similarity metric for vector search. Dot and Cosine rank descending;
  * L2 ranks ascending. On L2-normalized vectors Dot-ranking == L2-ranking
  * (`/root/reference/apps/nvdb_gt_build.cpp:27-29`).
  */
sealed trait Metric { def larger: Boolean }
object Metric {
  case object Dot extends Metric { val larger = true }
  case object Cosine extends Metric { val larger = true }
  case object L2 extends Metric { val larger = false }
}

/** Exact and candidate-based vector search — the reference's flagship
  * pipelines (`apps/nvdb_bench.cpp`, `apps/nvdb_gt_build.cpp`,
  * `apps/nvdb_ivf_eval.cpp:278-307`) re-expressed as Spark plans.
  *
  * Scale shape: queries are the small side and are ALWAYS broadcast; the
  * base table streams through executors exactly once per job (no shuffle of
  * the base), and per-query top-k state reduces map-side, so the only data
  * movement is Q×k buffers per partition — the same
  * "threads share the scan, merge at the end" design as the reference.
  */
object Search {

  private def scoreCol(metric: Metric, vec: String, qvec: String) = metric match {
    case Metric.Dot    => VectorFunctions.dot(col(vec), col(qvec))
    case Metric.Cosine => VectorFunctions.cosine(col(vec), col(qvec))
    case Metric.L2     => VectorFunctions.l2Sq(col(vec), col(qvec))
  }

  /** Exact flat-scan top-k for every query: broadcast nested-loop join of
    * base × queries + codegen score + map-side-combining top-k.
    *
    * base: (idCol, vecCol); queries: (qidCol, qvecCol).
    * Returns (qid, id, score, rank).
    */
  def exactTopK(base: DataFrame, queries: DataFrame, k: Int, metric: Metric = Metric.Dot,
                idCol: String = "id", vecCol: String = "vec",
                qidCol: String = "qid", qvecCol: String = "qvec"): DataFrame = {
    val scored = base
      .crossJoin(broadcast(queries))
      .select(col(qidCol).as("qid"), col(idCol).as("gid"),
        scoreCol(metric, vecCol, qvecCol).as("score"))
    TopK.perGroup(scored, "qid", "gid", "score", k, metric.larger)
      .withColumnRenamed("qid", qidCol)
  }

  /** Batched exact top-k (`apps/nvdb_bench.cpp:47-159` — J2): the query
    * set (always small: it is broadcast in every plan of this engine)
    * collects to a codegen reference object, the base streams ONCE, and
    * each row scores all queries in a tight loop — no per-pair join-row
    * materialization. Identical results to [[exactTopK]] (same kernels,
    * same accumulation order); ~10× fewer allocations per scored pair.
    */
  def exactTopKBatched(base: DataFrame, queries: DataFrame, k: Int,
                       metric: Metric = Metric.Dot,
                       idCol: String = "id", vecCol: String = "vec",
                       qidCol: String = "qid", qvecCol: String = "qvec"): DataFrame = {
    import org.apache.spark.sql.graftbridge.Bridge
    import graft.functions.expressions.{BatchScore, BatchScores}
    val q = queries.select(col(qidCol), col(qvecCol)).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val qids = q.map(_._1)
    val qvecs = q.map(_._2)
    val m = metric match {
      case Metric.Dot => BatchScore.MDot
      case Metric.L2 => BatchScore.ML2
      case Metric.Cosine => BatchScore.MCos
    }
    val scoresCol = Bridge.column(BatchScores(Bridge.expression(col(vecCol)), qvecs, m))
    val scored = base
      .select(col(idCol).as("gid"), posexplode(scoresCol).as(Seq("qpos", "score")))
      .select(element_at(typedLit(qids), col("qpos") + 1).as("qid"),
        col("gid"), col("score"))
    TopK.perGroup(scored, "qid", "gid", "score", k, metric.larger)
      .withColumnRenamed("qid", qidCol)
  }

  /** Fused batched scan + per-partition top-k: K2's O(k) buffers live
    * INSIDE the scan loop — each partition keeps one buffer per query and
    * emits only Q×k rows, so the Q×N exploded (row, query) stream that
    * [[exactTopKBatched]] feeds through the aggregate never materializes.
    * This is the reference's thread design verbatim: thread-local
    * `TopKBuffer` over a shared scan, merge at the end
    * (`apps/nvdb_bench.cpp:124-129`, `src/flat_index_omp.cpp:36-75`).
    * Same kernels, same buffer policy (shared `TopKAggregator.consider`),
    * same tie-break → identical results (ScaleSpec gates equality).
    *
    * The declared `mapPartitions` exception: per-partition imperative
    * state across rows, which no Expression/Aggregate composition can
    * express without materializing the Q×N stream.
    */
  def exactTopKFused(base: DataFrame, queries: DataFrame, k: Int,
                     metric: Metric = Metric.Dot,
                     idCol: String = "id", vecCol: String = "vec",
                     qidCol: String = "qid", qvecCol: String = "qvec"): DataFrame = {
    val (qids, qvecs) = collectQueries(queries, qidCol, qvecCol)
    val larger = metric.larger
    val mcode = metric match {
      case Metric.Dot => 0
      case Metric.L2 => 1
      case Metric.Cosine => 2
    }
    val spark = base.sparkSession
    import spark.implicits._
    val partials = base.select(col(idCol), col(vecCol))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val agg = new TopKAggregator(k, larger)
        val bufs = Array.fill(qids.length)(agg.zero)
        // one reused score buffer per partition; scoreAll register-tiles
        // 4 queries per row pass and stays bitwise-equal to the per-pair
        // kernels, so the 3-path equality gate (ScaleSpec) is unaffected
        val row = new Array[Double](qvecs.length)
        while (it.hasNext) {
          val (id, v) = it.next()
          graft.functions.expressions.BatchScore.scoreAll(v, qvecs, mcode, row)
          var q = 0
          while (q < qvecs.length) {
            agg.consider(bufs(q), id, row(q))
            q += 1
          }
        }
        bufs.iterator.zipWithIndex.flatMap { case (b, qi) =>
          (0 until b.n).iterator.map(i => (qids(qi), b.ids(i), b.scores(i)))
        }
      }
    TopK.perGroup(partials.toDF("qid", "gid", "score"),
      "qid", "gid", "score", k, larger)
      .withColumnRenamed("qid", qidCol)
  }

  private def collectQueries(queries: DataFrame, qidCol: String,
                             qvecCol: String): (Array[Long], Array[Array[Float]]) = {
    val q = queries.select(col(qidCol), col(qvecCol)).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    (q.map(_._1), q.map(_._2))
  }

  private def batchTopK(scored: DataFrame, qids: Array[Long], k: Int,
                        larger: Boolean, qidCol: String): DataFrame =
    TopK.perGroup(
      scored.select(element_at(typedLit(qids), col("qpos") + 1).as("qid"),
        col("gid"), col("score")),
      "qid", "gid", "score", k, larger)
      .withColumnRenamed("qid", qidCol)

  /** Batched scan over an fp16-bits base (each row decodes once, scores
    * all queries) — J2 over the F2 kernel.
    */
  def exactTopKBatchedHalf(hbase: DataFrame, queries: DataFrame, k: Int,
                           idCol: String = "id", bitsCol: String = "hbits",
                           qidCol: String = "qid", qvecCol: String = "qvec"): DataFrame = {
    import org.apache.spark.sql.graftbridge.Bridge
    import graft.functions.expressions.BatchScoresHalf
    val (qids, qvecs) = collectQueries(queries, qidCol, qvecCol)
    val scores = Bridge.column(BatchScoresHalf(Bridge.expression(col(bitsCol)), qvecs))
    batchTopK(hbase.select(col(idCol).as("gid"),
      posexplode(scores).as(Seq("qpos", "score"))), qids, k, larger = true, qidCol)
  }

  /** Batched scan over an int8+scale base — J2 over the F3 kernel. */
  def exactTopKBatchedI8(qbase: DataFrame, queries: DataFrame, k: Int,
                         idCol: String = "id", codesCol: String = "codes",
                         scaleCol: String = "scale",
                         qidCol: String = "qid", qvecCol: String = "qvec"): DataFrame = {
    import org.apache.spark.sql.graftbridge.Bridge
    import graft.functions.expressions.BatchScoresI8
    val (qids, qvecs) = collectQueries(queries, qidCol, qvecCol)
    val scores = Bridge.column(BatchScoresI8(
      Bridge.expression(col(codesCol)), Bridge.expression(col(scaleCol)), qvecs))
    batchTopK(qbase.select(col(idCol).as("gid"),
      posexplode(scores).as(Seq("qpos", "score"))), qids, k, larger = true, qidCol)
  }

  /** Fused flavors of the quantized scans — [[exactTopKFused]]'s shape
    * (per-partition K2 top-k buffers inside the scan loop, no Q×N
    * exploded stream through an aggregate) over the F2/F3 kernels. The
    * scoring is the SAME `BatchScore.scoreAllHalf`/`scoreAllI8` row hoist
    * the codegen expressions call, so scores are bitwise-identical to the
    * batched flavors (QuantScanSpec gates equality); what changes is only
    * the plan shape around them. This is the operating point where the
    * reference's storage-ladder economics actually emerge: once the
    * per-pair row materialization is gone, wall time tracks stored
    * bytes/vector (f32 > f16 > i8, `Performance.md:242-255`).
    */
  def exactTopKFusedHalf(hbase: DataFrame, queries: DataFrame, k: Int,
                         idCol: String = "id", bitsCol: String = "hbits",
                         qidCol: String = "qid", qvecCol: String = "qvec"): DataFrame = {
    import org.apache.spark.sql.graftbridge.Bridge
    import org.apache.spark.sql.types.BinaryType
    import graft.functions.expressions.{BatchScoresHalf, BatchScoresHalfBin}
    val (qids, qvecs) = collectQueries(queries, qidCol, qvecCol)
    // dtype dispatch: BINARY (LE-packed, QuantizedTables' packed flavor —
    // per-byte scan decode) vs array<smallint>; scores bitwise-identical
    val scores =
      if (hbase.schema(bitsCol).dataType == BinaryType)
        Bridge.column(BatchScoresHalfBin(Bridge.expression(col(bitsCol)), qvecs))
      else Bridge.column(BatchScoresHalf(Bridge.expression(col(bitsCol)), qvecs))
    fusedScoredTopK(hbase.select(col(idCol).cast("long"), scores.as("scores")),
      qids, k, qidCol)
  }

  /** Fused int8+scale scan — see [[exactTopKFusedHalf]]. */
  def exactTopKFusedI8(qbase: DataFrame, queries: DataFrame, k: Int,
                       idCol: String = "id", codesCol: String = "codes",
                       scaleCol: String = "scale",
                       qidCol: String = "qid", qvecCol: String = "qvec"): DataFrame = {
    import org.apache.spark.sql.graftbridge.Bridge
    import org.apache.spark.sql.types.BinaryType
    import graft.functions.expressions.{BatchScoresI8, BatchScoresI8Bin}
    val (qids, qvecs) = collectQueries(queries, qidCol, qvecCol)
    val scores =
      if (qbase.schema(codesCol).dataType == BinaryType)
        Bridge.column(BatchScoresI8Bin(
          Bridge.expression(col(codesCol)), Bridge.expression(col(scaleCol)), qvecs))
      else Bridge.column(BatchScoresI8(
        Bridge.expression(col(codesCol)), Bridge.expression(col(scaleCol)), qvecs))
    fusedScoredTopK(qbase.select(col(idCol).cast("long"), scores.as("scores")),
      qids, k, qidCol)
  }

  /** Fused scan over a BLOCK-PACKED table (`QuantizedTables.write*Blocked`
    * — up to 128 id-sorted vectors per stored row, one contiguous payload
    * blob): per-stored-row plan overhead (parquet row assembly,
    * expression eval, encoder) amortizes over the whole block, which at
    * 1M×384d was ~10× the kernel cost of the row-wise scans. Inside a
    * block this is exactly the reference's contiguous payload walk
    * (`src/vector_dataset.cpp:121-151` — `vectors + i*dim` pointer
    * arithmetic as blob offsets). Dot metric (the storage-ladder scan);
    * per-vector decode math is bitwise-identical to the per-row kernels,
    * so ranks equal every other flavor (SearchSpec gates it).
    *
    * Layout dispatch by schema: (ids, vecs) f32 / (ids, bits) f16 /
    * (ids, codes, scales) i8.
    *
    * `floatAcc = true` is the opt-in SERVING accumulation flavor
    * (`Simd.dot4F`, float lanes — 2× FMA throughput where the 384-d scan
    * is compute-bound): approximate at ~2e-5 relative, so it can flip
    * only true near-ties; top-k SET equality vs the exact flavor is
    * SearchSpec-gated on the fixture. The default (and every oracle
    * path) keeps the double-lane contract.
    */
  def exactTopKFusedBlocked(blocked: DataFrame, queries: DataFrame, k: Int,
                            qidCol: String = "qid",
                            qvecCol: String = "qvec",
                            floatAcc: Boolean = false): DataFrame = {
    import graft.functions.expressions.BatchScore
    val (qids, qvecs) = collectQueries(queries, qidCol, qvecCol)
    val nq = qvecs.length
    val spark = blocked.sparkSession
    import spark.implicits._
    val fields = blocked.schema.fieldNames.toSet
    def partialsOf[T](ds: org.apache.spark.sql.Dataset[T])(
        score: (T, Int, Array[Double]) => Unit,
        idsOf: T => Array[Long]): org.apache.spark.sql.Dataset[(Long, Long, Double)] =
      ds.mapPartitions { it =>
        val agg = new TopKAggregator(k, larger = true)
        val bufs = Array.fill(nq)(agg.zero)
        val row = new Array[Double](nq)
        while (it.hasNext) {
          val blockRow = it.next()
          val ids = idsOf(blockRow)
          var r = 0
          while (r < ids.length) {
            score(blockRow, r, row)
            var q = 0
            while (q < nq) { agg.consider(bufs(q), ids(r), row(q)); q += 1 }
            r += 1
          }
        }
        bufs.iterator.zipWithIndex.flatMap { case (b, qi) =>
          (0 until b.n).iterator.map(i => (qids(qi), b.ids(i), b.scores(i)))
        }
      }
    val partials =
      if (fields("scales")) {
        partialsOf(blocked.select(col("ids"), col("codes"), col("scales"))
          .as[(Array[Long], Array[Byte], Array[Float])]) (
          { case ((ids, blob, scales), r, out) =>
            val stride = blob.length / ids.length
            BatchScore.scoreAllI8Slice(blob, r * stride, stride, scales(r), qvecs,
              out, floatAcc)
          }, _._1)
      } else if (fields("bits")) {
        partialsOf(blocked.select(col("ids"), col("bits"))
          .as[(Array[Long], Array[Byte])]) (
          { case ((ids, blob), r, out) =>
            val stride = blob.length / ids.length
            BatchScore.scoreAllHalfSlice(blob, r * stride, stride / 2, qvecs,
              out, floatAcc)
          }, _._1)
      } else {
        partialsOf(blocked.select(col("ids"), col("vecs"))
          .as[(Array[Long], Array[Byte])]) (
          { case ((ids, blob), r, out) =>
            val stride = blob.length / ids.length
            BatchScore.scoreAllF32Slice(blob, r * stride, stride / 4, qvecs,
              out, floatAcc)
          }, _._1)
      }
    TopK.perGroup(partials.toDF("qid", "gid", "score"),
      "qid", "gid", "score", k, larger = true)
      .withColumnRenamed("qid", qidCol)
  }

  /** Per-partition top-k over (id, scores-per-query) rows: the decode +
    * multi-query scoring stays in whole-stage codegen (the batch
    * expressions above), and only the K2 buffers live in this imperative
    * tail — each partition emits Q×k rows instead of the Q×N posexplode
    * stream the batched flavors feed through the aggregate. Also drives
    * `Pq.searchBatched`'s ADC scan (`larger = false` ranks ascending L2).
    */
  private[ops] def fusedScoredTopK(scored: DataFrame, qids: Array[Long], k: Int,
                                   qidCol: String,
                                   larger: Boolean = true): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    val nq = qids.length
    val partials = scored
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val agg = new TopKAggregator(k, larger)
        val bufs = Array.fill(nq)(agg.zero)
        while (it.hasNext) {
          val (id, row) = it.next()
          var q = 0
          while (q < nq) { agg.consider(bufs(q), id, row(q)); q += 1 }
        }
        bufs.iterator.zipWithIndex.flatMap { case (b, qi) =>
          (0 until b.n).iterator.map(i => (qids(qi), b.ids(i), b.scores(i)))
        }
      }
    TopK.perGroup(partials.toDF("qid", "gid", "score"),
      "qid", "gid", "score", k, larger)
      .withColumnRenamed("qid", qidCol)
  }

  /** Radius (range) search — every base row within `radius` of each query
    * (FAISS's `range_search` API shape; the reference exposes only top-k,
    * so this is additive). Ranking metrics keep rows scoring AT LEAST the
    * threshold (dot/cosine); distance metrics keep rows AT MOST it (L2).
    *
    * Boundary divergence from FAISS, deliberate: FAISS's `range_search`
    * uses STRICT inequalities (L2 `d < radius`, IP `d > radius`); here the
    * threshold is INCLUSIVE (>= / <=) — the SQL-predicate convention the
    * v10 DuckDB oracle shares. Callers porting FAISS expectations should
    * pass the next-representable radius (or post-filter `score != radius`)
    * if exact-boundary rows must be excluded.
    *
    * Deliberately the fully declarative plan: broadcast queries × streamed
    * base, codegen score, map-side filter. No top-k state, no shuffle at
    * all — output volume is the only thing that grows with matches, which
    * is exactly the 100 TB shape (the filter rides inside the scan stage).
    */
  def rangeSearch(base: DataFrame, queries: DataFrame, radius: Double,
                  metric: Metric = Metric.L2,
                  idCol: String = "id", vecCol: String = "vec",
                  qidCol: String = "qid", qvecCol: String = "qvec"): DataFrame = {
    val scored = base
      .crossJoin(broadcast(queries))
      .select(col(qidCol).as("qid"), col(idCol).as("id"),
        scoreCol(metric, vecCol, qvecCol).as("score"))
    val keep =
      if (metric.larger) col("score") >= radius else col("score") <= radius
    scored.filter(keep)
  }

  /** Exact ground truth build (`apps/nvdb_gt_build.cpp:74-104`):
    * top-k ids per query as an ordered array → (qid, gt_ids).
    */
  def groundTruth(base: DataFrame, queries: DataFrame, k: Int,
                  metric: Metric = Metric.Dot): DataFrame =
    exactTopK(base, queries, k, metric)
      .groupBy("qid")
      .agg(sort_array(collect_list(struct(col("rank"), col("id")))).as("ranked"))
      .select(col("qid"), expr("transform(ranked, r -> r.id)").as("gt_ids"))

  /** P5: fail-fast dim/shape validation, the analogue of the reference's
    * pre-scan checks (`apps/nvdb_search.cpp:20-24`,
    * `apps/nvdb_ivf_eval.cpp:343-347`): every base and query vector must
    * share one dimension. One cheap aggregate pass; call at pipeline
    * boundaries (index build, eval harness), not per query.
    */
  def requireSameDim(base: DataFrame, queries: DataFrame,
                     vecCol: String = "vec", qvecCol: String = "qvec"): Int = {
    val b = base.agg(min(size(col(vecCol))), max(size(col(vecCol)))).collect()(0)
    val q = queries.agg(min(size(col(qvecCol))), max(size(col(qvecCol)))).collect()(0)
    require(b.getInt(0) == b.getInt(1), s"ragged base dims ${b.getInt(0)}..${b.getInt(1)}")
    require(q.getInt(0) == q.getInt(1), s"ragged query dims ${q.getInt(0)}..${q.getInt(1)}")
    require(b.getInt(0) == q.getInt(0),
      s"dim mismatch: base ${b.getInt(0)} vs query ${q.getInt(0)}")
    b.getInt(0)
  }

  /** gtbin-style strict validation (S7): the reference refuses a cached GT
    * whose header/shape disagrees with the run
    * (`apps/nvdb_ivf_eval.cpp:360-383`); the Parquet analogue is a schema
    * check plus a uniform-k scan. Throws on mismatch.
    */
  def requireGroundTruth(gt: DataFrame, k: Int, nQueries: Long = -1L): Unit = {
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val sch = gt.schema
    require(sch.fieldNames.sameElements(Array("qid", "gt_ids")),
      s"GT schema must be (qid, gt_ids), got ${sch.fieldNames.mkString(",")}")
    require(sch("qid").dataType == LongType, "qid must be long")
    require(sch("gt_ids").dataType.isInstanceOf[ArrayType] &&
      sch("gt_ids").dataType.asInstanceOf[ArrayType].elementType == LongType,
      "gt_ids must be array<long>")
    val counts = gt.agg(
      count(lit(1)).as("q"),
      count(when(size(col("gt_ids")) =!= k, 1)).as("bad")).collect()(0)
    require(counts.getLong(1) == 0, s"${counts.getLong(1)} GT rows lack k=$k ids")
    if (nQueries >= 0)
      require(counts.getLong(0) == nQueries,
        s"GT has ${counts.getLong(0)} queries, expected $nQueries")
  }

  /** Candidate re-rank (refine) join (`apps/nvdb_ivf_eval.cpp:278-307`):
    * exact-L2 re-rank of per-query candidate id lists against the base.
    *
    * candidates: (qid, qvec, cand_ids: array<long>). The explode + equi-join
    * on base id shuffles only Q×R candidate rows, not the base: at scale the
    * base side is bucketed by id so this is a co-located hash join.
    */
  def refine(base: DataFrame, candidates: DataFrame, k: Int,
             idCol: String = "id", vecCol: String = "vec"): DataFrame = {
    // P4: drop sentinel/invalid candidate ids before the join — the
    // reference's validity filter (`apps/nvdb_ivf_eval.cpp:292-296,
    // 584-586`, sentinel 0xFFFFFFFF / id < 0). The equi-join would drop
    // them anyway, but filtering first keeps the shuffle free of them.
    val cand = candidates.select(col("qid"), col("qvec"),
      explode(col("cand_ids")).as("cand_id"))
      .filter(col("cand_id") >= 0)
    val scored = cand
      .join(base.select(col(idCol).as("cand_id"), col(vecCol).as("base_vec")), Seq("cand_id"))
      .select(col("qid"), col("cand_id"),
        VectorFunctions.l2Sq(col("base_vec"), col("qvec")).as("dist"))
    TopK.perGroup(scored, "qid", "cand_id", "dist", k, larger = false)
  }

  /** Write the base as a bucketed+sorted table: at 100 TB the refine
    * equi-join (J3) against a bucketed base shuffles ONLY the exploded
    * candidate rows — the base side reads its buckets in place (the
    * co-located join SURVEY §2.5 calls for). Bucket count should track
    * cluster size (e.g. 4096 at full scale).
    */
  def writeBucketedBase(base: DataFrame, table: String, buckets: Int = 256,
                        idCol: String = "id"): Unit =
    base.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, idCol).sortBy(idCol).saveAsTable(table)

  /** Recall@k vs ground truth (`apps/nvdb_ivf_eval.cpp:190-219,593`):
    * mean |GT ∩ predicted| / k over queries.
    *
    * pred: (qid, pred_ids); gt: (qid, gt_ids). Returns 1 row (mean_recall).
    */
  def recallAtK(pred: DataFrame, gt: DataFrame, k: Int): DataFrame =
    pred.join(gt, Seq("qid"))
      .select((size(array_intersect(col("pred_ids"), col("gt_ids"))) / k.toDouble).as("recall"))
      .agg(avg("recall").as("mean_recall"))
}
