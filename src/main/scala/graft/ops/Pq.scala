package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

import graft.functions.expressions.{CentroidResidual, PqAdc, PqEncode, PqLut}

/** Product quantization (C3): per-subspace k-means codebooks, byte codes,
  * ADC lookup-table scoring, optional IVF coarse stage with residual
  * encoding — the reference's `apps/nvdb_ivfpq_build.cpp:76-129` semantics
  * (PQ-without-OPQ first, per SURVEY §7.4.4).
  *
  * Scale design: codebooks are tiny (m × ksub × dsub floats) and broadcast
  * as codegen reference objects. The base table stores m BYTES per row
  * instead of D floats (64-d f32: 256 B → 8 B, the reference's 42 MB vs
  * 738 MB index). Search is the same broadcast-scan shape as exact search
  * but each row costs m lookups, and the scan reads only the codes column.
  */
object Pq {

  /** m × ksub × dsub codebook matrix. */
  type Codebooks = Array[Array[Array[Float]]]

  /** Train per-subspace k-means codebooks on the deterministic id-prefix.
    * `dim % m == 0` required (FAISS requires the same).
    */
  def train(base: DataFrame, m: Int, ksub: Int, ntrain: Int = 200000,
            seed: Long = 42L, vecCol: String = "vec",
            idCol: String = "id"): Codebooks = {
    // id-prefix via range predicate (ids are dense positional, SURVEY §1.1):
    // pushes to the scan instead of a global TakeOrdered over every partition
    val sample = Ivf.trainSample(base, ntrain, idCol).select(col(vecCol)).cache()
    try {
      val got = sample.count()
      require(got >= ksub,
        s"training sample has $got rows < ksub=$ksub: trainers contract on " +
          s"dense positional '$idCol' (SURVEY §1.1) — mint ids with " +
          "Ingest.withPositionalIds before indexing derived tables")
      val dim = sample.select(size(col(vecCol))).head().getInt(0)
      require(dim % m == 0, s"dim $dim not divisible by m=$m")
      val dsub = dim / m
      // per-subspace codebooks through the same fused-SIMD Lloyd trainer
      // as the coarse quantizer ([[Kmeans]]) — FAISS's 25-iter default
      // was overkill for ksub=256 sub-codebooks; 15 matches the r7 MLlib
      // setting this replaced
      (0 until m).map { s =>
        val sub = sample.select(slice(col(vecCol), s * dsub + 1, dsub).as("vec"))
        Kmeans.fit(sub, ksub, seed + s, maxIter = 15)
      }.toArray
    } finally sample.unpersist()
  }

  def pqEncode(vec: Column, books: Codebooks): Column =
    Bridge.column(PqEncode(Bridge.expression(vec), books))
  def pqLut(qvec: Column, books: Codebooks, l2: Boolean = true): Column =
    Bridge.column(PqLut(Bridge.expression(qvec), books, l2))
  def pqAdc(codes: Column, lut: Column): Column =
    Bridge.column(PqAdc(Bridge.expression(codes), Bridge.expression(lut)))
  def centroidResidual(vec: Column, cid: Column, cents: Array[Array[Float]]): Column =
    Bridge.column(CentroidResidual(Bridge.expression(vec), Bridge.expression(cid), cents))

  /** Encode the base: (id, codes) — the compressed index table. */
  def encode(base: DataFrame, books: Codebooks,
             idCol: String = "id", vecCol: String = "vec"): DataFrame =
    base.select(col(idCol), pqEncode(col(vecCol), books).as("codes"))

  /** Flat ADC search: broadcast queries carry their per-query LUT; every
    * base row costs m byte lookups. L2 flavor ranks ascending.
    */
  def search(encoded: DataFrame, queries: DataFrame, books: Codebooks, k: Int,
             l2: Boolean = true, idCol: String = "id"): DataFrame = {
    val q = queries.select(col("qid"), pqLut(col("qvec"), books, l2).as("lut"))
    val scored = encoded.crossJoin(broadcast(q))
      .select(col("qid"), col(idCol).as("gid"),
        pqAdc(col("codes"), col("lut")).as("score"))
    TopK.perGroup(scored, "qid", "gid", "score", k, larger = !l2)
  }

  /** Batched flat ADC search: the query batch's LUTs ride as ONE codegen
    * reference object, the code table streams once, and per-partition
    * top-k buffers absorb the scores (`Search.fusedScoredTopK`) — no Q×N
    * joined rows. Per-pair lookup-sums are [[PqOps.adc]]'s exactly
    * (driver builds LUTs with the same [[PqOps.lut]] the broadcast side
    * runs), so ranks match [[search]] (PqSpec gates it). This is the
    * probe shape for serving-latency measurements.
    */
  def searchBatched(encoded: DataFrame, queries: DataFrame, books: Codebooks,
                    k: Int, l2: Boolean = true, idCol: String = "id"): DataFrame = {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import graft.functions.expressions.{BatchAdcScores, PqOps}
    val q = queries.select(col("qid"), col("qvec")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    val qids = q.map(_._1)
    val luts = q.map { case (_, qv) =>
      PqOps.lut(new GenericArrayData(qv), books, l2).toFloatArray()
    }
    Search.fusedScoredTopK(
      encoded.select(col(idCol).cast("long"),
        Bridge.column(BatchAdcScores(Bridge.expression(col("codes")), luts))
          .as("scores")),
      qids, k, "qid", larger = !l2)
  }

  /** Batched ADC scan over a BLOCK-PACKED code table
    * (`QuantizedTables.writeBytesBlocked` — up to 128 id-sorted code rows
    * per stored row, one contiguous blob): the 1M row-wise ADC scan pays
    * ~µs-per-row plan overhead to read 48 BYTES of codes, which dwarfs
    * the 768 L2-resident lookups the row actually costs — the same
    * fixed-cost wall the blocked vector scans hit, fixed the same way.
    * Lookup-sums are bitwise [[searchBatched]]'s ([[PqOps.adcAllSlice]];
    * PqSpec gates rank equality).
    */
  def searchBatchedBlocked(blocked: DataFrame, queries: DataFrame,
                           books: Codebooks, k: Int,
                           l2: Boolean = true): DataFrame = {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import graft.functions.expressions.PqOps
    val spark = blocked.sparkSession
    import spark.implicits._
    val q = queries.select(col("qid"), col("qvec")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    val qids = q.map(_._1)
    val luts = q.map { case (_, qv) =>
      PqOps.lut(new GenericArrayData(qv), books, l2).toFloatArray()
    }
    val nq = qids.length
    val larger = !l2
    val partials = blocked.select(col("ids"), col("codes"))
      .as[(Array[Long], Array[Byte])]
      .mapPartitions { it =>
        val agg = new TopKAggregator(k, larger)
        val bufs = Array.fill(nq)(agg.zero)
        // QUERY-TILED scan (r11): the flat row×query loop streams every
        // query's m×ksub LUT (49 KB at m=48 — Q=512 ⇒ 25 MB) through
        // 48 random lookups per row, so at batch Q every lookup misses
        // to L3 (~55 cycles/op measured via ann_pq_adc_blocked_q512's
        // first cut). Tiling queries keeps a ≤1.6 MB LUT tile
        // L2-resident across the whole 128-row block. Per-(row, query)
        // lookup-sum order is unchanged — scores are bitwise identical
        // (PqSpec rank gates) — only the cache residency moves.
        val tile = 32
        val r4 = new Array[Double](4)
        while (it.hasNext) {
          val (ids, blob) = it.next()
          val stride = blob.length / ids.length
          var q0 = 0
          while (q0 < nq) {
            val q1 = math.min(q0 + tile, nq)
            var r = 0
            // 4-row interleave (PqOps.adcSlice4): the lookup chains are
            // latency-bound; four independent rows overlap their loads.
            // Per-query consider order stays row-ascending — identical
            // buffers, bitwise-identical sums.
            while (r + 4 <= ids.length) {
              val off = r * stride
              var qi = q0
              while (qi < q1) {
                PqOps.adcSlice4(blob, off, off + stride, off + 2 * stride,
                  off + 3 * stride, stride, luts(qi), r4)
                val buf = bufs(qi)
                agg.consider(buf, ids(r), r4(0))
                agg.consider(buf, ids(r + 1), r4(1))
                agg.consider(buf, ids(r + 2), r4(2))
                agg.consider(buf, ids(r + 3), r4(3))
                qi += 1
              }
              r += 4
            }
            while (r < ids.length) { // ragged tail
              val off = r * stride
              var qi = q0
              while (qi < q1) {
                agg.consider(bufs(qi), ids(r),
                  PqOps.adcSlice(blob, off, stride, luts(qi)))
                qi += 1
              }
              r += 1
            }
            q0 = q1
          }
        }
        bufs.iterator.zipWithIndex.flatMap { case (b, qi) =>
          (0 until b.n).iterator.map(i => (qids(qi), b.ids(i), b.scores(i)))
        }
      }
    TopK.perGroup(partials.toDF("qid", "gid", "score"),
      "qid", "gid", "score", k, larger)
  }

  /** ADC candidates → exact-L2 refine (J3), the reference's
    * PQ+Refine operating point (recall 0.974 @ R=50, `Performance.md:623`).
    * `batched = true` generates candidates via [[searchBatched]] (same
    * ranks, one code-table pass for the whole query batch).
    */
  def searchRefined(base: DataFrame, encoded: DataFrame, queries: DataFrame,
                    books: Codebooks, k: Int, refineK: Int, l2: Boolean = true,
                    idCol: String = "id", vecCol: String = "vec",
                    batched: Boolean = false): DataFrame = {
    def adc(kk: Int) =
      if (batched) searchBatched(encoded, queries, books, kk, l2, idCol)
      else search(encoded, queries, books, kk, l2, idCol)
    refineAdc(base, queries, k, refineK, adc, idCol, vecCol)
  }

  /** [[searchRefined]] over the block-packed code table. */
  def searchRefinedBlocked(base: DataFrame, blocked: DataFrame,
                           queries: DataFrame, books: Codebooks, k: Int,
                           refineK: Int, l2: Boolean = true,
                           idCol: String = "id", vecCol: String = "vec"): DataFrame =
    refineAdc(base, queries, k, refineK,
      kk => searchBatchedBlocked(blocked, queries, books, kk, l2), idCol, vecCol)

  private def refineAdc(base: DataFrame, queries: DataFrame, k: Int,
                        refineK: Int, adc: Int => DataFrame,
                        idCol: String, vecCol: String): DataFrame = {
    val kSearch = math.max(refineK, k)
    if (refineK <= k) adc(k)
    else {
      val cands = adc(kSearch)
        .groupBy("qid").agg(collect_list(col("id")).as("cand_ids"))
        .join(queries, Seq("qid"))
        .select(col("qid"), col("qvec"), col("cand_ids"))
      // query-batch-bounded candidate side: broadcast so the base streams
      // in place (see Ivf.searchRefined)
      Search.refine(base.select(col(idCol), col(vecCol)), broadcast(cands),
        k, idCol, vecCol)
    }
  }

  /** A built IVF-PQ index: coarse centroids, residual codebooks, and the
    * clustered+encoded table path (cluster_id, id, codes).
    */
  final case class Index(coarse: Array[Array[Float]], books: Codebooks,
                         path: String) {
    def encoded(spark: SparkSession): DataFrame = spark.read.parquet(path)
  }

  private val indexCache =
    new java.util.concurrent.ConcurrentHashMap[String, Index]()

  private[graft] def saveBooks(file: String, books: Codebooks): Unit = {
    val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
      new java.io.FileOutputStream(file)))
    try {
      out.writeInt(books.length)
      books.foreach { sub =>
        out.writeInt(sub.length)
        out.writeInt(if (sub.isEmpty) 0 else sub(0).length)
        sub.foreach(_.foreach(out.writeFloat))
      }
    } finally out.close()
  }

  private[graft] def loadBooks(file: String): Option[Codebooks] =
    if (!new java.io.File(file).isFile) None
    else {
      val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
        new java.io.FileInputStream(file)))
      try {
        val m = in.readInt()
        Some(Array.fill(m) {
          val rows = in.readInt()
          val cols = in.readInt()
          Array.fill(rows)(Array.fill(cols)(in.readFloat()))
        })
      } catch { case _: java.io.IOException => None }
      finally in.close()
    }

  /** Build (or fetch) an IVF-PQ index: coarse KMeans → residual = vec −
    * coarse centroid → per-subspace codebooks trained on residuals →
    * encode all rows → write partitioned by cluster_id. Exactly the
    * reference's build pipeline (`nvdb_ivfpq_build.cpp:98-129`), with
    * partition pruning standing in for inverted-list skipping. On-disk
    * artifacts (encoded table + coarse centroids + codebooks) are reused
    * across JVMs, like the reference's saved `.faiss` files.
    */
  def buildOrGet(spark: SparkSession, base: => DataFrame, cacheKey: String,
                 nlist: Int, m: Int, ksub: Int, ntrain: Int,
                 seed: Long = 42L, idCol: String = "id",
                 vecCol: String = "vec"): Index = {
    // |t5 versions the codebook trainer (graft Lloyd; see Ivf.buildOrGet)
    val key = s"$cacheKey|$nlist|$m|$ksub|$ntrain|$seed|t5"
    indexCache.computeIfAbsent(key, _ => {
      val path = s"target/pq_cache/${Ivf.cacheDigest(key)}"
      (Ivf.loadMatrix(s"$path.coarse.bin"), loadBooks(s"$path.books.bin")) match {
        case (Some(coarse), Some(books)) if new java.io.File(s"$path/_SUCCESS").isFile =>
          Index(coarse, books, path)
        case _ =>
          val coarse = Ivf.train(base, nlist, ntrain, seed, vecCol, idCol)
          val assigned = Ivf.assign(base, coarse, vecCol)
            .withColumn("residual", centroidResidual(col(vecCol), col("cluster_id"), coarse))
          val books = train(
            assigned.select(col(idCol), col("residual").as(vecCol)),
            m, ksub, ntrain, seed, vecCol, idCol)
          assigned
            .select(col(idCol), col("cluster_id"), pqEncode(col("residual"), books).as("codes"))
            .write.mode("overwrite").partitionBy("cluster_id").parquet(path)
          Ivf.saveMatrix(s"$path.coarse.bin", coarse)
          saveBooks(s"$path.books.bin", books)
          Index(coarse, books, path)
      }
    })
  }

  /** IVF-PQ probe: per query, nprobe nearest coarse cells; per (query,
    * cell) an ADC LUT over the RESIDUAL query (q − centroid); score only
    * rows in probed cells (partition-pruned join), top-k ascending L2.
    */
  def ivfpqSearch(idx: Index, spark: SparkSession, queries: DataFrame,
                  nprobe: Int, k: Int, idCol: String = "id"): DataFrame = {
    val probed = queries.select(col("qid"), col("qvec"),
      explode(Ivf.nearestCentroids(col("qvec"), idx.coarse, nprobe)).as("cluster_id"))
      .select(col("qid"), col("cluster_id"),
        pqLut(centroidResidual(col("qvec"), col("cluster_id"), idx.coarse),
          idx.books, l2 = true).as("lut"))
    val scored = idx.encoded(spark)
      .join(broadcast(probed), Seq("cluster_id"))
      .select(col("qid"), col(idCol).as("gid"),
        pqAdc(col("codes"), col("lut")).as("score"))
    TopK.perGroup(scored, "qid", "gid", "score", k, larger = false)
  }
}
