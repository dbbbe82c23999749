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

  /** 4-bit fastscan search over a [[graft.io.QuantizedTables.writePq4Blocked]]
    * table — the batch-Q ADC regime rebuilt on the register-shuffle design
    * of André et al. (VLDB'15) / FAISS `IndexPQFastScan`, which is the
    * published answer to exactly the wall our 8-bit ADC hit at Q=512:
    * scalar LUT lookups are dependent loads (48/row/query), while a
    * 16-entry 4-bit LUT fits a SIMD register and `selectFrom` (AVX-512VBMI
    * `vpermb`) scores 64 rows per instruction pair.
    *
    * Pipeline per partition: stream the transposed code blocks once; for
    * each (query, 64-row group) compute EXACT u16 sums of the u8-quantized
    * LUT ([[graft.functions.expressions.PqOps.quantizeLuts]] — bounded
    * ≤ m4·delta/2 absolute error vs the float ADC sum); keep the `cand`
    * best rows per (query, partition) by quantized score (id tie-break),
    * stashing each survivor's 48-byte code slice; at partition end
    * re-rank every survivor with the EXACT float LUT and emit — so the
    * global top-k merge ranks on float-ADC scores and LUT quantization
    * affects recall only through bounded-error pruning (Pq4Spec gates
    * both the pruning recall and SIMD == scalar sum equality).
    *
    * Scale shape: queries broadcast (bounded), code table streams once,
    * shuffle carries Q × cand candidates per partition — never the corpus.
    */
  def searchFastScan(blocked4: DataFrame, queries: DataFrame, books: Codebooks,
                     k: Int, l2: Boolean = true, cand: Int = 0): DataFrame = {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import graft.functions.expressions.{PqOps, Simd}
    import graft.functions.expressions.VectorKernels
    val m4 = books.length
    require(books.forall(_.length == 16), "pq4 codebooks must have ksub=16")
    require(m4 % 2 == 0, s"pq4 m4 must be even, got $m4")
    require(m4 <= 256, // u16 lane-sum bound; see PqOps.quantizeLuts
      s"pq4 supports m4 <= 256 (u16 lane-sum bound), got $m4")
    val spMax = m4 / 2
    val spark = blocked4.sparkSession
    import spark.implicits._
    val q = queries.select(col("qid"), col("qvec")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    val qids = q.map(_._1)
    val lutsF = q.map { case (_, qv) =>
      PqOps.lut(new GenericArrayData(qv), books, l2).toFloatArray()
    }
    val larger = !l2
    val tables = lutsF.map(PqOps.quantizeLuts(_, m4, larger)._1)
    val nq = qids.length
    val c = if (cand > 0) cand else math.max(2 * k, 64)
    val simd = VectorKernels.simdEnabled && Simd.pq4Available
    val partials = blocked4.select(col("ids"), col("codes"))
      .as[(Array[Long], Array[Byte])]
      .mapPartitions { it =>
        // per-query bounded candidate reservoirs (quantized score,
        // id-tie-broken — the TopKAggregator.consider policy on ints)
        val rIds = Array.ofDim[Long](nq, c)
        val rQs = Array.ofDim[Int](nq, c)
        val rStash = Array.ofDim[Byte](nq, c * spMax)
        val rN = new Array[Int](nq)
        val rWorst = new Array[Int](nq)
        def worseThan(q1: Int, id1: Long, q2: Int, id2: Long): Boolean =
          q1 > q2 || (q1 == q2 && id1 > id2)
        def recomputeWorst(qi: Int): Unit = {
          val qs = rQs(qi); val ids = rIds(qi)
          var w = 0
          var i = 1
          while (i < rN(qi)) {
            if (worseThan(qs(i), ids(i), qs(w), ids(w))) w = i
            i += 1
          }
          rWorst(qi) = w
        }
        val out = new Array[Short](64)
        while (it.hasNext) {
          val (ids, blob) = it.next()
          val vpr = ids.length
          val groups = (vpr + 63) / 64
          require(blob.length == groups * spMax * 64,
            s"pq4 blob ${blob.length} != $groups groups × $spMax × 64")
          var g = 0
          while (g < groups) {
            val gOff = g * spMax * 64
            val len = math.min(64, vpr - g * 64)
            var qi = 0
            while (qi < nq) {
              if (simd) Simd.pq4Group(blob, gOff, m4, tables(qi), out)
              else PqOps.pq4GroupRef(blob, gOff, m4, tables(qi), out)
              val qs = rQs(qi); val cid = rIds(qi)
              var r = 0
              while (r < len) {
                val sc = out(r) & 0xffff
                val id = ids(g * 64 + r)
                if (rN(qi) < c) {
                  val n = rN(qi)
                  cid(n) = id; qs(n) = sc
                  var sp = 0
                  val sOff = n * spMax
                  while (sp < spMax) {
                    rStash(qi)(sOff + sp) = blob(gOff + sp * 64 + r); sp += 1
                  }
                  rN(qi) = n + 1
                  if (rN(qi) == c) recomputeWorst(qi)
                } else {
                  val w = rWorst(qi)
                  if (worseThan(qs(w), cid(w), sc, id)) {
                    cid(w) = id; qs(w) = sc
                    var sp = 0
                    val sOff = w * spMax
                    while (sp < spMax) {
                      rStash(qi)(sOff + sp) = blob(gOff + sp * 64 + r); sp += 1
                    }
                    recomputeWorst(qi)
                  }
                }
                r += 1
              }
              qi += 1
            }
            g += 1
          }
        }
        // exact float-ADC re-rank of every survivor (same lookups as the
        // 8-bit adc kernels — quantization never touches emitted scores)
        (0 until nq).iterator.flatMap { qi =>
          val lf = lutsF(qi)
          (0 until rN(qi)).iterator.map { i =>
            (qids(qi), rIds(qi)(i),
              PqOps.adcNibbles(rStash(qi), i * spMax, spMax, lf))
          }
        }
      }
    TopK.perGroup(partials.toDF("qid", "gid", "score"),
      "qid", "gid", "score", k, larger)
  }

  /** IVF-pruned 4-bit fastscan probe — FAISS `IndexIVFPQFastScan`'s shape
    * composed from [[searchFastScan]]'s kernel and [[ivfpqSearch]]'s
    * residual coarse stage. Per query: the `nprobe` nearest coarse cells;
    * per (query, cell) a RESIDUAL float LUT (q − centroid) and its
    * u8-quantized register tables. The scan streams ONLY probed cells of
    * the cluster-partitioned blocked table
    * ([[graft.io.QuantizedTables.writePq4BlockedClustered]] — parquet
    * partition pruning does the inverted-list skip). Candidate reservoirs
    * are kept PER (query, cell) in quantized space: quantized scores are
    * NOT comparable across cells (each (query, cell) LUT carries its own
    * bias/delta), so reservoirs never mix cells, and every survivor is
    * re-ranked with its own cell's EXACT float LUT before the global
    * top-k merge — emitted scores are exact residual-ADC sums, identical
    * to [[ivfpqSearch]]'s (Pq4Spec gates full-probe/full-candidate
    * equality).
    *
    * Scale shape: LUT tables are query-batch × nprobe bounded and ship in
    * the task closure like [[searchFastScan]]'s; shuffle carries
    * ≤ Q × nprobe × cand candidates — never the corpus.
    */
  def searchFastScanIvf(idx: Index, spark: SparkSession, queries: DataFrame,
                        nprobe: Int, k: Int, cand: Int = 0): DataFrame =
    searchFastScanIvfCollected(idx, spark, collectQueryVecs(queries),
      nprobe, k, cand)

  /** One canonical query-batch collect shared by every fastscan entry
    * point (r17): the refined-clustered composite used to collect the
    * query table TWICE per call (once in [[probedCells]], once here) —
    * two driver jobs where one suffices (guide §1.2: remove redundant
    * passes before tuning anything).
    */
  private[ops] def collectQueryVecs(
      queries: DataFrame): Array[(Long, Array[Float])] =
    queries.select(col("qid"), col("qvec")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)

  private def searchFastScanIvfCollected(idx: Index, spark: SparkSession,
                                         qArr: Array[(Long, Array[Float])],
                                         nprobe: Int, k: Int,
                                         cand: Int = 0): DataFrame = {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import graft.functions.expressions.{CentroidOps, PqOps, Simd}
    import graft.functions.expressions.VectorKernels
    import spark.implicits._
    val books = idx.books
    val m4 = books.length
    require(books.forall(_.length == 16), "pq4 codebooks must have ksub=16")
    require(m4 % 2 == 0, s"pq4 m4 must be even, got $m4")
    require(m4 <= 256, // u16 lane-sum bound; see PqOps.quantizeLuts
      s"pq4 supports m4 <= 256 (u16 lane-sum bound), got $m4")
    val spMax = m4 / 2
    val coarse = idx.coarse
    val q = qArr
    val qids = q.map(_._1)
    val nq = q.length
    val np = math.min(nprobe, coarse.length)
    val c = if (cand > 0) cand else math.max(2 * k, 64)
    // per (query, probe slot): probed cell, residual float LUT, u8 tables
    val probes = q.map(x => CentroidOps.topNprobeF(x._2, coarse, np))
    val lutsF = Array.ofDim[Array[Float]](nq, np)
    val tables = Array.ofDim[Array[Byte]](nq, np)
    var qi0 = 0
    while (qi0 < nq) {
      val qv = q(qi0)._2
      var p = 0
      while (p < np) {
        val cen = coarse(probes(qi0)(p))
        val res = new Array[Float](qv.length)
        var d = 0
        while (d < qv.length) { res(d) = qv(d) - cen(d); d += 1 }
        val lf = PqOps.lut(new GenericArrayData(res), books, l2 = true)
          .toFloatArray()
        lutsF(qi0)(p) = lf
        tables(qi0)(p) = PqOps.quantizeLuts(lf, m4, larger = false)._1
        p += 1
      }
      qi0 += 1
    }
    // cell -> packed (qi * np + p) slots that probe it
    val byCell: Map[Int, Array[Int]] = {
      val mb = scala.collection.mutable.HashMap
        .empty[Int, scala.collection.mutable.ArrayBuffer[Int]]
      var qi = 0
      while (qi < nq) {
        var p = 0
        while (p < np) {
          mb.getOrElseUpdate(probes(qi)(p),
            scala.collection.mutable.ArrayBuffer.empty[Int]) += (qi * np + p)
          p += 1
        }
        qi += 1
      }
      mb.map { case (cid, b) => cid -> b.toArray }.toMap
    }
    val probedCells = byCell.keys.toArray.sorted
    val simd = VectorKernels.simdEnabled && Simd.pq4Available
    // LUT state rides a broadcast, not the task closure: at Q=512 ×
    // nprobe=8 the tables + float LUTs are ~50 MB, which a closure would
    // re-deserialize PER TASK while a broadcast unpacks once per executor.
    // Registered with [[releaseBroadcasts]]: a sweep that calls this many
    // times per JVM (the nprobe/refineK frontiers) would otherwise
    // accumulate ~50 MB of executor-pinned blocks per call — the known
    // full-GC-stall hazard the bench settle discipline exists for.
    val bc = spark.sparkContext.broadcast((tables, lutsF, byCell))
    pendingBroadcasts.add(bc)
    val partials = blockedRelation(spark, idx.path)
      .filter(col("cluster_id").isInCollection(probedCells.toSeq))
      .select(col("cluster_id"), col("ids"), col("codes"))
      .as[(Int, Array[Long], Array[Byte])]
      .mapPartitions { it =>
        val (tables, lutsF, byCell) = bc.value
        // per-(query, cell) bounded reservoirs, lazily created for the
        // cells this partition actually holds; final content is the top-c
        // by (quantized score, id) — a total order, so arrival order
        // (and file-split planning) never changes the kept set
        final class Res {
          val ids = new Array[Long](c); val qs = new Array[Int](c)
          val stash = new Array[Byte](c * spMax)
          var n = 0; var worst = 0
          def recomputeWorst(): Unit = {
            var w = 0
            var i = 1
            while (i < n) {
              if (qs(i) > qs(w) || (qs(i) == qs(w) && ids(i) > ids(w))) w = i
              i += 1
            }
            worst = w
          }
        }
        val res = new java.util.HashMap[Int, Res]()
        val out = new Array[Short](64)
        while (it.hasNext) {
          val (cell, ids, blob) = it.next()
          val slots = byCell.getOrElse(cell, Array.emptyIntArray)
          val vpr = ids.length
          val groups = (vpr + 63) / 64
          require(blob.length == groups * spMax * 64,
            s"pq4 blob ${blob.length} != $groups groups × $spMax × 64")
          var si = 0
          while (si < slots.length) {
            val slot = slots(si)
            val tab = tables(slot / np)(slot % np)
            var r0 = res.get(slot)
            if (r0 == null) { r0 = new Res; res.put(slot, r0) }
            val qs = r0.qs; val cid = r0.ids
            var g = 0
            while (g < groups) {
              val gOff = g * spMax * 64
              val len = math.min(64, vpr - g * 64)
              if (simd) Simd.pq4Group(blob, gOff, m4, tab, out)
              else PqOps.pq4GroupRef(blob, gOff, m4, tab, out)
              var r = 0
              while (r < len) {
                val sc = out(r) & 0xffff
                val id = ids(g * 64 + r)
                if (r0.n < c) {
                  val n = r0.n
                  cid(n) = id; qs(n) = sc
                  var sp = 0
                  val sOff = n * spMax
                  while (sp < spMax) {
                    r0.stash(sOff + sp) = blob(gOff + sp * 64 + r); sp += 1
                  }
                  r0.n = n + 1
                  if (r0.n == c) r0.recomputeWorst()
                } else {
                  val w = r0.worst
                  if (qs(w) > sc || (qs(w) == sc && cid(w) > id)) {
                    cid(w) = id; qs(w) = sc
                    var sp = 0
                    val sOff = w * spMax
                    while (sp < spMax) {
                      r0.stash(sOff + sp) = blob(gOff + sp * 64 + r); sp += 1
                    }
                    r0.recomputeWorst()
                  }
                }
                r += 1
              }
              g += 1
            }
            si += 1
          }
        }
        // exact float-ADC re-rank with each survivor's OWN cell LUT
        import scala.jdk.CollectionConverters._
        res.entrySet().iterator().asScala.flatMap { e =>
          val slot = e.getKey; val r0 = e.getValue
          val lf = lutsF(slot / np)(slot % np)
          (0 until r0.n).iterator.map { i =>
            (qids(slot / np), r0.ids(i),
              PqOps.adcNibbles(r0.stash, i * spMax, spMax, lf))
          }
        }
      }
    TopK.perGroup(partials.toDF("qid", "gid", "score"),
      "qid", "gid", "score", k, larger = false)
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

  /** Broadcasts created by search calls whose DataFrames have been
    * returned to the caller (their lifetime is the caller's action, which
    * this layer cannot observe). [[releaseBroadcasts]] unpersists them
    * all — non-blocking, executor blocks only, so an already-materialized
    * result is unaffected and a re-executed plan re-fetches from the
    * driver. Call it between bench/sweep iterations; long-lived serving
    * sessions should call it on their own cadence.
    */
  private val pendingBroadcasts =
    new java.util.concurrent.ConcurrentLinkedQueue[
      org.apache.spark.broadcast.Broadcast[_]]()

  /** Unpersist every tracked search broadcast (executor copies only);
    * returns how many were released.
    */
  def releaseBroadcasts(): Int = {
    var n = 0
    var b = pendingBroadcasts.poll()
    while (b != null) {
      b.unpersist(blocking = false)
      n += 1
      b = pendingBroadcasts.poll()
    }
    n
  }

  /** One resolved relation per (session, index path): a fresh
    * `spark.read.parquet` re-builds the partitioned file index — at
    * nlist=1024 that is a per-CALL driver discovery pass over 1024
    * partition dirs, measured ~1.5 s of pure planning against a 0.14 s
    * pruned scan. The artifact is cached DDL (immutable once `_SUCCESS`
    * exists), so the relation is safely reusable for the session's life.
    * Keyed on `sessionUUID` — unique per session for the JVM's life, so a
    * stopped-then-GC'd session can never collide a new session onto a
    * DataFrame bound to the dead one (identityHashCode could).
    */
  private val relationCache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  private def blockedRelation(spark: SparkSession, path: String): DataFrame =
    relationCache.computeIfAbsent(
      s"${graft.core.GraftSession.uuid(spark)}|$path",
      _ => spark.read.parquet(path))

  /** Codebook sidecar, CRC32C-framed since r17 ([[graft.io.CheckedBlob]]:
    * a flipped float here skews every ADC score with no oracle in the
    * way). Legacy unframed files load through the fallback parse.
    */
  private[graft] def saveBooks(file: String, books: Codebooks): Unit =
    graft.io.CheckedBlob.write(file) { out =>
      out.writeInt(books.length)
      books.foreach { sub =>
        out.writeInt(sub.length)
        out.writeInt(if (sub.isEmpty) 0 else sub(0).length)
        sub.foreach(_.foreach(out.writeFloat))
      }
    }

  private[graft] def loadBooks(file: String): Option[Codebooks] =
    graft.io.CheckedBlob.read(file) { in =>
      val m = in.readInt()
      Array.fill(m) {
        val rows = in.readInt()
        val cols = in.readInt()
        Array.fill(rows)(Array.fill(cols)(in.readFloat()))
      }
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
    // |t6 versions the codebook trainer (graft Lloyd; see Ivf.buildOrGet)
    val key = s"$cacheKey|$nlist|$m|$ksub|$ntrain|$seed|t6"
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

  /** [[searchFastScanIvf]] candidates → exact-L2 vector refine — the
    * IVF-fastscan operating point (J3 on candidates from probed cells
    * only; the IVF analog of the flat `searchFastScan` + refine pair).
    */
  /** Wrap a candidate-stage probe with a serve-time EXCLUSION set (r16
    * maintenance): a takedown must suppress rows NOW, between the
    * relational delete (an anti-join rewrite of the clustered table —
    * cheap, partition-parallel batch DDL) and the next code-table
    * rebuild. The anti-join runs on the candidate stage's bounded output
    * (≤ Q·kSearch rows vs a broadcast id list), so exclusion costs
    * nothing corpus-shaped; the refine budget's slack (refineK − k)
    * absorbs the suppressed slots, exactly like the HNSW tombstones'
    * ef slack. Empty set → the identical unwrapped plan.
    */
  private def withExclusions(spark: SparkSession, excludeIds: Array[Long],
                             probe: Int => DataFrame): Int => DataFrame =
    if (excludeIds.isEmpty) probe
    else {
      import spark.implicits._
      val excl = broadcast(excludeIds.toSeq.toDF("id"))
      kk => probe(kk).join(excl, Seq("id"), "left_anti")
    }

  def searchFastScanIvfRefined(base: DataFrame, idx: Index,
                               queries: DataFrame, nprobe: Int, k: Int,
                               refineK: Int, idCol: String = "id",
                               vecCol: String = "vec",
                               excludeIds: Array[Long] = Array.empty): DataFrame = {
    val spark = base.sparkSession
    require(excludeIds.isEmpty || refineK > k,
      s"exclusions need refine slack: refineK ($refineK) must exceed k ($k) " +
        "— at refineK <= k the probe's final top-k is filtered with no " +
        "backfill, returning short results with gapped ranks")
    refineAdc(base, queries, k, refineK,
      withExclusions(spark, excludeIds,
        kk => searchFastScanIvf(idx, spark, queries, nprobe, kk)),
      idCol, vecCol)
  }

  /** The union of coarse cells the fastscan probe touches for this query
    * batch — driver-bounded (≤ Q × nprobe distinct ids), computed with
    * the SAME selection kernel [[searchFastScanIvf]] uses
    * ([[graft.functions.expressions.CentroidOps.topNprobeF]]), so the set
    * is exactly the candidate stage's.
    */
  def probedCells(coarse: Array[Array[Float]], queries: DataFrame,
                  nprobe: Int): Array[Int] =
    probedCellsOf(coarse, collectQueryVecs(queries).map(_._2), nprobe)

  private def probedCellsOf(coarse: Array[Array[Float]],
                            qvecs: Array[Array[Float]],
                            nprobe: Int): Array[Int] = {
    import graft.functions.expressions.CentroidOps
    val np = math.min(nprobe, coarse.length)
    qvecs.flatMap(CentroidOps.topNprobeF(_, coarse, np)).distinct.sorted
  }

  /** [[searchFastScanIvfRefined]] with the refine FETCH pruned to the
    * probed cells: `clustered` is a full-precision table partitioned by
    * the SAME coarse assignment as the index (e.g. `Ivf.buildOrGet` on
    * the same (base, nlist, ntrain, seed) — the trainer is deterministic,
    * so the two coarse quantizers are identical), and the probed-cell
    * union goes into the scan as a partition-column IN predicate.
    *
    * Why this exists (r13, measured at 3M×384d): the flat flavor's refine
    * streams the ENTIRE base against the broadcast candidates — a
    * 4.6 GB corpus scan that flattened the probe wall at ~1.4 s no
    * matter how far nlist pruned the fastscan stage (nlist 1024 → 4096
    * cut candidate-stage bytes 4× and moved the wall nothing). Every
    * candidate id comes from a probed cell by construction, so the
    * pruned fetch provably contains every candidate — results are
    * IDENTICAL to the flat flavor (Pq4Spec gates equality and the
    * partition-filter plan shape) while the fetch reads ~Q·nprobe/nlist
    * of the corpus instead of all of it: the FAISS refine-index shape
    * (codes + original vectors, both inverted-list-pruned).
    *
    * Takes the clustered table's [[Ivf.Index]] (not a bare DataFrame) so
    * the same-quantizer contract is CHECKED at runtime: a clustered table
    * partitioned by a different coarse assignment would silently drop
    * candidates absent from the pruned fetch — the one failure mode of
    * this flavor, and a realistic one across artifacts built under
    * different trainer versions.
    */
  def searchFastScanIvfRefinedClustered(clusteredIdx: Ivf.Index, idx: Index,
                                        queries: DataFrame, nprobe: Int,
                                        k: Int, refineK: Int,
                                        idCol: String = "id",
                                        vecCol: String = "vec",
                                        excludeIds: Array[Long] = Array.empty): DataFrame = {
    val nlist = idx.coarse.length
    require(excludeIds.isEmpty || refineK > k,
      s"exclusions need refine slack: refineK ($refineK) must exceed k ($k) " +
        "— at refineK <= k the probe's final top-k is filtered with no " +
        "backfill, returning short results with gapped ranks")
    require(clusteredIdx.centroids.length == nlist &&
      clusteredIdx.centroids.zip(idx.coarse).forall { case (a, b) => a.sameElements(b) },
      s"clustered table's coarse quantizer (nlist=${clusteredIdx.centroids.length}) " +
        s"differs from the fastscan index's (nlist=$nlist): a pruned fetch under a " +
        "mismatched partitioning silently drops refine candidates. Build both " +
        "artifacts from the same (base, nlist, ntrain, seed) under the same " +
        "trainer version — the trainer is deterministic, so identical inputs " +
        "give bitwise-identical quantizers.")
    val spark = queries.sparkSession
    // collect the query batch ONCE for cell pruning AND the probe (r17 —
    // this path used to run two identical collect jobs per call)
    val qArr = collectQueryVecs(queries)
    val cells = probedCellsOf(idx.coarse, qArr.map(_._2), nprobe)
    val clustered = clusteredIdx.clustered(spark)
    // Past ~nlist/2 probed cells (possible at large Q·nprobe) the IN-list
    // predicate degenerates into a giant filter over nearly every
    // partition; the unpruned fetch is then the better plan — identical
    // results, the flat flavor's scan. The absolute floor (512) keeps the
    // fallback off small fixtures where even an all-cells IN is trivial.
    val fetch =
      if (cells.length >= 512 && cells.length * 2 >= nlist)
        clustered.select(col(idCol), col(vecCol))
      else
        clustered.filter(col("cluster_id").isin(cells.map(c => c: Any): _*))
          .select(col(idCol), col(vecCol))
    refineAdc(fetch, queries, k, refineK,
      withExclusions(spark, excludeIds,
        kk => searchFastScanIvfCollected(idx, spark, qArr, nprobe, kk)),
      idCol, vecCol)
  }

  /** Build (or fetch) the IVF-fastscan index: coarse KMeans → residual
    * 4-bit codebooks (ksub=16) → encode → cluster-partitioned blocked
    * nibble table ([[graft.io.QuantizedTables.writePq4BlockedClustered]]).
    * Same artifact discipline as [[buildOrGet]]; serves
    * [[searchFastScanIvf]].
    */
  def buildOrGetIvf4(spark: SparkSession, base: => DataFrame, cacheKey: String,
                     nlist: Int, m4: Int, ntrain: Int, seed: Long = 42L,
                     idCol: String = "id", vecCol: String = "vec"): Index = {
    val key = s"$cacheKey|ivf4|$nlist|$m4|16|$ntrain|$seed|t6"
    indexCache.computeIfAbsent(key, _ => {
      val path = s"target/pq4_cache/${Ivf.cacheDigest(key)}"
      (Ivf.loadMatrix(s"$path.coarse.bin"), loadBooks(s"$path.books.bin")) match {
        case (Some(coarse), Some(books)) if new java.io.File(s"$path/_SUCCESS").isFile =>
          Index(coarse, books, path)
        case _ =>
          val coarse = Ivf.train(base, nlist, ntrain, seed, vecCol, idCol)
          val assigned = Ivf.assign(base, coarse, vecCol)
            .withColumn("residual",
              centroidResidual(col(vecCol), col("cluster_id"), coarse))
          val books = train(
            assigned.select(col(idCol), col("residual").as(vecCol)),
            m4, 16, ntrain, seed, vecCol, idCol)
          graft.io.QuantizedTables.writePq4BlockedClustered(
            assigned.select(col(idCol), col("cluster_id"),
              pqEncode(col("residual"), books).as("codes")),
            path, idCol = idCol)
          Ivf.saveMatrix(s"$path.coarse.bin", coarse)
          saveBooks(s"$path.books.bin", books)
          Index(coarse, books, path)
      }
    })
  }

  /** Append a batch to an IVF-fastscan index's blocked code table under
    * the FROZEN coarse quantizer and codebooks — the PQ half of
    * incremental index maintenance (r16; the graph half is
    * [[Hnsw.upsertWarmed]], the flat half [[Ivf.appendClustered]]).
    * FAISS's add-after-train split: arriving rows assign to their coarse
    * cell, encode against the frozen residual books, and land as new
    * blocked rows INSIDE the touched cluster_id partitions (block groups
    * are row-local — the pq4 blob carries its own length — so appended
    * blocks integrate with partition pruning and the register kernel
    * unchanged; re-training stays an offline DDL decision). Scores of
    * appended rows are bit-identical to a from-scratch encode of the
    * union under the same books (same expressions), so probe results
    * over the grown table equal a rebuilt table's (Pq4Spec gates it).
    *
    * Keep the refine table in step: append the same batch to the
    * clustered full-precision table ([[Ivf.appendClustered]]) BEFORE
    * serving [[searchFastScanIvfRefinedClustered]], or its pruned fetch
    * will miss the new candidates' vectors. Warm serving images over
    * this index are stale after an append — [[invalidateLocal]] then
    * re-[[warmLocalIvf4]]. For streams, wrap in `foreachBatch` with the
    * batchId as `token` (parquet append into partition dirs is not
    * transactional by itself; the flat family's exactly-once file-sink
    * path is [[graft.streaming.IndexStream.appendStream]]).
    *
    * `token` (r17) turns on the CRASH-SAFE protocol: the encoded batch
    * stages and commits through [[graft.io.StagedAppend]], so a crash at
    * any point leaves the old table generation servable and a RE-CALL
    * with the same token recovers (idempotent skip / replay) — no
    * manual cache wiping. `token = null` keeps the direct in-place
    * append for one-shot scratch artifacts that rebuild from scratch on
    * failure anyway (the bench's temp-dir copies); a maintained
    * production artifact should always pass a token.
    *
    * Returns the number of rows appended (the recorded count when the
    * token was already committed).
    */
  def appendIvf4(idx: Index, rows: DataFrame, idCol: String = "id",
                 vecCol: String = "vec", token: String = null): Long = {
    val batch = rows.select(col(idCol).cast("long").as("id"),
      col(vecCol).as("vec"))
    lazy val encoded = {
      val assigned = Ivf.assign(batch, idx.coarse)
        .withColumn("residual",
          centroidResidual(col("vec"), col("cluster_id"), idx.coarse))
      assigned.select(col("id"), col("cluster_id"),
        pqEncode(col("residual"), idx.books).as("codes"))
    }
    val n =
      if (token == null) {
        val n0 = batch.count()
        graft.io.QuantizedTables.writePq4BlockedClustered(
          encoded, idx.path, mode = "append")
        n0
      } else
        graft.io.StagedAppend.run(idx.path, token, batch.count()) { stage =>
          graft.io.QuantizedTables.writePq4BlockedClustered(encoded, stage)
        }
    // the grown table must re-list its files in every session (also on a
    // replayed commit: the moves may have completed just now)
    relationCache.keySet().removeIf(_.endsWith(s"|${idx.path}"))
    n
  }

  /** JVM-local image of an IVF-fastscan index for in-process serving:
    * per-cell (ids, nibble blob) plus an id-sorted full-precision vector
    * store for the exact refine. At 1M×384d this is ~48 MB of codes +
    * ~1.5 GB of f32 rows — an executor's corpus shard, the same
    * residency [[Hnsw.searchLocal]]'s graph cache assumes.
    */
  private final class LocalIvf4(
      // per cell, EVERY blocked segment (ids, packed nibble blob): the
      // stored table carries one row per (cell, 128-row block), so any
      // cell past the block size — every cell at production scale, and
      // every appendIvf4-touched cell — has several. (r16 fix: the warm
      // previously kept ONE row per cell via HashMap.put overwrite,
      // silently serving a fraction of each multi-block cell; the
      // fixture cells all fit one block, so only the 1M latency rows —
      // never recall-gated on the local tier — saw it.)
      val cellSegs: java.util.HashMap[Integer, Array[(Array[Long], Array[Byte])]],
      val vecIds: Array[Long], val vecs: Array[Array[Float]])

  private val localCache =
    new java.util.concurrent.ConcurrentHashMap[String, LocalIvf4]()

  /** Load (once per JVM) the serving image for `idx` under `cacheKey`:
    * the cluster-partitioned nibble table and the full-precision base
    * rows (id-sorted for binary-search refine lookups). Call before
    * [[searchLocalIvf4]] — a serving deployment pays this at executor
    * start, exactly like the HNSW graph warm-up.
    */
  def warmLocalIvf4(spark: SparkSession, idx: Index, cacheKey: String,
                    base: DataFrame, idCol: String = "id",
                    vecCol: String = "vec"): Unit = {
    localCache.computeIfAbsent(cacheKey, _ => {
      val segs = new java.util.HashMap[Integer,
        collection.mutable.ArrayBuffer[(Array[Long], Array[Byte])]]()
      blockedRelation(spark, idx.path)
        .select(col("cluster_id"), col("ids"), col("codes"))
        .collect().foreach { r =>
          val cell = Integer.valueOf(r.getInt(0))
          var b = segs.get(cell)
          if (b == null) {
            b = collection.mutable.ArrayBuffer
              .empty[(Array[Long], Array[Byte])]
            segs.put(cell, b)
          }
          b += ((r.getSeq[Long](1).toArray, r.getAs[Array[Byte]](2)))
        }
      val cellSegs =
        new java.util.HashMap[Integer, Array[(Array[Long], Array[Byte])]]()
      segs.forEach((cell, b) => cellSegs.put(cell, b.toArray))
      // the full-precision store streams partition-by-partition
      // (toLocalIterator): a corpus-sized collect() serializes every task
      // result into ONE job and trips spark.driver.maxResultSize at 1M×384d
      // (measured: 1028 MiB vs the 1 GiB default) — the image is the same,
      // the fetch is one job per partition
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Float])]
      base.select(col(idCol).cast("long"), col(vecCol))
        .toLocalIterator().forEachRemaining { r =>
          buf += ((r.getLong(0), r.getSeq[Float](1).toArray))
        }
      val rows = buf.sortBy(_._1).toArray
      new LocalIvf4(cellSegs, rows.map(_._1), rows.map(_._2))
    })
    ()
  }

  /** Drop a warmed serving image (index-generation retirement). */
  def invalidateLocal(cacheKey: String): Unit = { localCache.remove(cacheKey); () }

  /** Whether a warmed ivf4 serving image exists under `cacheKey` — the
    * loud-on-cold check the SQL serving surface makes before resolving
    * to [[searchLocalIvf4]].
    */
  def warmedLocal(cacheKey: String): Boolean = localCache.containsKey(cacheKey)

  /** In-process IVF-fastscan + exact-refine serve for a JVM holding the
    * warmed image — the per-query latency tier of [[searchFastScanIvf]],
    * the PQ analogue of [[Hnsw.searchLocal]]. No Spark job: the coarse
    * route, the per-cell residual register LUTs, the nibble-group scan
    * with per-cell quantized reservoirs, the float-ADC re-rank, and the
    * exact-L2 refine all run on the calling thread. Candidate selection
    * replicates [[searchFastScanIvf]]'s exactly (same reservoir bound and
    * (quantized score, id) policy, same float re-rank, same global
    * (score, id) top-refineK), and the refine replays [[Search.refine]]'s
    * l2Sq ranking — results are IDENTICAL to
    * [[searchFastScanIvfRefined]] for the same arguments (Pq4Spec gates
    * it; the identity needs refineK > k, hence the require — at
    * refineK == k the Spark twin skips its refine and returns ADC
    * scores, while this path always refines). The identity also assumes
    * each cluster's blocked rows land in ONE input partition on the
    * Spark side — [[blockedRelation]]'s layout contract (one blob row
    * per cell); a cell split across partitions would widen the Spark
    * side's candidate pool to a superset of the local reservoir's.
    *
    * `floatAcc = true` switches the refine's exact-L2 kernel to the
    * float-accumulation serving flavor ([[Simd.l2SqF]]) — can flip true
    * near-ties, so it is recall-gated only and no oracle/spec-identity
    * path enables it. Returns ≤ k (id, l2sq) pairs, best-first.
    */
  def searchLocalIvf4(qvec: Array[Float], idx: Index, cacheKey: String,
                      nprobe: Int, k: Int, refineK: Int = 100,
                      floatAcc: Boolean = false,
                      exclude: Long => Boolean = null): Array[(Long, Double)] = {
    import graft.functions.expressions.{CentroidOps, PqOps, Simd, VectorKernels}
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val img = localCache.get(cacheKey)
    require(img != null,
      s"no warmed ivf4 serving image under '$cacheKey' — call warmLocalIvf4 first")
    require(refineK > k, // the Spark twin skips the refine at refineK <= k
      s"searchLocalIvf4 always refines: need refineK ($refineK) > k ($k)")
    val books = idx.books
    val m4 = books.length
    val spMax = m4 / 2
    val coarse = idx.coarse
    val np = math.min(nprobe, coarse.length)
    val kSearch = math.max(refineK, k)
    val c = math.max(2 * kSearch, 64)
    val simd = VectorKernels.simdEnabled && Simd.pq4Available
    // global candidate pool (score asc, id tie): collected per cell after
    // the float re-rank, exactly the rows the Spark path's top-k merge sees
    val candIds = new Array[Long](np * c)
    val candScores = new Array[Double](np * c)
    var nCand = 0
    val probes = CentroidOps.topNprobeF(qvec, coarse, np)
    val out = new Array[Short](64)
    var p = 0
    while (p < np) {
      val cell = probes(p)
      val cellSegs = img.cellSegs.get(Integer.valueOf(cell))
      if (cellSegs != null) {
        val cen = coarse(cell)
        val res = new Array[Float](qvec.length)
        var d0 = 0
        while (d0 < qvec.length) { res(d0) = qvec(d0) - cen(d0); d0 += 1 }
        val lutF = PqOps.lut(new GenericArrayData(res), books, l2 = true)
          .toFloatArray()
        val tab = PqOps.quantizeLuts(lutF, m4, larger = false)._1
        // per-cell reservoir — same policy as searchFastScanIvf's Res
        val rIds = new Array[Long](c)
        val rQs = new Array[Int](c)
        val rStash = new Array[Byte](c * spMax)
        var rN = 0
        var rWorst = 0
        def recomputeWorst(): Unit = {
          var w = 0
          var i = 1
          while (i < rN) {
            if (rQs(i) > rQs(w) || (rQs(i) == rQs(w) && rIds(i) > rIds(w))) w = i
            i += 1
          }
          rWorst = w
        }
        // every blocked SEGMENT of this cell streams through the shared
        // per-cell reservoir — the group offsets are segment-local (each
        // blob's ragged tail group still occupies a full spMax·64 slot,
        // so offsets cannot carry across segment boundaries)
        var si = 0
        while (si < cellSegs.length) {
        val (ids, blob) = cellSegs(si)
        val vpr = ids.length
        val groups = (vpr + 63) / 64
        var g = 0
        while (g < groups) {
          val gOff = g * spMax * 64
          val len = math.min(64, vpr - g * 64)
          if (simd) Simd.pq4Group(blob, gOff, m4, tab, out)
          else PqOps.pq4GroupRef(blob, gOff, m4, tab, out)
          var r = 0
          while (r < len) {
            val sc = out(r) & 0xffff
            val id = ids(g * 64 + r)
            if (rN < c) {
              rIds(rN) = id; rQs(rN) = sc
              var sp = 0
              val sOff = rN * spMax
              while (sp < spMax) { rStash(sOff + sp) = blob(gOff + sp * 64 + r); sp += 1 }
              rN += 1
              if (rN == c) recomputeWorst()
            } else {
              val w = rWorst
              if (rQs(w) > sc || (rQs(w) == sc && rIds(w) > id)) {
                rIds(w) = id; rQs(w) = sc
                var sp = 0
                val sOff = w * spMax
                while (sp < spMax) { rStash(sOff + sp) = blob(gOff + sp * 64 + r); sp += 1 }
                recomputeWorst()
              }
            }
            r += 1
          }
          g += 1
        }
        si += 1
        }
        // float-ADC re-rank with this cell's exact LUT into the pool
        var i = 0
        while (i < rN) {
          candIds(nCand) = rIds(i)
          candScores(nCand) = PqOps.adcNibbles(rStash, i * spMax, spMax, lutF)
          nCand += 1
          i += 1
        }
      }
      p += 1
    }
    // global top-kSearch by (ADC score asc, id asc) — TopK.perGroup's
    // order. Serve-time exclusions (the Spark flavors' excludeIds twin)
    // drop AFTER the kSearch cut — the distributed anti-join filters the
    // candidate stage's top-kSearch output, so the local tier must too
    // for the a15-style equality to hold under exclusions
    val order1 = Array.range(0, nCand)
      .sortBy(i => (candScores(i), candIds(i)))
      .take(math.min(kSearch, nCand))
    val order = if (exclude == null) order1
                else order1.filterNot(i => exclude(candIds(i)))
    val take = order.length
    // exact-L2 refine over the full-precision store, top-k by (l2, id)
    val refIds = new Array[Long](take)
    val refD = new Array[Double](take)
    var j = 0
    while (j < take) {
      val id = candIds(order(j))
      val vi = java.util.Arrays.binarySearch(img.vecIds, id)
      require(vi >= 0, s"candidate id $id missing from the vector store")
      refIds(j) = id
      val v = img.vecs(vi)
      refD(j) =
        if (floatAcc && simd) Simd.l2SqF(qvec, v, math.min(qvec.length, v.length))
        else VectorKernels.l2Sq(qvec, v)
      j += 1
    }
    Array.range(0, take).sortBy(i => (refD(i), refIds(i))).take(k)
      .map(i => (refIds(i), refD(i)))
  }

  /** IVF-PQ probe: per query, nprobe nearest coarse cells; per (query,
    * cell) an ADC LUT over the RESIDUAL query (q − centroid); score only
    * rows in probed cells (partition-pruned join), top-k ascending L2.
    */
  def ivfpqSearch(idx: Index, spark: SparkSession, queries: DataFrame,
                  nprobe: Int, k: Int, idCol: String = "id"): DataFrame =
    ivfpqSearchOn(idx.encoded(spark), idx.coarse, idx.books, queries,
      nprobe, k, idCol)

  /** [[ivfpqSearch]] over an explicit row-wise (cluster_id, id, codes)
    * table — the oracle flavor Pq4Spec runs against an IVF-fastscan index
    * (whose stored table is the BLOCKED layout, not row-wise).
    */
  def ivfpqSearchOn(encoded: DataFrame, coarse: Array[Array[Float]],
                    books: Codebooks, queries: DataFrame,
                    nprobe: Int, k: Int, idCol: String = "id"): DataFrame = {
    val probed = queries.select(col("qid"), col("qvec"),
      explode(Ivf.nearestCentroids(col("qvec"), coarse, nprobe)).as("cluster_id"))
      .select(col("qid"), col("cluster_id"),
        pqLut(centroidResidual(col("qvec"), col("cluster_id"), coarse),
          books, l2 = true).as("lut"))
    val scored = encoded
      .join(broadcast(probed), Seq("cluster_id"))
      .select(col("qid"), col(idCol).as("gid"),
        pqAdc(col("codes"), col("lut")).as("score"))
    TopK.perGroup(scored, "qid", "gid", "score", k, larger = false)
  }
}
