package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Eval, Hnsw, Ivf, Metric, Packing, Pq, Sampling, Search, TextAnalysis}

/** Cumulative shuffle-byte tally across all tasks — the measurement
  * behind the "shuffle ∝ candidates, not corpus²" scale gates. Listener
  * delivery is async: read the counters only after a short drain pause.
  */
class ShuffleTally extends SparkListener {
  val write = new AtomicLong
  val read = new AtomicLong
  override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
    val m = t.taskMetrics
    if (m != null) {
      write.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      read.addAndGet(m.shuffleReadMetrics.totalBytesRead)
    }
  }
}

/** Scale evidence above the oracle gate's toy sizes, recorded into
  * `BENCH_SCALE.json`:
  *
  *  - curation/dedup/packing family on a ≥100k-doc [[SyntheticCorpus]]:
  *    per-op wall time, cardinalities, bucket tails, per-op shuffle
  *    bytes, connected-components convergence;
  *  - ANN family on a ≥1M-vector [[SyntheticVectors]] corpus: IVF
  *    build/probe frontier (recall + latency + scanned rows per nprobe —
  *    probe cost must track nprobe/nlist, not the corpus), sign-LSH
  *    frontier points, PQ compression ratio vs the flat table, refine
  *    shuffle bytes against a plain vs bucketed base, and the
  *    staged|interleaved pipeline flavors.
  *
  * The pass/fail versions of these invariants live in `CurationScaleSpec`
  * and `AnnScaleSpec`; this artifact is the recorded-numbers side.
  *
  * Env: SPARK_GRAFT_SCALE_N (docs, default 200000), SPARK_GRAFT_ANN_N
  * (vectors, default 1000000), SPARK_GRAFT_ANN_DIM (default 384),
  * SPARK_GRAFT_CPUS, SPARK_GRAFT_SCALE_ONLY (name filter, both families),
  * SPARK_GRAFT_SCALE_RUNS (default 2).
  */
object BenchScale {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_SCALE_N", "200000").toLong
    val annN = sys.env.getOrElse("SPARK_GRAFT_ANN_N", "1000000").toLong
    val annDim = sys.env.getOrElse("SPARK_GRAFT_ANN_DIM", "384").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-bench-scale"),
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tally = new ShuffleTally
    spark.sparkContext.addSparkListener(tally)

    def dirBytes(path: String): Long = {
      val f = new java.io.File(path)
      if (!f.isDirectory) 0L
      else f.listFiles().map(c => if (c.isDirectory) dirBytes(c.getPath) else c.length()).sum
    }

    // dev aid: SPARK_GRAFT_SCALE_ONLY=d12_boilerplate,ann_ivf; SPARK_GRAFT_SCALE_RUNS=3
    val only = sys.env.get("SPARK_GRAFT_SCALE_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val runsPer = sys.env.getOrElse("SPARK_GRAFT_SCALE_RUNS", "2").toInt
    def measure(into: scala.collection.mutable.LinkedHashMap[String, Map[String, Double]],
                name: String, op: () => Map[String, Double]): Unit = {
      if (!only.forall(_.contains(name))) return
      op() // warmup: codegen + JIT, not recorded (same discipline as Bench)
      // Bench.settle()'s discipline: the first GC enqueues dead
      // broadcast/shuffle weak refs from preceding ops, the ContextCleaner
      // performs its async deletions inside the sleep, the second GC
      // reclaims what it released — otherwise earlier ops' cleanup lands
      // inside this op's timed runs (measured: d12 21.2 s mid-sweep vs
      // 6.6 s isolated on identical code and shuffle bytes).
      // releaseBroadcasts: the fastscan-IVF search calls register their
      // ~50 MB LUT broadcasts for exactly this hook — a frontier sweep
      // makes dozens of calls per JVM and the executor-pinned blocks are
      // otherwise invisible to GC.
      Pq.releaseBroadcasts()
      System.gc()
      Thread.sleep(400)
      System.gc()
      var extra = Map.empty[String, Double]
      val samples = Seq.fill(runsPer) {
        val t0 = System.nanoTime()
        extra = op()
        (System.nanoTime() - t0) / 1e9
      }
      val sec = samples.min // best-of: single-JVM cold-cache noise is one-sided
      // shuffle bytes for exactly one run: delta around a final measured pass
      Thread.sleep(700) // listener bus drain
      val w0 = tally.write.get(); val r0 = tally.read.get()
      op()
      Thread.sleep(700)
      into(name) = Map(
        "sec" -> sec,
        "shuffle_write_mb" -> (tally.write.get() - w0) / 1e6,
        "shuffle_read_mb" -> (tally.read.get() - r0) / 1e6) ++ extra
      println(f"[scale] $name%-22s ${sec}%8.2f s  ${into(name)("shuffle_write_mb")}%9.1f MB shuffled  $extra")
    }

    // ---------------- curation family (n docs) ----------------
    // materialize through parquet so every op pays a realistic scan
    val corpusPath = "target/scale_corpus"
    SyntheticCorpus.documents(spark, n)
      .write.mode("overwrite").parquet(corpusPath)
    val docs = spark.read.parquet(corpusPath)
    val corpusBytes = dirBytes(corpusPath)

    val results = scala.collection.mutable.LinkedHashMap.empty[String, Map[String, Double]]
    def run(name: String)(op: => Map[String, Double]): Unit =
      measure(results, name, () => op)

    run("d9_lsh64_pairs") {
      Map("n_pairs" -> Dedup.minhashLshPairs64(docs).count().toDouble)
    }
    run("d9_bucket_tail") {
      val top = Dedup.lsh64BucketSizes(docs).limit(1).collect()(0).getLong(2)
      Map("max_bucket" -> top.toDouble)
    }
    run("d10_simhash_dups") {
      Map("n_pairs" -> Dedup.simhashNearDups(docs, maxHamming = 8).count().toDouble)
    }
    run("d11_decontaminate") {
      val hits = Dedup.decontaminate(
        corpus = docs.filter(col("doc_id") % 97 =!= 0),
        benchmark = docs.filter(col("doc_id") % 97 === 0), gramTokens = 4)
      Map("rows" -> hits.count().toDouble,
        "n_contaminated" -> hits.filter(!col("keep")).count().toDouble)
    }
    // noop WRITE, not count(): count over this left join lets Catalyst
    // eliminate the join entirely (unique right keys), timing nothing
    // shuffle-floor accounting (r8 verdict task #7), computed OUTSIDE the
    // timed block: exact per-gram document frequency cannot move less
    // than one partial-combined (gram64, count) record per UNIQUE gram —
    // floor_mb records that ~16 B/record bound so the measured shuffle
    // grades against it. At 200k docs the corpus has ~3.42M unique grams
    // → ~54.7 MB floor vs 82.7 MB measured (1.5×); the gap is high-df
    // grams emitting one partial per map partition they touch, inherent
    // to partial aggregation (the no-combine alternative shuffles the
    // full 14.5M-pair exploded table and measured 163.6 MB, see
    // Dedup.boilerplateRatio's window-shape note).
    // exact countDistinct (it runs OUTSIDE the timed block, so exactness
    // is free): the recorded floor_mb and the ~1.5× measured-vs-floor gap
    // are quoted as exact bounds, which an rsd=0.01 sketch would silently
    // blur by ±1–2%
    val d12UniqGrams =
      if (only.forall(_.contains("d12_boilerplate")))
        docs.select(explode(
          graft.functions.TextFunctions.tokenGrams64(col("text"), 3)).as("g"))
          .agg(countDistinct(col("g"))).head().getLong(0)
      else 0L
    run("d12_boilerplate") {
      Dedup.boilerplateRatio(docs, gramTokens = 3, minDocs = 5)
        .write.format("noop").mode("overwrite").save()
      Map("rows" -> n.toDouble, "uniq_grams" -> d12UniqGrams.toDouble,
        "floor_mb" -> d12UniqGrams * 16.0 / 1e6)
    }
    run("p4_stratified_sample") {
      Map("rows" -> Sampling.stratifiedSample(docs, col("lang"), 1000, "doc_id")
        .count().toDouble)
    }
    run("s9_pack") {
      val packed = Packing.pack(docs, budget = 2048, shards = 64, stratum = "source")
      val maxGroup = packed.groupBy(col("source"), col("shard"))
        .agg(count(lit(1)).as("c")).agg(max(col("c"))).collect()(0).getLong(0)
      Map("rows" -> packed.count().toDouble, "max_window_group" -> maxGroup.toDouble)
    }
    // noop write again: count() of a pure projection prunes the kernel
    run("t1_text_stats") {
      TextAnalysis.textStats(docs).write.format("noop").mode("overwrite").save()
      Map("rows" -> n.toDouble)
    }
    // transitive dedup over the real d9 candidate pairs — the one dedup op
    // whose cost is iterations × one-label-shuffle; convergence depth and
    // component structure are the scale story
    run("cc_components") {
      val pairs = Dedup.minhashLshPairs64(docs)
      val cc = Dedup.connectedComponentsStats(pairs)
      val nNodes = cc.labels.count()
      val nComp = cc.labels.select("component").distinct().count()
      cc.labels.unpersist()
      Map("iterations" -> cc.iterations.toDouble,
        "converged" -> (if (cc.converged) 1.0 else 0.0),
        "n_nodes" -> nNodes.toDouble, "n_components" -> nComp.toDouble)
    }

    // ---------------- ANN family (annN vectors) ----------------
    val annResults = scala.collection.mutable.LinkedHashMap.empty[String, Map[String, Double]]
    def runAnn(name: String)(op: => Map[String, Double]): Unit =
      measure(annResults, name, () => op)
    var ivfFrontier: Array[org.apache.spark.sql.Row] = Array.empty
    var lshFrontier: Array[org.apache.spark.sql.Row] = Array.empty
    var hnswFrontier: Array[org.apache.spark.sql.Row] = Array.empty
    var hnswMidFrontier: Array[org.apache.spark.sql.Row] = Array.empty
    var hnswHardFrontier: Array[org.apache.spark.sql.Row] = Array.empty
    val annOn = only.forall(_.exists(_.startsWith("ann_")))
    if (annOn) {
      val k = 10
      val nlist = 1024
      // Low-intrinsic-dimension corpus (see SyntheticVectors.lowRank):
      // a recoverable mixture saturates recall at 1.0 for every nprobe,
      // and iid-uniform data breaks the cost axis (k-means centroids
      // collapse — measured: the 8 nearest of 1024 lists held ~80% of
      // 1M vectors). The low-rank manifold gives both axes honestly:
      // near-balanced lists AND a recall curve that climbs with nprobe.
      val annKey = s"annscale_${annN}_lr8"
      val vecPath = s"target/scale_vectors_${annN}_${annDim}_lr8"
      if (!new java.io.File(s"$vecPath/_SUCCESS").isFile)
        SyntheticVectors.lowRank(spark, annN, annDim, intrinsic = 8)
          .write.mode("overwrite").parquet(vecPath)
      val base = spark.read.parquet(vecPath)
      val flatBytes = dirBytes(vecPath)
      // 16-query batches: at nprobe=8 the probed union is ~1.5% of the
      // lists, so partition pruning has something to prune — a 64-query
      // batch at nprobe=32 touches most of the table and the latency axis
      // degenerates to a full scan regardless of the index
      val queries = base.filter(col("id") < 16)
        .select(col("id").as("qid"), col("vec").as("qvec")).cache()
      queries.count()

      // exact-scan anchor: the latency a pruned probe must beat, and the GT.
      // FUSED flavor (r9): all three ladder points run the same fused
      // partition-scan plan (per-partition top-k buffers inside the scan,
      // no Q×N exploded stream), so the ladder isolates the STORAGE
      // FORMAT axis — the batched-expression flavors stay oracle-gated at
      // fixture scale (QuantScanSpec bitwise equality).
      runAnn("ann_exact_scan") {
        Map("rows" -> Search.exactTopKFused(base, queries, k, Metric.Dot)
          .count().toDouble, "stored_mb" -> flatBytes / 1e6)
      }

      // storage-format ladder (`Performance.md:191,242-255`: FP16 rides
      // the bandwidth ceiling, INT8 1.8-1.9x over it): same fused scan,
      // scoring against the stored representation — the wall-clock
      // trend should track bytes-per-vector, and the recorded stored_mb
      // pins the 2x / 4x storage cut alongside
      val f16Path = s"target/scale_f16_${annN}_$annDim"
      if (!new java.io.File(s"$f16Path/_SUCCESS").isFile)
        graft.io.QuantizedTables.writeF16(base, f16Path)
      val i8Path = s"target/scale_i8_${annN}_$annDim"
      if (!new java.io.File(s"$i8Path/_SUCCESS").isFile)
        graft.io.QuantizedTables.writeI8(base, i8Path)
      val f16base = graft.io.QuantizedTables.readF16(spark, f16Path)
      val i8base = graft.io.QuantizedTables.readI8(spark, i8Path)
      runAnn("ann_scan_f16") {
        Map("rows" -> Search.exactTopKFusedHalf(f16base, queries, k,
          bitsCol = "bits").count().toDouble,
          "stored_mb" -> dirBytes(f16Path) / 1e6)
      }
      runAnn("ann_scan_i8") {
        Map("rows" -> Search.exactTopKFusedI8(i8base, queries, k)
          .count().toDouble, "stored_mb" -> dirBytes(i8Path) / 1e6)
      }

      // BLOCKED ladder (r9): the row-wise scans above pay ~16 µs/row of
      // fixed pipeline cost — 10× the kernel time — so their wall time
      // cannot track stored bytes however the payload is encoded
      // (measured: BINARY-per-row packing moved nothing). Packing 128
      // id-sorted vectors per stored row amortizes that fixed cost away;
      // THIS is the layout whose ladder should approach the reference's
      // bandwidth economics (INT8 1.82–1.90× over FP16,
      // `Performance.md:242-255`), and the layout a 100 TB deployment
      // would store scan corpora in.
      val f32bPath = s"target/scale_f32b_${annN}_$annDim"
      if (!new java.io.File(s"$f32bPath/_SUCCESS").isFile)
        graft.io.QuantizedTables.writeF32Blocked(base, f32bPath)
      val f16bPath = s"target/scale_f16b_${annN}_$annDim"
      if (!new java.io.File(s"$f16bPath/_SUCCESS").isFile)
        graft.io.QuantizedTables.writeF16Blocked(base, f16bPath)
      val i8bPath = s"target/scale_i8b_${annN}_$annDim"
      if (!new java.io.File(s"$i8bPath/_SUCCESS").isFile)
        graft.io.QuantizedTables.writeI8Blocked(base, i8bPath)
      for ((tag, path) <- Seq(("f32", f32bPath), ("f16", f16bPath), ("i8", i8bPath))) {
        val t = graft.io.QuantizedTables.readBlocked(spark, path)
        runAnn(s"ann_scan_${tag}_blocked") {
          Map("rows" -> Search.exactTopKFusedBlocked(t, queries, k)
            .count().toDouble, "stored_mb" -> dirBytes(path) / 1e6)
        }
      }
      // deeper batch (Q=64): at Q=16 a ~0.3 s fixed job cost (scheduler +
      // plan + collect — see ann_hnsw_single_breakdown's noop_job_sec)
      // drowns the per-byte deltas and the format ratios wander run to
      // run; 64 queries amortize it the way the reference's Q=1000
      // batches do (`Performance.md:242-255` measures INT8's 1.82–1.90×
      // at Q=1000), so THIS trio is the stored-bytes-economics reading.
      val queries64 = base.filter(col("id") < 64)
        .select(col("id").as("qid"), col("vec").as("qvec")).cache()
      queries64.count()
      for ((tag, path) <- Seq(("f32", f32bPath), ("f16", f16bPath), ("i8", i8bPath))) {
        val t = graft.io.QuantizedTables.readBlocked(spark, path)
        runAnn(s"ann_scan_${tag}_blocked_q64") {
          Map("rows" -> Search.exactTopKFusedBlocked(t, queries64, k)
            .count().toDouble, "stored_mb" -> dirBytes(path) / 1e6)
        }
      }
      // FLOAT-ACCUMULATION serving flavor (r10, verdict task #2): the
      // double-lane precision contract halves FMA throughput, making the
      // 384-d scans compute-bound (~0.6 s floor at 1M×16q) so the
      // stored-byte ladder compresses to i8/f16 ≈ 0.87× where the
      // reference reads 0.53-0.55× (`Performance.md:242-255`). dot4F's
      // float lanes double the arithmetic rate; if the compute-bound
      // diagnosis is right, these points should re-open the ladder —
      // either way the measurement settles the INT8-margin item.
      // Approximate serving only (top-k ID-set gate in SearchSpec);
      // oracle paths never touch this flavor.
      for ((tag, path) <- Seq(("f32", f32bPath), ("f16", f16bPath), ("i8", i8bPath))) {
        val t = graft.io.QuantizedTables.readBlocked(spark, path)
        runAnn(s"ann_scan_${tag}_blocked_q64_facc") {
          Map("rows" -> Search.exactTopKFusedBlocked(t, queries64, k,
            floatAcc = true).count().toDouble,
            "stored_mb" -> dirBytes(path) / 1e6)
        }
      }
      queries64.unpersist()
      val gt = Ivf.cachedGroundTruth(annKey, base, queries, k, Metric.Dot)

      // index build is DDL (cached on disk across JVMs) — measured once,
      // not best-of: a cached hit records ~0 and says so
      val buildCached = new java.io.File(
        s"target/ivf_cache/${Ivf.cacheDigest(s"$annKey|$nlist|200000|42|t6")}/_SUCCESS").isFile
      val tBuild = System.nanoTime()
      val buildPhases = scala.collection.mutable.LinkedHashMap.empty[String, Double]
      val idx = Ivf.buildOrGet(spark, base, annKey, nlist = nlist,
        ntrain = 200000, onPhase = (p, s) => buildPhases(p) = s)
      annResults("ann_ivf_build") = Map(
        "sec" -> (System.nanoTime() - tBuild) / 1e9,
        "nlist" -> nlist.toDouble,
        "cached" -> (if (buildCached) 1.0 else 0.0)) ++
        buildPhases.map { case (p, s) => s"${p}_sec" -> s }
      val clustered = idx.clustered(spark)

      // scanned rows per nprobe (deterministic, from the inverted-list
      // sizes): the "probe cost ∝ nprobe/nlist, not corpus" axis
      val listSizes = clustered.groupBy("cluster_id").count().cache()
      listSizes.count()
      def scannedRows(np: Int): Long =
        queries.select(explode(Ivf.nearestCentroids(col("qvec"), idx.centroids, np))
            .as("cluster_id"))
          .join(listSizes, Seq("cluster_id"))
          .agg(sum("count")).collect()(0).getLong(0)

      val nprobes = Seq(1, 2, 4, 8, 32, 128)
      val sweep = Eval.ivfSweep(spark, idx, base, queries, gt, k,
        nprobes = nprobes, refineKs = Seq(0), runs = runsPer)
      val scannedByNp = typedLit(nprobes.map(np => np -> scannedRows(np)).toMap)
      ivfFrontier = sweep.withColumn("scanned_rows",
          element_at(scannedByNp, col("nprobe")))
        .collect()

      // sign-LSH frontier: probes carry recall at fixed corpus cost
      lshFrontier = Eval.lshSweep(spark, base, queries, gt, k,
        points = Seq((12, 4, 0), (12, 4, 8), (12, 8, 8)), runs = runsPer)
        .collect()
      runAnn("ann_lsh_cands") {
        val m = graft.ops.LshAnn.candidateCounts(base, queries,
          nPlanes = 12, nTables = 4, probes = 8)
          .agg(avg("n_cand")).collect()(0).getDouble(0)
        Map("mean_cand" -> m, "frac_of_corpus" -> m / annN)
      }

      // online (single-query) probe latency — the serving-path number the
      // reference's eval reports per query. Batch amortization is gone:
      // what's left is nprobe/nlist × corpus scan + fixed plan overhead,
      // so the np4 → np32 delta isolates the scan cost per probed list.
      val oneQ = base.filter(col("id") === 7L)
        .select(col("id").as("qid"), col("vec").as("qvec")).cache()
      oneQ.count()
      runAnn("ann_single_query_np4") {
        Map("rows" -> Ivf.search(clustered, oneQ, idx.centroids,
          nprobe = 4, k = k).count().toDouble)
      }
      runAnn("ann_single_query_np32") {
        Map("rows" -> Ivf.search(clustered, oneQ, idx.centroids,
          nprobe = 32, k = k).count().toDouble)
      }
      oneQ.unpersist()

      // PQ compression: the index-bytes-≪-flat invariant
      // (`Performance.md:553-568,621-623`)
      val books = Pq.train(base, m = 8, ksub = 256, ntrain = 65536)
      val pqPath = s"target/scale_pq_${annN}_$annDim"
      Pq.encode(base, books).write.mode("overwrite").parquet(pqPath)
      val pqBytes = dirBytes(pqPath)
      annResults("ann_pq_bytes") = Map(
        "flat_mb" -> flatBytes / 1e6, "pq_mb" -> pqBytes / 1e6,
        "ratio" -> flatBytes.toDouble / math.max(pqBytes, 1L))

      // PQ PROBE operating point (r9): ADC-scored scan over the code
      // table + exact-L2 refine of the top-R — the reference's PQ
      // headline shape (OPQ-PQ + Refine R=50: recall 0.9743 at TOTAL p99
      // 0.857 ms from a 42 MB index, `Performance.md:621-623`). The probe
      // books are m=48 (48 B/vector ≈ the reference's m=64/42 MB class;
      // the m=8 books above are the extreme-compression footprint story —
      // their ADC is too coarse for refine to recover: measured 0.525
      // recall at R=50). Batched fused ADC: one code-table pass scores
      // the whole query batch. Recall vs the exact-scan GT; on the
      // unit-normalized corpus L2 ranking ≡ Dot ranking.
      val pq48BooksFile = s"target/scale_pq48_${annN}_$annDim.books.bin"
      val books48 = Pq.loadBooks(pq48BooksFile).getOrElse {
        val b = Pq.train(base, m = 48, ksub = 256, ntrain = 65536)
        Pq.saveBooks(pq48BooksFile, b)
        b
      }
      val pq48Path = s"target/scale_pq48_${annN}_$annDim"
      if (!new java.io.File(s"$pq48Path/_SUCCESS").isFile)
        Pq.encode(base, books48).write.mode("overwrite").parquet(pq48Path)
      val pq48Encoded = spark.read.parquet(pq48Path)
      val pqRefineK = 50
      runAnn("ann_pq_probe") {
        val pred = Pq.searchRefined(base, pq48Encoded, queries, books48, k,
          refineK = pqRefineK, batched = true)
        val rec = Ivf.meanRecall(pred, gt, k).collect()(0).getDouble(0)
        Map("recall" -> rec, "refine_k" -> pqRefineK.toDouble, "m" -> 48.0,
          "stored_mb" -> dirBytes(pq48Path) / 1e6)
      }
      // BLOCKED code table (r10, verdict task #7): the row-wise ADC scan
      // reads 48 B of codes per parquet row, so per-row plan overhead —
      // not the 768 L2-resident lookups — is the scan's cost; 128 code
      // rows per stored row amortizes it exactly like the vector scans'
      // blocked ladder. Same ranks (PqSpec bitwise gate); this is the
      // operating point to compare against ivf_frontier at matched recall.
      val pq48bPath = s"target/scale_pq48b_${annN}_$annDim"
      if (!new java.io.File(s"$pq48bPath/_SUCCESS").isFile)
        graft.io.QuantizedTables.writeBytesBlocked(
          pq48Encoded.select(col("id"), col("codes")), pq48bPath,
          bytesCol = "codes")
      val pq48Blocked = graft.io.QuantizedTables.readBlocked(spark, pq48bPath)
      // the ADC candidate-generation stage ALONE (top-R over the 52 MB
      // blocked code table): the number to read against ann_exact_scan's
      // 1.5 GB flat pass — the footprint story at the stage level. The
      // full probe below adds the exact-refine join (a second corpus-
      // shaped stage to fetch candidate vectors) + fixed per-job cost,
      // which is what separates total probe latency from IVF-flat at
      // Q=16 (both ~fixed-cost-bound there).
      runAnn("ann_pq_adc_blocked") {
        Map("rows" -> Pq.searchBatchedBlocked(pq48Blocked, queries, books48,
          pqRefineK).count().toDouble,
          "k" -> pqRefineK.toDouble, "stored_mb" -> dirBytes(pq48bPath) / 1e6)
      }
      runAnn("ann_pq_probe_blocked") {
        val pred = Pq.searchRefinedBlocked(base, pq48Blocked, queries,
          books48, k, refineK = pqRefineK)
        val rec = Ivf.meanRecall(pred, gt, k).collect()(0).getDouble(0)
        Map("recall" -> rec, "refine_k" -> pqRefineK.toDouble, "m" -> 48.0,
          "stored_mb" -> dirBytes(pq48bPath) / 1e6)
      }
      // Q≈1000 BATCH regime (r11, verdict task #2): the reference's
      // batching headline and its PQ pitch are both quoted at Q=1000
      // (`Performance.md:289,395-402,621-623`); r10's deepest batch
      // evidence stopped at Q=64 and COVERAGE extrapolated the ADC
      // stage's large-Q advantage. Measured here: the blocked ADC
      // candidate stage vs the exact blocked scan over the SAME
      // 512-query batch — fixed per-job cost amortizes to noise, so the
      // pair reads as the storage-economics scaling term itself.
      val queries512 = base.filter(col("id") < 512)
        .select(col("id").as("qid"), col("vec").as("qvec")).cache()
      queries512.count()
      runAnn("ann_pq_adc_blocked_q512") {
        Map("rows" -> Pq.searchBatchedBlocked(pq48Blocked, queries512,
          books48, pqRefineK).count().toDouble,
          "k" -> pqRefineK.toDouble, "stored_mb" -> dirBytes(pq48bPath) / 1e6)
      }
      runAnn("ann_exact_blocked_q512") {
        val t = graft.io.QuantizedTables.readBlocked(spark, f32bPath)
        Map("rows" -> Search.exactTopKFusedBlocked(t, queries512, k)
          .count().toDouble, "stored_mb" -> dirBytes(f32bPath) / 1e6)
      }
      // 4-bit FASTSCAN (r11): the register-shuffle ADC (André VLDB'15 /
      // FAISS IndexPQFastScan re-expressed on the Vector API — vpermb
      // scores 64 rows/instruction pair from a 16-entry in-register LUT).
      // Same 48 B/vector footprint as the m=48 byte codes; this is the
      // published answer to the scalar-LUT latency wall the 8-bit ADC
      // hits at batch Q. Pair reads against ann_pq_adc_blocked_q512 and
      // ann_exact_blocked_q512.
      val pq4BooksFile = s"target/scale_pq4_${annN}_$annDim.books.bin"
      val books4 = Pq.loadBooks(pq4BooksFile).getOrElse {
        val b = Pq.train(base, m = annDim / 4, ksub = 16, ntrain = 65536)
        Pq.saveBooks(pq4BooksFile, b)
        b
      }
      val pq4Path = s"target/scale_pq4_${annN}_$annDim"
      if (!new java.io.File(s"$pq4Path/_SUCCESS").isFile)
        graft.io.QuantizedTables.writePq4Blocked(
          Pq.encode(base, books4), pq4Path)
      val pq4Blocked = spark.read.parquet(pq4Path)
      runAnn("ann_pq4_fastscan_q512") {
        Map("rows" -> Pq.searchFastScan(pq4Blocked, queries512, books4,
          pqRefineK, cand = 2 * pqRefineK).count().toDouble,
          "k" -> pqRefineK.toDouble, "m4" -> (annDim / 4).toDouble,
          "stored_mb" -> dirBytes(pq4Path) / 1e6)
      }
      runAnn("ann_pq4_fastscan") { // Q=16 twin: the fixed-cost floor point
        Map("rows" -> Pq.searchFastScan(pq4Blocked, queries, books4,
          pqRefineK, cand = 2 * pqRefineK).count().toDouble,
          "k" -> pqRefineK.toDouble,
          "stored_mb" -> dirBytes(pq4Path) / 1e6)
      }
      runAnn("ann_pq4_probe") { // fastscan candidates → exact-vector refine
        val cands = Pq.searchFastScan(pq4Blocked, queries, books4,
          pqRefineK, cand = 2 * pqRefineK)
          .groupBy("qid").agg(collect_list(col("id")).as("cand_ids"))
          .join(queries, Seq("qid"))
          .select(col("qid"), col("qvec"), col("cand_ids"))
        val pred = Search.refine(base.select(col("id"), col("vec")),
          broadcast(cands), k)
        val rec = Ivf.meanRecall(pred, gt, k).collect()(0).getDouble(0)
        Map("recall" -> rec, "refine_k" -> pqRefineK.toDouble,
          "stored_mb" -> dirBytes(pq4Path) / 1e6)
      }

      // IVF-pruned fastscan (FAISS IndexIVFPQFastScan's shape): the
      // cluster-partitioned nibble table serves the probe from the probed
      // cells only — the 100 TB serving flavor of the 4-bit path. Build is
      // DDL like ann_ivf_build (cached across JVMs, recorded once).
      val ivf4Key = s"$annKey|ivf4|$nlist|${annDim / 4}|16|200000|42|t6"
      val ivf4Cached = new java.io.File(
        s"target/pq4_cache/${Ivf.cacheDigest(ivf4Key)}/_SUCCESS").isFile
      val tIvf4 = System.nanoTime()
      val ivf4 = Pq.buildOrGetIvf4(spark, base, annKey, nlist = nlist,
        m4 = annDim / 4, ntrain = 200000)
      annResults("ann_pq4_ivf_build") = Map(
        "sec" -> (System.nanoTime() - tIvf4) / 1e9,
        "nlist" -> nlist.toDouble,
        "cached" -> (if (ivf4Cached) 1.0 else 0.0))
      println(f"[scale] ann_pq4_ivf_build     ${annResults("ann_pq4_ivf_build")("sec")}%8.2f s")
      runAnn("ann_pq4_ivf_probe") { // probed-cell fastscan → exact refine
        val pred = Pq.searchFastScanIvfRefined(base, ivf4, queries,
          nprobe = 8, k, refineK = pqRefineK)
        val rec = Ivf.meanRecall(pred, gt, k).collect()(0).getDouble(0)
        Map("recall" -> rec, "nprobe" -> 8.0,
          "stored_mb" -> dirBytes(ivf4.path) / 1e6)
      }
      runAnn("ann_pq4_ivf_q512") { // candidate stage only, batch regime
        Map("rows" -> Pq.searchFastScanIvf(ivf4, spark, queries512,
          nprobe = 8, k = pqRefineK).count().toDouble,
          "nprobe" -> 8.0, "stored_mb" -> dirBytes(ivf4.path) / 1e6)
      }
      // recall/cost frontier of the refined IVF-fastscan probe: the same
      // nprobe-scaling story as ivf_frontier, on 1/30th the stored bytes
      Seq(4, 16, 32).foreach { np =>
        runAnn(s"ann_pq4_ivf_probe_np$np") {
          val pred = Pq.searchFastScanIvfRefined(base, ivf4, queries,
            nprobe = np, k, refineK = pqRefineK)
          Map("recall" -> Ivf.meanRecall(pred, gt, k).collect()(0).getDouble(0),
            "nprobe" -> np.toDouble)
        }
      }
      // REFINE-BUDGET frontier (r12, verdict task #1): the rows above all
      // run refineK=50 and plateau at recall 0.95 from nprobe=8 on — the
      // binding constraint was the refine budget, NOT the 4-bit codebook
      // ceiling (RefineTune swept refineK × nprobe and the OPQ question
      // died unasked: rk=100 already clears the reference's PQ+Refine
      // headline, 0.9743 @ R=50 / 0.9758 @ R=100,
      // `Performance.md:623,708-711`). rk100 @ np8 is the new operating
      // point: recall 0.975 sub-second at 1M; np16 × rk200 reads 1.0.
      for ((np, rk) <- Seq((8, 100), (8, 200), (16, 100), (16, 200))) {
        runAnn(s"ann_pq4_ivf_probe_np${np}_rk$rk") {
          val pred = Pq.searchFastScanIvfRefined(base, ivf4, queries,
            nprobe = np, k, refineK = rk)
          Map("recall" -> Ivf.meanRecall(pred, gt, k).collect()(0).getDouble(0),
            "nprobe" -> np.toDouble, "refine_k" -> rk.toDouble)
        }
      }
      // CLUSTERED-REFINE flavor (r13): the rows above stream the whole
      // 1.5 GB base through the refine fetch; this one prunes the fetch
      // to the probed cells via the IVF index's clustered table (same
      // deterministic coarse quantizer). Results are Pq4Spec-pinned
      // identical; the delta here is the refine fetch's corpus scan.
      runAnn("ann_pq4_ivf_probe_np8_rk100_cref") {
        val pred = Pq.searchFastScanIvfRefinedClustered(idx, ivf4,
          queries, nprobe = 8, k, refineK = 100)
        Map("recall" -> Ivf.meanRecall(pred, gt, k).collect()(0).getDouble(0),
          "nprobe" -> 8.0, "refine_k" -> 100.0)
      }
      queries512.unpersist()

      // refine join against plain vs bucketed base, measured in the
      // BIG-BATCH regime (autoBroadcast off — the 100 TB case where the
      // candidate set exceeds the broadcast budget): the plain join must
      // shuffle the full base, while the bucketed base reads its buckets
      // in place and ONLY the candidate side shuffles — the co-located
      // join writeBucketedBase sells. (With broadcastable candidates the
      // two are identical: the base never shuffles either way.)
      val refQs = base.filter(col("id") < 2048)
        .select(col("id").as("qid"), col("vec").as("qvec"))
      val cands = Ivf.search(clustered, refQs, idx.centroids, nprobe = 16, k = 100)
        .groupBy("qid").agg(collect_list(col("id")).as("cand_ids"))
        .join(refQs, Seq("qid"))
        .select(col("qid"), col("qvec"), col("cand_ids")).cache()
      cands.count()
      spark.sql("DROP TABLE IF EXISTS graft_scale_bucketed")
      val orphan = new java.io.File("spark-warehouse/graft_scale_bucketed")
      if (orphan.isDirectory) {
        java.nio.file.Files.walk(orphan.toPath)
          .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(p => java.nio.file.Files.delete(p))
      }
      Search.writeBucketedBase(base, "graft_scale_bucketed", buckets = cpus.toInt)
      val bucketed = spark.table("graft_scale_bucketed")
      val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        runAnn("ann_refine_plain") {
          Map("rows" -> Search.refine(base, cands, k).count().toDouble)
        }
        runAnn("ann_refine_bucketed") {
          Map("rows" -> Search.refine(bucketed, cands, k).count().toDouble)
        }
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      cands.unpersist()

      // PIPELINE=staged|interleaved (`ivf_eval.cpp:465-466`): same rows,
      // different composition — record which wins at this scale
      runAnn("ann_pipeline_staged") {
        Map("rows" -> Ivf.searchRefined(clustered, queries, idx.centroids,
          nprobe = 32, k = k, refineK = 100, pipeline = "staged").count().toDouble)
      }
      runAnn("ann_pipeline_interleaved") {
        Map("rows" -> Ivf.searchRefined(clustered, queries, idx.centroids,
          nprobe = 32, k = k, refineK = 100, pipeline = "interleaved").count().toDouble)
      }

      // nlist=4096 train point (the reference's own build setting —
      // `Performance.md:578` trains 4096 in 13.9 s via FAISS): train-only
      // (the assign+write pass is nlist-independent, measured above), one
      // shot, exercising the two-level ordered combine so the per-iteration
      // driver traffic is ⌈parts/8⌉ × 4096 × 384 × 8 B, not parts×.
      // Determinism of this path is spec-gated (KmeansSpec two-level test).
      if (only.forall(_.contains("ann_ivf_train4096"))) {
        val t4096 = System.nanoTime()
        // explicit stableFrac=0: THIS row is the iso-iteration (25) FAISS
        // comparison; the stable-stop flavor (now the Ivf.train default)
        // is the row below
        val cents4096 = Ivf.train(base, nlist = 4096, ntrain = 200000,
          stableFrac = 0.0)
        annResults("ann_ivf_train4096") = Map(
          "train_sec" -> (System.nanoTime() - t4096) / 1e9,
          "nlist" -> 4096.0, "ncentroids" -> cents4096.length.toDouble)
        println(f"[scale] ann_ivf_train4096     ${annResults("ann_ivf_train4096")("train_sec")}%8.2f s")
        // STABILITY-STOPPED twin (r12, verdict task #2): FAISS's 25
        // iterations are a default, not a convergence fact — by iteration
        // 8 the assignment churn is under 3% and the remaining 17
        // iterations buy NO probe recall (measured: np8 0.9250 @ 25 iters
        // vs 0.9500 @ 8, np32 1.0000 both — Lloyd convergence is not
        // retrieval recall). stableFrac=0.033 stops there by the churn
        // signal itself; the recall anchors recorded HERE are the
        // evidence the cut quantizer serves as well. The row above stays
        // the iso-iteration FAISS comparison (both niter=25).
        val tStable = System.nanoTime()
        val centsStable = Ivf.train(base, nlist = 4096, ntrain = 200000,
          stableFrac = 0.033)
        val stableSec = (System.nanoTime() - tStable) / 1e9
        val stableIters = graft.ops.Kmeans.lastRunIters.get().toDouble
        val gtK = gt // same 16-query GT as the frontier rows
        def probeRecall(cents: Array[Array[Float]], np: Int): Double = {
          val assigned = Ivf.assign(base, cents).cache()
          assigned.count()
          val rec = Ivf.meanRecall(
            Ivf.search(assigned, queries, cents, nprobe = np, k = k),
            gtK, k).collect()(0).getDouble(0)
          assigned.unpersist()
          rec
        }
        annResults("ann_ivf_train4096_stable") = Map(
          "train_sec" -> stableSec, "nlist" -> 4096.0,
          "iters" -> stableIters, "stable_frac" -> 0.033,
          "recall_np8" -> probeRecall(centsStable, 8),
          "recall_np8_25iter" -> probeRecall(cents4096, 8))
        println(f"[scale] ann_ivf_train4096_stable ${stableSec}%8.2f s  iters=$stableIters%.0f  np8=${annResults("ann_ivf_train4096_stable")("recall_np8")}%.4f vs 25iter=${annResults("ann_ivf_train4096_stable")("recall_np8_25iter")}%.4f")
      }

      // ---- sharded HNSW (C4 proper): build cost, warm serving latency,
      // distance-eval sub-linearity, efSearch frontier, routed pruning ----
      val hnswKey = s"$annKey|hnsw"
      val hM = 16; val hEfc = 100; val hShards = cpus.toInt
      val tH = System.nanoTime()
      Hnsw.search(base, queries, k, Metric.Dot, m = hM, efConstruction = hEfc,
        efSearch = 64, nShards = hShards, cacheKey = hnswKey).count()
      annResults("ann_hnsw_build") = Map(
        "sec" -> (System.nanoTime() - tH) / 1e9, // one base pass: build all shards (+1 search)
        "m" -> hM.toDouble, "efc" -> hEfc.toDouble, "shards" -> hShards.toDouble)
      println(f"[scale] ann_hnsw_build        ${annResults("ann_hnsw_build")("sec")}%8.2f s")
      runAnn("ann_hnsw_batch") {
        val acc = spark.sparkContext.longAccumulator
        val rows = Hnsw.searchWarm(queries, hnswKey, hShards, k, Metric.Dot,
          hM, hEfc, efSearch = 64, evalCounter = Some(acc)).count()
        val perQ = acc.value.toDouble / 16
        Map("rows" -> rows.toDouble, "evals_per_query" -> perQ,
          "frac_of_corpus" -> perQ / annN)
      }
      runAnn("ann_hnsw_single") {
        val one = base.filter(col("id") === 7L)
          .select(col("id").as("qid"), col("vec").as("qvec"))
        Map("rows" -> Hnsw.searchWarm(one, hnswKey, hShards, k, Metric.Dot,
          hM, hEfc, efSearch = 64).count().toDouble)
      }
      // Single-query floor breakdown (r9, verdict task #6): the warm
      // single-query number above is SCHEDULER floor, not graph compute.
      // Evidence: (a) a no-op Spark job of the same task shape (hShards
      // tasks, one shuffle) costs nearly the same; (b) the SAME graphs
      // served in-process (Hnsw.searchLocal — the executor-embedded
      // serving call; in local mode this JVM holds them) answer in
      // microseconds. Spark's unit of serving is the query BATCH
      // (ann_hnsw_batch); per-query serving belongs in-process.
      if (only.forall(_.contains("ann_hnsw_single"))) {
        val noopT0 = System.nanoTime()
        spark.range(hShards.toLong).repartition(hShards).count()
        val noopSec = (System.nanoTime() - noopT0) / 1e9
        val qv = base.filter(col("id") === 7L).select(col("vec"))
          .collect()(0).getSeq[Float](0).toArray
        Hnsw.searchLocal(qv, hnswKey, hShards, k, Metric.Dot, hM, hEfc, 64) // warm JIT
        val reps = 200
        val locT0 = System.nanoTime()
        var r = 0
        var got = 0
        while (r < reps) {
          got = Hnsw.searchLocal(qv, hnswKey, hShards, k, Metric.Dot, hM, hEfc, 64).length
          r += 1
        }
        val localUs = (System.nanoTime() - locT0) / 1e3 / reps
        annResults("ann_hnsw_single_breakdown") = Map(
          "noop_job_sec" -> noopSec, "local_serve_us" -> localUs,
          "rows" -> got.toDouble)
        println(f"[scale] ann_hnsw_single_breakdown  noop_job=${noopSec}%6.3f s  local_serve=${localUs}%8.1f us")
      }
      hnswFrontier = Eval.hnswSweep(spark, base, queries, gt, k,
        efSearches = Seq(16, 64, 128), m = hM, efConstruction = hEfc,
        nShards = hShards, runs = runsPer, cacheKey = hnswKey).collect()

      // efSearch frontier on the HARD corpus: the lowRank manifold reads
      // recall 1.0 at every efSearch (the frontier above — honest, but it
      // shows no trade), and measured harder variants of it stay ≥ 0.96
      // (KneeTune at 200k: lr32 0.9625@16, off-manifold query noise does
      // not bite because orthogonal noise shifts all similarities nearly
      // uniformly). The corpus that actually bends the curve is full-
      // intrinsic iid-unit data — distance concentration makes neighbor
      // margins near-ties, the classic hard case — giving the
      // recall-vs-efSearch trade the reference's curve shows (0.8773@16 →
      // 0.9982@256, `Performance.md:452-456`; measured 0.3688@16 →
      // 0.9688@256 at 200k). k-means collapses on iid data, so ONLY the
      // graph family sweeps here — the IVF cost axes stay on lowRank.
      // MID-hardness corpus (r9, verdict task #1): the lowRank manifold
      // above saturates at recall 1.0 (honest, but showing no trade) and
      // the iid corpus below never reaches a servable point — real
      // embedding tables sit between (low-but-not-tiny intrinsic dim).
      // intrinsic=48 at 1M gives the frontier the reference's SHAPE
      // (knee below 1.0 at small efSearch, ≥0.95 at the top —
      // `Performance.md:457-461`: 0.8961@16 → 0.9975@256 at 1M), built at
      // the reference's baseline construction point efC=200/m=16
      // (`Performance.md:490`, Table 15 baseline).
      val midIntr = sys.env.getOrElse("SPARK_GRAFT_HNSW_MID_INTR", "48").toInt
      val midPath = s"target/scale_vectors_${annN}_${annDim}_lr$midIntr"
      if (!new java.io.File(s"$midPath/_SUCCESS").isFile)
        SyntheticVectors.lowRankFast(spark, annN, annDim, intrinsic = midIntr)
          .write.mode("overwrite").parquet(midPath)
      val midBase = spark.read.parquet(midPath)
      val midQueries = midBase.filter(col("id") < 16)
        .select(col("id").as("qid"), col("vec").as("qvec")).cache()
      midQueries.count()
      val midGt = Search.groundTruth(midBase, midQueries, k, Metric.Dot).cache()
      midGt.count()
      val midKey = s"annscale_${annN}_lr$midIntr|hnsw|efc200"
      val tMid = System.nanoTime()
      Hnsw.search(midBase, midQueries, k, Metric.Dot, m = hM,
        efConstruction = 200, efSearch = 64, nShards = hShards,
        cacheKey = midKey).count()
      annResults("ann_hnsw_mid_build") = Map(
        "sec" -> (System.nanoTime() - tMid) / 1e9, "intrinsic" -> midIntr.toDouble,
        "m" -> hM.toDouble, "efc" -> 200.0, "shards" -> hShards.toDouble)
      hnswMidFrontier = Eval.hnswSweep(spark, midBase, midQueries, midGt,
        k, efSearches = Seq(16, 32, 64, 128, 256), m = hM,
        efConstruction = 200, nShards = hShards, runs = runsPer,
        cacheKey = midKey).collect()
      Hnsw.invalidate(midKey)
      midGt.unpersist(); midQueries.unpersist()

      // HARD corpus: full-intrinsic iid-unit data (distance concentration,
      // near-tie margins) — the stress end of the spectrum. r9 builds it
      // at the reference's best-quality construction point (efC=200, m=24
      // — `Performance.md:490` Table 15: 0.9892 at efSearch=64 on its
      // corpus) so the curve reflects construction quality, not an
      // under-built graph; iid-384d remains fundamentally harder than any
      // real embedding table (that is its job).
      val hardPath = s"target/scale_vectors_${annN}_${annDim}_iid"
      if (!new java.io.File(s"$hardPath/_SUCCESS").isFile)
        SyntheticVectors.iidUnit(spark, annN, annDim)
          .write.mode("overwrite").parquet(hardPath)
      val hardBase = spark.read.parquet(hardPath)
      val hardQueries = hardBase.filter(col("id") < 16)
        .select(col("id").as("qid"), col("vec").as("qvec")).cache()
      hardQueries.count()
      val hardGt = Search.groundTruth(hardBase, hardQueries, k, Metric.Dot).cache()
      hardGt.count()
      val hHardM = 24
      val hardKey = s"annscale_${annN}_iid|hnsw|efc200m24"
      val tHh = System.nanoTime()
      Hnsw.search(hardBase, hardQueries, k, Metric.Dot, m = hHardM,
        efConstruction = 200, efSearch = 64, nShards = hShards,
        cacheKey = hardKey).count()
      annResults("ann_hnsw_hard_build") = Map(
        "sec" -> (System.nanoTime() - tHh) / 1e9,
        "m" -> hHardM.toDouble, "efc" -> 200.0, "shards" -> hShards.toDouble)
      // r10: the sweep extends past 256 — r9 topped at 0.813@256 with the
      // curve still climbing (+0.21 per doubling), so 512/1024 answer
      // whether the m=24/efC=200 graph REACHES a servable point on iid
      // data or the curve flattens into an intrinsic-dimensionality wall
      hnswHardFrontier = Eval.hnswSweep(spark, hardBase, hardQueries, hardGt,
        k, efSearches = Seq(16, 32, 64, 128, 256, 512, 1024), m = hHardM,
        efConstruction = 200, nShards = hShards, runs = runsPer,
        cacheKey = hardKey).collect()
      Hnsw.invalidate(hardKey)
      hardGt.unpersist(); hardQueries.unpersist()

      // ---- predicate-constrained search at corpus scale: the widened
      // IVF probe and the HNSW over-fetch + post-filter, at two
      // selectivities, vs the filtered-exact anchor (FilteredSearch's
      // pre/post-filter strategy split measured where it matters) ----
      for ((sTag, cut) <- Seq(("s50", 500L), ("s05", 50L))) {
        val pred = pmod(col("id"), lit(1000L)) < cut
        val sel = cut / 1000.0
        val fGt = Search.groundTruth(base.filter(pred), queries, k, Metric.Dot).cache()
        fGt.count()
        def recallVs(pred0: DataFrame): Double =
          Ivf.meanRecall(pred0, fGt, k).collect()(0).getDouble(0)
        runAnn(s"ann_filtered_exact_$sTag") {
          Map("rows" -> graft.ops.FilteredSearch.exact(base, pred, queries, k)
            .count().toDouble, "selectivity" -> sel)
        }
        runAnn(s"ann_filtered_ivf_$sTag") {
          val p = graft.ops.FilteredSearch.ivf(clustered, pred, queries,
            idx.centroids, nprobe = 8, k = k, selectivity = sel)
          Map("recall" -> recallVs(p), "selectivity" -> sel,
            "widened_nprobe" -> graft.ops.FilteredSearch
              .widenedProbe(8, sel, nlist).toDouble)
        }
        runAnn(s"ann_filtered_hnsw_$sTag") {
          val oversample = math.max(2, math.ceil(1.0 / sel).toInt)
          val p = graft.ops.FilteredSearch.hnswPostFilter(base, pred, queries,
            k, oversample, Metric.Dot, m = hM, efConstruction = hEfc,
            efSearch = 64, nShards = hShards, cacheKey = hnswKey, warm = true)
          Map("recall" -> recallVs(p), "selectivity" -> sel,
            "oversample" -> oversample.toDouble)
        }
        // r12: the pq4 flavor beside them — widened-probe cluster pruning
        // + candidate over-fetch + predicate pushed into the exact refine
        // (the auto chooser's preferred arm when the nibble index exists)
        runAnn(s"ann_filtered_pq4_$sTag") {
          val p = graft.ops.FilteredSearch.pq4(base, pred, queries, ivf4,
            nprobe = 8, k = k, refineK = 100, selectivity = sel)
          Map("recall" -> recallVs(p), "selectivity" -> sel,
            "widened_nprobe" -> graft.ops.FilteredSearch
              .widenedProbe(8, sel, nlist).toDouble)
        }
        fGt.unpersist()
      }
      // In-process IVF-fastscan serve (r12): the PQ analogue of the
      // routed-HNSW serving tier — per-query latency of the rk100
      // operating point with no Spark job (Pq4Spec-gated identical to
      // searchFastScanIvfRefined). Reads against ann_hnsw_local_routed:
      // two in-process serving flavors of the same corpus, one
      // graph-traversal-bound, one nibble-scan + refine-bound.
      if (only.forall(_.contains("ann_pq4_local_serve"))) {
        Pq.warmLocalIvf4(spark, ivf4, "bench_local_ivf4", base)
        val nServe = 256
        val serveQs = base.filter(col("id") >= 100000L && col("id") < 100000L + nServe)
          .orderBy("id").select(col("vec")).collect()
          .map(_.getSeq[Float](0).toArray)
        serveQs.take(32).foreach { qv =>
          Pq.searchLocalIvf4(qv, ivf4, "bench_local_ivf4", nprobe = 8, k = 10,
            refineK = 100)
        }
        val lat = serveQs.map { qv =>
          val t0 = System.nanoTime()
          Pq.searchLocalIvf4(qv, ivf4, "bench_local_ivf4", nprobe = 8, k = 10,
            refineK = 100)
          (System.nanoTime() - t0) / 1e3
        }
        java.util.Arrays.sort(lat)
        def pctL(p: Double): Double = {
          val idx = p * (nServe - 1)
          val lo = idx.toInt
          val frac = idx - lo
          if (lo + 1 < nServe) lat(lo) * (1 - frac) + lat(lo + 1) * frac else lat(lo)
        }
        annResults("ann_pq4_local_serve") = Map(
          "p50_us" -> pctL(0.50), "p95_us" -> pctL(0.95), "p99_us" -> pctL(0.99),
          "avg_us" -> lat.sum / nServe, "nprobe" -> 8.0, "refine_k" -> 100.0,
          "n_queries" -> nServe.toDouble)
        println(f"[scale] ann_pq4_local_serve   p50=${pctL(0.5)}%8.1f us  p95=${pctL(0.95)}%8.1f  p99=${pctL(0.99)}%8.1f us")
        // float-acc refine twin (r13, verdict task #3): the pq4 serve's
        // only double-lane stage is the exact refine of rk candidates, so
        // the facc delta HERE isolates that stage's share of the p50
        var ovl = 0L
        val latF = serveQs.map { qv =>
          val t0 = System.nanoTime()
          val got = Pq.searchLocalIvf4(qv, ivf4, "bench_local_ivf4",
            nprobe = 8, k = 10, refineK = 100, floatAcc = true)
          val dt = (System.nanoTime() - t0) / 1e3
          val contract = Pq.searchLocalIvf4(qv, ivf4, "bench_local_ivf4",
            nprobe = 8, k = 10, refineK = 100)
          ovl += got.map(_._1).toSet.intersect(contract.map(_._1).toSet).size
          dt
        }
        java.util.Arrays.sort(latF)
        def pctF(p: Double): Double = {
          val idx = p * (nServe - 1)
          val lo = idx.toInt
          val frac = idx - lo
          if (lo + 1 < nServe) latF(lo) * (1 - frac) + latF(lo + 1) * frac
          else latF(lo)
        }
        annResults("ann_pq4_local_serve_facc") = Map(
          "p50_us" -> pctF(0.50), "p95_us" -> pctF(0.95), "p99_us" -> pctF(0.99),
          "avg_us" -> latF.sum / nServe, "nprobe" -> 8.0, "refine_k" -> 100.0,
          "overlap_vs_contract" -> ovl.toDouble / (nServe * 10))
        println(f"[scale] ann_pq4_local_serve_facc p50=${pctF(0.5)}%8.1f us  p99=${pctF(0.99)}%8.1f us  overlap=${ovl.toDouble / (nServe * 10)}%.4f")
        Pq.invalidateLocal("bench_local_ivf4")
      }

      // The semantic-dedup family below localCheckpoints its assigned
      // frame INSIDE each measured op (by design — the checkpoint is the
      // single-assignment trade), and measure() invokes every op twice
      // (timed + shuffle-delta): four rows × two invocations ≈ 2.5 GB of
      // MEMORY_AND_DISK checkpoint blocks that pin the protected half of
      // Spark's storage pool until GC + ContextCleaner get around to
      // them. The 500K GT scan two sections later then OOMs its 32-task
      // sort ([UNABLE_TO_ACQUIRE_MEMORY], reproduced twice in r16 full
      // runs). Snapshot the persistent-RDD ids here and SYNCHRONOUSLY
      // unpersist everything the family added, right after it.
      val keepRddIds = spark.sparkContext.getPersistentRDDs.keySet

      // SemDeDup at 200k×384d over the 1024-cluster quantizer (r12): the
      // paper's cluster bucketing keeps pairwise work at Σ|c|² — recorded
      // as all_pairs_ratio beside the wall time (the knob is nlist, which
      // the paper turns to 50k at 600M). Semantics are d13-oracle- and
      // CurationSpec-gated at fixture scale; THIS row is the cost shape.
      runAnn("ann_semantic_dedup") {
        val sub = base.filter(col("id") < 200000)
          .select(col("id").as("vec_id"), col("vec").as("embedding"))
        // assign ONCE (r13): the checkpointed image feeds the candidate
        // self-join, the keeper join, and the pairs_checked diagnostic —
        // r12 paid three screened-argmin corpus passes for the same row
        val assigned = Ivf.assign(sub, idx.centroids, "embedding")
          .localCheckpoint()
        val out = Dedup.semanticDedupAssigned(assigned, tau = 0.99)
        val dropped = out.filter(!col("keep")).count().toDouble
        val nCand = assigned
          .groupBy("cluster_id").count()
          .agg(sum(col("count") * (col("count") - 1) / 2).cast("long"))
          .head().getLong(0)
        Map("n" -> 200000.0, "n_dropped" -> dropped,
          "pairs_checked" -> nCand.toDouble,
          "all_pairs_ratio" -> nCand / (200000.0 * 199999 / 2),
          "nlist" -> nlist.toDouble)
      }
      // the PAPER's keep rule at the same scale point (r14, verdict task
      // #4): keep the component member farthest from its cluster centroid
      // (d14-oracle-gated at fixture scale) — the delta vs the min-id row
      // is one cdist enrichment pass plus a per-component window over
      // PAIRED rows only, so the cost shape should track the min-id twin
      runAnn("ann_semantic_dedup_far") {
        val sub = base.filter(col("id") < 200000)
          .select(col("id").as("vec_id"), col("vec").as("embedding"))
        val assigned = Dedup.withCentroidDist(
          Ivf.assign(sub, idx.centroids, "embedding"), idx.centroids,
          "embedding").localCheckpoint()
        val out = Dedup.semanticDedupAssigned(assigned, tau = 0.99,
          keepRule = "far_from_centroid")
        val dropped = out.filter(!col("keep")).count().toDouble
        val nCand = assigned
          .groupBy("cluster_id").count()
          .agg(sum(col("count") * (col("count") - 1) / 2).cast("long"))
          .head().getLong(0)
        Map("n" -> 200000.0, "n_dropped" -> dropped,
          "pairs_checked" -> nCand.toDouble,
          "all_pairs_ratio" -> nCand / (200000.0 * 199999 / 2),
          "nlist" -> nlist.toDouble)
      }
      // the SKEW-GUARDED regime (r15, verdict task #1): plant a dense
      // duplicate flood — 20k near-identical rows in ONE cell of a 200k
      // corpus — the data SemDeDup exists for and the shape that made the
      // unguarded all-pairs 100×-fatal (quadratic pairs on one reducer).
      // The guard's LSH+salt blocks bound every join key near the cap
      // (recorded as block_tail; pairs grow ∝ flood×cap, not flood²), and
      // the flood must still resolve to ONE keeper via the component pass
      runAnn("ann_semantic_dedup_skew") {
        val nSk = 200000L
        val floodN = 20000L
        val capSk = 1024
        val floodRows = spark.range(floodN).select(col("id").as("vec_id"),
          expr(s"transform(sequence(0, ${annDim - 1}), j -> " +
            "cast(0.5 + 0.05*j + 1e-3*(pmod(hash(id*31 + j), 7) - 3) as float))")
            .as("embedding"),
          lit(0).as("cluster_id"))
        val rest = base.filter(col("id") >= floodN && col("id") < nSk)
          .select(col("id").as("vec_id"), col("vec").as("embedding"),
            (lit(1) + pmod(col("id"), lit(1023))).cast("int").as("cluster_id"))
        val assigned = floodRows.unionByName(rest).localCheckpoint()
        val tail = Dedup.semanticBlockTail(assigned, maxCellSize = capSk)
        val out = Dedup.semanticDedupAssigned(assigned, tau = 0.99,
          maxCellSize = capSk)
        val floodKeep = out.filter(col("cluster_id") === 0 && col("keep"))
          .count().toDouble
        val dropped = out.filter(!col("keep")).count().toDouble
        Map("n" -> nSk.toDouble, "flood" -> floodN.toDouble,
          "cap" -> capSk.toDouble, "block_tail" -> tail.toDouble,
          "flood_keepers" -> floodKeep, "n_dropped" -> dropped)
      }
      // MULTI-flood regime (r16, verdict task #6): a realistic skewed
      // corpus carries SEVERAL oversized cells of different sizes, and
      // the guard's block geometry (nBlockTables, salt splits) runs over
      // all of them simultaneously — three planted floods at ~20×/8×/2×
      // the cap plus thin cells. Gates mirror the single-flood row PER
      // flood: block_tail ≈ cap across all three at once, one component
      // and one keeper each.
      runAnn("ann_semantic_dedup_multiskew") {
        val nSk = 200000L
        val capSk = 1024
        val floods = Seq((0, 0L, 20000L), (1, 20000L, 28000L),
          (2, 28000L, 30000L))
        val floodRows = floods.map { case (cell, lo, hi) =>
          spark.range(lo, hi).select(col("id").as("vec_id"),
            expr(s"transform(sequence(0, ${annDim - 1}), j -> " +
              s"cast(0.5 + 0.05*j + 0.3*$cell + " +
              "1e-3*(pmod(hash(id*31 + j), 7) - 3) as float))")
              .as("embedding"),
            lit(cell).as("cluster_id"))
        }.reduce(_ unionByName _)
        val rest = base.filter(col("id") >= 30000L && col("id") < nSk)
          .select(col("id").as("vec_id"), col("vec").as("embedding"),
            (lit(3) + pmod(col("id"), lit(1021))).cast("int").as("cluster_id"))
        val assigned = floodRows.unionByName(rest).localCheckpoint()
        val tail = Dedup.semanticBlockTail(assigned, maxCellSize = capSk)
        val out = Dedup.semanticDedupAssigned(assigned, tau = 0.99,
          maxCellSize = capSk).cache()
        val m = scala.collection.mutable.Map[String, Double](
          "n" -> nSk.toDouble, "cap" -> capSk.toDouble,
          "block_tail" -> tail.toDouble,
          "n_dropped" -> out.filter(!col("keep")).count().toDouble)
        floods.foreach { case (cell, lo, hi) =>
          m(s"flood${cell}_rows") = (hi - lo).toDouble
          m(s"flood${cell}_keepers") = out
            .filter(col("cluster_id") === cell && col("keep")).count().toDouble
          m(s"flood${cell}_comps") = out.filter(col("cluster_id") === cell)
            .select("component").distinct().count().toDouble
        }
        out.unpersist()
        m.toMap
      }
      // release the semantic family's checkpoint blocks NOW (see the
      // keepRddIds note above) — blocking, so the storage pool is
      // actually free before the serving sections' big sorts run
      spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!keepRddIds.contains(id)) rdd.unpersist(blocking = true)
      }

      // routed shards: the IVF centroids double as the shard router —
      // probing 32/nlist shards must hold recall while cutting evals
      val routedKey = s"$hnswKey|routed"
      Hnsw.searchRouted(base, queries, idx.centroids, routeProbe = 32, k,
        Metric.Dot, hM, hEfc, efSearch = 64, cacheKey = routedKey).count()
      runAnn("ann_hnsw_routed_rp32") {
        val acc = spark.sparkContext.longAccumulator
        val pred = Hnsw.searchWarm(queries, routedKey, nShards = nlist, k,
          Metric.Dot, hM, hEfc, efSearch = 64,
          centroids = idx.centroids, routeProbe = 32, evalCounter = Some(acc))
        val rec = Ivf.meanRecall(pred, gt, k).collect()(0).getDouble(0)
        val perQ = acc.value.toDouble / 16
        Map("recall" -> rec, "evals_per_query" -> perQ,
          "frac_of_corpus" -> perQ / annN)
      }
      // Routed IN-PROCESS serve (r10, the serving-floor decomposition's
      // missing point): ann_hnsw_single_breakdown showed the graph work
      // is 10–19 ms scanning ALL 32 shards in-process; with the IVF
      // router the local call visits routeProbe of nlist cluster-shards
      // (~1.3% of the corpus, the rp32 point above) — this records the
      // routeProbe cut on the latency tier. Result-equality to the warm
      // routed Spark path is HnswSpec-gated.
      if (only.forall(_.contains("ann_hnsw_local_routed"))) {
        // PERCENTILE-disciplined serve point (r11, verdict task #5): the
        // r10 number was a 200-rep average over ONE query; the reference
        // reports its serving latencies as percentiles (p99 0.325 ms at
        // efSearch=64, `Performance.md:454`). 256 DISTINCT queries (ids
        // disjoint from the 16-query bench batch), one timed call each
        // after a warm pass, p50/p95/p99 by the reference's linear
        // interpolation (same formula as ops.Percentiles / A2).
        val nServe = 256
        val serveQs = base.filter(col("id") >= 100000L && col("id") < 100000L + nServe)
          .orderBy("id").select(col("vec")).collect()
          .map(_.getSeq[Float](0).toArray)
        serveQs.take(32).foreach { qv => // warm: JIT + shard-graph touch
          Hnsw.searchLocal(qv, routedKey, nlist, k, Metric.Dot, hM, hEfc,
            efSearch = 64, centroids = idx.centroids, routeProbe = 32)
        }
        val lat = new Array[Double](nServe)
        var got = 0
        var r = 0
        while (r < nServe) {
          val t0 = System.nanoTime()
          got = Hnsw.searchLocal(serveQs(r), routedKey, nlist, k, Metric.Dot,
            hM, hEfc, efSearch = 64, centroids = idx.centroids,
            routeProbe = 32).length
          lat(r) = (System.nanoTime() - t0) / 1e3
          r += 1
        }
        java.util.Arrays.sort(lat)
        def pct(p: Double): Double = { // reference interpolation: rank p(n−1)
          val idx = p * (nServe - 1)
          val lo = idx.toInt
          val frac = idx - lo
          if (lo + 1 < nServe) lat(lo) * (1 - frac) + lat(lo + 1) * frac else lat(lo)
        }
        annResults("ann_hnsw_local_routed") = Map(
          "local_serve_routed_us" -> lat.sum / nServe,
          "local_serve_routed_p50_us" -> pct(0.50),
          "local_serve_routed_p95_us" -> pct(0.95),
          "local_serve_routed_p99_us" -> pct(0.99),
          "n_queries" -> nServe.toDouble, "route_probe" -> 32.0,
          "n_shards" -> nlist.toDouble, "rows" -> got.toDouble)
        println(f"[scale] ann_hnsw_local_routed  avg=${lat.sum / nServe}%8.1f us  p50=${pct(0.5)}%8.1f  p95=${pct(0.95)}%8.1f  p99=${pct(0.99)}%8.1f us")
      }
      // SINGLE-GRAPH posture point (r12, verdict task #5): the routed
      // in-process p50 9.9 ms (1M over 32 shard-graphs) and hnswlib's
      // 0.208 ms (`Performance.md:454`, 500K, ONE graph) differ in both
      // corpus and topology. One unsharded 500K graph served via
      // searchLocal(nShards=1) isolates the JVM-vs-C++ kernel margin
      // from the shard fan-out; efSearch swept at the reference's points.
      // settle BEFORE this non-runAnn section: it runs without measure()'s
      // pre-op double-GC, and the semantic-dedup rows just above leave
      // ~0.3 GB of localCheckpoint blocks PER op invocation (two passes ×
      // four rows ≈ 2-3 GB) that only free via GC + ContextCleaner — the
      // r16 full run OOMed the 500K GT scan here ([UNABLE_TO_ACQUIRE_MEMORY]
      // in a 32-task sort) with exactly those blocks still resident
      System.gc(); Thread.sleep(700); System.gc()
      if (only.forall(_.contains("ann_hnsw_single_graph"))) {
        val sgN = 500000L
        val sgKey = s"$annKey|hnsw|single$sgN"
        val base500 = base.filter(col("id") < sgN)
        // build-once across runs (r15): the graph is deterministic and its
        // v2 store persists under target/ — warm from it in I/O time
        // instead of replaying the ~650 s build; `cached` rides on the
        // rows so a cross-round build_sec read can't mistake a warm for a
        // build (legacy pre-g2 dir name accepted — manifest keys embed
        // the params either way, so a stale-param store simply MISSES)
        val sgStoreHit = Seq(
            s"target/scale_hnsw_store_${sgN}_${hM}_${hEfc}_42_g2",
            s"target/scale_hnsw_store_$sgN")
          .find(d => new java.io.File(s"$d/MANIFEST").isFile)
        val tSg = System.nanoTime()
        if (sgStoreHit.isDefined) Hnsw.warmFromDisk(sgKey, sgStoreHit.get)
        else Hnsw.search(base500, queries, k, Metric.Dot, m = hM,
          efConstruction = hEfc, efSearch = 64, nShards = 1,
          cacheKey = sgKey).count()
        val sgBuild = (System.nanoTime() - tSg) / 1e9
        val sgCached = if (sgStoreHit.isDefined) 1.0 else 0.0
        val nServe = 256
        val serveRows = base.filter(col("id") >= 100000L && col("id") < 100000L + nServe)
          .orderBy("id").select(col("id"), col("vec")).collect()
          .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
        val serveQs = serveRows.map(_._2)
        // true ground truth for the serve queries (one exact batched
        // scan at 500K): the recall axis for every serve flavor. NOT
        // overlap-vs-contract — a wide quantized beam + exact re-rank
        // finds true neighbors the ef=64 contract walk itself misses,
        // so overlap against that fallible reference falls as quality
        // rises; recall against the exact scan is the honest axis.
        val sgGt = Search.groundTruth(base500,
            base.filter(col("id") >= 100000L && col("id") < 100000L + nServe)
              .select(col("id").as("qid"), col("vec").as("qvec")),
            k, Metric.Dot)
          .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
        def sgRecall(fn: Array[Float] => Array[(Long, Double)]): Double = {
          var h = 0L
          serveRows.foreach { case (qid, qv) =>
            h += fn(qv).map(_._1).toSet.intersect(sgGt(qid)).size
          }
          h.toDouble / (nServe * k)
        }
        def pctOf(lat: Array[Double])(p: Double): Double = {
          val idx = p * (lat.length - 1)
          val lo = idx.toInt
          val frac = idx - lo
          if (lo + 1 < lat.length) lat(lo) * (1 - frac) + lat(lo + 1) * frac
          else lat(lo)
        }
        for (ef <- Seq(16, 64, 256)) {
          serveQs.take(32).foreach { qv => // warm: JIT + graph touch
            Hnsw.searchLocal(qv, sgKey, 1, k, Metric.Dot, hM, hEfc, ef)
          }
          val lat = serveQs.map { qv =>
            val t0 = System.nanoTime()
            Hnsw.searchLocal(qv, sgKey, 1, k, Metric.Dot, hM, hEfc, ef)
            (System.nanoTime() - t0) / 1e3
          }
          java.util.Arrays.sort(lat)
          val pct = pctOf(lat) _
          val rec = sgRecall(qv =>
            Hnsw.searchLocal(qv, sgKey, 1, k, Metric.Dot, hM, hEfc, ef))
          annResults(s"ann_hnsw_single_graph_ef$ef") = Map(
            "p50_us" -> pct(0.50), "p95_us" -> pct(0.95),
            "p99_us" -> pct(0.99), "avg_us" -> lat.sum / nServe,
            "ef_search" -> ef.toDouble, "n_vec" -> sgN.toDouble,
            "recall" -> rec, "build_sec" -> sgBuild, "cached" -> sgCached)
          println(f"[scale] ann_hnsw_single_graph_ef$ef%-4d p50=${pct(0.5)}%8.1f us  p99=${pct(0.99)}%8.1f us  recall=$rec%.4f  (build ${sgBuild}%6.1f s)")
        }
        // FLOAT-ACC serving flavor at the hnswlib comparison point (r13,
        // verdict task #3): the 3.3× kernel margin vs hnswlib's 0.208 ms
        // was attributed to the double-lane precision contract — the facc
        // twin measures how much of the margin that contract actually is.
        // Same graph, same queries; id-overlap vs the contract path rides
        // beside the latency (ties may flip — recall-gated, never hashed).
        {
          val ef = 64
          serveQs.take(32).foreach { qv =>
            Hnsw.searchLocal(qv, sgKey, 1, k, Metric.Dot, hM, hEfc, ef,
              floatAcc = true)
          }
          var overlap = 0L
          val lat = serveQs.map { qv =>
            val t0 = System.nanoTime()
            val got = Hnsw.searchLocal(qv, sgKey, 1, k, Metric.Dot, hM, hEfc,
              ef, floatAcc = true)
            val dt = (System.nanoTime() - t0) / 1e3
            val contract = Hnsw.searchLocal(qv, sgKey, 1, k, Metric.Dot, hM,
              hEfc, ef)
            overlap += got.map(_._1).toSet
              .intersect(contract.map(_._1).toSet).size
            dt
          }
          java.util.Arrays.sort(lat)
          val pct = pctOf(lat) _
          annResults("ann_hnsw_single_graph_ef64_facc") = Map(
            "p50_us" -> pct(0.50), "p95_us" -> pct(0.95),
            "p99_us" -> pct(0.99), "avg_us" -> lat.sum / nServe,
            "ef_search" -> ef.toDouble, "n_vec" -> sgN.toDouble,
            "overlap_vs_contract" -> overlap.toDouble / (nServe * k))
          println(f"[scale] ann_hnsw_single_graph_ef64_facc p50=${pct(0.5)}%8.1f us  p99=${pct(0.99)}%8.1f us  overlap=${overlap.toDouble / (nServe * k)}%.4f")
        }
        // i8-QUANTIZED serving flavor (r14): beam over the int8 sidecar
        // (4× fewer bytes per gathered row against the DRAM-bound walk —
        // the r14 profile's one remaining lever), exact contract-kernel
        // re-rank of the ef survivors. Recall-gated like facc; overlap
        // vs the contract path rides beside the latency.
        {
          val ef = 64
          val tQ = System.nanoTime()
          Hnsw.quantizeWarmed(sgKey)
          val quantSec = (System.nanoTime() - tQ) / 1e9
          serveQs.take(32).foreach { qv =>
            Hnsw.searchLocal(qv, sgKey, 1, k, Metric.Dot, hM, hEfc, ef,
              quantized = true)
          }
          var overlap = 0L
          val lat = serveQs.map { qv =>
            val t0 = System.nanoTime()
            val got = Hnsw.searchLocal(qv, sgKey, 1, k, Metric.Dot, hM,
              hEfc, ef, quantized = true)
            val dt = (System.nanoTime() - t0) / 1e3
            val contract = Hnsw.searchLocal(qv, sgKey, 1, k, Metric.Dot,
              hM, hEfc, ef)
            overlap += got.map(_._1).toSet
              .intersect(contract.map(_._1).toSet).size
            dt
          }
          java.util.Arrays.sort(lat)
          val pct = pctOf(lat) _
          val rec8 = sgRecall(qv =>
            Hnsw.searchLocal(qv, sgKey, 1, k, Metric.Dot, hM, hEfc, ef,
              quantized = true))
          annResults("ann_hnsw_single_graph_ef64_i8") = Map(
            "p50_us" -> pct(0.50), "p95_us" -> pct(0.95),
            "p99_us" -> pct(0.99), "avg_us" -> lat.sum / nServe,
            "ef_search" -> ef.toDouble, "n_vec" -> sgN.toDouble,
            "quantize_sec" -> quantSec, "recall" -> rec8,
            "overlap_vs_contract" -> overlap.toDouble / (nServe * k))
          println(f"[scale] ann_hnsw_single_graph_ef64_i8 p50=${pct(0.5)}%8.1f us  p99=${pct(0.99)}%8.1f us  recall=$rec8%.4f  overlap=${overlap.toDouble / (nServe * k)}%.4f")
        }
        // i8 OVERFETCH matched point (r14): a wider quantized beam buys
        // back the i8 walk's true-neighbor beam misses at i8 byte
        // prices — the exact re-rank still returns k. Measured on the
        // recall axis (vs sgGt), NOT overlap-vs-contract.
        {
          val efq = 128
          serveQs.take(32).foreach { qv =>
            Hnsw.searchLocal(qv, sgKey, 1, k, Metric.Dot, hM, hEfc, efq,
              quantized = true)
          }
          val lat = serveQs.map { qv =>
            val t0 = System.nanoTime()
            Hnsw.searchLocal(qv, sgKey, 1, k, Metric.Dot, hM, hEfc, efq,
              quantized = true)
            (System.nanoTime() - t0) / 1e3
          }
          java.util.Arrays.sort(lat)
          val pct = pctOf(lat) _
          val rec = sgRecall(qv =>
            Hnsw.searchLocal(qv, sgKey, 1, k, Metric.Dot, hM, hEfc, efq,
              quantized = true))
          annResults("ann_hnsw_single_graph_i8_ef128") = Map(
            "p50_us" -> pct(0.50), "p95_us" -> pct(0.95),
            "p99_us" -> pct(0.99), "avg_us" -> lat.sum / nServe,
            "ef_search" -> efq.toDouble, "n_vec" -> sgN.toDouble,
            "recall" -> rec)
          println(f"[scale] ann_hnsw_single_graph_i8_ef128 p50=${pct(0.5)}%8.1f us  p99=${pct(0.99)}%8.1f us  recall=$rec%.4f")
        }
        // GRAPH-STORE warm + serve (v2, r14): persist the warmed single
        // graph WITH its i8 sidecar, drop the in-JVM copy, restore
        // MAPPED (payload + codes off-heap), and serve both flavors from
        // the store — executor warm-up priced as I/O at the 500K point.
        {
          // keyed on graph params + store generation: a stale store built
          // under different hM/hEfc/seed would restore under the OLD
          // inner keys and crash the serve lookup (manifest keys embed
          // the params)
          val storeDir = sgStoreHit.getOrElse(
            s"target/scale_hnsw_store_${sgN}_${hM}_${hEfc}_42_g2")
          val fresh = sgStoreHit.isEmpty
          val tW = System.nanoTime()
          if (fresh) Hnsw.saveWarmed(sgKey, storeDir)
          val writeSec = (System.nanoTime() - tW) / 1e9
          Hnsw.invalidate(sgKey)
          val tR = System.nanoTime()
          Hnsw.warmFromDisk(sgKey, storeDir, mapped = true, prefault = true)
          val warmSec = (System.nanoTime() - tR) / 1e9
          for ((quant, name) <- Seq(
              (false, "ann_hnsw_store_serve"),
              (true, "ann_hnsw_store_serve_i8"))) {
            serveQs.take(32).foreach { qv =>
              Hnsw.searchLocal(qv, sgKey, 1, k, Metric.Dot, hM, hEfc, 64,
                quantized = quant)
            }
            val lat = serveQs.map { qv =>
              val t0 = System.nanoTime()
              Hnsw.searchLocal(qv, sgKey, 1, k, Metric.Dot, hM, hEfc, 64,
                quantized = quant)
              (System.nanoTime() - t0) / 1e3
            }
            java.util.Arrays.sort(lat)
            val pct = pctOf(lat) _
            annResults(name) = Map(
              "p50_us" -> pct(0.50), "p95_us" -> pct(0.95),
              "p99_us" -> pct(0.99), "avg_us" -> lat.sum / nServe,
              "n_vec" -> sgN.toDouble, "warm_sec" -> warmSec) ++
              (if (fresh) Map("write_sec" -> writeSec) else Map.empty)
            println(f"[scale] $name%-28s p50=${pct(0.5)}%8.1f us  p99=${pct(0.99)}%8.1f us  (warm ${warmSec}%.2f s)")
          }
        }
        Hnsw.invalidate(sgKey)
      }
      listSizes.unpersist()

      // ---- INCREMENTAL MAINTENANCE row (r16): the index-lifecycle cost
      // a 100 TB deployment pays continuously — upsert a 10 % batch into
      // a warmed routed group, tombstone-delete ~5 %, serve through the
      // tombstones, then compact back to the canonical graphs (per-shard
      // parallel rebuilds). 200K×384d over 16 shards: big enough that
      // per-shard insert cost is the real signal, small enough that the
      // row doesn't dominate the artifact. The PRE-maintenance group is
      // store-cached across runs (build-once like the single-graph row);
      // maintenance itself re-runs every time — it IS the measurement.
      if (only.forall(_.contains("ann_hnsw_upsert"))) {
        System.gc(); Thread.sleep(300)
        val mN = 200000L
        val mShards = 16
        val mKey = s"$annKey|hnsw|maint$mN"
        val mStore = s"target/scale_hnsw_maint_store_${mN}_${hM}_${hEfc}_42_g1"
        Hnsw.invalidate(mKey)
        val mBase = base.filter(col("id") < mN)
        val tB = System.nanoTime()
        val mCached = new java.io.File(s"$mStore/MANIFEST").isFile
        if (mCached) Hnsw.warmFromDisk(mKey, mStore) // heap: inserts mutate
        else {
          Hnsw.search(mBase, queries, k, Metric.Dot, m = hM,
            efConstruction = hEfc, efSearch = 64, nShards = mShards,
            cacheKey = mKey).count()
          Hnsw.saveWarmed(mKey, mStore)
        }
        val mWarmSec = (System.nanoTime() - tB) / 1e9
        // upsert 20K fresh rows (ids above the corpus — append-only per
        // shard, so the mutated graphs stay canonical) + replace 1K
        val upRows = base.filter(
          (col("id") >= mN && col("id") < mN + 19000L) ||
            (col("id") < mN && col("id") % 200 === 7))
        val nUp = upRows.count()
        val tU = System.nanoTime()
        val upStats = Hnsw.upsertWarmed(upRows, mKey, nShards = mShards,
          Metric.Dot, m = hM, efConstruction = hEfc).collect()
        val upSec = (System.nanoTime() - tU) / 1e9
        require(upStats.map(_.getLong(1)).sum == nUp, "upsert count off")
        // tombstone-delete ~5 % of the maintained corpus
        val delIds = (0L until mN + 19000L).filter(_ % 21 == 5).toArray
        val tD = System.nanoTime()
        val nDel = Hnsw.deleteWarmed(spark, mKey, delIds, mShards)
        val delSec = (System.nanoTime() - tD) / 1e9
        val nLive = Hnsw.liveCountWarmed(mKey)
        // serve THROUGH the tombstones (ef widening pays here), then
        // compact and serve the canonical graphs
        val serveQs = base.filter(col("id") >= 300000L && col("id") < 300256L)
          .orderBy("id").select(col("vec")).collect()
          .map(_.getSeq[Float](0).toArray)
        def p50Of(tag: String): Double = {
          serveQs.take(32).foreach { qv =>
            Hnsw.searchLocal(qv, mKey, mShards, k, Metric.Dot, hM, hEfc, 64)
          }
          val lat = serveQs.map { qv =>
            val t0 = System.nanoTime()
            val got = Hnsw.searchLocal(qv, mKey, mShards, k, Metric.Dot,
              hM, hEfc, 64)
            require(got.length == k && !got.exists(_._1 % 21 == 5),
              s"$tag: short or tombstone-leaking serve")
            (System.nanoTime() - t0) / 1e3
          }
          java.util.Arrays.sort(lat)
          lat(lat.length / 2)
        }
        val p50Maint = p50Of("maintained")
        // r17: compaction through the DISPATCHED path — the same
        // one-shard-per-task lane upsert/delete ride, so this row now
        // measures the shape a cluster would actually run (the r16 row
        // measured the driver-local in-process flavor)
        val tC = System.nanoTime()
        val nCompacted = Hnsw.compactDispatched(spark, mKey, mShards)
          .filter(col("n_compacted") > 0).count()
        val compactSec = (System.nanoTime() - tC) / 1e9
        val p50Compact = p50Of("compacted")
        annResults("ann_hnsw_upsert") = Map(
          "n_vec" -> mN.toDouble, "n_shards" -> mShards.toDouble,
          "warm_sec" -> mWarmSec,
          "cached" -> (if (mCached) 1.0 else 0.0),
          "upsert_rows" -> nUp.toDouble, "upsert_sec" -> upSec,
          "upsert_rows_per_sec" -> nUp / upSec,
          "n_deleted" -> nDel.toDouble, "delete_sec" -> delSec,
          "n_live" -> nLive.toDouble,
          "p50_us_maintained" -> p50Maint,
          "compact_sec" -> compactSec,
          "shards_compacted" -> nCompacted.toDouble,
          "p50_us_compacted" -> p50Compact)
        println(f"[scale] ann_hnsw_upsert       ${nUp / upSec}%8.0f rows/s upsert ($upSec%.1f s)  del=$delSec%.2f s  compact=$compactSec%.1f s  p50 maint=$p50Maint%.0f us / compacted=$p50Compact%.0f us")
        Hnsw.invalidate(mKey)
      }

      // ---- 1M-group maintenance row (r17, verdict task #3): the 200K
      // row proves the mechanism; this one measures it where the known
      // O(batch × shards) costs first bite — the upsert/delete pre-pass
      // broadcasts the batch's id set to EVERY routed shard task (~110K
      // ids × 1024 graphs of hash probes), and compaction rebuilds every
      // touched graph. Routed group over 900K of the corpus on the IVF
      // centroids (the production router), store-cached across runs;
      // the maintenance itself — a 100K append-only routed upsert + ~9K
      // replaces, a 5 % tombstone delete, serve-through, dispatched
      // compaction, serve again — re-runs every time. Serve-through
      // recall is gated against exact GT on the LIVE set (the a16
      // leaked-tombstone invariant at 1M: a leaked dead id or a
      // lost live one drops it). ----
      if (only.forall(_.contains("ann1m_hnsw_upsert"))) {
        System.gc(); Thread.sleep(300)
        val m1N = 900000L
        val m1Key = s"$annKey|hnsw|maint1m"
        val m1Store = s"target/scale_hnsw_maint1m_store_${m1N}_${hM}_${hEfc}_42_g1"
        Hnsw.invalidate(m1Key)
        val tB1 = System.nanoTime()
        val m1Cached = new java.io.File(s"$m1Store/MANIFEST").isFile
        if (m1Cached) Hnsw.warmFromDisk(m1Key, m1Store) // heap: inserts mutate
        else {
          Hnsw.searchRouted(base.filter(col("id") < m1N), queries,
            idx.centroids, routeProbe = 32, k, Metric.Dot, hM, hEfc,
            efSearch = 64, cacheKey = m1Key).count()
          Hnsw.saveWarmed(m1Key, m1Store)
        }
        val m1WarmSec = (System.nanoTime() - tB1) / 1e9
        // 100K fresh rows (append-only: ids at/above the group ceiling)
        // + ~9K replaces routed by their vectors, like production churn
        val up1 = base.filter(col("id") >= m1N ||
          (col("id") < m1N && col("id") % 100 === 7))
        val nUp1 = up1.count()
        val tU1 = System.nanoTime()
        val upStats1 = Hnsw.upsertWarmed(up1, m1Key, nShards = nlist,
          Metric.Dot, m = hM, efConstruction = hEfc,
          centroids = idx.centroids, createMissing = true).collect()
        val upSec1 = (System.nanoTime() - tU1) / 1e9
        require(upStats1.map(_.getLong(1)).sum == nUp1, "1M upsert count off")
        val del1 = (0L until annN).filter(_ % 20 == 3).toArray
        val tD1 = System.nanoTime()
        val nDel1 = Hnsw.deleteWarmed(spark, m1Key, del1, nlist)
        val delSec1 = (System.nanoTime() - tD1) / 1e9
        require(Hnsw.liveCountWarmed(m1Key) == annN - nDel1,
          "1M live count drifted")
        val nServe1 = 128
        val serveQs1 = base.filter(col("id") >= 100000L && col("id") < 100000L + nServe1)
          .orderBy("id").select(col("id"), col("vec")).collect()
          .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
        def p50Of1(tag: String): Double = {
          serveQs1.take(32).foreach { case (_, qv) =>
            Hnsw.searchLocal(qv, m1Key, nlist, k, Metric.Dot, hM, hEfc,
              efSearch = 64, centroids = idx.centroids, routeProbe = 32,
              allowMissing = true)
          }
          val lat = serveQs1.map { case (_, qv) =>
            val t0 = System.nanoTime()
            val got = Hnsw.searchLocal(qv, m1Key, nlist, k, Metric.Dot,
              hM, hEfc, efSearch = 64, centroids = idx.centroids,
              routeProbe = 32, allowMissing = true)
            require(got.length == k && !got.exists(_._1 % 20 == 3),
              s"$tag: short or tombstone-leaking 1M serve")
            (System.nanoTime() - t0) / 1e3
          }
          java.util.Arrays.sort(lat)
          lat(lat.length / 2)
        }
        // exact GT on the LIVE set for the serve queries — the recall
        // axis for both serve points (one batched 1M scan, cached)
        val serveQdf1 = base.filter(col("id") >= 100000L && col("id") < 100000L + nServe1)
          .select(col("id").as("qid"), col("vec").as("qvec"))
        val gtLive1 = Search.groundTruth(
          base.filter(col("id") % 20 =!= 3), serveQdf1, k, Metric.Dot).cache()
        gtLive1.count()
        def recall1(): Double = {
          val pred = Hnsw.searchWarm(serveQdf1, m1Key, nShards = nlist, k,
            Metric.Dot, hM, hEfc, efSearch = 64, centroids = idx.centroids,
            routeProbe = 32, allowMissing = true)
          require(pred.filter(col("id") % 20 === 3).count() == 0,
            "1M warm serve leaked a tombstoned id")
          Ivf.meanRecall(pred, gtLive1, k).collect()(0).getDouble(0)
        }
        val p50Maint1 = p50Of1("maintained")
        val recMaint1 = recall1()
        val tC1 = System.nanoTime()
        val compacted1 = Hnsw.compactDispatched(spark, m1Key, nlist)
          .filter(col("n_compacted") > 0).count()
        val compactSec1 = (System.nanoTime() - tC1) / 1e9
        require(Hnsw.deletedCountWarmed(m1Key) == 0, "1M compaction left tombstones")
        val p50Compact1 = p50Of1("compacted")
        val recCompact1 = recall1()
        gtLive1.unpersist()
        annResults("ann1m_hnsw_upsert") = Map(
          "n_vec" -> annN.toDouble, "n_shards" -> nlist.toDouble,
          "warm_sec" -> m1WarmSec,
          "cached" -> (if (m1Cached) 1.0 else 0.0),
          "upsert_rows" -> nUp1.toDouble, "upsert_sec" -> upSec1,
          "upsert_rows_per_sec" -> nUp1 / upSec1,
          "n_deleted" -> nDel1.toDouble, "delete_sec" -> delSec1,
          "n_live" -> (annN - nDel1).toDouble,
          "p50_us_maintained" -> p50Maint1,
          "recall_maintained" -> recMaint1,
          "compact_sec" -> compactSec1,
          "shards_compacted" -> compacted1.toDouble,
          "p50_us_compacted" -> p50Compact1,
          "recall_compacted" -> recCompact1)
        println(f"[scale] ann1m_hnsw_upsert     ${nUp1 / upSec1}%8.0f rows/s upsert ($upSec1%.1f s)  del=$delSec1%.2f s  compact=$compactSec1%.1f s ($compacted1 shards)  p50 maint=$p50Maint1%.0f/comp=$p50Compact1%.0f us  recall ${recMaint1}%.4f/${recCompact1}%.4f")
        Hnsw.invalidate(m1Key)
      }

      // ---- PQ-family MAINTENANCE row (r16, the a17 surface at scale):
      // frozen-quantizer append throughput — assign + residual-encode +
      // blocked-nibble write into the touched cluster partitions, plus
      // the refine table's flat append, then a probe over the grown
      // pair. The PRE-append artifacts (coarse, books, blocked codes,
      // clustered refine table on a 180K slice) are build-once cached;
      // each run copies them into a scratch dir and appends there, so
      // the append itself — the measurement — re-runs every time
      // without growing the cached artifact. ----
      if (only.forall(_.contains("ann_pq4_append"))) {
        System.gc()
        val pN = 180000L
        val pAdd = 20000L
        val pNlist = 256
        val pre = s"target/scale_pq4_maint_${pN}_${annDim}_${pNlist}_g1"
        val pOld = base.filter(col("id") < pN)
        if (!new java.io.File(s"$pre/_SUCCESS").isFile) {
          val coarse = Ivf.train(pOld, nlist = pNlist, ntrain = 100000)
          val assigned = Ivf.assign(pOld, coarse)
            .withColumn("residual",
              Pq.centroidResidual(col("vec"), col("cluster_id"), coarse))
          val books = Pq.train(
            assigned.select(col("id"), col("residual").as("vec")),
            m = annDim / 4, ksub = 16, ntrain = 100000)
          graft.io.QuantizedTables.writePq4BlockedClustered(
            assigned.select(col("id"), col("cluster_id"),
              Pq.pqEncode(col("residual"), books).as("codes")),
            s"$pre/codes")
          Ivf.writeClustered(Ivf.assign(pOld, coarse), s"$pre/flat")
          Ivf.saveMatrix(s"$pre/coarse.bin", coarse)
          Pq.saveBooks(s"$pre/books.bin", books)
          java.nio.file.Files.createFile(
            java.nio.file.Paths.get(s"$pre/_SUCCESS"))
        }
        val coarse = Ivf.loadMatrix(s"$pre/coarse.bin").get
        val books = Pq.loadBooks(s"$pre/books.bin").get
        val work = java.nio.file.Files
          .createTempDirectory(java.nio.file.Paths.get("target"),
            "pq4_maint_work").toString
        def copyTree(src: String, dst: String): Unit = {
          val s0 = java.nio.file.Paths.get(src)
          val d0 = java.nio.file.Paths.get(dst)
          val st = java.nio.file.Files.walk(s0)
          try st.forEach { p =>
            val t = d0.resolve(s0.relativize(p))
            if (java.nio.file.Files.isDirectory(p))
              java.nio.file.Files.createDirectories(t)
            else java.nio.file.Files.copy(p, t)
          } finally st.close()
        }
        copyTree(s"$pre/codes", s"$work/codes")
        copyTree(s"$pre/flat", s"$work/flat")
        val codesIdx = Pq.Index(coarse, books, s"$work/codes")
        val flatIdx = Ivf.Index(coarse, s"$work/flat")
        val batch = base.filter(col("id") >= pN && col("id") < pN + pAdd)
        val tA = System.nanoTime()
        val appended = Pq.appendIvf4(codesIdx, batch)
        val codesSec = (System.nanoTime() - tA) / 1e9
        val tF = System.nanoTime()
        val flatAppended = Ivf.appendClustered(flatIdx, batch)
        val flatSec = (System.nanoTime() - tF) / 1e9
        require(appended == pAdd && flatAppended == pAdd, "append count off")
        val tP = System.nanoTime()
        val probeRows = Pq.searchFastScanIvfRefinedClustered(flatIdx,
          codesIdx, queries, nprobe = 8, k = k, refineK = 100).count()
        val probeSec = (System.nanoTime() - tP) / 1e9
        annResults("ann_pq4_append") = Map(
          "n_vec" -> pN.toDouble, "append_rows" -> pAdd.toDouble,
          "codes_append_sec" -> codesSec, "flat_append_sec" -> flatSec,
          "rows_per_sec" -> pAdd / (codesSec + flatSec),
          "probe_sec" -> probeSec, "probe_rows" -> probeRows.toDouble,
          "nlist" -> pNlist.toDouble)
        println(f"[scale] ann_pq4_append       ${pAdd / (codesSec + flatSec)}%8.0f rows/s append (codes $codesSec%.2f s + flat $flatSec%.2f s)  probe=$probeSec%.2f s over the grown pair")
        // scratch cleanup — the cached PRE artifacts stay
        val rm = java.nio.file.Files.walk(java.nio.file.Paths.get(work))
        try rm.sorted(java.util.Comparator.reverseOrder())
          .forEach(p => { java.nio.file.Files.delete(p); () })
        finally rm.close()
      }

      // ---- 3M-class scale point (r11, verdict task #7): the reference's
      // largest corpus is 2.9M×384 (`Performance.md:61-63`). One exact
      // scan, one build (train + assign_write phases), one probe at 3×
      // the 1M corpus — the scaling slopes of the three headline ops:
      // scan sec ∝ N, build assign ∝ N while train is sample-bound
      // (N-independent by the FAISS nlist×256 cap), probe ∝ scanned
      // lists (sub-linear in N at fixed nprobe/nlist). ----
      // same settle before the 3M section: its exact scan is the largest
      // execution-memory consumer in the file and must not start with
      // stale checkpoint/broadcast blocks squeezing the unified pool
      Pq.releaseBroadcasts()
      System.gc(); Thread.sleep(700); System.gc()
      if (only.forall(_.exists(_.startsWith("ann3m")))) {
        val n3 = 3000000L
        val key3 = s"annscale_${n3}_lr8"
        val path3 = s"target/scale_vectors_${n3}_${annDim}_lr8"
        if (!new java.io.File(s"$path3/_SUCCESS").isFile)
          SyntheticVectors.lowRankFast(spark, n3, annDim, intrinsic = 8)
            .write.mode("overwrite").parquet(path3)
        val base3 = spark.read.parquet(path3)
        val q3 = base3.filter(col("id") < 16)
          .select(col("id").as("qid"), col("vec").as("qvec")).cache()
        q3.count()
        runAnn("ann3m_exact_scan") {
          Map("rows" -> Search.exactTopKFused(base3, q3, k, Metric.Dot)
            .count().toDouble, "n_vec" -> n3.toDouble,
            "stored_mb" -> dirBytes(path3) / 1e6)
        }
        val b3Cached = new java.io.File(
          s"target/ivf_cache/${Ivf.cacheDigest(s"$key3|$nlist|200000|42|t6")}/_SUCCESS").isFile
        val tB3 = System.nanoTime()
        val b3Phases = scala.collection.mutable.LinkedHashMap.empty[String, Double]
        val idx3 = Ivf.buildOrGet(spark, base3, key3, nlist = nlist,
          ntrain = 200000, onPhase = (p, s) => b3Phases(p) = s)
        annResults("ann3m_ivf_build") = Map(
          "sec" -> (System.nanoTime() - tB3) / 1e9, "nlist" -> nlist.toDouble,
          "n_vec" -> n3.toDouble,
          "cached" -> (if (b3Cached) 1.0 else 0.0)) ++
          b3Phases.map { case (p, s) => s"${p}_sec" -> s }
        println(f"[scale] ann3m_ivf_build       ${annResults("ann3m_ivf_build")("sec")}%8.2f s")
        val clustered3 = idx3.clustered(spark)
        runAnn("ann3m_ivf_probe_np8") {
          Map("rows" -> Ivf.search(clustered3, q3, idx3.centroids,
            nprobe = 8, k = k).count().toDouble, "n_vec" -> n3.toDouble)
        }
        // r12 (verdict task #6): the two 100 TB SERVING flavors at 3M, so
        // both have a measured 1M→3M slope. GT via one exact scan.
        val gt3 = Search.groundTruth(base3, q3, k, Metric.Dot).cache()
        gt3.count()
        // (a) IVF-fastscan probe at the r12 operating point (np8/rk100):
        // probe cost must track nprobe/nlist (scanned cells ∝ 1/nlist of
        // a 3× corpus → ~3× bytes per cell, same cell count)
        val ivf43Key = s"$key3|ivf4|$nlist|${annDim / 4}|16|200000|42|t6"
        val ivf43Cached = new java.io.File(
          s"target/pq4_cache/${Ivf.cacheDigest(ivf43Key)}/_SUCCESS").isFile
        val tIvf43 = System.nanoTime()
        val ivf43 = Pq.buildOrGetIvf4(spark, base3, key3, nlist = nlist,
          m4 = annDim / 4, ntrain = 200000)
        annResults("ann3m_pq4_ivf_build") = Map(
          "sec" -> (System.nanoTime() - tIvf43) / 1e9,
          "nlist" -> nlist.toDouble, "n_vec" -> n3.toDouble,
          "cached" -> (if (ivf43Cached) 1.0 else 0.0))
        println(f"[scale] ann3m_pq4_ivf_build   ${annResults("ann3m_pq4_ivf_build")("sec")}%8.2f s")
        runAnn("ann3m_pq4_ivf_probe") {
          val pred = Pq.searchFastScanIvfRefined(base3, ivf43, q3,
            nprobe = 8, k, refineK = 100)
          Map("recall" -> Ivf.meanRecall(pred, gt3, k).collect()(0).getDouble(0),
            "nprobe" -> 8.0, "refine_k" -> 100.0, "n_vec" -> n3.toDouble,
            "stored_mb" -> dirBytes(ivf43.path) / 1e6)
        }
        // (a') the nlist-SCALING recipe made concrete (r13, verdict task
        // #7): ann3m_pq4_ivf_probe pays 3× rows/cell at nlist=1024; the
        // documented fix for constant probe cost is nlist ∝ corpus. With
        // nlist=4096 the cells are back at ~1M/1024 geometry (732 vs 977
        // rows/cell) — and the stable-stop trainer (the r13 default)
        // makes the 4096-cell coarse train affordable. np=8 holds the
        // byte budget at the 1M level; np=16 is the recall-insurance
        // point (2× cells probed still scans ~1.5× the 1M bytes).
        val ivf43bKey = s"$key3|ivf4|4096|${annDim / 4}|16|200000|42|t6"
        val ivf43bCached = new java.io.File(
          s"target/pq4_cache/${Ivf.cacheDigest(ivf43bKey)}/_SUCCESS").isFile
        val tIvf43b = System.nanoTime()
        val ivf43b = Pq.buildOrGetIvf4(spark, base3, key3, nlist = 4096,
          m4 = annDim / 4, ntrain = 200000)
        annResults("ann3m_pq4_ivf_build_nlist4096") = Map(
          "sec" -> (System.nanoTime() - tIvf43b) / 1e9,
          "nlist" -> 4096.0, "n_vec" -> n3.toDouble,
          "cached" -> (if (ivf43bCached) 1.0 else 0.0))
        println(f"[scale] ann3m_pq4_ivf_build_nlist4096 ${annResults("ann3m_pq4_ivf_build_nlist4096")("sec")}%8.2f s")
        for (np <- Seq(8, 16)) {
          runAnn(s"ann3m_pq4_ivf_probe_nlist4096_np$np") {
            val pred = Pq.searchFastScanIvfRefined(base3, ivf43b, q3,
              nprobe = np, k, refineK = 100)
            Map("recall" -> Ivf.meanRecall(pred, gt3, k).collect()(0).getDouble(0),
              "nprobe" -> np.toDouble, "refine_k" -> 100.0,
              "nlist" -> 4096.0, "n_vec" -> n3.toDouble)
          }
        }
        // CLUSTERED-REFINE at 3M (r13): the nlist-4096 rows above proved
        // the flat refine's corpus scan was the wall — candidate-stage
        // bytes fell 4x (nlist 1024 -> 4096) and the wall moved nothing.
        // Pruning the refine fetch to the probed cells is the fix; at
        // np8/nlist4096 the fetch reads ~0.8% of the corpus instead of
        // 4.6 GB. nlist=1024 twin first (reuses idx3's clustered table),
        // then the 4096 point over its own clustered table.
        runAnn("ann3m_pq4_ivf_probe_cref") {
          val pred = Pq.searchFastScanIvfRefinedClustered(idx3, ivf43,
            q3, nprobe = 8, k, refineK = 100)
          Map("recall" -> Ivf.meanRecall(pred, gt3, k).collect()(0).getDouble(0),
            "nprobe" -> 8.0, "refine_k" -> 100.0, "nlist" -> nlist.toDouble,
            "n_vec" -> n3.toDouble)
        }
        val b3bCached = new java.io.File(
          s"target/ivf_cache/${Ivf.cacheDigest(s"$key3|4096|200000|42|t6")}/_SUCCESS").isFile
        val tB3b = System.nanoTime()
        val idx3b = Ivf.buildOrGet(spark, base3, key3, nlist = 4096,
          ntrain = 200000)
        annResults("ann3m_ivf_build_nlist4096") = Map(
          "sec" -> (System.nanoTime() - tB3b) / 1e9, "nlist" -> 4096.0,
          "n_vec" -> n3.toDouble,
          "cached" -> (if (b3bCached) 1.0 else 0.0))
        println(f"[scale] ann3m_ivf_build_nlist4096 ${annResults("ann3m_ivf_build_nlist4096")("sec")}%8.2f s")
        for (np <- Seq(8, 16)) {
          runAnn(s"ann3m_pq4_ivf_probe_nlist4096_np${np}_cref") {
            val pred = Pq.searchFastScanIvfRefinedClustered(idx3b,
              ivf43b, q3, nprobe = np, k, refineK = 100)
            Map("recall" -> Ivf.meanRecall(pred, gt3, k).collect()(0).getDouble(0),
              "nprobe" -> np.toDouble, "refine_k" -> 100.0,
              "nlist" -> 4096.0, "n_vec" -> n3.toDouble)
          }
        }
        // (b) routed HNSW serve at 3M: 1024 cluster-shard graphs, probed
        // 32/nlist per query — per-query cost tracks routeProbe × shard
        // size (3× the 1M point's shard rows), not the shard count
        val routed3Key = s"$key3|hnsw|routed"
        // build-once across runs (r15), like the 500K single graph: the
        // 1024-shard routed group's v2 store warms in I/O time instead of
        // replaying the ~74 s build + 3M-row base shuffle
        val store3Hit = Seq(
            s"target/scale3m_hnsw_store_${nlist}_${hM}_${hEfc}_42_g2",
            s"target/scale3m_hnsw_store_$nlist")
          .find(d => new java.io.File(s"$d/MANIFEST").isFile)
        val tR3 = System.nanoTime()
        if (store3Hit.isDefined) Hnsw.warmFromDisk(routed3Key, store3Hit.get)
        else Hnsw.searchRouted(base3, q3, idx3.centroids, routeProbe = 32, k,
          Metric.Dot, hM, hEfc, efSearch = 64, cacheKey = routed3Key).count()
        annResults("ann3m_hnsw_routed_build") = Map(
          "sec" -> (System.nanoTime() - tR3) / 1e9,
          "n_vec" -> n3.toDouble, "shards" -> nlist.toDouble,
          "cached" -> (if (store3Hit.isDefined) 1.0 else 0.0))
        println(f"[scale] ann3m_hnsw_routed_build ${annResults("ann3m_hnsw_routed_build")("sec")}%8.2f s")
        runAnn("ann3m_hnsw_routed") {
          val pred = Hnsw.searchWarm(q3, routed3Key, nShards = nlist, k,
            Metric.Dot, hM, hEfc, efSearch = 64,
            centroids = idx3.centroids, routeProbe = 32)
          Map("recall" -> Ivf.meanRecall(pred, gt3, k).collect()(0).getDouble(0),
            "route_probe" -> 32.0, "n_vec" -> n3.toDouble)
        }
        // 3M IN-PROCESS serving points (r14, verdict task #5): both tiers
        // are pinned at 1M (pq4 ~1.0 ms, routed HNSW ~5.7 ms p50); these
        // rows close the 1M→3M SERVING slope the way r12/r13 closed the
        // batch slopes. 256 distinct queries, one timed call each after a
        // warm pass, reference-interpolated percentiles.
        val nServe3 = 256
        val serveQs3 = base3
          .filter(col("id") >= 100000L && col("id") < 100000L + nServe3)
          .orderBy("id").select(col("vec")).collect()
          .map(_.getSeq[Float](0).toArray)
        def pct3(lat: Array[Double])(p: Double): Double = {
          val idx = p * (lat.length - 1)
          val lo = idx.toInt
          val frac = idx - lo
          if (lo + 1 < lat.length) lat(lo) * (1 - frac) + lat(lo + 1) * frac
          else lat(lo)
        }
        // (a) routed HNSW in-process: the graphs routed3Key just built,
        // probed 32/nlist per query — results == the batch ann3m_hnsw
        // _routed flavor (HnswSpec local==warm), whose recall rides above
        serveQs3.take(32).foreach { qv =>
          Hnsw.searchLocal(qv, routed3Key, nlist, k, Metric.Dot, hM, hEfc,
            efSearch = 64, centroids = idx3.centroids, routeProbe = 32)
        }
        val latR3 = serveQs3.map { qv =>
          val t0 = System.nanoTime()
          Hnsw.searchLocal(qv, routed3Key, nlist, k, Metric.Dot, hM, hEfc,
            efSearch = 64, centroids = idx3.centroids, routeProbe = 32)
          (System.nanoTime() - t0) / 1e3
        }
        java.util.Arrays.sort(latR3)
        annResults("ann3m_hnsw_local_routed") = Map(
          "p50_us" -> pct3(latR3)(0.50), "p95_us" -> pct3(latR3)(0.95),
          "p99_us" -> pct3(latR3)(0.99), "avg_us" -> latR3.sum / nServe3,
          "route_probe" -> 32.0, "n_shards" -> nlist.toDouble,
          "n_vec" -> n3.toDouble)
        println(f"[scale] ann3m_hnsw_local_routed p50=${pct3(latR3)(0.5)}%8.1f us  p99=${pct3(latR3)(0.99)}%8.1f us")
        // (a') routed i8 serve at 3M (r14 late): quantize all shard
        // graphs once (sidecar = codes + scale + Σcode² per row) and
        // walk the routed beams over i8 bytes — the 3M point of the
        // quantized flavor, overlap vs the contract walk beside it
        val tQ3 = System.nanoTime()
        Hnsw.quantizeWarmed(routed3Key)
        val quantSec3 = (System.nanoTime() - tQ3) / 1e9
        serveQs3.take(32).foreach { qv =>
          Hnsw.searchLocal(qv, routed3Key, nlist, k, Metric.Dot, hM, hEfc,
            efSearch = 64, centroids = idx3.centroids, routeProbe = 32,
            quantized = true)
        }
        var ovl3 = 0L
        val latQ3 = serveQs3.map { qv =>
          val t0 = System.nanoTime()
          val got = Hnsw.searchLocal(qv, routed3Key, nlist, k, Metric.Dot,
            hM, hEfc, efSearch = 64, centroids = idx3.centroids,
            routeProbe = 32, quantized = true)
          val dt = (System.nanoTime() - t0) / 1e3
          val contract = Hnsw.searchLocal(qv, routed3Key, nlist, k,
            Metric.Dot, hM, hEfc, efSearch = 64,
            centroids = idx3.centroids, routeProbe = 32)
          ovl3 += got.map(_._1).toSet.intersect(contract.map(_._1).toSet).size
          dt
        }
        java.util.Arrays.sort(latQ3)
        annResults("ann3m_hnsw_local_routed_i8") = Map(
          "p50_us" -> pct3(latQ3)(0.50), "p95_us" -> pct3(latQ3)(0.95),
          "p99_us" -> pct3(latQ3)(0.99), "avg_us" -> latQ3.sum / nServe3,
          "route_probe" -> 32.0, "n_shards" -> nlist.toDouble,
          "n_vec" -> n3.toDouble, "quantize_sec" -> quantSec3,
          "overlap_vs_contract" -> ovl3.toDouble / (nServe3 * k))
        println(f"[scale] ann3m_hnsw_local_routed_i8 p50=${pct3(latQ3)(0.5)}%8.1f us  p99=${pct3(latQ3)(0.99)}%8.1f us  overlap=${ovl3.toDouble / (nServe3 * k)}%.4f")
        // (a'') the graph STORE at the 3M/1024-shard point: persist the
        // routed group (v2 — i8 sidecars ride along), drop it, restore
        // MAPPED — executor warm-up priced as I/O at the multi-GB scale
        // point — and re-measure the routed serve from the mapped store
        val storeDir3 = store3Hit.getOrElse(
          s"target/scale3m_hnsw_store_${nlist}_${hM}_${hEfc}_42_g2")
        val fresh3 = store3Hit.isEmpty
        val tW3 = System.nanoTime()
        if (fresh3) Hnsw.saveWarmed(routed3Key, storeDir3)
        val writeSec3 = (System.nanoTime() - tW3) / 1e9
        Hnsw.invalidate(routed3Key)
        val tWm3 = System.nanoTime()
        Hnsw.warmFromDisk(routed3Key, storeDir3, mapped = true,
          prefault = true)
        val warmSec3 = (System.nanoTime() - tWm3) / 1e9
        serveQs3.take(32).foreach { qv =>
          Hnsw.searchLocal(qv, routed3Key, nlist, k, Metric.Dot, hM, hEfc,
            efSearch = 64, centroids = idx3.centroids, routeProbe = 32)
        }
        val latS3 = serveQs3.map { qv =>
          val t0 = System.nanoTime()
          Hnsw.searchLocal(qv, routed3Key, nlist, k, Metric.Dot, hM, hEfc,
            efSearch = 64, centroids = idx3.centroids, routeProbe = 32)
          (System.nanoTime() - t0) / 1e3
        }
        java.util.Arrays.sort(latS3)
        annResults("ann3m_hnsw_store_serve") = Map(
          "p50_us" -> pct3(latS3)(0.50), "p95_us" -> pct3(latS3)(0.95),
          "p99_us" -> pct3(latS3)(0.99), "avg_us" -> latS3.sum / nServe3,
          "route_probe" -> 32.0, "n_shards" -> nlist.toDouble,
          "n_vec" -> n3.toDouble, "warm_sec" -> warmSec3,
          "store_mb" -> dirBytes(storeDir3) / 1e6) ++
          (if (fresh3) Map("write_sec" -> writeSec3) else Map.empty)
        println(f"[scale] ann3m_hnsw_store_serve p50=${pct3(latS3)(0.5)}%8.1f us  p99=${pct3(latS3)(0.99)}%8.1f us  (warm ${warmSec3}%.2f s, ${dirBytes(storeDir3) / 1e9}%.1f GB)")
        Hnsw.invalidate(routed3Key)
        // (b) pq4 in-process serve on the nlist=4096 index — the r13
        // recipe (nlist ∝ corpus) carried into the serving tier; the
        // refine reads the id-sorted full-precision store, so the serve
        // p50 tracks nprobe × rows/cell, not the corpus
        Pq.warmLocalIvf4(spark, ivf43b, "bench3m_ivf4", base3)
        serveQs3.take(32).foreach { qv =>
          Pq.searchLocalIvf4(qv, ivf43b, "bench3m_ivf4", nprobe = 8, k = 10,
            refineK = 100)
        }
        val latP3 = serveQs3.map { qv =>
          val t0 = System.nanoTime()
          Pq.searchLocalIvf4(qv, ivf43b, "bench3m_ivf4", nprobe = 8, k = 10,
            refineK = 100)
          (System.nanoTime() - t0) / 1e3
        }
        java.util.Arrays.sort(latP3)
        annResults("ann3m_pq4_local_serve") = Map(
          "p50_us" -> pct3(latP3)(0.50), "p95_us" -> pct3(latP3)(0.95),
          "p99_us" -> pct3(latP3)(0.99), "avg_us" -> latP3.sum / nServe3,
          "nprobe" -> 8.0, "refine_k" -> 100.0, "nlist" -> 4096.0,
          "n_vec" -> n3.toDouble)
        println(f"[scale] ann3m_pq4_local_serve p50=${pct3(latP3)(0.5)}%8.1f us  p99=${pct3(latP3)(0.99)}%8.1f us")
        Pq.invalidateLocal("bench3m_ivf4")
        gt3.unpersist()
        q3.unpersist()
      }
    }

    def j(d: Double) = if (d == d.floor && d.abs < 1e15) d.toLong.toString else f"$d%.3f"
    def section(m: scala.collection.mutable.LinkedHashMap[String, Map[String, Double]]) =
      m.map { case (name, vals) =>
        s""""$name":{${vals.map { case (kk, v) => s""""$kk":${j(v)}""" }.mkString(",")}}"""
      }.mkString(",")
    val ivfJson = ivfFrontier.map { r =>
      s"""{"nprobe":${r.getInt(0)},"recall":${j(r.getDouble(2))},"avg_s":${j(r.getDouble(3))},"scanned_rows":${r.getLong(8)}}"""
    }.mkString("[", ",", "]")
    val lshJson = lshFrontier.map { r =>
      s"""{"nplanes":${r.getInt(0)},"ntables":${r.getInt(1)},"probes":${r.getInt(2)},"recall":${j(r.getDouble(3))},"avg_s":${j(r.getDouble(4))}}"""
    }.mkString("[", ",", "]")
    def hnswJsonOf(rows: Array[org.apache.spark.sql.Row]) = rows.map { r =>
      s"""{"ef_search":${r.getInt(0)},"recall":${j(r.getDouble(1))},"avg_s":${j(r.getDouble(2))}}"""
    }.mkString("[", ",", "]")
    val hnswJson = hnswJsonOf(hnswFrontier)
    val hnswMidJson = hnswJsonOf(hnswMidFrontier)
    val hnswHardJson = hnswJsonOf(hnswHardFrontier)
    val line =
      s"""{"n_docs":$n,"cpus":$cpus,"corpus_mb":${j(corpusBytes / 1e6)},"ops":{${section(results)}},""" +
        s""""ann":{"n_vec":$annN,"dim":$annDim,"ops":{${section(annResults)}},""" +
        s""""ivf_frontier":$ivfJson,"lsh_frontier":$lshJson,"hnsw_frontier":$hnswJson,""" +
        s""""hnsw_frontier_mid":$hnswMidJson,"hnsw_frontier_hard":$hnswHardJson}}"""
    // subset runs (SPARK_GRAFT_SCALE_ONLY) are a dev aid — never let them
    // clobber the full recorded artifact
    if (only.isEmpty)
      java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH_SCALE.json"), line + "\n")
    spark.stop()
    println(line)
  }
}
