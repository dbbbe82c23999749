package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{GraftSession, Tables}
import graft.ops.{FilteredSearch, Ivf, Metric, Search}

/** Predicate-constrained search: the exact pre-filter anchor, the widened
  * IVF probe, HNSW over-fetch + post-filter, the auto chooser, and the
  * predicate's pushdown into the clustered scan.
  */
class FilteredSearchSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.01"
  lazy val spark: SparkSession = GraftSession.local(4)

  private def emb = Tables.embeddings(spark, dir)
  private def base = emb.select(col("vec_id").as("id"),
    col("embedding").as("vec"), col("label"))
  private def queries = emb.filter(col("vec_id") < 8)
    .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

  private val halfPred = col("label") < 5 // selectivity ~0.5
  private def filteredGt(pred: org.apache.spark.sql.Column): DataFrame =
    Search.groundTruth(base.filter(pred), queries, 10, Metric.Dot)

  private def recallOf(pred: DataFrame, gt: DataFrame): Double =
    Search.recallAtK(
      pred.groupBy("qid").agg(collect_list(col("id")).as("pred_ids")),
      gt, 10).collect()(0).getDouble(0)

  test("exact filtered top-k == independent unbatched path; rows obey the predicate") {
    val got = FilteredSearch.exact(base, halfPred, queries, 10)
    val want = Search.exactTopK(base.filter(halfPred), queries, 10, Metric.Dot)
    val g = got.select("qid", "id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val w = want.select("qid", "id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(g == w, s"batched filtered != unbatched filtered: ${(g diff w).take(3)}")
    val allowed = base.filter(halfPred).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(g.forall(t => allowed(t._2)), "result row violates the predicate")
  }

  test("IVF full-probe filtered == exact filtered (exhaustive anchor)") {
    val cents = Ivf.train(base, nlist = 16, ntrain = 500)
    val assigned = Ivf.assign(base, cents)
    val got = FilteredSearch.ivf(assigned, halfPred, queries, cents,
      nprobe = 16, k = 10, selectivity = 1.0) // selectivity 1.0: no widening, pure full probe
    val want = FilteredSearch.exact(base, halfPred, queries, 10)
    val g = got.select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val w = want.select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(g == w, s"full-probe filtered != exact filtered: ${(g diff w).take(3)}")
  }

  test("widened probe restores the filtered candidate budget (recall gate)") {
    val cents = Ivf.train(base, nlist = 16, ntrain = 500)
    val assigned = Ivf.assign(base, cents).cache()
    val gt = filteredGt(halfPred)
    val plain = FilteredSearch.ivf(assigned, halfPred, queries, cents,
      nprobe = 4, k = 10, selectivity = 1.0) // probes 4 lists despite the filter
    val widened = FilteredSearch.ivf(assigned, halfPred, queries, cents,
      nprobe = 4, k = 10) // measures s≈0.5 → probes ~8 lists
    val rPlain = recallOf(plain, gt)
    val rWide = recallOf(widened, gt)
    assert(rWide >= rPlain,
      s"widening must not lose recall: plain=$rPlain widened=$rWide")
    // Two-tier threshold (quantum 0.0125 here): the canonical CI SIMD
    // configuration (16 float lanes) reproduces the measured 0.8250
    // bitwise, so it keeps the tight one-quantum gate; only a different
    // species width / scalar fallback (which reorders float accumulation
    // and can flip a near-tie neighbor) gets the 2-quanta margin.
    val canonicalSimd = graft.functions.expressions.VectorKernels.simdEnabled &&
      graft.functions.expressions.Simd.floatLanes == 16
    val wideGate = if (canonicalSimd) 0.8125 else 0.80
    assert(rWide >= wideGate,
      s"widened filtered recall too low: $rWide (measured 0.8250, canonical=$canonicalSimd)")
    assigned.unpersist()
  }

  test("widenedProbe: 1/s scaling, nlist cap, no shrink below nprobe") {
    assert(FilteredSearch.widenedProbe(4, 0.5, 1024) == 8)
    assert(FilteredSearch.widenedProbe(4, 0.1, 1024) == 40)
    assert(FilteredSearch.widenedProbe(4, 0.001, 16) == 16) // capped
    assert(FilteredSearch.widenedProbe(4, 1.0, 1024) == 4)  // unfiltered: unchanged
  }

  test("HNSW over-fetch + post-filter: predicate holds, recall >= 0.9 at oversample 4") {
    val gt = filteredGt(halfPred)
    val got = FilteredSearch.hnswPostFilter(base, halfPred, queries,
      k = 10, oversample = 4, nShards = 4,
      cacheKey = "filteredspec_sf001_half")
    val allowed = base.filter(halfPred).select("id")
      .collect().map(_.getLong(0)).toSet
    val rows = got.select("qid", "id").collect()
    assert(rows.forall(r => allowed(r.getLong(1))), "post-filter leaked a row")
    assert(rows.groupBy(_.getLong(0)).forall(_._2.length == 10),
      "short result set despite sufficient matches")
    val r = recallOf(got, gt)
    assert(r >= 0.9, s"post-filter recall too low: $r")
  }

  test("HNSW post-filter join broadcasts the fetched side, never the corpus") {
    val plan = FilteredSearch.hnswPostFilter(base, halfPred, queries,
      k = 10, oversample = 4, nShards = 4,
      cacheKey = "filteredspec_sf001_half")
      .queryExecution.executedPlan.toString
    // the Q×fetchK fetched side is the hinted broadcast build side; a
    // sort-merge fallback would mean the corpus-derived allowed side
    // shuffles — the shape this gate exists to forbid
    assert(plan.contains("BroadcastHashJoin"),
      s"post-filter join is not broadcast:\n${plan.take(2000)}")
    assert(!plan.contains("SortMergeJoin"),
      s"corpus-derived side shuffled through a sort-merge join:\n${plan.take(2000)}")
  }

  test("HNSW post-filter warm flavor: same results, no corpus re-stream") {
    // cold call builds + caches the shard graphs under the key…
    val cold = FilteredSearch.hnswPostFilter(base, halfPred, queries,
      k = 10, oversample = 4, nShards = 4,
      cacheKey = "filteredspec_warm_gate")
    val c = cold.select("qid", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // …then the warm flavor must serve the IDENTICAL fetch from the
    // cached graphs without touching the base table: its fetch stage is
    // driven off a driver-side shard-list stub (r15: a positional
    // parallelize — one shard per task, collision-free — where it used
    // to be a hash-repartitioned Range), so the only base access left
    // in the plan is the allowed-id predicate scan.
    val warm = FilteredSearch.hnswPostFilter(base, halfPred, queries,
      k = 10, oversample = 4, nShards = 4,
      cacheKey = "filteredspec_warm_gate", warm = true)
    val w = warm.select("qid", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(w == c, s"warm != cold: ${(w diff c).take(3)} / ${(c diff w).take(3)}")
    val plan = warm.queryExecution.executedPlan.toString
    // ExternalRDDScanExec prints as "Scan[obj#…]" in the physical plan
    assert(plan.contains("Scan[obj") || plan.contains("Range"),
      s"warm fetch is not stub-driven:\n${plan.take(2000)}")
    // exactly ONE scan of the embeddings parquet (the pred filter side);
    // the cold plan has a second one feeding the shard build/fetch
    val scansOf = (p: String) => "Scan parquet".r.findAllIn(p).length
    assert(scansOf(plan) <= 1,
      s"warm plan re-streams the corpus for the fetch:\n${plan.take(2000)}")
    assert(scansOf(cold.queryExecution.executedPlan.toString) >= 2,
      "gate self-check: the cold plan should carry the extra corpus scan")
  }

  test("auto: tiny match set routes to the exact path (equal results)") {
    val tinyPred = col("label") === 3
    val got = FilteredSearch.auto(base, tinyPred, queries, 10,
      exactThreshold = 100000)
    val want = FilteredSearch.exact(base, tinyPred, queries, 10)
    val g = got.select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val w = want.select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(g == w)
  }

  test("auto: above the exact threshold with an IVF index routes to the widened probe") {
    val cents = Ivf.train(base, nlist = 16, ntrain = 500)
    val assigned = Ivf.assign(base, cents)
    val got = FilteredSearch.auto(base, halfPred, queries, 10,
      ivfIndex = Some((assigned, cents, 4)), exactThreshold = 0)
    val gt = filteredGt(halfPred)
    assert(recallOf(got, gt) >= 0.80) // same pipeline/gate as the widened-probe test
  }

  test("pq4 filtered probe: predicate holds, recall gate, full-probe " +
    "full-refine == exact filtered") {
    val idx = graft.ops.Pq.buildOrGetIvf4(spark, base.select("id", "vec"),
      s"$dir|filteredspec_pq4", nlist = 16,
      m4 = base.select(size(col("vec")).as("d")).head().getInt(0) / 4,
      ntrain = 2000)
    val gt = filteredGt(halfPred)
    val got = FilteredSearch.pq4(base, halfPred, queries, idx,
      nprobe = 4, k = 10, refineK = 50)
    val allowed = base.filter(halfPred).select("id")
      .collect().map(_.getLong(0)).toSet
    val rows = got.select("qid", "id").collect()
    assert(rows.forall(r => allowed(r.getLong(1))),
      "pq4 filtered result leaked a disallowed row")
    val r = recallOf(got, gt)
    // widened probe (4/0.5 → 8 of 16 cells) + over-fetched candidates
    // (refineK/s = 100) through exact refine; measured 0.825 — the same
    // band as the widened IVF-flat point (0.8250) — gated two hit-quanta
    // (2/80) below per the house convention
    assert(r >= 0.80, s"pq4 filtered recall too low: $r (measured 0.825)")
    // exhaustive anchor: full probe + corpus-sized candidate budget means
    // EVERY allowed row reaches the exact refine, so the result must
    // equal the exact filtered scan on (qid, id) — the recall-1.0 anchor
    val full = FilteredSearch.pq4(base, halfPred, queries, idx,
      nprobe = 16, k = 10, refineK = 500, selectivity = 1.0)
    val fullSet = full.select("qid", "id").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    val want = FilteredSearch.exact(base, halfPred, queries, 10, Metric.L2)
      .select("qid", "id").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(fullSet == want,
      s"full-probe full-budget pq4 != exact filtered: ${(fullSet diff want).take(3)}")
  }

  test("pq4 filtered probe plan: cluster pruning on the nibble scan, " +
    "predicate pushed into the refine scan, candidates broadcast") {
    val idx = graft.ops.Pq.buildOrGetIvf4(spark, base.select("id", "vec"),
      s"$dir|filteredspec_pq4", nlist = 16,
      m4 = base.select(size(col("vec")).as("d")).head().getInt(0) / 4,
      ntrain = 2000)
    val prior = spark.conf.get("spark.sql.maxMetadataStringLength")
    spark.conf.set("spark.sql.maxMetadataStringLength", "4000")
    val plan =
      try FilteredSearch.pq4(base, halfPred, queries, idx,
        nprobe = 4, k = 10, refineK = 50, selectivity = 0.5)
        .queryExecution.executedPlan.toString
      finally spark.conf.set("spark.sql.maxMetadataStringLength", prior)
    // probed-cell INSET partition filter on the cluster-partitioned
    // nibble table (the inverted-list skip survives the composition)
    assert(plan.contains("PartitionFilters: [cluster_id"),
      s"no partition filter on the nibble scan — probe pruning lost:\n${plan.take(2000)}")
    // the label predicate reaches the refine side's parquet scan
    assert(plan.contains("LessThan(label,5)"),
      s"label predicate not pushed into the refine scan:\n${plan.take(2000)}")
    // the Q×fetchK candidate side broadcasts; the corpus never shuffles
    assert(plan.contains("BroadcastHashJoin"),
      s"refine join is not broadcast:\n${plan.take(2000)}")
    assert(!plan.contains("SortMergeJoin"),
      s"corpus-side shuffle through a sort-merge join:\n${plan.take(2000)}")
  }

  test("auto: a pq4 index outranks the IVF-flat index in the chooser") {
    val idx = graft.ops.Pq.buildOrGetIvf4(spark, base.select("id", "vec"),
      s"$dir|filteredspec_pq4", nlist = 16,
      m4 = base.select(size(col("vec")).as("d")).head().getInt(0) / 4,
      ntrain = 2000)
    val cents = Ivf.train(base, nlist = 16, ntrain = 500)
    val assigned = Ivf.assign(base, cents)
    val got = FilteredSearch.auto(base, halfPred, queries, 10,
      ivfIndex = Some((assigned, cents, 4)),
      pq4Index = Some((idx, 4)), exactThreshold = 0)
    val want = FilteredSearch.pq4(base, halfPred, queries, idx,
      nprobe = 4, k = 10)
    val g = got.select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val w = want.select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(g == w, "auto with a pq4 index must route to the pq4 flavor")
  }

  test("filtered IVF probe pushes BOTH predicates into the clustered parquet scan") {
    val cents = Ivf.train(base, nlist = 16, ntrain = 500)
    val tmp = java.nio.file.Files.createTempDirectory("filtered_clustered").toString
    Ivf.assign(base, cents).write.mode("overwrite")
      .partitionBy("cluster_id").parquet(tmp)
    val clustered = spark.read.parquet(tmp)
    // scan metadata (Location/PartitionFilters/PushedFilters) truncates at
    // 100 chars by default; widen so the assert sees the full filter list
    // (restoring whatever value the shared session had before)
    val prior = spark.conf.get("spark.sql.maxMetadataStringLength")
    spark.conf.set("spark.sql.maxMetadataStringLength", "4000")
    val plan =
      try FilteredSearch.ivf(clustered, halfPred, queries, cents,
        nprobe = 4, k = 10, selectivity = 1.0)
        .queryExecution.executedPlan.toString
      finally spark.conf.set("spark.sql.maxMetadataStringLength", prior)
    // label predicate reaches the parquet scan; cluster_id is partition-pruned
    assert(plan.contains("PushedFilters: [IsNotNull(label), LessThan(label,5)]")
      || plan.contains("LessThan(label,5)"),
      s"label predicate not pushed to scan:\n${plan.take(2000)}")
    // the clustered scan carries the probed-list INSET partition filter
    // (the query-side embeddings scans legitimately have none)
    assert(plan.contains("PartitionFilters: [cluster_id"),
      s"no partition filter on the clustered scan — probe pruning lost:\n${plan.take(2000)}")
  }
}
