package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Evaluation harness: recall-vs-latency frontiers, the reference's
  * `nvdb_ivf_eval` sweep (`/root/reference/apps/nvdb_ivf_eval.cpp:
  * 310-782`; published frontier tables in `Performance.md:553-565`).
  *
  * Like the reference (and `Bench`), the sweep loop is harness-side:
  * each operating point runs the probe query end-to-end `runs` times and
  * records interpolated percentiles over the per-run latencies; recall
  * compares against a cached exact ground truth.
  */
object Eval {

  final case class Point(nprobe: Int, refineK: Int, meanRecall: Double,
                         stats: LatencyStats.Stats)

  /** Single-line machine-readable result per operating point, the
    * reference's CSV-parseable sink (`apps/nvdb_ivf_eval.cpp:729-779`:
    * `RESULT key=value ...`). GPU-only keys are omitted (n/a by design,
    * SURVEY §2.4); latencies are whole-batch seconds, and `qps` is
    * queries/s like the reference's.
    */
  def resultLine(p: Point, q: Long, k: Int): String = {
    val kSearch = math.max(p.refineK, k)
    def d(v: Double) = f"$v%.6f"
    s"RESULT nprobe=${p.nprobe} refine_k=${p.refineK} k_search=$kSearch" +
      s" Q=$q k=$k refine_enabled=${if (p.refineK > k) 1 else 0}" +
      s" mean_recall=${d(p.meanRecall)} avg_s=${d(p.stats.avg)}" +
      s" p50_s=${d(p.stats.p50)} p95_s=${d(p.stats.p95)}" +
      s" p99_s=${d(p.stats.p99)} qps=${d(p.stats.qps)}"
  }

  /** Sweep IVF operating points (nprobe × refineK). Returns one row per
    * point: (nprobe, refine_k, mean_recall, avg_s, p50_s, p95_s, p99_s,
    * qps).
    */
  def ivfSweep(spark: SparkSession, idx: Ivf.Index, base: DataFrame,
               queries: DataFrame, gt: DataFrame, k: Int,
               nprobes: Seq[Int], refineKs: Seq[Int] = Seq(0),
               runs: Int = 3, pipeline: String = "staged",
               emit: String => Unit = println): DataFrame = {
    val clustered = idx.clustered(spark)
    val nQueries = queries.count()
    val points = for (np <- nprobes; rk <- refineKs) yield {
      def job(): Double = {
        val pred = Ivf.searchRefined(clustered, queries, idx.centroids,
          np, k, rk, pipeline = pipeline)
        Ivf.meanRecall(pred, gt, k).collect()(0).getDouble(0)
      }
      job() // warmup
      var recall = 0.0
      val times = Seq.fill(runs) {
        val t0 = System.nanoTime()
        recall = job()
        (System.nanoTime() - t0) / 1e9
      }
      val p = Point(np, rk, recall, LatencyStats.ofLatencies(times))
      emit(resultLine(p, nQueries, k))
      p
    }
    import spark.implicits._
    points.map(p => (p.nprobe, p.refineK, p.meanRecall, p.stats.avg,
      p.stats.p50, p.stats.p95, p.stats.p99, p.stats.qps))
      .toDF("nprobe", "refine_k", "mean_recall", "avg_s", "p50_s", "p95_s",
        "p99_s", "qps")
  }

  /** Sweep the sign-LSH (HNSW-role) candidate generator over
    * (nPlanes, nTables, probes) operating points — the graph-ANN answer
    * on the same recall/latency frontier as [[ivfSweep]]
    * (`apps/nvdb_hnsw_eval.cpp:99-130`: same loop, (M, efSearch) knobs).
    * The third axis is multi-probe (query-side neighbor buckets): recall
    * spent there costs nothing corpus-side, whereas every extra TABLE
    * re-hashes the full base — at 100 TB the frontier should climb
    * probes-first, tables-last. Emits the same RESULT line shape tagged
    * `gen=lsh`; returns one row per point: (nplanes, ntables, probes,
    * mean_recall, avg_s, p50_s, p95_s, p99_s, qps).
    */
  def lshSweep(spark: SparkSession, base: DataFrame, queries: DataFrame,
               gt: DataFrame, k: Int, points: Seq[(Int, Int, Int)],
               runs: Int = 3, seed: Long = 42L,
               emit: String => Unit = println): DataFrame = {
    val nQueries = queries.count()
    val rows = points.map { case (nPlanes, nTables, probes) =>
      def job(): Double = {
        val pred = LshAnn.search(base, queries, k, Metric.Dot, nPlanes,
          nTables, seed, probes = probes)
        Ivf.meanRecall(pred, gt, k).collect()(0).getDouble(0)
      }
      job() // warmup
      var recall = 0.0
      val times = Seq.fill(runs) {
        val t0 = System.nanoTime()
        recall = job()
        (System.nanoTime() - t0) / 1e9
      }
      val st = LatencyStats.ofLatencies(times)
      def d(v: Double) = f"$v%.6f"
      emit(s"RESULT gen=lsh nplanes=$nPlanes ntables=$nTables probes=$probes" +
        s" Q=$nQueries k=$k mean_recall=${d(recall)} avg_s=${d(st.avg)}" +
        s" p50_s=${d(st.p50)} p95_s=${d(st.p95)}" +
        s" p99_s=${d(st.p99)} qps=${d(st.qps)}")
      (nPlanes, nTables, probes, recall, st.avg, st.p50, st.p95, st.p99, st.qps)
    }
    import spark.implicits._
    rows.toDF("nplanes", "ntables", "probes", "mean_recall", "avg_s", "p50_s",
      "p95_s", "p99_s", "qps")
  }

  /** Sweep the sharded HNSW graph over efSearch operating points — the
    * reference's own knob (`apps/nvdb_hnsw_eval.cpp:99-130`; knee at
    * recall 0.9795 @ efSearch=64, `Performance.md:454`) on the same
    * harness as [[ivfSweep]]/[[lshSweep]]. The graph builds once (warm
    * executor cache via `cacheKey`); each point re-searches it, so the
    * measured latency is the serving cost the efSearch knob actually
    * controls. Emits RESULT lines tagged `gen=hnsw`; returns one row per
    * point: (ef_search, mean_recall, avg_s, p50_s, p95_s, p99_s, qps).
    */
  def hnswSweep(spark: SparkSession, base: DataFrame, queries: DataFrame,
                gt: DataFrame, k: Int, efSearches: Seq[Int], m: Int = 16,
                efConstruction: Int = 100, nShards: Int = 8,
                runs: Int = 3, seed: Long = 42L, cacheKey: String = "",
                emit: String => Unit = println): DataFrame = {
    val nQueries = queries.count()
    // one cold pass builds + caches the shard graphs; with a cacheKey the
    // measured runs then take the warm serving path (shard-stub tasks
    // against the cached graphs — no base re-read), which is what the
    // efSearch knob actually controls
    if (cacheKey.nonEmpty)
      Hnsw.search(base, queries, k, Metric.Dot, m, efConstruction,
        efSearches.head, nShards, seed, cacheKey).count()
    val rows = efSearches.map { ef =>
      def job(): Double = {
        val pred =
          if (cacheKey.nonEmpty)
            Hnsw.searchWarm(queries, cacheKey, nShards, k, Metric.Dot, m,
              efConstruction, ef, seed)
          else Hnsw.search(base, queries, k, Metric.Dot, m,
            efConstruction, ef, nShards, seed, cacheKey)
        Ivf.meanRecall(pred, gt, k).collect()(0).getDouble(0)
      }
      job() // warmup (pays the graph build on a cold cache)
      var recall = 0.0
      val times = Seq.fill(runs) {
        val t0 = System.nanoTime()
        recall = job()
        (System.nanoTime() - t0) / 1e9
      }
      val st = LatencyStats.ofLatencies(times)
      def d(v: Double) = f"$v%.6f"
      emit(s"RESULT gen=hnsw m=$m efc=$efConstruction ef_search=$ef" +
        s" shards=$nShards Q=$nQueries k=$k mean_recall=${d(recall)}" +
        s" avg_s=${d(st.avg)} p50_s=${d(st.p50)} p95_s=${d(st.p95)}" +
        s" p99_s=${d(st.p99)} qps=${d(st.qps)}")
      (ef, recall, st.avg, st.p50, st.p95, st.p99, st.qps)
    }
    import spark.implicits._
    rows.toDF("ef_search", "mean_recall", "avg_s", "p50_s", "p95_s",
      "p99_s", "qps")
  }
}
