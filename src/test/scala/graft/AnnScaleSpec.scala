package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession
import graft.ops.{Ivf, Metric, Pq, Search}
import graft.tools.SyntheticVectors

/** Scale gates for the ANN index family — the invariants that only show
  * above the 2k-vector oracle scale, run on a 200k-vector synthetic
  * corpus (the recorded-numbers twin at 1M×384d lands in
  * `BENCH_SCALE.json` via `graft.tools.BenchScale`):
  *
  *  - IVF probe recall is monotone in nprobe and exact at full probe
  *    (the frontier's two endpoints);
  *  - probe COST tracks nprobe/nlist — scanned inverted-list rows, the
  *    deterministic cost axis, grow with the probed fraction and stay
  *    far below the corpus for small nprobe (partition pruning is real,
  *    not cosmetic);
  *  - PQ codes compress the index an order of magnitude below the flat
  *    vectors (`Performance.md:553-568`: the reason PQ exists);
  *  - the filtered probe keeps all three properties under a selectivity-0.5
  *    predicate: widening restores recall, full probe stays exact, and
  *    partition pruning survives the filter.
  */
class AnnScaleSpec extends AnyFunSuite {

  private val n = 200000L
  private val dim = 64
  private val nlist = 64
  private val k = 10

  lazy val spark: SparkSession = GraftSession.local(8)
  // same generator as the recorded 1M run — these gates must gate the
  // corpus BENCH_SCALE actually measures (a recoverable mixture passes
  // them trivially: recall 1.0 at every nprobe)
  private lazy val base = {
    val b = SyntheticVectors.lowRank(spark, n, dim, intrinsic = 8).cache()
    assert(b.count() == n)
    b
  }
  private lazy val queries = base.filter(col("id") < 32)
    .select(col("id").as("qid"), col("vec").as("qvec"))
  private lazy val idx =
    Ivf.buildOrGet(spark, base, s"annspec_lr8_${n}_$dim", nlist = nlist, ntrain = 20000)

  test("ivf probe: recall monotone in nprobe, full probe exact at 200k") {
    val gt = Search.groundTruth(base, queries, k, Metric.Dot).cache()
    val clustered = idx.clustered(spark)
    def recall(np: Int): Double =
      Ivf.meanRecall(
        Ivf.search(clustered, queries, idx.centroids, np, k), gt, k)
        .collect()(0).getDouble(0)
    val r1 = recall(1)
    val r8 = recall(8)
    val rFull = recall(nlist)
    assert(r8 >= r1 - 1e-9, s"recall not monotone: nprobe1=$r1 nprobe8=$r8")
    assert(rFull == 1.0, s"full probe not exact: $rFull")
    // pruned probe must already be useful — clusters concentrate true
    // neighbors, the property IVF sells
    assert(r8 > 0.5, s"nprobe=8/$nlist recall $r8 — clustering useless?")
    gt.unpersist()
  }

  test("probe cost tracks nprobe/nlist, not the corpus") {
    val clustered = idx.clustered(spark)
    val listSizes = clustered.groupBy("cluster_id").count().cache()
    def scanned(np: Int): Long =
      queries.select(explode(Ivf.nearestCentroids(col("qvec"), idx.centroids, np))
          .as("cluster_id"))
        .join(listSizes, Seq("cluster_id"))
        .agg(sum("count")).collect()(0).getLong(0)
    val s2 = scanned(2)
    val s16 = scanned(16)
    val nQ = queries.count()
    // 32 queries × 2/64 lists ≈ n/32 rows if lists were uniform; gate at a
    // loose multiple — corpus-sized means pruning is cosmetic
    assert(s2 < nQ * n / 8, s"nprobe=2 scanned $s2 of ${nQ * n} — no pruning")
    val ratio = s16.toDouble / s2
    assert(ratio > 3 && ratio < 24,
      s"scanned rows don't track nprobe (16/2 → $ratio, expected ≈8)")
    listSizes.unpersist()
  }

  test("filtered probe at 200k: widening holds recall, full probe exact, pruning survives") {
    import graft.ops.FilteredSearch
    // id-parity predicate: selectivity 0.5, uncorrelated with the
    // clustering — the adversarial case for a pre-filtered probe (every
    // inverted list loses half its candidates)
    val pred = pmod(col("id"), lit(2)) === 0
    val clustered = idx.clustered(spark)
    val s = FilteredSearch.measuredSelectivity(clustered, pred)
    assert(math.abs(s - 0.5) < 0.01, s"parity selectivity drifted: $s")
    assert(FilteredSearch.widenedProbe(4, s, nlist) == 8,
      "selectivity 0.5 must double the probe")

    val gt = Search.groundTruth(base.filter(pred), queries, k, Metric.Dot).cache()
    def recallOf(pred_df: org.apache.spark.sql.DataFrame): Double =
      Ivf.meanRecall(pred_df, gt, k).collect()(0).getDouble(0)
    val rPlain = recallOf(FilteredSearch.ivf(clustered, pred, queries,
      idx.centroids, nprobe = 4, k = k, selectivity = 1.0))
    val rWide = recallOf(FilteredSearch.ivf(clustered, pred, queries,
      idx.centroids, nprobe = 4, k = k, selectivity = s))
    assert(rWide >= rPlain - 1e-9,
      s"widening lost recall at 200k: plain=$rPlain widened=$rWide")
    assert(rWide > 0.5, s"widened filtered recall $rWide — probe starved")

    // full-probe filtered == exact filtered: the exhaustive anchor at 200k
    val full = FilteredSearch.ivf(clustered, pred, queries, idx.centroids,
      nprobe = nlist, k = k, selectivity = 1.0)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = FilteredSearch.exact(base, pred, queries, k)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full == exact, s"full-probe filtered != exact filtered at 200k")

    // pruning survives the predicate: the widened 8/64-list probe over
    // half the rows touches ~6% of the corpus, nowhere near all of it
    val listSizes = clustered.filter(pred).groupBy("cluster_id").count().cache()
    val scanned = queries.select(
        explode(Ivf.nearestCentroids(col("qvec"), idx.centroids, 8)).as("cluster_id"))
      .join(listSizes, Seq("cluster_id"))
      .agg(sum("count")).collect()(0).getLong(0)
    val nQ = queries.count()
    assert(scanned < nQ * n / 4,
      s"filtered probe scanned $scanned of ${nQ * n} possible — pruning lost")
    listSizes.unpersist()
    gt.unpersist()
  }

  test("lowRankFast: deterministic, unit-norm, genuinely low intrinsic dimension") {
    // the JVM-loop generator behind the 1M mid-hardness HNSW corpus —
    // its structural promises must hold like the SQL flavor's
    val intr = 4
    val d = 32
    val a = SyntheticVectors.lowRankFast(spark, 512L, d, intrinsic = intr)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val b = SyntheticVectors.lowRankFast(spark, 512L, d, intrinsic = intr)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    assert(a.length == 512 && a.zip(b).forall { case ((i1, v1), (i2, v2)) =>
      i1 == i2 && v1.sameElements(v2) }, "generator not deterministic")
    a.foreach { case (id, v) =>
      val nrm = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(math.abs(nrm - 1.0) < 1e-3, s"row $id norm $nrm")
    }
    // rank: any intrinsic+1 vectors must be linearly dependent — the
    // (intr+1)x(intr+1) Gram determinant of unit vectors is ~0 (vs ~1 for
    // generic full-rank unit vectors)
    val g = Array.tabulate(intr + 1, intr + 1)((i, j) =>
      a(i * 97)._2.zip(a(j * 97)._2).map { case (x, y) => x.toDouble * y }.sum)
    // Gaussian elimination determinant
    var det = 1.0
    val m = g.map(_.clone())
    for (col0 <- 0 until intr + 1) {
      var p = col0
      for (r <- col0 + 1 until intr + 1) if (math.abs(m(r)(col0)) > math.abs(m(p)(col0))) p = r
      if (p != col0) { val t = m(p); m(p) = m(col0); m(col0) = t; det = -det }
      det *= m(col0)(col0)
      if (m(col0)(col0) != 0.0)
        for (r <- col0 + 1 until intr + 1) {
          val f = m(r)(col0) / m(col0)(col0)
          for (c2 <- col0 until intr + 1) m(r)(c2) -= f * m(col0)(c2)
        }
    }
    assert(math.abs(det) < 1e-6,
      s"Gram determinant $det says intrinsic dim exceeds $intr")
  }

  test("pq index bytes an order of magnitude below flat vectors") {
    def dirBytes(path: String): Long = {
      val f = new java.io.File(path)
      if (!f.isDirectory) 0L
      else f.listFiles().map(c =>
        if (c.isDirectory) dirBytes(c.getPath) else c.length()).sum
    }
    val flatPath = "target/annspec_flat"
    val pqPath = "target/annspec_pq"
    base.write.mode("overwrite").parquet(flatPath)
    val books = Pq.train(base, m = 8, ksub = 256, ntrain = 8192)
    Pq.encode(base, books).write.mode("overwrite").parquet(pqPath)
    val flat = dirBytes(flatPath)
    val pq = dirBytes(pqPath)
    // 64-dim floats = 256 B/vec vs 8 PQ bytes: the raw ratio is 32×;
    // parquet framing eats some of it — gate at 8×
    assert(pq * 8 < flat, s"pq $pq B not ≪ flat $flat B")
  }
}
