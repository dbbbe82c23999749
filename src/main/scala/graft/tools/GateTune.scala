package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{GraftSession, Tables}
import graft.ops.{FilteredSearch, Hnsw, Ivf, Metric, Pq, Search}

/** Scratch: print the exact measured values behind the five fixture
  * recall gates that r8 loosened (HnswSpec a11-config, IvfSpec nprobe=8,
  * FilteredSearchSpec widened ×2, PqSpec ADC + IVF-PQ full-probe), so the
  * spec thresholds can be set to measured-value-minus-noise instead of
  * round numbers (r8 ADVICE item #1).
  */
object GateTune {
  def main(args: Array[String]): Unit = {
    val spark: SparkSession = GraftSession.local(8)
    spark.sparkContext.setLogLevel("WARN")

    def p(tag: String, v: Double): Unit = println(f"[gatetune] $tag%-34s $v%.4f")

    // --- IvfSpec "partial probe" (sf0.001, nlist=16, nprobe=8) ---
    {
      val dir = "/root/testdata/sf0.001"
      val base = Tables.embeddings(spark, dir)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val queries = Tables.embeddings(spark, dir).filter(col("vec_id") < 16)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val cents = Ivf.train(base, nlist = 16, ntrain = 500)
      val assigned = Ivf.assign(base, cents)
      val gt = Search.groundTruth(base, queries, 10, Metric.Dot)
      def recall(np: Int): Double = {
        val pred = Ivf.search(assigned, queries, cents, np, 10)
          .groupBy("qid").agg(collect_list(col("id")).as("pred_ids"))
        Search.recallAtK(pred, gt, 10).collect()(0).getDouble(0)
      }
      p("ivfspec_r8 (gate 0.80)", recall(8))
      p("ivfspec_r2", recall(2))
    }

    // --- PqSpec (sf0.001) ---
    {
      val dir = "/root/testdata/sf0.001"
      val base = Tables.embeddings(spark, dir)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val queries = Tables.embeddings(spark, dir).filter(col("vec_id") < 16)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val gt = Search.groundTruth(base, queries, 10, Metric.L2)
      val books = Pq.train(base, m = 8, ksub = 256, ntrain = 500)
      val adc = Pq.search(Pq.encode(base, books), queries, books, k = 10)
      p("pqspec_adc (gate 0.60)",
        Ivf.meanRecall(adc, gt, 10).collect()(0).getDouble(0))
      val idx = Pq.buildOrGet(spark, base, "gatetune", nlist = 8, m = 8,
        ksub = 128, ntrain = 500)
      val pred = Pq.ivfpqSearch(idx, spark, queries, nprobe = 8, k = 10)
      p("pqspec_ivfpq (gate 0.45)",
        Ivf.meanRecall(pred, gt, 10).collect()(0).getDouble(0))
    }

    // --- FilteredSearchSpec (sf0.01, widened probe) ---
    {
      val dir = "/root/testdata/sf0.01"
      val emb = Tables.embeddings(spark, dir)
      val base = emb.select(col("vec_id").as("id"),
        col("embedding").as("vec"), col("label"))
      val queries = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val halfPred = col("label") < 5
      def recallOf(pred: DataFrame, gt: DataFrame): Double =
        Search.recallAtK(
          pred.groupBy("qid").agg(collect_list(col("id")).as("pred_ids")),
          gt, 10).collect()(0).getDouble(0)
      val gt = Search.groundTruth(base.filter(halfPred), queries, 10, Metric.Dot)
      val cents = Ivf.train(base, nlist = 16, ntrain = 500)
      val assigned = Ivf.assign(base, cents).cache()
      val widened = FilteredSearch.ivf(assigned, halfPred, queries, cents,
        nprobe = 4, k = 10)
      p("filteredspec_wide (gate 0.78)", recallOf(widened, gt))
      assigned.unpersist()
    }

    // --- HnswSpec a11-config (sf0.01, routed, rp=4/8) ---
    {
      val dir = "/root/testdata/sf0.01"
      val fixBase = Tables.embeddings(spark, dir)
        .select(col("vec_id").as("id"), col("embedding").as("vec")).cache()
      val qs = Tables.embeddings(spark, dir).filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val gt = Search.groundTruth(fixBase, qs, 10, Metric.Dot)
      val cents = Ivf.train(fixBase, nlist = 8, ntrain = 2000)
      val key = "gatetune_a11"
      val rPruned = Ivf.meanRecall(Hnsw.searchRouted(fixBase, qs, cents,
        routeProbe = 4, k = 10, Metric.Dot, m = 8, efConstruction = 64,
        efSearch = 64, cacheKey = key), gt, 10).collect()(0).getDouble(0)
      p("hnswspec_a11_routed (gate 0.70)", rPruned)
      Hnsw.invalidate(key)
    }

    spark.stop()
  }
}
