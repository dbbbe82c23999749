package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{GraftSession, Tables}
import graft.ops.{Ivf, Metric, Search}

/** IVF index correctness on the sf0.001 fixtures: recall-gated (never
  * centroid-equality — SURVEY §7.4), pruning actually prunes, full-probe
  * degenerates to exact.
  */
class IvfSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = GraftSession.local(4)

  private def base = Tables.embeddings(spark, dir)
    .select(col("vec_id").as("id"), col("embedding").as("vec"))
  private def queries = Tables.embeddings(spark, dir).filter(col("vec_id") < 16)
    .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

  test("nprobe=nlist probes everything -> recall 1.0") {
    val r = Ivf.recallVsExact(base, queries, nlist = 8, nprobe = 8, k = 10, ntrain = 500)
      .collect()(0).getDouble(0)
    assert(r == 1.0, s"full-probe recall $r")
  }

  test("partial probe keeps good recall, improves with nprobe") {
    val cents = Ivf.train(base, nlist = 16, ntrain = 500)
    val assigned = Ivf.assign(base, cents)
    val gt = Search.groundTruth(base, queries, 10, Metric.Dot)
    def recall(nprobe: Int): Double = {
      val pred = Ivf.search(assigned, queries, cents, nprobe, 10)
        .groupBy("qid").agg(collect_list(col("id")).as("pred_ids"))
      Search.recallAtK(pred, gt, 10).collect()(0).getDouble(0)
    }
    val r2 = recall(2)
    val r8 = recall(8)
    assert(r8 >= r2, s"recall must not degrade with more probes: $r2 -> $r8")
    // threshold = measured-minus-margin under the r9 trainer (restart
    // selection by retrieval-recall proxy for the coarse quantizer — see
    // Kmeans.localFit; GateTune prints the measured values; training is
    // seeded-deterministic, so the margin covers only future code drift)
    assert(r8 >= 0.82, s"nprobe=8/16 recall too low: $r8 (measured 0.8375)")
  }

  test("probe join scores only probed clusters (pruning works)") {
    val cents = Ivf.train(base, nlist = 16, ntrain = 500)
    val assigned = Ivf.assign(base, cents).cache()
    val total = assigned.count()
    val oneQuery = queries.limit(1)
    val probed = oneQuery.select(col("qid"),
      explode(Ivf.nearestCentroids(col("qvec"), cents, 2)).as("cluster_id"))
    val scoredRows = assigned.join(probed, Seq("cluster_id")).count()
    assert(scoredRows < total, s"pruning scored $scoredRows of $total rows")
    assigned.unpersist()
  }

  test("staged probe+refine: refine never hurts recall; refineK<=k skips") {
    val cents = Ivf.train(base, nlist = 16, ntrain = 500)
    val assigned = Ivf.assign(base, cents).cache()
    val gt = Search.groundTruth(base, queries, 10, Metric.Dot)
    def rec(pred: org.apache.spark.sql.DataFrame): Double =
      Ivf.meanRecall(pred, gt, 10).collect()(0).getDouble(0)
    val plain = rec(Ivf.search(assigned, queries, cents, nprobe = 2, k = 10))
    val refined = rec(Ivf.searchRefined(assigned, queries, cents,
      nprobe = 2, k = 10, refineK = 30))
    assert(refined >= plain - 1e-9,
      s"refine degraded recall: $plain -> $refined")
    // refine-skip: refineK <= k must be the identical plain-probe result
    val a = Ivf.searchRefined(assigned, queries, cents, nprobe = 2, k = 10, refineK = 10)
      .orderBy("qid", "rank").collect().toSeq
    val b = Ivf.search(assigned, queries, cents, nprobe = 2, k = 10)
      .orderBy("qid", "rank").collect().toSeq
    assert(a == b)
    assigned.unpersist()
  }

  test("clustered write partitions by cluster_id and prunes on read") {
    val cents = Ivf.train(base, nlist = 4, ntrain = 500)
    val path = java.nio.file.Files.createTempDirectory("ivf").toString
    Ivf.writeClustered(Ivf.assign(base, cents), path)
    val back = spark.read.parquet(path)
    val plan = back.filter(col("cluster_id") === 1).queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("cluster_id"), s"expected partition pruning in:\n$plan")
  }
}
