package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{GraftSession, Tables}
import graft.ops.{Eval, Ivf, Metric, Search}

/** The eval sweep reproduces the reference's frontier shape: recall is
  * monotone in nprobe, refine never hurts, full probe reaches 1.0.
  */
class EvalSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = GraftSession.local(4)

  test("ivf sweep: monotone recall frontier, full probe exact") {
    val base = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val queries = Tables.embeddings(spark, dir).filter(col("vec_id") < 12)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val idx = Ivf.buildOrGet(spark, base, "evalspec", nlist = 16, ntrain = 500)
    val gt = Search.groundTruth(base, queries, 10, Metric.Dot).cache()
    val sweep = Eval.ivfSweep(spark, idx, base, queries, gt, k = 10,
      nprobes = Seq(2, 8, 16), refineKs = Seq(0, 30), runs = 1)
      .collect()
    assert(sweep.length == 6)
    val byPoint = sweep.map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(byPoint((16, 0)) == 1.0, s"full probe not exact: ${byPoint((16, 0))}")
    assert(byPoint((8, 0)) >= byPoint((2, 0)) - 1e-9, "recall not monotone in nprobe")
    // refine on widened candidates never hurts
    for (np <- Seq(2, 8, 16))
      assert(byPoint((np, 30)) >= byPoint((np, 0)) - 1e-9,
        s"refine hurt recall at nprobe=$np")
    assert(sweep.forall(_.getDouble(7) > 0), "qps must be positive")
  }
}
