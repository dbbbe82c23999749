package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{GraftSession, Tables}
import graft.functions.VectorFunctions

/** The normalized-metric optimizer rule: L2-ascending sort keys rewrite
  * to dot-descending when the session opts in; results are unchanged
  * (fixture embeddings ARE normalized); no rewrite when off or when the
  * score is projected.
  */
class RuleSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = GraftSession.local(4)

  private def q() = {
    val e = Tables.embeddings(spark, dir)
    val qv = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("qvec")).crossJoin(e)
    qv.orderBy(VectorFunctions.l2Sq(col("embedding"), col("qvec")).asc, col("vec_id"))
      .select("vec_id").limit(10)
  }

  test("rule rewrites the sort key and preserves results") {
    spark.conf.set("spark.graft.normalizedRewrite", "false")
    val offPlan = q().queryExecution.optimizedPlan.toString
    val offRows = q().collect().map(_.getLong(0)).toSeq
    assert(offPlan.contains("graft_l2sq"), s"baseline should sort by l2:\n$offPlan")

    spark.conf.set("spark.graft.normalizedRewrite", "true")
    try {
      val onPlan = q().queryExecution.optimizedPlan.toString
      val onRows = q().collect().map(_.getLong(0)).toSeq
      assert(onPlan.contains("graft_dot") && !onPlan.contains("graft_l2sq"),
        s"sort key not rewritten:\n$onPlan")
      assert(onRows == offRows, s"rewrite changed results: $offRows vs $onRows")
    } finally spark.conf.set("spark.graft.normalizedRewrite", "false")
  }

  test("rule leaves projected l2 scores untouched") {
    spark.conf.set("spark.graft.normalizedRewrite", "true")
    try {
      val e = Tables.embeddings(spark, dir).limit(20)
      val df = e.select(col("vec_id"),
        VectorFunctions.l2Sq(col("embedding"), col("embedding")).as("d"))
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("graft_l2sq"), s"projection must keep l2:\n$plan")
      assert(df.collect().forall(_.getDouble(1) == 0.0))
    } finally spark.conf.set("spark.graft.normalizedRewrite", "false")
  }
}
