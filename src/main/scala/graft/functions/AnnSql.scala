package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.graftbridge.Bridge

import graft.ops.Pq

/** The SQL half of the ANN surface (SURVEY §1.5's Dataset-vs-ad-hoc-SQL
  * mapping): a table-valued function over REGISTERED IVF-fastscan
  * indexes, so an analyst can run
  *
  * {{{
  *   SELECT * FROM graft_ann_search('docs', 'my_queries', 10, 8, 100)
  * }}}
  *
  * where `'docs'` names an index registered via [[registerIndex]] and
  * `'my_queries'` is any view with (qid long, qvec array<float>) —
  * returning (qid, id, score, rank) exactly as the Scala path does
  * (SqlSurfaceSpec pins the equality).
  *
  * Shape notes:
  *  - The TVF builder resolves at ANALYSIS time: it reads the literal
  *    arguments, looks up the index, and returns the logical plan of
  *    [[Pq.searchFastScanIvfRefined]] — the SAME pruned probe the Scala
  *    API plans, partition pruning and broadcast hints included. Nothing
  *    is re-implemented for SQL; the TVF is a naming layer.
  *  - The query view's rows are collected by the probe's query-batch
  *    contract (bounded, like every broadcast query side), which happens
  *    when the OUTER query executes its plan — same laziness as the
  *    Scala call.
  *  - Index registration is session-scoped (keyed on sessionUUID), like
  *    the temp views it composes with.
  *
  * Args: (index_name string, queries_view string, k int[, nprobe int
  * = 8, refine_k int = 100]).
  */
object AnnSql {

  private val indexes =
    new java.util.concurrent.ConcurrentHashMap[String, (Pq.Index, DataFrame)]()

  /** Register `idx` (with its full-precision base table for the refine
    * stage) under `name` for SQL use, and ensure the TVF is registered
    * in this session.
    */
  def registerIndex(spark: SparkSession, name: String, idx: Pq.Index,
                    base: DataFrame): Unit = {
    indexes.put(s"${graft.core.GraftSession.uuid(spark)}|$name", (idx, base))
    register(spark)
  }

  /** Register the `graft_ann_search` table function in this session. */
  def register(spark: SparkSession): Unit =
    Bridge.tableFunctionRegistry(spark).createOrReplaceTempFunction(
      "graft_ann_search", es => build(spark, es), "built-in")

  private def lit(e: Expression, what: String): Any = {
    require(e.foldable, s"graft_ann_search: $what must be a literal, got $e")
    e.eval()
  }
  private def strArg(e: Expression, what: String): String =
    lit(e, what) match {
      case s: org.apache.spark.unsafe.types.UTF8String => s.toString
      case other => throw new IllegalArgumentException(
        s"graft_ann_search: $what must be a string literal, got $other")
    }
  private def intArg(e: Expression, what: String): Int =
    lit(e, what) match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(
        s"graft_ann_search: $what must be an integer literal, got $other")
    }

  private def build(spark: SparkSession, es: Seq[Expression]): LogicalPlan = {
    require(es.length >= 3 && es.length <= 5,
      "graft_ann_search(index_name, queries_view | query_array, k[, nprobe, refine_k])")
    val name = strArg(es.head, "index_name")
    val k = intArg(es(2), "k")
    val nprobe = if (es.length >= 4) intArg(es(3), "nprobe") else 8
    val refineK = if (es.length >= 5) intArg(es(4), "refine_k") else 100
    val key = s"${graft.core.GraftSession.uuid(spark)}|$name"
    val entry = indexes.get(key)
    if (entry == null) {
      import scala.jdk.CollectionConverters._
      val known = indexes.keySet().asScala
        .filter(_.startsWith(s"${graft.core.GraftSession.uuid(spark)}|"))
        .map(_.split('|').last)
      throw new IllegalArgumentException(
        s"graft_ann_search: no index '$name' registered in this session " +
          s"(registered: ${known.mkString(", ")}) — call " +
          "AnnSql.registerIndex(spark, name, idx, base) first")
    }
    val (idx, base) = entry
    // arg 2 is either a view NAME (string) or an INLINE query vector
    // (array literal — the single-query ad-hoc form:
    // `FROM graft_ann_search('idx', ARRAY(0.1, ...), 10)`, qid = 0)
    val qs = es(1).dataType match {
      case _: org.apache.spark.sql.types.ArrayType =>
        val floats = org.apache.spark.sql.catalyst.expressions.Cast(
          es(1), org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType)).eval()
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          .toFloatArray()
        spark.createDataFrame(
          java.util.List.of(org.apache.spark.sql.Row(0L, floats.toSeq)),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("qid",
              org.apache.spark.sql.types.LongType, nullable = false),
            org.apache.spark.sql.types.StructField("qvec",
              org.apache.spark.sql.types.ArrayType(
                org.apache.spark.sql.types.FloatType), nullable = false))))
      case _ =>
        spark.table(strArg(es(1), "queries_view"))
    }
    Pq.searchFastScanIvfRefined(base, idx, qs, nprobe, k, refineK)
      .queryExecution.logical
  }
}
