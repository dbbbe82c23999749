package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.VectorFunctions
import graft.ops.{Metric, Search}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry is one operator from SURVEY.md §2 (or a
  * training-data-pipeline extension) exercised end-to-end on the driver
  * testdata; `oracleSql` holds the DuckDB-equivalent SQL for the hash gate.
  * Column names and rounding are aligned between both sides.
  */
object SparkEntry {

  /** Flagship query (reference `apps/nvdb_bench.cpp` flat scan in Spark):
    * exact top-10 dot-product search of 5 query vectors against the
    * embeddings base via broadcast cross join + codegen dot + map-side
    * combining top-k. Driver smoke-checks rows>0 on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame =
    knnDot(spark, "/root/testdata/sf0.001")

  private def embBase(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir).select(col("vec_id").as("id"), col("embedding").as("vec"))

  private def embQueries(spark: SparkSession, dir: String, nq: Int = 5): DataFrame =
    Tables.embeddings(spark, dir).filter(col("vec_id") < nq)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

  /** J1+K1+A1: exact flat-scan top-k (dot metric). */
  private def knnDot(spark: SparkSession, dir: String): DataFrame =
    Search.exactTopK(embBase(spark, dir), embQueries(spark, dir), k = 10, Metric.Dot)
      .select(col("qid"), col("id"), round(col("score"), 4).as("score"))
      .orderBy(col("qid"), col("score").desc, col("id"))

  /** K3/K4: exact k-nearest under squared L2. */
  private def knnL2(spark: SparkSession, dir: String): DataFrame =
    Search.exactTopK(embBase(spark, dir), embQueries(spark, dir), k = 10, Metric.L2)
      .select(col("qid"), col("id"), round(col("score"), 4).as("dist"))
      .orderBy(col("qid"), col("dist"), col("id"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- relational / aggregation family (A2, P-family, J-family) ----
    // Money columns are exact ≤2-decimal doubles; aggregate them through
    // exact DECIMAL casts so Spark and the DuckDB oracle sum identically
    // (double-order-dependent sums + round() are engine-dependent at .5
    // boundaries; decimal sums are exact in both).
    "q1_pricing_summary" -> ((s, dir) => {
      def dec4(c: org.apache.spark.sql.Column) = c.cast("decimal(18,4)")
      def dec8(c: org.apache.spark.sql.Column) = c.cast("decimal(28,8)")
      val n = count(lit(1))
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("2000-09-02"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(dec4(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(dec4(col("l_extendedprice"))).cast("double").as("sum_base_price"),
          sum(dec8(col("l_extendedprice") * (lit(1) - col("l_discount")))).cast("double").as("sum_disc_price"),
          sum(dec8(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")))).cast("double").as("sum_charge"),
          (sum(dec4(col("l_quantity"))).cast("double") / n).as("avg_qty"),
          (sum(dec4(col("l_extendedprice"))).cast("double") / n).as("avg_price"),
          (sum(dec4(col("l_discount"))).cast("double") / n).as("avg_disc"),
          n.as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),
    "q2_top_orders" -> ((s, dir) => {
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)
    }),
    "q3_segment_revenue" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,4)")).cast("double").as("revenue"))
        .orderBy(col("c_mktsegment"))
    }),
    "q4_event_percentiles" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          round(expr("percentile(value, 0.5)"), 4).as("p50"),
          round(expr("percentile(value, 0.95)"), 4).as("p95"),
          round(expr("percentile(value, 0.99)"), 4).as("p99"),
          (sum(col("value").cast("decimal(18,8)")).cast("double") / count(lit(1))).as("avg_value"),
          count(lit(1)).as("n"))
        .orderBy(col("event_type"))
    }),
    "q5_filter_project" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1997-01-01") &&
          col("l_shipdate") < lit("1997-02-01") && col("l_discount") > 0.05)
        .select(col("l_orderkey"), col("l_linenumber"),
          // single IEEE multiply — bitwise identical in any engine, no round
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // ---- vector search family (J1/K1, F1/F5/F8) ----
    "v1_knn_dot" -> ((s, dir) => knnDot(s, dir)),
    "v2_knn_l2" -> ((s, dir) => knnL2(s, dir)),
    "v3_vector_norms" -> ((s, dir) => {
      Tables.embeddings(s, dir)
        .select(col("vec_id"),
          round(VectorFunctions.norm2(col("embedding")), 6).as("norm"),
          VectorFunctions.allFinite(col("embedding")).as("finite"))
        .orderBy(col("vec_id"))
    }),

    // ---- dedup / text family ----
    "d1_exact_dedup" -> ((s, dir) => {
      Tables.documents(s, dir)
        .groupBy(md5(col("text")).as("h"))
        .agg(count(lit(1)).as("n_dups"), min(col("doc_id")).as("keep_id"))
        .orderBy(col("h"))
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,8))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(28,8))) AS DOUBLE) AS sum_charge,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_price,
        |  CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_top_orders" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,
    "q3_segment_revenue" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q4_event_percentiles" ->
      """SELECT event_type,
        |  round(quantile_cont(value, 0.5), 4) AS p50,
        |  round(quantile_cont(value, 0.95), 4) AS p95,
        |  round(quantile_cont(value, 0.99), 4) AS p99,
        |  CAST(sum(CAST(value AS DECIMAL(18,8))) AS DOUBLE) / count(*) AS avg_value,
        |  count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q5_filter_project" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_extendedprice * (1 - l_discount) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-02-01' AND l_discount > 0.05
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "v1_knn_dot" ->
      """SELECT q.vec_id AS qid, b.vec_id AS id,
        |  round(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 4) AS score
        |FROM embeddings q CROSS JOIN embeddings b
        |WHERE q.vec_id < 5
        |QUALIFY row_number() OVER (PARTITION BY q.vec_id
        |  ORDER BY list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) DESC, b.vec_id) <= 10
        |ORDER BY qid, score DESC, id""".stripMargin,
    "v2_knn_l2" ->
      """SELECT q.vec_id AS qid, b.vec_id AS id,
        |  round(list_distance(CAST(q.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) ** 2, 4) AS dist
        |FROM embeddings q CROSS JOIN embeddings b
        |WHERE q.vec_id < 5
        |QUALIFY row_number() OVER (PARTITION BY q.vec_id
        |  ORDER BY list_distance(CAST(q.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), b.vec_id) <= 10
        |ORDER BY qid, dist, id""".stripMargin,
    "v3_vector_norms" ->
      """SELECT vec_id,
        |  round(sqrt(list_aggregate(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x), 'sum')), 6) AS norm,
        |  NOT list_aggregate(list_transform(embedding, x -> isnan(x) OR isinf(x)), 'bool_or') AS finite
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "d1_exact_dedup" ->
      """SELECT md5(text) AS h, count(*) AS n_dups, min(doc_id) AS keep_id
        |FROM documents GROUP BY md5(text) ORDER BY h""".stripMargin,
  )
}
