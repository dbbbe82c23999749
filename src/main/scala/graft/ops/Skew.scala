package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for hot-key aggregation.
  *
  * Where they fit: algebraic aggregates (sum/count/min/max) already
  * combine map-side, and AQE splits skewed JOIN partitions — but a
  * shuffle aggregate whose per-group state is large (collect_list,
  * distinct counting, percentile buffers) still lands every hot-key row
  * on one reducer. Salting splits each hot key across `numSalts`
  * reducers in stage 1 and merges the per-salt partials in a second,
  * small aggregation keyed only by the original group.
  *
  * The salt must be deterministic for retry-safety: it hashes the whole
  * row (not `rand()`), so a re-executed task salts identically.
  */
object Skew {

  /** Deterministic per-row salt in [0, numSalts). */
  def salt(allCols: Seq[Column], numSalts: Int): Column =
    pmod(hash(allCols: _*), lit(numSalts))

  /** Two-stage salted sum+count (exact: sums run through DECIMAL).
    * Output: (groupCol, sum_<valueCol>, n).
    */
  def saltedSumCount(df: DataFrame, groupCol: String, valueCol: String,
                     numSalts: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt",
      salt(df.columns.toSeq.map(col), numSalts))
    salted
      .groupBy(col(groupCol), col("__salt"))
      .agg(sum(col(valueCol).cast("decimal(28,8)")).as("__s"),
        count(lit(1)).as("__n"))
      .groupBy(col(groupCol))
      .agg(sum(col("__s")).cast("double").as(s"sum_$valueCol"),
        sum(col("__n")).as("n"))
  }

  /** Two-stage salted distinct-collect: stage 1 dedupes within
    * (group, salt), stage 2 merges the per-salt sets — the hot key's set
    * state is built on `numSalts` reducers instead of one.
    * Output: (groupCol, values: array, sorted).
    */
  def saltedCollectSet(df: DataFrame, groupCol: String, valueCol: String,
                       numSalts: Int = 16): DataFrame =
    df.withColumn("__salt", salt(df.columns.toSeq.map(col), numSalts))
      .groupBy(col(groupCol), col("__salt"))
      .agg(collect_set(col(valueCol)).as("__vs"))
      .groupBy(col(groupCol))
      .agg(sort_array(array_distinct(flatten(collect_list(col("__vs")))))
        .as("values"))
}
