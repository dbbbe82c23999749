package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact percentiles at scale (A2's data-percentile flavor).
  *
  * Spark's exact `percentile` aggregate buffers every group value in the
  * reducer's memory — fine for small groups, an OOM/straggler when one
  * group holds billions of rows. The sort-based plan computes the SAME
  * linear-interpolated result (`percentile`'s and the reference's formula,
  * `apps/nvdb_ivf_eval.cpp:144-168`) from a window sort + offset pick:
  * the per-group sort runs through Spark's spillable external sorter
  * instead of an in-memory buffer, so group size is disk-bounded, not
  * memory-bounded. Weights: value at rank ⌊p(n−1)⌋ gets (1−frac), rank
  * ⌊p(n−1)⌋+1 gets frac; summing weighted values per group yields the
  * interpolation without collecting anything.
  */
object Percentiles {

  /** Exact interpolated percentiles per group, sort-based.
    * Output: (groupCol, p_<label>... ) one row per group.
    */
  def sortBased(df: DataFrame, groupCol: String, valueCol: String,
                ps: Seq[Double]): DataFrame = {
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("__v"))
    val ranked = df
      .select(col(groupCol), col(valueCol).cast("double").as("__v"))
      .withColumn("__rn", row_number().over(w).cast("double") - 1)
      .join(counts, groupCol)
    val aggs = ps.map { p =>
      val idx = (col("__n") - 1).cast("double") * p
      val lo = floor(idx)
      val frac = idx - lo
      val weight = when(col("__rn") === lo, lit(1.0) - frac)
        .when(col("__rn") === lo + 1, frac)
        .otherwise(lit(0.0))
      sum(col("__v") * weight).as(label(p))
    }
    ranked.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }

  def label(p: Double): String =
    "p" + (if (p * 100 == math.floor(p * 100)) (p * 100).toInt.toString
           else (p * 100).toString.replace('.', '_'))

  /** The buffering built-in, for small/many-group shapes (one array
    * percentile call = one buffer; never one call per p).
    */
  def builtin(df: DataFrame, groupCol: String, valueCol: String,
              ps: Seq[Double]): DataFrame = {
    val arr = ps.map(p => s"${p}D").mkString("array(", ", ", ")")
    val pcts = df.groupBy(col(groupCol))
      .agg(expr(s"percentile($valueCol, $arr)").as("__pcts"))
    ps.zipWithIndex.foldLeft(pcts) { case (d, (p, i)) =>
      d.withColumn(label(p), col("__pcts").getItem(i))
    }.drop("__pcts")
  }
}
