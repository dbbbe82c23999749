package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Point-in-time (as-of) join — each probe row matches the single quote row
  * with the greatest timestamp ≤ the probe's, per key (DuckDB/pandas
  * `ASOF JOIN` semantics; the feature-lookup primitive that keeps training
  * pipelines point-in-time correct).
  *
  * Spark has no native as-of join. The naive formulations are a range join
  * (`p.ts >= q.ts` then max-per-probe — O(probes × quotes) per key under
  * BNLJ, quadratic on skewed keys) or a per-probe scan. The scalable shape
  * is the tagged-union trick: tag quotes 0 / probes 1, union, and run ONE
  * ordered window per key where `last(quote_payload, ignoreNulls)` carries
  * the most recent quote forward into each probe row. Cost = one shuffle of
  * the union on `key` + a per-key sort — the same price as the
  * sessionization window, with no join node at all (PlanSpec-style gate in
  * AsofSpec asserts the plan is join-free).
  */
object AsofJoin {

  /** As-of LEFT join. `probes` keeps all its columns; `quotes` contributes
    * every column except `key`/`ts` (names must not clash — rename before
    * calling). Probes with no quote at or before their `ts` get nulls.
    *
    * Quotes are first deduplicated to one row per (key, ts) — the max by
    * `quoteSeq` — so equal-timestamp ties are deterministic (engines and
    * SQL oracles otherwise pick an arbitrary winner). The quote payload
    * travels as ONE struct through `last(ignoreNulls)`: per-column carry
    * would resurrect older values for columns that are genuinely null in
    * the matched quote.
    */
  def asofLeft(probes: DataFrame, quotes: DataFrame, key: String, ts: String,
               quoteSeq: String): DataFrame = {
    val qPay = quotes.columns.toSeq.filterNot(c => c == key || c == ts)
    val pPay = probes.columns.toSeq.filterNot(c => c == key || c == ts)
    require(qPay.intersect(pPay).isEmpty,
      s"probe/quote payload columns clash: ${qPay.intersect(pPay).mkString(",")}")
    require(qPay.contains(quoteSeq), s"quoteSeq=$quoteSeq must be a quote payload column")

    val dw = Window.partitionBy(col(key), col(ts)).orderBy(col(quoteSeq).desc)
    val qd = quotes.withColumn("_rn", row_number().over(dw))
      .filter(col("_rn") === 1).drop("_rn")

    val qStructType = StructType(qPay.map(c => qd.schema(qd.schema.fieldIndex(c))))
    val qs = qd.select(
      Seq(col(key), col(ts), lit(0).as("_side"), struct(qPay.map(col): _*).as("_q")) ++
        pPay.map(c => lit(null)
          .cast(probes.schema(probes.schema.fieldIndex(c)).dataType).as(c)): _*)
    val ps = probes.select(
      Seq(col(key), col(ts), lit(1).as("_side"), lit(null).cast(qStructType).as("_q")) ++
        pPay.map(col): _*)

    // quotes sort before probes at equal ts (side 0 < 1), so an
    // equal-timestamp quote IS visible to the probe — the `>=` in ASOF
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    qs.unionByName(ps)
      .withColumn("_q", last(col("_q"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(Seq(col(key), col(ts)) ++ pPay.map(col) ++
        qPay.map(c => col(s"_q.$c").as(c)): _*)
  }
}
