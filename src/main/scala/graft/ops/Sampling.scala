package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Seeded, engine-reproducible sampling operators for corpus curation.
  * Extends the reference's seeded distinct sample
  * (`tools/nvdb_make_query.cpp:56-75`) to the stratified form a
  * training-data mixing pipeline needs.
  */
object Sampling {

  /** Domain of the 20-bit uniform rank (`md5_lower64 mod 2^20`). */
  val RankM: Long = 1L << 20

  /** Uniform deterministic rank in [0, 2^20): the low 20 bits of
    * md5_lower64(seed‖"-"‖id). Power-of-two modulus makes the signed/
    * unsigned distinction vanish (bitwise AND), so Spark longs and DuckDB
    * UBIGINTs agree bit for bit.
    */
  def rank20(idCol: Column, seed: String): Column =
    VectorFunctions.md5Lower64(concat(lit(seed + "-"), idCol.cast("string")))
      .bitwiseAND(lit(RankM - 1))

  /** Exact-size-`n`-per-stratum seeded sample.
    *
    * Two phases so the rank window never shuffles the corpus:
    *  1. per-stratum counts (map-side partial agg, result has one row per
    *     stratum) broadcast back onto the table; a map-side cutoff filter
    *     `u * cnt < safety * n * M` keeps ~safety·n uniformly-ranked rows
    *     per stratum — at 100 TB this is the difference between windowing
    *     8·n·strata rows and windowing the corpus;
    *  2. `row_number` per stratum ordered by (u, id) picks the exact n.
    *
    * The cutoff is part of the sample's DEFINITION (the oracle applies the
    * identical filter), so cross-engine exactness never depends on the
    * safety margin; P(a stratum yields < n rows) is Chernoff-small for
    * safety ≥ 8. Strata with fewer than n rows return all their rows.
    */
  def stratifiedSample(df: DataFrame, stratum: Column, n: Int, idCol: String,
                       seed: String = "p4", safety: Int = 8): DataFrame =
    sampleImpl(df, stratum, quotas = None, constN = Some(n), idCol, seed, safety)

  /** [[stratifiedSample]] with PER-STRATUM quotas — the epoch-mixing
    * sampler: `quotas` is a tiny (stratum, n [, cnt]) frame (e.g. computed
    * from token shares) and each stratum yields exactly min(n, stratum
    * size) rows. Pass `cnt` (the stratum row count) in `quotas` when an
    * aggregation over `df` already produced it — that skips the sampler's
    * own counting pass, one fewer corpus scan. Same two-phase shape:
    * quotas/counts broadcast, the rank cutoff `u · cnt < safety · n · M`
    * filters map-side, and the row_number window only sees ~safety·n
    * survivors per stratum.
    */
  def weightedSample(df: DataFrame, stratum: Column, quotas: DataFrame,
                     idCol: String, seed: String = "p5",
                     safety: Int = 8): DataFrame =
    sampleImpl(df, stratum, Some(quotas), constN = None, idCol, seed, safety)

  /** Shared two-phase core — the cutoff inequality is part of the sample's
    * cross-engine DEFINITION (both oracles mirror it), so it lives in
    * exactly one place. Output schema == input schema (helper columns are
    * internal).
    */
  private def sampleImpl(df: DataFrame, stratum: Column, quotas: Option[DataFrame],
                         constN: Option[Int], idCol: String, seed: String,
                         safety: Int): DataFrame = {
    val quotaHasCnt = quotas.exists(_.columns.contains("cnt"))
    val base = df.withColumn("stratum", stratum)
    val withCnt =
      if (quotaHasCnt) base.join(broadcast(quotas.get), Seq("stratum"))
      else {
        val counts = df.groupBy(stratum.as("stratum")).agg(count(lit(1)).as("cnt"))
        val joined = base.join(broadcast(counts), Seq("stratum"))
        quotas.fold(joined)(q => joined.join(broadcast(q), Seq("stratum")))
      }
    // a literal quota constant-folds the whole cutoff (plan-gated);
    // a per-stratum quota keeps it as column arithmetic
    val nCol = constN.fold(col("n"))(n => lit(n.toLong))
    val w = Window.partitionBy(col("stratum")).orderBy(col("u"), col(idCol))
    withCnt
      .withColumn("u", rank20(col(idCol), seed))
      .filter(col("u") * col("cnt") < lit(safety.toLong) * nCol * lit(RankM))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= nCol)
      .drop("cnt", "rn", "n", "stratum", "u")
  }
}
