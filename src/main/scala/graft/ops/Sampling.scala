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

  // Sentinel-prefixed helper names so an input frame that happens to have
  // a `stratum`/`cnt`/`n`/`u`/`rn` column is never silently clobbered.
  private val SCol = "__graft_stratum"
  private val CCol = "__graft_cnt"
  private val NCol = "__graft_n"
  private val UCol = "__graft_u"
  private val RCol = "__graft_rn"

  /** Shared two-phase core — the cutoff inequality is part of the sample's
    * cross-engine DEFINITION (both oracles mirror it), so it lives in
    * exactly one place. Output schema == input schema (helper columns are
    * sentinel-prefixed internals; a collision with the input is an error,
    * not a silent overwrite). Strata absent from `quotas` are treated as
    * quota 0 and yield no rows — the inner join IS the quota semantics.
    */
  private def sampleImpl(df: DataFrame, stratum: Column, quotas: Option[DataFrame],
                         constN: Option[Int], idCol: String, seed: String,
                         safety: Int): DataFrame = {
    val helpers = Seq(SCol, CCol, NCol, UCol, RCol)
    val clash = df.columns.intersect(helpers)
    require(clash.isEmpty, s"input columns collide with sampler internals: ${clash.mkString(",")}")
    val q = quotas.map(_.withColumnRenamed("stratum", SCol)
      .withColumnRenamed("n", NCol).withColumnRenamed("cnt", CCol))
    val quotaHasCnt = q.exists(_.columns.contains(CCol))
    val base = df.withColumn(SCol, stratum)
    val withCnt =
      if (quotaHasCnt) base.join(broadcast(q.get), Seq(SCol))
      else {
        val counts = df.groupBy(stratum.as(SCol)).agg(count(lit(1)).as(CCol))
        val joined = base.join(broadcast(counts), Seq(SCol))
        q.fold(joined)(qq => joined.join(broadcast(qq), Seq(SCol)))
      }
    // a literal quota constant-folds the whole cutoff (plan-gated);
    // a per-stratum quota keeps it as column arithmetic. The compare runs
    // in decimal: u < 2^20 but cnt is unbounded, and a Long u*cnt flips
    // sign (corrupting the sample) once a stratum passes ~8.8e12 rows —
    // plausible at 100 TB. Same exact inequality, overflow-proof domain.
    val nCol = constN.fold(col(NCol))(n => lit(n.toLong))
    val w = Window.partitionBy(col(SCol)).orderBy(col(UCol), col(idCol))
    withCnt
      .withColumn(UCol, rank20(col(idCol), seed))
      .filter(col(UCol).cast("decimal(7,0)") * col(CCol).cast("decimal(19,0)") <
        nCol.cast("decimal(20,0)") * lit(safety.toLong * RankM))
      .withColumn(RCol, row_number().over(w))
      .filter(col(RCol) <= nCol)
      .drop(CCol, RCol, NCol, SCol, UCol)
  }
}
