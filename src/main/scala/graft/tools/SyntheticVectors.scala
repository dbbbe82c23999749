package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic vector table in the TESTDATA embeddings shape
  * (id, vec: array<float>) at ARBITRARY scale — the driver testdata tops
  * out at 2k vectors, far below where ANN index invariants can break
  * (probe-pruning payoff, candidate sub-linearity, PQ compression
  * ratios), so the ANN scale gates build their own corpus.
  *
  * Cluster structure, all derived from seeded hashes (no RNG state, fully
  * reproducible, generated distributed — no driver loop): vector `i`
  * belongs to center `i mod nCenters`; each dimension is the center's
  * value plus per-vector noise. Coarse k-means therefore has real
  * structure to find, ground-truth neighbors concentrate inside clusters
  * (probing few lists CAN reach high recall — the property IVF sells),
  * and two vectors of one center are near-duplicates the LSH buckets
  * must catch.
  */
object SyntheticVectors {

  /** Uniform in [-1, 1] from a 64-bit hash (20001 buckets: exact in
    * doubles, no float-denormal edge cases).
    */
  private def u(h: org.apache.spark.sql.Column) =
    (pmod(h, lit(20001L)) - lit(10000L)).cast("double") / 10000.0

  def table(spark: SparkSession, n: Long, dim: Int, nCenters: Int,
            noise: Double = 0.3, seed: Long = 42L): DataFrame = {
    require(n > 0 && dim > 0 && nCenters > 0)
    spark.range(n).select(col("id"),
      transform(sequence(lit(1), lit(dim)), d =>
        (u(xxhash64(pmod(col("id"), lit(nCenters.toLong)), d, lit(seed))) +
          u(xxhash64(col("id"), d, lit(seed + 1))) * noise).cast("float"))
        .as("vec"))
  }
}
