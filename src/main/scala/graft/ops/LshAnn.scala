package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Sign-LSH (random-hyperplane) approximate nearest-neighbor search — the
  * HNSW-role candidate generator on the recall/latency frontier
  * (`/root/reference/apps/nvdb_hnsw_build.cpp:38-49`,
  * `nvdb_hnsw_search.cpp:33-43`, frontier point `Performance.md:454`).
  *
  * A graph traversal is per-query pointer chasing — the wrong shape for a
  * scan-oriented 1000-executor engine (SURVEY §2.7). The frontier niche
  * HNSW occupies (sub-linear candidate generation at high recall) is
  * served Spark-natively by multi-table Charikar sign-LSH, which is pure
  * bucketed equi-join:
  *
  *  - base: each vector hashes into `nTables` sign-pattern buckets
  *    (the sign bits of `nPlanes` seeded Gaussian projections) — a narrow
  *    projection; the bucket table carries only (t, key, id);
  *  - queries: hashed identically — tiny side, always broadcast;
  *  - search: candidates = base ids sharing any (table, bucket) key,
  *    deduped, exact-scored against their query, map-side top-k'd.
  *
  * No graph state, no cross join; the only shuffle is the candidate
  * dedupe. Recall/cost knobs are (nPlanes ↓recall per table but smaller
  * buckets, nTables ↑recall ↑cost) in place of HNSW's (M, efSearch).
  */
object LshAnn {

  /** The seeded per-table plane matrix. RNG is EXACTLY
    * [[Dedup.embeddingNearDups]]'s (`seed·1000003 + t` per table) so the
    * d4-pinned signatures and these buckets stay mutually reproducible.
    */
  private def tablePlanes(dim: Int, nPlanes: Int, t: Int,
                          seed: Long): Array[Array[Float]] = {
    val rnd = new scala.util.Random(seed * 1000003L + t)
    Array.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian().toFloat))
  }

  /** Exploded (id, t, key) sign-bucket rows: ONE fused kernel call per
    * table ([[graft.functions.expressions.SignKey]] — the vector converts
    * once and the plane matrix streams from a single reference object),
    * bit-identical to the per-plane `when(dot ≥ 0)` composition.
    */
  private[ops] def signBuckets(df: DataFrame, idCol: String, vecCol: String,
                               dim: Int, nPlanes: Int, nTables: Int,
                               seed: Long): DataFrame = {
    val sigCols = (0 until nTables).map { t =>
      val key = org.apache.spark.sql.graftbridge.Bridge.column(
        graft.functions.expressions.SignKey(
          org.apache.spark.sql.graftbridge.Bridge.expression(col(vecCol)),
          tablePlanes(dim, nPlanes, t, seed)))
      struct(lit(t).as("t"), key.as("key"))
    }
    df.select(col(idCol), explode(array(sigCols: _*)).as("tk"))
      .select(col(idCol), col("tk.t").as("t"), col("tk.key").as("key"))
  }

  /** Multi-probe query buckets (Lv et al., VLDB'07): besides its own sign
    * bucket, each query probes the `probes` neighbor buckets reached by
    * flipping its lowest-|margin| sign bits — the hyperplanes it sits
    * closest to, i.e. the buckets its near neighbors most likely fell
    * into. Queries-only and tiny (the side is broadcast); the base table
    * and its bucket layout are untouched, so recall rises WITHOUT adding
    * tables (which would re-hash the full corpus at scale).
    * Emits (probes+1) (t, key) rows per query per table; plane RNG is
    * bit-identical to [[signBuckets]].
    */
  private def multiProbeBuckets(df: DataFrame, idCol: String, vecCol: String,
                                dim: Int, nPlanes: Int, nTables: Int,
                                seed: Long, probes: Int): DataFrame = {
    val tk = (0 until nTables).map { t =>
      // fused projection kernel (query side is tiny, but the margins need
      // the raw dots — same reference-object shape as the base side)
      val projs = org.apache.spark.sql.graftbridge.Bridge.column(
        graft.functions.expressions.PlaneProjections(
          org.apache.spark.sql.graftbridge.Bridge.expression(col(vecCol)),
          tablePlanes(dim, nPlanes, t, seed)))
      // bind the projection array once; key, margins, and flips all read it
      val keys = element_at(transform(array(projs), pr => {
        val key = (0 until nPlanes).map(j =>
          when(element_at(pr, j + 1) >= 0.0, lit(1L << j)).otherwise(lit(0L)))
          .reduce(_ + _)
        val ranked = array_sort(transform(sequence(lit(0), lit(nPlanes - 1)), j =>
          struct(abs(element_at(pr, j + 1)).as("m"), j.as("j"))))
        val flips = transform(slice(ranked, 1, probes), s =>
          key.bitwiseXOR(pow(lit(2.0), s.getField("j")).cast("long")))
        concat(array(key), flips)
      }), 1)
      struct(lit(t).as("t"), keys.as("keys"))
    }
    df.select(col(idCol), explode(array(tk: _*)).as("x"))
      .select(col(idCol), col("x.t").as("t"), explode(col("x.keys")).as("key"))
  }

  /** ANN top-k: sign-LSH candidate generation + exact re-score.
    * base: (idCol, vecCol); queries: (qid, qvec).
    * `probes` > 0 turns on multi-probe (extra neighbor buckets per query;
    * candidates are a superset, so with exact re-scoring recall is
    * monotone in `probes` at zero base-side cost).
    * Returns (qid, id, score, rank) — [[Ivf.search]]'s shape, so the two
    * generators plug into the same eval harness.
    */
  /** Distinct (qid, id) candidates from the bucket equi-join. */
  private def candidates(base: DataFrame, queries: DataFrame, nPlanes: Int,
                         nTables: Int, seed: Long, idCol: String,
                         vecCol: String, probes: Int): DataFrame = {
    val dim = base.select(size(col(vecCol))).head().getInt(0)
    val baseBuckets = signBuckets(base, idCol, vecCol, dim, nPlanes, nTables, seed)
    val queryBuckets =
      if (probes > 0)
        multiProbeBuckets(queries, "qid", "qvec", dim, nPlanes, nTables, seed, probes)
      else signBuckets(queries, "qid", "qvec", dim, nPlanes, nTables, seed)
    baseBuckets.join(broadcast(queryBuckets), Seq("t", "key"))
      .select(col("qid"), col(idCol)).distinct()
  }

  /** Per-query candidate-set size — the probe-cost axis of the frontier
    * (the LSH analogue of IVF's scanned-list fraction): (qid, n_cand).
    * Sub-linearity in the base size is the whole point of the operator;
    * the 200k-row ScaleSpec gates it.
    */
  def candidateCounts(base: DataFrame, queries: DataFrame, nPlanes: Int = 12,
                      nTables: Int = 4, seed: Long = 42L, idCol: String = "id",
                      vecCol: String = "vec", probes: Int = 0): DataFrame =
    candidates(base, queries, nPlanes, nTables, seed, idCol, vecCol, probes)
      .groupBy("qid").agg(count(lit(1)).as("n_cand"))

  def search(base: DataFrame, queries: DataFrame, k: Int,
             metric: Metric = Metric.Dot, nPlanes: Int = 12, nTables: Int = 4,
             seed: Long = 42L, idCol: String = "id",
             vecCol: String = "vec", probes: Int = 0): DataFrame = {
    val cand = candidates(base, queries, nPlanes, nTables, seed, idCol, vecCol, probes)
    // candidates are query-batch-bounded (Q × mean bucket occupancy) and
    // 16 B/row — broadcast them so the re-score streams the base in
    // place; without the hint Catalyst has no stats for the bucket-join
    // output and sort-merge-joins, shuffling the full base (measured
    // 10 s of the 13.7 s multi-probe point at 1M×384d)
    val scored = broadcast(cand)
      .join(base.select(col(idCol), col(vecCol)), Seq(idCol))
      .join(broadcast(queries), Seq("qid"))
      .select(col("qid"), col(idCol), (metric match {
        case Metric.Dot    => VectorFunctions.dot(col(vecCol), col("qvec"))
        case Metric.Cosine => VectorFunctions.cosine(col(vecCol), col("qvec"))
        case Metric.L2     => VectorFunctions.l2Sq(col(vecCol), col("qvec"))
      }).as("score"))
    TopK.perGroup(scored, "qid", idCol, "score", k, metric.larger)
  }
}
