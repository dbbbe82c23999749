package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.GraftSession
import graft.ops.{Eval, Hnsw, Metric, Search}

/** Scratch knee explorer: how much off-manifold query noise makes the
  * HNSW recall-vs-efSearch frontier bend below 1.0 (the reference's curve
  * shows 0.8773@16 → 0.9982@256, `Performance.md:452-456`; on-manifold
  * queries on the lowRank corpus read 1.0 everywhere). Run at 200k to
  * pick `noiseFrac` for the 1M BENCH_SCALE sweep.
  *
  * Args: n dim shards (defaults 200000 384 32).
  */
object KneeTune {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toLong).getOrElse(200000L)
    val dim = args.lift(1).map(_.toInt).getOrElse(384)
    val shards = args.lift(2).map(_.toInt).getOrElse(32)
    val spark: SparkSession = GraftSession.configure(
      SparkSession.builder().master("local[32]"), shufflePartitions = 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (intr <- Seq(32, -1)) { // -1 = iidUnit (full-dim hard corpus)
      val base = (if (intr < 0) SyntheticVectors.iidUnit(spark, n, dim)
        else SyntheticVectors.lowRank(spark, n, dim, intrinsic = intr)).cache()
      base.count()
      val key = s"kneetune_${n}_${dim}_$intr"
      val plainQ = base.filter(col("id") < 16)
        .select(col("id").as("qid"), col("vec").as("qvec"))
      // build + warm the graphs once
      Hnsw.search(base, plainQ, 10, Metric.Dot, m = 16, efConstruction = 100,
        efSearch = 16, nShards = shards, cacheKey = key).count()
      for (nf <- Seq(0.0, 0.5)) {
        val qs = (if (nf == 0.0) plainQ
          else SyntheticVectors.perturb(plainQ, nf, seed = 9L,
            idCol = "qid", vecCol = "qvec")).cache()
        qs.count()
        val gt = Search.groundTruth(base, qs, 10, Metric.Dot).cache()
        gt.count()
        val rs = Seq(16, 32, 64, 128, 256).map { ef =>
          val r = graft.ops.Ivf.meanRecall(
            Hnsw.searchWarm(qs, key, shards, 10, Metric.Dot, m = 16,
              efConstruction = 100, efSearch = ef), gt, 10)
            .collect()(0).getDouble(0)
          f"$ef:$r%.4f"
        }
        println(s"[knee] intrinsic=$intr noiseFrac=$nf  ${rs.mkString("  ")}")
        gt.unpersist(); qs.unpersist()
      }
      Hnsw.invalidate(key)
      base.unpersist()
    }
    spark.stop()
  }
}
