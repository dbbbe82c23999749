package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.GraftSession
import graft.ops.{Hnsw, Ivf, Metric, Search}

/** Scratch knee explorer (r9 flavor): which corpus hardness + construction
  * point gives the HNSW frontier the reference's SHAPE — a knee below 1.0
  * at small efSearch AND a servable ≥0.95 operating point
  * (`/root/reference/Performance.md:452-456`: 0.8961@16 → 0.9975@256 at
  * 1M, built at efC=200). The lowRank-8 corpus saturates at 1.0; iid-384d
  * never reaches 0.95; the candidate mid-hardness corpora are lowRank at
  * intrinsic 32–64.
  *
  * Corpora are written to (and reused from) the same
  * `target/scale_vectors_*` paths BenchScale reads, so a tuning run here
  * pre-pays the recorded run's generation cost.
  *
  * Args: n dim shards efc m intrinsicsCsv (-1 = iidUnit)
  * Defaults: 1000000 384 32 200 16 "32,48".
  */
object KneeTune {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toLong).getOrElse(1000000L)
    val dim = args.lift(1).map(_.toInt).getOrElse(384)
    val shards = args.lift(2).map(_.toInt).getOrElse(32)
    val efc = args.lift(3).map(_.toInt).getOrElse(200)
    val m = args.lift(4).map(_.toInt).getOrElse(16)
    val intrinsics = args.lift(5).getOrElse("32,48").split(",").map(_.trim.toInt)
    val spark: SparkSession = GraftSession.configure(
      SparkSession.builder().master("local[32]"), shufflePartitions = 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (intr <- intrinsics) {
      val path =
        if (intr < 0) s"target/scale_vectors_${n}_${dim}_iid"
        else s"target/scale_vectors_${n}_${dim}_lr$intr"
      if (!new java.io.File(s"$path/_SUCCESS").isFile)
        (if (intr < 0) SyntheticVectors.iidUnit(spark, n, dim)
         else SyntheticVectors.lowRankFast(spark, n, dim, intrinsic = intr))
          .write.mode("overwrite").parquet(path)
      val base = spark.read.parquet(path)
      val key = s"kneetune_${n}_${dim}_${intr}_efc${efc}_m$m"
      val qs = base.filter(col("id") < 16)
        .select(col("id").as("qid"), col("vec").as("qvec")).cache()
      qs.count()
      val gt = Search.groundTruth(base, qs, 10, Metric.Dot).cache()
      gt.count()
      val t0 = System.nanoTime()
      Hnsw.search(base, qs, 10, Metric.Dot, m = m, efConstruction = efc,
        efSearch = 16, nShards = shards, cacheKey = key).count()
      val buildSec = (System.nanoTime() - t0) / 1e9
      val rs = Seq(16, 32, 64, 128, 256).map { ef =>
        val r = Ivf.meanRecall(
          Hnsw.searchWarm(qs, key, shards, 10, Metric.Dot, m = m,
            efConstruction = efc, efSearch = ef), gt, 10)
          .collect()(0).getDouble(0)
        f"$ef:$r%.4f"
      }
      println(f"[knee] intrinsic=$intr efc=$efc m=$m build=$buildSec%.1f s  ${rs.mkString("  ")}")
      Hnsw.invalidate(key)
      gt.unpersist(); qs.unpersist()
    }
    spark.stop()
  }
}
