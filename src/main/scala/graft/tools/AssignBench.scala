package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.GraftSession
import graft.ops.Ivf

/** Scratch: the 1M-corpus assign pass after the argminL2 norm-bound
  * skip landed. Measured 8.7–8.9 s warm (noop sink, id+cluster_id only)
  * vs the 15.7 s assign_write recorded pre-bound in BENCH_SCALE r8 —
  * not sink-identical (that number includes the clustered parquet
  * write), so read it as directional ~1.8×, with the next full
  * BenchScale run recording the exact successor number. Reads the
  * cached 1M lowRank corpus and its t2-era cached centroids (bin file
  * read directly; buildOrGet itself now keys |t3).
  */
object AssignBench {
  def main(args: Array[String]): Unit = {
    val spark: SparkSession = GraftSession.configure(
      SparkSession.builder().master("local[32]"), shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = spark.read.parquet("target/scale_vectors_1000000_384_lr8")
    val cents = Ivf.loadMatrix(
      "target/ivf_cache/" + Ivf.cacheDigest("annscale_1000000_lr8|1024|200000|42|t2") + ".centroids.bin")
      .getOrElse(sys.error("no cached 1M centroids — run BenchScale first"))
    for (trial <- 1 to 3) {
      val t0 = System.nanoTime()
      Ivf.assign(base, cents).select(col("id"), col("cluster_id"))
        .write.format("noop").mode("overwrite").save()
      println(f"[assignbench] trial$trial ${(System.nanoTime() - t0) / 1e9}%6.2f s  (1M x 384d, nlist=1024)")
    }
    spark.stop()
  }
}
