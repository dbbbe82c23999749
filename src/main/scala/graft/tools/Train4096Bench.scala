package graft.tools

import org.apache.spark.sql.SparkSession

import graft.core.GraftSession
import graft.ops.Ivf

/** Scratch: the nlist=4096 train wall (the reference trains 4096 in
  * 13.9 s via FAISS GEMM assignment, `Performance.md:578`; r9 recorded
  * 464.8 s). Reads the CACHED 1M lowRank corpus (never regenerate it —
  * see SyntheticVectors.lowRankFast's note) and times `Ivf.train` at the
  * given nlist — the r10 norm-ordered tiled argmin's before/after
  * instrument. Args: nlist (default 4096) [trials (default 1)].
  */
object Train4096Bench {
  def main(args: Array[String]): Unit = {
    val nlist = args.lift(0).map(_.toInt).getOrElse(4096)
    val trials = args.lift(1).map(_.toInt).getOrElse(1)
    val maxIter = args.lift(2).map(_.toInt).getOrElse(25)
    val spark: SparkSession = GraftSession.configure(
      SparkSession.builder().master("local[32]"), shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = spark.read.parquet("target/scale_vectors_1000000_384_lr8")
    for (t <- 1 to trials) {
      val t0 = System.nanoTime()
      val cents = Ivf.train(base, nlist = nlist, ntrain = 200000, maxIter = maxIter)
      println(f"[train4096] trial$t nlist=$nlist  ${(System.nanoTime() - t0) / 1e9}%7.2f s  (${cents.length} centroids)")
    }
    spark.stop()
  }
}
