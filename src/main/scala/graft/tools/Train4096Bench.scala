package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.GraftSession
import graft.ops.{Ivf, Metric, Search}

/** Scratch: the nlist=4096 train wall (the reference trains 4096 in
  * 13.9 s via FAISS GEMM assignment, `Performance.md:578`; r9 recorded
  * 464.8 s, r10 125.2 s, r11 31.0 s). Reads the CACHED 1M lowRank corpus
  * (never regenerate it — see SyntheticVectors.lowRankFast's note) and
  * times `Ivf.train` at the given nlist.
  *
  * Args: nlist (default 4096) [trials (default 1)] [maxIter (default 25)]
  * [stableFrac (default 0 = off)] [recall] — `recall` additionally
  * assigns the corpus to the trained centroids and probes nprobe=8 vs
  * the exact GT, the a1/a6-style anchor that decides whether an
  * early-stopped trainer's quantizer serves as well as the 25-iter one.
  */
object Train4096Bench {
  def main(args: Array[String]): Unit = {
    val nlist = args.lift(0).map(_.toInt).getOrElse(4096)
    val trials = args.lift(1).map(_.toInt).getOrElse(1)
    val maxIter = args.lift(2).map(_.toInt).getOrElse(25)
    val stableFrac = args.lift(3).map(_.toDouble).getOrElse(0.0)
    val doRecall = args.contains("recall")
    val spark: SparkSession = GraftSession.configure(
      SparkSession.builder().master("local[32]"), shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = spark.read.parquet("target/scale_vectors_1000000_384_lr8")
    for (t <- 1 to trials) {
      val t0 = System.nanoTime()
      val cents = Ivf.train(base, nlist = nlist, ntrain = 200000,
        maxIter = maxIter, stableFrac = stableFrac)
      println(f"[train4096] trial$t nlist=$nlist stableFrac=$stableFrac  ${(System.nanoTime() - t0) / 1e9}%7.2f s  (${cents.length} centroids)")
      if (doRecall && t == trials) {
        val queries = base.filter(col("id") < 16)
          .select(col("id").as("qid"), col("vec").as("qvec")).cache()
        queries.count()
        val gt = Search.groundTruth(base, queries, 10, Metric.Dot).cache()
        gt.count()
        val assigned = Ivf.assign(base, cents).cache()
        assigned.count()
        for (np <- Seq(8, 32)) {
          val pred = Ivf.search(assigned, queries, cents, nprobe = np, k = 10)
          val rec = Ivf.meanRecall(pred, gt, 10).collect()(0).getDouble(0)
          println(f"[train4096] probe recall np=$np%3d  $rec%.4f")
        }
        assigned.unpersist()
      }
    }
    spark.stop()
  }
}
