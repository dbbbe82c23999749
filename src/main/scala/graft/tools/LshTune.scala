package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{GraftSession, Tables}
import graft.ops.{Eval, Metric, Search}

/** Scratch frontier explorer for the sign-LSH (HNSW-role) generator:
  * prints RESULT lines over a (planes × tables × probes) grid so the
  * recall-0.95-at-≤8-tables operating point can be picked from data
  * rather than guessed. Query-side probes are the cheap axis at 100 TB
  * (tables re-hash the corpus); this grid makes that trade visible.
  */
object LshTune {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark: SparkSession = GraftSession.configure(
      SparkSession.builder().master("local[32]"), shufflePartitions = 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Scale mode: point at an (id, vec) parquet (e.g. BenchScale's cached
    // target/scale_vectors_* corpus) to re-measure the BENCH_SCALE
    // lsh_frontier points in a FRESH JVM — isolates whole-run effects
    // (JIT/code-cache pressure from preceding ops) from code regressions.
    val scaleMode = dir.contains("scale_vectors")
    val base =
      if (scaleMode) spark.read.parquet(dir)
      else Tables.embeddings(spark, dir)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val queries =
      (if (scaleMode) base.filter(col("id") < 16)
       else base.filter(col("id") < 20))
        .select(col("id").as("qid"), col("vec").as("qvec")).cache()
    queries.count()
    val gt = Search.groundTruth(base, queries, 10, Metric.Dot).cache()
    gt.count()
    val grid =
      if (scaleMode) Seq((12, 4, 0), (12, 4, 8), (12, 8, 8))
      else for {
        planes <- Seq(4, 6, 8, 10)
        tables <- Seq(2, 4, 8)
        probes <- Seq(0, 2, 4, 8)
      } yield (planes, tables, probes)
    Eval.lshSweep(spark, base, queries, gt, k = 10, points = grid,
      runs = if (scaleMode) 2 else 1)
    spark.stop()
  }
}
