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
    val base = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val queries = Tables.embeddings(spark, dir).filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val gt = Search.groundTruth(base, queries, 10, Metric.Dot).cache()
    gt.count()
    val grid = for {
      planes <- Seq(4, 6, 8, 10)
      tables <- Seq(2, 4, 8)
      probes <- Seq(0, 2, 4, 8)
    } yield (planes, tables, probes)
    Eval.lshSweep(spark, base, queries, gt, k = 10, points = grid, runs = 1)
    spark.stop()
  }
}
