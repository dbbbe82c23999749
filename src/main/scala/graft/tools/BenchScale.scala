package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Packing, Sampling, TextAnalysis}

/** Cumulative shuffle-byte tally across all tasks — the measurement
  * behind the "shuffle ∝ candidates, not corpus²" scale gates. Listener
  * delivery is async: read the counters only after a short drain pause.
  */
class ShuffleTally extends SparkListener {
  val write = new AtomicLong
  val read = new AtomicLong
  override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
    val m = t.taskMetrics
    if (m != null) {
      write.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      read.addAndGet(m.shuffleReadMetrics.totalBytesRead)
    }
  }
}

/** Scale evidence for the curation/dedup/packing family: the oracle gate
  * runs at 500–5,000 docs, far below where LSH invariants can break, so
  * this main builds a ≥100k-doc corpus ([[SyntheticCorpus]]) and records
  * per-operator wall time, result cardinalities, the d9 bucket-occupancy
  * tail, and per-operator shuffle bytes into `BENCH_SCALE.json`. The
  * pass/fail versions of these invariants live in `CurationScaleSpec`;
  * this artifact is the recorded-numbers side.
  *
  * Env: SPARK_GRAFT_SCALE_N (docs, default 200000), SPARK_GRAFT_CPUS.
  */
object BenchScale {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_SCALE_N", "200000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-bench-scale"),
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tally = new ShuffleTally
    spark.sparkContext.addSparkListener(tally)

    // materialize through parquet so every op pays a realistic scan
    val corpusPath = "target/scale_corpus"
    SyntheticCorpus.documents(spark, n)
      .write.mode("overwrite").parquet(corpusPath)
    val docs = spark.read.parquet(corpusPath)
    val corpusBytes = new java.io.File(corpusPath).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum

    // dev aid: SPARK_GRAFT_SCALE_ONLY=d12_boilerplate; SPARK_GRAFT_SCALE_RUNS=3
    val only = sys.env.get("SPARK_GRAFT_SCALE_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val runsPer = sys.env.getOrElse("SPARK_GRAFT_SCALE_RUNS", "2").toInt
    val results = scala.collection.mutable.LinkedHashMap.empty[String, Map[String, Double]]
    def run(name: String)(op: => Map[String, Double]): Unit = {
      if (!only.forall(_.contains(name))) return
      op // warmup: codegen + JIT, not recorded (same discipline as Bench)
      System.gc()
      var extra = Map.empty[String, Double]
      val samples = Seq.fill(runsPer) {
        val t0 = System.nanoTime()
        extra = op
        (System.nanoTime() - t0) / 1e9
      }
      val sec = samples.min // best-of: single-JVM cold-cache noise is one-sided
      // shuffle bytes for exactly one run: delta around a final measured pass
      Thread.sleep(700) // listener bus drain
      val w0 = tally.write.get(); val r0 = tally.read.get()
      op
      Thread.sleep(700)
      results(name) = Map(
        "sec" -> sec,
        "shuffle_write_mb" -> (tally.write.get() - w0) / 1e6,
        "shuffle_read_mb" -> (tally.read.get() - r0) / 1e6) ++ extra
      println(f"[scale] $name%-22s ${sec}%8.2f s  ${results(name)("shuffle_write_mb")}%9.1f MB shuffled  $extra")
    }

    run("d9_lsh64_pairs") {
      Map("n_pairs" -> Dedup.minhashLshPairs64(docs).count().toDouble)
    }
    run("d9_bucket_tail") {
      val top = Dedup.lsh64BucketSizes(docs).limit(1).collect()(0).getLong(2)
      Map("max_bucket" -> top.toDouble)
    }
    run("d10_simhash_dups") {
      Map("n_pairs" -> Dedup.simhashNearDups(docs, maxHamming = 8).count().toDouble)
    }
    run("d11_decontaminate") {
      val hits = Dedup.decontaminate(
        corpus = docs.filter(col("doc_id") % 97 =!= 0),
        benchmark = docs.filter(col("doc_id") % 97 === 0), gramTokens = 4)
      Map("rows" -> hits.count().toDouble,
        "n_contaminated" -> hits.filter(!col("keep")).count().toDouble)
    }
    // noop WRITE, not count(): count over this left join lets Catalyst
    // eliminate the join entirely (unique right keys), timing nothing
    run("d12_boilerplate") {
      Dedup.boilerplateRatio(docs, gramTokens = 3, minDocs = 5)
        .write.format("noop").mode("overwrite").save()
      Map("rows" -> n.toDouble)
    }
    run("p4_stratified_sample") {
      Map("rows" -> Sampling.stratifiedSample(docs, col("lang"), 1000, "doc_id")
        .count().toDouble)
    }
    run("s9_pack") {
      val packed = Packing.pack(docs, budget = 2048, shards = 64, stratum = "source")
      val maxGroup = packed.groupBy(col("source"), col("shard"))
        .agg(count(lit(1)).as("c")).agg(max(col("c"))).collect()(0).getLong(0)
      Map("rows" -> packed.count().toDouble, "max_window_group" -> maxGroup.toDouble)
    }
    // noop write again: count() of a pure projection prunes the kernel
    run("t1_text_stats") {
      TextAnalysis.textStats(docs).write.format("noop").mode("overwrite").save()
      Map("rows" -> n.toDouble)
    }

    def j(d: Double) = if (d == d.floor && d.abs < 1e15) d.toLong.toString else f"$d%.3f"
    val body = results.map { case (name, m) =>
      s""""$name":{${m.map { case (k, v) => s""""$k":${j(v)}""" }.mkString(",")}}"""
    }.mkString(",")
    val line = s"""{"n_docs":$n,"cpus":$cpus,"corpus_mb":${j(corpusBytes / 1e6)},"ops":{$body}}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH_SCALE.json"), line + "\n")
    spark.stop()
    println(line)
  }
}
