package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession
import graft.ops.{Dedup, Packing, Sampling}
import graft.tools.{ShuffleTally, SyntheticCorpus}

/** Scale gates for the curation/dedup/packing family — the invariants
  * that only break above toy scale, run on a 100k-doc synthetic corpus
  * (200× the driver's sf0.1 documents table):
  *
  *  - LSH bucket occupancy stays bounded by duplicate-cluster size, not
  *    corpus size (a misconfigured band width fails HERE, before the
  *    O(bucket²) pair expansion OOMs a real run);
  *  - candidate pairs grow ∝ duplicate clusters (Θ(n)), never corpus²;
  *  - the d9 job's actual shuffled bytes stay linear in corpus bytes —
  *    measured via TaskMetrics, not inferred from the plan;
  *  - sequence packing never serializes a hot stratum onto one window
  *    reducer (the shard split actually splits);
  *  - the stratified sampler stays exact-n at scale.
  *
  * Recorded (non-asserting) numbers for the same family at 2× this size
  * land in BENCH_SCALE.json via `graft.tools.BenchScale`.
  */
class CurationScaleSpec extends AnyFunSuite {

  private val n = 100000L
  lazy val spark: SparkSession = GraftSession.local(8)
  private lazy val docs = {
    val d = SyntheticCorpus.documents(spark, n).cache()
    assert(d.count() == n)
    d
  }

  test("synthetic corpus: skewed sources, near-dup families as designed") {
    val bySource = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val hotShare = bySource("src_hot").toDouble / n
    assert(hotShare > 0.2 && hotShare < 0.45, s"hot share $hotShare")
    assert(bySource.size >= 5, s"sources: ${bySource.keys}")
    // exact-dup families: identical text 5 ways
    val exactGroups = docs.groupBy("text").count().filter(col("count") >= 5).count()
    assert(exactGroups >= n / 5 / 10 - 1, s"exact families: $exactGroups")
  }

  test("d9 LSH: buckets bounded by cluster size; pairs and shuffle linear in n") {
    val tally = new ShuffleTally
    spark.sparkContext.addSparkListener(tally)
    val w0 = tally.write.get()
    val nPairs = Dedup.minhashLshPairs64(docs).count()
    Thread.sleep(700) // async listener drain
    val shuffled = tally.write.get() - w0
    spark.sparkContext.removeSparkListener(tally)
    // every near-dup family (5 docs, 1 perturbed token each) should band-
    // collide: ~10 pairs per family = 2n; chance collisions add a little
    assert(nPairs >= n / 2 && nPairs <= 6 * n, s"pairs=$nPairs for n=$n")
    // corpus text ≈ 60 tokens × ~6 chars × n; the banding shuffle carries
    // (band, key, id) rows ∝ n. Quadratic pairing would shuffle ~n²/2×16B
    // (≈ 80 GB here) — gate at a loose linear multiple of text bytes
    val textBytes = docs.agg(sum(length(col("text")))).collect()(0).getLong(0)
    assert(shuffled < 10L * textBytes,
      s"d9 shuffled $shuffled B vs text $textBytes B — not linear")
    // bucket tail: duplicate clusters are 5 docs; anything corpus-sized
    // means the band key collapsed
    val maxBucket = Dedup.lsh64BucketSizes(docs).limit(1).collect()(0).getLong(2)
    assert(maxBucket <= 64, s"max LSH bucket $maxBucket — band width collapsed?")
  }

  test("d10 simhash: slice buckets bounded, near-dup pairs linear in n") {
    val nPairs = Dedup.simhashNearDups(docs, maxHamming = 8).count()
    // family near-dups differ in one token: most survive hamming<=8;
    // verified pairs must stay Θ(n), never corpus²
    assert(nPairs >= n / 10 && nPairs <= 6 * n, s"pairs=$nPairs for n=$n")
    val maxBucket = Dedup.simhashBucketSizes(docs).limit(1).collect()(0).getLong(2)
    // 16-bit slices over 100k docs: expected occupancy ~n/2^16 plus
    // family clusters — corpus-sized means the slice width collapsed
    assert(maxBucket <= 256, s"max simhash bucket $maxBucket")
  }

  test("s9 packing: hot stratum splits across shards, no corpus-sized window") {
    val packed = Packing.pack(docs, budget = 2048, shards = 64, stratum = "source")
    assert(packed.count() == n)
    val maxGroup = packed.groupBy(col("source"), col("shard"))
      .agg(count(lit(1)).as("c")).agg(max(col("c"))).collect()(0).getLong(0)
    // the hot stratum holds ≤45% of the corpus; across 64 shards no
    // window partition may exceed 1/64 of the corpus — if the shard
    // split ever stops working this reads ~0.3n, not ~0.005n
    assert(maxGroup <= n / 64, s"max window group $maxGroup of $n")
  }

  test("p4 stratified sampling stays exact-n at scale") {
    val out = Sampling.stratifiedSample(docs, col("lang"), 1000, "doc_id")
    val perLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perLang.size == SyntheticCorpus.Langs.size)
    perLang.foreach { case (l, c) => assert(c == 1000, s"$l: $c") }
  }

  test("cc: d9 pair graph converges fast into family-shaped components") {
    val tally = new ShuffleTally
    spark.sparkContext.addSparkListener(tally)
    val pairs = Dedup.minhashLshPairs64(docs).cache()
    val nPairs = pairs.count()
    Thread.sleep(700)
    val w0 = tally.write.get()
    val cc = Dedup.connectedComponentsStats(pairs)
    Thread.sleep(700)
    val shuffled = tally.write.get() - w0
    spark.sparkContext.removeSparkListener(tally)
    assert(cc.converged, s"cc did not converge in ${cc.iterations} iterations")
    // families are near-cliques: min-label propagation needs ~2 hops plus
    // the fixed-point check — deep chains here mean the pair graph is wrong
    assert(cc.iterations <= 12, s"cc took ${cc.iterations} iterations")
    val labels = cc.labels
    val maxComp = labels.groupBy("component").count()
      .agg(max("count")).collect()(0).getLong(0)
    // chance cross-family collisions chain a few 5-doc families (measured
    // 95 at 100k); a catastrophic merge reads corpus-sized — gate well
    // between the two
    assert(maxComp <= 256,
      s"giant component of $maxComp nodes — families merged catastrophically")
    // one component per duplicate family (5 consecutive ids): chance
    // cross-family collisions may merge a few, never an order of magnitude
    val nComp = labels.select("component").distinct().count()
    val nFam = labels.select(expr("node div 5")).distinct().count()
    assert(nComp <= nFam && nComp >= (0.8 * nFam).toLong,
      s"components $nComp vs pair-covered families $nFam")
    // cost model: every iteration shuffles the label table + edge join,
    // both Θ(edges) — quadratic blow-up or an unbounded re-derivation
    // shows up as shuffle ≫ iterations × edge bytes (32 B/edge row, both
    // directions, with join/agg framing overhead ≈ 4×)
    assert(shuffled < 128L * nPairs * 2 * cc.iterations,
      s"cc shuffled $shuffled B over ${cc.iterations} iters for $nPairs pairs")
    labels.unpersist()
    pairs.unpersist()
  }

  test("d11 decontamination: map-side gram match at scale, hits found") {
    val bench = docs.filter(col("doc_id") % 97 === 0)
    val corpus = docs.filter(col("doc_id") % 97 =!= 0)
    val out = Dedup.decontaminate(corpus, bench, gramTokens = 4).cache()
    assert(out.count() == corpus.count())
    // family structure guarantees overlap: benchmark docs share (near-)
    // identical text with their family members left in the corpus
    val contaminated = out.filter(!col("keep")).count()
    assert(contaminated > 0, "no contamination found — gram match broken?")
    out.unpersist()
  }
}
