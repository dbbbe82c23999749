package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{GraftSession, Tables}
import graft.ops.{Dedup, Sampling, TextAnalysis}

/** Corpus-curation operators: benchmark decontamination, stratified
  * sampling, repetition signals, mixing stats. Plan-shape gates enforce
  * the scale invariants (broadcast benchmark, rank-cutoff before the
  * sample window).
  */
class CurationSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = GraftSession.local(4)

  test("decontaminate: gram overlap flagged, clean docs kept, benchmark broadcast") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"), // shares a 4-gram with bench
      (2L, "totally different words here nothing shared at all"))
      .toDF("doc_id", "text")
    val bench = Seq((100L, "prefix alpha beta gamma delta suffix"))
      .toDF("doc_id", "text")
    val out = Dedup.decontaminate(corpus, bench, gramTokens = 4)
    val rows = out.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(rows(1L)._1 >= 1 && !rows(1L)._2, s"doc 1 must be contaminated: $rows")
    assert(rows(2L)._1 == 0 && rows(2L)._2, s"doc 2 must be clean: $rows")
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "benchmark gram set must broadcast — the corpus never shuffles to find hits")
  }

  test("decontaminate: docs shorter than the gram use their truncated window") {
    val s = spark
    import s.implicits._
    val corpus = Seq((1L, "tiny doc"), (2L, "other text")).toDF("doc_id", "text")
    val bench = Seq((100L, "tiny doc")).toDF("doc_id", "text")
    val rows = Dedup.decontaminate(corpus, bench, gramTokens = 13)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(!rows(1L) && rows(2L))
  }

  test("stratified sample: min(n, stratum size) rows per stratum, deterministic") {
    val docs = Tables.documents(spark, dir)
    val n = 3
    def run() = Sampling.stratifiedSample(docs, col("lang"), n, "doc_id")
      .select("doc_id", "lang").collect()
    val a = run()
    val perLang = a.groupBy(_.getString(1)).map { case (k, v) => k -> v.length }
    val counts = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    counts.foreach { case (l, c) =>
      assert(perLang.getOrElse(l, 0).toLong == math.min(n.toLong, c),
        s"stratum $l: got ${perLang.getOrElse(l, 0)} of $c (n=$n)")
    }
    assert(a.map(_.toString).sorted.sameElements(run().map(_.toString).sorted),
      "seeded sample must be deterministic")
  }

  test("stratified sample: rank-cutoff filter runs below the window") {
    val docs = Tables.documents(spark, dir)
    val out = Sampling.stratifiedSample(docs, col("lang"), 3, "doc_id")
    val plan = out.queryExecution.executedPlan.toString
    // constant-folded cutoff 8*3*2^20; printed plans are top-down, so a
    // LARGER index means the filter executes BEFORE the window
    val cutoff = (8L * 3 * Sampling.RankM).toString
    val wIdx = plan.indexOf("Window")
    val fIdx = plan.indexOf(cutoff)
    assert(wIdx >= 0 && fIdx >= 0, s"missing window or cutoff in:\n$plan")
    assert(fIdx > wIdx,
      "cutoff filter must sit under the window (map-side, pre-shuffle)")
  }

  test("boilerplate ratio: a gram shared by minDocs docs is flagged, rare grams are not") {
    val s = spark
    import s.implicits._
    // "click here now" appears in 3 docs (minDocs), unique tails don't
    val docs = Seq(
      (1L, "click here now alpha beta gamma"),
      (2L, "click here now delta epsilon zeta"),
      (3L, "click here now eta theta iota"),
      (4L, "completely original content without repeats"))
      .toDF("doc_id", "text")
    val m = Dedup.boilerplateRatio(docs, gramTokens = 3, minDocs = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getDouble(3)))).toMap
    Seq(1L, 2L, 3L).foreach { d =>
      assert(m(d)._1 == 1L && m(d)._2 > 0, s"doc $d must flag the shared gram: $m")
    }
    assert(m(4L)._1 == 0L && m(4L)._2 == 0.0, s"clean doc flagged: $m")
  }

  test("repetition stats: repeated text scores high dup ratio, unique text zero") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "spam spam spam spam spam spam"),
      (2L, "six completely distinct tokens right here")).toDF("doc_id", "text")
    val m = TextAnalysis.repetitionStats(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(math.abs(m(1L).getDouble(2) - 1.0 / 6) < 1e-12) // distinct_token_ratio
    assert(math.abs(m(1L).getDouble(4) - 0.75) < 1e-12) // 4 grams, 1 distinct
    assert(m(2L).getDouble(2) == 1.0 && m(2L).getDouble(4) == 0.0)
  }

  test("weighted sample: per-stratum quota honored, deterministic") {
    val s = spark
    import s.implicits._
    val docs = Tables.documents(spark, dir)
    val quotas = Seq(("en", 4L), ("de", 1L), ("fr", 2L), ("es", 2L), ("zh", 3L))
      .toDF("stratum", "n")
    def run() = graft.ops.Sampling
      .weightedSample(docs, col("lang"), quotas, "doc_id")
      .select("doc_id", "lang").collect()
    val a = run()
    val got = a.groupBy(_.getString(1)).map { case (k, v) => k -> v.length.toLong }
    val counts = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = Map("en" -> 4L, "de" -> 1L, "fr" -> 2L, "es" -> 2L, "zh" -> 3L)
      .map { case (l, n) => l -> math.min(n, counts.getOrElse(l, 0L)) }
    assert(got == want.filter(_._2 > 0), s"got $got want $want")
    assert(a.map(_.toString).sorted.sameElements(run().map(_.toString).sorted))
  }

  test("quantile gate: kept rows meet their stratum threshold, others dropped") {
    val docs = Tables.documents(spark, dir)
    val kept = TextAnalysis.quantileGate(docs, "lang", "n_chars", 0.75)
      .select("lang", "n_chars").collect()
      .groupBy(_.getString(0)).map { case (k, v) => k -> v.map(_.getLong(1)) }
    val all = docs.select("lang", "n_chars").collect()
      .groupBy(_.getString(0)).map { case (k, v) => k -> v.map(_.getLong(1)) }
    all.foreach { case (lang, xs) =>
      val ks = kept.getOrElse(lang, Array.empty[Long])
      assert(ks.nonEmpty && ks.length < xs.length,
        s"$lang: gate must keep a strict non-empty subset (${ks.length}/${xs.length})")
      assert(ks.min >= xs.sorted.apply((0.75 * (xs.length - 1)).floor.toInt),
        s"$lang: kept minimum below the p75 neighborhood")
    }
  }

  test("quantile gate: approx mode keeps a similar subset to exact") {
    val docs = Tables.documents(spark, dir)
    val exact = TextAnalysis.quantileGate(docs, "lang", "n_chars", 0.75)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val approx = TextAnalysis.quantileGate(docs, "lang", "n_chars", 0.75, approx = true)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // at 10k accuracy on small strata the digest is near-exact; allow a
    // small boundary band
    val sym = (exact diff approx) ++ (approx diff exact)
    assert(approx.nonEmpty && sym.size <= exact.size / 5,
      s"approx gate diverges: ${sym.size} of ${exact.size}")
  }

  test("sequence packing: contiguous offsets per stream, spans consistent") {
    val out = graft.ops.Packing.pack(Tables.documents(spark, dir),
      budget = 128, shards = 2, stratum = "source")
      .select("source", "shard", "doc_id", "n_tokens", "start_off", "seq_id", "n_seqs")
      .collect()
    assert(out.nonEmpty)
    out.groupBy(r => (r.getString(0), r.getLong(1))).foreach { case (k, rows) =>
      val sorted = rows.sortBy(_.getLong(2))
      assert(sorted.head.getLong(4) == 0L, s"stream $k must start at offset 0")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getLong(4) == a.getLong(4) + a.getLong(3),
            s"stream $k: offsets not contiguous")
        case _ =>
      }
    }
    out.foreach { r =>
      assert(r.getLong(5) == r.getLong(4) / 128, "seq_id = start_off div budget")
      val lastSeq = (r.getLong(4) + r.getLong(3) - 1) / 128
      assert(r.getLong(6) == lastSeq - r.getLong(5) + 1 && r.getLong(6) >= 1)
    }
  }

  test("mixing stats: shares sum to 1, upsample factor inverts the share") {
    val rows = TextAnalysis.mixingStats(Tables.documents(spark, dir)).collect()
    val nSrc = rows.length
    val shareSum = rows.map(_.getDouble(4)).sum
    assert(math.abs(shareSum - 1.0) < 1e-9, s"shares sum to $shareSum")
    rows.foreach { r =>
      val prod = r.getDouble(4) * r.getDouble(5) * nSrc
      assert(math.abs(prod - 1.0) < 1e-9, s"share*upsample*nSrc = $prod")
    }
  }

  // ---- SemDeDup (Abbas et al. 2303.09540): cluster-bucketed semantic
  // dedup. The min_id flavor is end-to-end oracle-gated (d13); these gates
  // cover the planted-dup semantics, the bucketing invariant, and the
  // paper's far-from-centroid keep rule (whose centroid distances have no
  // sidecar vocabulary).

  private def semFixture = {
    val s = spark
    import s.implicits._
    // two tight planted groups + isolated points, well-separated so any
    // reasonable 2-means split buckets each group into one cluster
    val mk = (base: Array[Float], eps: Float) =>
      base.zipWithIndex.map { case (x, i) => if (i == 0) x + eps else x }
    val g1 = Array.fill(8)(0.0f).updated(0, 1.0f)
    val g2 = Array.fill(8)(0.0f).updated(1, 1.0f)
    Seq(
      (0L, g1), (1L, mk(g1, 1e-3f)), (2L, mk(g1, 2e-3f)), // dup group {0,1,2}
      (10L, g2), (11L, mk(g2, 1e-3f)),                    // dup group {10,11}
      (20L, Array.fill(8)(0.0f).updated(2, 1.0f)),        // isolated
      (21L, Array.fill(8)(0.0f).updated(3, 1.0f)))        // isolated
      .toDF("vec_id", "embedding")
  }

  test("semanticDedup: planted groups resolve, min-id keeper, one keep per component") {
    val emb = semFixture
    val cents = graft.ops.Ivf.train(
      emb.select(col("vec_id").as("id"), col("embedding").as("vec")),
      nlist = 4, ntrain = 100)
    val out = Dedup.semanticDedup(emb, cents, tau = 0.99).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(out.size == 7)
    // planted groups collapse to one component each, min-id kept
    assert(out(0L) == ((0L, true)) && out(1L) == ((0L, false))
      && out(2L) == ((0L, false)), s"group1 wrong: $out")
    assert(out(10L) == ((10L, true)) && out(11L) == ((10L, false)))
    // isolated points are singleton keepers
    assert(out(20L) == ((20L, true)) && out(21L) == ((21L, true)))
    // exactly one keeper per component
    val byComp = out.groupBy(_._2._1)
    assert(byComp.forall(_._2.count(_._2._2) == 1))
  }

  test("skew guard: guarded candidates are a subset of exact all-pairs, " +
       "cosines identical on the common pairs (r15)") {
    val s = spark
    import s.implicits._
    // one 60-row cell (oversized at cap 8) + two thin cells; vectors
    // random-ish so LSH blocks split the big cell non-trivially
    val rows = (0 until 100).map { i =>
      val vec = Array.tabulate(8)(j => (((i * 31 + j * 17) % 19) - 9) / 9f)
      (i.toLong, vec, if (i < 60) 0 else 1 + (i % 10)) // thin cells: 4 rows
    }
    val assigned = rows.toDF("vec_id", "embedding", "cluster_id")
    val exact = Dedup.semanticCandidatesAssigned(assigned,
      maxCellSize = Int.MaxValue).collect()
      .map(r => (r.getLong(1), r.getLong(2)) -> r.getDouble(3)).toMap
    val guarded = Dedup.semanticCandidatesAssigned(assigned,
      maxCellSize = 8, nBlockPlanes = 3, nBlockTables = 2).collect()
      .map(r => (r.getLong(1), r.getLong(2)) -> r.getDouble(3)).toMap
    // the guard may DROP pairs (LSH blocking inside oversized cells),
    // never invent or cross clusters; shared pairs carry the exact
    // same cosine (same kernel over the same vectors)
    val extra = guarded.keySet.diff(exact.keySet)
    assert(extra.isEmpty, s"guard invented pairs: ${extra.take(5)}")
    guarded.foreach { case (k, c) =>
      assert(c == exact(k), s"cosine diverged on $k: $c vs ${exact(k)}")
    }
    // thin cells ride the exact arm: every thin-cell pair survives
    val thinExact = exact.keySet.filter { case (a, b) => a >= 60 && b >= 60 }
    assert(thinExact.subsetOf(guarded.keySet),
      "guard dropped pairs from a cell under the cap")
    // and the oversized cell still produces candidate structure
    assert(guarded.keySet.exists { case (a, b) => a < 60 && b < 60 },
      "guard produced zero big-cell candidates")
  }

  test("skew guard + far keeper: flood argmax(cdist) keeper over salt-block " +
       "candidates, under-cap path identical (r16)") {
    val s = spark
    import s.implicits._
    // an exact-duplicate flood (ids 0-59, one oversized cell at cap 8)
    // whose candidates can only come through the guard's salt blocks,
    // plus thin under-cap cells; cdist is a planted varied scalar so the
    // argmax is non-trivial (the d16 oracle pins the same composition
    // against DuckDB — this gate pins it against the EXACT all-pairs arm)
    val floodVec = Array.tabulate(8)(j => 0.1f * (j + 1))
    val rows = (0 until 100).map { i =>
      val vec =
        if (i < 60) floodVec
        else Array.tabulate(8)(j => (((i * 31 + j * 17) % 19) - 9) / 9f)
      (i.toLong, vec, if (i < 60) 0 else 1 + (i % 10), (i % 7).toDouble)
    }
    val assigned = rows.toDF("vec_id", "embedding", "cluster_id", "cdist")
    def decide(cap: Int): Seq[(Long, Long, Boolean)] =
      Dedup.semanticDedupFromCandidates(assigned,
        Dedup.semanticCandidatesAssigned(assigned, maxCellSize = cap,
          nBlockPlanes = 3, nBlockTables = 2),
        tau = 0.95, keepRule = "far_from_centroid")
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3)))
        .sortBy(_._1).toSeq
    val exact = decide(Int.MaxValue)
    val guarded = decide(8)
    // the flood stays ONE component via salt-mix transitivity, and the
    // keeper is argmax(cdist) ties-min(id): cdist = id%7 peaks at ids
    // 6,13,20,… — id 6 wins
    val floodG = guarded.filter(_._1 < 60)
    assert(floodG.map(_._2).distinct.size == 1,
      s"flood split: ${floodG.map(_._2).distinct}")
    assert(floodG.filter(_._3).map(_._1) == Seq(6L),
      s"flood keeper: ${floodG.filter(_._3)}")
    assert(floodG == exact.filter(_._1 < 60),
      "guarded far decisions diverged from exact all-pairs on the flood")
    // thin cells ride the exact arm in both plans — identical decisions
    assert(guarded.filter(_._1 >= 60) == exact.filter(_._1 >= 60))
    // no oversized cell → the guard returns the bit-identical old plan
    assert(decide(1000) == exact)
  }

  test("semanticDedup far_from_centroid: paper keep rule — least prototypical kept") {
    val emb = semFixture
    val cents = graft.ops.Ivf.train(
      emb.select(col("vec_id").as("id"), col("embedding").as("vec")),
      nlist = 4, ntrain = 100)
    val out = Dedup.semanticDedup(emb, cents, tau = 0.99,
      keepRule = "far_from_centroid").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getBoolean(3)))
    assert(out.length == 7)
    // one keeper per component, and the keeper has the component's max
    // centroid distance (ties by id) — verified against a driver-side
    // recomputation from the same centroids
    val vecs = emb.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val assignOf = out.map(t => t._1 -> t._2).toMap
    def cdist(id: Long): Double = {
      val v = vecs(id); val c = cents(assignOf(id))
      math.sqrt(v.zip(c).map { case (x, y) => (x - y).toDouble * (x - y) }.sum)
    }
    out.groupBy(_._3).foreach { case (compId, members) =>
      val keepers = members.filter(_._4)
      assert(keepers.length == 1, s"component $compId keeps ${keepers.length}")
      if (members.length > 1) {
        val want = members.map(m => (m._1, cdist(m._1)))
          .sortBy { case (id, d) => (-d, id) }.head._1
        assert(keepers.head._1 == want,
          s"component $compId kept ${keepers.head._1}, farthest is $want")
      }
    }
    // both flavors drop the same rows COUNT (same components)
    val minIdDrops = Dedup.semanticDedup(emb, cents, tau = 0.99)
      .filter(!col("keep")).count()
    assert(out.count(!_._4).toLong == minIdDrops)
  }

  test("semanticDedup: one assignment pass — returned plan is kernel-free " +
       "and the assigned-input flavor matches exactly") {
    val emb = semFixture
    val cents = graft.ops.Ivf.train(
      emb.select(col("vec_id").as("id"), col("embedding").as("vec")),
      nlist = 4, ntrain = 100)
    val out = Dedup.semanticDedup(emb, cents, tau = 0.99)
    // the convenience wrapper checkpoints the assignment, so the returned
    // plan reads the materialized image — the argmin kernel must not
    // appear (it ran exactly once, inside the checkpoint job)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("nearest_centroid"),
      s"semanticDedup re-plans the assignment kernel:\n$plan")
    val assigned = graft.ops.Ivf.assign(emb, cents, "embedding")
    val viaAssigned = Dedup.semanticDedupAssigned(assigned, tau = 0.99)
    assert(viaAssigned.orderBy("vec_id").collect().toSeq ==
      out.orderBy("vec_id").collect().toSeq,
      "semanticDedupAssigned diverges from semanticDedup")
    // far rule: withCentroidDist enrichment + assigned entry == wrapper
    val farAssigned = Dedup.semanticDedupAssigned(
      Dedup.withCentroidDist(assigned, cents), tau = 0.99,
      keepRule = "far_from_centroid")
    val farWrapper = Dedup.semanticDedup(emb, cents, tau = 0.99,
      keepRule = "far_from_centroid")
    assert(farAssigned.orderBy("vec_id").collect().toSeq ==
      farWrapper.orderBy("vec_id").collect().toSeq,
      "far-rule assigned flavor diverges from the wrapper")
    // far rule without the cdist column fails loudly, not silently
    val err = intercept[IllegalArgumentException] {
      Dedup.semanticDedupAssigned(assigned, tau = 0.99,
        keepRule = "far_from_centroid")
    }
    assert(err.getMessage.contains("cdist"))
  }

  test("semanticCandidates: only within-cluster pairs, never cross-cluster") {
    val emb = semFixture
    val cents = graft.ops.Ivf.train(
      emb.select(col("vec_id").as("id"), col("embedding").as("vec")),
      nlist = 4, ntrain = 100)
    val assign = graft.ops.Ivf.assign(emb, cents, "embedding").collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    val cand = Dedup.semanticCandidates(emb, cents).collect()
    assert(cand.nonEmpty)
    cand.foreach { r =>
      val (a, b) = (r.getLong(1), r.getLong(2))
      assert(a < b, "candidate pairs must be ordered")
      assert(assign(a) == assign(b), s"cross-cluster pair ($a, $b) leaked")
    }
  }
}
