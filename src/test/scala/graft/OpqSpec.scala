package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{GraftSession, Tables}
import graft.ops.{Ivf, Metric, Opq, Pq, Search}

/** OPQ rotation: orthogonality, determinism, rank preservation under
  * rotation, and OPQ-PQ recall not degrading vs plain PQ (on isotropic
  * synthetic embeddings OPQ's gain is ~0 by construction, so the gate is
  * non-degradation; the reference's +0.07 shows on anisotropic real data,
  * `/root/reference/Performance.md:629-630`).
  */
class OpqSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = GraftSession.local(4)

  private def base = Tables.embeddings(spark, dir)
    .select(col("vec_id").as("id"), col("embedding").as("vec"))
  private def queries = Tables.embeddings(spark, dir).filter(col("vec_id") < 16)
    .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

  private lazy val rot = Opq.trainRotation(base, m = 8, ksub = 64, ntrain = 300,
    iters = 3)

  test("learned rotation is orthogonal and deterministic") {
    val d = rot.length
    // R·Rᵀ ≈ I
    for (i <- 0 until d) {
      for (j <- 0 until d) {
        var acc = 0.0
        for (k <- 0 until d) acc += rot(i)(k).toDouble * rot(j)(k).toDouble
        val expect = if (i == j) 1.0 else 0.0
        assert(math.abs(acc - expect) < 1e-4, s"RRt($i,$j)=$acc")
      }
    }
    val rot2 = Opq.trainRotation(base, m = 8, ksub = 64, ntrain = 300, iters = 3)
    assert(rot.map(_.toSeq).toSeq == rot2.map(_.toSeq).toSeq)
  }

  test("rotation preserves exact-search ranking (orthogonal invariance)") {
    val rb = Opq.rotateTable(base, rot, "vec")
    val rq = Opq.rotateTable(queries, rot, "qvec")
    val plain = Search.exactTopK(base, queries, k = 5, Metric.Dot)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rotated = Search.exactTopK(rb, rq, k = 5, Metric.Dot)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // float rounding can flip near-ties; demand near-total agreement
    val overlap = plain.intersect(rotated).size.toDouble / plain.size
    assert(overlap >= 0.95, s"rotation changed rankings: overlap $overlap")
  }

  test("bounded-sample training: 50k rows train within the documented cap") {
    // the documented driver-memory bound (Opq.MaxTrain): a 50k×64d sample
    // must train without driver-heap growth beyond the 3·n·d·8-byte
    // estimate, and anything above the cap must be refused loudly
    val big = spark.range(50000).toDF("id")
      .select(col("id"), expr(
        "transform(sequence(1, 64), j -> cast(pmod(hash(id, j), 1000) / 500.0 - 1.0 as float))")
        .as("vec"))
    val r = Opq.trainRotation(big, m = 8, ksub = 64, ntrain = 50000, iters = 2)
    val d = r.length
    var offDiag = 0.0
    for (i <- 0 until d; j <- 0 until d if i != j) {
      var acc = 0.0
      for (k <- 0 until d) acc += r(i)(k).toDouble * r(j)(k).toDouble
      offDiag = math.max(offDiag, math.abs(acc))
    }
    assert(offDiag < 1e-4, s"rotation not orthogonal at 50k: $offDiag")
    assertThrows[IllegalArgumentException] {
      Opq.trainRotation(big, m = 8, ksub = 64, ntrain = Opq.MaxTrain + 1, iters = 1)
    }
  }

  test("OPQ-PQ recall does not degrade vs plain PQ") {
    val gt = Search.groundTruth(base, queries, 10, Metric.L2)
    val books = Pq.train(base, m = 8, ksub = 256, ntrain = 500)
    val adc = Pq.search(Pq.encode(base, books), queries, books, k = 10)
    val rPq = Ivf.meanRecall(adc, gt, 10).collect()(0).getDouble(0)

    val rb = Opq.rotateTable(base, rot, "vec")
    val rq = Opq.rotateTable(queries, rot, "qvec")
    val obooks = Pq.train(rb, m = 8, ksub = 256, ntrain = 500)
    // GT in rotated space equals GT in original space (orthogonal L2)
    val oadc = Pq.search(Pq.encode(rb, obooks), rq, obooks, k = 10)
    val rOpq = Ivf.meanRecall(oadc, gt, 10).collect()(0).getDouble(0)
    assert(rOpq >= rPq - 0.05, s"OPQ degraded recall: PQ $rPq vs OPQ $rOpq")
  }
}
