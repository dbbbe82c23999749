package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession
import graft.ops.AsofJoin

/** As-of join semantics and the scale invariant: the match is computed by
  * a per-key ordered window over the tagged union — ONE shuffle, NO join
  * node (a range-join formulation is quadratic per skewed key).
  */
class AsofSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)

  private def fixtures = {
    val s = spark
    import s.implicits._
    val probes = Seq(
      (1L, 100L, 10L), // after q at 50 -> matches seq 2 (the later of the 50-tie)
      (1L, 50L, 11L),  // equal ts -> the quote IS visible (>= semantics)
      (1L, 10L, 12L),  // before any quote -> null match
      (2L, 99L, 13L)   // key with no quotes at all -> null match
    ).toDF("k", "ts", "p_id")
    val quotes = Seq(
      (1L, 50L, 1L, 0.5), // (k, ts, seq, value); ties on ts=50
      (1L, 50L, 2L, 0.7),
      (1L, 70L, 3L, 0.9)
    ).toDF("k", "ts", "q_id", "q_value")
    (probes, quotes)
  }

  test("asof-left: latest <= match, equal-ts visible, tie by max seq, null when none") {
    val (probes, quotes) = fixtures
    val out = AsofJoin.asofLeft(probes, quotes, key = "k", ts = "ts", quoteSeq = "q_id")
    val m = out.collect().map(r => r.getLong(2) ->
      (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(m(10L) == 3L, s"probe at 100 must match quote at 70: $m")
    assert(m(11L) == 2L, s"probe at 50 must match the max-seq quote of the 50-tie: $m")
    assert(m(12L) == -1L, "probe before any quote matches nothing")
    assert(m(13L) == -1L, "keys without quotes match nothing")
  }

  test("asof-left: plan has a window, not a join") {
    val (probes, quotes) = fixtures
    val out = AsofJoin.asofLeft(probes, quotes, key = "k", ts = "ts", quoteSeq = "q_id")
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("Window"), s"expected window plan:\n$plan")
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
  }

  test("asof-left: random data matches a brute-force reference") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(4242)
    val probes = Seq.tabulate(300)(i =>
      (rnd.nextInt(8).toLong, rnd.nextInt(50).toLong, 1000L + i))
    val quotes = Seq.tabulate(200)(i =>
      (rnd.nextInt(8).toLong, rnd.nextInt(50).toLong, i.toLong, rnd.nextDouble()))
    // brute force: per probe, the quote with max ts <= probe ts; ties on
    // ts resolved by max seq (the operator's declared dedupe rule)
    val expected = probes.map { case (k, ts, pid) =>
      val m = quotes.filter(q => q._1 == k && q._2 <= ts)
        .sortBy(q => (q._2, q._3)).lastOption
      pid -> m.map(_._3).getOrElse(-1L)
    }.toMap
    val out = AsofJoin.asofLeft(
      probes.toDF("k", "ts", "p_id"),
      quotes.toDF("k", "ts", "q_id", "q_value"),
      key = "k", ts = "ts", quoteSeq = "q_id")
    val got = out.collect().map(r => r.getLong(2) ->
      (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(got.size == probes.size)
    val bad = expected.collect { case (p, e) if got(p) != e => (p, e, got(p)) }
    assert(bad.isEmpty, s"mismatches (probe, expected, got): ${bad.take(5)}")
  }

  test("asof-left: null quote payload fields do not resurrect older quotes") {
    val s = spark
    import s.implicits._
    val probes = Seq((1L, 100L, 10L)).toDF("k", "ts", "p_id")
    val quotes = Seq(
      (1L, 50L, 1L, Some(0.5)),
      (1L, 70L, 2L, None) // latest quote has a NULL value field
    ).toDF("k", "ts", "q_id", "q_value")
    val r = AsofJoin.asofLeft(probes, quotes, key = "k", ts = "ts", quoteSeq = "q_id")
      .collect().head
    assert(r.getLong(3) == 2L, "must match the latest quote")
    assert(r.isNullAt(4), "its null field must stay null, not carry 0.5 forward")
  }
}
