package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{GraftSession, Tables}
import graft.ops.Skew

/** Salted two-stage aggregation equals the direct aggregation. */
class SkewSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = GraftSession.local(4)

  test("salted sum+count matches direct groupBy exactly") {
    val events = Tables.events(spark, dir)
    val salted = Skew.saltedSumCount(events, "event_type", "value")
      .orderBy("event_type").collect()
    val direct = events.groupBy("event_type")
      .agg(sum(col("value").cast("decimal(28,8)")).cast("double").as("s"),
        count(lit(1)).as("n"))
      .orderBy("event_type").collect()
    assert(salted.length == direct.length)
    salted.zip(direct).foreach { case (a, b) =>
      assert(a.getString(0) == b.getString(0))
      assert(a.getDouble(1) == b.getDouble(1)) // decimal path: bit-exact
      assert(a.getLong(2) == b.getLong(2))
    }
  }

  test("salted collect_set matches direct distinct collection") {
    val events = Tables.events(spark, dir).filter(col("user_id") < 50)
    val salted = Skew.saltedCollectSet(events, "event_type", "user_id")
      .orderBy("event_type").collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val direct = events.groupBy("event_type")
      .agg(sort_array(collect_set(col("user_id"))).as("v"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(salted == direct)
  }

  test("stage-1 fan-out actually splits a group across salts") {
    val events = Tables.events(spark, dir)
    val salts = events
      .withColumn("__salt", Skew.salt(events.columns.toSeq.map(col), 16))
      .groupBy("event_type").agg(countDistinct(col("__salt")).as("d"))
      .agg(min("d")).collect()(0).getLong(0)
    assert(salts > 1, s"hot keys not split: min distinct salts $salts")
  }
}
