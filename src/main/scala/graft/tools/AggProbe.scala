package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

import graft.core.{GraftSession, Tables}

/** Dev tool: isolate where q1_pricing_summary's time goes — scan, double
  * aggregation, or decimal aggregation at several precisions.
  * Usage: runMain graft.tools.AggProbe [sfDir]
  */
object AggProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")

    def t(name: String)(fn: => Unit): Unit = {
      fn // warmup
      val s = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"$name%-14s min=${s.head}%.3f med=${s(1)}%.3f max=${s.last}%.3f")
    }

    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("2000-09-02"))
    def grouped = li.groupBy(col("l_returnflag"), col("l_linestatus"))
    val disc = col("l_extendedprice") * (lit(1) - col("l_discount"))
    val charge = disc * (lit(1) + col("l_tax"))
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    t("q1_asis")(noop(graft.SparkEntry.queries("q1_pricing_summary")(spark, dir)))
    t("scan_only")(noop(li.select(col("l_quantity"))))
    t("double_sums")(noop(grouped.agg(
      sum(col("l_quantity")), sum(col("l_extendedprice")), sum(disc),
      sum(charge), avg(col("l_quantity")), avg(col("l_extendedprice")),
      avg(col("l_discount")), count(lit(1)))))
    def decSums(p: Int): Unit = noop(grouped.agg(
      sum(col("l_quantity").cast(s"decimal($p,4)")),
      sum(col("l_extendedprice").cast(s"decimal($p,4)")),
      sum(disc.cast(s"decimal($p,6)")),
      sum(charge.cast(s"decimal($p,8)")),
      sum(col("l_discount").cast(s"decimal($p,4)")),
      count(lit(1))))
    t("dec14_sums")(decSums(14))
    t("dec18_sums")(decSums(18))
    t("dec28_sums")(decSums(28))
    // scaled-integer variants: money has exactly 2 decimals, so
    // round(x*100) is an exact integer; long→decimal has no string parse.
    def cents(c: Column, s: Int): Column = round(c * math.pow(10, s)).cast("long")
    t("cents_long")(noop(grouped.agg(
      sum(cents(col("l_quantity"), 2)), sum(cents(col("l_extendedprice"), 2)),
      sum(cents(disc, 4)), sum(cents(charge, 6)),
      sum(cents(col("l_discount"), 2)), count(lit(1)))))
    t("cents_dec")(noop(grouped.agg(
      sum(cents(col("l_quantity"), 2).cast("decimal(28,0)")),
      sum(cents(col("l_extendedprice"), 2).cast("decimal(28,0)")),
      sum(cents(disc, 4).cast("decimal(28,0)")),
      sum(cents(charge, 6).cast("decimal(28,0)")),
      sum(cents(col("l_discount"), 2).cast("decimal(28,0)")),
      count(lit(1)))))
    t("cents_dec18")(noop(grouped.agg(
      sum(cents(col("l_quantity"), 2).cast("decimal(18,0)")),
      sum(cents(col("l_extendedprice"), 2).cast("decimal(18,0)")),
      sum(cents(disc, 4).cast("decimal(18,0)")),
      sum(cents(charge, 6).cast("decimal(18,0)")),
      sum(cents(col("l_discount"), 2).cast("decimal(18,0)")),
      count(lit(1)))))
    t("q1_again")(noop(graft.SparkEntry.queries("q1_pricing_summary")(spark, dir)))
    spark.stop()
  }
}
