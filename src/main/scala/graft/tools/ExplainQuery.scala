package graft.tools

import graft.core.GraftSession

/** Dev tool: print the formatted physical plan of a SparkEntry query.
  * Usage: runMain graft.tools.ExplainQuery <queryName> [sfDir]
  */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = GraftSession.local(8)
    val df = graft.SparkEntry.queries(name)(spark, dir)
    df.explain("formatted")
    spark.stop()
  }
}
