package graft.tools

import graft.core.GraftSession

/** Dev tool: dump the formatted physical plan of EVERY SparkEntry query
  * into <outDir>/<name>_<tag>.txt — the optimization round's before/after
  * plan evidence (guide §1: capture the plan shape for every declared
  * query before touching anything).
  *
  * Usage: runMain graft.tools.ExplainAll <outDir> <tag> [sfDir] [only,..]
  */
object ExplainAll {
  def main(args: Array[String]): Unit = {
    val outDir = if (args.length > 0) args(0) else "plans/r17"
    val tag = if (args.length > 1) args(1) else "before"
    val dir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val only = if (args.length > 3) Some(args(3).split(",").toSet) else None
    new java.io.File(outDir).mkdirs()
    val spark = GraftSession.local(32)
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, q) =>
        try {
          val df = q(spark, dir)
          // queryExecution.explainString is explain("formatted") minus stdout
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"$outDir/${name}_$tag.txt"), plan)
          println(s"[explain] $name OK (${plan.length} chars)")
        } catch { case e: Throwable =>
          println(s"[explain] $name FAILED: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
