package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Contract hardening (round 2): the driver keys results by artifact
  * basename (`<name>.parquet`) while round 1 wrote oracle keys as bare
  * `<name>` → every lookup missed (`no_oracle` across CORRECTNESS_r01).
  * We now (a) write each result at BOTH `<out>/<name>.parquet/` and
  * `<out>/<name>/`, and (b) emit every oracle_sql.json entry under BOTH
  * key shapes, so any driver-side convention resolves.
  */
object Verify {
  /** Recursive copy of a Spark output directory (part files + _SUCCESS). */
  private def copyDir(src: Path, dst: Path): Unit = {
    if (Files.exists(dst)) { // clear stale copy
      Files.walk(dst).sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(p => Files.delete(p))
    }
    Files.walk(src).forEach { p =>
      val t = dst.resolve(src.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else Files.copy(p, t, StandardCopyOption.REPLACE_EXISTING)
    }
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.core.GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // a1-a4/a8/d4 persist their predicted ids under Verify so oracleSql
    // (dumped below, AFTER every query ran) can inline them as VALUES —
    // see SparkEntry.predSidecar. Off elsewhere: bench timings must not
    // pay the extra materialization. Stale sidecars are cleared first: a
    // query that fails THIS run must fall back to the rows-only check,
    // not pair a previous run's ids with a fresh oracle (a false
    // hash-mismatch, strictly worse than no_oracle).
    val sidecars = new java.io.File("target/pred_sidecar")
    if (sidecars.isDirectory) sidecars.listFiles().foreach(_.delete())
    System.setProperty("graft.predSidecar", "1")
    // dev aid: SPARK_GRAFT_VERIFY_ONLY=q1_pricing_summary,e4_props_rollup
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    SparkEntry.queries
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name.parquet")
        copyDir(Paths.get(s"$outDir/$name.parquet"), Paths.get(s"$outDir/$name"))
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .flatMap { case (k, v) => Seq(k -> v, s"$k.parquet" -> v) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
