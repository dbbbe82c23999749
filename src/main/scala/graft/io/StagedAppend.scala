package graft.io

/** Crash-safe append into a partitioned parquet table (r17, closing the
  * r16 verdict task: "automate the a17 crash remedy"). The direct
  * `mode("append")` write mutates the live table in place, so a crash
  * mid-append leaves a partial batch with no machine-readable way to
  * tell which rows landed — the r16 a17 oracle bracketed it with a
  * STARTED sentinel whose documented remedy was hand-wiping two cache
  * dirs. This object replaces that with the HNSW store's
  * stage-then-commit shape (`Hnsw.saveWarmed`'s generation move, itself
  * the classic rename-based task-commit protocol):
  *
  *  1. STAGE — the batch writes (Spark, `mode("overwrite")`) under
  *     `<table>/_append_<token>.stage/`, a directory Spark's file
  *     listing ignores (leading underscore, no `=`): readers keep
  *     serving the OLD generation no matter how the staging write ends.
  *  2. PLAN — the exact file moves (stage-relative source → table-
  *     relative destination, plus the batch row count) write to a tmp
  *     file and land in ONE `ATOMIC_MOVE` as
  *     `<table>/_append_<token>.plan`. This is the commit point.
  *  3. APPLY — each staged file `ATOMIC_MOVE`s into its partition dir
  *     under a token-unique name, then `_append_<token>.committed`
  *     (content: row count) lands atomically and the plan + stage dir
  *     clean up.
  *
  * Recovery is a RE-CALL with the same token — no manual intervention:
  * committed marker present → idempotent skip (returns the recorded
  * count); plan present (crash mid-apply) → replay the moves, each
  * either still staged (move it) or already moved (skip — `ATOMIC_MOVE`
  * leaves no third state); neither (crash mid-staging) → wipe the
  * invisible stage dir and re-stage. The one non-atomic window left is
  * the per-file moves of step 3 — metadata renames, not data writes —
  * during which a concurrent reader can observe a prefix of the batch;
  * the committed marker is the read barrier for callers that need
  * all-or-nothing visibility (the oracle serves only after `run`
  * returns). The caller owns token uniqueness per logical batch (a
  * stream's batchId, a DDL generation) — reusing a token skips, it does
  * not double-append.
  *
  * Paths are `java.nio` like every other cache artifact here (HNSW
  * store, codebook sidecars): the caches live on executor-local or
  * driver-local disk. An object-store-resident TABLE would route this
  * protocol through the Hadoop FileSystem API instead — same states,
  * same markers.
  */
object StagedAppend {

  private def path(s: String) = java.nio.file.Paths.get(s)

  private def deleteTree(dir: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(dir)) {
      val st = java.nio.file.Files.walk(dir)
      try st.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
      finally st.close()
    }

  private def atomicWrite(dst: java.nio.file.Path, content: String): Unit = {
    val tmp = dst.resolveSibling(dst.getFileName.toString + ".tmp")
    java.nio.file.Files.writeString(tmp, content)
    java.nio.file.Files.move(tmp, dst,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** Append the batch `write` stages into `tablePath` under idempotency
    * key `token`. `write` receives the stage directory and must lay the
    * batch down there in the TABLE's layout (same partition columns);
    * `nRows` is consulted once, at plan time, and recorded in the
    * markers. Returns the committed row count — from the marker when
    * the token was already committed (replayed calls), else `nRows`.
    */
  def run(tablePath: String, token: String, nRows: => Long)
         (write: String => Unit): Long = {
    require(token.nonEmpty && !token.contains('/') && !token.contains('.'),
      s"staged-append token must be a plain name, got '$token'")
    val table = path(tablePath)
    val committed = table.resolve(s"_append_$token.committed")
    val plan = table.resolve(s"_append_$token.plan")
    val stage = table.resolve(s"_append_$token.stage")
    if (java.nio.file.Files.isRegularFile(committed))
      return java.nio.file.Files.readString(committed).trim.toLong
    if (!java.nio.file.Files.isRegularFile(plan)) {
      // crash-mid-staging leftovers are invisible to readers and safe to
      // wipe: nothing references the stage dir until the plan lands
      deleteTree(stage)
      write(stage.toString)
      val moves = {
        val b = Vector.newBuilder[(String, String)]
        var i = 0
        val st = java.nio.file.Files.walk(stage)
        try st.forEach { p =>
          val name = p.getFileName.toString
          if (java.nio.file.Files.isRegularFile(p) &&
              !name.startsWith("_") && !name.startsWith(".")) {
            val rel = stage.relativize(p).toString
            val dir = rel.lastIndexOf('/') match {
              case -1 => ""
              case j  => rel.substring(0, j + 1)
            }
            b += ((rel, s"${dir}append-$token-$i-$name"))
            i += 1
          }
        } finally st.close()
        b.result()
      }
      atomicWrite(plan,
        (nRows.toString +: moves.map(m => s"${m._1}\t${m._2}")).mkString("\n"))
    }
    // APPLY (first pass or replay): every move either still has its
    // staged source (move it) or already ran (destination present)
    val lines = java.nio.file.Files.readString(plan).split('\n')
    val n = lines.head.trim.toLong
    lines.iterator.drop(1).filter(_.nonEmpty).foreach { line =>
      val Array(src, dst) = line.split('\t')
      val s0 = stage.resolve(src)
      val d0 = table.resolve(dst)
      if (java.nio.file.Files.exists(s0)) {
        java.nio.file.Files.createDirectories(d0.getParent)
        java.nio.file.Files.move(s0, d0,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      } else if (!java.nio.file.Files.exists(d0))
        throw new IllegalStateException(
          s"staged append '$token' into $tablePath lost $src: neither " +
            "staged nor applied — the stage dir was tampered with; " +
            "delete the .plan and .stage leftovers to restart the batch")
    }
    atomicWrite(committed, n.toString)
    java.nio.file.Files.delete(plan)
    deleteTree(stage)
    n
  }
}
