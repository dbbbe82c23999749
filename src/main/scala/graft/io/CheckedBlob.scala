package graft.io

/** CRC32C-framed small binary artifacts (r17, closing the r16 verdict
  * task: "checksum the pq4 cache artifacts"). The HNSW store's v3 frame
  * CRCs header+payload so a silent bit-flip fails loudly instead of
  * serving wrong scores; the SAME argument applies to the only other
  * non-parquet artifacts read without an oracle — the pq/ivf caches'
  * codebook and centroid sidecars (`*.books.bin`, `*.coarse.bin`). A
  * flipped codebook float would quietly skew every ADC score it touches;
  * parquet tables have their own page checksums, these raw files had
  * nothing.
  *
  * Frame: `[magic:4][len:4][crc32c(payload):4][payload:len]`, big-endian
  * (DataOutputStream's order). The magic is a negative int, so it cannot
  * collide with a legacy file — both legacy formats open with a small
  * non-negative count (`m` for books, `rows` for matrices) — and legacy
  * files stay readable through the fallback parse, like the store's
  * v1/v2 compatibility. The explicit `len` makes truncation loud too.
  *
  * Corruption policy mirrors store v3: a framed file that fails its
  * check THROWS (deleting the artifact to rebuild is the operator's
  * explicit action), while an unparseable legacy file keeps returning
  * `None` (the pre-existing rebuild-on-missing contract).
  */
object CheckedBlob {
  /** Deliberately negative (see class doc). */
  private[graft] final val Magic = 0xC7C32C17

  /** Serialize `body`'s writes into a CRC32C-framed file. The frame
    * lands via tmp + move so a crash mid-write never leaves a
    * half-frame under the final name.
    */
  def write(file: String)(body: java.io.DataOutputStream => Unit): Unit = {
    val buf = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(buf)
    body(out)
    out.flush()
    val payload = buf.toByteArray
    val crc = new java.util.zip.CRC32C
    crc.update(payload)
    val framed = new java.io.ByteArrayOutputStream(payload.length + 12)
    val fo = new java.io.DataOutputStream(framed)
    fo.writeInt(Magic)
    fo.writeInt(payload.length)
    fo.writeInt(crc.getValue.toInt)
    fo.write(payload)
    fo.flush()
    val tmp = java.nio.file.Paths.get(file + ".tmp")
    java.nio.file.Files.write(tmp, framed.toByteArray)
    java.nio.file.Files.move(tmp, java.nio.file.Paths.get(file),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** Parse `file` through `parse`: a framed file verifies length + CRC
    * first (failure THROWS — see class doc), a legacy file parses as-is
    * from byte 0 (failure returns `None`), a missing file is `None`.
    */
  def read[A](file: String)(parse: java.io.DataInput => A): Option[A] = {
    val p = java.nio.file.Paths.get(file)
    if (!java.nio.file.Files.isRegularFile(p)) None
    else {
      val bytes = java.nio.file.Files.readAllBytes(p)
      def intAt(off: Int): Int =
        ((bytes(off) & 0xff) << 24) | ((bytes(off + 1) & 0xff) << 16) |
          ((bytes(off + 2) & 0xff) << 8) | (bytes(off + 3) & 0xff)
      if (bytes.length >= 12 && intAt(0) == Magic) {
        val len = intAt(4)
        if (bytes.length != 12 + len)
          throw new IllegalStateException(
            s"$file: truncated CRC32C-framed artifact " +
              s"(${bytes.length} bytes, frame declares ${12 + len}) — " +
              "corrupt; delete it to rebuild")
        val crc = new java.util.zip.CRC32C
        crc.update(bytes, 12, len)
        if (crc.getValue.toInt != intAt(8))
          throw new IllegalStateException(
            s"$file: CRC32C mismatch — the artifact is corrupt (silent " +
              "bit-flip or partial write); delete it to rebuild")
        Some(parse(new java.io.DataInputStream(
          new java.io.ByteArrayInputStream(bytes, 12, len))))
      } else
        try Some(parse(new java.io.DataInputStream(
          new java.io.ByteArrayInputStream(bytes))))
        catch {
          case _: java.io.IOException | _: RuntimeException => None
        }
    }
  }
}
