package graft.functions.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused md5-min kernels for MinHash signatures and winnowing-style
  * fingerprints.
  *
  * Semantics are EXACTLY the oracle's: per salt, `min(md5_hex(salt ‖
  * shingle))`; per doc, `min(md5_hex(word k-gram))`. The naive Column
  * composition materializes a string array per salt and allocates one hex
  * string per (shingle, salt) — measured 15 s for d2 at sf0.1. One pass
  * here: windows are byte slices of the UTF-8 text, one reused
  * MessageDigest, minima kept as 16-byte digests (hex order == byte
  * order), hex-encoded once at the end. Same hot-loop discipline as the
  * reference's kernels (`/root/reference/src/simd_dot.cpp:18-22`).
  */
object HashKernels {

  /** One MessageDigest per executor thread: `getInstance` allocates a fresh
    * digest + provider lookup per call, which dominates per-row kernels with
    * short inputs (simhash over a handful of tokens). All kernels reset
    * before use, so sharing within a thread is safe.
    */
  private val tlMd5: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  private[expressions] def threadMd5(): MessageDigest = tlMd5.get()

  private val hexDigits = "0123456789abcdef".toCharArray

  private def hex(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexDigits((d(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = hexDigits(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Unsigned lexicographic byte compare (== hex-string compare order). */
  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  /** Code-point start offsets of `bytes` (UTF-8), plus the end sentinel. */
  private def charOffsets(bytes: Array[Byte]): (Array[Int], Int) = {
    val offs = new Array[Int](bytes.length + 1)
    var nc = 0
    var i = 0
    while (i < bytes.length) {
      offs(nc) = i
      nc += 1
      i += UTF8String.numBytesForFirstByte(bytes(i))
    }
    offs(nc) = bytes.length
    (offs, nc)
  }

  /** MinHash signature: for each salt, min over character-n-gram shingles
    * of md5_hex(salt ‖ shingle). Shorter-than-n texts contribute their
    * single truncated gram (substr semantics, like the Column twin).
    */
  def minhashSig(text: UTF8String, n: Int, salts: Array[Array[Byte]]): ArrayData = {
    val bytes = text.getBytes
    val (offs, nc) = charOffsets(bytes)
    val nWin = math.max(nc - n + 1, 1)
    val md = threadMd5()
    val mins = new Array[Array[Byte]](salts.length)
    var w = 0
    while (w < nWin) {
      val start = offs(w)
      val end = if (w + n <= nc) offs(w + n) else bytes.length
      var s = 0
      while (s < salts.length) {
        md.reset()
        md.update(salts(s))
        md.update(bytes, start, end - start)
        val d = md.digest()
        if (mins(s) == null || less(d, mins(s))) mins(s) = d
        s += 1
      }
      w += 1
    }
    new GenericArrayData(mins.map(m => hex(m): Any))
  }

  /** Modulus for the multiply-shift MinHash family (Mersenne prime 2^31-1):
    * products a·x stay under 2^62, so the same arithmetic is exact in JVM
    * longs and DuckDB BIGINTs (no unsigned wrap to emulate).
    */
  val MixP = 2147483647L

  /** Deterministic per-component multipliers/offsets (Knuth/LCG constants),
    * mirrored literally into the oracle SQL — see [[mixSqlExpr]].
    */
  def mixA(k: Int): Array[Long] =
    Array.tabulate(k)(s => 1L + (2654435761L * (s + 1)) % (MixP - 1))
  def mixB(k: Int): Array[Long] =
    Array.tabulate(k)(s => (1013904223L * (s + 1)) % MixP)

  /** DuckDB-side expression for component `s` over an `xm` column holding
    * `md5_number_lower(shingle) % MixP` — keeps both engines' constants in
    * one place.
    */
  def mixSqlExpr(s: Int, xm: String = "xm"): String =
    s"(${mixA(s + 1)(s)} * $xm + ${mixB(s + 1)(s)}) % $MixP"

  /** Little-endian u64 of md5 digest bytes 8..15 — equals DuckDB's
    * `md5_number_lower` (verified empirically), the shared cross-engine
    * 64-bit hash primitive.
    */
  def md5Lower64(md: MessageDigest, bytes: Array[Byte], off: Int, len: Int): Long = {
    md.reset()
    md.update(bytes, off, len)
    val d = md.digest()
    var x = 0L
    var i = 15
    while (i >= 8) { x = (x << 8) | (d(i) & 0xffL); i -= 1 }
    x
  }

  /** [[md5Lower64]] over a whole UTF-8 string — the kernel behind the
    * `md5_lower64` column function (seeded sampling ranks, doc keys).
    */
  def md5Lower64Str(text: UTF8String): Long = {
    val b = text.getBytes
    md5Lower64(threadMd5(), b, 0, b.length)
  }

  /** Scale-path MinHash signature: ONE md5 per shingle, k components
    * derived by multiply-shift mixing of the shared 64-bit hash —
    * `h_s = (a_s * (lower64 mod P) + b_s) mod P`. At 100 TB this is the
    * difference between k digests and one digest per shingle; the hex
    * variant ([[minhashSig]]) remains as the declared md5-hex flavor.
    */
  def minhashSig64(text: UTF8String, n: Int, as: Array[Long], bs: Array[Long]): ArrayData = {
    val bytes = text.getBytes
    val (offs, nc) = charOffsets(bytes)
    val nWin = math.max(nc - n + 1, 1)
    val md = threadMd5()
    val k = as.length
    val mins = Array.fill(k)(Long.MaxValue)
    var w = 0
    while (w < nWin) {
      val start = offs(w)
      val end = if (w + n <= nc) offs(w + n) else bytes.length
      val x = md5Lower64(md, bytes, start, end - start)
      val xm = java.lang.Long.remainderUnsigned(x, MixP)
      var s = 0
      while (s < k) {
        val h = (as(s) * xm + bs(s)) % MixP
        if (h < mins(s)) mins(s) = h
        s += 1
      }
      w += 1
    }
    new GenericArrayData(mins)
  }

  /** Distinct 64-bit keys of word `k`-gram windows (tokens = `\s+` splits
    * of the trimmed text, windows joined with single spaces):
    * md5Lower64(window) per window, first-occurrence order. Short docs
    * yield their single (possibly shorter) window. The long-key scale
    * flavor of the hex gram set: the d11/d12 join/shuffle key drops from
    * 32 hex bytes to one 8-byte long, and the oracle swap is mechanical
    * because md5Lower64 == DuckDB `md5_number_lower` (d7/d8-pinned).
    */
  def tokenGrams64(text: UTF8String, k: Int): ArrayData = {
    val toks = text.trim().toString.split("\\s+")
    val nWin = math.max(toks.length - k + 1, 1)
    val md = threadMd5()
    val sb = new java.lang.StringBuilder
    val seen = new java.util.LinkedHashSet[java.lang.Long]
    var w = 0
    while (w < nWin) {
      sb.setLength(0)
      var j = w
      val end = math.min(w + k, toks.length)
      while (j < end) {
        if (j > w) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      val b = sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      seen.add(md5Lower64(md, b, 0, b.length))
      w += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }

  /** Fingerprint: min over word `k`-gram windows (tokens = `\s+` splits of
    * the trimmed text, windows joined with single spaces) of md5_hex.
    * Short docs yield their single (possibly shorter) window.
    */
  def fingerprintMin(text: UTF8String, k: Int): UTF8String = {
    val toks = text.trim().toString.split("\\s+")
    val nWin = math.max(toks.length - k + 1, 1)
    val md = threadMd5()
    val sb = new java.lang.StringBuilder
    var min: Array[Byte] = null
    var w = 0
    while (w < nWin) {
      sb.setLength(0)
      var j = w
      val end = math.min(w + k, toks.length)
      while (j < end) {
        if (j > w) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      md.reset()
      val d = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      if (min == null || less(d, min)) min = d
      w += 1
    }
    hex(min)
  }
}

/** `minhash_sig(text)` → array<string> of per-salt md5-hex minima. */
case class MinhashSig(child: Expression, n: Int, salts: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {
  private lazy val saltBytes =
    salts.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(t: Any): Any =
    HashKernels.minhashSig(t.asInstanceOf[UTF8String], n, saltBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("salts", saltBytes, "byte[][]")
    defineCodeGen(ctx, ev, t =>
      s"graft.functions.expressions.HashKernels.minhashSig($t, $n, $ref)")
  }
  override def prettyName: String = "minhash_sig"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `minhash_sig64(text)` → array<long> of multiply-shift minima over one
  * shared md5 per shingle (the scale-path signature).
  */
case class MinhashSig64(child: Expression, n: Int, numHashes: Int)
    extends UnaryExpression with ExpectsInputTypes {
  private lazy val as = HashKernels.mixA(numHashes)
  private lazy val bs = HashKernels.mixB(numHashes)
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(t: Any): Any =
    HashKernels.minhashSig64(t.asInstanceOf[UTF8String], n, as, bs)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ra = ctx.addReferenceObj("as", as, "long[]")
    val rb = ctx.addReferenceObj("bs", bs, "long[]")
    defineCodeGen(ctx, ev, t =>
      s"graft.functions.expressions.HashKernels.minhashSig64($t, $n, $ra, $rb)")
  }
  override def prettyName: String = "minhash_sig64"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `md5_lower64(text)` → little-endian u64 of md5 digest bytes 8..15 as a
  * signed long — bit-identical to DuckDB's `md5_number_lower` (the
  * equivalence the d7/d8 oracles pin). The shared cross-engine uniform
  * 64-bit hash for seeded sampling and fingerprinting.
  */
case class Md5StrLower64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullSafeEval(t: Any): Any =
    HashKernels.md5Lower64Str(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"graft.functions.expressions.HashKernels.md5Lower64Str($t)")
  override def prettyName: String = "md5_lower64"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** `token_grams64(text)` → array<long> of distinct md5Lower64 word k-gram
  * keys (the narrow gram join key for decontamination / boilerplate).
  */
case class TokenGrams64(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(t: Any): Any =
    HashKernels.tokenGrams64(t.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"graft.functions.expressions.HashKernels.tokenGrams64($t, $k)")
  override def prettyName: String = "token_grams64"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `fingerprint_min(text)` → md5-hex min over word k-gram windows. */
case class FingerprintMin(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullSafeEval(t: Any): Any =
    HashKernels.fingerprintMin(t.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"graft.functions.expressions.HashKernels.fingerprintMin($t, $k)")
  override def prettyName: String = "fingerprint_min"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
