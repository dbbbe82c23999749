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
    val md = MessageDigest.getInstance("MD5")
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

  /** Fingerprint: min over word `k`-gram windows (tokens = `\s+` splits of
    * the trimmed text, windows joined with single spaces) of md5_hex.
    * Short docs yield their single (possibly shorter) window.
    */
  def fingerprintMin(text: UTF8String, k: Int): UTF8String = {
    val toks = text.trim().toString.split("\\s+")
    val nWin = math.max(toks.length - k + 1, 1)
    val md = MessageDigest.getInstance("MD5")
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
