package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Primitive-coded n-gram sets for near-dup detection at scale.
  *
  * Extracting character n-grams as strings allocates one object per gram
  * per comparison; over an O(candidates²) verify stage that dominates.
  * Instead each n-gram window is packed once into a `long` code
  * (injective for windows ≤ 8 bytes — every ASCII 5-gram; longer windows
  * use an FNV-1a 64 hash, collision odds ~2^-64), and pair scoring is a
  * single allocation-free merge over sorted long arrays.
  *
  * Jaccard over the coded sets equals Jaccard over the string sets
  * (injective coding), so results stay oracle-exact for ASCII text.
  */
object TextKernels {

  /** Sorted distinct packed n-gram codes of `s` (grams of `n` characters).
    * Shorter-than-n texts produce their single truncated gram, mirroring
    * substr(text, 1, n) semantics.
    */
  def ngramCodes(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    // char start offsets (UTF-8)
    val offs = new Array[Int](len + 1)
    var nc = 0
    var i = 0
    while (i < len) {
      offs(nc) = i
      nc += 1
      i += UTF8String.numBytesForFirstByte(bytes(i))
    }
    offs(nc) = len
    val nWindows = math.max(nc - n + 1, 1)
    val codes = new Array[Long](nWindows)
    var w = 0
    while (w < nWindows) {
      val start = offs(w)
      val end = if (w + n <= nc) offs(w + n) else len
      codes(w) = packWindow(bytes, start, end)
      w += 1
    }
    java.util.Arrays.sort(codes)
    // in-place dedupe of the sorted codes
    var out = 0
    var k = 0
    while (k < nWindows) {
      if (out == 0 || codes(k) != codes(out - 1)) { codes(out) = codes(k); out += 1 }
      k += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(codes, out))
  }

  /** Injective for width ≤ 8: length-marked big-endian byte pack; FNV-1a
    * hash beyond that.
    */
  private def packWindow(bytes: Array[Byte], start: Int, end: Int): Long = {
    val w = end - start
    if (w <= 7) {
      var v = w.toLong
      var i = start
      while (i < end) { v = (v << 8) | (bytes(i) & 0xffL); i += 1 }
      v
    } else if (w == 8) {
      var v = 0L
      var i = start
      while (i < end) { v = (v << 8) | (bytes(i) & 0xffL); i += 1 }
      v
    } else {
      var h = 0xcbf29ce484222325L
      var i = start
      while (i < end) { h ^= bytes(i) & 0xffL; h *= 0x100000001b3L; i += 1 }
      h | Long.MinValue // segregate hash space from short packs
    }
  }

  /** Jaccard over two sorted distinct long arrays — one merge pass. */
  def jaccardCodes(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 && nb == 0) return 0.0
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter.toDouble / (na + nb - inter)
  }
}

/** `ngram_codes(text)`: sorted distinct packed character n-gram codes. */
case class NgramCodes(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(s: Any): Any =
    TextKernels.ngramCodes(s.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"graft.functions.expressions.TextKernels.ngramCodes($s, $n)")
  override def prettyName: String = "ngram_codes"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `jaccard_codes(a, b)`: Jaccard of two sorted long-code sets. */
case class JaccardCodes(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.jaccardCodes(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.expressions.TextKernels.jaccardCodes($a, $b)")
  override def prettyName: String = "jaccard_codes"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}
