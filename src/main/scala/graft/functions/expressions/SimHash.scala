package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** 64-bit SimHash over a token array (Charikar similarity hash): each
  * token's FNV-1a 64 hash votes ±1 per bit position; the sign vector is the
  * fingerprint. Near-duplicates differ in few bits (small Hamming distance).
  */
object SimHashKernel {

  def fnv1a64(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h ^= bytes(i) & 0xffL; h *= 0x100000001b3L; i += 1 }
    h
  }

  def simhash64(tokens: ArrayData): Long = simhashWith(tokens, fnv = true)

  /** Oracle-anchorable flavor: token hash = lower 64 bits of md5 (equal to
    * DuckDB's `md5_number_lower`), so the whole fingerprint is reproducible
    * in SQL bit for bit. FNV stays the fast default; the vote rule is
    * shared.
    */
  def simhashMd5(tokens: ArrayData): Long = simhashWith(tokens, fnv = false)

  private def simhashWith(tokens: ArrayData, fnv: Boolean): Long = {
    val votes = new Array[Int](64)
    val md = if (fnv) null else HashKernels.threadMd5()
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      // null elements are skipped, not NPE'd: ArrayType(StringType) admits
      // containsNull=true inputs (e.g. transform() outputs)
      if (!tokens.isNullAt(t)) {
        val bytes = tokens.getUTF8String(t).getBytes
        val h =
          if (fnv) fnv1a64(bytes)
          else HashKernels.md5Lower64(md, bytes, 0, bytes.length)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      t += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}

/** `simhash64(tokens)`: 64-bit similarity hash of a string array. */
case class SimHash64(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any): Any =
    SimHashKernel.simhash64(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.expressions.SimHashKernel.simhash64($a)")
  override def prettyName: String = "simhash64"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** `simhash_md5(tokens)`: md5-lower-64 token hashes — SQL-reproducible. */
case class SimHashMd5(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any): Any =
    SimHashKernel.simhashMd5(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.expressions.SimHashKernel.simhashMd5($a)")
  override def prettyName: String = "simhash_md5"
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}
