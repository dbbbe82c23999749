package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Set algebra over pre-sorted, distinct string arrays.
  *
  * `array_intersect` builds a hash set per call; inside a pairwise-join
  * condition that cost is paid per pair (and Catalyst may evaluate the
  * condition expression several times). A single merge pass over sorted
  * arrays is allocation-free and ~100× cheaper — the classic
  * sort-once/merge-many trade for O(N²) candidate verification.
  */
object SortedSetOps {

  /** Jaccard = |a ∩ b| / |a ∪ b| for sorted distinct arrays (binary order
    * of UTF8 bytes, i.e. Spark's array_sort order for strings).
    */
  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 && nb == 0) return 0.0
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { inter += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    inter.toDouble / (na + nb - inter)
  }
}

/** `sorted_jaccard(a, b)`: single-pass Jaccard over sorted distinct string
  * arrays. Both inputs MUST be array_sort(array_distinct(...)) outputs.
  */
case class SortedJaccard(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType), ArrayType(StringType))
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    SortedSetOps.jaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.expressions.SortedSetOps.jaccard($a, $b)")
  override def prettyName: String = "sorted_jaccard"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}
