package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused language-marker counting: ONE tokenization pass produces the hit
  * count for every language at once. The Column composition
  * (`size(filter(tokens(lower(text)), isin(markers)))` per language)
  * re-tokenizes per language and is further duplicated when the optimizer
  * inlines a predicate (measured: the d6 cleaning filter evaluated ~10
  * tokenizations per row); here the argmax family reads one array.
  *
  * Tokenization matches the Column twin exactly: ASCII-space trim,
  * `\s+` splits of the lowercased text (empty tokens never match a
  * marker, so Java/Spark split-limit differences are immaterial).
  * Equality with the twin is spec-gated over the documents table.
  */
object LangKernels {

  def hitsAll(text: UTF8String, sets: Array[java.util.HashSet[String]]): ArrayData = {
    val toks = text.toLowerCase.trim().toString.split("\\s+")
    val counts = new Array[Int](sets.length)
    var i = 0
    while (i < toks.length) {
      var s = 0
      while (s < sets.length) {
        if (sets(s).contains(toks(i))) counts(s) += 1
        s += 1
      }
      i += 1
    }
    new GenericArrayData(counts)
  }
}

/** `lang_hits_all(text)` → array<int>, one marker-hit count per language
  * (in the order the marker sets were given).
  */
case class LangHitsAll(child: Expression, markers: Seq[Seq[String]])
    extends UnaryExpression with ExpectsInputTypes {

  private lazy val sets: Array[java.util.HashSet[String]] =
    markers.map { ms =>
      val s = new java.util.HashSet[String]()
      ms.foreach(s.add)
      s
    }.toArray

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(t: Any): Any =
    LangKernels.hitsAll(t.asInstanceOf[UTF8String], sets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sets", sets, "java.util.HashSet[]")
    defineCodeGen(ctx, ev, t =>
      s"graft.functions.expressions.LangKernels.hitsAll($t, $ref)")
  }

  override def prettyName: String = "lang_hits_all"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
