package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-document text statistics: ONE pass produces every counter the
  * quality/stats family needs. The Column composition pays two regexp
  * passes plus two tokenizations per row (and the quality score re-derives
  * each ratio), which is the dominant per-row cost of the text-stats scan
  * at corpus scale; here one kernel call yields
  * `[n_chars, n_tokens, n_punct, n_stop, n_nonws]` and the ratios are
  * cheap long arithmetic.
  *
  * Semantics are EXACTLY the Column twins' (spec-gated equality, and the
  * t1/d6 oracles hash the composed results):
  *  - n_chars  = `length(text)` (code points);
  *  - n_tokens = `size(split(trim(text), "\s+"))` — ASCII-space trim, then
  *    Java `\s+` split with limit -1 (leading AND trailing empty tokens
  *    count, exactly like Spark's split);
  *  - n_punct  = code points outside `[a-zA-Z0-9 ]` (what
  *    `regexp_replace` would delete);
  *  - n_stop   = tokens present in the stopword set (case-sensitive);
  *  - n_nonws  = non-`\s` code points (== `\s+`-stripped length).
  */
object TextStatsKernel {

  def statsAll(text: UTF8String, stop: java.util.HashSet[String]): ArrayData = {
    val str = text.toString
    var nChars = 0L
    var nPunct = 0L
    var nNonWs = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      nChars += 1
      val isWs = cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0b ||
        cp == '\f' || cp == '\r'
      if (!isWs) nNonWs += 1
      val isOk = (cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z') ||
        (cp >= '0' && cp <= '9') || cp == ' '
      if (!isOk) nPunct += 1
      i += Character.charCount(cp)
    }
    // Spark trim() strips 0x20 only (NOT Java String.trim's <= 0x20)
    var st = 0
    var en = str.length
    while (st < en && str.charAt(st) == ' ') st += 1
    while (en > st && str.charAt(en - 1) == ' ') en -= 1
    val toks = str.substring(st, en).split("\\s+", -1)
    var nStop = 0L
    var t = 0
    while (t < toks.length) {
      if (stop.contains(toks(t))) nStop += 1
      t += 1
    }
    new GenericArrayData(Array(nChars, toks.length.toLong, nPunct, nStop, nNonWs))
  }
}

/** `text_stats_all(text)` → array<long>
  * `[n_chars, n_tokens, n_punct, n_stop, n_nonws]`.
  */
case class TextStatsAll(child: Expression, stopwords: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {

  private lazy val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    stopwords.foreach(s.add)
    s
  }

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(t: Any): Any =
    TextStatsKernel.statsAll(t.asInstanceOf[UTF8String], stopSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stop", stopSet, "java.util.HashSet")
    defineCodeGen(ctx, ev, t =>
      s"graft.functions.expressions.TextStatsKernel.statsAll($t, $ref)")
  }

  override def prettyName: String = "text_stats_all"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
