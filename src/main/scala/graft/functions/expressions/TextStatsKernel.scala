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

  /** Fused token-class counter: ONE pass replaces the three
    * `regexp_extract_all` scans of the BPE-ish pretokenizer query.
    * Returns `[n_ws_tokens, n_bpe_tokens, n_word_tokens, n_num_tokens]`.
    *
    * Semantics are EXACTLY the Column twins' (parity-spec-gated):
    *  - n_ws_tokens   = `size(split(trim(text), "\s+"))` — counted as
    *    (runs of `\s` inside the 0x20-trimmed string) + 1, which is what
    *    split-with-limit=-1 yields (leading/trailing non-0x20 whitespace
    *    contributes empty tokens);
    *  - the class counts mirror the left-to-right alternation
    *    `[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]`: greedy ASCII letter/digit runs,
    *    every other non-`\s` code point its own token. `\s` is Java's
    *    ASCII class (no UNICODE_CHARACTER_CLASS) — exactly the regex the
    *    twin compiles, so e.g. U+00A0 counts as a token, not whitespace.
    */
  def tokenClasses(text: UTF8String): ArrayData = {
    val str = text.toString
    var st = 0
    var en = str.length
    while (st < en && str.charAt(st) == ' ') st += 1
    while (en > st && str.charAt(en - 1) == ' ') en -= 1
    var nWs = 1L
    var inWs = false
    var i = st
    while (i < en) {
      val c = str.charAt(i)
      val isWs = c == ' ' || c == '\t' || c == '\n' || c == 0x0b ||
        c == '\f' || c == '\r'
      if (isWs && !inWs) nWs += 1
      inWs = isWs
      i += 1
    }
    var nWord = 0L
    var nNum = 0L
    var nOther = 0L
    var run = 0 // 0 = none, 1 = letter run, 2 = digit run
    i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      if ((cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z')) {
        if (run != 1) nWord += 1
        run = 1
      } else if (cp >= '0' && cp <= '9') {
        if (run != 2) nNum += 1
        run = 2
      } else if (cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0b ||
        cp == '\f' || cp == '\r') {
        run = 0
      } else {
        nOther += 1
        run = 0
      }
      i += Character.charCount(cp)
    }
    new GenericArrayData(Array(nWs, nWord + nNum + nOther, nWord, nNum))
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

/** `token_classes(text)` → array<long>
  * `[n_ws_tokens, n_bpe_tokens, n_word_tokens, n_num_tokens]`.
  */
case class TokenClasses(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(t: Any): Any =
    TextStatsKernel.tokenClasses(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"graft.functions.expressions.TextStatsKernel.tokenClasses($t)")

  override def prettyName: String = "token_classes"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
