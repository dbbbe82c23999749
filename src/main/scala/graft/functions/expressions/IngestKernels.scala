package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Ingest-pipeline kernels (S8): sentence-aware chunking and the embedding
  * STUB, mirroring `/root/reference/scripts/build_vecbin_chunked.py:155-225`
  * (greedy sentence packing under a character budget) and `:255-385`
  * (SentenceTransformer embed + L2 normalize).
  */
object IngestKernels {

  /** Sentence boundaries: positions after [.!?]+ followed by whitespace.
    * Same split the SQL-expressible chunker uses (regexp on `([.!?])\s+`).
    */
  def splitSentences(text: String): Array[String] =
    text.split("(?<=[.!?])\\s+")

  /** Greedy sentence packing: consecutive sentences join (space-separated)
    * while the chunk stays within `maxChars`; a single over-long sentence
    * still becomes its own chunk (reference chunker `:175-200` semantics).
    */
  def chunkGreedy(s: UTF8String, maxChars: Int): ArrayData = {
    val sents = splitSentences(s.toString)
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    val cur = new java.lang.StringBuilder
    var i = 0
    while (i < sents.length) {
      val sent = sents(i)
      if (cur.length() == 0) cur.append(sent)
      else if (cur.length() + 1 + sent.length <= maxChars) {
        cur.append(' '); cur.append(sent)
      } else {
        out += UTF8String.fromString(cur.toString); cur.setLength(0); cur.append(sent)
      }
      i += 1
    }
    if (cur.length() > 0) out += UTF8String.fromString(cur.toString)
    new GenericArrayData(out.toArray[Any])
  }

  /** DETERMINISTIC FAKE EMBEDDING — a declared stub. The container has no
    * embedding model; this seeds a PRNG from an FNV-1a 64 hash of the text
    * and emits an L2-normalized gaussian vector. The Spark-side plumbing
    * (schema, chunk explode, normalize, sidecar join) is real; only the
    * model call is fake, like `Multimodal.FakeDecoder`.
    */
  def fakeEmbed(s: UTF8String, dim: Int): ArrayData = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h ^= bytes(i) & 0xffL; h *= 0x100000001b3L; i += 1 }
    val rnd = new java.util.Random(h)
    val v = new Array[Float](dim)
    var norm = 0.0
    i = 0
    while (i < dim) { val g = rnd.nextGaussian(); v(i) = g.toFloat; norm += g * g; i += 1 }
    val inv = if (norm == 0.0) 0.0 else 1.0 / math.sqrt(norm)
    i = 0
    while (i < dim) { v(i) = (v(i) * inv).toFloat; i += 1 }
    new GenericArrayData(v)
  }
}

/** `sentence_chunks(text)` → array<string> of greedy ≤maxChars chunks. */
case class SentenceChunks(child: Expression, maxChars: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(t: Any): Any =
    IngestKernels.chunkGreedy(t.asInstanceOf[UTF8String], maxChars)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"graft.functions.expressions.IngestKernels.chunkGreedy($t, $maxChars)")
  override def prettyName: String = "sentence_chunks"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `fake_embed(text)` → array<float> stub embedding (L2-normalized). */
case class FakeEmbed(child: Expression, dim: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullSafeEval(t: Any): Any =
    IngestKernels.fakeEmbed(t.asInstanceOf[UTF8String], dim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"graft.functions.expressions.IngestKernels.fakeEmbed($t, $dim)")
  override def prettyName: String = "fake_embed"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
