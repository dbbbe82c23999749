package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** GPT-style sequence packing: documents are concatenated per (stratum,
  * shard) in id order into a token stream that is cut every `budget`
  * tokens (documents may straddle sequence boundaries — the standard
  * packed-pretraining layout). Each document reports its stream offset,
  * its first sequence id, and how many sequences it spans — the manifest a
  * tokenizer-side packer consumes.
  *
  * Scale: ONE window per (stratum, shard) — strata pack in parallel, and
  * `shards` splits a hot stratum into independent token streams (the
  * packing analogue of salting: a single source with half the corpus
  * would otherwise serialize on one reducer). Deterministic: shard =
  * id % shards, order by id, so the layout is reproducible run to run and
  * engine to engine.
  */
object Packing {

  def pack(docs: DataFrame, budget: Int, shards: Int, stratum: String,
           idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(budget > 0 && shards > 0)
    val w = Window.partitionBy(col(stratum), col("shard")).orderBy(col(idCol))
    docs
      .select(col(idCol), col(stratum),
        (col(idCol) % shards).as("shard"),
        TextFunctions.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("start_off", coalesce(
        sum(col("n_tokens")).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      // integer div on both engines — no float rounding in the layout
      .withColumn("seq_id", expr(s"start_off div $budget"))
      .withColumn("n_seqs",
        expr(s"(start_off + n_tokens - 1) div $budget") - col("seq_id") + lit(1L))
  }
}
