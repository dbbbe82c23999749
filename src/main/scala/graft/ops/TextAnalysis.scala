package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Text quality / statistics operators for training-data curation.
  * Pure narrow transformations — they pipeline with the parquet scan and
  * never shuffle; aggregation variants reduce map-side.
  */
object TextAnalysis {

  val defaultStopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "is", "in", "that", "it", "for")

  /** Per-document stats: tokens, chars, punct ratio, stopword ratio,
    * average token length, quality score.
    */
  def textStats(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol),
      length(col(textCol)).as("n_chars_text"),
      TextFunctions.tokenCount(col(textCol)).as("n_tokens"),
      TextFunctions.punctRatio(col(textCol)).as("punct_ratio"),
      TextFunctions.wordSetRatio(col(textCol), defaultStopwords).as("stopword_ratio"),
      TextFunctions.avgTokenLen(col(textCol)).as("avg_token_len"),
      TextFunctions.qualityScore(col(textCol), defaultStopwords).as("quality"))

  /** Language ID via marker-stopword voting: per-language hit counts plus
    * the deterministic argmax prediction.
    */
  def langId(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(
      Seq(col(idCol)) ++
        TextFunctions.langMarkers.map { case (l, _) =>
          TextFunctions.langHits(col(textCol), l).as(s"${l}_hits")
        } :+ TextFunctions.langId(col(textCol)).as("pred_lang"): _*)

  /** Winnowing-style fingerprint per doc (word 3-gram rolling min-hash). */
  def fingerprints(docs: DataFrame, k: Int = 3, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame =
    docs.select(col(idCol), TextFunctions.fingerprint(col(textCol), k).as("fp"))
}
