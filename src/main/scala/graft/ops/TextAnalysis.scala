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
    * average token length, quality score — ONE fused kernel pass per row
    * ([[TextFunctions.textProfile]]); every output derives from the bound
    * counter array with long arithmetic, value-identical to the Column
    * twins (spec-gated; t1's oracle hashes the result).
    */
  def textStats(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val bundle = element_at(
      transform(array(TextFunctions.textProfile(col(textCol), defaultStopwords)), p => {
        val s = TextFunctions.statsFromProfile(p)
        struct(s.nChars.as("n_chars_text"), s.nTokens.as("n_tokens"),
          s.punctRatio.as("punct_ratio"), s.stopwordRatio.as("stopword_ratio"),
          s.avgTokenLen.as("avg_token_len"), s.quality.as("quality"))
      }), 1)
    docs.select(col(idCol), bundle.as("s"))
      .select(col(idCol), col("s.n_chars_text").as("n_chars_text"),
        col("s.n_tokens").as("n_tokens"), col("s.punct_ratio").as("punct_ratio"),
        col("s.stopword_ratio").as("stopword_ratio"),
        col("s.avg_token_len").as("avg_token_len"), col("s.quality").as("quality"))
  }

  /** Column-composition twin of [[textStats]] (slow, trusted oracle). */
  private[graft] def textStatsHof(docs: DataFrame, idCol: String = "doc_id",
                                  textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol),
      length(col(textCol)).cast("long").as("n_chars_text"),
      TextFunctions.tokenCount(col(textCol)).cast("long").as("n_tokens"),
      TextFunctions.punctRatio(col(textCol)).as("punct_ratio"),
      TextFunctions.wordSetRatio(col(textCol), defaultStopwords).as("stopword_ratio"),
      TextFunctions.avgTokenLen(col(textCol)).as("avg_token_len"),
      TextFunctions.qualityScoreHof(col(textCol), defaultStopwords).as("quality"))

  /** Language ID via marker-stopword voting: per-language hit counts plus
    * the deterministic argmax prediction.
    */
  def langId(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(
      Seq(col(idCol)) ++
        TextFunctions.langMarkers.map { case (l, _) =>
          TextFunctions.langHits(col(textCol), l).as(s"${l}_hits")
        } :+ TextFunctions.langId(col(textCol)).as("pred_lang"): _*)

  /** Token counting, whitespace + BPE-ish pretokenizer classes (the GPT-2
    * alternation `[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]`): ONE fused kernel pass
    * per row ([[TextFunctions.tokenClassProfile]]) instead of three regex
    * scans — value-identical to the regexp Column twins (spec-gated).
    */
  def tokenClasses(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    // lambda-bind the profile array so the kernel runs ONCE per row (the
    // textStats pattern — element_at×4 on the raw call would re-scan)
    val bundle = element_at(
      transform(array(TextFunctions.tokenClassProfile(col(textCol))), p =>
        struct(element_at(p, 1).as("n_ws_tokens"),
          element_at(p, 2).as("n_bpe_tokens"),
          element_at(p, 3).as("n_word_tokens"),
          element_at(p, 4).as("n_num_tokens"))), 1)
    docs.select(col(idCol), bundle.as("s"))
      .select(col(idCol), col("s.n_ws_tokens").as("n_ws_tokens"),
        col("s.n_bpe_tokens").as("n_bpe_tokens"),
        col("s.n_word_tokens").as("n_word_tokens"),
        col("s.n_num_tokens").as("n_num_tokens"))
  }

  /** Winnowing-style fingerprint per doc (word 3-gram rolling min-hash). */
  def fingerprints(docs: DataFrame, k: Int = 3, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame =
    docs.select(col(idCol), TextFunctions.fingerprint(col(textCol), k).as("fp"))

  /** Within-document repetition stats (the Gopher/MassiveText-style
    * repetition quality signals): distinct-token ratio and the duplicate
    * fraction of token `gram`-grams inside each document. Pure HOFs — no
    * shuffle, no explode; the token array and the gram array are each
    * bound once through a lambda variable so split() and the gram build
    * run once per row, not once per element.
    *
    * All ratios are exact-integer divisions — IEEE-identical across
    * engines, no rounding needed.
    */
  def repetitionStats(docs: DataFrame, gram: Int = 3, idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame = {
    val stats = element_at(
      transform(array(TextFunctions.tokens(col(textCol))), ts =>
        element_at(transform(array(
          transform(sequence(lit(0), greatest(size(ts) - gram, lit(0))),
            i => array_join(slice(ts, i + lit(1), lit(gram)), " "))), gs =>
          struct(
            size(ts).cast("long").as("n_tokens"),
            (size(array_distinct(ts)).cast("double") /
              greatest(size(ts), lit(1))).as("distinct_token_ratio"),
            size(gs).cast("long").as("n_grams"),
            (lit(1.0) - size(array_distinct(gs)).cast("double") /
              greatest(size(gs), lit(1))).as("gram_dup_ratio"))), 1)), 1)
    docs.select(col(idCol), stats.as("st"))
      .select(col(idCol), col("st.n_tokens").as("n_tokens"),
        col("st.distinct_token_ratio").as("distinct_token_ratio"),
        col("st.n_grams").as("n_grams"),
        col("st.gram_dup_ratio").as("gram_dup_ratio"))
  }

  /** Quantile-threshold gate: keep rows whose `metric` is at or above the
    * per-stratum `q`-quantile (e.g. drop the shortest 75% of docs per
    * language). Thresholds come from ONE aggregation broadcast back onto
    * the table — the corpus is filtered map-side, never windowed.
    *
    * Exact mode buffers every group value in the percentile aggregate —
    * right for the oracle gate and up to ~10^8 rows per stratum, NOT for
    * a 100 TB corpus. At scale pass `approx = true` (t-digest-style
    * `approx_percentile`, constant memory per stratum) or pre-compute the
    * threshold with `Percentiles.sortBased` (exact, one sort). Exact
    * Spark `percentile` uses the same linear-interpolation formula as
    * DuckDB's `quantile_cont` (pinned by the q4 oracle), so the exact
    * threshold — and therefore the kept set — is engine-reproducible.
    */
  def quantileGate(df: DataFrame, stratum: String, metric: String,
                   q: Double, approx: Boolean = false): DataFrame = {
    val agg =
      if (approx) expr(s"approx_percentile($metric, ${q}D, 10000)")
      else expr(s"percentile($metric, ${q}D)")
    val thr = df.groupBy(col(stratum)).agg(agg.cast("double").as("thr"))
    df.join(broadcast(thr), Seq(stratum))
      .filter(col(metric).cast("double") >= col("thr"))
      .drop("thr")
  }

  /** Corpus mixing stats per source: doc/token/char totals, each source's
    * token share, and the upsample factor that would equalize token counts
    * across sources (uniform target mix). One map-side-combined aggregation
    * over the corpus; the grand total is a one-row aggregate broadcast back
    * onto the per-source rows — no single-partition window node anywhere
    * in the plan (a `Window.partitionBy()` here would be O(sources) too,
    * but it drags every per-source row to one task and warns on every run;
    * the broadcast crossJoin is the same cost with a clean plan).
    */
  def mixingStats(docs: DataFrame, srcCol: String = "source",
                  textCol: String = "text"): DataFrame = {
    val per = docs.groupBy(col(srcCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(TextFunctions.tokenCount(col(textCol)).cast("long")).as("n_tokens"),
        sum(length(col(textCol)).cast("long")).as("n_chars"))
    // Grand totals via an empty-partition window over the PER-STRATUM
    // aggregate (r17): the former `per.agg(...)` + crossJoin(broadcast)
    // duplicated the `per` subtree in the plan — and the two copies
    // differed (the join arm carries a pushed IsNotNull filter the total
    // arm lacks), so exchange reuse never fired and the corpus was
    // scanned AND token-counted TWICE (guide §2.4: share the pass). The
    // window's single task holds only #sources rows — stratum
    // cardinality, the same driver-size class as the broadcast it
    // replaces. Same long sums, same division order: bit-identical
    // output (t6 oracle re-gates).
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    per.select(col(srcCol), col("n_docs"), col("n_tokens"), col("n_chars"),
      (col("n_tokens").cast("double") / sum(col("n_tokens")).over(w))
        .as("token_share"),
      ((sum(col("n_tokens")).over(w).cast("double") /
        count(lit(1)).over(w)) /
        col("n_tokens").cast("double")).as("upsample_factor"))
  }
}
