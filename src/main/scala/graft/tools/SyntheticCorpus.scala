package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic documents table in the TESTDATA shape
  * (doc_id, text, lang, source, n_chars) at ARBITRARY scale — the driver
  * testdata tops out at 5k docs, far below where LSH/curation invariants
  * can break (bucket blow-up, candidate quadratics, hot-stratum
  * serialization), so the scale gates build their own corpus.
  *
  * Controlled duplicate structure, all derived from seeded hashes (no
  * RNG state, fully reproducible, generated distributed — no driver
  * loop):
  *  - docs come in families of `familySize` consecutive ids; within a
  *    family texts are identical except ONE perturbed token per doc
  *    (high-Jaccard near-dups that LSH must catch);
  *  - every 10th family is exact-identical (exact dups always collide);
  *  - sources are Zipf-skewed: `src_hot` holds ~30% of the corpus, so
  *    hot-stratum code paths (packing shard split, skew salting)
  *    actually engage rather than degenerate to uniform strata.
  */
object SyntheticCorpus {

  val Langs = Seq("en", "de", "fr", "es", "it")

  def documents(spark: SparkSession, n: Long, familySize: Int = 5,
                vocab: Int = 1000000): DataFrame = {
    require(n > 0 && familySize > 0 && vocab > 1)
    val langArr = array(Langs.map(lit): _*)
    // base-36 word spellings: the character n-gram universe must scale
    // with the vocabulary, like real text — decimal spellings over a
    // small vocab ("w123") collapse the char-shingle space and every doc
    // shares the corpus-global minimum shingle, turning minhash buckets
    // corpus-sized (observed: 67M candidate pairs on a 100k corpus)
    def word(prefix: String, h: org.apache.spark.sql.Column) =
      concat(lit(prefix),
        lower(conv(pmod(h, lit(vocab.toLong)).cast("string"), 10, 36)))
    spark.range(n).select(col("id").as("doc_id"))
      .withColumn("family", expr(s"doc_id div $familySize"))
      .withColumn("ntok",
        (pmod(xxhash64(col("family"), lit("len")), lit(90L)) + 30L).cast("int"))
      .withColumn("exact", pmod(col("family"), lit(10L)) === 0L)
      .withColumn("ptok", pmod(xxhash64(col("doc_id"), lit("pert")), col("ntok")))
      .withColumn("text", concat_ws(" ",
        transform(sequence(lit(1), col("ntok")), i =>
          when(!col("exact") && i === col("ptok") + 1,
            word("x", xxhash64(col("doc_id"), i)))
            .otherwise(word("w", xxhash64(col("family"), i))))))
      .withColumn("lang",
        element_at(langArr, (pmod(col("family"), lit(Langs.size.toLong)) + 1).cast("int")))
      .withColumn("source", {
        val s = pmod(xxhash64(col("family"), lit("src")), lit(100L))
        when(s < 30, lit("src_hot"))
          .when(s < 50, lit("src_1"))
          .when(s < 65, lit("src_2"))
          .otherwise(concat(lit("src_t"), pmod(s, lit(7L))))
      })
      .withColumn("n_chars", length(col("text")).cast("long"))
      .select("doc_id", "text", "lang", "source", "n_chars")
  }
}
