package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{GraftSession, Tables}
import graft.ops.TextAnalysis

/** The fused text-stats kernel must be VALUE-identical to the Column
  * composition it replaces (t1/d6's oracle hashes depend on it): gated on
  * the real corpus and on adversarial whitespace/unicode edge cases that
  * exercise the trim/split-limit subtleties.
  */
class TextStatsParitySpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = GraftSession.local(4)

  test("fused text stats kernel == Column-composition twin (corpus + edge cases)") {
    val s = spark
    import s.implicits._
    val edge = Seq(
      (1L, ""), (2L, "   "), (3L, "\tleading tab"), (4L, "trailing space  "),
      (5L, "a\t\nb  c!! 123"), (6L, "héllo wörld … the a of"),
      (7L, "xvertical\ftab\rreturn"))
      .toDF("doc_id", "text")
    Seq(Tables.documents(spark, dir), edge).foreach { docs =>
      val a = TextAnalysis.textStats(docs).orderBy("doc_id").collect()
      val b = TextAnalysis.textStatsHof(docs).orderBy("doc_id").collect()
      assert(a.length == b.length && a.nonEmpty)
      a.zip(b).foreach { case (x, y) =>
        assert(x.getLong(0) == y.getLong(0))
        assert(x.getLong(1) == y.getLong(1), s"n_chars doc ${x.getLong(0)}")
        assert(x.getLong(2) == y.getLong(2), s"n_tokens doc ${x.getLong(0)}")
        (3 to 6).foreach { i =>
          assert(x.getDouble(i) == y.getDouble(i),
            s"col $i doc ${x.getLong(0)}: ${x.getDouble(i)} vs ${y.getDouble(i)}")
        }
      }
    }
  }

  test("fused token-class kernel == regexp Column twin (corpus + edge cases)") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions
    val edge = Seq(
      (1L, ""), (2L, "   "), (3L, "\tab12cd!"), (4L, "a1b2 c3!d4  x"),
      (5L, "é🎉e 123abc... 4,5"), (6L, "\fverttab\rret\n"),
      (7L, "ONLY-upper_lower 000111 ..."))
      .toDF("doc_id", "text")
    Seq(Tables.documents(spark, dir), edge).foreach { docs =>
      val rows = docs.select(
        TextFunctions.tokenClassProfile(col("text")).as("f"),
        TextFunctions.tokenClassProfileHof(col("text")).as("h"),
        col("doc_id")).collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1),
          s"doc ${r.getLong(2)}: ${r.getSeq[Long](0)} vs ${r.getSeq[Long](1)}")
      }
    }
  }

  test("fused quality score == Column twin on the corpus") {
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions
    val docs = Tables.documents(spark, dir)
    val rows = docs.select(
      TextFunctions.qualityScore(col("text"), TextAnalysis.defaultStopwords).as("f"),
      TextFunctions.qualityScoreHof(col("text"), TextAnalysis.defaultStopwords).as("h"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }
}
