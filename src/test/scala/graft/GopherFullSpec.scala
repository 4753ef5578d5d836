package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextAnalysisOps

/** The complete Gopher A1.1 repetition battery: every one of the
  * thirteen published gates must be EXERCISED both ways by the planted
  * fixture structure (a gate that never fires — or never passes — is
  * untested machinery), and the coverage metric must honor the
  * no-double-count rule on a hand-built document.
  */
class GopherFullSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.Sf

  private lazy val full = TextAnalysisOps.gopherRepetitionFull(spark, sf)
    .localCheckpoint()

  private val flags = Seq("r_dup_line", "r_dup_para", "r_line_chars",
    "r_para_chars", "r_top2", "r_top3", "r_top4",
    "r_dup5", "r_dup6", "r_dup7", "r_dup8", "r_dup9", "r_dup10")

  test("every gate takes BOTH values on the planted fixture") {
    val row = full.select(flags.flatMap(f =>
      Seq(min(col(f)).as(s"min_$f"), max(col(f)).as(s"max_$f"))): _*)
      .head()
    flags.zipWithIndex.foreach { case (f, i) =>
      assert(row.getLong(2 * i) == 0L, s"$f never fails on the fixture")
      assert(row.getLong(2 * i + 1) == 1L, s"$f never passes on the fixture")
    }
  }

  test("keep is the conjunction of all thirteen gates") {
    val bad = full.filter(
      col("keep") =!= flags.map(col).reduce(_ * _)).count()
    assert(bad == 0L)
  }

  test("coverage honors the no-double-count rule on a hand document") {
    import spark.implicits._
    // "a b c d e a b c d e a b c d e" — every 5-gram in the first ten
    // positions repeats 5 positions later, so dup 5-grams cover ALL 15
    // tokens; naive per-occurrence counting would overshoot (9 dup grams
    // x 5 tokens = 45 positions against 15 real ones)
    val doc = Seq((1L, ("a b c d e " * 3).trim)).toDF("doc_id", "text")
    val r = TextAnalysisOps.gopherRepetitionFullOn(doc)
      .select(col("dup5_chars"), col("w_chars")).head()
    assert(r.getLong(1) == 15L)
    assert(r.getLong(0) == 15L, s"covered=${r.getLong(0)} — union broken")
  }

  test("no repetition → zero coverage, all gates pass") {
    import spark.implicits._
    // long enough that a single-occurrence top n-gram stays under the
    // 20/18/16% fences (a 10-token doc fails r_top2 honestly: one
    // 11-char 2-gram is already >20% of its chars)
    val doc = Seq((1L, (1 to 60).map(i => f"tok$i%02d").mkString(" ")))
      .toDF("doc_id", "text")
    val r = TextAnalysisOps.gopherRepetitionFullOn(doc)
    val row = r.select((Seq("dup5_chars", "dup6_chars", "dup7_chars",
      "dup8_chars", "dup9_chars", "dup10_chars", "keep").map(col)): _*)
      .head()
    (0 to 5).foreach(i => assert(row.getLong(i) == 0L))
    assert(row.getLong(6) == 1L)
  }

  test("partial overlap: dup grams at distance < n merge their spans") {
    import spark.implicits._
    // stream: x1..x6 x1..x6 — 6-grams [x1..x6] at positions 1 and 7
    // duplicate; spans [1,6] and [7,12] touch but don't overlap: all 12
    // tokens covered, chars = 2 x (2*6) = 24
    val doc = Seq((1L, "x1 x2 x3 x4 x5 x6 x1 x2 x3 x4 x5 x6"))
      .toDF("doc_id", "text")
    val r = TextAnalysisOps.gopherRepetitionFullOn(doc)
      .select(col("dup6_chars"), col("w_chars")).head()
    assert(r.getLong(0) == 24L && r.getLong(1) == 24L)
  }
}
