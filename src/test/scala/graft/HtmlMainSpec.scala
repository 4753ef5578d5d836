package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextOps

/** Main-content extraction: boilerplate blocks must never survive, the
  * two closed-form gates must fire both ways on the planted corpus, and
  * the extracted surface must be tag-free prose.
  */
class HtmlMainSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.Sf

  private lazy val main = TextOps.htmlMain(spark, sf).localCheckpoint()

  test("boilerplate blocks (nav / share / footer) never reach main_text") {
    val bad = main.filter(
      col("main_text").contains("home about products") ||
        col("main_text").contains("copyright corpus") ||
        col("main_text").rlike("(^| )share( |$)")).count()
    assert(bad == 0L)
  }

  test("extracted surface is tag-free") {
    assert(main.filter(col("main_text").contains("<")).count() == 0L)
  }

  test("link-density gate fires both ways: spammed blocks drop, content survives") {
    // % 5 docs carry six boilerplate links in the second content block —
    // 5·link_chars always exceeds the block's text chars, so it drops
    val spammedKeptBoth = main
      .filter(col("doc_id") % 5 === 0 && col("n_kept") >= 2).count()
    assert(spammedKeptBoth == 0L, "a spammed block survived the fence")
    // and clean docs keep both content halves
    val fullKeeps = main.filter(col("n_kept") === 2).count()
    assert(fullKeeps > 0L, "no document kept both content blocks")
  }

  test("single inline link passes the fence (the %3 plant is not collateral)") {
    val linkedKept = main.filter(
      col("doc_id") % 3 === 0 && col("doc_id") % 5 =!= 0 &&
        col("n_kept") === 2).count()
    assert(linkedKept > 0L, "one inline link already breaches the fence")
  }

  test("n_blocks counts every non-empty block of the planted page") {
    // nav + 2 content + share + footer = 5 per page
    assert(main.filter(col("n_blocks") =!= 5).count() == 0L)
  }
}
