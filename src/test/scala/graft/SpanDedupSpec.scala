package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.DedupOps

/** C4's three-sentence-span dedup (Raffel et al. 2020 §2.2): first
  * occurrence stays, later occurrences are removed, and a document's
  * retained text is exactly its sentences not covered by any removed
  * span — pinned on hand documents (cross-doc, within-doc, full-page)
  * and on the planted fixture (single boilerplate survivor).
  */
class SpanDedupSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def run(docs: Seq[(Long, String)]) =
    DedupOps.spanDedupOn(docs.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap

  test("cross-document span: the later page loses the shared triple only") {
    val out = run(Seq(
      (1L, "a\nb\nc\nd"),
      (2L, "x\nb\nc\nd")))
    assert(out(1L) === ((4L, 0L, "a\nb\nc\nd")))
    // doc 2's (b,c,d) span at pos 2 repeats doc 1's pos 2 → sentences
    // 2..4 removed; its unique head survives
    assert(out(2L) === ((4L, 3L, "x")))
  }

  test("within-document repeat: the copy goes, the original stays") {
    val out = run(Seq((1L, "p\nq\nr\ns\np\nq\nr")))
    assert(out(1L) === ((7L, 3L, "p\nq\nr\ns")))
  }

  test("identical pages: the later one is removed entirely (span cover union)") {
    val out = run(Seq(
      (1L, "a\nb\nc\nd\ne"),
      (2L, "a\nb\nc\nd\ne")))
    assert(out(1L) === ((5L, 0L, "a\nb\nc\nd\ne")))
    // every span of doc 2 is a later occurrence; their covers union to
    // all five positions — no double counting, no stragglers
    assert(out(2L) === ((5L, 5L, "")))
  }

  test("short pages carry no spans and are never touched") {
    val out = run(Seq((1L, "a\nb"), (2L, "a\nb")))
    assert(out(1L) === ((2L, 0L, "a\nb")))
    assert(out(2L) === ((2L, 0L, "a\nb")))
  }

  test("hot-span skew: 50% boilerplate carriers stay exact; first arrival is an aggregate, not a window") {
    // the adversarial web-corpus shape (r17 probe `DedupScale spanskew`:
    // 10× occurrence mass costs 1.3× wall-clock): ONE span hash carried
    // by half the corpus must stay correct AND keep the skew-immune plan
    val boiler = "b one.\nb two.\nb three."
    val docs = (0L until 200L).map { id =>
      val own = s"u$id a.\nu$id b.\nu$id c."
      (id, if (id % 2 == 0) s"$own\n$boiler" else own)
    }
    val out = run(docs)
    // first arrival (doc 0) keeps everything; every other even doc loses
    // exactly the three boilerplate sentences
    assert(out(0L) === ((6L, 0L, s"u0 a.\nu0 b.\nu0 c.\n$boiler")))
    (2L until 200L by 2).foreach { id =>
      assert(out(id) === ((6L, 3L, s"u$id a.\nu$id b.\nu$id c.")), s"doc $id")
    }
    (1L until 200L by 2).foreach(id => assert(out(id)._2 === 0L))
    // regression pin on the PLAN: the first-arrival must stay a
    // map-side-combinable aggregate (partial_min below the exchange) —
    // a row_number window here would serialize the hot hash's partition
    val plan = DedupOps.spanDedupOn(docs.toDF("doc_id", "text"))
      .queryExecution.executedPlan.toString()
    assert(plan.contains("partial_min"), plan)
    assert(!plan.contains("row_number"), plan)
  }

  test("planted fixture: exactly one page keeps the shared cookie banner") {
    val full = DedupOps.dedupSpan3(spark, TestSpark.Sf).localCheckpoint()
    val carriers = full.filter(col("kept_text").contains("we use cookies")).count()
    assert(carriers === 1L)
    // both sides: untouched pages exist, and so do pages losing spans
    val agg = full.agg(min(col("n_removed_sents")), max(col("n_removed_sents"))).head()
    assert(agg.getLong(0) === 0L && agg.getLong(1) > 0L)
    // removal never exceeds the page and kept text is consistent with it
    val bad = full.filter(col("n_removed_sents") > col("n_sents") ||
      (col("n_removed_sents") === 0L) =!= (size(split(col("kept_text"), "\n"))
        .cast("long") === col("n_sents"))).count()
    assert(bad === 0L)
  }
}
