package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{CdxOps, Tables}

/** CDX capture-index queries: the SURT transform must really reverse
  * host labels, the parse must recover every planted capture, and the
  * latest/revisit plans must land on the closed-form winners.
  */
class CdxSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.Sf

  private lazy val docs = Tables.documents(spark, sf).localCheckpoint()

  test("SURT reverses host labels and keeps the path") {
    import spark.implicits._
    val out = Seq("https://www.news.example/a/p1")
      .toDF("url").select(CdxOps.surtOf(col("url")).as("k"))
      .head().getString(0)
    assert(out == "example,news,www)/a/p1")
  }

  test("parse recovers three captures per document") {
    val parsed = CdxOps.cdxParseOn(CdxOps.cdxShardsOf(docs))
    assert(parsed.count() == 3L * docs.count())
    assert(parsed.filter(col("url").isNull || col("digest").isNull ||
      col("length").isNull).count() == 0L)
  }

  test("latest picks the newest good capture and both fallbacks fire") {
    val latest = CdxOps.cdxLatest(spark, sf).localCheckpoint()
    assert(latest.count() == docs.count())
    val byId = latest.withColumn("doc_id",
      regexp_extract(col("urlkey"), "/p([0-9]+)$", 1).cast("long"))
    // a %9 doc (404 third capture) and a %10 doc (pdf) fall back to 08h
    assert(byId.filter(col("doc_id") % 9 === 0 &&
      !col("ts").substr(9, 2).equalTo("08")).count() == 0L)
    assert(byId.filter(col("doc_id") % 10 === 0 &&
      !col("ts").substr(9, 2).equalTo("08")).count() == 0L)
    // everyone else takes the 16h capture
    assert(byId.filter(col("doc_id") % 9 =!= 0 && col("doc_id") % 10 =!= 0 &&
      !col("ts").substr(9, 2).equalTo("16")).count() == 0L)
  }

  test("indexer: one capture per valid WARC record, corrupt rows out") {
    val idx = CdxOps.cdxIndexFromWarc(spark, sf).localCheckpoint()
    assert(idx.count() == docs.filter(col("doc_id") % 13 =!= 7).count())
    // timestamps fold down from WARC-Date: 14 digits, 2026-01 prefix
    assert(idx.filter(!col("ts").rlike("^202601[0-9]{8}$")).count() == 0L)
    // digest is the payload hash: identical docs (if any) share digests,
    // and every digest is a 32-char hex md5
    assert(idx.filter(!col("digest").rlike("^[0-9a-f]{32}$")).count() == 0L)
    assert(idx.filter(col("status") =!= "200").count() == 0L)
  }

  test("hot urlkey: 100k captures on one key stay exact; latest is an aggregate, not a window") {
    import spark.implicits._
    // the real-archive pathology (r17): a homepage carrying a capture
    // per crawl — one urlkey with 100k captures next to ordinary keys
    val hot = (0 until 100000).map { i =>
      ("com,example)/", f"20260101${i % 24}%02d${i % 60}%02d${i / 1440}%02d",
        s"https://example.com/?v=$i", "text/html", "200", f"d$i%032d", 100L + i)
    }
    val cold = (0 until 50).map { i =>
      (s"com,site$i)/", "20260101000000", s"https://site$i.com/",
        "text/html", "200", f"c$i%032d", 10L)
    }
    val parsed = (hot ++ cold)
      .toDF("urlkey", "ts", "url", "mime", "status", "digest", "length")
    val out = CdxOps.latestOf(parsed).localCheckpoint()
    assert(out.count() == 51L)
    // the hot key's winner is the lexicographically-max timestamp —
    // recompute it driver-side and compare the whole row
    val wantTs = hot.map(_._2).max
    val wantRow = hot.filter(_._2 == wantTs).map(h => (h._3, h._6, h._7)).max
    val got = out.filter(col("urlkey") === "com,example)/").head()
    assert(got.getString(2) == wantTs)
    assert((got.getString(1), got.getString(3), got.getLong(4)) == wantRow)
    // plan pin: partial_max below the exchange, never a rank window —
    // a row_number here would serialize the hot key's 100k rows
    val plan = CdxOps.latestOf(parsed).queryExecution.executedPlan.toString()
    assert(plan.contains("partial_max"), plan)
    assert(!plan.contains("row_number"), plan)
  }

  test("revisit collapse counts distinct digests, both sides planted") {
    val rev = CdxOps.cdxRevisit(spark, sf).localCheckpoint()
    val withId = rev.withColumn("doc_id",
      regexp_extract(col("urlkey"), "/p([0-9]+)$", 1).cast("long"))
    // the %4 plant with two good captures is a revisit
    assert(withId.filter(col("doc_id") % 4 === 0 && col("doc_id") % 9 =!= 0 &&
      col("doc_id") % 10 =!= 0 && col("has_revisit") =!= 1L).count() == 0L)
    // non-%4 docs with two captures carry two distinct digests
    assert(withId.filter(col("doc_id") % 4 =!= 0 && col("n_captures") === 2L &&
      col("n_unique") =!= 2L).count() == 0L)
    assert(rev.filter(col("has_revisit") === 1L).count() > 0L)
    assert(rev.filter(col("has_revisit") === 0L).count() > 0L)
  }
}
