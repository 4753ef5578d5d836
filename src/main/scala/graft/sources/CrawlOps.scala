package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One crawl target (url + nav title), ref `{title, link}` dicts
  * (`Crawling.py:27`).
  */
case class CrawlTarget(url: String, title: String)

/** One fetched page record, ref `{url, title, text}` (`Crawling.py:47`). */
case class PageRecord(url: String, title: String, html: String)

/** The crawler as a distributed ingest connector — ref `crawlData()`
  * (`Crawling.py:33-51`): sequential `requests.get` loop → per-partition
  * fetch over a `Dataset[CrawlTarget]`.
  *
  * The fetcher is injected as a FACTORY (`mkFetch`), constructed INSIDE
  * `mapPartitions`: the factory closure ships to executors, and each task
  * builds its own client — the actual per-partition connection-pool
  * boundary (a prebuilt HTTP client would not serialize). The build env is
  * zero-egress, so tests inject a deterministic fake; production injects a
  * real client factory.
  *
  * Downstream of the fetch, the chain follows the reference order exactly:
  * container extract (`Crawling.py:41-44`) → nonempty filter (`:43`) →
  * 6000-char truncate (`:45`) → blank-line collapse (`:46`) → record
  * projection (`:47`). The default extractor is the fixture-grade regexp
  * ([[graft.operators.TextOps.MarkdownBoxRegex]] — a DOM-less capture that
  * stops at the first close tag); real nested markup swaps in a jsoup UDF
  * through the same `extract` slot.
  */
object CrawlOps {

  /** Distributed page fetch: the connector boundary. */
  def fetchPages(targets: Dataset[CrawlTarget],
      mkFetch: () => String => String): Dataset[PageRecord] = {
    import targets.sparkSession.implicits._
    targets.mapPartitions { it =>
      val fetch = mkFetch() // one fetcher per partition/task
      it.map(t => PageRecord(t.url, t.title, fetch(t.url)))
    }
  }

  /** Default container extractor — fixture-grade regexp capture. */
  def regexpExtract(html: Column): Column =
    regexp_extract(html, graft.operators.TextOps.MarkdownBoxRegex, 1)

  /** Fetched pages → clean document records, the full ingest chain of
    * `crawlData()` as one declarative plan. `extract` is the DOM boundary
    * (jsoup UDF for real nested markup).
    */
  def toDocuments(pages: Dataset[PageRecord], maxChars: Int = 6000,
      extract: Column => Column = regexpExtract): DataFrame =
    pages.toDF()
      .select(col("url"), col("title"), extract(col("html")).as("body"))
      .filter(length(trim(col("body"))) > 0)
      .select(col("url"), col("title"),
        // Reference order: truncate THEN collapse (Crawling.py:45 then :46)
        regexp_replace(substring(col("body"), 1, maxChars), "\n+", "\n").as("text"))

  /** End-to-end ingest: targets → fetch → documents (the `upsert_data()`
    * input, ref `TencentVDB.py:63-78`; the upsert itself is
    * [[CatalogOps.upsert]]).
    */
  def crawl(spark: SparkSession, targets: Seq[CrawlTarget],
      mkFetch: () => String => String): DataFrame = {
    import spark.implicits._
    toDocuments(fetchPages(targets.toDS(), mkFetch))
  }
}
