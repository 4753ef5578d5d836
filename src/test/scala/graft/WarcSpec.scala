package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Tables, WarcOps}

/** WARC member round-trip (ISO 28500): the parse must recover exactly
  * one record per planted document, the length gate must fire both
  * ways, and WET extraction must return the document text with the
  * envelope and markup gone.
  */
class WarcSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.Sf

  private lazy val docs = Tables.documents(spark, sf).localCheckpoint()
  private lazy val parsed = WarcOps.warcParse(spark, sf).localCheckpoint()

  test("one parsed record per document, one member per host") {
    assert(parsed.count() == docs.count())
    assert(WarcOps.warcMembersOf(docs).count() ==
      docs.select(col("source")).distinct().count())
  }

  test("headers parse back to the planted values") {
    val r = parsed.filter(col("url").endsWith("/p1")).head()
    assert(r.getAs[String]("warc_type") == "response")
    assert(r.getAs[String]("http_status") == "200")
    assert(r.getAs[String]("warc_date") == "2026-01-02T01:00:00Z")
    assert(r.getAs[String]("rec_id").startsWith("<urn:md5:"))
  }

  test("the Content-Length gate fires both ways, exactly on % 13 == 7") {
    val badUrls = parsed.filter(col("len_ok") === 0L)
      .select(col("url")).collect().map(_.getString(0)).toSet
    val expected = docs.filter(col("doc_id") % 13 === 7)
      .select(concat(lit("https://"), col("source"), lit(".example/"),
        col("lang"), lit("/p"), col("doc_id").cast("string")))
      .collect().map(_.getString(0)).toSet
    assert(badUrls == expected)
    assert(badUrls.nonEmpty, "corruption plant missing from fixture slice")
    // and on those records the declared length overstates by exactly one
    val off = parsed.filter(col("len_ok") === 0L)
      .filter(col("content_length") =!= col("payload_len") + 1L).count()
    assert(off == 0L)
  }

  test("WET keeps only length-valid records and recovers the text") {
    val wet = WarcOps.warcWet(spark, sf).localCheckpoint()
    assert(wet.count() == docs.filter(col("doc_id") % 13 =!= 7).count())
    // markup and envelope are gone
    assert(wet.filter(col("wet_text").contains("<") ||
      col("wet_text").contains("HTTP/1.1")).count() == 0L)
    // the document text is recovered verbatim after the planted title
    val joined = wet
      .withColumn("doc_id",
        regexp_extract(col("url"), "/p([0-9]+)$", 1).cast("long"))
      .join(docs.select(col("doc_id"), col("source"), col("text")), "doc_id")
      .filter(col("wet_text") =!= concat(col("source"), lit("/p"),
        col("doc_id").cast("string"), lit(" "), col("text")))
    assert(joined.count() == 0L)
  }
}
