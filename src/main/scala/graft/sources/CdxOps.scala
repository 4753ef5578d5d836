package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** CDX capture-index queries — the other half of archive ingestion
  * (next to [[WarcOps]]): before touching 100 TB of WARC payload, a
  * pipeline plans its reads against the capture index (CDXJ lines:
  * `<SURT urlkey> <timestamp14> <JSON>` — the format Common Crawl and
  * the Wayback machine publish). The two canonical index queries are
  * "latest good capture per URL" (what to fetch) and "revisit
  * collapse" (how many captures carry distinct content).
  *
  * The zero-egress fixture has no index files, so CDXJ lines are
  * PLANTED from `documents` arithmetic — three captures per document
  * (a 301, a 200, and a final capture that is a 404 every 9th doc and
  * a PDF every 10th), every 4th document's captures sharing one digest
  * (the revisit convention). The SURT urlkey is computed by a REAL
  * host-reversal over the URL, the member blob is re-split and the
  * JSON column re-parsed with `from_json` — the engine round-trips;
  * the DuckDB oracle computes the closed form directly.
  *
  * Scale: line building, SURT, and JSON parse are map-side codegen;
  * the member assembly is host-grain (the grain index shards are
  * written at); the latest-capture window partitions by urlkey — the
  * natural key, uniform by construction (captures per URL is bounded
  * by crawl policy, not corpus size). No corpus-grain wide shuffle.
  */
object CdxOps {

  private val captureSchema = StructType(Seq(
    StructField("url", StringType), StructField("mime", StringType),
    StructField("status", StringType), StructField("digest", StringType),
    StructField("length", LongType)))

  /** SURT (Sort-friendly URI Reordering Transform) of a URL's host +
    * path: `com,example)/path` — real reversal of the host labels, the
    * transformation every CDX writer runs.
    */
  private[graft] def surtOf(url: Column): Column = {
    val host = regexp_extract(url, "^[a-z]+://([^/]+)", 1)
    val path = regexp_extract(url, "^[a-z]+://[^/]+(/.*)$", 1)
    concat(array_join(reverse(split(host, "\\.")), ","), lit(")"), path)
  }

  /** Planted capture rows: three per document, CDXJ-rendered. */
  private[graft] def plantedCaptures(docs: DataFrame): DataFrame = {
    val url = concat(lit("https://"), col("source"), lit(".example/"),
      col("lang"), lit("/p"), col("doc_id").cast("string"))
    val withCap = docs
      .select(col("doc_id"), col("source"), col("lang"), col("text"),
        col("n_chars"), url.as("url"))
      .withColumn("c", explode(sequence(lit(0), lit(2))))
    val status = when(col("c") === 0, lit("301"))
      .when(col("c") === 2 && col("doc_id") % 9 === 0, lit("404"))
      .otherwise(lit("200"))
    val mime = when(col("c") === 2 && col("doc_id") % 10 === 0,
      lit("application/pdf")).otherwise(lit("text/html"))
    // every 4th doc's captures share one digest — the revisit plant
    val digestSalt = when(col("doc_id") % 4 === 0, lit("1"))
      .otherwise(col("c").cast("string"))
    val ts = concat(lit("202601"),
      lpad((col("doc_id") % 28 + 1).cast("string"), 2, "0"),
      lpad((col("c") * 8).cast("string"), 2, "0"), lit("0000"))
    withCap.select(
      col("doc_id"), col("source"),
      surtOf(col("url")).as("urlkey"), col("c"), ts.as("ts"),
      to_json(struct(
        col("url"), mime.as("mime"), status.as("status"),
        md5(concat(col("text"), digestSalt)).as("digest"),
        (col("n_chars") + col("c")).cast("long").as("length"))).as("meta"))
  }

  /** CDXJ shards: lines sorted (urlkey, ts), one shard per (host,
    * 1000-doc chunk) — like [[WarcOps.warcMembersOf]], a shard row must
    * never scale with a host's page count (real indexes split into
    * bounded cdx-NNNNN files); the chunk key bounds the collect_list,
    * and the parse re-splits lines, so downstream consumers and the
    * oracle see records, not shards.
    */
  private[graft] def cdxShardsOf(docs: DataFrame): DataFrame =
    plantedCaptures(docs)
      .select(col("source").as("host"), col("doc_id"), col("urlkey"),
        col("ts"),
        concat(col("urlkey"), lit(" "), col("ts"), lit(" "), col("meta"))
          .as("line"))
      .groupBy(col("host"), expr("doc_id div 1000").as("__chunk"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("urlkey"), col("ts"),
          col("line")))), s => s.getField("line")), "\n").as("cdx"))
      .select(col("host"), col("cdx"))

  /** Re-split shards into lines and parse: urlkey and timestamp are the
    * two space-delimited head fields, the rest is JSON (`from_json`).
    */
  private[graft] def cdxParseOn(shards: DataFrame): DataFrame = {
    val lines = shards.select(
      explode(split(col("cdx"), "\n")).as("line"))
    val urlkey = substring_index(col("line"), " ", 1)
    val ts = substring_index(substring_index(col("line"), " ", 2), " ", -1)
    val json = col("line").substr(
      length(urlkey) + length(ts) + lit(3),
      length(col("line")) - length(urlkey) - length(ts) - lit(2))
    lines
      .select(urlkey.as("urlkey"), ts.as("ts"),
        from_json(json, captureSchema).as("m"))
      .select(col("urlkey"), col("ts"), col("m.url").as("url"),
        col("m.mime").as("mime"), col("m.status").as("status"),
        col("m.digest").as("digest"), col("m.length").as("length"))
  }

  /** `q_cdx_latest`: the fetch plan — latest 200 text/html capture per
    * urlkey. The winner is a MAX-STRUCT AGGREGATE at urlkey grain, not
    * a rank window (r17, VERDICT r16 task 7): real archives put
    * millions of captures on hot homepages, and a row_number window
    * hands ALL of a key's captures to one task — the max-struct form is
    * map-side combinable (partial_max below the exchange), so a hot
    * urlkey costs one struct per partition (the span-dedup
    * first-arrival discipline). Fixed-width digit timestamps make the
    * lexicographic struct order the numeric recency order; ties cannot
    * arise (timestamps differ by construction at second grain, as in
    * real indexes) and would fall deterministically to (url, digest,
    * length) if they ever did. Same winner as the window form — the
    * oracle is unchanged.
    */
  def cdxLatest(spark: SparkSession, dir: String): DataFrame =
    latestOf(cdxParseOn(cdxShardsOf(Tables.documents(spark, dir))))

  /** The hot-key-immune latest-capture core over any parsed capture
    * frame — exposed so the spec can pin plan shape + exactness under a
    * planted million-capture urlkey.
    */
  private[graft] def latestOf(parsed: DataFrame): DataFrame =
    parsed
      .filter(col("status") === "200" && col("mime") === "text/html")
      .groupBy(col("urlkey"))
      .agg(max(struct(col("ts"), col("url"), col("digest"),
        col("length"))).as("f"))
      .select(col("urlkey"), col("f.url").as("url"), col("f.ts").as("ts"),
        col("f.digest").as("digest"), col("f.length").as("length"))
      .orderBy(col("urlkey").asc)

  /** `q_cdx_index`: the INDEXER — build CDXJ capture records FROM the
    * parsed WARC members (how capture indexes actually come to exist:
    * fetch → archive → index → plan; [[cdxLatest]] consumes what this
    * step produces). Only length-valid records are indexed (a truncated
    * member never becomes a capture); urlkey is the real SURT, the
    * timestamp folds down from the WARC-Date header, the digest is the
    * payload hash. Entirely map-side after the member re-split.
    */
  def cdxIndexFromWarc(spark: SparkSession, dir: String): DataFrame = {
    val parsed = WarcOps.warcParseOn(
      WarcOps.warcMembersOf(Tables.documents(spark, dir)))
      .filter(col("len_ok") === 1L)
    parsed.select(
      surtOf(col("url")).as("urlkey"),
      concat(lit("2026"), substring(col("warc_date"), 6, 2),
        substring(col("warc_date"), 9, 2), substring(col("warc_date"), 12, 2),
        lit("0000")).as("ts"),
      col("url"), col("http_status").as("status"),
      md5(col("payload")).as("digest"),
      col("payload_len").as("length"))
      .orderBy(col("urlkey").asc)
  }

  /** `q_cdx_revisit`: revisit collapse — per urlkey, how many good
    * captures exist and how many distinct payloads they carry (the
    * dedup ratio an archive reader plans storage against).
    */
  def cdxRevisit(spark: SparkSession, dir: String): DataFrame =
    cdxParseOn(cdxShardsOf(Tables.documents(spark, dir)))
      .filter(col("status") === "200" && col("mime") === "text/html")
      .groupBy(col("urlkey"))
      .agg(count(lit(1)).as("n_captures"),
        countDistinct(col("digest")).as("n_unique"))
      .withColumn("has_revisit",
        (col("n_unique") < col("n_captures")).cast("long"))
      .orderBy(col("urlkey").asc)
}
