package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** The reference's RAG dataflow, re-expressed as declarative DataFrame
  * queries over the `documents` fixture (the crawl-corpus analog).
  *
  * Covers the full ingest chain (ref `Crawling.py:36-48` →
  * `TencentVDB.py:74-79`): project `{url,title,text}`, drop empty bodies,
  * collapse blank lines, truncate, upsert-by-id — and the full answer-shaping
  * chain (ref `main_server.py:46-51,142-143,164-175`): flatten list-of-lists
  * results, order-sensitive context concat, prompt assembly, citation format.
  *
  * Scale notes: every query here is either a pure per-row projection (no
  * shuffle at any scale) or a single keyed aggregation/window (one shuffle on
  * the group key). Nothing collects to the driver; nothing is a UDF — all
  * whole-stage-codegen built-ins, so filters/projections reach the parquet
  * scan (PushedFilters / ReadSchema pruning).
  */
object TextOps {

  private val UrlBase = "https://corpus.local/"

  /** Shared container-extraction pattern (ref `div.J-markdown-box`,
    * `Crawling.py:41`): dotall so multi-line bodies capture; DOM-less, so
    * it stops at the first close tag — fixture-grade, with a jsoup UDF as
    * the real-markup replacement (see [[graft.sources.CrawlOps]]).
    */
  private[graft] val MarkdownBoxRegex: String =
    "(?s)<div class=\"J-markdown-box\">(.*?)</div>"

  /** Full corpus scan — ref `crawlData()` return consumed at
    * `TencentVDB.py:71`. Plain pass-through so column pruning/pushdown stay
    * with Catalyst.
    */
  def scanDocuments(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).orderBy(col("doc_id").asc)

  /** Record projection `{url, title, text}` — ref `Crawling.py:47`.
    * Narrow column set → parquet ReadSchema prunes to 3 columns.
    */
  def projectFields(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang").as("title"),
        substring(col("text"), 1, 60).as("body"))
      .orderBy(col("doc_id").asc)

  /** Drop pages with no body — ref `Crawling.py:43`
    * (`if nodes is not None and len(nodes)>0`).
    */
  def filterNonempty(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(col("text").isNotNull && length(trim(col("text"))) > 0)
      .select(col("doc_id"), col("n_chars"))
      .orderBy(col("doc_id").asc)

  /** Metadata filter — the declared FilterIndex surface standalone
    * (ref `TencentVDB.py:48`, design rule `:31-32`). The equality predicate
    * is pushed into the parquet scan (PushedFilters), which at scale replaces
    * the reference's FILTER index via partition/row-group pruning.
    */
  def filterMetadata(spark: SparkSession, dir: String, lang: String = "en"): DataFrame =
    Tables.documents(spark, dir)
      .filter(col("lang") === lang)
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id").asc)

  /** Collapse blank-line runs — ref `re.sub('\n+','\n',text)`
    * (`Crawling.py:46`). The fixture text has no newlines, so we first
    * rebuild the ref's dirty-input shape (word separators → double newlines)
    * and then apply the reference's exact cleanup regex.
    */
  def cleanText(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        regexp_replace(regexp_replace(col("text"), " ", "\n\n"), "\n+", "\n")
          .as("cleaned"))
      .select(col("doc_id"), substring(col("cleaned"), 1, 80).as("cleaned"),
        length(col("cleaned")).as("clean_len"))
      .orderBy(col("doc_id").asc)

  /** Regex pattern literals of the PII families — ONE definition shared
    * by the engine and (as the same literal text) the DuckDB oracle.
    * Both engines' regex dialects (java.util.regex, RE2) agree on every
    * construct used: character classes, bounded repetition, `\b`, and
    * non-capturing groups.
    */
  private[graft] val PiiEmail = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[graft] val PiiIp = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"
  private[graft] val PiiPhone = "\\+\\d{1,3}[ -]\\d{3}[ -]\\d{4}\\b"

  /** PII REDACTION (`q_pii_redact`) — the privacy scrub every published
    * training-data pipeline runs before anything else sees the text (C4
    * strips pages on bad-word lines; Dolma/CCNet-class pipelines mask
    * emails / IPs / phone numbers): emails, IPv4 addresses, and
    * international-format phone numbers are replaced with typed
    * placeholder tokens, with per-category counts kept for the corpus
    * privacy report. Replacement order is fixed (email → ip → phone) so
    * overlapping matches resolve identically everywhere.
    *
    * The fixture corpus is synthetic word soup with no organic PII, so
    * the query PLANTS it deterministically (the dedup-fixture
    * discipline): doc_id % 7 == 0 appends an email, % 11 == 0 an IPv4,
    * % 13 == 0 a phone — both engines build the same corpus from the
    * same arithmetic, so redaction has real positives AND untouched
    * negatives to get wrong.
    *
    * Scale: one map-side projection — three codegen'd regexes per row,
    * no shuffle, no UDF; the 100 TB scrub is scan-bound by construction.
    */
  def piiRedact(spark: SparkSession, dir: String): DataFrame =
    piiRedactOn(piiPlanted(spark, dir))

  /** The deterministic PII planting both engines rebuild from the same
    * arithmetic — shared by [[piiRedact]] and [[piiRedactCc]].
    */
  private def piiPlanted(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(col("doc_id"),
      concat(col("text"),
        when(col("doc_id") % 7 === 0,
          concat(lit(" contact u"), col("doc_id"), lit("@example.com")))
          .otherwise(lit("")),
        when(col("doc_id") % 11 === 0,
          concat(lit(" from 10.0."), col("doc_id") % 256, lit("."),
            col("doc_id") % 100)).otherwise(lit("")),
        when(col("doc_id") % 13 === 0,
          concat(lit(" call +1 555 "), lpad((col("doc_id") % 10000).cast("string"),
            4, "0"))).otherwise(lit(""))).as("text"))

  /** Parametric core: (doc_id, text) in; (doc_id, redacted, n_emails,
    * n_ips, n_phones) out, ordered by doc_id.
    */
  private[graft] def piiRedactOn(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        regexp_replace(regexp_replace(regexp_replace(col("text"),
          PiiEmail, "<EMAIL>"), PiiIp, "<IP>"), PiiPhone, "<PHONE>")
          .as("redacted"),
        size(regexp_extract_all(col("text"), lit(PiiEmail), lit(0)))
          .cast("long").as("n_emails"),
        size(regexp_extract_all(
          regexp_replace(col("text"), PiiEmail, "<EMAIL>"),
          lit(PiiIp), lit(0))).cast("long").as("n_ips"),
        size(regexp_extract_all(
          regexp_replace(regexp_replace(col("text"), PiiEmail, "<EMAIL>"),
            PiiIp, "<IP>"),
          lit(PiiPhone), lit(0))).cast("long").as("n_phones"))
      .orderBy(col("doc_id").asc)

  /** 16-contiguous-digit card-number candidates. */
  private[graft] val PiiCard = "\\b\\d{16}\\b"

  /** Luhn (ISO/IEC 7812 mod-10) validity of an all-digit string: from the
    * right, double every second digit (subtract 9 past 9), sum, check
    * `mod 10 == 0`. Pure integer arithmetic over `sequence` — closed form,
    * so the DuckDB oracle mirrors it EXACTLY (the reason VERDICT r14
    * singles cards out among PII heuristics).
    */
  private[graft] def luhnOk(c: Column): Column =
    pmod(aggregate(sequence(lit(1), length(c)), lit(0L), (acc, i) => {
      val d = c.substr(length(c) - i + 1, lit(1)).cast("long")
      acc + when(i % 2 === 0,
        when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)).otherwise(d)
    }), lit(10L)) === 0L

  /** PII redaction extended with the CREDIT-CARD stage (`q_pii_redact_cc`,
    * VERDICT r14 §6): candidates are 16-digit runs, but redaction fires
    * only on Luhn-VALID candidates — the filter that keeps order numbers,
    * tracking ids and other random digit runs out of the scrub (a
    * Luhn-failing 16-digit string is a ~10:1 bet it isn't a card).
    *
    * Planting (the [[piiRedact]] discipline, both sides of the gate):
    * doc_id % 17 == 0 appends a VALID card (body from doc_id, check
    * digit computed by the same closed-form Luhn sum), doc_id % 19 == 0
    * (and not % 17) appends the SAME body with the check digit shifted
    * +5 mod 10 — a guaranteed Luhn-failing candidate the regex still
    * catches, so the negative path is exercised, not just absent.
    *
    * The general engine form handles ANY number of candidates per row
    * (`regexp_extract_all` → Luhn `filter` → replacement fold); the
    * planting guarantees ≤ 1 so the oracle can use the single-extract
    * SQL shape. Scale: still one map-side projection — four codegen
    * regex passes plus an integer HOF per row, no shuffle, no UDF.
    */
  def piiRedactCc(spark: SparkSession, dir: String): DataFrame = {
    val body = concat(lit("4"),
      lpad(pmod(col("doc_id") * 1000003L, lit(10000000000000L)).cast("string"),
        14, "0"))
    // body digit at position i from the body's right sits at position
    // i+1 in the full card (check digit occupies position 1), so the
    // doubling parity here is ODD i — shifted once vs [[luhnOk]]
    val s15 = aggregate(sequence(lit(1), lit(15)), lit(0L), (acc, i) => {
      val d = body.substr(length(body) - i + 1, lit(1)).cast("long")
      acc + when(i % 2 === 1,
        when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)).otherwise(d)
    })
    val check = pmod(lit(10L) - pmod(s15, lit(10L)), lit(10L))
    val planted = piiPlanted(spark, dir).select(col("doc_id"),
      concat(col("text"),
        when(col("doc_id") % 17 === 0,
          concat(lit(" card "), body, check.cast("string")))
          .otherwise(lit("")),
        when(col("doc_id") % 19 === 0 && col("doc_id") % 17 =!= 0,
          concat(lit(" ref "), body, pmod(check + 5, lit(10L)).cast("string")))
          .otherwise(lit(""))).as("text"))
    piiRedactCcOn(planted)
  }

  /** Parametric core: the [[piiRedactOn]] chain plus the card stage —
    * (doc_id, redacted, n_emails, n_ips, n_phones, n_cards,
    * n_card_rejected), ordered by doc_id.
    */
  private[graft] def piiRedactCcOn(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        regexp_replace(regexp_replace(regexp_replace(col("text"),
          PiiEmail, "<EMAIL>"), PiiIp, "<IP>"), PiiPhone, "<PHONE>")
          .as("t3"),
        size(regexp_extract_all(col("text"), lit(PiiEmail), lit(0)))
          .cast("long").as("n_emails"),
        size(regexp_extract_all(
          regexp_replace(col("text"), PiiEmail, "<EMAIL>"),
          lit(PiiIp), lit(0))).cast("long").as("n_ips"),
        size(regexp_extract_all(
          regexp_replace(regexp_replace(col("text"), PiiEmail, "<EMAIL>"),
            PiiIp, "<IP>"),
          lit(PiiPhone), lit(0))).cast("long").as("n_phones"))
      .withColumn("cands", regexp_extract_all(col("t3"), lit(PiiCard), lit(0)))
      .withColumn("valid", filter(col("cands"), c => luhnOk(c)))
      .select(col("doc_id"),
        aggregate(col("valid"), col("t3"),
          (acc, c) => replace(acc, c, lit("<CARD>"))).as("redacted"),
        col("n_emails"), col("n_ips"), col("n_phones"),
        size(col("valid")).cast("long").as("n_cards"),
        (size(col("cands")) - size(col("valid"))).cast("long")
          .as("n_card_rejected"))
      .orderBy(col("doc_id").asc)

  /** Unicode normalization (`q_text_normalize`) — the pass that must run
    * BEFORE anything byte-keyed: the same visible string arrives
    * precomposed (é) or decomposed (e + U+0301) from different crawls,
    * and every downstream operator that hashes bytes (exact-dedup
    * digests, MinHash shingles, BM25 terms, feature-hash embeddings)
    * treats the two as different documents unless NFC runs first. Emits
    * the NFC form, the accent-FOLDED form (the diacritic-insensitive
    * match key: résumé ≈ resume), and whether normalization changed
    * anything (the corpus-hygiene signal: a high changed-rate source is
    * shipping decomposed text).
    *
    * The fixture corpus is pure ASCII, so the query PLANTS both cases
    * deterministically: a PRECOMPOSED accent snippet (already NFC —
    * normalization must NOT touch it) and a DECOMPOSED one (combining
    * marks — NFC must compose it; both engines build it from the same
    * code points). Engine side runs the native codegen expressions
    * ([[graft.plans.NfcNormalize]], [[graft.plans.AccentFold]] — ASCII
    * rows return the input object, zero allocation); the oracle runs
    * DuckDB's utf8proc twins (`nfc_normalize`, `strip_accents`) — two
    * independent conformant implementations must agree byte-for-byte.
    *
    * Scale: one map-side projection, no shuffle — normalization of a
    * 100 TB corpus is scan-bound by construction.
    */
  def textNormalize(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
    // explicit code points so source-file encoding can never blur the
    // cases: %3 plants PRECOMPOSED é/ï (U+00E9, U+00EF — already NFC),
    // %4 plants DECOMPOSED u/n + combining marks (U+0308, U+0303)
    val planted = Tables.documents(spark, dir).select(col("doc_id"),
      concat(col("text"),
        when(col("doc_id") % 3 === 0, lit(" caf\u00E9 na\u00EFve"))
          .otherwise(lit("")),
        when(col("doc_id") % 4 === 0, lit(" Zu\u0308rich pin\u0303ata"))
          .otherwise(lit(""))).as("t"))
    planted
      .select(col("doc_id"), col("t"),
        toCol(graft.plans.NfcNormalize(toExpr(col("t")))).as("norm"))
      .select(col("doc_id"), col("norm"),
        toCol(graft.plans.AccentFold(toExpr(col("norm")))).as("folded"),
        (col("norm") =!= col("t")).cast("long").as("changed"))
      .orderBy(col("doc_id").asc)
  }

  /** NORMALIZED exact dedup (`q_dedup_unicode`) — the composition
    * [[textNormalize]] exists for: exact-dedup digests hash BYTES, so
    * the same visible document crawled precomposed from one mirror and
    * decomposed from another is two "unique" documents to a raw md5 —
    * NFC first makes them one. The fixture plants exactly that pair for
    * every `doc_id % 9 == 0` base doc: a `+20000` twin carrying a
    * PRECOMPOSED accent suffix and a `+40000` twin carrying the same
    * suffix DECOMPOSED (different bytes, same NFC form). The normalized
    * digest dedup keeps the `+20000` copy and drops the `+40000` one;
    * a raw-byte dedup would keep both — the planted divergence this
    * entry exists to catch.
    *
    * Same plan shape as the exact dedup it composes with
    * ([[graft.operators.DedupOps.dedupExact]]-style min-per-digest):
    * one map-side NFC + md5, one partial-agg'd digest exchange.
    */
  def dedupUnicode(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
    val docs = Tables.documents(spark, dir)
    val twins = docs.filter(col("doc_id") % 9 === 0)
    val corpus = docs.select(col("doc_id"), col("text"))
      .unionByName(twins.select((col("doc_id") + 20000L).as("doc_id"),
        concat(col("text"), lit(" caf\u00E9")).as("text")))
      .unionByName(twins.select((col("doc_id") + 40000L).as("doc_id"),
        concat(col("text"), lit(" cafe\u0301")).as("text")))
    val fp = corpus.select(col("doc_id"),
      md5(toCol(graft.plans.NfcNormalize(toExpr(col("text"))))).as("fp"))
    fp.groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"), col("fp"))
      .orderBy(col("doc_id").asc)
  }

  /** Head-truncate at ingest — ref `text[:6000]` (`Crawling.py:45`); the
    * prompt-side variant is 20000 (`main_server.py:143`). Pure projection.
    */
  def truncate(spark: SparkSession, dir: String, n: Int = 6000): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), substring(col("text"), 1, n).as("body"),
        least(col("n_chars"), lit(n.toLong)).as("body_len"))
      .orderBy(col("doc_id").asc)

  /** URL join `baseUrl + link` — ref `Crawling.py:26`. */
  def urlConcat(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        concat(lit(UrlBase), col("source"), lit("/"), col("doc_id")).as("url"))
      .orderBy(col("doc_id").asc)

  /** URL canonicalization — the normalize-before-dedup step every crawl
    * pipeline runs ahead of URL-level dedup (the reference crawls per-URL,
    * `Crawling.py:13-24`, and re-crawling `HTTP://HOST:80/x?utm_source=…#f`
    * next to `http://host/x` double-ingests the page). Rules, in order:
    * (1) drop the fragment; (2) lowercase scheme://authority (path and
    * query case preserved); (3) strip default ports (http:80, https:443);
    * (4) drop tracking params (utm_*, gclid, fbclid, ref) and SORT the
    * survivors, so param order never splits an identity. Every rule is a
    * codegen'd builtin (regex/HOF projections) — map-side, zero shuffle,
    * engine-parity with the DuckDB oracle pinned per rule.
    */
  def canonicalizeUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    val head = regexp_extract(noFrag, "^[^/?#]*//[^/?#]*", 0)
    val lowered = concat(lower(head), substr(noFrag, length(head) + lit(1)))
    val noPort = regexp_replace(
      regexp_replace(lowered, "^(http://[^/:?#]*):80([/?#]|$)", "$1$2"),
      "^(https://[^/:?#]*):443([/?#]|$)", "$1$2")
    val base = regexp_extract(noPort, "^[^?]*", 0)
    val q = when(instr(noPort, "?") > 0,
      substr(noPort, instr(noPort, "?") + lit(1))).otherwise(lit(""))
    val params = filter(split(q, "&"), p =>
      p =!= "" && !p.rlike("^(utm_[a-zA-Z0-9_]*|gclid|fbclid|ref)($|=)"))
    concat(base,
      when(size(params) > 0,
        concat(lit("?"), array_join(array_sort(params), "&"))).otherwise(lit("")))
  }

  /** Deterministic fixture URLs: groups of 5 consecutive doc_ids share one
    * canonical identity, each id carrying a different real-world noise
    * variant (case, default port, tracking params + shuffled order,
    * fragment) — the synthesis is plain string SQL so the DuckDB oracle
    * builds the SAME urls and faces the same canonicalizer rules.
    */
  private def fixtureUrls(spark: SparkSession, dir: String): DataFrame = {
    val g = floor(col("doc_id") / 5).cast("long").cast("string")
    val v = col("doc_id") % 5
    Tables.documents(spark, dir).select(col("doc_id"),
      when(v === 0, concat(lit("http://www.example.com/d/"), g, lit("?a=1&b=2")))
        .when(v === 1, concat(lit("HTTP://WWW.EXAMPLE.COM/d/"), g, lit("?a=1&b=2")))
        .when(v === 2, concat(lit("http://www.example.com:80/d/"), g, lit("?a=1&b=2")))
        .when(v === 3, concat(lit("http://www.example.com/d/"), g,
          lit("?b=2&utm_source=news&a=1")))
        .otherwise(concat(lit("http://www.example.com/d/"), g,
          lit("?a=1&b=2#section-3")))
        .as("url"))
  }

  /** `q_url_canonical`: (doc_id, url, canonical_url) over the fixture —
    * all five noise variants of a group collapse to one canonical form.
    */
  def urlCanonical(spark: SparkSession, dir: String): DataFrame =
    fixtureUrls(spark, dir)
      .select(col("doc_id"), col("url"), canonicalizeUrl(col("url")).as("canonical_url"))
      .orderBy(col("doc_id").asc)

  /** `q_url_dedup`: URL-level dedup — every doc whose canonical URL was
    * already claimed by a lower doc_id maps to that keeper, `(dup_id,
    * canonical_id)`. One hash exchange on the canonical string; the
    * canonicalization itself is map-side.
    */
  def urlDedup(spark: SparkSession, dir: String): DataFrame = {
    val canon = fixtureUrls(spark, dir)
      .select(col("doc_id"), canonicalizeUrl(col("url")).as("cu"))
    // min-per-group then an equi-join back (no per-group arrays — a
    // boilerplate URL crawled 10⁶ times stays row-shaped). Observed plan:
    // the keepers aggregate partial_min's map-side (the exchange carries
    // one row per distinct cu per partition) and broadcasts back, so the
    // corpus side never shuffles at all; past the broadcast threshold it
    // degrades to a co-partitioned join on cu, still never quadratic
    val keepers = canon.groupBy(col("cu")).agg(min(col("doc_id")).as("canonical_id"))
    canon.join(keepers, Seq("cu"))
      .filter(col("doc_id") =!= col("canonical_id"))
      .select(col("doc_id").as("dup_id"), col("canonical_id"))
      .orderBy(col("dup_id").asc)
  }

  /** Blocklist + scoring lexicons for [[urlBlocklist]] — stand-ins for
    * RefinedWeb's UT1 domain blocklist and its strict/soft URL word
    * lists (Penedo et al. 2023 §G.1); planted like the PII corpora,
    * ONE definition the engine gates on and the oracle mirrors.
    */
  private[graft] val UrlBlockedHosts: Seq[String] =
    Seq("host0.example", "host6.example", "host12.example", "host18.example")
  private[graft] val UrlStrictWords: Seq[String] = Seq("casino")
  private[graft] val UrlSoftWords: Seq[String] = Seq("bet", "win")

  /** URL FILTERING (`q_url_blocklist`; RefinedWeb, Penedo et al. 2023
    * §G.1) — the admission gate between crawl and fetch that every
    * web-scale pipeline runs: a domain blocklist (UT1-class) plus a
    * weighted URL-word score (strict words weigh 5, soft words 1;
    * a URL is rejected at score ≥ 5 — one strict hit or an implausible
    * pile-up of soft hits). Emits per URL the host, both rule flags,
    * the score, and their conjunction.
    *
    * The fixture has no URL column, so URLs are PLANTED from doc_id
    * arithmetic: host cycles over 20 synthetic domains (4 of them
    * blocklisted — 20%), % 7 paths carry the strict word, % 8 paths
    * two soft words (score 2 — scored but passing, the gate's other
    * side).
    *
    * Scale: host extraction and scoring are map-side codegen; the
    * blocklist join is a BROADCAST left join — the UT1 list is a
    * fixed-size artifact (millions of domains, not corpus-scale), the
    * canonical broadcast-dimension shape. Zero corpus shuffles before
    * the presentation sort.
    */
  def urlBlocklist(spark: SparkSession, dir: String): DataFrame = {
    val planted = Tables.documents(spark, dir).select(col("doc_id"),
      concat(lit("http://host"), (col("doc_id") % 20).cast("string"),
        lit(".example/page/"), col("doc_id").cast("string"),
        when(col("doc_id") % 7 === 0, lit("/casino/bonus")).otherwise(lit("")),
        when(col("doc_id") % 8 === 0, lit("/bet-and-win")).otherwise(lit("")))
        .as("url"))
    import spark.implicits._
    urlBlocklistOn(planted, UrlBlockedHosts.toDF("host"))
  }

  /** Parametric core: (doc_id, url) in, blocklist (host) aside;
    * (doc_id, url, host, r_domain, url_score, r_score, keep) out.
    */
  private[graft] def urlBlocklistOn(urls: DataFrame, blocked: DataFrame): DataFrame = {
    val host = regexp_extract(col("url"), "^[a-z]+://([^/:?#]+)", 1)
    val score = (UrlStrictWords.map(w => when(col("url").contains(w), 5L).otherwise(0L)) ++
      UrlSoftWords.map(w => when(col("url").contains(w), 1L).otherwise(0L)))
      .reduce(_ + _)
    urls.select(col("doc_id"), col("url"), host.as("host"))
      .join(broadcast(blocked.select(col("host"), lit(1L).as("__blk"))),
        Seq("host"), "left")
      .select(col("doc_id"), col("url"), col("host"),
        col("__blk").isNull.cast("long").as("r_domain"),
        score.as("url_score"))
      .withColumn("r_score", (col("url_score") < 5L).cast("long"))
      .withColumn("keep", (col("r_domain") * col("r_score")).cast("long"))
      .orderBy(col("doc_id").asc)
  }

  /** JSON field extraction — ref `json.loads(...)` of the nav payload
    * (`Crawling.py:19`); dynamic-schema analog (`TencentVDB.py:33`) exercised
    * over the `events.props` JSON column.
    */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"),
        col("event_type"))
      .orderBy(col("event_id").asc)

  /** Upsert-by-id, last-writer-wins — ref `coll.upsert` overwrite semantics
    * ("若文档 id 已存在，则新数据会直接覆盖原有数据", `TencentVDB.py:69-70,79`).
    * Simulated re-crawl: every 7th doc arrives again as version 2; the window
    * dedup keeps the newest version per id. One shuffle on the upsert key —
    * at scale this is the standard MERGE pattern (hash-partition by id).
    */
  /** Build-if-absent versioned collection for the time-travel contract
    * queries: snapshot 0 = even docs, snapshot 1 upserts the odd docs,
    * snapshot 2 tombstones ids < 50. Each snapshot's content is a pure
    * predicate over the fixture, so every as-of read has a closed-form
    * DuckDB oracle. Create-half + upsert-half + delete each run the
    * store is missing — the ensure convention.
    */
  private[graft] def ensureVersionedDocs(spark: SparkSession,
      dir: String): (String, String) = {
    import graft.sources.CatalogOps
    val db = "graft_tt"
    val name = "docs"
    this.synchronized {
      if (!spark.catalog.tableExists(s"$db.${name}__vlog")) {
        CatalogOps.createDatabase(spark, db)
        KnnOps.dropTableAndDir(spark, db, s"${name}__vlog")
        KnnOps.dropTableAndDir(spark, db, s"${name}__vmeta")
        val docs = Tables.documents(spark, dir)
        CatalogOps.createVersionedCollection(spark, db, name,
          docs.filter(col("doc_id") % 2 === 0))
        CatalogOps.upsertVersioned(spark, db, name,
          docs.filter(col("doc_id") % 2 =!= 0))
        CatalogOps.deleteVersioned(spark, db, name, 0L until 50L)
      }
    }
    (db, name)
  }

  /** `q_timetravel_latest`: the resolved head snapshot — everything ever
    * upserted minus the tombstoned ids. */
  def timeTravelLatest(spark: SparkSession, dir: String): DataFrame = {
    val (db, name) = ensureVersionedDocs(spark, dir)
    graft.sources.CatalogOps.readVersioned(spark, db, name)
      .orderBy(col("doc_id").asc)
  }

  /** `q_timetravel_asof`: snapshot 0 re-read AFTER later upserts and
    * deletes landed — time travel is the point: history is immutable,
    * so this faces the create-batch's own oracle. */
  def timeTravelAsOf(spark: SparkSession, dir: String): DataFrame = {
    val (db, name) = ensureVersionedDocs(spark, dir)
    graft.sources.CatalogOps.readVersioned(spark, db, name, asOf = 0L)
      .orderBy(col("doc_id").asc)
  }

  /** Build-if-absent versioned collection for the CDC contract query —
    * separate from [[ensureVersionedDocs]] because the change feed needs
    * all three transition kinds: snapshot 0 creates the even docs,
    * snapshot 1 upserts the odd docs (INSERTs) and REWRITES every
    * doc_id % 10 == 0 doc with lang 'xx' (UPDATEs), snapshot 2
    * tombstones ids < 50 (DELETEs). Every snapshot is a pure predicate
    * over the fixture → the feed has a closed-form DuckDB oracle.
    */
  private[graft] def ensureCdcDocs(spark: SparkSession,
      dir: String): (String, String) = {
    import graft.sources.CatalogOps
    val db = "graft_cdc"
    val name = "docs"
    this.synchronized {
      if (!spark.catalog.tableExists(s"$db.${name}__vlog")) {
        CatalogOps.createDatabase(spark, db)
        KnnOps.dropTableAndDir(spark, db, s"${name}__vlog")
        KnnOps.dropTableAndDir(spark, db, s"${name}__vmeta")
        val docs = Tables.documents(spark, dir)
        CatalogOps.createVersionedCollection(spark, db, name,
          docs.filter(col("doc_id") % 2 === 0))
        CatalogOps.upsertVersioned(spark, db, name,
          docs.filter(col("doc_id") % 2 =!= 0)
            .unionByName(docs.filter(col("doc_id") % 10 === 0)
              .withColumn("lang", lit("xx"))))
        CatalogOps.deleteVersioned(spark, db, name, 0L until 50L)
      }
    }
    (db, name)
  }

  /** `q_timetravel_changes`: the CDC feed from snapshot 0 to head —
    * inserts (odd survivors, post-image), updates (the lang-rewritten
    * evens still alive, post-image), deletes (evens below 50,
    * PRE-image). What an incremental index maintainer consumes instead
    * of re-diffing snapshots.
    */
  def timeTravelChanges(spark: SparkSession, dir: String): DataFrame = {
    val (db, name) = ensureCdcDocs(spark, dir)
    graft.sources.CatalogOps.changesVersioned(spark, db, name, fromV = 0L)
      .orderBy(col("doc_id").asc)
  }

  def upsertLastWins(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val v1 = docs.select(col("doc_id"), col("lang"),
      substring(col("text"), 1, 40).as("body"), lit(1L).as("version"))
    val v2 = docs.filter(col("doc_id") % 7 === 0)
      .select(col("doc_id"), col("lang"),
        concat(lit("UPDATED "), col("source")).as("body"), lit(2L).as("version"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("version").desc)
    v1.unionAll(v2)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("lang"), col("body"), col("version"))
      .orderBy(col("doc_id").asc)
  }

  /** Recursive nav-tree flatten — ref `getChild` walk (`Crawling.py:23-30`):
    * emit `{title, baseUrl+link}` per node, recurse into children.
    *
    * The tree is the region→nation hierarchy under a synthetic root. The
    * recursion is re-planned as a Pregel-style FRONTIER ITERATION: each level
    * is one distributed join frontier⋈edges (child url = parent url + link,
    * exactly the ref's accumulation at `Crawling.py:26`), unioned until the
    * frontier empties. Depth iterations = tree depth (bounded, small); each
    * level is a broadcast-able join — scale-correct for wide shallow trees
    * (the nav-tree shape).
    */
  def treeFlatten(spark: SparkSession, dir: String): DataFrame = {
    val region = Tables.region(spark, dir)
    val nation = Tables.nation(spark, dir)
    // Edge list (parent_link, title, link): root→regions, region→nations.
    val regionEdges = region.select(lit("").as("parent_link"),
      col("r_name").as("title"),
      concat(lit("/r/"), col("r_regionkey")).as("link"))
    val nationEdges = nation.select(
      concat(lit("/r/"), col("n_regionkey")).as("parent_link"),
      col("n_name").as("title"),
      concat(lit("/n/"), col("n_nationkey")).as("link"))
    val edges = regionEdges.unionAll(nationEdges)

    var frontier = spark.range(1)
      .select(lit("root").as("title"), lit("").as("url"), lit(0L).as("depth"))
    var out = frontier
    var depth = 0L
    var more = true
    val levels = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    while (more) {
      depth += 1L
      val next = frontier.alias("f").join(edges.alias("e"),
          col("f.url") === col("e.parent_link"))
        .select(col("e.title").as("title"),
          concat(col("f.url"), col("e.link")).as("url"),
          lit(depth).as("depth"))
        .cache() // the emptiness probe materializes each level anyway; the
                 // final union then reads levels back instead of re-joining
      levels += next
      more = !next.isEmpty
      if (more) { out = out.unionAll(next); frontier = next }
    }
    // Materialize the result, then RELEASE the level caches: they exist to
    // keep the frontier iteration linear, not to outlive the call — left
    // cached, every invocation would leak depth+1 plans into executor
    // storage for the session's lifetime.
    val rows = out.orderBy(col("depth").asc, col("url").asc).localCheckpoint()
    levels.foreach(_.unpersist())
    rows
  }

  /** Flatten list-of-lists search results — ref nested
    * `for docs in doc_lists: for doc in docs` (`main_server.py:48-50`).
    * Inner lists are built per (lang, source) then nested per lang, and the
    * double `explode` restores flat rows — the genuine two-level unnest.
    */
  def flattenResults(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val inner = docs.groupBy(col("lang"), col("source"))
      .agg(slice(sort_array(collect_list(col("doc_id"))), 1, 2).as("doc_ids"))
    val nested = inner.groupBy(col("lang"))
      .agg(sort_array(collect_list(struct(col("source"), col("doc_ids")))).as("result_lists"))
    nested
      .select(col("lang"), explode(col("result_lists")).as("result"))
      .select(col("lang"), explode(col("result.doc_ids")).as("doc_id"))
      .orderBy(col("lang").asc, col("doc_id").asc)
  }

  /** Ordered context concat — ref `listToString` (`main_server.py:46-51`):
    * retrieved texts concatenated IN SCORE ORDER. Order-sensitivity is the
    * point: `collect_list` order is nondeterministic, so we collect
    * (key, text) structs and `array_sort` before joining — the
    * determinism rule from SURVEY §7.4.
    */
  def aggConcat(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(col("lang"))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("doc_id"), substring(col("text"), 1, 20).as("snip")))),
          x => x.getField("snip")),
        " | ").as("context"))
      .orderBy(col("lang").asc)

  /** Prompt assembly — ref
    * `"请按照\"" + prompt + "\"进行总结,内容是：" + str` (`main_server.py:142`)
    * with the 20000-char guard (`main_server.py:143`).
    */
  def promptTemplate(spark: SparkSession, dir: String, prompt: String = "总结要点"): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        substring(
          concat(lit("请按照\""), lit(prompt), lit("\"进行总结,内容是："),
            col("text")),
          1, 120).as("llm_prompt"))
      .orderBy(col("doc_id").asc)

  /** Citation block — ref `main_server.py:171-174`: per retrieved doc append
    * `"\n\n" + title + "     " + id` after a "参考链接：" header, in rank
    * order. Rank = top-3 docs per lang by length (the retrieval-score
    * analog); the concat is window-ranked then sorted-struct aggregated so
    * the output order matches the rank order deterministically.
    */
  def citationFormat(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("n_chars").desc, col("doc_id").asc)
    docs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .groupBy(col("lang"))
      .agg(concat(lit("参考链接："), array_join(
        transform(
          array_sort(collect_list(struct(col("rank"),
            concat(lit("\n\n"), col("source"), lit("     "), col("doc_id")).as("cite")))),
          x => x.getField("cite")),
        "")).as("citations"))
      .orderBy(col("lang").asc)
  }

  /** Nav-tree JSON payload, the shape the crawler parses at
    * `Crawling.py:17-19` (`json.loads(...)["list"]`). A fixed literal —
    * the offline analog of the fetched sidebar JSON.
    */
  private val NavPayload: String =
    """{"list":[
      |{"title":"overview","link":"/overview","children":[
      |  {"title":"quickstart","link":"/quickstart"},
      |  {"title":"concepts","link":"/concepts"}]},
      |{"title":"api","link":"/api","children":[
      |  {"title":"search","link":"/search"},
      |  {"title":"upsert","link":"/upsert"},
      |  {"title":"ddl","link":"/ddl"}]},
      |{"title":"pricing","link":"/pricing","children":[]}
      |]}""".stripMargin.replace("\n", "")

  /** Nested-JSON nav-tree parse — ref `json.loads` + `getChild` recursion
    * over the parsed payload (`Crawling.py:17-30`). `from_json` with the
    * nested schema replaces `json.loads`; one `explode` per level replaces
    * the recursion (depth-2 payload, matching the reference's nav shape);
    * child urls accumulate the parent link exactly like
    * `baseUrl + n["link"]` (`Crawling.py:26`).
    */
  def jsonTree(spark: SparkSession, dir: String): DataFrame = {
    val schema = "STRUCT<list: ARRAY<STRUCT<title: STRING, link: STRING, " +
      "children: ARRAY<STRUCT<title: STRING, link: STRING>>>>>"
    val base = "https://nav.local"
    val l1 = spark.range(1)
      .select(explode(from_json(lit(NavPayload), schema, Map.empty[String, String])
        .getField("list")).as("n"))
      .select(col("n.title").as("title"), col("n.link").as("link"),
        col("n.children").as("children"))
    val out1 = l1.select(col("title"), concat(lit(base), col("link")).as("url"),
      lit(1L).as("depth"))
    val out2 = l1.select(col("link"), explode(col("children")).as("c"))
      .select(col("c.title").as("title"),
        concat(lit(base), col("link"), col("c.link")).as("url"), lit(2L).as("depth"))
    out1.unionAll(out2).orderBy(col("depth").asc, col("url").asc)
  }

  /** [[jsonTree]] through the recursive [[graft.plans.NavTreeExplode]]
    * Generator — ONE Generate node flattens the whole payload at any
    * nesting depth, where the schema-typed formulation needs one explode
    * per level (and the frontier join one distributed pass per level).
    * Same rows as [[jsonTree]] on the depth-2 reference payload (shared
    * oracle); the arbitrary-depth behavior is pinned in ScalaTest.
    */
  def jsonTreeDeep(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
    spark.range(1)
      .select(toCol(graft.plans.NavTreeExplode(toExpr(lit(NavPayload))))
        .as(Seq("title", "url", "depth")))
      .select(col("title"),
        concat(lit("https://nav.local"), col("url")).as("url"), col("depth"))
      .orderBy(col("depth").asc, col("url").asc)
  }

  /** The reference's ENTIRE query path as one DataFrame (SURVEY §3.2):
    * knn top-k (`searchByText`, `main_server.py:41`) → payload join →
    * score-ordered context concat (`listToString`, `:46-51`) → prompt
    * assembly + truncate (`:142-143`) → citation block (`:171-174`).
    * One job; the only shuffles are the knn top-k and the final 1-row
    * aggregation. The composite that proves the chain composes.
    */
  def ragEndToEnd(spark: SparkSession, dir: String, queryId: Long = 0L, k: Int = 3,
      prompt: String = "总结要点"): DataFrame =
    ragAssemble(spark, dir, KnnOps.topK(spark, dir, queryId, k), prompt,
      lit(queryId).as("query_id"))

  /** The flagship: the reference's KB path seeded the way the reference
    * actually seeds it — from TYPED TEXT, not a stored vector
    * (`prompt_text → searchByText → listToString → prompt → citations`,
    * ref `main_server.py:130-143,171-175`): the query string embeds
    * IN-PLAN via [[graft.plans.FeatureHashEmbed]] ([[KnnOps.topKByText]] —
    * zero extra job, the embed folds to a constant at plan time), then the
    * identical payload-join/concat/citation chain as [[ragEndToEnd]]. The
    * raw hash vector round-trips exactly into the SQL oracle's literal
    * ([[graft.SparkEntry.knnTextQueryVec]]), which keeps the whole
    * composite oracle-checkable end to end. The vector-seeded
    * [[ragEndToEnd]] stays as the stored-query variant (`q_rag_e2e_vec`).
    */
  def ragEndToEndText(spark: SparkSession, dir: String, queryText: String,
      k: Int = 3, prompt: String = "总结要点"): DataFrame =
    ragAssemble(spark, dir, KnnOps.topKByText(spark, dir, queryText, k)
        .select(col("vec_id"), col("score")), prompt,
      lit(queryText).as("query"))

  /** Shared context-assembly tail of the two RAG flagships: rank the hits,
    * join payloads, fold the score-ordered snippets into the prompt and the
    * citation block (ref `main_server.py:46-51,142-143,171-174`).
    */
  private def ragAssemble(spark: SparkSession, dir: String, hits: DataFrame,
      prompt: String, idCol: Column): DataFrame = {
    val w = Window.orderBy(col("score").desc, col("vec_id").asc) // k rows — tiny
    val ranked = hits.withColumn("rank", row_number().over(w))
    val docs = Tables.documents(spark, dir)
    ranked.join(docs, ranked("vec_id") === docs("doc_id"))
      .select(col("rank"), col("source"), col("doc_id"),
        substring(col("text"), 1, 40).as("snip"))
      .agg(
        substring(
          concat(lit("请按照\"" + prompt + "\"进行总结,内容是："),
            array_join(transform(
              array_sort(collect_list(struct(col("rank"), col("snip")))),
              x => x.getField("snip")), "")),
          1, 200).as("llm_prompt"),
        concat(lit("参考链接："), array_join(transform(
          array_sort(collect_list(struct(col("rank"),
            concat(lit("\n\n"), col("source"), lit("     "), col("doc_id")).as("cite")))),
          x => x.getField("cite")), "")).as("citations"))
      .select(idCol, col("llm_prompt"), col("citations"))
  }

  /** Overlapping-window document chunking — what a real RAG ingest does
    * where the reference hard-truncates (`text[:6000]`, `Crawling.py:45`):
    * fixed-size character windows advancing by (size − overlap), so every
    * boundary appears intact in some chunk. A 1→N map-side Generate; chunk
    * count is the closed form max(1, ⌈(len − size)/step⌉ + 1), identical
    * IEEE arithmetic in the DuckDB oracle.
    */
  def chunkSplit(spark: SparkSession, dir: String,
      size: Int = 200, overlap: Int = 50): DataFrame =
    chunkSplitOn(Tables.documents(spark, dir), size, overlap)

  /** Corpus-parametric form of [[chunkSplit]] (docs: doc_id, text) — also
    * a stage of the [[pipelineEndToEnd]] composite.
    */
  private[graft] def chunkSplitOn(docs: DataFrame, size: Int, overlap: Int): DataFrame = {
    require(size > overlap && overlap >= 0, s"bad chunking: size=$size overlap=$overlap")
    val step = size - overlap
    val nChunks = greatest(lit(1),
      (ceil((length(col("text")) - size).cast("double") / step) + 1).cast("int"))
    docs
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), nChunks - 1),
          i => col("text").substr(i * step + 1, lit(size))))
          .as(Seq("chunk_idx", "chunk")))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        col("chunk"), length(col("chunk")).cast("long").as("chunk_len"))
      .orderBy(col("doc_id").asc, col("chunk_idx").asc)
  }

  /** The LLM TRAINING-DATA pipeline as ONE plan — the north-star chain the
    * engine exists for, composed from the operators it already ships:
    * quality gate (token count + lexical diversity) → exact dedup on the
    * content digest (lowest id wins) → overlapping-window chunking →
    * deterministic hash split assignment per chunk → per-split corpus
    * statistics. Shuffles: the dedup window and the final 3-group
    * aggregate; everything else is map-side. Oracle-checked end to end.
    */
  def pipelineEndToEnd(spark: SparkSession, dir: String,
      minTokens: Int = 30, minDistinctRatio: Double = 0.3): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .withColumn("n_distinct", size(array_distinct(split(col("text"), " "))).cast("long"))
      .filter(col("n_tokens") >= minTokens &&
        col("n_distinct").cast("double") / col("n_tokens") >= minDistinctRatio)
    val w = Window.partitionBy(col("fp")).orderBy(col("doc_id").asc)
    val deduped = docs
      .withColumn("fp", md5(col("text")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("text"))
    val chunks = chunkSplitOn(deduped, size = 200, overlap = 50)
    chunks
      // both multipliers coprime with the modulus — a shared factor would
      // cancel a term (doc_id·1000·K ≡ 0 mod 1000 degenerated every chunk
      // of a doc to the same bucket stripe). The doc_id multiplier is
      // DELIBERATELY different from the domain-mix hash's 2654435761: with
      // the same constant, a chunk-0 bucket would equal the domain-mix
      // bucket, and composing mix → split would draw test chunks only
      // from weight-1.0 sources (a biased eval split).
      .withColumn("bucket",
        pmod(col("doc_id") * lit(2246822519L) + col("chunk_idx") * lit(40503L), lit(1000L)))
      .withColumn("split",
        when(col("bucket") < 800, "train")
          .when(col("bucket") < 900, "valid")
          .otherwise("test"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(size(split(col("chunk"), " ")).cast("long")).as("n_tokens"),
        countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("split").asc)
  }

  /** The reference's ENTIRE ingest path as one DataFrame (SURVEY §3.1, the
    * ingest twin of [[ragEndToEnd]]): crawl records with a re-crawl batch
    * (`crawlData`, `Crawling.py:33-51`) → URL key (`Crawling.py:26`) →
    * whitespace-run collapse (`re.sub`, `Crawling.py:46`) → 6000-char
    * truncate (`Crawling.py:45`) → overwrite-by-id upsert
    * (`TencentVDB.py:74-79`) → content fingerprint (the downstream dedup
    * key). One linear job: projections all the way to the single
    * last-writer-wins shuffle on the id.
    */
  def ingestEndToEnd(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val url = concat(lit("https://corpus.local/"), col("source"), lit("/"), col("doc_id"))
    val v1 = docs.select(url.as("url"), col("doc_id"), col("text"), lit(1L).as("version"))
    val v2 = docs.filter(col("doc_id") % 5 === 0) // simulated re-crawl batch
      .select(url.as("url"), col("doc_id"),
        concat(col("text"), lit(" refreshed")).as("text"), lit(2L).as("version"))
    val cleaned = v1.unionAll(v2)
      .select(col("url"), col("doc_id"), col("version"),
        substring(regexp_replace(col("text"), " +", " "), 1, 6000).as("body"))
    val w = Window.partitionBy(col("url")).orderBy(col("version").desc)
    cleaned
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("url"), col("doc_id"), col("version"),
        length(col("body")).cast("long").as("body_len"), md5(col("body")).as("fp"))
      .orderBy(col("url").asc)
  }

  /** HTML body extraction — ref CSS-select of `div.J-markdown-box` +
    * `get_text()` (`Crawling.py:41-44`). The zero-egress fixture has no
    * HTML, so the crawl wrapper is reconstructed first (deterministic) and
    * the ref's extract-by-container becomes a regexp capture group — a
    * per-row projection; a jsoup UDF slots into the same column position
    * when real markup needs a DOM.
    */
  def htmlExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        concat(lit("<html><body><div class=\"J-markdown-box\">"),
          substring(col("text"), 1, 80),
          lit("</div></body></html>")).as("html"))
      .select(col("doc_id"),
        regexp_extract(col("html"), MarkdownBoxRegex, 1).as("body"))
      .orderBy(col("doc_id").asc)

  /** Deterministic full-page HTML around each document — the planted
    * fixture for MAIN-CONTENT extraction (the zero-egress corpus has no
    * markup): navigation, two content blocks carrying the document's two
    * halves, a short social stub, and a link-heavy footer. Gate
    * variation is planted per doc_id: % 3 adds one inline link to the
    * second content block (passes link density), % 5 spams it with six
    * boilerplate links (fails), and 1–2-token documents yield content
    * halves under the word floor — every rule fires both ways on the
    * corpus. Both engines rebuild the page from the same arithmetic.
    */
  private[graft] def plantedPage(docs: DataFrame): DataFrame = {
    val half = (length(col("text")) / 2).cast("int")
    val first = col("text").substr(lit(1), half)
    val second = col("text").substr(half + 1, length(col("text")))
    docs.withColumn("html", concat(
      lit("<html><body>"),
      lit("<div class=\"nav\"><a href=\"/\">home</a> <a href=\"/about\">about</a> <a href=\"/products\">products</a></div>"),
      lit("<div class=\"main\">"), first, lit("</div>"),
      lit("<div class=\"main2\">"), second,
      when(col("doc_id") % 3 === 0,
        lit(" see <a href=\"/d\">details</a>")).otherwise(lit("")),
      when(col("doc_id") % 5 === 0,
        repeat(lit(" <a href=\"/p\">more link text here</a>"), 6))
        .otherwise(lit("")),
      lit("</div>"),
      lit("<div class=\"share\">share</div>"),
      lit("<div class=\"footer\"><a href=\"/privacy\">privacy</a> <a href=\"/terms\">terms</a> copyright corpus</div>"),
      lit("</body></html>")))
  }

  /** MAIN-CONTENT extraction (`q_html_main`) — the boilerplate-removal
    * stage every published pipeline (C4, Dolma, FineWeb) runs between
    * fetch and the quality gates, which [[htmlExtract]]'s
    * one-CSS-selector pull (the reference's shape, `Crawling.py:41-44`)
    * skips: block-level scoring in the jusText / trafilatura class
    * (Kohlschütter 2010 / Pomikálek 2011), closed-form so the oracle
    * mirrors it exactly. Blocks split on the `</div>` boundary; per
    * block the TEXT surface (tags stripped, whitespace collapsed) and
    * its LINK characters (anchor inner text) are measured, and a block
    * is content iff it clears the word floor (≥ 5 words) and the
    * link-density fence (5·link_chars ≤ text_chars — the 20%
    * cross-multiplication convention). Stopword density — jusText's
    * third signal — is REPORTED, not gated: the fixture vocabulary is
    * synthetic word soup where function-word presence is a coin flip,
    * so a stopword gate would encode noise (documented fixture-fit, the
    * q_curate_e2e threshold discipline).
    *
    * Scale: one map-side projection per document — block split, per-
    * block regex strips, and the keep filter are row-local; arrays are
    * staged as multi-referenced columns (the gopherRepetitionFull
    * lambda-recompute discipline). Zero exchanges before the sort.
    * Appends columns, preserving the input's (the ingest composition
    * carries url/version through).
    */
  private[graft] def htmlMainOn(pages: DataFrame): DataFrame = {
    val rawBlocks = transform(split(col("html"), "</div>"), b =>
      struct(
        trim(regexp_replace(regexp_replace(b, "<[^>]*>", " "), " +", " "))
          .as("txt"),
        aggregate(
          regexp_extract_all(b, lit("<a[^>]*>([^<]*)</a>"), lit(1)),
          lit(0L), (a, x) => a + length(x)).as("lch")))
    val staged = pages
      .withColumn("__blocks",
        filter(rawBlocks, s => s.getField("txt") =!= ""))
      .withColumn("__kept",
        filter(col("__blocks"), s =>
          size(split(s.getField("txt"), " ")) >= 5 &&
            lit(5L) * s.getField("lch") <= length(s.getField("txt"))))
      .withColumn("main_text",
        array_join(transform(col("__kept"), s => s.getField("txt")), " "))
    staged.select(col("*"),
      size(col("__blocks")).cast("long").as("n_blocks"),
      size(col("__kept")).cast("long").as("n_kept"),
      length(col("main_text")).cast("long").as("main_chars"),
      size(filter(split(col("main_text"), " "),
        t => t === "the" || t === "a")).cast("long").as("stop_words"))
      .drop("__blocks", "__kept")
  }

  def htmlMain(spark: SparkSession, dir: String): DataFrame =
    htmlMainOn(plantedPage(Tables.documents(spark, dir)
        .select(col("doc_id"), col("text"))))
      .select(col("doc_id"), col("n_blocks"), col("n_kept"),
        col("main_chars"), col("stop_words"), col("main_text"))
      .orderBy(col("doc_id").asc)

  /** `q_ingest_e2e_main`: the ingest chain with main-content extraction
    * where the reference pulls one container — full pages (re-crawl
    * batch included) → block-scored main text → whitespace collapse +
    * 6000-char truncate → last-writer-wins upsert → content fingerprint.
    * Same plan spine as [[ingestEndToEnd]] (projections into ONE
    * id-keyed shuffle), the extraction stays map-side.
    */
  def ingestEndToEndMain(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val url = concat(lit("https://corpus.local/"), col("source"), lit("/"), col("doc_id"))
    val v1 = docs.select(url.as("url"), col("doc_id"), col("text"), lit(1L).as("version"))
    val v2 = docs.filter(col("doc_id") % 5 === 0) // simulated re-crawl batch
      .select(url.as("url"), col("doc_id"),
        concat(col("text"), lit(" refreshed")).as("text"), lit(2L).as("version"))
    val extracted = htmlMainOn(plantedPage(v1.unionAll(v2)))
      .select(col("url"), col("doc_id"), col("version"), col("n_kept"),
        substring(regexp_replace(col("main_text"), " +", " "), 1, 6000).as("body"))
    val w = Window.partitionBy(col("url")).orderBy(col("version").desc)
    extracted
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("url"), col("doc_id"), col("version"), col("n_kept"),
        length(col("body")).cast("long").as("body_len"), md5(col("body")).as("fp"))
      .orderBy(col("url").asc)
  }

  /** Retrieval cap — ref `limit=3` (`main_server.py:41`) standalone:
    * `orderBy + limit` compiles to `TakeOrderedAndProject` (bounded
    * per-partition top-k, no global sort).
    */
  def limitK(spark: SparkSession, dir: String, k: Int = 3): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars"))
      .orderBy(col("n_chars").desc, col("doc_id").asc)
      .limit(k)
}
