package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Crawl-cycle planning — the two passes that sit on either side of the
  * reference's fetch loop (`Crawling.py:13-51` crawls a fixed nav tree
  * every run, re-downloading every page unconditionally and never deciding
  * WHAT to crawl next). A production crawler runs both:
  *
  *   - [[crawlDelta]] AFTER a crawl: diff the new snapshot against the
  *     previous one by content hash, so only added/changed pages re-enter
  *     the pipeline (re-embed, re-index) and removed pages get retired —
  *     the incremental form of the reference's blanket re-upsert
  *     (`TencentVDB.py:69-79` overwrites every id every run).
  *   - [[crawlFrontier]] BEFORE a crawl: score every known URL by expected
  *     staleness and emit a per-host politeness-capped fetch schedule
  *     (Cho & Garcia-Molina, "Synchronizing a database to improve
  *     freshness", SIGMOD 2000 — revisit frequency ∝ change rate).
  *
  * Both are deterministic integer/hash arithmetic, DuckDB-oracled.
  */
object FrontierOps {

  /** Previous-snapshot synthesis, shared with the oracle SQL: the old
    * crawl is missing every `doc_id % 11 == 3` page (those arrive as NEW),
    * and every `doc_id % 13 == 0` page had shorter content last time
    * (those re-arrive CHANGED). The new crawl is missing every
    * `doc_id % 17 == 5` page (those were REMOVED since).
    */
  private def oldSnapshot(docs: DataFrame): DataFrame =
    docs.filter(col("doc_id") % 11 =!= 3)
      .select(col("doc_id"),
        when(col("doc_id") % 13 === 0, substring(col("text"), 1, 10))
          .otherwise(col("text")).as("text"))

  private def newSnapshot(docs: DataFrame): DataFrame =
    docs.filter(col("doc_id") % 17 =!= 5).select(col("doc_id"), col("text"))

  /** `q_crawl_delta`: incremental re-crawl diff. Each side is reduced to
    * `(doc_id, md5(text))` BEFORE the join — page bodies never enter the
    * exchange; what shuffles is id + 32 hex chars per page regardless of
    * document size. A full outer join on the id then classifies:
    * left-only = removed, right-only = added, hash mismatch = changed;
    * unchanged pages (the overwhelming majority of a re-crawl) are
    * dropped, so downstream re-embedding work is proportional to the
    * delta, not the corpus. At 100 TB both snapshots are stored bucketed
    * by doc_id, making this a shuffle-free sort-merge diff.
    */
  def crawlDelta(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val old = oldSnapshot(docs)
      .select(col("doc_id"), md5(col("text")).as("old_hash"))
    val neu = newSnapshot(docs)
      .select(col("doc_id"), md5(col("text")).as("new_hash"))
    old.join(neu, Seq("doc_id"), "full_outer")
      .withColumn("change",
        when(col("old_hash").isNull, lit("added"))
          .when(col("new_hash").isNull, lit("removed"))
          .when(col("old_hash") =!= col("new_hash"), lit("changed")))
      .filter(col("change").isNotNull)
      .select(col("doc_id"), col("change"), col("old_hash"), col("new_hash"))
      .orderBy(col("doc_id").asc)
  }

  /** Deterministic staleness fixture, shared with the oracle: age since
    * last fetch cycles over a month (`doc_id % 30` days) and the expected
    * change rate is a per-language integer weight (news-ish languages
    * poll faster in the fixture purely to make rates non-uniform).
    */
  private[graft] def priorityCol: Column = {
    val rate = when(col("lang") === "en", 5).when(col("lang") === "fr", 4)
      .when(col("lang") === "es", 3).when(col("lang") === "de", 2).otherwise(1)
    ((col("doc_id") % 30) * rate + col("n_chars") % 7).cast("long")
  }

  /** `q_crawl_frontier`: the next fetch schedule — per host (fixture:
    * `source` is the host), the top `perHostCap` pages by staleness
    * priority, with the crawl slot number inside the host's queue.
    * Integer priority = age_days × change_rate + a size jitter term, so
    * both engines rank identically with no float ties.
    *
    * One hash exchange on host, then a per-host rank — the politeness cap
    * bounds every host's output at `perHostCap` rows, so the result is
    * hosts × cap regardless of corpus size. A pathological giant host
    * (one site owning most of the frontier) costs one partition's sort,
    * the same skew profile as any per-key window; the rank-filter form
    * lets AQE split the sort while a collect-per-host form would not.
    */
  def crawlFrontier(spark: SparkSession, dir: String,
                    perHostCap: Int = 8): DataFrame = {
    val w = Window.partitionBy(col("host"))
      .orderBy(col("priority").desc, col("doc_id").asc)
    Tables.documents(spark, dir)
      .select(col("source").as("host"), col("doc_id"), priorityCol.as("priority"))
      .withColumn("slot", row_number().over(w))
      .filter(col("slot") <= perHostCap)
      .select(col("host"), col("slot").cast("long").as("slot"),
        col("doc_id"), col("priority"))
      .orderBy(col("host").asc, col("slot").asc)
  }

  /** `q_crawl_robots`: the POLITE frontier — [[crawlFrontier]]'s
    * staleness schedule gated by RFC 9309 admission
    * ([[graft.sources.RobotsOps]], built r13, wired here) and
    * crawl-delay-shrunk per-host caps. The reference fetches
    * unconditionally (`Crawling.py:13-24`); a production crawler cannot
    * schedule a disallowed URL, and a host advertising `Crawl-delay: d`
    * can absorb at most ⌊cycle/d⌋ fetches per cycle.
    *
    * Order of operations is the semantic point: admission runs BEFORE
    * the per-host rank, so a disallowed URL never consumes a politeness
    * slot (the next-best allowed page gets it); the delay cap then
    * truncates each host's queue at min(globalCap, ⌊cycleSeconds/delay⌋).
    *
    * Scale shape: the rule map is host-keyed model state (one parsed
    * body per host per cycle — the robots store of a real crawler),
    * broadcast via the task closure; admission is a map-side per-row
    * prefix match, then the same single hash exchange + per-host rank as
    * [[crawlFrontier]]. The delay caps join is a broadcast of hosts×1
    * rows. Output stays bounded at hosts × cap.
    *
    * Fixture: path = `/lang/p<doc_id>`; per-host bodies from
    * [[graft.sources.RobotsOps.fixtureRobots]] (prefix rules, wildcard +
    * `$`-anchor with a longest-match allow tie, agent-group selection,
    * and a robots-less class). The DuckDB oracle re-derives the verdicts
    * from a handwritten literal rules table.
    */
  def crawlFrontierRobots(spark: SparkSession, dir: String,
      agent: String = graft.sources.RobotsOps.FixtureAgent,
      globalCap: Int = 8, cycleSeconds: Double = 10.0,
      fetch: String => Option[String] =
        graft.sources.RobotsOps.fixtureFetch): DataFrame = {
    import graft.sources.RobotsOps
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    // hosts are catalog-scale (the robots store of a crawler is one row
    // per host); the bodies arrive through the INJECTED control-plane
    // fetcher (r15 — one implementation serves fixture and production,
    // the CrawlOps offline/online split made uniform)
    val hosts = docs.select(col("source")).distinct().as[String].collect().toSeq
    val robots = RobotsOps.robotsByFetch(hosts, fetch)
    val pages = docs.select(col("source").as("host"), col("doc_id"),
      concat(lit("/"), col("lang"), lit("/p"), col("doc_id")).as("path"),
      priorityCol.as("priority"))
    val admitted = RobotsOps.admitByHostPath(pages, "host", "path", robots, agent)
    val w = Window.partitionBy(col("host"))
      .orderBy(col("priority").desc, col("doc_id").asc)
    val ranked = admitted.withColumn("slot", row_number().over(w))
      .filter(col("slot") <= globalCap)
    RobotsOps.capByCrawlDelay(ranked, "host", "slot", robots, agent,
        cycleSeconds, globalCap)
      .select(col("host"), col("slot").cast("long").as("slot"),
        col("doc_id"), col("path"), col("priority"))
      .orderBy(col("host").asc, col("slot").asc)
  }

  /** `q_crawl_sitemap`: sitemap ingestion — the discovery half of the
    * crawl cycle next to robots' admission half: a host's sitemap XML
    * (sitemaps.org protocol; the production complement of the
    * reference's hand-listed nav tree, `Crawling.py:13-24`) is parsed
    * into (url, lastmod) entries and classified against the corpus —
    * `new` (sitemap-only URL: a discovery to seed), `stale` (known URL
    * whose advertised lastmod is newer than our last fetch: schedule a
    * refresh), `fresh` (known and current: skip). This is how a polite
    * crawler avoids both re-fetching fresh pages AND missing new ones.
    *
    * The engine genuinely parses XML (`from_xml` over the per-host body
    * text the fetch boundary would return; the fixture derives the
    * bodies deterministically from the corpus, the q_json_tree
    * discipline) — while the DuckDB oracle computes the expected answer
    * in CLOSED FORM from the same arithmetic, so a parse that drops or
    * mangles any entry diverges.
    *
    * Scale: one map-side XML parse + Generate per host body (the
    * protocol caps a sitemap at 50k URLs, so per-row work is bounded),
    * then one url-keyed join against the corpus projected to
    * (url, last_fetch). No corpus re-shuffle; output = sitemap entries.
    */
  def crawlSitemap(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, StringType, StructField, StructType}
    val docs = Tables.documents(spark, dir)
    val known = docs.select(col("source").as("host"), col("doc_id"),
      concat(lit("https://"), col("source"), lit("/"), col("lang"),
        lit("/p"), col("doc_id")).as("url"),
      concat(lit("2026-01-"),
        lpad((col("doc_id") % 28 + 1).cast("string"), 2, "0")).as("lastmod"))
    val disc = docs.filter(col("doc_id") % 5 === 0)
      .select(col("source").as("host"), col("doc_id"),
        concat(lit("https://"), col("source"), lit("/disc/p"), col("doc_id")).as("url"),
        lit("2026-01-15").as("lastmod"))
    // one sitemap TEXT body per host — what the fetcher would return;
    // entries sorted by url so the body is deterministic
    val xmlByHost = known.unionByName(disc)
      .select(col("host"), col("url"),
        concat(lit("<url><loc>"), col("url"), lit("</loc><lastmod>"),
          col("lastmod"), lit("</lastmod></url>")).as("entry"))
      .groupBy(col("host"))
      .agg(concat(lit("<urlset>"),
        array_join(transform(array_sort(collect_list(struct(col("url"), col("entry")))),
          x => x.getField("entry")), ""),
        lit("</urlset>")).as("xml"))
    val schema = StructType(Seq(StructField("url", ArrayType(StructType(Seq(
      StructField("loc", StringType), StructField("lastmod", StringType)))))))
    val parsed = xmlByHost.select(col("host"),
        explode(from_xml(col("xml"), schema).getField("url")).as("u"))
      .select(col("host"), col("u.loc").as("url"), col("u.lastmod").as("lastmod"))
    val corpus = docs.select(
      concat(lit("https://"), col("source"), lit("/"), col("lang"),
        lit("/p"), col("doc_id")).as("curl"),
      date_sub(to_date(lit("2026-02-01")), (col("doc_id") % 30).cast("int"))
        .as("last_fetch"))
    parsed.join(corpus, parsed("url") === corpus("curl"), "left")
      .select(col("host"), col("url"), col("lastmod"),
        when(col("curl").isNull, lit("new"))
          .when(to_date(col("lastmod")) > col("last_fetch"), lit("stale"))
          .otherwise(lit("fresh")).as("status"))
      .orderBy(col("host").asc, col("url").asc)
  }

  /** The fixture's sitemap ENTRY set — (host, url, lastmod) exactly as
    * [[crawlSitemap]] derives it (known pages with advertised lastmods +
    * every-5th discovery), factored so the flat and index forms cannot
    * drift.
    */
  private def sitemapEntries(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val known = docs.select(col("source").as("host"),
      concat(lit("https://"), col("source"), lit("/"), col("lang"),
        lit("/p"), col("doc_id")).as("url"),
      concat(lit("2026-01-"),
        lpad((col("doc_id") % 28 + 1).cast("string"), 2, "0")).as("lastmod"))
    val disc = docs.filter(col("doc_id") % 5 === 0)
      .select(col("source").as("host"),
        concat(lit("https://"), col("source"), lit("/disc/p"), col("doc_id")).as("url"),
        lit("2026-01-15").as("lastmod"))
    known.unionByName(disc)
  }

  /** The fixture's sitemap BODY derivation — (index (host, ixml),
    * children (host, sloc, cxml)): the host's entry set sharded into
    * sequential url-ordered child sitemaps of `childCap` URLs plus a
    * per-host index of the child locs, 50k-cap guarded inside the
    * aggregate. This is the fixture implementation of
    * [[crawlSitemapIndex]]'s injected fetch surface.
    */
  private def fixtureSitemapBodies(spark: SparkSession, dir: String,
      childCap: Int): (DataFrame, DataFrame) = {
    require(childCap >= 1 && childCap <= 50000,
      s"sitemaps.org caps one sitemap at 50k URLs, got childCap=$childCap")
    val w = Window.partitionBy(col("host")).orderBy(col("url").asc)
    val chunked = sitemapEntries(spark, dir)
      .withColumn("rn", row_number().over(w))
      .withColumn("sloc",
        concat(lit("https://"), col("host"), lit("/sitemap-"),
          floor((col("rn") - 1) / childCap).cast("long"), lit(".xml")))
    // child urlset bodies, entries url-sorted inside each child
    val childXml = chunked
      .select(col("host"), col("sloc"), col("url"),
        concat(lit("<url><loc>"), col("url"), lit("</loc><lastmod>"),
          col("lastmod"), lit("</lastmod></url>")).as("entry"))
      .groupBy(col("host"), col("sloc"))
      .agg(concat(lit("<urlset>"),
        array_join(transform(array_sort(collect_list(struct(col("url"), col("entry")))),
          x => x.getField("entry")), ""),
        lit("</urlset>")).as("cxml"))
    // per-host index body over the sorted child locs, 50k-cap guarded
    val indexXml = childXml
      .groupBy(col("host"))
      .agg(count(lit(1)).as("nc"),
        concat(lit("<sitemapindex>"),
          array_join(transform(array_sort(collect_list(col("sloc"))),
            s => concat(lit("<sitemap><loc>"), s, lit("</loc></sitemap>"))), ""),
          lit("</sitemapindex>")).as("ixml"))
      .select(col("host"),
        when(col("nc") <= 50000, col("ixml"))
          .otherwise(raise_error(concat(lit("sitemap index for host "),
            col("host"), lit(" exceeds the 50k child cap")))).as("ixml"))
    (indexXml, childXml)
  }

  /** The corpus freshness view shared by the sitemap classifiers:
    * (curl, last_fetch).
    */
  private def corpusFetchDates(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      concat(lit("https://"), col("source"), lit("/"), col("lang"),
        lit("/p"), col("doc_id")).as("curl"),
      date_sub(to_date(lit("2026-02-01")), (col("doc_id") % 30).cast("int"))
        .as("last_fetch"))

  /** `q_crawl_sitemap_index`: the TWO-LEVEL sitemaps.org protocol —
    * `<sitemapindex>` → child `<urlset>`s. This is how every host with
    * more than 50k URLs publishes (the protocol caps one sitemap file at
    * 50k entries and an index at 50k child sitemaps), i.e. exactly the
    * hosts a 100 TB crawl cares about; [[crawlSitemap]]'s single-urlset
    * parse covers only the small-host case.
    *
    * The fixture shards each host's entry set into sequential child
    * sitemaps of `childCap` URLs (url-ordered, the way generators emit
    * them) and publishes a per-host index of the child locs. The ENGINE
    * then walks the real protocol: parse the index XML (`from_xml`),
    * explode the child locs, "fetch" each child through the body table
    * (the join IS the fetch boundary — in production the injected
    * fetcher returns each loc's bytes), parse each child's urlset, and
    * classify entries new/stale/fresh against the corpus exactly as the
    * flat form does. The DuckDB oracle re-derives everything in closed
    * form (rank → chunk → child loc → classification), so a parse that
    * drops an entry, a child, or misroutes an entry to the wrong child
    * diverges.
    *
    * Both protocol caps are enforced LOUDLY: `childCap` ≤ 50k by
    * contract, and the index build raises (inside the aggregate, so the
    * guard rides the plan) if a host accumulates more than 50k child
    * sitemaps.
    *
    * Scale: the chunk rank is one hash exchange on `host` (bounded: a
    * host's sitemap universe is ≤ 50k × 50k entries by protocol, and
    * real indexes are built per host anyway); XML build/parse stays
    * map-side per (host, child); the child "fetch" join is
    * (host, loc)-keyed at child grain — catalog-scale, not corpus-scale.
    */
  def crawlSitemapIndex(spark: SparkSession, dir: String,
      childCap: Int = 10,
      bodies: Option[(DataFrame, DataFrame)] = None): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, StringType, StructField, StructType}
    // the fetch surface (r15, VERDICT §8): `bodies` is what the fetchers
    // return — the per-host index XML (host, ixml) and the per-child
    // urlset XML (host, sloc, cxml). Production fills them through
    // [[graft.sources.CrawlOps.fetchPages]] (child sitemaps are
    // corpus-scale at 50k×50k: executor-side fetch); the default derives
    // the fixture bodies below — ONE injected surface, same plan.
    val (indexXml, childXml) = bodies.getOrElse(
      fixtureSitemapBodies(spark, dir, childCap))
    val idxSchema = StructType(Seq(StructField("sitemap", ArrayType(StructType(Seq(
      StructField("loc", StringType)))))))
    val childLocs = indexXml.select(col("host"),
        explode(from_xml(col("ixml"), idxSchema).getField("sitemap")).as("s"))
      .select(col("host"), col("s.loc").as("loc"))
    val urlSchema = StructType(Seq(StructField("url", ArrayType(StructType(Seq(
      StructField("loc", StringType), StructField("lastmod", StringType)))))))
    // the fetch boundary: each discovered child loc pulls its body
    val parsed = childLocs
      .join(childXml.select(col("host"), col("sloc"), col("cxml")),
        childLocs("host") === childXml("host") && col("loc") === col("sloc"))
      .select(childLocs("host").as("host"), col("sloc").as("sitemap"),
        explode(from_xml(col("cxml"), urlSchema).getField("url")).as("u"))
      .select(col("host"), col("sitemap"), col("u.loc").as("url"),
        col("u.lastmod").as("lastmod"))
    val corpus = corpusFetchDates(spark, dir)
    parsed.join(corpus, parsed("url") === corpus("curl"), "left")
      .select(col("host"), col("sitemap"), col("url"), col("lastmod"),
        when(col("curl").isNull, lit("new"))
          .when(to_date(col("lastmod")) > col("last_fetch"), lit("stale"))
          .otherwise(lit("fresh")).as("status"))
      .orderBy(col("host").asc, col("url").asc)
  }

  /** `q_crawl_plan`: the WHOLE next-cycle plan, composed — what the
    * crawler actually fetches next: the sitemap pass supplies the
    * candidates ([[crawlSitemap]]'s `new` discoveries, ranked ahead of
    * everything at a fixed seed priority, and `stale` known pages at
    * their staleness priority), RFC 9309 admission drops what robots
    * forbids BEFORE any slot is assigned, and each host's queue is cut
    * at its crawl-delay-shrunk cap. One query = the full planning pass
    * of a production crawl cycle (discover → prioritize → admit →
    * schedule politely); the reference hard-codes all four decisions
    * (`Crawling.py:13-24`).
    *
    * Scale shape is the sum of its parts: map-side sitemap parse, one
    * url-keyed priority join, closure-broadcast admission, one hash
    * exchange + per-host rank bounded at hosts × cap.
    *
    * ONE injected control plane (r16, closing the r15 advice gap):
    * `fetch` serves the robots bodies and `sitemapBodies` the
    * index/child sitemap XML — a production caller supplies both from
    * the same fetcher and no fixture derivation remains on its path;
    * each defaults to the fixture surface.
    */
  def crawlPlan(spark: SparkSession, dir: String,
      agent: String = graft.sources.RobotsOps.FixtureAgent,
      globalCap: Int = 8, cycleSeconds: Double = 10.0,
      fetch: String => Option[String] =
        graft.sources.RobotsOps.fixtureFetch,
      sitemapBodies: Option[(DataFrame, DataFrame)] = None): DataFrame = {
    import graft.sources.RobotsOps
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    // candidates come through the full two-level index protocol (r15) —
    // same entry set as the flat parse by construction, so the plan (and
    // its oracle) is unchanged while the discovery path is the one a
    // 50k+-URL host actually publishes
    val sm = crawlSitemapIndex(spark, dir, bodies = sitemapBodies)
      .select(col("host"), col("url"), col("lastmod"), col("status"))
      .filter(col("status").isin("new", "stale"))
    val prio = docs.select(
      concat(lit("https://"), col("source"), lit("/"), col("lang"),
        lit("/p"), col("doc_id")).as("curl"),
      priorityCol.as("p"))
    // discoveries outrank refreshes: unseen pages are the crawl's whole
    // point, and the fixture's staleness priorities top out at 151
    val cand = sm.join(prio, sm("url") === prio("curl"), "left")
      .select(col("host"), col("url"),
        when(col("status") === "new", lit(160L)).otherwise(col("p")).as("priority"),
        col("status"),
        regexp_replace(col("url"), "^https://[^/]+", "").as("path"))
    val hosts = docs.select(col("source")).distinct().as[String].collect().toSeq
    val robots = RobotsOps.robotsByFetch(hosts, fetch)
    val admitted = RobotsOps.admitByHostPath(cand, "host", "path", robots, agent)
    val w = Window.partitionBy(col("host"))
      .orderBy(col("priority").desc, col("url").asc)
    val ranked = admitted.withColumn("slot", row_number().over(w))
      .filter(col("slot") <= globalCap)
    RobotsOps.capByCrawlDelay(ranked, "host", "slot", robots, agent,
        cycleSeconds, globalCap)
      .select(col("host"), col("slot").cast("long").as("slot"),
        col("url"), col("priority"), col("status"))
      .orderBy(col("host").asc, col("slot").asc)
  }

  /** Apply one crawl delta to a maintained IVF collection — the
    * reference's operational loop (re-crawl → re-embed → re-index,
    * `TencentVDB.py:69-79`, which blanket-overwrites EVERY id every run)
    * made incremental: only added/changed pages re-embed (map-side
    * [[graft.plans.FeatureHashEmbed]], zero shuffle) and re-index
    * through the partition-scoped [[graft.sources.CatalogOps.upsertIvf]]
    * (cells re-derived from the PERSISTED quantizer; only touched cell
    * partitions rewrite), and removed pages leave through
    * [[graft.sources.CatalogOps.deleteByIds]] (doomed partitions only).
    * Work per cycle ∝ |delta|, never the corpus.
    *
    * Idempotent on content: upsert is overwrite-by-id and delete is
    * id-anti-join, so re-applying the same delta is a no-op — which is
    * exactly the replay guarantee the streaming twin
    * ([[graft.streaming.StreamingOps.streamingCrawlMaintain]]) needs
    * under foreachBatch's at-least-once, in-order redelivery.
    *
    * `delta` carries (doc_id, change, text) — text non-null for
    * added/changed rows (the re-crawled body), ignored for removals.
    */
  def applyCrawlDelta(spark: SparkSession, db: String, name: String,
      delta: DataFrame, dim: Int = 64): Unit = {
    import graft.functions.VectorFunctions.l2Normalize
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
    import graft.sources.CatalogOps
    val ups = delta.filter(col("change").isin("added", "changed"))
      .select(col("doc_id").as("vec_id"),
        l2Normalize(toCol(graft.plans.FeatureHashEmbed(toExpr(col("text")), dim)))
          .as("embedding"))
    if (!ups.isEmpty) CatalogOps.upsertIvf(spark, db, name, ups)
    val rm = delta.filter(col("change") === "removed")
      .select(col("doc_id").as("vec_id"))
    if (!rm.isEmpty) CatalogOps.deleteByIds(spark, db, name, rm)
  }

  /** `q_crawl_maintain`: the whole maintained loop on the fixture —
    * build the IVF collection from the PREVIOUS crawl snapshot, apply
    * [[crawlDelta]]'s added/changed/removed pages through
    * [[applyCrawlDelta]], and emit the maintained collection's state
    * (vec_id, cell, content signature). Rows-only by design (k-means
    * cells and the hash embedder are engine-native); the streaming twin
    * and the batch apply are pinned equal in tests, and the maintained
    * content is pinned equal to embedding the post-delta corpus under
    * the frozen quantizer. Idempotent per session.
    */
  def crawlMaintainFixture(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions.l2Normalize
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
    import graft.sources.CatalogOps
    import graft.operators.KnnOps
    val db = "graft_crawl"
    val name = "kb"
    this.synchronized {
      // ready-check carries the fixture dir (ADVICE r14: a bare done
      // marker survives across sessions on a persistent warehouse and
      // would serve a stale collection when the fixture dir changes)
      val ready = spark.catalog.tableExists(s"$db.${name}__maintdone") && {
        val t = spark.table(s"`$db`.`${name}__maintdone`")
        t.columns.contains("fixture") && { // pre-r15 markers lack it: rebuild
          val r = t.agg(max(col("fixture"))).head()
          !r.isNullAt(0) && r.getString(0) == dir
        }
      }
      if (!ready) {
        CatalogOps.createDatabase(spark, db)
        Seq(name, s"${name}__model", s"${name}__maintdone").foreach(t =>
          KnnOps.dropTableAndDir(spark, db, t))
        val docs = Tables.documents(spark, dir)
        val old = oldSnapshot(docs).select(col("doc_id").as("vec_id"),
          l2Normalize(toCol(graft.plans.FeatureHashEmbed(toExpr(col("text")), 64)))
            .as("embedding"))
        CatalogOps.createIvfCollection(spark, db, name, old)
        val withText = crawlDelta(spark, dir)
          .join(newSnapshot(docs), Seq("doc_id"), "left")
          .select(col("doc_id"), col("change"), col("text"))
        applyCrawlDelta(spark, db, name, withText)
        spark.createDataFrame(Seq((1L, dir))).toDF("done", "fixture")
          .write.mode("overwrite").saveAsTable(s"`$db`.`${name}__maintdone`")
      }
    }
    spark.table(s"`$db`.`$name`")
      .select(col("vec_id"), col("cell").cast("long").as("cell"),
        xxhash64(array_join(transform(col("embedding"),
          x => round(x * 1e6).cast("long").cast("string")), ",")).as("sig"))
      .orderBy(col("vec_id").asc)
  }

  /** `q_crawl_e2e`: one crawl-cycle plan — the re-crawl delta's
    * added/changed pages fed straight into the politeness-capped,
    * staleness-ranked fetch schedule. The delta side reduces to (id,
    * change) before any join, host/priority attach from the corpus
    * snapshot, and the per-host rank bounds the output at hosts × cap —
    * at steady state the delta is the small side, so the schedule join
    * broadcasts it and the corpus never shuffles.
    */
  def crawlCycle(spark: SparkSession, dir: String,
                 perHostCap: Int = 5): DataFrame = {
    val refetch = crawlDelta(spark, dir)
      .filter(col("change").isin("added", "changed"))
      .select(col("doc_id"), col("change"))
    val pages = Tables.documents(spark, dir)
      .select(col("source").as("host"), col("doc_id"), priorityCol.as("priority"))
    val w = Window.partitionBy(col("host"))
      .orderBy(col("priority").desc, col("doc_id").asc)
    refetch.join(pages, Seq("doc_id"))
      .withColumn("slot", row_number().over(w))
      .filter(col("slot") <= perHostCap)
      .select(col("host"), col("slot").cast("long").as("slot"),
        col("doc_id"), col("change"), col("priority"))
      .orderBy(col("host").asc, col("slot").asc)
  }
}
