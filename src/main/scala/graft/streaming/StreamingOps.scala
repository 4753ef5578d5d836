package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

/** One event row, typed (the `events` fixture schema minus props). */
case class Ev(user_id: Long, event_id: Long, ts: Timestamp, event_type: String, value: Double)

/** One finalized event-type transition of [[StreamingOps.statefulTransitions]]. */
case class TransitionOut(user_id: Long, from_type: String, to_type: String)

/** Keyed state of [[StreamingOps.statefulTransitions]]: the last FINAL
  * event (nothing can arrive before it any more) plus the not-yet-final
  * buffer, both as (tsMs, event_id, event_type).
  */
case class TransState(last: Option[(Long, Long, String)],
    pending: List[(Long, Long, String)])

/** A closed user session emitted by the stateful operator. */
case class SessionOut(user_id: Long, n_events: Long, start_ts: Timestamp, end_ts: Timestamp)

/** Keyed state carried per user by [[StreamingOps.statefulSessions]]. */
case class SessState(n: Long, start: Long, end: Long)

/** Structured Streaming operators (SURVEY §2.I) — the true-streaming twins
  * of [[graft.operators.EventOps]]. The reference has no data-plane
  * streaming; its nearest analog is the mutable chat-session state keyed by
  * session and reset on mode change (`main_server.py:69-84`), which maps to
  * keyed state in `flatMapGroupsWithState`.
  *
  * Every transform takes the input DataFrame (from `readStream` in
  * production, `MemoryStream` in tests) and returns a streaming DataFrame —
  * source/sink-agnostic, so the same code runs batch or streaming.
  *
  * Scale notes: all three are keyed-state aggregations — state is
  * partitioned by group key across executors, watermarks bound state size
  * (late data beyond 1 hour is dropped and its state evicted). No
  * unbounded driver state anywhere.
  */
object StreamingOps {

  /** Tumbling 1-day counts × event_type with a 1-hour watermark — the
    * incremental form of [[graft.operators.EventOps.tumbling]]. Append-mode
    * compatible: windows close when the watermark passes their end.
    */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("day"), col("event_type"), col("n"))

  /** Gap-based sessions via the built-in `session_window` (30-minute gap) —
    * the streaming twin of [[graft.operators.EventOps.sessionize]]. State =
    * one open window per (user, session), merged as events arrive, closed
    * by the watermark.
    *
    * Boundary convention: `session_window` SPLITS two events exactly one
    * gap apart (its per-event interval is half-open `[t, t+gap)`), while
    * the batch twin's `gap > gapSec` test keeps them together — Spark's
    * built-in is not configurable here, so the two agree everywhere except
    * the measure-zero exact-gap boundary ([[statefulSessions]] follows the
    * batch convention; the cross-validation test avoids exact-gap pairs).
    */
  def sessionWindows(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("start_ts"),
        col("w.end").as("end_ts"), col("n_events"))

  /** Stream-stream interval join: each purchase joined to the same user's
    * clicks from the preceding hour. Both sides are watermarked so the join
    * state is bounded: a click is held only until the watermark passes its
    * join horizon (purchase_ts ∈ [click_ts, click_ts + 1h]). The equi key
    * (user_id) partitions state across executors.
    */
  def clickToPurchaseJoin(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("p_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("c_id"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", "1 hour")
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("p_user").as("user_id"), col("p_id"), col("p_ts"),
        col("c_id"), col("c_ts"))
  }

  /** Watermarked windowed TOP-K: the bounded-heap aggregate
    * ([[graft.plans.TopKScoreId]]) inside a streaming window aggregation —
    * per tumbling day, the k highest-value events. The same
    * partial-merge contract that bounds the batch shuffle bounds the
    * streaming STATE here: each open window stores k entries, not its
    * event history; windows emit on watermark close (append mode).
    */
  def windowedTopK(events: DataFrame, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
    val topk = toCol(graft.plans.TopKScoreId(
      toExpr(col("value")), toExpr(col("event_id")), k).toAggregateExpression())
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(topk.as("topk"))
      .select(col("w.start").as("day"), posexplode(col("topk")).as(Seq("pos", "hit")))
      .select(col("day"), (col("pos") + 1).cast("int").as("rank"),
        col("hit.vec_id").as("event_id"), col("hit.score").as("value"))
  }

  /** Streaming ingest into a catalog collection: each micro-batch runs the
    * overwrite-by-id merge ([[graft.sources.CatalogOps.upsert]], the
    * reference's `coll.upsert` loop `TencentVDB.py:74-79` made incremental).
    * `foreachBatch` is the escape hatch that lets a streaming source drive
    * a batch sink transactionally per micro-batch; at scale the inner
    * upsert is the partition-scoped variant.
    */
  def streamingUpsert(stream: DataFrame, db: String, name: String,
      idCol: String): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!batch.isEmpty) {
          graft.sources.CatalogOps.upsert(batch.sparkSession, db, name, batch.toDF(), idCol)
        }
      }
      .start()

  /** Streaming ARCHIVE ingest (r16 — the streaming twin of
    * `q_warc_parse`/`q_warc_wet`): WARC members arrive as a stream of
    * (host, warc) blobs (how a live crawl hands archives to the
    * pipeline), each micro-batch re-splits and parses the members
    * ([[graft.sources.WarcOps.warcParseOn]]), converts the length-valid
    * 200 responses to WET text ([[graft.sources.WarcOps.wetOn]] — the
    * SAME core the batch entry runs), and merges by url into a catalog
    * collection (last-writer-wins, the re-crawl contract). Parse and
    * conversion are STATELESS map-side work, so replay safety comes
    * from the upsert's idempotence — re-delivering a member rewrites
    * the same rows.
    */
  def streamingWarcIngest(memberStream: DataFrame, db: String,
      name: String): StreamingQuery =
    memberStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!batch.isEmpty) {
          val wet = graft.sources.WarcOps.wetOn(
            graft.sources.WarcOps.warcParseOn(batch.toDF()))
          graft.sources.CatalogOps.upsert(
            batch.sparkSession, db, name, wet, "url")
        }
      }
      .start()

  /** STREAMING curation funnel (r16 — the live data-card twin of
    * `q_curation_funnel`): each micro-batch runs the same per-document
    * gate battery ([[graft.operators.TextAnalysisOps.funnelFlagsOn]] —
    * lang-id, Gopher battery, repetition, decontamination, mix), takes
    * its dedup first-arrival from the maintained bloom store, and
    * appends ONE stage-totals row to the `{name}__funnel` log. Totals
    * are associative integer sums, so the served report (sum the log,
    * render) equals the batch funnel below bloom saturation when
    * delivery is doc_id-ordered.
    */
  def streamingCurationFunnel(docStream: DataFrame, evalDocs: DataFrame,
      db: String, name: String): StreamingQuery = {
    import graft.operators.TextAnalysisOps
    val evalNg = TextAnalysisOps.ngramSet(evalDocs).cache()
    val q = docStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          import org.apache.spark.sql.functions.{col, lit}
          val spark = batch.sparkSession
          // replay guard: totals are SUMS, so a redelivered batch would
          // double-count — the batch_id column is the commit watermark
          // (the maintained-store family convention). Commit order is
          // totals-row-THEN-store-advance (r16 ADVICE): a crash before
          // the append replays against the unmoved bloom (same flags);
          // a crash after it skips the recompute here and the advance
          // below catches the store up idempotently (OR-algebra).
          val replayed = spark.catalog.tableExists(s"$db.${name}__funnel") &&
            !spark.table(s"`$db`.`${name}__funnel`")
              .filter(col("batch_id") === batchId).isEmpty
          if (!replayed) {
            TextAnalysisOps
              .funnelIncrementalBatch(batch.toDF(), evalNg, db, name)
              .withColumn("batch_id", lit(batchId))
              .write.mode("append")
              .saveAsTable(s"`$db`.`${name}__funnel`")
          }
          // on a fresh batch this is the normal advance; on a replay the
          // totals row already landed but the store may lag — re-upsert
          TextAnalysisOps.funnelAdvanceBloom(batch.toDF(), db, name)
        }
      }
      .start()
    releaseOnTermination(docStream.sparkSession, q, () => { evalNg.unpersist(); () })
    q
  }

  /** STREAMING archive→training spine (r17 — the live twin of
    * `q_archive_e2e`): each micro-batch of WARC members re-splits,
    * parses, length-gates and main-content-extracts map-side
    * ([[graft.sources.WarcOps.extractOf]] — the SAME core the batch
    * entry runs), takes its dedup first-arrival from the maintained
    * bloom store, runs the stateless gate battery against the STATIC
    * eval n-gram set, and appends one shard-partials set to the
    * `{name}__shards` log. Serving folds the log
    * ([[graft.sources.WarcOps.shardReportOf]] — sums and mins are
    * associative; the balance ppm computes at serve). Replay safety is
    * the crash-atomic funnel discipline: batch_id watermark on the log,
    * partials committed BEFORE the store advance, store catch-up
    * idempotent by OR-algebra.
    */
  def streamingArchiveSpine(memberStream: DataFrame, evalDocs: DataFrame,
      db: String, name: String): StreamingQuery = {
    import graft.operators.TextAnalysisOps
    import graft.sources.WarcOps
    val evalNg = TextAnalysisOps.ngramSet(evalDocs).cache()
    val q = memberStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          import org.apache.spark.sql.functions.{col, lit}
          val spark = batch.sparkSession
          val xdocs = WarcOps.extractOf(batch.toDF()).localCheckpoint()
          if (!graft.sources.CatalogOps.batchCommitted(spark, db,
              s"${name}__shards", batchId)) {
            graft.sources.CatalogOps.appendBatchLog(spark, db,
              s"${name}__shards",
              WarcOps.archiveIncrementalBatch(xdocs, evalNg, db, name),
              batchId)
          }
          // fresh batch: the normal advance; replay: idempotent catch-up
          TextAnalysisOps.funnelAdvanceBloom(xdocs, db, name)
        }
      }
      .start()
    releaseOnTermination(memberStream.sparkSession, q, () => { evalNg.unpersist(); () })
    q
  }

  /** STREAMING revisit-aware archive spine (r18): like
    * [[streamingArchiveSpine]] but extraction is STORE-BACKED — each
    * micro-batch digests its valid records, anti-joins the maintained
    * `{name}__xtexts` store, block-score-extracts ONLY never-seen
    * digests, and folds its capture corpus from store ∪ new
    * ([[graft.sources.WarcOps.revisitXdocsOf]]) before the standard
    * bloom first-arrival + gate battery + shard-partials append. Across
    * a stream of real crawls this is where the revisit collapse pays:
    * an unchanged page re-fetched in every crawl extracts exactly once,
    * ever. Replay safety: the store append is idempotent by anti-join
    * (content-addressed digests), the partials log keeps the batch_id
    * guard, the bloom advance is OR-idempotent.
    */
  def streamingArchiveRevisitSpine(memberStream: DataFrame,
      evalDocs: DataFrame, db: String, name: String): StreamingQuery = {
    import graft.operators.TextAnalysisOps
    import graft.sources.WarcOps
    val evalNg = TextAnalysisOps.ngramSet(evalDocs).cache()
    val q = memberStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          import org.apache.spark.sql.functions.{col, lit}
          val spark = batch.sparkSession
          val xdocs = WarcOps.revisitXdocsOf(batch.toDF(), db, name,
            gen = batchId)
          if (!graft.sources.CatalogOps.batchCommitted(spark, db,
              s"${name}__shards", batchId)) {
            graft.sources.CatalogOps.appendBatchLog(spark, db,
              s"${name}__shards",
              WarcOps.archiveIncrementalBatch(xdocs, evalNg, db, name),
              batchId)
          }
          TextAnalysisOps.funnelAdvanceBloom(xdocs, db, name)
        }
      }
      .start()
    releaseOnTermination(memberStream.sparkSession, q, () => { evalNg.unpersist(); () })
    q
  }

  /** STREAMING spine-survivor export (r19 — VERDICT task 1, live
    * form): each micro-batch of EXTRACTED docs (doc_id, lang, source,
    * text) passes the incremental gate battery — bloom-store exact
    * dedup first-arrival plus the stateless gates against the static
    * `evalNg` decontamination side input — and the SURVIVING curated
    * text lands through
    * [[graft.sources.CatalogOps.exportIncrementalBatch]]'s idempotent
    * `(shard, batch_id)` partition write, with the batch's manifest
    * partials appended in docs → log → bloom-advance commit order.
    *
    * The replay discipline differs from [[streamingVerifiedExport]] in
    * one load-bearing way: the bloom advance runs EVEN FOR REPLAYED
    * batches (it is an idempotent bit-OR), because a crash between the
    * log append and the store advance would otherwise leave the dedup
    * state permanently behind the log. Conversely a batch missing its
    * log row recomputes IDENTICAL survivors on replay precisely
    * because the commit order guarantees its bloom advance has not
    * happened yet — gates replayed against un-advanced state are
    * deterministic. WarcSpec walks both crash windows.
    */
  def streamingSpineExport(xdocStream: DataFrame, evalNg: DataFrame,
      db: String, name: String): StreamingQuery = {
    import graft.sources.{CatalogOps, WarcOps}
    import graft.operators.TextAnalysisOps
    xdocStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          // checkpoint once: the gate battery reads the batch many ways
          val xdocs = batch.toDF().localCheckpoint()
          if (!CatalogOps.batchCommitted(spark, db,
              s"${name}__manifestlog", batchId)) {
            CatalogOps.appendBatchLog(spark, db, s"${name}__manifestlog",
              CatalogOps.exportIncrementalBatch(spark, db, name,
                WarcOps.survivorDocs(xdocs, evalNg,
                  WarcOps.incrementalDedupFlags(xdocs, db, name)),
                batchId, repartitionTasks = 16),
              batchId)
          }
          TextAnalysisOps.funnelAdvanceBloom(xdocs, db, name)
        }
      }
      .start()
  }

  /** STREAMING full crawl loop (r19 — VERDICT task 2, live form):
    * each micro-batch is one crawl CYCLE's fetched WARC members
    * (host, warc). The batch runs store-backed revisit extraction
    * ([[graft.sources.WarcOps.revisitXdocsOf]] — parse, digest,
    * anti-join the maintained `{name}__xtexts` store, block-score
    * ONLY never-seen digests), then the incremental gate battery, and
    * the surviving curated text lands through the idempotent
    * (shard, batch_id) export write with manifest partials appended
    * in docs → log → bloom-advance commit order.
    *
    * Three maintained stores, one commit discipline: the extraction
    * store needs NO ordering (content-addressed — a replayed append
    * anti-joins to a no-op, a double write could only write identical
    * bytes); the export docs/log pair keeps the docs → log order so a
    * missing log row means an idempotent partition rewrite on replay;
    * the bloom advance runs LAST and re-runs even on replayed batches
    * (idempotent bit-OR — the [[streamingSpineExport]] discipline),
    * so no crash window leaves dedup state behind the log.
    */
  def streamingCrawlArchive(memberStream: DataFrame, evalNg: DataFrame,
      db: String, name: String): StreamingQuery = {
    import graft.sources.{CatalogOps, WarcOps}
    import graft.operators.TextAnalysisOps
    memberStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          // the extraction store advances unconditionally (replay-safe
          // by content addressing) and yields the cycle's capture-grain
          // corpus, checkpointed inside revisitXdocsOf
          val xdocs = WarcOps.revisitXdocsOf(batch.toDF(), db, name,
            gen = batchId)
          if (!CatalogOps.batchCommitted(spark, db,
              s"${name}__manifestlog", batchId)) {
            CatalogOps.appendBatchLog(spark, db, s"${name}__manifestlog",
              CatalogOps.exportIncrementalBatch(spark, db, name,
                WarcOps.survivorDocs(xdocs, evalNg,
                  WarcOps.incrementalDedupFlags(xdocs, db, name)),
                batchId, repartitionTasks = 16),
              batchId)
          }
          TextAnalysisOps.funnelAdvanceBloom(xdocs, db, name)
        }
      }
      .start()
  }

  /** STREAMING verified export (r18 — the live composition of the r17
    * batch export and the shard-partials discipline): each micro-batch
    * of (doc_id, text) documents lands in the shard-partitioned
    * collection through
    * [[graft.sources.CatalogOps.exportIncrementalBatch]] — an
    * IDEMPOTENT dynamic overwrite of the batch's own `(shard,
    * batch_id)` partitions, so foreachBatch's at-least-once redelivery
    * rewrites bytes instead of duplicating them — and appends the
    * batch's manifest partials to `{name}__manifestlog` in
    * docs-then-log commit order. The replay guard (batch_id already in
    * the log) makes every crash window converge: docs without log →
    * rewrite + log once; docs with log → skip both.
    * [[graft.sources.CatalogOps.exportVerifiedStreamServe]] then
    * recomputes the manifest FROM THE WRITTEN TABLE and reconciles it
    * against the folded log — stream-in → verified-shards-out.
    */
  def streamingVerifiedExport(docStream: DataFrame, db: String,
      name: String, repartitionTasks: Int = 16): StreamingQuery = {
    // repartitionTasks=16 (one task per shard) is the live DEFAULT: it
    // bounds each batch at one file per (shard, batch) AND ingests ~2×
    // faster than the unrepartitioned form (28.2 vs 52.7 s for 16
    // batches of 12.5k docs, 256 vs 8192 files — `graft.ExportScale`);
    // the answer is write-layout-invariant either way
    import graft.sources.CatalogOps
    docStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          import org.apache.spark.sql.functions.{col, lit}
          val spark = batch.sparkSession
          if (!CatalogOps.batchCommitted(spark, db,
              s"${name}__manifestlog", batchId)) {
            CatalogOps.appendBatchLog(spark, db, s"${name}__manifestlog",
              CatalogOps.exportIncrementalBatch(spark, db, name,
                batch.toDF(), batchId, repartitionTasks),
              batchId)
          }
        }
      }
      .start()
  }

  /** Streaming knn — the reference's query path (`searchByText`, ref
    * `main_server.py:40-44`) as a stream: each micro-batch of query
    * vectors (query_id, q_embedding) is answered with the bounded-heap
    * top-k against the STATIC corpus
    * ([[graft.operators.KnnOps.topKForQueries]]), through `foreachBatch`
    * like [[streamingUpsert]] — stateless per batch, so there is no
    * streaming-aggregation state to watermark. The micro-batch query side
    * broadcasts; the corpus is scanned per batch and never broadcast or
    * shuffled (the 100 TB side stays put; over an IVF collection the
    * inner scorer swaps for the partition-pruned probe). `sink` receives
    * each batch's ranked results with its batch id.
    */
  def streamingKnn(queryStream: DataFrame, corpus: DataFrame, k: Int = 3)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    queryStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        if (!batch.isEmpty)
          sink(graft.operators.KnnOps.topKForQueries(batch.toDF(), corpus, k), id)
      }
      .start()

  /** Streaming knn over an IVF-partitioned collection
    * ([[graft.sources.CatalogOps.createIvfCollection]]) — the 100 TB
    * streaming ANN: each micro-batch picks its probe cells from the
    * persisted model and reads ONLY those partitions
    * ([[graft.operators.KnnOps.topKForQueriesIvf]]), so a query batch
    * touches nprobe/kCells of the corpus instead of scanning it.
    */
  def streamingKnnIvf(queryStream: DataFrame, db: String, name: String,
      k: Int = 3, nprobe: Int = 2)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    queryStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        if (!batch.isEmpty)
          sink(graft.operators.KnnOps.topKForQueriesIvf(
            batch.sparkSession, db, name, batch.toDF(), k, nprobe), id)
      }
      .start()

  /** Streaming knn over an int8-QUANTIZED collection
    * ([[graft.sources.CatalogOps.createQuantizedCollection]]) — the
    * byte-scan streaming ANN: each micro-batch runs the single-plan
    * two-phase probe ([[graft.operators.KnnOps.topKForQueriesQuantized]]):
    * phase 1 reads codes only (~⅛ the bytes) against the broadcast query
    * batch, phase 2 rescores the bounded candidate set at full precision —
    * one job per batch, no driver round-trip between phases.
    */
  def streamingKnnQuantized(queryStream: DataFrame, db: String, name: String,
      full: DataFrame, k: Int = 3, rescoreK: Int = 12)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    queryStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        if (!batch.isEmpty)
          sink(graft.operators.KnnOps.topKForQueriesQuantized(
            batch.sparkSession, db, name, full, batch.toDF(), k, rescoreK), id)
      }
      .start()

  /** Streaming twin of the projected two-phase knn: each query
    * micro-batch scores against the stored JL collection through
    * [[graft.operators.KnnOps.topKForQueriesProjected]] — queries
    * project in-plan, the coarse scan reads outDim doubles per row,
    * survivors rescore at full precision. Same per-batch contract as
    * [[streamingKnnQuantized]].
    */
  def streamingKnnProjected(queryStream: DataFrame, db: String, name: String,
      full: DataFrame, k: Int = 3, rescoreK: Int = 12)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    queryStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        if (!batch.isEmpty)
          sink(graft.operators.KnnOps.topKForQueriesProjected(
            batch.sparkSession, db, name, full, batch.toDF(), k, rescoreK), id)
      }
      .start()

  /** Streaming crawl-cycle maintenance — the reference's operational
    * loop (re-crawl → re-embed → re-index, `TencentVDB.py:69-79`) as a
    * maintained pipeline: each micro-batch of crawl-delta rows
    * (doc_id, change, text) re-embeds its added/changed pages map-side
    * and folds them into the IVF collection through the partition-scoped
    * upsert, and retires its removed pages through the partition-scoped
    * delete ([[graft.operators.FrontierOps.applyCrawlDelta]] per batch).
    * Work per batch ∝ |delta|; the collection and its quantizer model
    * are the persisted state.
    *
    * Replay safety WITHOUT a watermark: the batch apply is idempotent on
    * content (upsert is overwrite-by-id, delete an id-anti-join), so
    * foreachBatch's at-least-once, in-order redelivery folds to the same
    * collection by algebra — the bloom-store argument, with idempotence
    * in place of the OR monoid. (Cross-batch REORDERING would not be
    * safe — a replayed older batch could regress an id — but Structured
    * Streaming replays batches in order by contract.) Pinned in
    * StreamingSpec: streamed batches ≡ the one-shot batch apply ≡ the
    * post-delta corpus under the frozen quantizer, and a re-applied
    * batch is a content no-op.
    */
  def streamingCrawlMaintain(deltaStream: DataFrame, db: String,
      name: String, dim: Int = 64): StreamingQuery =
    deltaStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!batch.isEmpty)
          graft.operators.FrontierOps.applyCrawlDelta(
            batch.sparkSession, db, name, batch.toDF(), dim)
      }
      .start()

  /** Streaming NEAR-DUP dedup — the continuous-crawl ingest filter
    * ([[graft.operators.DedupOps.dedupIncrementalBatch]] per micro-batch):
    * each batch of (doc_id, text) dedupes within itself, probes the
    * persisted MinHash signature store for cross-batch near-duplicates
    * (banded equi-join, batch side broadcast — the store is never
    * rescanned), and appends only the fresh uniques + their band keys.
    * First-arrival-wins across batches; [[streamingDedup]] remains the
    * exact-id twin. foreachBatch is at-least-once and the batch commit is
    * replay-safe: a commit marker per batchId makes a fully-committed
    * batch a no-op, and the partial-crash windows between the two appends
    * close via sigs-first ordering + idempotent id-anti-joined appends
    * (see [[graft.operators.DedupOps.dedupIncrementalBatch]]) — no
    * transactional table format required.
    */
  def streamingDedupMinhash(docStream: DataFrame, db: String, name: String,
      tau: Double = 0.9): StreamingQuery =
    docStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty)
          graft.operators.DedupOps.dedupIncrementalBatch(batch.toDF(), db, name,
            tau, batchId = Some(batchId))
      }
      .start()

  /** Streaming SUBSTRING dedup — the span-coverage ingest filter
    * ([[graft.operators.DedupOps.substringIncrementalBatch]] per
    * micro-batch): each batch of (doc_id, text) docs is dropped or kept
    * by how much of it duplicates `w`-token spans of the retained corpus
    * so far (persisted window-hash store, probe pruned by a broadcast of
    * the batch's hashes) or of lower-id docs in the same batch — the
    * boilerplate/template class [[streamingDedupMinhash]]'s document-
    * level signatures cannot see. Kept docs + their window hashes
    * append; first writer owns a hash. Replay-safe via the same commit
    * watermark + ownership-healed partial-crash windows (pinned in
    * StreamingSpec).
    */
  def streamingDedupSubstring(docStream: DataFrame, db: String, name: String,
      w: Int = 20, maxDupRatio: Double = 0.5): StreamingQuery =
    docStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty)
          graft.operators.DedupOps.substringIncrementalBatch(batch.toDF(), db, name,
            w, maxDupRatio, batchId = Some(batchId))
      }
      .start()

  /** STREAMING sequence packing — the stateful tail the curation stream
    * hands off to ([[graft.operators.TextAnalysisOps
    * .packingIncrementalBatch]] per micro-batch): every doc lands with
    * the training-sequence assignment its shard's token stream position
    * dictates, and the position advances — [[graft.operators
    * .TextAnalysisOps.packSequences]] made arrival-ordered. Offsets live
    * in an append-only per-shard delta log (state update = O(touched
    * shards) appends, reads pruned to the batch's shards, compaction =
    * [[graft.sources.CatalogOps.compactPacklog]] folding the committed
    * prefix); replay-safe via batch-id-scoped reads + idempotent appends
    * + the commit watermark (crash windows pinned).
    */
  def streamingPackSequences(docStream: DataFrame, db: String, name: String,
      budget: Int = 512, shardSize: Int = 128): StreamingQuery =
    docStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty)
          graft.operators.TextAnalysisOps.packingIncrementalBatch(batch.toDF(),
            db, name, budget, shardSize, batchId = Some(batchId))
      }
      .start()

  /** Streaming IMAGE near-dup — the perceptual-hash ingest filter for a
    * continuous multimodal crawl
    * ([[graft.operators.DedupOps.imageIncrementalBatch]] per micro-batch):
    * each batch of (doc_id, payload) binary images is dropped when its
    * dHash lands within `maxHamming` bits of a retained image (persisted
    * chunk-keyed fingerprint store, probe pruned to the batch's chunk
    * buckets) or of a lower-id image in the same batch — re-encoded and
    * resized copies of a stored picture never land twice. Payloads no
    * codec claims pass through unjudged. Same commit watermark +
    * ownership-healed replay windows as the text twins (pinned in
    * StreamingSpec).
    */
  def streamingDedupImage(mediaStream: DataFrame, db: String, name: String,
      maxHamming: Int = 8): StreamingQuery =
    mediaStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty)
          graft.operators.DedupOps.imageIncrementalBatch(batch.toDF(), db, name,
            maxHamming, batchId = Some(batchId))
      }
      .start()

  /** Streaming PARAGRAPH dedup — the Dolma-style bloom-membership form
    * of [[graft.operators.DedupOps.dedupParagraph]]
    * ([[graft.operators.DedupOps.paragraphIncrementalBatch]] per
    * micro-batch): each batch's paragraphs probe the maintained bloom
    * store (first arrival clean, every later occurrence duplicated —
    * across batches via the store, within a batch via the (doc_id, pos)
    * window), per-doc accounting + the 20% keep gate append to
    * `{name}__results` keyed by batch_id, and the batch's paragraph
    * hashes fold into the store. The word log is idempotent by algebra
    * (OR — no watermark needed for STATE); a replayed batch's output
    * rows drift (its hashes are already stored), so the results sink
    * keys on (doc_id, batch_id) — at-least-once, pinned in
    * StreamingSpec along with streamed ≡ exact-first-arrival below
    * saturation.
    */
  def streamingDedupParagraph(docStream: DataFrame, db: String,
      name: String): StreamingQuery =
    docStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          import org.apache.spark.sql.functions.lit
          graft.operators.DedupOps
            .paragraphIncrementalBatch(batch.toDF(), db, name)
            .withColumn("batch_id", lit(batchId))
            .write.mode("append")
            .saveAsTable(s"`$db`.`${name}__results`")
        }
      }
      .start()

  /** Streaming URL-dedup ingest filter — the exact-key member of the
    * incremental-dedup family ([[graft.operators.DedupOps
    * .urlIncrementalBatch]] per micro-batch): first arrival wins each
    * CANONICAL url, so a re-crawl under case/port/tracking-param/fragment
    * noise never lands twice. Store `{name}__urlseen`, probe pruned by a
    * broadcast of the batch's canonical urls; replay-safe the family's
    * two-layer way (commit watermark + ownership-healed crash windows,
    * pinned in StreamingSpec).
    */
  def streamingDedupUrl(docStream: DataFrame, db: String,
      name: String): StreamingQuery =
    docStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty)
          graft.operators.DedupOps.urlIncrementalBatch(batch.toDF(), db, name,
            batchId = Some(batchId))
      }
      .start()

  /** Streaming AUDIO near-dup ingest filter — the spectral-fingerprint
    * twin of [[streamingDedupImage]]
    * ([[graft.operators.DedupOps.audioIncrementalBatch]] per
    * micro-batch): a volume-changed or re-encoded copy of a retained
    * recording never lands twice; undecodable payloads pass through
    * unjudged. Same store layout and replay discipline (shared core,
    * pinned in StreamingSpec).
    */
  def streamingDedupAudio(mediaStream: DataFrame, db: String, name: String,
      maxHamming: Int = 6): StreamingQuery =
    mediaStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty)
          graft.operators.DedupOps.audioIncrementalBatch(batch.toDF(), db, name,
            maxHamming, batchId = Some(batchId))
      }
      .start()

  /** Streaming substring TRIM — the cleaning twin of
    * [[streamingDedupSubstring]]: every incoming doc lands, but spans
    * already owned by the retained corpus (or by a lower-id doc in the
    * same micro-batch) are excised first
    * ([[graft.operators.DedupOps.substringTrimIncrementalBatch]]) — the
    * streaming form of [[graft.operators.DedupOps.dedupSubstringTrim]]'s
    * keep-the-first-occurrence contract. Same window-hash store layout,
    * same commit watermark + ownership-healed replay windows.
    */
  def streamingTrimSubstring(docStream: DataFrame, db: String, name: String,
      w: Int = 20): StreamingQuery =
    docStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty)
          graft.operators.DedupOps.substringTrimIncrementalBatch(batch.toDF(), db, name,
            w, batchId = Some(batchId))
      }
      .start()

  /** Streaming knn over a PQ collection
    * ([[graft.sources.CatalogOps.createPqCollection]]) — the ADC streaming
    * ANN: each micro-batch's query LUTs build driver-side against the
    * persisted codebooks and broadcast into the M-lookups-per-row code
    * scan ([[graft.operators.KnnOps.topKForQueriesPq]]), with the bounded
    * candidate set rescored at full precision — one job per batch, like
    * [[streamingKnnQuantized]] but dimension-independent per scanned row.
    */
  def streamingKnnPq(queryStream: DataFrame, db: String, name: String,
      full: DataFrame, k: Int = 3, rescoreK: Int = 12)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    queryStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        if (!batch.isEmpty)
          sink(graft.operators.KnnOps.topKForQueriesPq(
            batch.sparkSession, db, name, full, batch.toDF(), k, rescoreK), id)
      }
      .start()

  /** Streaming knn over an IVF-PQ collection
    * ([[graft.sources.CatalogOps.createIvfPqCollection]]) — the composed
    * 100 TB index served per micro-batch: queries route to their cells
    * driver-side, the scan prunes to the batch's union of cell
    * partitions, surviving rows pay M ADC byte-lookups only against the
    * queries that probed their cell, and the bounded candidates rescore
    * at full precision ([[graft.operators.KnnOps.topKForQueriesIvfPq]]) —
    * both prunings multiply, one job per batch.
    */
  def streamingKnnIvfPq(queryStream: DataFrame, db: String, name: String,
      full: DataFrame, k: Int = 3, rescoreK: Int = 12, nprobe: Int = 2)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    queryStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        if (!batch.isEmpty)
          sink(graft.operators.KnnOps.topKForQueriesIvfPq(
            batch.sparkSession, db, name, full, batch.toDF(), k, rescoreK, nprobe), id)
      }
      .start()

  /** Streaming knn over a ROUTED NSW collection
    * ([[graft.sources.CatalogOps.createNswRoutedCollection]]) — the graph
    * member of the streaming ANN family (exact / IVF / int8 / PQ /
    * graphs): each micro-batch's queries route driver-side against the
    * persisted coarse model, the graph scan prunes to the union of probed
    * cells, and each pruned graph beam-searches only its own queries
    * ([[graft.operators.GraphAnnOps.searchStoredRoutedBatch]]) — one job
    * per batch, nprobe·batch graph searches instead of graphs·batch.
    */
  def streamingKnnNswRouted(queryStream: DataFrame, db: String, name: String,
      k: Int = 3, efSearch: Int = 100, nprobe: Int = 2)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    queryStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        if (!batch.isEmpty)
          sink(graft.operators.GraphAnnOps.searchStoredRoutedBatch(
            batch.sparkSession, db, name, batch.toDF(), k, efSearch, nprobe), id)
      }
      .start()

  /** Streaming BM25 statistics maintenance — the lexical-index analog of
    * the streaming vector-ingest paths: each micro-batch of
    * (doc_id, text) appends its exact mergeable partials to the persisted
    * BM25 store ([[graft.sources.CatalogOps.bm25StatsIncrementalBatch]]),
    * so [[graft.operators.RetrievalOps.bm25TopKStoredOn]] always serves
    * current corpus statistics without ever rescanning the corpus.
    * Replay-safe under foreachBatch's at-least-once contract: committed
    * batches no-op via the commit watermark, and the two appends are
    * individually idempotent through batch-id partition tagging.
    * StreamingSpec pins stream-equals-batch and replay convergence.
    */
  def streamingBm25Stats(docStream: DataFrame, db: String,
      name: String): StreamingQuery =
    docStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        if (!batch.isEmpty)
          graft.sources.CatalogOps.bm25StatsIncrementalBatch(batch.toDF(), db, name, id)
      }
      .start()

  /** Streaming maintenance of the inverted postings index
    * ([[graft.sources.CatalogOps.postingsIncrementalBatch]]) — the
    * ingest-side twin of [[streamingBm25Stats]], usually run on the SAME
    * document stream so the three lexical logs (stats, df, postings)
    * advance together and [[graft.operators.RetrievalOps
    * .bm25TopKIndexedOn]] serves current posting lists with zero corpus
    * scans. Replay-safe the same two-layer way: commit watermark +
    * batch-id partition idempotency. StreamingSpec pins
    * stream-equals-batch and replay convergence.
    */
  def streamingPostings(docStream: DataFrame, db: String,
      name: String): StreamingQuery =
    docStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        if (!batch.isEmpty)
          graft.sources.CatalogOps.postingsIncrementalBatch(batch.toDF(), db, name, id)
      }
      .start()

  /** Streaming term-sketch maintenance — each doc micro-batch folds into
    * the persisted SpaceSaving summary
    * ([[graft.sources.CatalogOps.upsertTermSketch]]); replay-safe via the
    * stored watermark (state + watermark in one overwrite).
    */
  def streamingTermSketch(docStream: DataFrame, db: String, name: String,
      m: Int = 256): StreamingQuery =
    docStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        if (!batch.isEmpty)
          graft.sources.CatalogOps.upsertTermSketch(
            batch.sparkSession, db, name, batch.toDF(), id, m)
      }
      .start()

  /** Streaming q-digest maintenance — each doc micro-batch digests once
    * (partial-agg'd, sketch-sized result) and folds into the persisted
    * per-source quantile sketches
    * ([[graft.sources.CatalogOps.upsertQdigest]]); replay-safe via the
    * stored watermark (state + watermark in one overwrite), bootstrap on
    * a missing store (the source-counts convention).
    */
  def streamingQdigest(docStream: DataFrame, db: String, name: String,
      levels: Int = 10, capacity: Int = 256): StreamingQuery =
    docStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        if (!batch.isEmpty)
          graft.sources.CatalogOps.upsertQdigest(
            batch.sparkSession, db, name, batch.toDF(), id, levels, capacity)
      }
      .start()

  /** Streaming maintenance of an additive aggregate report
    * ([[graft.sources.CatalogOps.upsertAggReport]]) — the incremental
    * materialized view fed one micro-batch at a time: each batch
    * aggregates once (tiny) and rewrites only the key-hash buckets it
    * touches. A missing store bootstraps from the first batch WITH that
    * batch's id as the per-bucket watermark, so a redelivered first
    * micro-batch is a no-op like any other replay (the source-counts
    * convention, hardened for the create path).
    */
  def streamingAggReport(rowStream: DataFrame, db: String, name: String,
      keys: Seq[String], valueCol: String, buckets: Int = 32): StreamingQuery =
    rowStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          if (!spark.catalog.tableExists(s"$db.${name}__aggmeta"))
            graft.sources.CatalogOps.createAggReport(
              spark, db, name, batch.toDF(), keys, valueCol, buckets, batchId = id)
          else
            graft.sources.CatalogOps.upsertAggReport(spark, db, name, batch.toDF(), id)
        }
      }
      .start()

  /** Streaming bloom-store maintenance — each key micro-batch appends its
    * word rows ([[graft.sources.CatalogOps.upsertBloomStore]]). Uniquely
    * among the maintained stores this needs NO watermark or batch-id
    * bookkeeping: the store is an OR-fold and OR is idempotent, so an
    * at-least-once redelivery appends rows that fold to the same bits —
    * replay safety by algebra (pinned bit-for-bit in OperatorSpec).
    */
  def streamingBloomStore(keyStream: DataFrame, db: String, name: String,
      keyCol: String): StreamingQuery =
    keyStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!batch.isEmpty)
          graft.sources.CatalogOps.upsertBloomStore(
            batch.sparkSession, db, name, batch.toDF(), keyCol)
      }
      .start()

  /** Streaming HLL maintenance — the distinct-count registers fold under
    * MAX ([[graft.sources.CatalogOps.upsertHllStore]]), so like the bloom
    * twin this needs no watermark: redelivery appends rows the fold
    * absorbs by idempotence.
    */
  def streamingHllStore(keyStream: DataFrame, db: String, name: String,
      keyCol: String): StreamingQuery =
    keyStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!batch.isEmpty)
          graft.sources.CatalogOps.upsertHllStore(
            batch.sparkSession, db, name, batch.toDF(), keyCol)
      }
      .start()

  /** Streaming versioned ingest — every micro-batch becomes one
    * time-travel snapshot ([[graft.sources.CatalogOps
    * .upsertVersionedBatch]]); the batch-id watermark rides the manifest
    * overwrite, so an at-least-once redelivery returns the committed
    * head without writing and versions never duplicate.
    */
  def streamingVersioned(docStream: DataFrame, db: String, name: String,
      idCol: String = "doc_id"): StreamingQuery =
    docStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        if (!batch.isEmpty) {
          graft.sources.CatalogOps.upsertVersionedBatch(
            batch.sparkSession, db, name, batch.toDF(), id, idCol)
          ()
        }
      }
      .start()

  /** Streaming zonemap-indexed ingest — each micro-batch appends to the
    * collection and then indexes ONLY the files it created
    * ([[graft.sources.CatalogOps.upsertZonemap]]). A third watermark-free
    * maintenance argument: the store is a set of per-FILE facts and
    * files are immutable, so file identity is the high-water mark — a
    * replayed upsertZonemap sees no unknown files and is a no-op.
    * (The batch append itself is at-least-once like any foreachBatch
    * sink append; pair with the versioned or dedup ingest paths when the
    * collection needs exactly-once rows.)
    */
  def streamingZonemapIngest(docStream: DataFrame, db: String, name: String,
      cols: Seq[String]): StreamingQuery =
    docStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!batch.isEmpty) {
          batch.toDF().write.mode("append").saveAsTable(s"`$db`.`$name`")
          graft.sources.CatalogOps.upsertZonemap(batch.sparkSession, db, name, cols)
        }
      }
      .start()

  /** Streaming TEMPERATURE mixing — each (doc_id, source, …) micro-batch
    * folds its source counts into the maintained store and is mixed with
    * rates derived from the updated counts
    * ([[graft.operators.TextAnalysisOps.tempMixIncrementalBatch]]);
    * kept rows go to the sink. Arrival-ordered: rates converge to the
    * batch rule's as the stream drains.
    */
  def streamingTempMix(docStream: DataFrame, db: String, name: String,
      targetFrac: Double = 0.5)(sink: (DataFrame, Long) => Unit): StreamingQuery =
    docStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        if (!batch.isEmpty)
          sink(graft.operators.TextAnalysisOps.tempMixIncrementalBatch(
            batch.toDF(), db, name, id, targetFrac), id)
      }
      .start()

  /** Streaming DSIR — the maintained importance model
    * ([[graft.sources.CatalogOps.createDsirModel]]) fed one micro-batch
    * at a time, each batch weighed against the counts SO FAR
    * ([[graft.operators.MlOps.dsirIncrementalBatch]]). Model folds are
    * replay-safe via the row-carried watermark; emitted weights are
    * at-least-once — key the sink on (doc_id, batch_id).
    */
  def streamingDsir(docStream: DataFrame, db: String, name: String,
      targetLang: String = "en")
      (sink: (DataFrame, Long) => Unit): StreamingQuery =
    docStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        if (!batch.isEmpty)
          sink(graft.operators.MlOps.dsirIncrementalBatch(
            batch.toDF(), db, name, id, targetLang), id)
      }
      .start()

  /** Streaming k-means model maintenance — each embedding micro-batch
    * applies one mini-batch step to the persisted quantizer
    * ([[graft.sources.CatalogOps.upsertKmeansModel]]). Replay-safe by
    * construction: the model row set carries its own batch-id watermark
    * and state + watermark land in ONE overwrite, so an at-least-once
    * replay of any crash window is a no-op.
    */
  def streamingKmeans(embStream: DataFrame, db: String,
      name: String): StreamingQuery =
    embStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        if (!batch.isEmpty)
          graft.sources.CatalogOps.upsertKmeansModel(
            batch.sparkSession, db, name, batch.toDF(), id)
      }
      .start()

  /** Streaming positional-index maintenance — the phrase-query artifact
    * ([[graft.sources.CatalogOps.createPositions]]) fed one micro-batch
    * at a time, replay-safe via the same commit-watermark + batch-id-
    * partition idempotence as [[streamingPostings]].
    */
  def streamingPositions(docStream: DataFrame, db: String,
      name: String): StreamingQuery =
    docStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        if (!batch.isEmpty)
          graft.sources.CatalogOps.positionsIncrementalBatch(batch.toDF(), db, name, id)
      }
      .start()

  /** Streaming INDEXED BM25 query serving — [[streamingBm25]]'s zero-
    * corpus-scan twin: each (query_id, qtext) micro-batch is answered
    * from the postings index alone ([[graft.operators.RetrievalOps
    * .bm25ForQueriesIndexed]]); no corpus frame in the signature at all,
    * because the serving path never needs one. Stateless per batch.
    */
  /** Streaming PHRASE serving — each (query_id, phrase) micro-batch is
    * answered from the positional index alone
    * ([[graft.operators.RetrievalOps.phraseForQueriesIndexed]]): zero
    * corpus scans, one bucket-pruned positions probe per batch.
    * Stateless per batch, the phrase twin of [[streamingBm25Indexed]].
    */
  def streamingPhraseIndexed(queryStream: DataFrame, db: String,
      name: String)(sink: (DataFrame, Long) => Unit): StreamingQuery =
    queryStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        if (!batch.isEmpty)
          sink(graft.operators.RetrievalOps.phraseForQueriesIndexed(
            batch.sparkSession, db, name, batch.toDF()), id)
      }
      .start()

  def streamingBm25Indexed(queryStream: DataFrame, db: String, name: String,
      k: Int = 10)(sink: (DataFrame, Long) => Unit): StreamingQuery =
    queryStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        if (!batch.isEmpty)
          sink(graft.operators.RetrievalOps.bm25ForQueriesIndexed(
            batch.sparkSession, db, name, batch.toDF(), k), id)
      }
      .start()

  /** Streaming BM25 QUERY serving — the lexical member of the streaming
    * retrieval family (exact / IVF / int8 / PQ / graph knn all have one):
    * each micro-batch of (query_id, qtext) is answered from the persisted
    * BM25 statistics store in one corpus scan
    * ([[graft.operators.RetrievalOps.bm25ForQueriesStored]]) — stateless
    * per batch, batch side driver-bounded + broadcast, corpus never
    * shuffled. Pair with [[streamingBm25Stats]] maintaining the same store
    * for the full streaming lexical stack.
    */
  def streamingBm25(queryStream: DataFrame, db: String, name: String,
      corpus: DataFrame, k: Int = 10)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    queryStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        if (!batch.isEmpty)
          sink(graft.operators.RetrievalOps.bm25ForQueriesStored(
            batch.sparkSession, corpus, db, name, batch.toDF(), k), id)
      }
      .start()

  /** Stream-static enrichment: every micro-batch hash-joins against the
    * broadcast dimension (no streaming state at all — the static side is a
    * plain batch DataFrame, re-broadcast per batch). The streaming form of
    * the dimension-lookup join: at scale the dimension is the small side by
    * definition, so the stream never shuffles.
    */
  def enrichWithDim(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), key)

  /** Streaming exact dedup — the overwrite-by-id upsert semantics
    * (ref `TencentVDB.py:69-70`) on a stream: first-writer-wins per
    * event_id within the watermark horizon; late duplicates beyond 1 hour
    * age out of state (bounded memory — the streaming analog of
    * [[graft.operators.DedupOps.dedupExact]]).
    */
  def streamingDedup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming benchmark decontamination — the ingest-filter stage a
    * continuous crawl runs BEFORE near-dup dedup: each document
    * micro-batch drops rows sharing any word n-gram with the eval suite
    * ([[graft.operators.TextAnalysisOps.decontaminateBatch]]). The eval
    * n-gram set is computed ONCE here and cached: per batch it is a
    * broadcast probe — stateless, no store, no shuffle of the batch.
    * Composes with [[streamingDedupMinhash]] by feeding the survivors'
    * sink into that stage's store.
    */
  def streamingDecontaminate(docStream: DataFrame, evalDocs: DataFrame,
      n: Int = 4)(sink: (DataFrame, Long) => Unit): StreamingQuery = {
    val evalNg = graft.operators.TextAnalysisOps.ngramSet(evalDocs, n).cache()
    evalNg.count() // materialize once, before the first batch
    val q = docStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        if (!batch.isEmpty)
          sink(graft.operators.TextAnalysisOps.decontaminateBatch(
            batch.toDF(), evalNg, n), id)
      }
      .start()
    releaseOnTermination(docStream.sparkSession, q, () => { evalNg.unpersist(); () })
    q
  }

  /** Streaming SEMANTIC decontamination — the embedding-space twin of
    * [[streamingDecontaminate]]: each micro-batch of embedded documents
    * drops rows whose max cosine against the eval suite reaches tau
    * ([[graft.operators.KnnOps.semanticDecontaminateBatch]]). The eval
    * vectors collapse to ONE cached row here; per batch they ride a
    * broadcast and the max-cosine folds map-side — stateless, no store,
    * the batch never shuffles. Runs beside the n-gram stage (verbatim
    * inclusion) to catch paraphrase leakage as documents arrive.
    */
  def streamingDecontaminateSem(embStream: DataFrame, evalEmb: DataFrame,
      tau: Double = 0.45)(sink: (DataFrame, Long) => Unit): StreamingQuery = {
    val evalVecs = graft.operators.KnnOps.evalVecsOf(evalEmb).cache()
    evalVecs.count() // materialize once, before the first batch
    val q = embStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        if (!batch.isEmpty)
          sink(graft.operators.KnnOps.semanticDecontaminateBatch(
            batch.toDF(), evalVecs, tau), id)
      }
      .start()
    releaseOnTermination(embStream.sparkSession, q,
      () => { evalVecs.unpersist(); () })
    q
  }

  /** Release a cached frame when a streaming query terminates — without
    * this every started/stopped stream leaves a cached plan in executor
    * storage for the session's lifetime (unpersist is idempotent, so the
    * immediate-termination race at worst releases twice).
    */
  private def releaseOnTermination(spark: SparkSession,
      q: StreamingQuery, release: () => Unit): Unit = {
    val streams = spark.streams
    streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = ()
      override def onQueryTerminated(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit =
        if (e.id == q.id) { release(); streams.removeListener(this) }
    })
    if (!q.isActive) release() // terminated before the listener attached
  }

  /** The CONTINUOUS curation front — the streaming twin of
    * [[graft.operators.TextAnalysisOps.curateEndToEnd]]'s
    * gate → decontaminate → dedup chain (packing stays batch-side: it
    * needs global shard offsets): each micro-batch of
    * (doc_id, source, text) docs passes the MAP-SIDE curation gates
    * (token floor + weighted domain-mix bucket — rows drop before
    * anything expensive), clears against the once-computed cached eval
    * n-gram broadcast, and the survivors run the replay-safe near-dup
    * ingest ([[graft.operators.DedupOps.dedupIncrementalBatch]]) into
    * the persisted `db.name` collection — commit watermark + idempotent
    * appends, the same crash-window contract as every ingest stream
    * here. The per-batch stage order IS the batch composite's 100 TB
    * cost order, now paid incrementally per micro-batch.
    */
  def streamingCurate(docStream: DataFrame, evalDocs: DataFrame, db: String,
      name: String, minTokens: Int = 20, tau: Double = 0.9,
      n: Int = 4): StreamingQuery = {
    import graft.operators.{DedupOps, TextAnalysisOps}
    val evalNg = TextAnalysisOps.ngramSet(evalDocs, n).cache()
    val q = docStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          val gated = TextAnalysisOps.curateGates(batch.toDF(), minTokens)
          val clean = TextAnalysisOps.decontaminateBatch(gated, evalNg, n)
          DedupOps.dedupIncrementalBatch(
            clean.select(org.apache.spark.sql.functions.col("doc_id"),
              org.apache.spark.sql.functions.col("text")),
            db, name, tau, batchId = Some(batchId))
        }
      }
      .start()
    releaseOnTermination(docStream.sparkSession, q, () => { evalNg.unpersist(); () })
    q
  }

  /** [[streamingCurate]] with LANGUAGE IDENTIFICATION as the first gate
    * (r15 — the streaming twin of `q_curate_e2e_lang`'s composition):
    * each micro-batch derives every document's label from surface text
    * ([[graft.operators.LangIdOps.withDerivedLangOn]] — lenient
    * rendering, a stream is not vocabulary-frozen), drops non-target
    * languages BEFORE the token-floor/mix gates, then decontaminates
    * and folds survivors into the maintained near-dup store exactly as
    * the plain composite does. The language gate is STATELESS (a
    * map-side projection), so replay safety and the crash-window
    * contract are inherited unchanged from [[streamingCurate]]'s
    * batch-id-idempotent fold.
    */
  def streamingCurateLang(docStream: DataFrame, evalDocs: DataFrame,
      db: String, name: String, targetLang: String = "en",
      minTokens: Int = 20, tau: Double = 0.9, n: Int = 4): StreamingQuery = {
    import graft.operators.{DedupOps, LangIdOps, TextAnalysisOps}
    import org.apache.spark.sql.functions.col
    val evalNg = TextAnalysisOps.ngramSet(evalDocs, n).cache()
    val q = docStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          val langGated = LangIdOps.withDerivedLangOn(batch.toDF())
            .filter(col("predicted") === targetLang)
            .select(col("doc_id"), col("source"), col("text"))
          val gated = TextAnalysisOps.curateGates(langGated, minTokens)
          val clean = TextAnalysisOps.decontaminateBatch(gated, evalNg, n)
          DedupOps.dedupIncrementalBatch(
            clean.select(col("doc_id"), col("text")),
            db, name, tau, batchId = Some(batchId))
        }
      }
      .start()
    releaseOnTermination(docStream.sparkSession, q, () => { evalNg.unpersist(); () })
    q
  }

  /** [[streamingCurate]] with C4 LINE CLEANING as the first stage (r16 —
    * the streaming twin of `q_curate_e2e_c4`'s composition): each
    * micro-batch's pages pass the C4 battery
    * ([[graft.operators.TextAnalysisOps.c4KeptOn]] — line retention by
    * terminal punctuation / ≥5 words / no "javascript", page drops for
    * bad words, "lorem ipsum", braces, <3 retained sentences), and the
    * RETAINED text (line joins flattened to spaces, the batch chain's
    * one-token-convention) feeds the token-floor/mix gates,
    * decontamination, and the replay-safe near-dup fold. The C4 stage
    * is STATELESS (a map-side projection), so replay safety and the
    * crash-window contract are inherited unchanged from
    * [[streamingCurate]]'s batch-id-idempotent fold.
    */
  def streamingCurateC4(docStream: DataFrame, evalDocs: DataFrame,
      db: String, name: String, minTokens: Int = 20, tau: Double = 0.9,
      n: Int = 4): StreamingQuery = {
    import graft.operators.{DedupOps, TextAnalysisOps}
    import org.apache.spark.sql.functions.{col, translate}
    val evalNg = TextAnalysisOps.ngramSet(evalDocs, n).cache()
    val q = docStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          val cleaned = TextAnalysisOps.c4KeptOn(batch.toDF())
            .withColumn("text", translate(col("text"), "\n", " "))
          val gated = TextAnalysisOps.curateGates(cleaned, minTokens)
          val clean = TextAnalysisOps.decontaminateBatch(gated, evalNg, n)
          DedupOps.dedupIncrementalBatch(
            clean.select(col("doc_id"), col("text")),
            db, name, tau, batchId = Some(batchId))
        }
      }
      .start()
    releaseOnTermination(docStream.sparkSession, q, () => { evalNg.unpersist(); () })
    q
  }

  /** Custom keyed state with `flatMapGroupsWithState`: per-user session
    * accumulation with explicit timeout — the chat-session analog (carry
    * history while active, emit + reset on gap, ref `main_server.py:69-84`).
    * Event-time timeout keyed to the watermark; emits a [[SessionOut]] when
    * a session closes. Watermark-accepted events older than the open
    * session's reach accumulate into their own running session (closed on a
    * > gap jump or at batch end), matching the batch sessionize twin's
    * grouping of such events instead of emitting one singleton per event.
    */
  def statefulSessions(events: Dataset[Ev], gapMs: Long = 30L * 60 * 1000): Dataset[SessionOut] = {
    import events.sparkSession.implicits._

    def update(userId: Long, rows: Iterator[Ev],
        state: GroupState[SessState]): Iterator[SessionOut] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator.single(SessionOut(userId, s.n, new Timestamp(s.start), new Timestamp(s.end)))
      } else {
        val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
        var closed = List.empty[SessionOut]
        var cur = state.getOption
        // running session of too-old late events: two late events within
        // gap of each other are ONE session in the batch twin, not two
        // singletons — accumulate, close on a > gap jump or at batch end
        var late: Option[SessState] = None
        def closeLate(): Unit = late.foreach { l =>
          closed ::= SessionOut(userId, l.n, new Timestamp(l.start), new Timestamp(l.end))
          late = None
        }
        sorted.foreach { e =>
          val t = e.ts.getTime
          cur match {
            // within gap of EITHER bound: a late-but-accepted event may
            // precede the current start — extend with min/max. The lower
            // bound matters: without it any t <= s.end satisfies
            // t - s.end <= gap and an arbitrarily old late event would
            // merge in and regress the session start.
            case Some(s) if t - s.end <= gapMs && s.start - t <= gapMs =>
              var ns = SessState(s.n + 1, math.min(s.start, t), math.max(s.end, t))
              // a downward start extension may bring the late accumulator
              // into reach — absorb it rather than emit a split the batch
              // twin would merge
              late match {
                case Some(l) if ns.start - l.end <= gapMs =>
                  ns = SessState(ns.n + l.n, math.min(ns.start, l.start), ns.end)
                  late = None
                case _ => () // keep pending: start may still decrease
              }
              cur = Some(ns)
            case Some(s) if s.start - t > gapMs =>
              // older than the open session's reach: the batch twin would
              // have closed these as their own session(s) before it began
              late match {
                case Some(l) if t - l.end <= gapMs =>
                  late = Some(SessState(l.n + 1, l.start, math.max(l.end, t)))
                case _ =>
                  closeLate()
                  late = Some(SessState(1L, t, t))
              }
            case Some(s) =>
              closed ::= SessionOut(userId, s.n, new Timestamp(s.start), new Timestamp(s.end))
              cur = Some(SessState(1L, t, t))
              // the open session's start can never again reach the late
              // accumulator after a forward > gap jump — final, close it
              closeLate()
            case None =>
              cur = Some(SessState(1L, t, t))
          }
        }
        closeLate()
        cur.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(s.end + gapMs)
        }
        closed.reverseIterator
      }
    }

    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update)
  }

  /** Streaming twin of [[graft.operators.EventOps.transitionsOn]]'s
    * per-user transition rows: each consecutive (by event time, event_id
    * tie-break) pair of a user's events emits one (from_type, to_type)
    * row, EXACTLY once, regardless of arrival order across micro-batches.
    *
    * Finality argument (why a pair can be emitted): the watermark
    * guarantees no future event with ts < watermark. A buffered pair
    * (a, b), adjacent in event-time order, is FINAL once ts(b) ≤
    * watermark — any event that could still split it would need
    * ts ∈ (ts(a), ts(b)) ≤ watermark, which can no longer arrive. So each
    * invocation ripens the prefix of the sorted buffer up to the
    * watermark, emits its chained transitions (seeded by the stored last
    * final event), and keeps only the unripe tail — state per user is the
    * last final event plus the ≤ watermark-delay-bounded tail, the same
    * bound as every keyed-state op here. An event-time timeout at the
    * newest pending ts flushes users that stop receiving data. Same-ts
    * pairs order by event_id, matching the batch window's tie-break;
    * batch ≡ streaming pinned under randomized arrival schedules in
    * TransitionProperties.
    */
  def statefulTransitions(events: Dataset[Ev]): Dataset[TransitionOut] = {
    import events.sparkSession.implicits._

    def update(userId: Long, rows: Iterator[Ev],
        state: GroupState[TransState]): Iterator[TransitionOut] = {
      val prior = state.getOption.getOrElse(TransState(None, Nil))
      val arrived = rows.map(e => (e.ts.getTime, e.event_id, e.event_type)).toList
      val wm = state.getCurrentWatermarkMs()
      val sorted = (prior.pending ++ arrived).sortBy(t => (t._1, t._2))
      val (ripe, tail) = sorted.span(_._1 <= wm)
      val chain = prior.last.toList ++ ripe
      val out = chain.zip(chain.drop(1))
        .map { case (a, b) => TransitionOut(userId, a._3, b._3) }
      val next = TransState(chain.lastOption, tail)
      state.update(next)
      if (tail.nonEmpty) state.setTimeoutTimestamp(tail.map(_._1).max)
      out.iterator
    }

    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update)
  }

  /** Streaming-MAINTAINED transition matrix: the watermark-finalized
    * transition rows of [[statefulTransitions]] (each emitted exactly
    * once) fold into the additive aggregate store — compose the
    * order-sensitive half (keyed state finalizes event order) with the
    * additive half (per-bucket-watermarked count folds), and the
    * non-additive aggregate becomes a maintained artifact with no
    * bespoke store code. Serve via
    * [[graft.sources.CatalogOps.serveAggReport]]: (from_type, to_type,
    * n) with no event scan at ask time. A redelivered micro-batch
    * no-ops at the bucket watermark; an idle user flushes through the
    * state op's event-time timeout. The batch twin of the SERVED matrix
    * is [[graft.operators.EventOps.transitionsOn]] — equality pinned in
    * StreamingSpec.
    */
  def streamingTransitionMatrix(events: Dataset[Ev], db: String,
      name: String, buckets: Int = 32): StreamingQuery = {
    import events.sparkSession.implicits._
    streamingAggReport(
      statefulTransitions(events).toDF().withColumn("one", lit(1.0)),
      db, name, keys = Seq("from_type", "to_type"), valueCol = "one", buckets)
  }
}
