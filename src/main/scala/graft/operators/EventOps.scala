package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Event analytics in batch form (SURVEY §2.I) over the `events` fixture —
  * the batch-emulated halves of the streaming pair in
  * [[graft.streaming.StreamingOps]]. Value sums use the integer-micros
  * accumulator (engine-exact, see [[RelOps]]).
  */
object EventOps {

  /** Tumbling 1-day windows × event_type: the `groupBy(window(...))` shape.
    * One shuffle on (day, type); partial aggregation map-side. The
    * streaming twin adds a watermark and incremental state — same logical
    * aggregation.
    */
  def tumbling(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(round(col("value") * lit(1000000.0)).cast("long")).cast("double")
          / lit(1000000.0)).as("sum_value"))
      .select(col("w.start").as("day"), col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("day").asc, col("event_type").asc)

  /** Distinct users per tumbling day × type — the windowed-cardinality
    * report. The EXACT form shuffles (day, type, user) once for the
    * distinct then aggregates; Catalyst plans count(DISTINCT) as the
    * standard two-phase expand. At cardinalities where exact distinct is
    * the bottleneck, the HLL register path
    * ([[graft.sources.CatalogOps.hllRegisterRows]] grouped by window)
    * answers the same question in one partial-agg pass with ≤ m rows per
    * (window × task) — the spec pins it within the ±1.6% HLL contract
    * against this exact form.
    */
  def tumblingDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .select(col("w.start").as("day"), col("event_type"), col("n_users"))
      .orderBy(col("day").asc, col("event_type").asc)

  /** Hopping (sliding) windows: 1-day windows every 12 hours — each event
    * lands in windowLength/slide = 2 windows. Spark's `window()` generator
    * duplicates the row per window BEFORE the keyed aggregation, so the
    * plan stays one partial-agg shuffle; state in the streaming twin is
    * bounded by windows-per-key × key cardinality.
    */
  def hopping(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 day", "12 hours").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"))
      .orderBy(col("w_start").asc, col("event_type").asc)

  /** Gap-based sessionization in batch SQL: lag → gap>30 min flag → running
    * sum = session ordinal, then one aggregate per session. Two shuffles,
    * both on user_id (the window and the session group-by co-partition —
    * Catalyst reuses the exchange). The streaming twin is
    * `session_window` / `flatMapGroupsWithState`.
    */
  def sessionize(spark: SparkSession, dir: String, gapMinutes: Int = 30): DataFrame =
    sessionizeOn(Tables.events(spark, dir), gapMinutes)

  /** Parametric core of [[sessionize]] (events: user_id, event_id, ts) —
    * also the equivalence oracle the streaming twin's property tests
    * compare [[graft.streaming.StreamingOps.statefulSessions]] against
    * under randomized arrival orders.
    */
  private[graft] def sessionizeOn(events: DataFrame, gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val gapSec = gapMinutes * 60L
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > gapSec, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(byUser))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
      .orderBy(col("user_id").asc, col("session_id").asc)
  }

  /** Cohort retention matrix: users grouped by first-seen day, activity
    * counted per (cohort, day-offset) — the engagement query every events
    * warehouse runs. Two shuffles: first-seen per user, then the cohort
    * aggregation; the user→cohort join reuses the user_id partitioning
    * from the first-seen aggregate.
    */
  def retention(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
    val first = ev.groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort_day"))
    ev.join(first, "user_id")
      .select(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast("long").as("day_offset"),
        col("user_id"))
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort_day").asc, col("day_offset").asc)
  }

  /** Ordered funnel conversion (view → click → purchase): each step's
    * timestamp is the user's first qualifying event STRICTLY AFTER the
    * previous step — the order-sensitive conversion query a simple
    * per-type min cannot answer. Three conditional min-aggregations
    * chained by joins, every one hashed on user_id, so the exchanges
    * reuse one partitioning; funnel_stage = deepest step reached.
    */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"))
    val view = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("view_ts"))
    val click = ev.filter(col("event_type") === "click")
      .join(view, "user_id")
      .filter(col("ts") > col("view_ts"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("click_ts"))
    val purchase = ev.filter(col("event_type") === "purchase")
      .join(click, "user_id")
      .filter(col("ts") > col("click_ts"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("purchase_ts"))
    view.join(click, Seq("user_id"), "left")
      .join(purchase, Seq("user_id"), "left")
      .select(col("user_id"), col("view_ts"), col("click_ts"), col("purchase_ts"),
        when(col("purchase_ts").isNotNull, 3)
          .when(col("click_ts").isNotNull, 2)
          .otherwise(1).as("funnel_stage"))
      .orderBy(col("user_id").asc)
  }

  /** Build-if-absent maintained daily report for the contract query:
    * create from the even half of events, fold the odd half — every run
    * exercises both the create and the bucket-pruned fold (the maintained
    * -store fixture convention). Exact additive state ⇒ the served report
    * equals the direct groupBy bit-for-bit, so it faces the same oracle.
    */
  private[graft] def ensureAggReport(spark: SparkSession,
      dir: String): (String, String) = {
    import graft.sources.CatalogOps
    val db = "graft_report"
    val name = "events"
    this.synchronized {
      if (!spark.catalog.tableExists(s"$db.${name}__aggstore")) {
        CatalogOps.createDatabase(spark, db)
        KnnOps.dropTableAndDir(spark, db, s"${name}__aggstore")
        KnnOps.dropTableAndDir(spark, db, s"${name}__aggmeta")
        val rows = Tables.events(spark, dir).select(col("event_id"),
          date_trunc("day", col("ts")).as("day"), col("event_type"), col("value"))
        CatalogOps.createAggReport(spark, db, name,
          rows.filter(col("event_id") % 2 === 0),
          keys = Seq("day", "event_type"), valueCol = "value")
        CatalogOps.upsertAggReport(spark, db, name,
          rows.filter(col("event_id") % 2 =!= 0), batchId = 0L)
      }
    }
    (db, name)
  }

  /** `q_report_maintained`: the daily (day × type) count/sum report
    * served from the MAINTAINED aggregate store — [[tumbling]]'s
    * question answered without a corpus scan at ask time (the
    * incremental-materialized-view serving path).
    */
  def reportMaintained(spark: SparkSession, dir: String): DataFrame = {
    val (db, name) = ensureAggReport(spark, dir)
    graft.sources.CatalogOps.serveAggReport(spark, db, name)
      .orderBy(col("day").asc, col("event_type").asc)
  }

  /** Event-sequence pattern matching (`q_events_pattern`) — a
    * MATCH_RECOGNIZE-lite: each user's event history becomes one ordered
    * symbol string (first letter of the event type — the five fixture
    * types have distinct initials), and a regular expression counts
    * non-overlapping conversion paths `v[ce]*p` (a view leading to a
    * purchase through any clicks/errors, broken by a re-view or signup).
    * Unlike [[funnel]] (earliest-completion semantics), this counts
    * EVERY completed path per user.
    *
    * Scale shape: one shuffle on user_id; the per-user string is bounded
    * by events-per-user (the sessionize bound — users with 100 TB of
    * events are a data bug, not a plan input). The sort is in-group
    * (array_sort of (ts, event_id) structs — deterministic under ties),
    * the regex runs codegen'd per user row, never materializing pairs.
    * Pattern semantics are engine-portable: greedy non-overlapping
    * left-to-right scanning of a backtrack-free pattern matches
    * identically in Java regex and RE2.
    */
  def eventPattern(spark: SparkSession, dir: String,
      pattern: String = "v[ce]*p"): DataFrame =
    Tables.events(spark, dir)
      .select(col("user_id"),
        struct(col("ts"), col("event_id"),
          substring(col("event_type"), 1, 1).as("c")).as("e"))
      .groupBy(col("user_id"))
      .agg(array_join(
        transform(array_sort(collect_list(col("e"))), x => x.getField("c")),
        "").as("seq"))
      .select(col("user_id"),
        length(col("seq")).cast("long").as("seq_len"),
        regexp_count(col("seq"), lit(pattern)).cast("long").as("n_matches"))
      .orderBy(col("user_id").asc)

  /** Event-type transition matrix (`q_events_transitions`) — the Markov
    * first-order view of user behavior: for each consecutive event pair
    * within a user's timeline, count (from_type → to_type). The path
    * analytics primitive under "where do users go after a view?" and the
    * input to next-event prediction baselines; complements [[funnel]]
    * (one fixed path) and [[eventPattern]] (one fixed regex) with the
    * FULL |types|² picture.
    *
    * One shuffle on user_id for the lag window (ts, then event_id —
    * deterministic under timestamp ties), then a count aggregation whose
    * key space is |types|² — trivially partial-agg'd map-side, so the
    * second exchange carries at most |types|² rows per partition at any
    * corpus size.
    */
  def transitions(spark: SparkSession, dir: String): DataFrame =
    transitionsOn(Tables.events(spark, dir))

  /** Maintained transition-matrix store — the incremental form of a
    * NON-additive aggregate. A count/sum report folds by pure addition
    * ([[ensureAggReport]]); the transition matrix does not: a user's
    * last event of batch k and first event of batch k+1 form a
    * transition no within-batch pass can see. The store therefore
    * carries BOUNDARY STATE — each user's last (ts, event_id, type) —
    * and every fold adds three pieces: the batch's internal transitions,
    * the bridge transitions (stored boundary → the batch's first event
    * per user), and the refreshed boundary. Matrix rows, boundary rows,
    * and the replay watermark all live in ONE table (a `kind` column)
    * so a fold is a single atomic overwrite — state and watermark cannot
    * desync, the versioned-store/k-means-store commit design. Requires
    * time-ordered folds (each batch entirely after the last — the
    * ingest reality the streaming twin's watermark enforces end-to-end);
    * under that contract the served matrix equals the full-corpus batch
    * matrix EXACTLY, so it faces the same oracle.
    *
    * Scale: a fold shuffles only the batch (one user-partitioned window)
    * plus a |users|-row boundary join; the matrix is |types|² rows; the
    * overwrite is matrix + boundary + 1 row, never event history.
    */
  private[graft] def transStoreFold(spark: SparkSession, db: String,
      name: String, batch: DataFrame, batchId: Long): Unit = {
    val table = s"`$db`.`${name}__transstore`"
    val exists = spark.catalog.tableExists(s"$db.${name}__transstore")
    val prior =
      if (exists) {
        val t = spark.table(table)
        val wm = t.filter(col("kind") === "w")
          .select(max(col("batch_id"))).head().getLong(0)
        if (batchId <= wm) return // committed replay: no-op
        t
      } else null
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val evs = batch.select(col("user_id"), col("event_id"), col("ts"),
      col("event_type"))
    val internal = transitionsOn(evs)
      .select(col("from_type"), col("to_type"), col("n_trans").as("n"))
    val firstLast = evs
      .withColumn("rn", row_number().over(w))
      .withColumn("rnd", row_number().over(
        Window.partitionBy(col("user_id"))
          .orderBy(col("ts").desc, col("event_id").desc)))
    val first = firstLast.filter(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("first_type"))
    val last = firstLast.filter(col("rnd") === 1)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("to_type"))
    val (bridge, newBound) =
      if (prior == null) (spark.emptyDataFrame.select(lit("").as("from_type"),
        lit("").as("to_type"), lit(0L).as("n")).limit(0), last)
      else {
        val bound = prior.filter(col("kind") === "b")
          .select(col("user_id"), col("ts"), col("event_id"), col("to_type"))
        val br = bound.select(col("user_id"), col("to_type").as("from_type"))
          .join(first, "user_id")
          .groupBy(col("from_type"), col("first_type").as("to_type"))
          .agg(count(lit(1)).as("n"))
        // time-ordered folds: a user in the batch replaces its boundary
        val nb = bound.join(last.select(col("user_id")), Seq("user_id"),
          "left_anti").unionByName(last)
        (br, nb)
      }
    val oldMatrix =
      if (prior == null) internal.limit(0)
      else prior.filter(col("kind") === "m")
        .select(col("from_type"), col("to_type"), col("n"))
    val matrix = oldMatrix.unionByName(internal).unionByName(bridge)
      .groupBy(col("from_type"), col("to_type")).agg(sum(col("n")).as("n"))
    val out = matrix.select(lit("m").as("kind"), col("from_type"),
        col("to_type"), col("n"), lit(null).cast("long").as("user_id"),
        lit(null).cast("timestamp").as("ts"),
        lit(null).cast("long").as("event_id"), lit(batchId).as("batch_id"))
      .unionByName(newBound.select(lit("b").as("kind"),
        lit(null).cast("string").as("from_type"), col("to_type"),
        lit(null).cast("long").as("n"), col("user_id"), col("ts"),
        col("event_id"), lit(batchId).as("batch_id")))
      .unionByName(spark.range(1).select(lit("w").as("kind"),
        lit(null).cast("string").as("from_type"),
        lit(null).cast("string").as("to_type"),
        lit(null).cast("long").as("n"), lit(null).cast("long").as("user_id"),
        lit(null).cast("timestamp").as("ts"),
        lit(null).cast("long").as("event_id"), lit(batchId).as("batch_id")))
      .localCheckpoint() // materialize BEFORE overwriting the table it reads
    out.write.mode("overwrite").saveAsTable(s"`$db`.`${name}__transstore`")
  }

  /** Serve the maintained matrix — [[transitions]]'s question without an
    * event scan at ask time.
    */
  private[graft] def serveTransStore(spark: SparkSession, db: String,
      name: String): DataFrame =
    spark.table(s"`$db`.`${name}__transstore`")
      .filter(col("kind") === "m")
      .select(col("from_type"), col("to_type"), col("n").as("n_trans"))
      .orderBy(col("n_trans").desc, col("from_type").asc, col("to_type").asc)

  /** `q_events_transitions_stored`: build-if-absent fixture — create the
    * store from the chronologically FIRST half of events, fold the
    * second half (both the create and the boundary-bridged fold exercise
    * every contract run), serve the matrix. Equals the one-shot batch
    * matrix exactly → faces the SAME oracle as `q_events_transitions`.
    */
  def transitionsStored(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.CatalogOps
    val db = "graft_trans"
    val name = "events"
    this.synchronized {
      if (!spark.catalog.tableExists(s"$db.${name}__transstore")) {
        CatalogOps.createDatabase(spark, db)
        KnnOps.dropTableAndDir(spark, db, s"${name}__transstore")
        val evs = Tables.events(spark, dir)
        val bounds = evs.select(min(col("ts")).cast("long").as("lo"),
          max(col("ts")).cast("long").as("hi")).head()
        val mid = bounds.getLong(0) + (bounds.getLong(1) - bounds.getLong(0)) / 2
        transStoreFold(spark, db, name,
          evs.filter(col("ts").cast("long") <= mid), batchId = 0L)
        transStoreFold(spark, db, name,
          evs.filter(col("ts").cast("long") > mid), batchId = 1L)
      }
    }
    serveTransStore(spark, db, name)
  }

  /** Daily volume anomaly report (`q_events_anomaly`) — for each
    * (event_type, day) the z-score of that day's event count against the
    * type's own daily distribution, with |z| ≥ 2 flagged. The
    * ops-monitoring staple over an event firehose (tracking outages,
    * bot storms, double-fire bugs).
    *
    * Cross-engine exactness: the mean/stddev inputs stay INTEGER all the
    * way — per-type D (days), S (Σ count), Q (Σ count²) — and z is ONE
    * shared double expression over them,
    * (D·x − S) / sqrt(D · (D·Q − S²) / (D − 1)), identical operand
    * order in both engines (each step is a correctly-rounded IEEE op, so
    * the engines agree bit-for-bit before the round-6). A built-in
    * `stddev` would sum doubles in partition order — nondeterministic
    * across engines AND runs; the integer moments are order-free.
    *
    * Scale: one (type, day)-keyed count (partial-agg'd), one type-keyed
    * moment aggregation whose output is |types| rows broadcast back —
    * the corpus never shuffles twice.
    */
  def dailyAnomalies(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val moments = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("d"), sum(col("n")).as("s"),
        sum(col("n") * col("n")).as("q"))
    val z = (col("d") * col("n") - col("s")).cast("double") /
      sqrt(col("d").cast("double") *
        (col("d") * col("q") - col("s") * col("s")).cast("double") /
        (col("d") - 1).cast("double"))
    daily.join(broadcast(moments), Seq("event_type"))
      .filter(col("d") > 1 && col("d") * col("q") - col("s") * col("s") > 0)
      .select(col("event_type"), col("day"), col("n"),
        round(z, 6).as("z"),
        (abs(round(z, 6)) >= 2.0).cast("long").as("is_anomaly"))
      .orderBy(col("event_type").asc, col("day").asc)
  }

  private[graft] def transitionsOn(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    events
      .select(col("user_id"), col("event_type").as("to_type"),
        lag(col("event_type"), 1).over(w).as("from_type"))
      .filter(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_trans"))
      .orderBy(col("n_trans").desc, col("from_type").asc, col("to_type").asc)
  }
}
