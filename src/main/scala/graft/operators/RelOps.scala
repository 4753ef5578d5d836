package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Relational capability parity (SURVEY §2.E–H) over the TPC-H-ish fixtures.
  * The reference delegates all relational semantics to its vector-DB server
  * (filter indexes, top-k); these queries express the same class of
  * operations Spark-first so Catalyst owns the physical strategy.
  *
  * Determinism discipline (FIXTURES.md): every floating aggregate goes
  * through an exact DECIMAL accumulation and is cast back to double at the
  * end — float summation order differs between engines/partitionings, decimal
  * arithmetic does not. Every output has a total ORDER BY with an integer
  * tie-break.
  *
  * Scale notes per query are inline; the common principles:
  *  - aggregations are partial (map-side combine) before the key shuffle;
  *  - small dimension tables are broadcast explicitly;
  *  - windows shuffle once on their partition key;
  *  - no driver-side collection anywhere.
  */
object RelOps {

  /** Exact integral accumulator (quantities in the fixture are whole
    * numbers): long sums are associative and engine-independent.
    */
  private def sumInt(c: Column): Column = sum(c.cast("long")).cast("double")

  /** Exact money accumulator: scale to integral micros, sum as long, scale
    * back. Double summation order differs across partitionings/engines and
    * can flip a rounded digit; integer summation cannot. The per-row
    * `round(c*1e6)` is deterministic (same IEEE product + same
    * away-from-zero rounding in Spark and DuckDB).
    */
  private def sumMoney(c: Column): Column =
    sum(round(c * lit(1000000.0)).cast("long")).cast("double") / lit(1000000.0)

  // ---- §2.E aggregations ----

  /** Hash aggregation, TPC-H Q1 shape: sums/avg/count by a low-cardinality
    * key. Partial aggregation runs map-side (HashAggregate → Exchange →
    * HashAggregate), so the shuffle carries one row per (key × partition) —
    * scale-independent of input rows.
    */
  def aggHash(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sumInt(col("l_quantity")).as("sum_qty"),
        sumMoney(col("l_extendedprice")).as("sum_base_price"),
        round(sumInt(col("l_quantity")) / count(lit(1)), 6).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag").asc, col("l_linestatus").asc)

  /** Distinct aggregation: Spark expands count(distinct) into a two-stage
    * partial-distinct plan (Expand → partial agg on (key, value) → final) —
    * no single-node distinct set ever materializes.
    */
  def aggDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        countDistinct(col("o_custkey")).as("n_custs"),
        countDistinct(col("o_orderpriority")).as("n_prios"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderstatus").asc)

  /** HLL approximate distinct — the sketch path for 100 TB cardinalities
    * (constant memory per group vs the exact expand plan). No oracle by
    * design (approximate ≠ DuckDB's estimate); the driver records a
    * rows-only check.
    */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"))
      .agg(approx_count_distinct(col("o_custkey"), 0.01).as("approx_custs"))
      .orderBy(col("o_orderstatus").asc)

  /** Rollup (grouping sets): one Expand node feeds a single hash aggregate —
    * all grouping levels computed in one pass over the data.
    * NULL grouping slots are surfaced as 'ALL' so the total ORDER BY is
    * engine-independent (Spark sorts nulls first, DuckDB last).
    */
  def groupingSets(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      // grouping() discriminates a rollup subtotal from a real NULL data
      // value — coalesce alone would label both 'ALL' and collide them.
      // It must be evaluated IN the agg (the rollup bitmap is gone after).
      .agg(grouping(col("l_returnflag")).as("__gr"),
        grouping(col("l_linestatus")).as("__gl"),
        sumMoney(col("l_extendedprice")).as("sum_price"), count(lit(1)).as("n"))
      .select(
        when(col("__gr") === 1, "ALL")
          .otherwise(coalesce(col("l_returnflag"), lit("NULL"))).as("returnflag"),
        when(col("__gl") === 1, "ALL")
          .otherwise(coalesce(col("l_linestatus"), lit("NULL"))).as("linestatus"),
        col("sum_price"), col("n"))
      .orderBy(col("returnflag").asc, col("linestatus").asc)

  // ---- §2.F joins ----

  /** Equi inner join on the natural key. Large⋈large on o_custkey/c_custkey
    * → planner picks sort-merge or shuffled-hash; both sides shuffle ONCE on
    * the join key. At 100 TB: bucket both tables by custkey at ingest and
    * the shuffle disappears.
    */
  def joinHash(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"), "inner")
      .select(col("o_orderkey"), col("c_name"), col("c_mktsegment"),
        col("o_totalprice"))
      .orderBy(col("o_orderkey").asc)

  /** Skew-salted equi join — same semantics as [[joinHash]], skew-proof
    * plan: the fact side adds a salt in [0, S) to its key, the dimension
    * side replicates each row S times (one per salt), and the join runs on
    * (key, salt) — a hot key's rows now spread over S reducers instead of
    * one straggler. This is the manual form of what AQE skew-join does
    * adaptively; oracle-checked to produce exactly the [[joinHash]] result.
    */
  def joinSalted(spark: SparkSession, dir: String, salts: Int = 8): DataFrame = {
    val facts = Tables.orders(spark, dir)
      .withColumn("salt", pmod(xxhash64(col("o_orderkey")), lit(salts.toLong)))
    val dims = Tables.customer(spark, dir)
      .withColumn("salt", explode(sequence(lit(0L), lit(salts.toLong - 1))))
    facts.join(dims,
        facts("o_custkey") === dims("c_custkey") && facts("salt") === dims("salt"), "inner")
      .select(col("o_orderkey"), col("c_name"), col("c_mktsegment"),
        col("o_totalprice"))
      .orderBy(col("o_orderkey").asc)
  }

  /** Key-skew profile — the planning query you run BEFORE committing a
    * shuffle on a key at 100 TB. Per-key counts partial-agg map-side; the
    * one-row total rides a broadcast cross join (NOT a window — a window
    * computing the total would single-partition every distinct key); the
    * report is a bounded-heap top-k. `share_ppm` is the key's traffic
    * share in integer parts-per-million and `rec_salt` the salt factor
    * that levels the key across `partitions` reducers — both integer
    * arithmetic (`div`), engine-exact. The exact-count form is itself a
    * shuffle over distinct keys; when even that is too much, the
    * SpaceSaving sketch ([[graft.plans.SpaceSavingAggregate]]) answers the
    * same question in one pass with m-entry state (over-estimates only —
    * harmless here, extra salting is benign).
    */
  def keySkewOn(df: DataFrame, keyCol: String, topK: Int,
                partitions: Int): DataFrame = {
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
    val total = df.agg(count(lit(1)).as("total"))
    counts.crossJoin(broadcast(total))
      .select(col(keyCol), col("cnt"),
        expr("cnt * 1000000 div total").as("share_ppm"),
        expr(s"(cnt * $partitions + total - 1) div total").as("rec_salt"))
      .orderBy(col("cnt").desc, col(keyCol).asc)
      .limit(topK)
  }

  /** Contract surface: the ten heaviest event users and their salt plan. */
  def keySkew(spark: SparkSession, dir: String): DataFrame =
    keySkewOn(Tables.events(spark, dir), "user_id", topK = 10, partitions = 32)

  /** Build-if-absent maintained KEY sketch for [[keySkewStored]] — the
    * SpaceSaving store pointed at a join key instead of vocabulary terms
    * (keys render as single-token "documents", so the whole persisted
    * term-sketch machinery — watermarked folds, streaming maintenance,
    * compaction discipline — applies unchanged). Create-half + fold-half
    * each run, the ensure convention.
    */
  private[graft] def ensureKeySketch(spark: SparkSession, dir: String,
      m: Int = 4096): (String, String) = {
    import graft.sources.CatalogOps
    val db = "graft_sketch"
    val name = "evkeys"
    this.synchronized {
      if (!spark.catalog.tableExists(s"$db.${name}__termsketch")) {
        CatalogOps.createDatabase(spark, db)
        KnnOps.dropTableAndDir(spark, db, s"${name}__termsketch")
        val keys = Tables.events(spark, dir)
          .select(col("user_id").cast("string").as("text"), col("event_id"))
        CatalogOps.createTermSketch(spark, db, name,
          keys.filter(col("event_id") % 2 === 0), m)
        CatalogOps.upsertTermSketch(spark, db, name,
          keys.filter(col("event_id") % 2 =!= 0), batchId = 0L, m)
      }
    }
    (db, name)
  }

  /** `q_key_skew_stored`: the skew report served from the MAINTAINED key
    * sketch — the shuffle-planning answer without a corpus pass at ask
    * time (the count pass ran at ingest, folded batch by batch). Below
    * saturation SpaceSaving is exact, so this faces the SAME oracle as
    * [[keySkew]]; the saturation guard raises on every entry before the
    * cut (the stored-heavy-hitters discipline) rather than letting an
    * eviction surface as a silent mismatch. The total is the sketch's
    * own count sum — exact for the same reason.
    */
  def keySkewStored(spark: SparkSession, dir: String,
      topK: Int = 10, partitions: Int = 32): DataFrame = {
    val (db, name) = ensureKeySketch(spark, dir)
    val sk = spark.table(s"`$db`.`${name}__termsketch`")
      .filter(col("term").isNotNull)
      .select(col("term").cast("long").as("user_id"),
        when(col("err") === 0L, col("count")).otherwise(raise_error(concat(
          lit("stored key sketch saturated (err>0) at key "),
          col("term")))).as("cnt"))
    val total = sk.agg(sum(col("cnt")).as("total"))
    sk.crossJoin(broadcast(total))
      .select(col("user_id"), col("cnt"),
        expr("cnt * 1000000 div total").as("share_ppm"),
        expr(s"(cnt * $partitions + total - 1) div total").as("rec_salt"))
      .orderBy(col("cnt").desc, col("user_id").asc)
      .limit(topK)
  }

  /** Per-group top-k through the bounded-heap aggregate — the grouped
    * twin of [[sortLimit]]'s global TakeOrderedAndProject. The
    * [[graft.plans.TopKScoreId]] partial aggregation keeps ≤ k entries
    * per (group × map task) locally, so the exchange carries k·tasks
    * rows per group and no per-group sort ever materializes.
    *
    * Honesty note (measured, `TopKScale`): the folk claim that the
    * rank-window form "shuffles every row" is NO LONGER TRUE on this
    * Spark — `InferWindowGroupLimit` (SPARK-37099) plants a partial
    * WindowGroupLimit below the exchange for row_number-≤-k filters, so
    * the window form is also map-side bounded. What remains of the gap:
    * at 100k groups the heap wins modestly (1.60 vs 1.92 s, 179 vs
    * 191 MB shuffled at 20M rows — one exchange + hash agg vs exchange +
    * per-partition sort), and at LOW group counts the window form wins
    * (1.30 vs 2.43 s at 1k groups — WindowGroupLimit is codegen-adjacent
    * while the imperative heap pays serialization per partial). Use the
    * aggregate form when the top-k feeds further aggregation in the same
    * groupBy (one operator, no window barrier), or at high group
    * cardinality; use the window when you need ranks over few groups.
    * Tie-break (score DESC, id ASC) matches row_number exactly — the
    * oracle IS the window form.
    */
  def groupTopKOn(df: DataFrame, groupCol: String, scoreCol: String,
                  idCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
    val topk = toCol(graft.plans.TopKScoreId(
      toExpr(col(scoreCol).cast("double")), toExpr(col(idCol).cast("long")), k)
      .toAggregateExpression())
    df.groupBy(col(groupCol))
      .agg(topk.as("__topk"))
      .select(col(groupCol), posexplode(col("__topk")).as(Seq("__pos", "__hit")))
      .select(col(groupCol), (col("__pos") + 1).cast("long").as("rank"),
        col("__hit.vec_id").as(idCol), col("__hit.score").cast("long").as(scoreCol))
  }

  /** Contract surface: the five longest documents per source. */
  def groupTopK(spark: SparkSession, dir: String): DataFrame =
    groupTopKOn(Tables.documents(spark, dir), "source", "n_chars", "doc_id", 5)
      .orderBy(col("source").asc, col("rank").asc)

  /** Build-if-absent maintained HLL store over the order custkeys —
    * create-half + fold-half each run (the ensure convention). */
  private[graft] def ensureHllOrders(spark: SparkSession,
      dir: String): (String, String) = {
    import graft.sources.CatalogOps
    val db = "graft_hll"
    val name = "orders"
    this.synchronized {
      if (!spark.catalog.tableExists(s"$db.${name}__hll")) {
        CatalogOps.createDatabase(spark, db)
        KnnOps.dropTableAndDir(spark, db, s"${name}__hll")
        val o = Tables.orders(spark, dir).select(col("o_custkey"), col("o_orderkey"))
        CatalogOps.createHllStore(spark, db, name,
          o.filter(col("o_orderkey") % 2 === 0).select(col("o_custkey")), "o_custkey")
        CatalogOps.upsertHllStore(spark, db, name,
          o.filter(col("o_orderkey") % 2 =!= 0).select(col("o_custkey")), "o_custkey")
      }
    }
    (db, name)
  }

  /** `q_approx_distinct_stored`: the distinct-customer estimate served
    * from the MAINTAINED HLL registers — [[approxDistinct]]'s question
    * answered without touching the corpus at ask time. Rows-only by
    * design (approximate); determinism and replay-invariance are pinned
    * in the spec, accuracy is the ±1.6% HLL contract at p = 12.
    */
  def approxDistinctStored(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (db, name) = ensureHllOrders(spark, dir)
    Seq(graft.sources.CatalogOps.hllEstimate(spark, db, name))
      .toDF("approx_custkeys")
  }

  /** Deterministic stratified sample — exactly `perStratum` docs per
    * source, chosen by rank under the Knuth multiplier hash (the house
    * deterministic-uniform: reproducible across runs, partitionings, and
    * engines — which is the point of sampling training data: the sample
    * IS an artifact). Rides [[groupTopKOn]]'s bounded heap, so the
    * exchange carries k rows per (stratum × task), never the stratum.
    * The negated hash makes "k smallest hashes" the heap's "k best".
    */
  def sampleStratified(spark: SparkSession, dir: String,
      perStratum: Int = 10): DataFrame = {
    val base = Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"),
        (-(col("doc_id") * 3266489917L % 1000003L)).as("negh"))
    groupTopKOn(base, "source", "negh", "doc_id", perStratum)
      .select(col("source"), col("rank"), col("doc_id"))
      .orderBy(col("source").asc, col("rank").asc)
  }

  /** Deterministic weighted sampling WITHOUT replacement (`q_sample_weighted`)
    * — Efraimidis–Spirtes A-ES (2006): each doc draws u ∈ (0,1) and the
    * sample is the top-k by key u^(1/w); inclusion probability is
    * proportional to weight w (here n_chars — longer docs more likely,
    * the mixture knob a token-budgeted corpus sample needs). The key is
    * compared in log space (ln(u)/w, order-isomorphic) so no pow() is
    * evaluated, and u comes from the house Knuth-multiplier lattice
    * (`(id·3266489917 mod 1000003 + 0.5)/1000003`) — reproducible across
    * runs, partitionings, and engines, which is the point: the sample IS
    * a training-data artifact. The float key is used only to ORDER (key
    * gaps on the u-lattice are ~1e-9, ten orders above cross-engine libm
    * ulps) and never emitted.
    *
    * Scale shape: this IS the distributed weighted reservoir — A-ES's
    * "reservoir = top-k by key" makes the whole sample one
    * TakeOrderedAndProject: per-partition bounded heaps, k rows per
    * partition to the driver merge, zero shuffles, no state.
    */
  def sampleWeighted(spark: SparkSession, dir: String, k: Int = 200): DataFrame = {
    val u = (((col("doc_id") * lit(3266489917L)) % lit(1000003L)).cast("double")
      + lit(0.5)) / lit(1000003.0)
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars"),
        (log(u) / col("n_chars").cast("double")).as("aes_key"))
      .orderBy(col("aes_key").desc, col("doc_id").asc)
      .limit(k)
      .select(col("doc_id"), col("source"), col("n_chars"))
  }

  /** Per-group weighted reservoirs (`q_sample_weighted_grouped`) — the
    * [[sampleWeighted]] A-ES key pushed through [[groupTopKOn]]'s bounded
    * heap: exactly k weighted draws PER SOURCE (the per-domain token
    * budget a mixture-controlled corpus sample needs), with the exchange
    * carrying k rows per (source × map task), never the stratum.
    */
  def sampleWeightedGrouped(spark: SparkSession, dir: String,
      perSource: Int = 10): DataFrame = {
    val u = (((col("doc_id") * lit(3266489917L)) % lit(1000003L)).cast("double")
      + lit(0.5)) / lit(1000003.0)
    val base = Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"),
        (log(u) / col("n_chars").cast("double")).as("aes_key"))
    groupTopKOn(base, "source", "aes_key", "doc_id", perSource)
      .select(col("source"), col("rank"), col("doc_id"))
      .orderBy(col("source").asc, col("rank").asc)
  }

  /** Z-value computation surface — the row-side arithmetic of the
    * z-ordered layout ([[graft.sources.CatalogOps.createZorderedCollection]]),
    * exposed as a query so the oracle can pin it: equi-width bucket ranks
    * of (value, user_id) over the observed min/max (closed-form IEEE
    * arithmetic, bit-identical in any engine — unlike the layout's
    * equi-depth variant whose bounds are data-dependent state) and the
    * Morton interleave via the 256-entry spread table. The min/max row
    * rides a broadcast cross join; everything per-row is codegen'd.
    */
  def zorderValue(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.ZorderFunctions._
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("value"),
        col("user_id").cast("double").as("uid"))
    val mm = ev.agg(
      min(col("value")).as("vlo"), max(col("value")).as("vhi"),
      min(col("uid")).as("ulo"), max(col("uid")).as("uhi"))
    ev.crossJoin(broadcast(mm))
      .select(col("event_id"),
        widthBucket(col("value"), col("vlo"), col("vhi")).as("vb"),
        widthBucket(col("uid"), col("ulo"), col("uhi")).as("ub"))
      .select(col("event_id"), col("vb"), col("ub"),
        zInterleave(col("vb"), col("ub")).as("z"))
      .orderBy(col("event_id").asc)
  }

  /** Targeted hot-key salted join — [[joinSalted]] replicates the ENTIRE
    * build side S×, which multiplies the build shuffle by S whether or not
    * a key is hot. This form salts ONLY measured-hot keys: a first
    * partial-agg pass finds keys above `hotThreshold` (bounded output —
    * at most n/threshold keys — and broadcast back, never collected);
    * probe rows for hot keys take a deterministic salt from `saltSrcCol`
    * (any per-row column works: a retried task re-derives the same salt,
    * and correctness never depends on WHICH salt a row takes since the
    * build side carries all of them); build rows for hot keys explode S×;
    * everything else joins salt-0 unreplicated. The join output is
    * EXACTLY the plain join's. This is the insurance for the cases AQE's
    * skew-join can't reach: shuffled-hash joins, aggregation-feeding
    * shuffles, and single-key partitions a size-split can't separate.
    */
  def joinHotSalted(probe: DataFrame, probeKey: String, saltSrcCol: String,
                    build: DataFrame, buildKey: String,
                    hotThreshold: Long, saltFactor: Int): DataFrame = {
    require(saltFactor >= 2, s"saltFactor must be >= 2, got $saltFactor")
    val hot = probe.groupBy(col(probeKey)).agg(count(lit(1)).as("__hc"))
      .where(col("__hc") > hotThreshold)
      .select(col(probeKey).as("__hot_key"))
    val p = probe.join(broadcast(hot), col(probeKey) === col("__hot_key"), "left")
      .withColumn("__psalt",
        when(col("__hot_key").isNotNull,
          pmod(xxhash64(col(saltSrcCol)), lit(saltFactor.toLong)))
          .otherwise(lit(0L)))
      .drop("__hot_key")
    val b = build.join(broadcast(hot), col(buildKey) === col("__hot_key"), "left")
      .withColumn("__bsalt",
        explode(when(col("__hot_key").isNotNull,
          sequence(lit(0L), lit(saltFactor.toLong - 1)))
          .otherwise(array(lit(0L)))))
      .drop("__hot_key")
    p.join(b, p(probeKey) === b(buildKey) && col("__psalt") === col("__bsalt"))
      .drop("__psalt", "__bsalt")
  }

  /** Contract surface for [[joinHotSalted]]: enrich events with a per-user
    * aggregate (the classic fact ⋈ derived-dim self-shape where one viral
    * user would otherwise pin a reducer). Threshold 60 puts most fixture
    * users on the salted path, so both branches are oracle-exercised.
    */
  def joinSkew(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("value"))
    val users = Tables.events(spark, dir)
      .groupBy(col("user_id").as("u_id"))
      .agg(count(lit(1)).as("u_events"))
    joinHotSalted(ev, "user_id", "event_id", users, "u_id",
        hotThreshold = 60L, saltFactor = 4)
      .select(col("event_id"), col("user_id"), col("value"), col("u_events"))
      .orderBy(col("event_id").asc)
  }

  /** Bloom-reduced equi join — same semantics as the plain lineitem⋈orders
    * join, with the probe side cut by a bloom filter of the SELECTIVE build
    * side before any exchange ([[graft.functions.BloomFunctions]]). The
    * build predicate keeps ~6.7% of orders; probe rows for every other
    * order drop map-side, so the join's shuffle carries the matching
    * fraction plus < 0.1% false positives instead of the full fact table.
    * This is the regime where the build side is too big to broadcast but
    * far smaller than the probe — between Catalyst's broadcast join (build
    * fits on every executor) and a full shuffle join (nothing known). No
    * false negatives ⇒ identical result to the unreduced join, which is
    * exactly what the DuckDB oracle runs.
    */
  def joinBloom(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.BloomFunctions
    val build = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT" && col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate"))
    val probe = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("rev"))
    BloomFunctions.bloomReduce(spark, probe, "l_orderkey", build, "o_orderkey")
      .join(build, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        col("rev"), col("o_orderdate"))
      .orderBy(col("l_orderkey").asc, col("l_linenumber").asc)
  }

  /** Pure (keyless) interval join — pairs within a time tolerance and NO
    * equi key, the join shape Spark has no native operator for (its own
    * planner falls back to a cartesian/BNLJ: O(|L|·|R|) pair evaluations
    * — the plan that never finishes at scale). Bucket decomposition:
    * time quantizes to tolerance-width buckets, the LEFT side explodes
    * to bucket−1/bucket/bucket+1 (any pair within tol spans at most one
    * boundary), the join runs EQUI on the bucket, and the exact
    * predicate finishes. One shuffle per side on the bucket key; pair
    * work is Σ_b |L_b±1|·|R_b| — density-bounded, not |L|·|R|. Each
    * qualifying pair meets in exactly ONE right bucket, so no dedup
    * stage exists to pay for. A hot bucket (a traffic spike) is the
    * ordinary equi-join skew profile — [[joinHotSalted]] or AQE applies
    * unchanged. Seconds arithmetic mirrors the oracle's
    * `date_diff('second', …)` exactly (both floor to epoch seconds).
    */
  def intervalJoinOn(left: DataFrame, lTime: String,
                     right: DataFrame, rTime: String,
                     tolSeconds: Long): DataFrame = {
    require(tolSeconds > 0, s"tolerance must be positive, got $tolSeconds")
    val ls = col(lTime).cast("long")
    val rs = col(rTime).cast("long")
    val l = left.withColumn("__ls", ls)
      .withColumn("__b", explode(array(
        expr(s"CAST($lTime AS LONG) div $tolSeconds") - 1L,
        expr(s"CAST($lTime AS LONG) div $tolSeconds"),
        expr(s"CAST($lTime AS LONG) div $tolSeconds") + 1L)))
    val r = right.withColumn("__rs", rs)
      .withColumn("__b", expr(s"CAST($rTime AS LONG) div $tolSeconds"))
    l.join(r, l("__b") === r("__b") &&
        abs(col("__ls") - col("__rs")) <= tolSeconds)
      .drop("__b", "__ls", "__rs")
  }

  /** `q_join_interval`: purchases paired with every click within ±60 s —
    * the cross-traffic coincidence query; no shared key exists, so only
    * the bucketed decomposition scales.
    */
  def joinInterval(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("ts").as("pts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("ts").as("cts"))
    intervalJoinOn(p, "pts", c, "cts", tolSeconds = 60L)
      .select(col("p_id"), col("c_id"),
        (col("pts").cast("long") - col("cts").cast("long")).as("gap_s"))
      .orderBy(col("p_id").asc, col("c_id").asc)
  }

  /** Build-if-absent maintained bloom store over the document ids —
    * create-half + upsert-half each run (the ensure convention), so the
    * contract path exercises the idempotent fold, not just a one-shot
    * build. Capacity 65536 keys (m = 2²⁰ bits, a 128 KiB word array).
    */
  private[graft] def ensureDocsBloom(spark: SparkSession,
      dir: String): (String, String) = {
    import graft.sources.CatalogOps
    val db = "graft_bloom"
    val name = "docs"
    this.synchronized {
      if (!spark.catalog.tableExists(s"$db.${name}__bloom")) {
        CatalogOps.createDatabase(spark, db)
        KnnOps.dropTableAndDir(spark, db, s"${name}__bloom")
        KnnOps.dropTableAndDir(spark, db, s"${name}__bloommeta")
        val ids = Tables.documents(spark, dir).select(col("doc_id"))
        CatalogOps.createBloomStore(spark, db, name,
          ids.filter(col("doc_id") % 2 === 0), "doc_id", expectedKeys = 65536L)
        CatalogOps.upsertBloomStore(spark, db, name,
          ids.filter(col("doc_id") % 2 =!= 0), "doc_id")
      }
    }
    (db, name)
  }

  /** `q_join_semi_bloom`: id membership against the corpus served
    * BLOOM-FIRST — the maintained filter ([[graft.sources.CatalogOps
    * .createBloomStore]]) drops the absent majority of the probe for the
    * cost of one broadcast word array and codegen'd hashing, and the
    * exact semi join confirms the survivors. No false negatives + exact
    * confirm ⇒ the output IS the plain semi join, which is exactly what
    * the oracle runs. This is the crawl frontier's "which of these URLs
    * are new?" shape: at 100 TB the store's word log is 2 bytes/key and
    * the corpus is only touched by the (tiny) confirmed fraction.
    */
  def semiJoinBloomStored(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.CatalogOps
    val (db, name) = ensureDocsBloom(spark, dir)
    val probe = spark.range(1000).select(col("id").as("probe_id"))
    CatalogOps.probeBloomStore(spark, db, name, probe, "probe_id")
      .join(Tables.documents(spark, dir).select(col("doc_id")),
        col("probe_id") === col("doc_id"), "left_semi")
      .orderBy(col("probe_id").asc)
  }

  /** Broadcast join of small dims: region (5 rows) is broadcast explicitly —
    * zero shuffle on the fact side at any scale.
    */
  def joinBroadcast(spark: SparkSession, dir: String): DataFrame =
    Tables.nation(spark, dir)
      .join(broadcast(Tables.region(spark, dir)),
        col("n_regionkey") === col("r_regionkey"), "inner")
      .select(col("n_nationkey"), col("n_name"), col("r_name"))
      .orderBy(col("n_nationkey").asc)

  /** Left-semi: customers WITH orders. Semi-join keeps only the left
    * payload — the build side carries just the key, no payload duplication.
    */
  def joinSemi(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir), col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey").asc)

  /** Left-anti: customers WITHOUT orders (NOT EXISTS). */
  def joinAnti(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir), col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey").asc)

  /** Left-outer orders→lineitem, aggregated to order grain so the unmatched
    * side is observable (n_items = 0). Aggregate-after-join lets Catalyst
    * push the lineitem partial agg below the join when beneficial (AQE).
    */
  def joinOuter(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_quantity"))
    Tables.orders(spark, dir)
      .join(li, col("o_orderkey") === col("l_orderkey"), "left")
      .groupBy(col("o_orderkey"))
      .agg(count(col("l_orderkey")).as("n_items"),
        coalesce(sumInt(col("l_quantity")), lit(0.0)).as("sum_qty"))
      .orderBy(col("o_orderkey").asc)
  }

  /** Range (θ) join: lineitems shipped within 60 days of their order date —
    * equi key + range predicate. The equi component keeps this a hash/merge
    * join (the range lands as a post-join filter), so it scales like
    * `joinHash`; a pure range join would need a bucketed interval scheme.
    */
  def joinRange(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir),
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") >= col("o_orderdate") &&
          col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"),
        col("o_orderdate"))
      .orderBy(col("l_orderkey").asc, col("l_linenumber").asc)

  /** As-of join: for each purchase event, the latest click by the same user
    * at-or-before the purchase time. Planned as equi-join on the user key +
    * time predicate, then a rank window keeps the latest match — one shuffle
    * on user_id for the join, one on the purchase id for the window. At
    * scale the window collapses into the join via a max-by aggregation on
    * the same key (no extra shuffle).
    */
  def joinAsof(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
    val w = Window.partitionBy(col("p_id"))
      .orderBy(col("c_ts").desc, col("c_id").desc)
    purchases
      .join(clicks, col("user_id") === col("c_user") && col("c_ts") <= col("p_ts"), "left")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("p_id"), col("user_id"), col("p_ts"), col("c_id"), col("c_ts"))
      .orderBy(col("p_id").asc)
  }

  // ---- §2.G windows ----

  /** Ranking trio over a keyed window — the grouped-top-k primitive
    * (the batch-knn rank reused relationally). One shuffle on the key.
    */
  def windowRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rn"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"))
      .filter(col("rn") <= 3)
      .orderBy(col("o_custkey").asc, col("rn").asc)
  }

  /** Running sum per customer in date order — frame
    * (unboundedPreceding→currentRow). Decimal accumulation keeps the
    * running values engine-exact regardless of DuckDB's segment-tree
    * evaluation order.
    */
  def windowRunning(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        (sum(round(col("o_totalprice") * lit(1000000.0)).cast("long")).over(w)
          .cast("double") / lit(1000000.0)).as("running_total"))
      .orderBy(col("o_custkey").asc, col("o_orderkey").asc)
  }

  /** lag/lead over event time per user — the stream-ish delta query in
    * batch form (gap computation reused by sessionization).
    */
  def windowLag(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"),
        lag(col("event_id"), 1).over(w).as("prev_event"),
        lead(col("event_id"), 1).over(w).as("next_event"),
        (unix_timestamp(col("ts")) - unix_timestamp(lag(col("ts"), 1).over(w)))
          .as("gap_sec"))
      .orderBy(col("user_id").asc, col("event_id").asc)
  }

  /** Time-RANGE frame: per user, events and value-sum in the trailing hour
    * by EVENT TIME (ties share the frame — a RANGE frame, not ROWS; the
    * rolling rate-limit / activity-burst query of an events pipeline).
    * Frame bounds are epoch seconds on both engines; the value sum follows
    * the integer-micros determinism rule.
    */
  def windowRange(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_sec"))
      .rangeBetween(-3600L, Window.currentRow)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"),
        unix_timestamp(col("ts")).as("ts_sec"), col("value"))
      .select(col("user_id"), col("event_id"), col("ts"),
        count(lit(1)).over(w).as("n_last_hour"),
        (sum(round(col("value") * 1e6).cast("long")).over(w).cast("double") / 1e6)
          .as("sum_last_hour"))
      .orderBy(col("user_id").asc, col("event_id").asc)
  }

  /** FIRST_VALUE / LAST_VALUE over the full partition frame — each event
    * annotated with its user's first and last event type (entry/exit-page
    * analysis). Total (ts, event_id) ordering keeps both engines'
    * window results identical; one user_id exchange.
    */
  def windowFirstLast(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        first(col("event_type")).over(w).as("first_type"),
        last(col("event_type")).over(w).as("last_type"))
      .orderBy(col("user_id").asc, col("event_id").asc)
  }

  // ---- §2.H sorts / limits / set ops ----

  /** Global top-k — compiles to TakeOrderedAndProject: per-partition bounded
    * heap + driver merge of k·partitions rows, never a full sort.
    */
  def sortLimit(spark: SparkSession, dir: String, k: Int = 10): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(k)

  /** UNION ALL of two projected sides (the per-level union of the tree walk
    * in relational form). No shuffle — pure concatenation of partitions.
    */
  def setUnion(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .select(col("c_nationkey").cast("long").as("nationkey"), lit("customer").as("kind"))
    val s = Tables.supplier(spark, dir)
      .select(col("s_nationkey").cast("long").as("nationkey"), lit("supplier").as("kind"))
    c.unionAll(s)
      .groupBy(col("nationkey"), col("kind"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("nationkey").asc, col("kind").asc)
  }

  /** INTERSECT (distinct semantics): nations that have both customers and
    * suppliers. Planned as a left-semi over distinct sets.
    */
  def setIntersect(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select(col("c_nationkey").cast("long").as("nationkey"))
      .intersect(
        Tables.supplier(spark, dir).select(col("s_nationkey").cast("long").as("nationkey")))
      .orderBy(col("nationkey").asc)

  /** EXCEPT (distinct semantics): nations with customers but no suppliers. */
  def setExcept(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select(col("c_nationkey").cast("long").as("nationkey"))
      .except(
        Tables.supplier(spark, dir).select(col("s_nationkey").cast("long").as("nationkey")))
      .orderBy(col("nationkey").asc)

  /** Exact interpolated percentiles per group — the quantile surface
    * (Spark `percentile` and DuckDB `quantile_cont` share the linear-
    * interpolation definition; rounded to absorb last-ulp noise).
    * `approx_percentile`/KLL is the 100 TB path — same query shape,
    * sketch-mergeable, omitted from the oracle like [[approxDistinct]].
    */
  def percentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        round(expr("percentile(o_totalprice, 0.25)"), 4).as("p25"),
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(o_totalprice, 0.75)"), 4).as("p75"),
        round(expr("percentile(o_totalprice, 0.95)"), 4).as("p95"))
      .orderBy(col("o_orderstatus").asc)

  /** EXACT order statistics without a global sort — iterative histogram
    * refinement (the classic distributed selection algorithm). Spark's
    * `percentile` is exact but materializes every group's values into one
    * aggregation buffer (per-group memory ∝ rows — a 100 TB column does
    * not fit), and `approx_percentile` trades exactness away. This is the
    * third point in that design space: exact AND bounded-memory.
    *
    * Per round, one distributed job: bucket the current interval into
    * `buckets` equi-width bins, `groupBy(bin).agg(count, min, max)` —
    * partial-agg shuffles ≤ buckets rows per partition, and only the
    * `buckets`-row histogram reaches the driver (model-sized, the LR/
    * k-means budget class). The driver walks the cumulative counts to the
    * bin holding the target rank and recurses into it, using that bin's
    * OBSERVED min/max as the next interval — derived from the same bucket
    * expression that counted it, so no float-boundary mismatch is
    * possible (bucket assignment is monotone in v, hence the value
    * interval [min_b, max_b] is exactly bin b's row set). Each round
    * divides the candidate count by ~buckets: 10¹² rows converge in ≤ 4
    * rounds at 1024 bins; heavy duplicate values collapse to lo == hi
    * and return immediately. The endgame (≤ `exactThreshold` candidates,
    * or `maxIters` stall from denormal-width intervals) is a bounded-heap
    * `orderBy.limit(rank+1)` — TakeOrderedAndProject, never a full sort.
    *
    * Rank semantics: the lower order statistic, rank = ⌊p·(n−1)⌋
    * 0-indexed — always an actual data value (ties well-defined: the
    * multiset's k-th smallest is unique even when row_number isn't).
    */
  def quantileExactOn(base0: DataFrame, valueCol: String, ps: Seq[Double],
                      buckets: Int = 1024, exactThreshold: Long = 65536,
                      maxIters: Int = 16): Seq[(Double, Double)] = {
    val base = base0.select(col(valueCol).cast("double").as("v"))
      .where(col("v").isNotNull)
    val head = base.agg(count(lit(1)).as("n"), min(col("v")), max(col("v"))).collect()(0)
    val n = head.getLong(0)
    require(n > 0, "quantileExactOn: empty input")
    // Joint refinement: quantiles targeting the SAME interval share one
    // histogram job per round — at scale each histogram is a full scan
    // of the surviving range, so the scan count is rounds × distinct
    // intervals, not rounds × quantiles (all ps start in the global
    // interval, so round one is always a single scan).
    final case class St(p: Double, var rank: Long, var lo: Double,
                        var hi: Double, var cnt: Long, var it: Int,
                        var ans: Double = Double.NaN, var done: Boolean = false)
    val states = ps.map { p =>
      require(p >= 0.0 && p <= 1.0, s"quantile out of range: $p")
      St(p, math.floor(p * (n - 1)).toLong, head.getDouble(1),
        head.getDouble(2), n, 0)
    }
    while (states.exists(!_.done)) {
      states.filter(!_.done).foreach { s =>
        if (s.lo == s.hi) { s.ans = s.lo; s.done = true }
      }
      // batched endgame (r19 optimization): states that reached a
      // bounded candidate interval resolve from ONE collect per distinct
      // interval — ≤ exactThreshold doubles, the broadcast size class —
      // instead of one orderBy.limit job each. Arrays.sort uses
      // Double.compare ordering (−0.0 < 0.0, NaN greatest), exactly the
      // physical ordering the orderBy/max form walked, so the rank-th
      // element is the identical double. The maxIters stall with an
      // over-threshold interval keeps the bounded-heap job (a collect
      // there would be unbounded).
      states.filter(s => !s.done && s.cnt <= exactThreshold)
        .groupBy(s => (s.lo, s.hi)).foreach { case ((lo, hi), group) =>
          val vals = base.where(col("v") >= lo && col("v") <= hi)
            .collect().map(_.getDouble(0))
          java.util.Arrays.sort(vals)
          group.foreach { s =>
            require(s.rank < vals.length,
              s"quantileExactOn: rank ${s.rank} outside interval of ${vals.length}")
            s.ans = vals(s.rank.toInt)
            s.done = true
          }
        }
      states.filter(!_.done).foreach { s =>
        if (s.it >= maxIters) {
          require(s.rank + 1 <= Int.MaxValue, "rank too large for exact endgame")
          s.ans = base.where(col("v") >= s.lo && col("v") <= s.hi)
            .orderBy(col("v").asc).limit((s.rank + 1).toInt)
            .agg(max(col("v"))).collect()(0).getDouble(0)
          s.done = true
        }
      }
      val active = states.filter(!_.done)
      active.groupBy(s => (s.lo, s.hi)).foreach { case ((lo, hi), group) =>
        val w = (hi - lo) / buckets
        val bin = least(floor((col("v") - lit(lo)) / lit(w)), lit(buckets - 1L)).cast("long")
        val hist = base.where(col("v") >= lo && col("v") <= hi)
          .groupBy(bin.as("b"))
          .agg(count(lit(1)).as("c"), min(col("v")).as("mn"), max(col("v")).as("mx"))
          .collect()
          .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
          .toMap
        group.foreach { s =>
          var cum = 0L
          var b = 0L
          while (cum + hist.get(b).map(_._1).getOrElse(0L) <= s.rank) {
            cum += hist.get(b).map(_._1).getOrElse(0L); b += 1
          }
          val (bc, bmn, bmx) = hist(b)
          s.rank -= cum
          // No progress is possible only when double resolution is
          // exhausted inside the bin; the min==max check above or the
          // maxIters endgame terminates that case.
          s.lo = bmn; s.hi = bmx; s.cnt = bc; s.it += 1
        }
      }
    }
    states.map(s => s.p -> s.ans)
  }

  /** Contract surface for [[quantileExactOn]]: exact discrete quantiles of
    * the order totals. Same shape as [[percentiles]] but the DISCRETE
    * (lower-order-statistic) definition and the scale plan — no per-group
    * value buffer, no global sort.
    */
  def quantileExact(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    quantileExactOn(Tables.orders(spark, dir), "o_totalprice",
      Seq(0.25, 0.5, 0.75, 0.95))
      .toDF("p", "v").orderBy(col("p").asc)
  }

  /** Data-quality constraint report — the validation suite you run
    * before letting a snapshot into training (the Deequ-shape): each
    * constraint is one aggregate (or one join-aggregate) over its
    * target, emitted as a (check, violations, total, pass) row. Every
    * check is partial-agg'd or anti-join shaped — nothing quadratic,
    * nothing driver-side; the report is constraints-count rows.
    */
  def qualityChecks(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir)
    def report(name: String, violations: Column, total: Column,
               df: DataFrame): DataFrame =
      df.agg(violations.cast("long").as("violations"), total.cast("long").as("total"))
        .select(lit(name).as("check"), col("violations"), col("total"),
          (col("violations") === 0L).as("pass"))
    val unique = report("unique_o_orderkey",
      count(lit(1)) - countDistinct(col("o_orderkey")), count(lit(1)), orders)
    val fk = report("fk_orders_customer",
      sum(when(col("c_custkey").isNull, 1L).otherwise(0L)), count(lit(1)),
      orders.join(Tables.customer(spark, dir).select(col("c_custkey")),
        col("o_custkey") === col("c_custkey"), "left"))
    val notNull = report("notnull_l_shipdate",
      sum(when(col("l_shipdate").isNull, 1L).otherwise(0L)), count(lit(1)), li)
    val range = report("range_l_discount",
      sum(when(col("l_discount") < 0.0 || col("l_discount") > 1.0, 1L)
        .otherwise(0L)), count(lit(1)), li)
    val accepted = report("accepted_o_orderstatus",
      sum(when(!col("o_orderstatus").isin("F", "O", "P"), 1L).otherwise(0L)),
      count(lit(1)), orders)
    unique.unionByName(fk).unionByName(notNull).unionByName(range)
      .unionByName(accepted)
      .orderBy(col("check").asc)
  }

  /** percent_rank + cume_dist — the remaining analytic-rank surface
    * (§2.G): both are exact small-integer divisions once the order key
    * is made unique with the id tie-break, so the doubles are
    * engine-identical.
    */
  def windowPercentRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
    Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
      .withColumn("pr", percent_rank().over(w))
      .withColumn("cd", cume_dist().over(w))
      .orderBy(col("c_custkey").asc)
  }

  /** Percentile calibration through a broadcast CDF grid —
    * rank-normalize a score column ("this document is cleaner than X%
    * of the corpus") WITHOUT the global sort a percent_rank window
    * costs: one equi-width histogram pass (the quantile-refinement
    * bucket discipline), a 1024-row cumulative grid (model-sized — the
    * window that builds it runs over bins, never rows), broadcast back
    * onto a map-side bin lookup. The calibrated value is the exact
    * fraction of rows in STRICTLY lower bins — a step approximation of
    * the true rank with error < 1/bins, which is what calibration
    * needs (the use is thresholding, not ordering ties).
    */
  def calibrateOn(df: DataFrame, valueCol: String,
                  bins: Int = 1024): DataFrame = {
    val v = col(valueCol).cast("double")
    val mm = df.agg(min(v).as("lo"), max(v).as("hi"), count(lit(1)).as("n"))
    val binned = df.crossJoin(broadcast(mm))
      .withColumn("__bin",
        when(col("hi") <= col("lo"), lit(0L)).otherwise(
          least(greatest(floor((v - col("lo")) * lit(bins.toDouble) /
            (col("hi") - col("lo"))), lit(0.0)), lit(bins - 1.0)).cast("long")))
    val w = Window.orderBy(col("__bin").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val grid = binned.groupBy(col("__bin")).agg(count(lit(1)).as("__c"))
      .withColumn("__cum_thru", sum(col("__c")).over(w))
      .select(col("__bin").as("__gbin"),
        (col("__cum_thru") - col("__c")).as("__below"))
    binned.join(broadcast(grid), col("__bin") === col("__gbin"))
      .withColumn("pct", round(col("__below").cast("double") / col("n"), 6))
      .drop("__bin", "__gbin", "__below", "lo", "hi", "n")
  }

  /** Contract surface: documents rank-normalized by length. */
  def scoreCalibrate(spark: SparkSession, dir: String): DataFrame =
    calibrateOn(Tables.documents(spark, dir)
        .select(col("doc_id"), col("n_chars")), "n_chars")
      .orderBy(col("doc_id").asc)

  /** Grouped exact quantiles for LOW-cardinality groups — one refinement
    * run per group (jobs = groups × rounds, so this is the right tool at
    * report grain: statuses, languages, sources-by-class — NOT at
    * millions of groups, where the whole-distribution path is Spark's
    * own `percentile` per group or a sketch). The group list is an
    * explicit argument: the caller states the cardinality contract
    * instead of discovering it with a distinct scan.
    */
  def quantileExactGrouped(df: DataFrame, groupCol: String, valueCol: String,
                           groups: Seq[String],
                           ps: Seq[Double]): Seq[(String, Double, Double)] =
    groups.flatMap { g =>
      quantileExactOn(df.where(col(groupCol) === g), valueCol, ps)
        .map { case (p, v) => (g, p, v) }
    }

  /** Contract surface: exact per-status order-total quantiles. */
  def quantileGrouped(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    quantileExactGrouped(Tables.orders(spark, dir), "o_orderstatus",
      "o_totalprice", Seq("F", "O", "P"), Seq(0.5, 0.95))
      .toDF("o_orderstatus", "p", "v")
      .orderBy(col("o_orderstatus").asc, col("p").asc)
  }

  /** Approximate per-group quantiles via the q-digest sketch
    * (`q_quantile_sketch`, Shrivastava et al. 2004 —
    * [[graft.plans.QDigestQuantiles]]): document-length p25/p50/p90/p99
    * per source in ONE partial-agg'd pass whose exchange carries
    * ≤ capacity-node sketches per (group × map task), never value rows —
    * the 100 TB path where [[quantileExactGrouped]]'s per-group
    * histogram refinement pays multiple passes. Below capacity the
    * digest is exact (no compression can fire), so the fixture faces the
    * same first-principles rank oracle as the exact family; the contract
    * projection RAISES if compression fired (the heavy-hitters
    * saturation-guard discipline) so drift surfaces as a diagnostic, not
    * a silent oracle mismatch.
    */
  def quantileSketch(spark: SparkSession, dir: String,
      levels: Int = 10, capacity: Int = 256): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
    val agg = toCol(graft.plans.QDigestQuantiles(
      toExpr(col("n_chars")), levels, capacity,
      Seq(0.25, 0.5, 0.9, 0.99)).toAggregateExpression())
    def guarded(i: Int): Column =
      when(col("qd").getField("internal"), raise_error(lit(
        "q-digest saturated on the fixture: compression fired, the exact-oracle precondition broke")))
        .otherwise(element_at(col("qd").getField("qs"), i))
    Tables.documents(spark, dir)
      .groupBy(col("source"))
      .agg(agg.as("qd"))
      .select(col("source"),
        guarded(1).as("p25"), guarded(2).as("p50"),
        guarded(3).as("p90"), guarded(4).as("p99"),
        col("qd").getField("n").as("n_docs"))
      .orderBy(col("source").asc)
  }

  /** Build-once fixture for the maintained q-digest store: create from
    * the even half, fold the odd half — every contract run exercises
    * both the create and the upsert path (the term-sketch fixture
    * discipline). Below saturation the folded store holds exactly the
    * full-corpus digests, so the stored twin faces the SAME oracle.
    */
  private[graft] def ensureQdigestStore(spark: SparkSession,
      dir: String): (String, String) = {
    import graft.sources.CatalogOps
    val db = "graft_qdigest"
    val name = "docs"
    this.synchronized {
      if (!spark.catalog.tableExists(s"$db.${name}__qdigest")) {
        CatalogOps.createDatabase(spark, db)
        KnnOps.dropTableAndDir(spark, db, s"${name}__qdigest")
        val docs = Tables.documents(spark, dir)
        CatalogOps.createQdigestStore(spark, db, name,
          docs.filter(col("doc_id") % 2 === 0))
        CatalogOps.upsertQdigest(spark, db, name,
          docs.filter(col("doc_id") % 2 =!= 0), batchId = 0L)
      }
    }
    (db, name)
  }

  /** `q_quantile_sketch_stored`: the distribution report served from the
    * MAINTAINED digests — [[quantileSketch]]'s question answered without
    * touching the corpus at ask time. The serving plan runs over
    * sketch-sized input (≤ groups × capacity node rows): one windowed
    * cumulative sum per source in (rmax ASC, rmin DESC) scan order —
    * exactly [[graft.plans.QDigest.quantiles]]'s rule, expressed
    * relationally — then a rank cut per probability. A compression
    * survivor anywhere in a group raises (aggregated saturation flag, so
    * lazy CASE evaluation cannot skip it) before any value is emitted.
    */
  def quantileSketchStored(spark: SparkSession, dir: String): DataFrame = {
    val (db, name) = ensureQdigestStore(spark, dir)
    val w = Window.partitionBy(col("source"))
      .orderBy(col("rmax").asc, col("rmin").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("source"))
    val st = spark.table(s"`$db`.`${name}__qdigest`")
      .filter(col("source").isNotNull) // skip the empty-state watermark sentinel
      .select(col("source"), col("rmin"), col("rmax"), col("cnt"))
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("n", sum(col("cnt")).over(wAll))
    def rankCut(p: Double): Column =
      min(when(col("cum") >= ceil(lit(p) * col("n")), col("rmax")))
    val agg = st.groupBy(col("source")).agg(
      rankCut(0.25).as("r25"), rankCut(0.5).as("r50"),
      rankCut(0.9).as("r90"), rankCut(0.99).as("r99"),
      max(col("n")).as("n_docs"),
      max(when(col("rmin") =!= col("rmax"), 1).otherwise(0)).as("sat"))
    def guarded(c: Column): Column =
      when(col("sat") === 1, raise_error(lit(
        "stored q-digest saturated: compression fired, the exact-oracle precondition broke")))
        .otherwise(c)
    agg.select(col("source"),
      guarded(col("r25")).as("p25"), guarded(col("r50")).as("p50"),
      guarded(col("r90")).as("p90"), guarded(col("r99")).as("p99"),
      col("n_docs"))
      .orderBy(col("source").asc)
  }

  /** Winsorization — outlier clipping at exact percentile fences, the
    * standard numeric-feature cleanup before training. The fences come
    * from [[quantileExactOn]] (two driver doubles, the bounded-memory
    * path — never a full sort or a value buffer) and the clip itself is
    * a pure projection. Exact fences ⇒ the whole query faces a
    * first-principles rank oracle.
    */
  def winsorize(spark: SparkSession, dir: String): DataFrame = {
    val fences = quantileExactOn(Tables.orders(spark, dir), "o_totalprice",
      Seq(0.05, 0.95)).map(_._2)
    val (lo, hi) = (fences(0), fences(1))
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_totalprice"),
        least(greatest(col("o_totalprice"), lit(lo)), lit(hi)).as("clipped"),
        (col("o_totalprice") < lo || col("o_totalprice") > hi).as("was_outlier"))
      .orderBy(col("o_orderkey").asc)
  }

  /** Fixed-width histogram: floor-binning is a pure projection, the count a
    * standard partial-agg — the profile query of a data-quality pass.
    */
  def histogram(spark: SparkSession, dir: String, binWidth: Double = 50000.0): DataFrame =
    Tables.orders(spark, dir)
      .select(floor(col("o_totalprice") / binWidth).cast("long").as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("bucket").asc)

  /** Composite analytical query (TPC-H Q3 shape): 3-table join → grouped
    * revenue → top-10. The fact-side predicates push to both scans; the
    * customer filter reduces the build side before the join; the final
    * top-k is TakeOrderedAndProject. One query exercising scan+filter+
    * join+agg+sort-limit through a single Catalyst plan.
    */
  def shippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = "1998-01-01"
    val cust = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < lit(cutoff))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > lit(cutoff))
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(sumMoney(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)
  }

  /** TPC-H Q10 (returned-item reporting) — the "who returned the most
    * revenue this quarter" join: returned lineitems ⋈ one-quarter orders
    * ⋈ customer, nation broadcast for the name, grouped to customer
    * grain, top-20 by lost revenue (TakeOrderedAndProject — no global
    * sort). The quarter predicate prunes orders at the scan; the
    * returnflag predicate prunes lineitem; both reach PushedFilters.
    * (The fixture schema omits address/phone/comment; the query keeps
    * the canonical shape over the columns that exist.)
    */
  def returnedItemReport(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1996-04-01"))
      .select(col("o_orderkey"), col("o_custkey"))
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("c_nationkey"))
    val nat = Tables.nation(spark, dir)
      .select(col("n_nationkey"), col("n_name"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(sumMoney(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(20)
  }

  /** TPC-H Q14 (promotion effect) — two exact-money sums in one
    * conditional aggregation over lineitem ⋈ part (part broadcastable at
    * every scale that matters; at true 100 TB part shuffles once on the
    * key like any large dim). The ratio divides two integer-micros-exact
    * doubles, so the quotient is engine-identical; rounded to 6 to
    * absorb nothing — it's pinned by the oracle either way.
    */
  def promotionEffect(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1996-07-01"))
      .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"))
    val part = Tables.part(spark, dir).select(col("p_partkey"), col("p_type"))
    val disc = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .agg(
        sumMoney(when(col("p_type") === "PROMO", disc).otherwise(lit(0.0))).as("promo"),
        sumMoney(disc).as("total"))
      .select(round(lit(100.0) * col("promo") / col("total"), 6).as("promo_pct"),
        col("promo"), col("total"))
  }

  /** TPC-H Q18 (large-volume customers) — the HAVING-on-aggregate join:
    * order quantity totals partial-agg map-side, the HAVING cut drops
    * all but the outlier orders BEFORE the customer join (a few rows
    * join, not the fact table), top-k bounded. The quantity sum is
    * integral in the fixture — exact long arithmetic.
    */
  def largeVolumeCustomers(spark: SparkSession, dir: String,
      minQty: Long = 300L): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast("long")).as("total_qty"))
      .filter(col("total_qty") > minQty)
    val ord = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"), col("o_totalprice"))
    val cust = Tables.customer(spark, dir).select(col("c_custkey"), col("c_name"))
    big.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("total_qty"))
      .orderBy(col("total_qty").desc, col("o_orderkey").asc)
      .limit(20)
  }

  /** TPC-H Q7 (volume shipping) — the bidirectional nation-pair trade
    * report: one lineitem⋈orders large join carries the fact side; both
    * nation lookups broadcast; the symmetric pair predicate sits on the
    * broadcast-joined names, and the ship year derives per row. Money
    * via integer micros.
    */
  def volumeShipping(spark: SparkSession, dir: String): DataFrame = {
    val n1 = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("s_nkey"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("c_nkey"), col("n_name").as("cust_nation"))
    val pair = (col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
      (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1")
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1998-01-01"))
      .select(col("l_orderkey"), col("l_suppkey"),
        col("l_extendedprice"), col("l_discount"), year(col("l_shipdate")).as("l_year"))
      .join(Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir).select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nkey"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nkey"))
      .filter(pair)
      .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      .agg(sumMoney(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("supp_nation").asc, col("cust_nation").asc, col("l_year").asc)
  }

  /** TPC-H Q8 (national market share) — the deepest join graph the
    * fixture schema supports (7 tables): region→nation prunes the
    * customer market, part prunes the product line, and the share is a
    * conditional/total ratio of two integer-micros-exact sums per year —
    * engine-identical division.
    */
  def nationalMarketShare(spark: SparkSession, dir: String): DataFrame = {
    val americaNations = Tables.nation(spark, dir)
      .join(broadcast(Tables.region(spark, dir)
        .filter(col("r_name") === "AMERICA").select(col("r_regionkey"))),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("mkt_nkey"))
    val suppNation = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val vol = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_extendedprice"), col("l_discount"))
      .join(broadcast(Tables.part(spark, dir)
        .filter(col("p_type") === "STANDARD").select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(spark, dir)
        .filter(col("o_orderdate") >= lit("1996-01-01") &&
          col("o_orderdate") < lit("1998-01-01"))
        .select(col("o_orderkey"), col("o_custkey"), year(col("o_orderdate")).as("o_year")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir).select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(americaNations), col("c_nationkey") === col("mkt_nkey"))
      .join(Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(suppNation), col("s_nationkey") === col("sn_key"))
      .groupBy(col("o_year"))
      .agg(
        sumMoney(when(col("supp_nation") === "NATION_1", vol).otherwise(lit(0.0))).as("nation_vol"),
        sumMoney(vol).as("total_vol"))
      .select(col("o_year"),
        round(col("nation_vol") / col("total_vol"), 6).as("mkt_share"),
        col("nation_vol"), col("total_vol"))
      .orderBy(col("o_year").asc)
  }

  /** TPC-H Q15 (top supplier) — aggregate-then-argmax: per-supplier
    * quarter revenue (one partial-agg'd pass over the date-pruned fact),
    * the max revenue via a broadcast one-row cross join (the keySkew
    * total discipline — never a window over all suppliers), equality
    * keeps ties like the spec's view form. Money sums integer-micros.
    */
  def topSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1996-04-01"))
      .groupBy(col("l_suppkey"))
      .agg(sumMoney(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("total_revenue"))
    val maxRev = rev.agg(max(col("total_revenue")).as("max_rev"))
    rev.crossJoin(broadcast(maxRev))
      .filter(col("total_revenue") === col("max_rev"))
      .join(Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy(col("s_suppkey").asc)
  }

  /** TPC-H Q17 (small-quantity-order revenue) — the correlated-average
    * decorrelated: per-part average quantity is one partial agg joined
    * back (broadcast at any realistic part cardinality per executor
    * budget; shuffles like any dim otherwise), the threshold predicate
    * is a per-row comparison, and the answer is one exact-money scalar.
    * The 0.2·avg threshold stays in exact integer micro-units so the
    * comparison cannot waver between engines.
    */
  def smallQuantityRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
    // exact: quantities are integral; threshold = sum*200000/count in
    // integer micro-units (0.2 × avg × 1e6), compared against qty·1e6
    val avgQ = li.groupBy(col("l_partkey"))
      .agg(expr("sum(CAST(l_quantity AS BIGINT)) * 200000 div count(*)").as("thresh_micros"))
    li.join(broadcast(avgQ), Seq("l_partkey"))
      .filter(col("l_quantity").cast("long") * lit(1000000L) < col("thresh_micros"))
      .agg(sumMoney(col("l_extendedprice")).as("small_qty_revenue"),
        count(lit(1)).as("n_lines"))
  }

  /** TPC-H Q5 (local supplier volume) — the classic 6-table join-order
    * test: region→nation prune first (tiny dims, broadcast), the
    * customer-nation = supplier-nation condition closes the cycle, and
    * the one large-large join (lineitem ⋈ orders) carries only pruned
    * keys. Money sums via the integer-micros trick (FIXTURES.md float
    * determinism rule).
    */
  def localSupplierVolume(spark: SparkSession, dir: String): DataFrame = {
    val asiaNations = Tables.nation(spark, dir)
      .join(broadcast(Tables.region(spark, dir)
          .filter(col("r_name") === "ASIA").select(col("r_regionkey"))),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1997-01-01"))
      .select(col("o_orderkey"), col("o_custkey"))
    val cust = Tables.customer(spark, dir).select(col("c_custkey"), col("c_nationkey"))
    val sup = Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_nationkey"))
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"),
        col("l_extendedprice"), col("l_discount"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(asiaNations), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(sumMoney(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name").asc)
  }

  /** TPC-H Q1 (pricing summary report) — the canonical one-pass fact
    * aggregation: 8 aggregates over a 2-key group whose cardinality is
    * tiny (|returnflag|×|linestatus|), so the partial aggregation
    * collapses map-side and the exchange carries a handful of rows per
    * map task no matter how large lineitem grows. Money sums and
    * averages go through the integer-micros trick; averages divide the
    * exact micro-sum by the group count in one fixed expression shape
    * shared with the oracle.
    */
  def pricingSummary(spark: SparkSession, dir: String,
      cutoff: String = "2001-09-01"): DataFrame = {
    def microSum(c: Column): Column =
      sum(round(c * lit(1000000.0)).cast("long")).cast("double")
    val cnt = count(lit(1))
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit(cutoff))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"), // integral doubles: order-exact
        (microSum(col("l_extendedprice")) / lit(1000000.0)).as("sum_base_price"),
        (microSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          / lit(1000000.0)).as("sum_disc_price"),
        (microSum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * (lit(1.0) + col("l_tax"))) / lit(1000000.0)).as("sum_charge"),
        round(sum(col("l_quantity")) / cnt, 6).as("avg_qty"),
        round(microSum(col("l_extendedprice")) / lit(1000000.0) / cnt, 6).as("avg_price"),
        round(microSum(col("l_discount")) / lit(1000000.0) / cnt, 6).as("avg_disc"),
        cnt.as("count_order"))
      .orderBy(col("l_returnflag").asc, col("l_linestatus").asc)
  }

  /** TPC-H Q6 (forecasting revenue change) — the canonical pushed-filter
    * scan: three scan-level predicates, one global money sum, one output
    * row. The range filters reach the parquet scan (shipdate/discount/
    * quantity all in PushedFilters) so at scale the query reads only the
    * row groups whose statistics overlap the year.
    */
  def revenueChange(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1997-01-01") &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .agg(sumMoney(col("l_extendedprice") * col("l_discount")).as("revenue"))

  /** UNPIVOT — wide measure columns to long (metric, val) rows via
    * `stack`, the inverse reshape of [[pivotEvents]]. A Generate projection
    * (map-side 1→3, no shuffle); the long form is what generic
    * metric-store sinks and per-metric aggregations consume.
    */
  def unpivotLineitem(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        expr("stack(3, 'discount', l_discount, 'price', l_extendedprice, 'quantity', l_quantity)")
          .as(Seq("metric", "val")))
      .orderBy(col("l_orderkey").asc, col("l_linenumber").asc, col("metric").asc)

  /** Composite EXISTS query (TPC-H Q4 shape, adapted to the fixture's
    * columns): orders counted by priority when at least one line item
    * shipped more than 30 days after the order date. The correlated EXISTS
    * plans as a LEFT SEMI join with a composite (equi + range) condition —
    * the fact side is deduplicated BY THE JOIN (no distinct needed), and
    * the priority aggregation runs on the surviving orders only.
    */
  def orderPriorityCheck(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < lit("1998-06-01"))
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_shipdate"))
    ord.join(li,
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority").asc)
  }

  /** Part-dimension rollup: brand revenue over the lineitem fact — the
    * remaining star-schema leg (part ⋈ lineitem), large-fact⋈dimension with
    * the dimension broadcast and exact integer-micros revenue.
    */
  def partBrandRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        count(lit(1)).as("n_items"),
        sumMoney(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        countDistinct(col("p_partkey")).as("n_parts"))
      .orderBy(col("p_brand").asc)

  /** ntile quartiles per status — the equal-frequency binning window
    * (complement of the equal-width [[histogram]]). One shuffle on the
    * partition key.
    */
  def windowNtile(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        ntile(4).over(w).as("quartile"))
      .orderBy(col("o_orderkey").asc)
  }

  /** PIVOT: event counts per day × type as columns. The explicit value
    * list keeps the output schema static (a dynamic pivot would need a
    * values scan first); planned as one aggregation with conditional
    * counters — no per-column passes.
    */
  def pivotEvents(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy(col("day").asc)

  /** Statistical moments per group: sample stddev and correlation.
    * Rounding absorbs engine-accumulation ulps (stddev ≈ 1e5 at round-2 →
    * 1e-7 relative tolerance vs ~1e-11 actual divergence).
    */
  def aggStats(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        round(stddev_samp(col("o_totalprice")), 2).as("sd_price"),
        round(corr(col("o_totalprice"), col("o_custkey")), 6).as("corr_price_cust"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus").asc)

  /** Scalar-function bundle (SURVEY §2.C `q_scalar_bundle`): string / date /
    * math built-ins in one projection. Money math goes through decimal so
    * the rounded value is engine-exact.
    */
  def scalarBundle(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        year(col("l_shipdate")).cast("long").as("ship_year"),
        month(col("l_shipdate")).cast("long").as("ship_month"),
        date_trunc("month", col("l_shipdate")).as("ship_month_start"),
        (round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * lit(100.0))
          .cast("long").cast("double") / lit(100.0)).as("discounted"),
        lower(col("l_returnflag")).as("flag_lower"),
        concat(col("l_returnflag"), lit("/"), col("l_linestatus")).as("flag_status"),
        length(col("l_returnflag")).cast("long").as("flag_len"),
        abs(col("l_quantity")).as("abs_qty"))
      .orderBy(col("l_orderkey").asc, col("l_linenumber").asc)

  // ---- TPC-H completion (Q2/Q9/Q11/Q12/Q13/Q16/Q19/Q20/Q21/Q22) ----
  // The fixture schema has no partsupp table and fewer descriptive columns
  // than full TPC-H, so each query below keeps the CANONICAL SHAPE (the
  // plan pattern the benchmark exists to test) over the columns that
  // exist; the adaptation is named per query.

  /** TPC-H Q2 (minimum-cost supplier) — the correlated-min subquery,
    * decorrelated: partsupp is absent, so "cost" is the observed unit
    * price (`l_extendedprice / l_quantity`) of each shipment, and the
    * question becomes "per qualifying part, the EUROPE supplier(s) that
    * shipped it cheapest". The per-part min is one partial-agg'd pass
    * over the SAME candidate frame joined back (broadcast: one row per
    * qualifying part), so the fact table is read once — the classic
    * decorrelation Catalyst cannot do for a user-written correlated
    * scalar subquery. Unit price compares in exact integer micros.
    */
  def minCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val euNations = Tables.nation(spark, dir)
      .join(broadcast(Tables.region(spark, dir)
        .filter(col("r_name") === "EUROPE").select(col("r_regionkey"))),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val eu = Tables.supplier(spark, dir)
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("s_nationkey"))
      .join(broadcast(euNations), col("s_nationkey") === col("n_nationkey"))
    val parts = Tables.part(spark, dir)
      .filter(col("p_type") === "LARGE" && col("p_size").between(10, 20))
      .select(col("p_partkey"))
    val cand = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"),
        col("l_extendedprice"), col("l_quantity"))
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(eu, col("l_suppkey") === col("s_suppkey"))
      .withColumn("unit_micros",
        round(col("l_extendedprice") * lit(1000000.0) / col("l_quantity")).cast("long"))
    val minUnit = cand.groupBy(col("p_partkey").as("mk"))
      .agg(min(col("unit_micros")).as("min_micros"))
    cand.join(broadcast(minUnit),
        col("p_partkey") === col("mk") && col("unit_micros") === col("min_micros"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"), col("p_partkey"),
        (col("unit_micros").cast("double") / lit(1000000.0)).as("unit_price"))
      .distinct() // a supplier may ship the same part at the min price twice
      .orderBy(col("s_acctbal").desc, col("n_name").asc, col("s_name").asc,
        col("p_partkey").asc)
      .limit(100)
  }

  /** TPC-H Q9 (product-type profit) — the profit rollup by supplier
    * nation and order year. Supply cost (partsupp is absent) is modeled
    * as half the part's retail price per unit, which preserves the
    * query's point: a per-row profit expression mixing columns from
    * three tables, aggregated exactly. Profit stays in integer micros
    * end-to-end (`round(rev·1e6) − round(cost·1e6)·qty`), so the sum is
    * engine-identical. part is filtered at the scan (name LIKE) and
    * broadcast; nation broadcasts; lineitem⋈orders is the one large join.
    */
  def productTypeProfit(spark: SparkSession, dir: String): DataFrame = {
    val parts = Tables.part(spark, dir)
      .filter(col("p_name").contains("bolt"))
      .select(col("p_partkey"), col("p_retailprice"))
    val profitMicros =
      round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * lit(1000000.0)).cast("long") -
        round(col("p_retailprice") * lit(500000.0)).cast("long") *
          col("l_quantity").cast("long")
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"))
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)
          .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .join(Tables.orders(spark, dir)
          .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"), col("o_year"))
      .agg((sum(profitMicros).cast("double") / lit(1000000.0)).as("sum_profit"))
      .orderBy(col("nation").asc, col("o_year").desc)
  }

  /** TPC-H Q11 (important stock) — the HAVING-against-a-global-scalar
    * pattern: per-part shipped value for one nation's suppliers, kept
    * when above 0.1% of the total. Both sides of the cut stay in exact
    * integer micros and the threshold multiplies instead of divides
    * (`val·1000 > total`), so no float ratio can waver between engines.
    * The global total is a one-row re-aggregation of the per-part frame
    * (no second fact pass) broadcast back; the nation's supplier list
    * prunes lineitem via a broadcast semi join before any aggregation.
    */
  def importantPartValue(spark: SparkSession, dir: String): DataFrame = {
    val natSupp = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
        .filter(col("n_name") === "NATION_7").select(col("n_nationkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val perPart = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"), col("l_extendedprice"))
      .join(broadcast(natSupp), col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy(col("l_partkey"))
      .agg(sum(round(col("l_extendedprice") * lit(1000000.0)).cast("long")).as("val_micros"))
    val total = perPart.agg(sum(col("val_micros")).as("tot_micros"))
    perPart.crossJoin(broadcast(total))
      .filter(col("val_micros") * lit(1000L) > col("tot_micros"))
      .select(col("l_partkey").as("p_partkey"),
        (col("val_micros").cast("double") / lit(1000000.0)).as("value"))
      .orderBy(col("value").desc, col("p_partkey").asc)
  }

  /** TPC-H Q12 (shipping priority classes) — conditional counting after
    * a fact-fact join: lines that shipped more than 30 days after their
    * order date in 1996, split by line status (the fixture's stand-in
    * for ship mode), counting urgent vs non-urgent order priorities via
    * CASE. The year filter prunes lineitem at the scan; the group key is
    * 2-valued so partials collapse map-side.
    */
  def latePriorityLines(spark: SparkSession, dir: String): DataFrame = {
    val urgent = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1997-01-01"))
      .select(col("l_orderkey"), col("l_linestatus"), col("l_shipdate"))
      .join(Tables.orders(spark, dir)
          .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"))
      .groupBy(col("l_linestatus"))
      .agg(sum(when(urgent, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(urgent, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy(col("l_linestatus").asc)
  }

  /** TPC-H Q13 (customer order distribution) — the LEFT OUTER join with
    * a join-side predicate (the filter lives in the ON clause, so
    * customers with zero qualifying orders still appear with count 0),
    * then a distribution over the counts. Two aggregations, both
    * partial-agg'd; the second one's input is customer-cardinality, not
    * fact-cardinality.
    */
  def customerDistribution(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") =!= "4-NOT SPECIFIED")
      .select(col("o_custkey"), col("o_orderkey"))
    Tables.customer(spark, dir).select(col("c_custkey"))
      .join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** TPC-H Q16 (supplier counts by part attributes) — COUNT(DISTINCT)
    * under a NOT-IN exclusion: suppliers per (brand, type, size) bucket,
    * excluding one brand, one type, and any supplier with a negative
    * account balance (the fixture's stand-in for the complaints set).
    * The NOT IN plans as a broadcast anti join on the tiny exclusion
    * list; part attributes broadcast; the distinct shuffles once on the
    * group key with the suppkey carried for the exact distinct.
    */
  def supplierPartCounts(spark: SparkSession, dir: String): DataFrame = {
    val excluded = Tables.supplier(spark, dir)
      .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    val parts = Tables.part(spark, dir)
      .filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    Tables.lineitem(spark, dir).select(col("l_partkey"), col("l_suppkey"))
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(excluded), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand").asc,
        col("p_type").asc, col("p_size").asc)
  }

  /** TPC-H Q19 (discounted revenue, disjunctive predicates) — the OR-of-
    * conjunctions query: three brand/size/quantity windows unioned by
    * predicate, not by plan. The part side pre-filters to the union of
    * the branches' part constraints at the scan (brand ∈ {1,2,3},
    * size ≤ 15 — both in PushedFilters) and broadcasts; the residual
    * disjunction evaluates post-join in one codegen stage. One exact
    * money sum out.
    */
  def discountedRevenueDisjunct(spark: SparkSession, dir: String): DataFrame = {
    val parts = Tables.part(spark, dir)
      .filter(col("p_brand").isin("Brand#1", "Brand#2", "Brand#3") &&
        col("p_size").between(1, 15))
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    val branch =
      (col("p_brand") === "Brand#1" && col("p_size").between(1, 5) &&
        col("l_quantity").between(1, 11)) ||
      (col("p_brand") === "Brand#2" && col("p_size").between(1, 10) &&
        col("l_quantity").between(10, 20)) ||
      (col("p_brand") === "Brand#3" && col("p_size").between(1, 15) &&
        col("l_quantity").between(20, 30))
    Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"))
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .filter(branch)
      .agg(sumMoney(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  /** TPC-H Q20 (potential part promotion) — the nested-aggregate semi
    * join: suppliers who DOMINATED the 1996 supply of some small-prefix
    * part (shipped more than half its total, the fixture's stand-in for
    * partsupp availability vs demand). The per-(part,supplier) totals
    * aggregate once; the per-part totals RE-aggregate that frame (no
    * second fact pass) and join back broadcast — exact integer
    * comparison `2q > total` — and the surviving supplier keys semi-join
    * up to names. Both aggregates partial map-side.
    */
  def dominantSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val smallParts = Tables.part(spark, dir)
      .filter(col("p_name").startsWith("small")).select(col("p_partkey"))
    val shipped = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1997-01-01"))
      .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"))
      .join(broadcast(smallParts), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity").cast("long")).as("q"))
    val totals = shipped.groupBy(col("l_partkey").as("tk"))
      .agg(sum(col("q")).as("total_q"))
    val dominant = shipped
      .join(broadcast(totals), col("l_partkey") === col("tk"))
      .filter(col("q") * lit(2L) > col("total_q"))
      .select(col("l_suppkey")).distinct()
    Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_name"))
      .join(dominant, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .orderBy(col("s_suppkey").asc)
  }

  /** TPC-H Q21 (suppliers who kept orders waiting) — the EXISTS +
    * NOT-EXISTS self-join pair, DECORRELATED into one conditional
    * aggregation: per finished multi-supplier order, the supplier whose
    * shipment was late (>30 days after the order date) while every OTHER
    * supplier on the order shipped on time. The spec's quantifier pair
    * ("∃ another supplier" / "∄ another LATE supplier") is a property of
    * per-order COUNTS: a supplier qualifies iff the order has ≥ 2
    * suppliers and EXACTLY ONE late one — itself. So after the (order,
    * supplier, any-late) reduction, one more aggregation per order
    * (n_supp, n_late, the unique late suppkey) replaces both self-joins:
    * the reduced frame shuffles once instead of three times, and the
    * quantifiers evaluate as two integer comparisons. (The self-join
    * form was measured at 1.66 s; this one ~2×-fewer exchanges — the
    * decorrelation Catalyst cannot derive from user-written EXISTS
    * subqueries, which is why it is spelled here.) numwait counts
    * orders, not lines — grain-stable; the oracle keeps the spec's
    * EXISTS form, pinning the equivalence.
    */
  def waitingSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val perOrderSupp = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(Tables.orders(spark, dir)
          .filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(when(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"),
        1L).otherwise(0L)).as("late"))
    val waiting = perOrderSupp
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_supp"), sum(col("late")).as("n_late"),
        max(when(col("late") === 1L, col("l_suppkey"))).as("late_supp"))
      .filter(col("n_supp") >= 2L && col("n_late") === 1L)
      .groupBy(col("late_supp").as("l_suppkey"))
      .agg(count(lit(1)).as("numwait"))
    waiting
      .join(Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_suppkey").asc)
      .limit(100)
  }

  /** TPC-H Q22 (global sales opportunity) — scalar-subquery threshold +
    * anti join: positive-balance customers in a fixed nation set whose
    * balance beats the set's average, and who placed no order since
    * 2000. The average never materializes as a float: the one-row
    * (sum_micros, n) aggregate broadcasts back and the cut multiplies
    * (`bal_micros · n > sum_micros`), exact in integer space. The
    * no-recent-orders quantifier is a left anti join against the
    * date-pruned order keys.
    */
  def dormantCustomers(spark: SparkSession, dir: String): DataFrame = {
    val natSet = Seq(1, 3, 5, 7, 9, 11, 13)
    val sel = Tables.customer(spark, dir)
      .filter(col("c_nationkey").isin(natSet: _*) && col("c_acctbal") > 0)
      .select(col("c_custkey"), col("c_nationkey"),
        col("c_acctbal"), round(col("c_acctbal") * lit(1000000.0)).cast("long").as("bal_micros"))
    val stats = sel.agg(sum(col("bal_micros")).as("sum_micros"),
      count(lit(1)).as("n_sel"))
    val recent = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("2000-01-01"))
      .select(col("o_custkey"))
    sel.crossJoin(broadcast(stats))
      .filter(col("bal_micros") * col("n_sel") > col("sum_micros"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey").as("cntrycode"))
      .agg(count(lit(1)).as("numcust"), sumMoney(col("c_acctbal")).as("totacctbal"))
      .orderBy(col("cntrycode").asc)
  }

  /** Pearson correlation matrix (`q_corr_matrix`) over lineitem's four
    * money/quantity columns — the numeric-profiling pass next to
    * [[qualityChecks]]: feature-redundancy screening and drift baselining
    * both start from exactly this matrix.
    *
    * Determinism (the [[graft.operators.EventOps]] anomaly convention,
    * extended to products): every moment is an EXACT integer — values
    * scale to cents (2-decimal money, so round(x·100) is exact), per-row
    * products stay inside long, and sums accumulate as decimal(38,0)
    * (Spark) / HUGEINT (DuckDB) so no partition-order double drift can
    * exist. A built-in `corr()` would sum doubles in partition order —
    * nondeterministic across runs AND engines. The final r =
    * (n·P−S_a·S_b)/(√(n·Q_a−S_a²)·√(n·Q_b−S_b²)) is one shared double
    * expression over the exact moments with identical operand order in
    * both engines, round-6.
    *
    * Scale: ONE corpus pass computes all 15 moments map-side-partially
    * (the shuffle carries one 15-number row per task); the matrix
    * assembly reads the one-row frame — localCheckpointed so the six
    * pair projections share the single pass instead of re-deriving it.
    */
  def corrMatrix(spark: SparkSession, dir: String): DataFrame = {
    val names = Seq("l_discount", "l_extendedprice", "l_quantity", "l_tax")
    val cents = names.map(c => round(col(c) * lit(100.0)).cast("long").as(c))
    corrMatrixOn(Tables.lineitem(spark, dir).select(cents: _*), names)
  }

  /** Parametric core: `base` columns must already be exact integers
    * (longs small enough that pairwise per-row products fit in long).
    */
  private[graft] def corrMatrixOn(base: DataFrame,
      names: Seq[String]): DataFrame = {
    val pairs = for {
      i <- names.indices; j <- names.indices if i < j
    } yield (names(i), names(j))
    def d38(c: Column) = c.cast("decimal(38,0)")
    val aggs = Seq(count(lit(1)).cast("decimal(38,0)").as("n")) ++
      names.map(c => sum(d38(col(c))).as(s"s_$c")) ++
      names.map(c => sum(d38(col(c) * col(c))).as(s"q_$c")) ++
      pairs.map { case (a, b) => sum(d38(col(a) * col(b))).as(s"p_${a}_${b}") }
    val m = base.agg(aggs.head, aggs.tail: _*).localCheckpoint(false)
    def dbl(c: String) = col(c).cast("double")
    val rows = pairs.map { case (a, b) =>
      m.select(lit(a).as("col_a"), lit(b).as("col_b"),
        round((dbl("n") * dbl(s"p_${a}_${b}") - dbl(s"s_$a") * dbl(s"s_$b")) /
          (sqrt(dbl("n") * dbl(s"q_$a") - dbl(s"s_$a") * dbl(s"s_$a")) *
            sqrt(dbl("n") * dbl(s"q_$b") - dbl(s"s_$b") * dbl(s"s_$b"))),
          6).as("corr"))
    }
    rows.reduce(_ unionByName _).orderBy(col("col_a").asc, col("col_b").asc)
  }
}
