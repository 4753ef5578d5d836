package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: MinHash-LSH dedup at 10× fixture scale on a REALISTIC
  * vocabulary — `runMain graft.DedupScale [n]`. The fixtures' 31-word
  * vocabulary always takes the dictionary-bitset path; this generates
  * n docs of 40 tokens from a 10k-word vocabulary (general path: hashed
  * bitmap prefilter + sorted-merge verify) with 20% planted near-dups
  * (one token replaced → Jaccard 39/41 ≈ 0.951), then checks the banded
  * plan returns EXACTLY the survivors of the blocked all-pairs join at
  * τ=0.9 — and at what cost.
  */
object DedupScale {
  // one session + timer for both modes: the hotcluster numbers quoted in
  // LshGuard's scaladoc stay comparable to the main-path measurements
  private def benchSession(): SparkSession = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark
  }

  private def timed[A](tag: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val out = f
    println(f"[dedupscale] $tag: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    out
  }

  private def randomDoc(rnd: scala.util.Random, vocab: IndexedSeq[String],
      nTokens: Int = 40): Array[String] = {
    val seen = collection.mutable.LinkedHashSet.empty[String]
    while (seen.size < nTokens) seen += vocab(rnd.nextInt(vocab.length))
    seen.toArray
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 30000
    // "noblocked": skip the O(n²) baseline (668.7 s at n=30k, measured
    // round 4) and cross-check the candidate paths against each other —
    // both are exact, so equality still validates.
    // "hotcluster": measure the LshGuard instead — plant a boilerplate
    // cluster (the web-corpus pathology) and compare the band join with
    // the guard on vs off: bounded stays bounded, unguarded re-creates
    // the quadratic join inside the cluster's buckets.
    val mode = if (args.length > 1) args(1) else ""
    if (mode == "hotcluster") { hotClusterRun(n); return }
    // "cc": measure the transitive-closure resolution (connected
    // components over the banded-LSH pairs) and validate the star map
    // against driver-side union-find.
    if (mode == "cc") { ccRun(n); return }
    // "hamming": measure the fingerprint-hamming join's identical-fp
    // collapse — plant a giant exact-duplicate cluster (the re-hosted
    // image / boilerplate-page pathology) and compare the collapsed plan
    // against the legacy direct blocked self-join.
    if (mode == "hamming") { hammingRun(n); return }
    // "semdedup": the cross-cell boundary-probe grid — planted near-dup
    // groups, k-means cells, ε ∈ {0, …}: recovered pairs vs extra join
    // work per epsilon, against the kCells=1 exact ceiling.
    if (mode == "semdedup") { semDedupRun(n); return }
    // "substring": validate span-coverage dedup against a driver-side
    // string-window reference, then time it at n and 2n (linear check).
    if (mode == "substring") { substringRun(n); return }
    // "winmaint": measure the streaming window-hash store's probe cost vs
    // uncompacted micro-batch depth, then the compaction fold — the
    // cadence datum for the substring ingest/trim streams.
    if (mode == "winmaint") { winmaintRun(n); return }
    // "containment": the asymmetric prefix-filtered containment join vs
    // blocked all-pairs on planted quoted-inside docs; third arg
    // "noblocked" skips the O(n²) baseline.
    if (mode == "containment") {
      containmentRun(n, args.length > 2 && args(2) == "noblocked"); return
    }
    // "spanskew": adversarial boilerplate skew for the r16 span dedup +
    // funnel hash dedup — one span hash carrying n/2 occurrences, then a
    // 10× hotter variant; bounded per-stage time is the claim under test
    // (min-struct first arrival is map-side combinable; the join back is
    // a 1-row-per-hash build side under AQE skew handling).
    if (mode == "spanskew") { spanSkewRun(n); return }
    val skipBlocked = mode == "noblocked"
    val tau = 0.9
    val spark = benchSession()
    import spark.implicits._

    val rnd = new scala.util.Random(9090L)
    val vocab = (0 until 10000).map(i => f"w$i%05d")
    val base = Array.fill(n * 4 / 5)(randomDoc(rnd, vocab))
    val dups = Array.fill(n / 5) {
      val b = base(rnd.nextInt(base.length)).clone()
      b(rnd.nextInt(b.length)) = vocab(rnd.nextInt(vocab.length))
      b
    }
    val docs = (base ++ dups).zipWithIndex
      .map { case (toks, i) => (i.toLong, toks.mkString(" ")) }
      .toSeq.toDF("doc_id", "text")
      .repartition(32).cache()
    docs.count()

    def time[A](name: String)(f: => A): A = timed(s"n=$n tau=$tau $name")(f)
    val dictPairs = time("dict-bitset jaccard") {
      graft.operators.DedupOps.jaccardPairsDictOn(docs, tau)
        .select("b_id").distinct().collect().map(_.getLong(0)).toSet
    }
    val prefixPairs = time("prefix-filter jaccard") {
      graft.operators.DedupOps.jaccardPairsPrefixOn(docs, tau)
        .select("b_id").distinct().collect().map(_.getLong(0)).toSet
    }
    assert(dictPairs == prefixPairs, "dict-bitset path must equal the prefix path")
    val exactPairs = if (skipBlocked) prefixPairs else time("blocked all-pairs jaccard") {
      graft.operators.DedupOps.jaccardPairsBlockedOn(docs, tau)
        .select("b_id").distinct().collect().map(_.getLong(0)).toSet
    }
    val lshSurvivors = time("minhash banded LSH survivors") {
      graft.operators.DedupOps.minHashLshOn(docs, tau)
        .collect().map(_.getLong(0)).toSet
    }
    val allIds = (0L until (base.length + dups.length).toLong).toSet
    val exactSurvivors = allIds -- exactPairs
    println(s"[dedupscale] exact survivors=${exactSurvivors.size} lsh survivors=${lshSurvivors.size} " +
      s"equal=${exactSurvivors == lshSurvivors} prefix_pairs_equal=${prefixPairs == exactPairs}")
    spark.stop()
  }

  /** Closure measurement: the planted near-dups of one base doc form
    * star/chain clusters (base≈dup₁, base≈dup₂, often dup₁≈dup₂), so the
    * pair set has real transitive structure. Times the banded pair pass
    * and the large-star/small-star closure separately, then checks the
    * star map equals driver-side union-find over the same pairs.
    */
  private def ccRun(n: Int): Unit = {
    val tau = 0.9
    val spark = benchSession()
    import spark.implicits._
    val rnd = new scala.util.Random(9090L)
    val vocab = (0 until 10000).map(i => f"w$i%05d")
    val base = Array.fill(n * 4 / 5)(randomDoc(rnd, vocab))
    val dups = Array.fill(n / 5) {
      val b = base(rnd.nextInt(base.length)).clone()
      b(rnd.nextInt(b.length)) = vocab(rnd.nextInt(vocab.length))
      b
    }
    val docs = (base ++ dups).zipWithIndex
      .map { case (toks, i) => (i.toLong, toks.mkString(" ")) }
      .toSeq.toDF("doc_id", "text")
      .repartition(32).cache()
    docs.count()
    def time[A](name: String)(f: => A): A = timed(s"cc n=$n tau=$tau $name")(f)
    val pairsDf = time("pair generation (banded LSH)") {
      val df = graft.operators.DedupOps.minHashLshPairsOn(docs, tau)
        .select($"a_id".as("a"), $"b_id".as("b")).cache()
      df.count()
      df
    }
    val star = time("connected components (large-star/small-star)") {
      graft.operators.DedupOps.connectedComponentsOn(pairsDf)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    // driver-side union-find over the same pairs, rooted at component mins
    val edges = pairsDf.collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val expect = nodes.map(v => v -> find(v)).filter(p => p._1 != p._2).toMap
    val comps = nodes.map(find).distinct.length
    val largest = nodes.groupBy(find).map(_._2.length).max
    println(s"[dedupscale] cc pairs=${edges.length} nodes=${nodes.length} " +
      s"components=$comps largest=$largest union_find_equal=${star == expect}")
    spark.stop()
  }

  /** Substring-span dedup at scale: 60-token docs over a 10k vocabulary,
    * a 25-token boilerplate span planted into 30% of docs at random
    * offsets (the license-block/template pathology the operator exists
    * for). Correctness: per-doc (n_windows, n_dup_windows) validated
    * EXACTLY against a driver-side string-window count at 3k docs (the
    * Spark side counts xxhash64 hashes — equality also witnesses
    * collision-freedom at this size). Cost: timed at n and 2n; both the
    * window explode and the (hash, count) exchange are row-linear, so the
    * wall-clock ratio should track the corpus ratio.
    */
  private def substringRun(n: Int): Unit = {
    val w = 20
    val spark = benchSession()
    import spark.implicits._
    val rnd = new scala.util.Random(4242L)
    val vocab = (0 until 10000).map(i => f"w$i%05d")
    val boiler = Array.fill(25)(vocab(rnd.nextInt(vocab.length)))
    def gen(count: Int): Array[(Long, String)] = Array.tabulate(count) { i =>
      val toks = Array.fill(60)(vocab(rnd.nextInt(vocab.length)))
      if (rnd.nextDouble() < 0.3) {
        val p = rnd.nextInt(60 - boiler.length)
        System.arraycopy(boiler, 0, toks, p, boiler.length)
      }
      (i.toLong, toks.mkString(" "))
    }

    // correctness at 3k docs vs driver-side string windows
    val small = gen(3000)
    val winCount = collection.mutable.Map.empty[String, Int]
    def windows(text: String): Seq[String] = {
      val t = text.split(" ")
      if (t.length < w) Seq.empty
      else (0 to t.length - w).map(i => t.slice(i, i + w).mkString(" "))
    }
    small.foreach { case (_, text) =>
      windows(text).foreach(s => winCount(s) = winCount.getOrElse(s, 0) + 1)
    }
    val expect = small.map { case (id, text) =>
      val ws = windows(text)
      id -> ((ws.length.toLong, ws.count(winCount(_) > 1).toLong))
    }.toMap
    val got = graft.operators.DedupOps
      .dedupSubstringOn(small.toSeq.toDF("doc_id", "text"), w)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    println(s"[dedupscale] substring n=3000 driver_reference_equal=${got == expect}")

    // trim correctness: same corpus, driver-side first-occurrence removal
    // (ownership = lexicographic min (doc_id, pos), matching the operator's
    // tuple-min — no scalar encoding that could alias for long docs)
    val ownKey = collection.mutable.Map.empty[String, (Long, Long)]
    val tupleOrd = Ordering.Tuple2[Long, Long]
    small.foreach { case (id, text) =>
      windows(text).zipWithIndex.foreach { case (s, p) =>
        val key = (id, (p + 1).toLong)
        if (ownKey.get(s).forall(k => tupleOrd.gt(k, key))) ownKey(s) = key
      }
    }
    val expectTrim = small.map { case (id, text) =>
      val t = text.split(" ")
      val removablePos = windows(text).zipWithIndex.collect {
        case (s, p) if winCount(s) > 1 && ownKey(s) != ((id, (p + 1).toLong)) => p + 1
      }
      val dropped = removablePos.flatMap(p => p to p + w - 1).toSet
      val kept = t.zipWithIndex.collect { case (tok, i) if !dropped(i + 1) => tok }
      id -> ((kept.mkString(" "), (t.length - kept.length).toLong))
    }.toMap
    val gotTrim = graft.operators.DedupOps
      .dedupSubstringTrimOn(small.toSeq.toDF("doc_id", "text"), w)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    println(s"[dedupscale] substring-trim n=3000 driver_reference_equal=${gotTrim == expectTrim}")

    // cost at n and 2n
    Seq(n, 2 * n).foreach { sz =>
      val docs = gen(sz).toSeq.toDF("doc_id", "text").repartition(32).cache()
      docs.count()
      val flagged = timed(s"substring n=$sz span-coverage pass") {
        graft.operators.DedupOps.dedupSubstringOn(docs, w)
          .filter($"n_dup_windows" > 0).count()
      }
      val trimmed = timed(s"substring n=$sz trim pass") {
        graft.operators.DedupOps.dedupSubstringTrimOn(docs, w)
          .filter($"n_removed" > 0).count()
      }
      println(s"[dedupscale] substring n=$sz flagged_docs=$flagged trimmed_docs=$trimmed")
      docs.unpersist()
    }
    spark.stop()
  }

  /** Window-hash store maintenance — the cadence twin of
    * [[RetrievalScale]]'s postings `maintenance` mode, for the substring
    * ingest/trim streams. The store (`corpus__winhashes`) is an append
    * log: every micro-batch of [[graft.operators.DedupOps
    * .substringIncrementalBatch]] adds one file-set, and the per-batch
    * pruned probe (store ⋈ broadcast of the batch's distinct hashes)
    * opens every one of them. This mode ingests `n` micro-batches of 250
    * 60-token docs (30% carrying a shared boilerplate span so the probe
    * does real matching work), times the SAME held-out probe at log
    * depths 1/2/4/…/n, folds the log with [[graft.sources.CatalogOps
    * .compactWinhashes]], checks the store content is row-identical
    * pre/post, and re-times — the datum that tells an operator how often
    * to fold.
    */
  private def winmaintRun(nArg: Int): Unit = {
    import graft.sources.CatalogOps
    import graft.operators.DedupOps
    import org.apache.spark.sql.functions.broadcast
    val w = 20
    // in this mode the positional arg is a BATCH count (the default 30000
    // is the pairs-mode doc count — clamp to something an append log
    // plausibly reaches between folds)
    val nBatches = math.min(nArg, 256)
    val batchSize = 250
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.warehouse.dir", "/tmp/graft-dedupscale-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val db = "dedupwinmaint"
    CatalogOps.dropDatabase(spark, db)
    // a crashed prior run can leave the directory behind a fresh metastore
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(
      s"/tmp/graft-dedupscale-warehouse/$db.db"))
    CatalogOps.createDatabase(spark, db)

    val rnd = new scala.util.Random(6060L)
    val vocab = (0 until 10000).map(i => f"w$i%05d")
    val boiler = Array.fill(25)(vocab(rnd.nextInt(vocab.length)))
    def gen(count: Int, offset: Long): Seq[(Long, String)] = Seq.tabulate(count) { i =>
      val toks = Array.fill(60)(vocab(rnd.nextInt(vocab.length)))
      if (rnd.nextDouble() < 0.3) {
        val p = rnd.nextInt(60 - boiler.length)
        System.arraycopy(boiler, 0, toks, p, boiler.length)
      }
      (offset + i, toks.mkString(" "))
    }

    // the probe every ingest pays: store ⋈ broadcast(batch's distinct
    // hashes) — held-out batch so the measured work is constant per depth
    val probeHashes = DedupOps
      .windowHashes(gen(batchSize, 900000000L).toDF("doc_id", "text"), w)
      .select($"wh").distinct().cache()
    probeHashes.count()
    def store() = spark.table(s"`$db`.`corpus__winhashes`")
    // min of 3 reps: the datum is the plan's cost, not a GC draw
    def probeSec(): Double = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      store().join(broadcast(probeHashes), "wh").count()
      (System.nanoTime() - t0) / 1e9
    }.min
    def files(): Long = store().inputFiles.length.toLong

    val checkpoints = Iterator.iterate(1)(_ * 2).takeWhile(_ < nBatches).toSeq :+ nBatches
    var done = 0
    checkpoints.foreach { target =>
      while (done < target) {
        DedupOps.substringIncrementalBatch(
          gen(batchSize, done.toLong * batchSize).toDF("doc_id", "text"),
          db, "corpus", w, batchId = Some(done + 1L))
        done += 1
      }
      println(f"[dedupscale] winmaint depth=$done files=${files()} probe=${probeSec()}%.2f s")
    }

    val before = store().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val t0 = System.nanoTime()
    CatalogOps.compactWinhashes(spark, db, "corpus")
    val cSec = (System.nanoTime() - t0) / 1e9
    val after = store().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    require(before == after, "compaction changed the window-hash store content")
    println(f"[dedupscale] winmaint compacted files=${files()} probe=${probeSec()}%.2f s " +
      f"(compact cost $cSec%.2f s, ${before.size} hash rows unchanged)")
    CatalogOps.dropDatabase(spark, db)
    spark.stop()
  }

  /** SemDeDup boundary-probe grid: planted near-dup groups (unit-vector
    * centers + small perturbations, within-group cosine ≥ τ) in a random
    * background, clustered into kCells ≪ groups so k-means inevitably
    * SPLITS some groups across cells — the published cross-cell miss.
    * For each ε the run reports: duplicates recovered (vs the kCells=1
    * exact ceiling), the double-assigned row fraction (the extra join
    * work multi-assignment buys), and wall time. The datum behind the
    * `epsilon` knob's default-off documentation.
    */
  private def semDedupRun(n: Int): Unit = {
    val tau = 0.9
    val kCells = 16
    val dim = 16
    val spark = benchSession()
    import spark.implicits._
    val rnd = new scala.util.Random(5151L)
    def unit(): Array[Double] = {
      val v = Array.fill(dim)(rnd.nextGaussian())
      val norm = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / norm)
    }
    // planted groups: 1 in 10 docs is a perturbed copy of a group center
    val nGroups = n / 20
    val centers = Array.fill(nGroups)(unit())
    var id = 0L
    val rows = collection.mutable.ArrayBuffer.empty[(Long, Seq[Double])]
    centers.foreach { c =>
      (0 until 2).foreach { _ =>
        val v = c.zip(unit()).map { case (ci, pi) => ci + 0.18 * pi }
        val norm = math.sqrt(v.map(x => x * x).sum)
        rows += ((id, v.map(_ / norm).toSeq)); id += 1
      }
    }
    while (rows.length < n) { rows += ((id, unit().toSeq)); id += 1 }
    val emb = rows.toSeq.toDF("vec_id", "embedding").repartition(32).cache()
    emb.count()
    def run(eps: Double, k: Int): (Set[Long], Double) = {
      val t0 = System.nanoTime()
      val dups = graft.operators.DedupOps
        .semanticDedupCellsOn(emb, tau, k, iters = 3, epsilon = eps)
        .select("dup_id").collect().map(_.getLong(0)).toSet
      (dups, (System.nanoTime() - t0) / 1e9)
    }
    val (ceiling, ceilSec) = run(0.0, 1) // kCells=1 ≡ exact all-pairs
    println(f"[dedupscale] semdedup n=$n groups=$nGroups ceiling_dups=${ceiling.size} ($ceilSec%.1f s)")
    // centroids are epsilon-independent: train ONCE for the whole grid so
    // the double-assignment count never perturbs the per-epsilon timings
    val cents = graft.operators.KnnOps.kmeansCentroids(emb, kCells, 3)
    Seq(0.0, 0.005, 0.01, 0.02, 0.05, 0.1).foreach { eps =>
      val (dups, sec) = run(eps, kCells)
      // extra join work ∝ double-assigned fraction
      import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
      val assigned = emb.select(org.apache.spark.sql.functions.explode(
          toCol(graft.plans.NearCentroidCells(
            toExpr($"embedding"), cents.toSeq, kCells, eps))).as("cell"))
        .count()
      val dblFrac = (assigned - n).toDouble / n
      val recovered = (dups & ceiling).size.toDouble / math.max(1, ceiling.size)
      println(f"[dedupscale] semdedup eps=$eps%.3f recovered=${recovered * 100}%.1f%% " +
        f"double_assigned=${dblFrac * 100}%.1f%% time=$sec%.1f s")
    }
    // giant-cell refinement: force a degenerate quantizer (kCells=2 over
    // this geometry puts most of the corpus in one cell → ~(n/2)² pair
    // candidates) and compare the capped recursive re-cluster against the
    // uncapped quadratic cell
    def runCap(cap: Long): (Set[Long], Double) = {
      val t0 = System.nanoTime()
      val dups = graft.operators.DedupOps
        .semanticDedupCellsOn(emb, tau, kCells = 2, iters = 3, epsilon = 0.0,
          maxCellRows = cap)
        .select("dup_id").collect().map(_.getLong(0)).toSet
      (dups, (System.nanoTime() - t0) / 1e9)
    }
    val (noCap, noCapSec) = runCap(0L)
    val (capped, capSec) = runCap((n / 16).toLong)
    println(f"[dedupscale] semdedup giantcell kCells=2 uncapped=${noCap.size} dups ($noCapSec%.1f s) " +
      f"capped(n/16)=${capped.size} dups ($capSec%.1f s) " +
      f"kept=${(capped & noCap).size * 100.0 / math.max(1, noCap.size)}%.1f%% wrong_merges=${(capped -- noCap).size}")
    spark.stop()
  }

  /** Collapse measurement for [[graft.operators.DedupOps.hammingNearPairs]]:
    * half the corpus is ONE exact-duplicate fingerprint cluster (a
    * re-hosted image / boilerplate page hashes identically), half is
    * random fps with planted ≤2-bit near-copies. The legacy plan — the
    * direct (chunk, cval) blocked self-join over id-level rows, exactly
    * what shipped before round 13 — enumerates (maxHamming+1)·c² rows for
    * the cluster and distincts them; the collapsed plan blocks over
    * DISTINCT fps and expands members afterward, so its pre-distinct work
    * is output-sized. Both are exact; equality of the pair sets is
    * asserted on a subsample and counts on the whole.
    */
  private def hammingRun(n: Int): Unit = {
    // id spaces: normal 0…n/2-1, cluster 1e6+, nearCluster 2e6+ — they
    // must not collide (hammingNearPairs assumes unique ids, and the
    // non-cluster cross-check filters on id < 1e6)
    require(n / 2 < 1000000, s"hamming mode supports n < 2000000, got $n")
    val maxHamming = 8
    val spark = benchSession()
    import spark.implicits._
    val rnd = new scala.util.Random(3131L)
    val clusterFp = rnd.nextLong()
    val cluster = (0 until n / 2).map(i => (1000000L + i, clusterFp))
    val normalBase = new Array[Long](n / 2)
    val normal = (0 until n / 2).map { i =>
      val base = rnd.nextLong()
      val fp = if (i % 5 == 0 && i > 0) {
        // near-copy of the previous base: ≤2 bit flips
        normalBase(i - 1) ^ (1L << rnd.nextInt(64)) ^ (1L << rnd.nextInt(64))
      } else base
      normalBase(i) = fp
      (i.toLong, fp)
    }
    val fps = (normal ++ cluster).toDF("id", "fp").repartition(32).cache()
    fps.count()
    val c = n / 2
    def time[A](name: String)(f: => A): A =
      timed(s"hamming n=$n cluster=$c $name")(f)
    val collapsed = time("collapsed (distinct-fp blocked join)") {
      graft.operators.DedupOps.hammingNearPairs(fps, maxHamming).count()
    }
    val legacy = time("legacy (direct id-level blocked join)") {
      legacyHammingNearPairs(fps, maxHamming).count()
    }
    // exactness cross-check on the non-cluster half (small enough to collect)
    val smallFps = fps.filter($"id" < 1000000L)
    val gotSmall = graft.operators.DedupOps.hammingNearPairs(smallFps, maxHamming)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val legacySmall = legacyHammingNearPairs(smallFps, maxHamming)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"[dedupscale] hamming pairs collapsed=$collapsed legacy=$legacy " +
      s"counts_equal=${collapsed == legacy} noncluster_pairs_equal=${gotSmall == legacySmall}")

    // RESIDUAL pathology: a cluster of NEAR-identical-but-UNEQUAL fps
    // (random ≤2-bit flips of one base — the collapse can't help, every
    // fp is distinct and they all share most chunk buckets). This is what
    // the occupancy cap exists for: capped drops the degenerate buckets'
    // candidates, uncapped re-creates the quadratic join over distinct fps.
    val nearCluster = (0 until n / 2).map { i =>
      (2000000L + i, clusterFp ^ (1L << rnd.nextInt(64)) ^ (1L << rnd.nextInt(64)))
    }
    val fps2 = (normal ++ nearCluster).toDF("id", "fp").repartition(32).cache()
    fps2.count()
    val capped = timed(s"hamming n=$n nearcluster=$c capped (maxBucket=1000)") {
      graft.operators.DedupOps.hammingNearPairs(fps2, maxHamming, maxBucket = 1000)
        .count()
    }
    val uncapped = timed(s"hamming n=$n nearcluster=$c uncapped (maxBucket=0)") {
      graft.operators.DedupOps.hammingNearPairs(fps2, maxHamming, maxBucket = 0)
        .count()
    }
    println(s"[dedupscale] hamming nearcluster pairs capped=$capped uncapped=$uncapped " +
      s"(capped ⊆ uncapped by construction; the gap is the degenerate buckets' recall trade)")
    spark.stop()
  }

  /** The pre-round-13 hammingNearPairs, kept verbatim here as the A/B
    * baseline: blocked self-join over ID-LEVEL chunk rows, distinct AFTER
    * pair enumeration — quadratic in a duplicate cluster's size times the
    * chunk count.
    */
  private def legacyHammingNearPairs(fps: org.apache.spark.sql.DataFrame,
      maxHamming: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val chunked = graft.operators.DedupOps.hammingChunkRows(fps, maxHamming)
    val l = chunked.select(col("chunk"), col("cval"), col("id").as("a_id"),
      col("fp").as("a_fp"))
    val r = chunked.select(col("chunk").as("chunk_r"), col("cval").as("cval_r"),
      col("id").as("b_id"), col("fp").as("b_fp"))
    l.join(r,
        col("chunk") === col("chunk_r") && col("cval") === col("cval_r") &&
          col("a_id") =!= col("b_id"))
      .select(col("a_id"), col("b_id"), col("a_fp"), col("b_fp")).distinct()
      .filter(bit_count(col("a_fp").bitwiseXOR(col("b_fp"))) <= maxHamming)
  }

  /** Guard measurement: half the corpus is a single boilerplate cluster
    * (shared 100-token base, one unique token each — near-identical
    * signatures land every member in the same band buckets), half is
    * normal. The guard (cap below the cluster size) must keep the run
    * bounded and leave non-cluster survivors untouched; the unguarded run
    * shows the quadratic candidate blowup the guard exists to stop.
    */
  private def hotClusterRun(n: Int): Unit = {
    val tau = 0.9
    val spark = benchSession()
    import spark.implicits._
    val rnd = new scala.util.Random(7171L)
    val vocab = (0 until 10000).map(i => f"w$i%05d")
    val normal = (0 until n / 2).map(i => (i.toLong, randomDoc(rnd, vocab).mkString(" ")))
    val base = (0 until 100).map(j => s"boiler_$j").mkString(" ")
    val cluster = (0 until n / 2).map(i => (1000000L + i, s"$base u$i"))
    val docs = (normal ++ cluster).toDF("doc_id", "text").repartition(32).cache()
    docs.count()
    val clusterSize = n / 2
    def time[A](name: String)(f: => A): A =
      timed(s"hotcluster n=$n cluster=$clusterSize $name")(f)
    val guarded = time(s"guarded (cap=${clusterSize / 2})") {
      graft.operators.DedupOps.minHashLshOn(docs, tau, clusterSize / 2)
        .collect().map(_.getLong(0)).toSet
    }
    val unguarded = time("unguarded (cap=0)") {
      graft.operators.DedupOps.minHashLshOn(docs, tau, 0)
        .collect().map(_.getLong(0)).toSet
    }
    println(s"[dedupscale] non-cluster survivors equal=" +
      s"${guarded.filter(_ < 1000000L) == unguarded.filter(_ < 1000000L)} " +
      s"guarded=${guarded.size} unguarded=${unguarded.size}")
    spark.stop()
  }

  /** `containment` mode: the asymmetric prefix-filtered containment join
    * vs the blocked all-pairs baseline — planted "quoted-inside" docs
    * (a base doc's full text plus extra suffix tokens, the
    * syndicated-article shape), equality of the directed survivor sets
    * required, and the shipped plan timed at n and 2n for the linearity
    * read. `noblocked` skips the O(n²) baseline.
    */
  private def containmentRun(n: Int, skipBlocked: Boolean): Unit = {
    import org.apache.spark.sql.functions._
    val tau = 0.6
    val spark = benchSession()
    import spark.implicits._

    def gen(count: Int): org.apache.spark.sql.DataFrame = {
      val rnd = new scala.util.Random(4242L)
      val vocab = (0 until 10000).map(i => f"w$i%05d")
      val base = Array.fill(count * 4 / 5)(randomDoc(rnd, vocab))
      // quoted-inside: base text + 15 fresh tokens appended — containment
      // (short → long) ≈ 38/38 windows shared = 1.0, jaccard only ~0.72
      val longs = Array.fill(count / 5) {
        val b = base(rnd.nextInt(base.length))
        b ++ randomDoc(rnd, vocab, 15)
      }
      (base ++ longs).zipWithIndex
        .map { case (toks, i) => (i.toLong, toks.mkString(" ")) }
        .toSeq.toDF("doc_id", "text").repartition(32)
    }

    val docs = gen(n).cache()
    docs.count()
    def time[A](name: String)(f: => A): A = timed(s"containment n=$n $name")(f)
    val shipped = time("prefix-filtered (shipped)") {
      graft.operators.DedupOps.containmentPairsOn(docs, tau)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    if (!skipBlocked) {
      val w = split(col("text"), " ")
      val sh = docs.filter(size(w) >= 3)
        .select(col("doc_id"),
          array_sort(array_distinct(
            transform(sequence(lit(1), size(w) - 2), i =>
              concat_ws("\u001E", element_at(w, i), // same RS joiner as the shipped op
                element_at(w, i + 1), element_at(w, i + 2))))).as("s"))
        .withColumn("n", size(col("s")))
      import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
      val i = toCol(graft.plans.SortedIntersectSize(
        toExpr(col("a_s")), toExpr(col("b_s"))))
      val blocked = time("blocked all-pairs (baseline)") {
        sh.select(col("doc_id").as("a_id"), col("s").as("a_s"), col("n").as("a_n"))
          .repartition(32)
          .join(sh.select(col("doc_id").as("b_id"), col("s").as("b_s"),
            col("n").as("b_n")),
            col("a_id") =!= col("b_id") && col("b_n") >= ceil(col("a_n") * tau))
          .withColumn("i", i)
          .filter(col("i").cast("double") / col("a_n") >= tau)
          .select(col("a_id"), col("b_id"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      }
      println(s"[dedupscale] survivors equal=${shipped == blocked} " +
        s"shipped=${shipped.size} blocked=${blocked.size}")
    }
    docs.unpersist()
    val docs2 = gen(2 * n).cache()
    docs2.count()
    timed(s"containment n=${2 * n} prefix-filtered (shipped)") {
      graft.operators.DedupOps.containmentPairsOn(docs2, tau).count()
    }
    spark.stop()
  }

  /** Adversarial boilerplate skew for the span dedup and the funnel's
    * hash-grain dedup (VERDICT r16 task 6): three corpora at the same
    * n — uniform (every sentence unique), plant-A (ONE boilerplate
    * sentence-triple in 50% of docs → one span hash carrying n/2
    * occurrences), and plant-B (the triple repeated 10× in 50% of docs
    * → three overlapping hot hashes carrying 10× plant-A's occurrence
    * mass). The claim under test: per-corpus time stays bounded by the
    * row mass (roughly linear), never cluster-quadratic — the
    * first-arrival is a map-side-combinable min-struct aggregate and
    * the join back builds on ONE row per hash. The funnel analog plants
    * 50% exact-duplicate documents against the md5 groupBy + join.
    */
  private def spanSkewRun(n: Int): Unit = {
    import org.apache.spark.sql.functions._
    val spark = benchSession()
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val vocab = (0 until 10000).map(i => s"w$i")
    val boiler = "we use cookies on this site.\naccept all cookies to continue.\nsee our privacy policy for details."
    def gen(plantEvery: Int, repeats: Int) =
      (0L until n.toLong).map { id =>
        val sents = (0 until 6).map(_ =>
          randomDoc(rnd, vocab, 8).mkString(" ") + ".")
        val planted =
          if (plantEvery > 0 && id % plantEvery == 0)
            sents ++ Seq.fill(repeats)(boiler)
          else sents
        (id, planted.mkString("\n"))
      }.toDF("doc_id", "text")
    Seq(("uniform", gen(0, 0)), ("hot-1x (50% of docs)", gen(2, 1)),
        ("hot-10x (50% x 10 repeats)", gen(2, 10))).foreach { case (tag, df) =>
      val docs = df.cache(); docs.count()
      val out = timed(s"spanDedup n=$n $tag") {
        graft.operators.DedupOps.spanDedupOn(docs)
          .agg(sum(col("n_removed_sents"))).head().getLong(0)
      }
      println(s"[dedupscale]   removed sentence mass: $out")
      docs.unpersist()
    }
    // the funnel's exact-dedup stage under 50% identical documents
    def fdocs(dup: Boolean) =
      (0L until n.toLong).map { id =>
        val t = if (dup && id % 2 == 0) "the boilerplate page text"
        else randomDoc(rnd, vocab, 40).mkString(" ")
        (id, t)
      }.toDF("doc_id", "text")
    Seq(("uniform", fdocs(false)), ("50% one identical text", fdocs(true)))
      .foreach { case (tag, df) =>
        val docs = df.cache(); docs.count()
        val kept = timed(s"funnel hash-dedup n=$n $tag") {
          val hashes = docs.select(col("doc_id"), md5(col("text")).as("__h"))
          hashes
            .join(hashes.groupBy(col("__h"))
              .agg(min(col("doc_id")).as("__kid")), Seq("__h"))
            .filter(col("doc_id") === col("__kid")).count()
        }
        println(s"[dedupscale]   first arrivals kept: $kept")
        docs.unpersist()
      }
    spark.stop()
  }
}
