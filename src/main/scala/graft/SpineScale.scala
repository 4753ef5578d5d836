package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: ADVERSARIAL HOST SKEW for the archive→training spine
  * (`runMain graft.SpineScale [n]` — r18, VERDICT task 5). The spine's
  * skew-immunity claims are structural: the member assembly is
  * (host, 1000-record chunk)-bounded so no member row scales with a
  * host's page count, parsing/extraction are map-side per member, and
  * the funnel's dedup is a combinable min-per-hash aggregate. This
  * harness tests them END TO END: one host carrying 50% of all records
  * (a mega-site dominating the crawl), then a 10× hotter variant (one
  * host carrying ~91%), per-stage timings vs the uniform plant.
  * Bounded deltas are the claim under test; the structural guarantee
  * (member cardinality = ceil-sum of per-(host, chunk) groups, max
  * member ≤ 1000 records) is asserted, not just timed. Results feed
  * PERF_NOTES; WarcSpec pins the member bound as a regression test.
  */
object SpineScale {
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
    println(f"[spinescale] $tag: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    out
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 30000
    if (args.length > 1 && args(1) == "hotdigest") { hotDigestRun(n); return }
    val spark = benchSession()
    import spark.implicits._
    import graft.operators.TextOps
    import graft.sources.WarcOps
    val rnd = new scala.util.Random(17)
    val vocab = (0 until 10000).map(i => s"w$i")
    def gen(hotEvery: Int) =
      (0L until n.toLong).map { id =>
        // the hot host carries a numeric suffix like every fixture host:
        // the funnel's mix gate derives its class from the digits
        val host =
          if (hotEvery > 0 && id % hotEvery != hotEvery - 1) "hot999"
          else s"src${id % 50}"
        val toks = collection.mutable.LinkedHashSet.empty[String]
        while (toks.size < 40) toks += vocab(rnd.nextInt(vocab.length))
        (id, "en", host, toks.mkString(" "))
      }.toDF("doc_id", "lang", "source", "text")
    // untimed warmup at n/4 absorbs JIT + codegen compilation so the
    // uniform-first measured ordering is not flattered by warm hot runs
    locally {
      val w = gen(0).limit(n / 4).cache(); w.count()
      val m = WarcOps.warcMembersFrom(WarcOps.plantedRecordsOf(
        TextOps.plantedPage(w), col("html"))).cache()
      WarcOps.shardPlanOfSurvivors(
        WarcOps.extractOf(m).localCheckpoint()).collect()
      m.unpersist(); w.unpersist()
      println(s"[spinescale] warmup done (n=${n / 4} uniform, untimed)")
    }
    Seq(("uniform (50 hosts)", 0), ("hot-1x (one host, 50%)", 2),
        ("hot-10x (one host, ~91%)", 11)).foreach { case (tag, hotEvery) =>
      val docs = gen(hotEvery).cache(); docs.count()
      val members = timed(s"n=$n $tag  members") {
        val m = WarcOps.warcMembersFrom(WarcOps.plantedRecordsOf(
          TextOps.plantedPage(docs), col("html"))).cache()
        m.count()
        m
      }
      // the structural bound, asserted under skew: a member never
      // carries more than its chunk (1000 records), however hot the host
      val maxRecs = members
        .select((size(split(col("warc"), "WARC/1\\.0\r\n")) - 1).as("r"))
        .agg(max(col("r"))).head().getInt(0)
      require(maxRecs <= 1000,
        s"member bound violated under skew: $maxRecs records in one member")
      println(s"[spinescale]   members: ${members.count()}, " +
        s"max records/member: $maxRecs")
      val extracted = timed(s"n=$n $tag  parse+extract") {
        val x = WarcOps.extractOf(members).localCheckpoint()
        x.count()
        x
      }
      timed(s"n=$n $tag  funnel+shard tail") {
        WarcOps.shardPlanOfSurvivors(extracted).collect().length
      }
      members.unpersist(); docs.unpersist()
    }
    spark.stop()
  }

  /** `hotdigest` mode (r18): the revisit path's one new join shape is
    * the digest-keyed fan-out (captures ⋈ extracted-text). Its
    * pathology is a MEGA-DUP page — identical bytes served from many
    * URLs — which concentrates 50% of all capture rows on ONE digest
    * key. The winner aggregate is combinable (safe by construction);
    * this measures the fan-out join under that key, uniform vs hot,
    * plus a 10× hotter (~91%) variant. AQE's skew-join split is the
    * mechanism under test (the build side is one row per digest; the
    * probe side partition is what must split).
    */
  private def hotDigestRun(n: Int): Unit = {
    val spark = benchSession()
    import spark.implicits._
    import graft.operators.TextOps
    import graft.sources.WarcOps
    val rnd = new scala.util.Random(17)
    val vocab = (0 until 10000).map(i => s"w$i")
    val boiler = (0 until 40).map(i => s"w$i").mkString(" ")
    def gen(hotEvery: Int) =
      (0L until n.toLong).map { id =>
        val text =
          if (hotEvery > 0 && id % hotEvery != hotEvery - 1) boiler
          else {
            val toks = collection.mutable.LinkedHashSet.empty[String]
            while (toks.size < 40) toks += vocab(rnd.nextInt(vocab.length))
            toks.mkString(" ")
          }
        (id, "en", s"src${id % 50}", text)
      }.toDF("doc_id", "lang", "source", "text")
    // untimed warmup
    locally {
      val w = gen(0).limit(n / 4).cache(); w.count()
      WarcOps.extractRevisitAware(WarcOps.warcParseOn(
          WarcOps.plantedSpineMembersRevisitOf(w))
        .filter(col("len_ok") === 1L && col("http_status") === "200"))
        .count()
      w.unpersist()
      println(s"[spinescale] hotdigest warmup done (n=${n / 4}, untimed)")
    }
    Seq(("uniform", 0), ("hot-1x (one digest, 50%)", 2),
        ("hot-10x (one digest, ~91%)", 11)).foreach { case (tag, hotEvery) =>
      val docs = gen(hotEvery).cache(); docs.count()
      val valid = WarcOps.warcParseOn(
          WarcOps.plantedSpineMembersRevisitOf(docs))
        .filter(col("len_ok") === 1L && col("http_status") === "200")
        .localCheckpoint()
      val out = timed(s"hotdigest n=$n $tag  digest-collapse+fanout") {
        WarcOps.extractRevisitAware(valid).count()
      }
      val digests = valid.select(md5(col("payload"))).distinct().count()
      println(s"[spinescale]   capture-grain rows out: $out, " +
        s"distinct digests extracted: $digests")
      docs.unpersist()
    }
    spark.stop()
  }
}
