package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{DedupOps, TextAnalysisOps}
import graft.sources.Tables

/** Export-side planning ops: hash shard assignment (deterministic,
  * content-addressed, balanced) and SoftDeDup cluster reweighting
  * (weights are exactly 1/|cluster| in ppm, and total weighted mass
  * equals the number of distinct clusters' worth of documents).
  */
class ExportSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.Sf

  test("shard assignment covers all docs, 16 shards, md5-consistent") {
    val docs = Tables.documents(spark, sf)
    val out = TextAnalysisOps.shardAssign(spark, sf).localCheckpoint()
    assert(out.agg(sum(col("n_docs"))).head().getLong(0) == docs.count())
    val shards = out.select(col("shard")).collect().map(_.getLong(0))
    assert(shards.forall(s => s >= 0 && s < 16))
    // content-addressed: doc 0's shard is the md5 nibble, re-derived here
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest("0".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = Integer.parseInt(h.substring(31), 16).toLong
    val zeroShard = Tables.documents(spark, sf).filter(col("doc_id") === 0L)
      .select((expr("instr('0123456789abcdef', " +
        "substring(md5(cast(doc_id as string)), 32, 1))") - 1L).cast("long"))
      .head().getLong(0)
    assert(zeroShard == expected)
    // the heaviest shard reads exactly 1e6 ppm; every share is positive
    assert(out.agg(max(col("share_ppm"))).head().getLong(0) == 1000000L)
    assert(out.filter(col("share_ppm") <= 0L).count() == 0L)
  }

  test("soft-dedup weights are 1/csize ppm and singletons weigh 1e6") {
    val soft = DedupOps.dedupSoft(spark, sf).localCheckpoint()
    assert(soft.count() == Tables.documents(spark, sf).count())
    assert(soft.filter(col("weight_ppm") =!=
      expr("1000000 div csize")).count() == 0L)
    assert(soft.filter(col("csize") === 1L && col("weight_ppm") =!= 1000000L)
      .count() == 0L)
    // weights agree with the CC closure's component sizes
    val cc = DedupOps.dedupConnected(spark, sf)
      .groupBy(col("component")).agg(count(lit(1)).as("n"))
    val bad = soft.join(cc, Seq("component"))
      .filter(col("csize") =!= col("n")).count()
    assert(bad == 0L)
  }

  test("stored soft-dedup weights equal the live closure's") {
    val live = DedupOps.dedupSoft(spark, sf).collect().toSeq
    val stored = DedupOps.dedupSoftStoredFixture(spark, sf).collect().toSeq
    assert(live.map(_.toSeq) == stored.map(_.toSeq))
  }

  test("DoReMi loop: excess both signs, monotone ordering, smoothing floor") {
    val out = TextAnalysisOps.domainDoremi(spark, sf).localCheckpoint()
    val rows = out.collect().map(r => (r.getString(0), r.getLong(2),
      r.getLong(3), r.getLong(4)))
    // excess quality runs above AND below the corpus mean
    assert(rows.exists(_._2 > 0L) && rows.exists(_._2 < 0L))
    // higher excess never yields a lower final weight (update is monotone)
    val sorted = rows.sortBy(_._2)
    assert(sorted.map(_._3).zip(sorted.map(_._3).tail).forall { case (a, b) => a <= b })
    // uniform smoothing keeps every domain above a tenth of uniform
    val u = 1000000L / rows.length
    assert(rows.forall(_._3 >= u / 10))
    // trajectory average sits within the weight range seen at the end
    assert(rows.forall { case (_, _, fw, aw) => aw > 0 && fw > 0 })
  }

  test("DoReMi matches a driver-side integer reference on the fixture") {
    import graft.sources.Tables
    // independent reference: same integer arithmetic, plain Scala
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    def qn(t: String): Long = {
      val toks = t.split(" ", -1)
      val q = toks.distinct.length.toDouble / toks.length * 0.5 +
        math.min(1.0, toks.length.toDouble / 100.0) * 0.5
      math.floor(q * 1e9 + 0.5).toLong
    }
    val byDom = docs.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (s, ds) => (s, ds.length.toLong, ds.map(d => qn(d._2)).sum) }
    val stot = byDom.map(_._3).sum; val ntot = byDom.map(_._2).sum
    val meanAll = stot / ntot
    val nd = byDom.length
    val uw = 1000000L / nd
    var w = byDom.map(_ => uw)
    var acc = byDom.map(_ => 0L)
    val ex = byDom.map { case (_, n, s) => s / n - meanAll }
    (1 to 5).foreach { _ =>
      val raw = w.zip(ex).map { case (wi, e) => wi * (1000000000L + e) / 1000000000L }
      val sraw = raw.sum
      w = raw.map(r => (r * 1000000L / sraw * 9 + uw) / 10)
      acc = acc.zip(w).map { case (a, wi) => a + wi }
    }
    val expected = byDom.zipWithIndex.map { case ((s, n, _), i) =>
      (s, n, ex(i), w(i), acc(i) / 5) }
    val got = TextAnalysisOps.domainDoremi(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected)
  }

  test("span corruption: sentinels round-trip, spans are maximal runs") {
    val out = TextAnalysisOps.spanCorrupt(spark, sf).localCheckpoint()
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = out.collect()
    assert(rows.length == docs.size)
    rows.take(200).foreach { r =>
      val (id, input, target, nSpans, nMasked) = (r.getLong(0),
        r.getString(1), r.getString(2), r.getLong(3), r.getLong(4))
      val toks = docs(id).split(" ", -1)
      // independent reference mask from the same content-addressed hash
      val m = toks.indices.map { p =>
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(s"$id:$p".getBytes("UTF-8")).map("%02x".format(_)).mkString
        "0123456789abcdef".indexOf(h.charAt(31)) < 3
      }
      assert(nMasked == m.count(identity))
      val runs = m.zipWithIndex.foldLeft(0) { case (acc, (v, i)) =>
        if (v && (i == 0 || !m(i - 1))) acc + 1 else acc }
      assert(nSpans == runs)
      // reconstruct: replacing sentinels in input by target spans gives text
      if (nSpans > 0) {
        val spanToks = target.split(" ").foldLeft(Vector.empty[Vector[String]]) {
          (acc, t) => if (t.startsWith("<extra_id_")) acc :+ Vector.empty
                      else acc.init :+ (acc.last :+ t) }
        val rebuilt = input.split(" ").flatMap { t =>
          if (t.startsWith("<extra_id_")) {
            val k = t.stripPrefix("<extra_id_").stripSuffix(">").toInt
            spanToks(k)
          } else Seq(t) }.mkString(" ")
        assert(rebuilt == docs(id), s"doc $id failed round-trip")
      } else assert(input == docs(id))
    }
  }

  test("FIM: 50% gate both ways, segments partition the token stream") {
    val out = TextAnalysisOps.fimTransform(spark, sf).localCheckpoint()
    val fims = out.agg(sum(col("fim")), count(lit(1))).head()
    assert(fims.getLong(0) > 0 && fims.getLong(0) < fims.getLong(1))
    // untransformed docs render verbatim
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.filter(col("fim") === 0L).collect().foreach { r =>
      assert(r.getAs[String]("rendered") == docs(r.getLong(0)))
    }
    // transformed docs: reordering SUF/MID back recovers the text
    out.filter(col("fim") === 1L).collect().take(100).foreach { r =>
      val s = r.getAs[String]("rendered")
      val pre = s.substring("<PRE> ".length, s.indexOf(" <SUF> "))
      val suf = s.substring(s.indexOf(" <SUF> ") + " <SUF> ".length,
        s.indexOf(" <MID> "))
      val mid = s.substring(s.indexOf(" <MID> ") + " <MID> ".length)
      val rebuilt = Seq(pre, mid, suf).filter(_.nonEmpty).mkString(" ")
      assert(rebuilt == docs(r.getLong(0)), s"doc ${r.getLong(0)}")
      // cut invariants
      assert(r.getLong(3) <= r.getLong(4) && r.getLong(4) <= r.getLong(2))
    }
  }

  test("curation funnel: monotone, raw row matches corpus, ppm arithmetic") {
    val f = TextAnalysisOps.curationFunnel(spark, sf).localCheckpoint()
    val rows = f.collect().map(r => (r.getLong(0), r.getString(1),
      r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._2).toSeq == Seq("raw", "lang_id", "gopher_rules",
      "gopher_repetition", "dedup_exact", "decontaminate", "domain_mix"))
    assert(rows.head._3 == Tables.documents(spark, sf).count())
    // docs and tokens both non-increasing down the funnel
    assert(rows.map(_._3).sliding(2).forall(p => p(0) >= p(1)))
    assert(rows.map(_._4).sliding(2).forall(p => p(0) >= p(1)))
    // keep ppm re-derives from adjacent counts
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._5 == (if (a._3 == 0) 0L else b._3 * 1000000L / a._3))
    }
    assert(rows.head._5 == 1000000L)
    // most stages remove something at sf0.001 (a cumulative stage may
    // find nothing left to remove on the small slice — that's honest)
    assert(rows.map(_._3).distinct.length >= 5)
    assert(rows.last._3 < rows.head._3 / 5)
    // the lang stage keeps exactly the derived-en docs
    val en = graft.operators.LangIdOps.documentsWithDerivedLang(spark, sf)
      .filter(col("predicted") === "en").count()
    assert(rows(1)._3 == en)
  }

  test("anneal mix: ~10% anneal phase above an exact fence + replay slice") {
    val out = TextAnalysisOps.annealMix(spark, sf).localCheckpoint()
    val n = out.count()
    val anneal = out.filter(col("phase") === "anneal")
    // strict-above routing puts AT MOST 10% in the anneal phase
    assert(anneal.count() <= (n + 9) / 10)
    assert(anneal.count() > 0)
    // every anneal doc outranks every main doc on quality
    val maxMain = out.filter(col("phase") === "main")
      .agg(max(col("quality"))).head().getDouble(0)
    val minAnneal = anneal.agg(min(col("quality"))).head().getDouble(0)
    assert(minAnneal > maxMain)
    // the anneal epoch = phase ∪ the 10% hash replay slice, exactly
    val bad = out.filter(col("anneal_epoch") =!=
      (col("phase") === "anneal" ||
        pmod(col("doc_id") * lit(1540483477L), lit(1000L)) < 100)
        .cast("long")).count()
    assert(bad == 0L)
    // the replay slice contributes main-phase docs (coverage holds)
    assert(out.filter(col("phase") === "main" &&
      col("anneal_epoch") === 1L).count() > 0L)
  }

  test("epoch plan: micro-epoch arithmetic and scale-relative budget") {
    val plan = TextAnalysisOps.epochPlan(spark, sf).localCheckpoint()
    val rows = plan.collect().map(r => (r.getString(0), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5)))
    val budget = 4L * rows.map(_._2).sum
    rows.foreach { case (_, nt, w, em, fl) =>
      assert(em == w * budget / nt)
      assert(fl == (if (em <= 4000000L) 1L else 0L))
    }
    // epochs average ~4e6 by construction; the learned mixture spreads
    // them around the cliff whenever weight share != token share
    assert(rows.map(_._4).max > rows.map(_._4).min)
  }

  test("streaming funnel ≡ batch funnel below saturation (ordered halves)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.sources.{CatalogOps, Tables}
    import graft.streaming.StreamingOps
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val db = "sfunneldb"
    CatalogOps.dropDatabase(spark, db)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath + s"/$db.db"))
    CatalogOps.createDatabase(spark, db)
    CatalogOps.createBloomStore(spark, db, "docs",
      Seq.empty[String].toDF("__h"), "__h", expectedKeys = 16384L)
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("source"), col("text"))
    val rows = docs.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
      .sortBy(_._1)
    val (b0, b1) = rows.splitAt(rows.length / 2)
    val in = MemoryStream[(Long, String, String, String)]
    val q = StreamingOps.streamingCurationFunnel(
      in.toDF.toDF("doc_id", "lang", "source", "text"),
      docs.filter(col("source") === "src19"), db, "docs")
    try {
      in.addData(b0: _*); q.processAllAvailable()
      in.addData(b1: _*); q.processAllAvailable()
    } finally q.stop()
    def report() = {
      val summed = spark.table(s"`$db`.`docs__funnel`").agg(
        sum(col("n0")).as("n0"), sum(col("t0")).as("t0"),
        sum(col("n1")).as("n1"), sum(col("t1")).as("t1"),
        sum(col("n2")).as("n2"), sum(col("t2")).as("t2"),
        sum(col("n3")).as("n3"), sum(col("t3")).as("t3"),
        sum(col("n4")).as("n4"), sum(col("t4")).as("t4"),
        sum(col("n5")).as("n5"), sum(col("t5")).as("t5"),
        sum(col("n6")).as("n6"), sum(col("t6")).as("t6"))
      TextAnalysisOps.funnelReport(summed).collect().map(_.toSeq).toSeq
    }
    val streamed = report()
    val batch = TextAnalysisOps.curationFunnel(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch)
    // redelivery storm: a fresh query replaying batch 0 is a no-op (the
    // batch_id watermark guards the sum-log against double counting)
    val in2 = MemoryStream[(Long, String, String, String)]
    val q2 = StreamingOps.streamingCurationFunnel(
      in2.toDF.toDF("doc_id", "lang", "source", "text"),
      docs.filter(col("source") === "src19"), db, "docs")
    try {
      in2.addData(b0: _*); q2.processAllAvailable()
    } finally q2.stop()
    assert(report() == batch)
    CatalogOps.dropDatabase(spark, db)
  }

  test("gopher repetition survives degenerate one-token and empty docs") {
    import spark.implicits._
    // r16 ADVICE: the staged __bg bigram array used to evaluate
    // sequence(1, 0) → descending [1, 0] → element_at(_, 0) throws for
    // any doc with < 2 tokens; gopherRepetitionOn is documented for ANY
    // (doc_id, text) frame (it feeds the funnel), so this must not crash
    val docs = Seq(
      (0L, "single"),
      (1L, ""),
      (2L, "two words two words two words two words two words")
    ).toDF("doc_id", "text")
    val out = TextAnalysisOps.gopherRepetitionOn(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    // degenerate docs have no bigram, so top-2-gram mass is 0
    assert(out(0L) == 0L)
    assert(out(1L) == 0L)
    // the repeated-phrase doc still measures a dominant bigram run
    assert(out(2L) > 0L)
  }

  test("funnel crash window: totals committed, store lagging — replay-stable") {
    import graft.sources.{CatalogOps, Tables}
    import spark.implicits._
    val db = "sfunnelcrash"
    CatalogOps.dropDatabase(spark, db)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath + s"/$db.db"))
    CatalogOps.createDatabase(spark, db)
    CatalogOps.createBloomStore(spark, db, "docs",
      Seq.empty[String].toDF("__h"), "__h", expectedKeys = 16384L)
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("source"), col("text"))
    val evalNg = TextAnalysisOps.ngramSet(
      docs.filter(col("source") === "src19")).localCheckpoint()
    val n = docs.count()
    val (b0, b1) = (docs.filter(col("doc_id") < n / 2),
      docs.filter(col("doc_id") >= n / 2))
    // batch 0: totals row lands... and then we CRASH before the store
    // advance (the r16 ADVICE window)
    TextAnalysisOps.funnelIncrementalBatch(b0, evalNg, db, "docs")
      .withColumn("batch_id", lit(0L))
      .write.mode("append").saveAsTable(s"`$db`.`docs__funnel`")
    // recovery redelivers batch 0: the batch_id watermark skips the
    // recompute; the store catch-up re-upserts the same hashes
    assert(!spark.table(s"`$db`.`docs__funnel`")
      .filter(col("batch_id") === 0L).isEmpty)
    TextAnalysisOps.funnelAdvanceBloom(b0, db, "docs")
    // a second redelivery after a crash between append and advance —
    // the advance is idempotent, so running it again changes nothing
    TextAnalysisOps.funnelAdvanceBloom(b0, db, "docs")
    // batch 1 proceeds normally
    TextAnalysisOps.funnelIncrementalBatch(b1, evalNg, db, "docs")
      .withColumn("batch_id", lit(1L))
      .write.mode("append").saveAsTable(s"`$db`.`docs__funnel`")
    TextAnalysisOps.funnelAdvanceBloom(b1, db, "docs")
    val summed = spark.table(s"`$db`.`docs__funnel`").agg(
      sum(col("n0")).as("n0"), sum(col("t0")).as("t0"),
      sum(col("n1")).as("n1"), sum(col("t1")).as("t1"),
      sum(col("n2")).as("n2"), sum(col("t2")).as("t2"),
      sum(col("n3")).as("n3"), sum(col("t3")).as("t3"),
      sum(col("n4")).as("n4"), sum(col("t4")).as("t4"),
      sum(col("n5")).as("n5"), sum(col("t5")).as("t5"),
      sum(col("n6")).as("n6"), sum(col("t6")).as("t6"))
    val streamed = TextAnalysisOps.funnelReport(summed)
      .collect().map(_.toSeq).toSeq
    val batch = TextAnalysisOps.curationFunnel(spark, sf)
      .collect().map(_.toSeq).toSeq
    // crash + replay-through-the-window produced the exact batch report
    assert(streamed == batch)
    CatalogOps.dropDatabase(spark, db)
  }

  test("verified export: written-table manifest equals the input's closed form, 16 shard dirs") {
    import graft.sources.CatalogOps
    val docs = Tables.documents(spark, sf)
    val got = CatalogOps.exportShardedVerified(spark, "exptest", "docs", docs)
      .collect().map(_.toSeq).toSeq
    // the same arithmetic over the INPUT (no write round-trip): equality
    // pins that the write lost, duplicated, and corrupted nothing
    val want = docs.select(col("doc_id"), col("text"))
      .withColumn("shard",
        (expr("instr('0123456789abcdef', " +
          "substring(md5(cast(doc_id as string)), 32, 1))") - 1L).cast("long"))
      .select(col("shard"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok"),
        length(col("text")).cast("long").as("n_bytes"),
        expr("cast(conv(substring(md5(concat(cast(doc_id as string), " +
          "':', md5(text))), 1, 12), 16, 10) as bigint)").as("ck"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
        sum(col("n_bytes")).as("n_bytes"), min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"), expr("bit_xor(ck)").as("checksum"))
      .orderBy(col("shard").asc)
      .collect().map(_.toSeq).toSeq
    assert(got == want)
    assert(got.size == 16)
    // the layout is real: one catalog partition per shard
    assert(spark.sql("SHOW PARTITIONS `exptest`.`docs`").count() == 16L)
    // re-export is deterministic (overwrite-by-construction)
    val again = CatalogOps.exportShardedVerified(spark, "exptest", "docs", docs)
      .collect().map(_.toSeq).toSeq
    assert(again == got)
    CatalogOps.dropDatabase(spark, "exptest")
  }

  test("streaming verified export ≡ batch manifest; replay storm is a no-op") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.sources.CatalogOps
    import graft.streaming.StreamingOps
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val db = "sexpstream"
    CatalogOps.dropDatabase(spark, db)
    CatalogOps.createDatabase(spark, db)
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val rows = docs.collect().map(r => (r.getLong(0), r.getString(1)))
      .sortBy(_._1)
    val (b0, b1) = rows.splitAt(rows.length / 2)
    val in = MemoryStream[(Long, String)]
    val q = StreamingOps.streamingVerifiedExport(
      in.toDF.toDF("doc_id", "text"), db, "docs")
    try {
      in.addData(b0: _*); q.processAllAvailable()
      in.addData(b1: _*); q.processAllAvailable()
    } finally q.stop()
    val served = CatalogOps.exportVerifiedStreamServe(spark, db, "docs")
      .collect().map(_.toSeq).toSeq
    val batch = CatalogOps.exportShardedVerified(spark, "sexpbatch", "docs",
      docs).collect().map(_.toSeq).toSeq
    assert(served == batch)
    // redelivery storm: a fresh query replaying batch 0 must change
    // neither the written table nor the log (the batch_id replay guard
    // + the idempotent (shard, batch_id) partition overwrite)
    val in2 = MemoryStream[(Long, String)]
    val q2 = StreamingOps.streamingVerifiedExport(
      in2.toDF.toDF("doc_id", "text"), db, "docs")
    try {
      in2.addData(b0: _*); q2.processAllAvailable()
    } finally q2.stop()
    assert(CatalogOps.exportVerifiedStreamServe(spark, db, "docs")
      .collect().map(_.toSeq).toSeq == batch)
    CatalogOps.dropDatabase(spark, db)
    CatalogOps.dropDatabase(spark, "sexpbatch")
  }

  test("export crash window: docs written, log missing — replay reconciles") {
    import graft.sources.CatalogOps
    val db = "sexpcrash"
    CatalogOps.dropDatabase(spark, db)
    CatalogOps.createDatabase(spark, db)
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val n = docs.count()
    val (b0, b1) = (docs.filter(col("doc_id") < n / 2),
      docs.filter(col("doc_id") >= n / 2))
    // batch 0 lands normally: docs, then its partials row set
    CatalogOps.exportIncrementalBatch(spark, db, "docs", b0, 0L)
      .withColumn("batch_id", lit(0L))
      .write.mode("append").saveAsTable(s"`$db`.`docs__manifestlog`")
    // batch 1 writes its docs... and we CRASH before the log append
    CatalogOps.exportIncrementalBatch(spark, db, "docs", b1, 1L)
    // recovery redelivers batch 1: not in the log, so the whole batch
    // re-runs — the (shard, batch_id) dynamic overwrite rewrites the
    // same partitions instead of appending duplicates
    CatalogOps.exportIncrementalBatch(spark, db, "docs", b1, 1L)
      .withColumn("batch_id", lit(1L))
      .write.mode("append").saveAsTable(s"`$db`.`docs__manifestlog`")
    // a spurious re-run of batch 0's WRITE half (replay past the guard
    // window) is also byte-stable by idempotence
    CatalogOps.exportIncrementalBatch(spark, db, "docs", b0, 0L)
    val served = CatalogOps.exportVerifiedStreamServe(spark, db, "docs")
      .collect().map(_.toSeq).toSeq
    val batch = CatalogOps.exportShardedVerified(spark, "sexpbatch2", "docs",
      docs).collect().map(_.toSeq).toSeq
    assert(served == batch)
    // and the reconciliation has TEETH: corrupt the log and serve fails
    spark.sql(s"INSERT INTO `$db`.`docs__manifestlog` VALUES " +
      "(3, 1, 1, 1, 0, 0, 7, 99)")
    intercept[IllegalArgumentException] {
      CatalogOps.exportVerifiedStreamServe(spark, db, "docs")
    }
    CatalogOps.dropDatabase(spark, db)
    CatalogOps.dropDatabase(spark, "sexpbatch2")
  }

  test("export compaction folds committed batches, serve and replay unchanged") {
    import graft.sources.CatalogOps
    val db = "sexpcompact"
    CatalogOps.dropDatabase(spark, db)
    CatalogOps.createDatabase(spark, db)
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val n = docs.count()
    Seq(0L, 1L).foreach { bid =>
      val half = if (bid == 0L) docs.filter(col("doc_id") < n / 2)
        else docs.filter(col("doc_id") >= n / 2)
      CatalogOps.exportIncrementalBatch(spark, db, "docs", half, bid)
        .withColumn("batch_id", lit(bid))
        .write.mode("append").saveAsTable(s"`$db`.`docs__manifestlog`")
    }
    val before = CatalogOps.exportVerifiedStreamServe(spark, db, "docs")
      .collect().map(_.toSeq).toSeq
    val partsBefore = spark.sql(s"SHOW PARTITIONS `$db`.`docs`").count()
    CatalogOps.compactExportShards(spark, db, "docs")
    // every committed batch folded into the watermark partition set:
    // 16 shards x 2 batches -> 16 shards x 1 batch
    val partsAfter = spark.sql(s"SHOW PARTITIONS `$db`.`docs`").count()
    assert(partsBefore == 32L && partsAfter == 16L,
      s"partitions $partsBefore -> $partsAfter")
    // serve reads identical bytes: manifest, id ranges, checksums all
    // reconcile against the UNchanged log
    val after = CatalogOps.exportVerifiedStreamServe(spark, db, "docs")
      .collect().map(_.toSeq).toSeq
    assert(after == before)
    // replay storm post-compaction: batch 0 is in the log, so the
    // guard skips it — the folded layout is never re-fragmented
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingOps
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val rows = docs.filter(col("doc_id") < n / 2).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val in = MemoryStream[(Long, String)]
    val q = StreamingOps.streamingVerifiedExport(
      in.toDF.toDF("doc_id", "text"), db, "docs")
    try { in.addData(rows: _*); q.processAllAvailable() } finally q.stop()
    assert(spark.sql(s"SHOW PARTITIONS `$db`.`docs`").count() == 16L)
    assert(CatalogOps.exportVerifiedStreamServe(spark, db, "docs")
      .collect().map(_.toSeq).toSeq == before)
    CatalogOps.dropDatabase(spark, db)
  }

  test("export compaction crash windows: marker-proven staging recovers, partial staging discards") {
    import graft.sources.CatalogOps
    val db = "sexpcrash3"
    CatalogOps.dropDatabase(spark, db)
    CatalogOps.createDatabase(spark, db)
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val n = docs.count()
    def ingest(bid: Long, part: org.apache.spark.sql.DataFrame): Unit =
      CatalogOps.exportIncrementalBatch(spark, db, "docs", part, bid,
          repartitionTasks = 16)
        .withColumn("batch_id", lit(bid))
        .write.mode("append").saveAsTable(s"`$db`.`docs__manifestlog`")
    ingest(0L, docs.filter(col("doc_id") < n / 3))
    ingest(1L, docs.filter(col("doc_id") >= n / 3 && col("doc_id") < 2 * n / 3))
    // simulate a compaction that finished its fold (staging + marker)
    // and then CRASHED during the target rewrite — worst case: while a
    // NEW batch also landed after the fold
    val logged = spark.table(s"`$db`.`docs__manifestlog`")
      .select(col("batch_id")).distinct()
    spark.table(s"`$db`.`docs`").join(logged, Seq("batch_id"))
      .withColumn("batch_id", lit(1L))
      .select(col("doc_id"), col("text"), col("shard"), col("batch_id"))
      .write.mode("overwrite").saveAsTable(s"`$db`.`__docs_compact_staging`")
    logged.select(col("batch_id").as("folded_batch_id"))
      .write.mode("overwrite").saveAsTable(s"`$db`.`__docs_compact_ready`")
    ingest(2L, docs.filter(col("doc_id") >= 2 * n / 3))
    // while the marker survives the serve refuses actionably instead of
    // failing reconciliation on a transient folded+original mix
    intercept[IllegalArgumentException] {
      CatalogOps.exportVerifiedStreamServe(spark, db, "docs")
    }
    val want = CatalogOps.exportShardedVerified(spark, "sexpwant", "docs",
      docs).collect().map(_.toSeq).toSeq
    // recovery: the next compaction finishes the PARTITION-SCOPED
    // rewrite from the proven staging (dynamic overwrite of the
    // watermark partitions + drops of the folded originals) — the
    // post-fold batch's partitions are never named, so it survives —
    // then refolds everything
    CatalogOps.compactExportShards(spark, db, "docs")
    assert(CatalogOps.exportVerifiedStreamServe(spark, db, "docs")
      .collect().map(_.toSeq).toSeq == want)
    assert(!spark.catalog.tableExists(s"$db.__docs_compact_ready"))
    assert(!spark.catalog.tableExists(s"$db.__docs_compact_staging"))
    // a fold that died BEFORE its marker leaves partial staging: it is
    // discarded untouched-target and the refold proceeds normally
    spark.table(s"`$db`.`docs`").limit(5)
      .write.mode("overwrite").saveAsTable(s"`$db`.`__docs_compact_staging`")
    CatalogOps.compactExportShards(spark, db, "docs")
    assert(CatalogOps.exportVerifiedStreamServe(spark, db, "docs")
      .collect().map(_.toSeq).toSeq == want)
    // worst case: marker-proven staging with the target DESTROYED —
    // recovery rebuilds it from the write-ahead copy alone
    spark.table(s"`$db`.`docs`")
      .select(col("doc_id"), col("text"), col("shard"), col("batch_id"))
      .localCheckpoint()
      .write.mode("overwrite").saveAsTable(s"`$db`.`__docs_compact_staging`")
    spark.table(s"`$db`.`docs__manifestlog`")
      .select(col("batch_id").as("folded_batch_id")).distinct()
      .write.mode("overwrite").saveAsTable(s"`$db`.`__docs_compact_ready`")
    graft.operators.KnnOps.dropTableAndDir(spark, db, "docs")
    CatalogOps.compactExportShards(spark, db, "docs")
    assert(CatalogOps.exportVerifiedStreamServe(spark, db, "docs")
      .collect().map(_.toSeq).toSeq == want)
    CatalogOps.dropDatabase(spark, db)
    CatalogOps.dropDatabase(spark, "sexpwant")
  }

  test("manifest-log fold: serve identical, folded ids stay guarded, crash windows recover") {
    import graft.sources.CatalogOps
    val db = "slogfold"
    CatalogOps.dropDatabase(spark, db)
    CatalogOps.createDatabase(spark, db)
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val n = docs.count()
    def ingest(bid: Long, part: org.apache.spark.sql.DataFrame): Unit =
      CatalogOps.appendBatchLog(spark, db, "docs__manifestlog",
        CatalogOps.exportIncrementalBatch(spark, db, "docs", part, bid,
          repartitionTasks = 16),
        bid)
    ingest(0L, docs.filter(col("doc_id") < n / 3))
    ingest(1L, docs.filter(col("doc_id") >= n / 3 && col("doc_id") < 2 * n / 3))
    ingest(2L, docs.filter(col("doc_id") >= 2 * n / 3))
    val before = CatalogOps.exportVerifiedStreamServe(spark, db, "docs")
      .collect().map(_.toSeq).toSeq
    val rowsBefore = spark.table(s"`$db`.`docs__manifestlog`").count()
    CatalogOps.compactBatchLog(spark, db, "docs__manifestlog")
    // three per-batch partial sets fold to ONE row per shard under the
    // watermark partition; every serve-side fold is associative, so the
    // served manifest cannot move
    val log = spark.table(s"`$db`.`docs__manifestlog`")
    assert(log.select(col("batch_id")).distinct()
      .collect().map(_.getLong(0)).toSeq == Seq(2L))
    assert(log.count() == 16L && rowsBefore > 16L)
    assert(CatalogOps.exportVerifiedStreamServe(spark, db, "docs")
      .collect().map(_.toSeq).toSeq == before)
    // the folded-away ids STAY committed: the guard reads the __wm
    // watermark, so a replay storm of batch 0 re-fragments nothing
    assert(Seq(0L, 1L, 2L).forall(
      CatalogOps.batchCommitted(spark, db, "docs__manifestlog", _)))
    assert(!CatalogOps.batchCommitted(spark, db, "docs__manifestlog", 3L))
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingOps
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val b0 = docs.filter(col("doc_id") < n / 3).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val in = MemoryStream[(Long, String)]
    val q = StreamingOps.streamingVerifiedExport(
      in.toDF.toDF("doc_id", "text"), db, "docs")
    try { in.addData(b0.toSeq: _*); q.processAllAvailable() } finally q.stop()
    spark.catalog.refreshTable(s"$db.docs__manifestlog")
    assert(spark.table(s"`$db`.`docs__manifestlog`").count() == 16L)
    assert(CatalogOps.exportVerifiedStreamServe(spark, db, "docs")
      .collect().map(_.toSeq).toSeq == before)
    // the docs-table compaction composes AFTER a log fold: batch ids
    // under the watermark are committed even without their log rows
    CatalogOps.compactExportShards(spark, db, "docs")
    assert(spark.sql(s"SHOW PARTITIONS `$db`.`docs`").count() == 16L)
    assert(CatalogOps.exportVerifiedStreamServe(spark, db, "docs")
      .collect().map(_.toSeq).toSeq == before)
    // crash window A: a fold that died before its marker leaves partial
    // staging — discarded, log untouched, refold proceeds
    spark.table(s"`$db`.`docs__manifestlog`").limit(5).localCheckpoint()
      .write.mode("overwrite")
      .saveAsTable(s"`$db`.`__docs__manifestlog_compact_staging`")
    CatalogOps.compactBatchLog(spark, db, "docs__manifestlog")
    assert(CatalogOps.exportVerifiedStreamServe(spark, db, "docs")
      .collect().map(_.toSeq).toSeq == before)
    // crash window B: marker-proven staging mid-finish — the serve
    // refuses actionably (the log transiently double-counts); the next
    // compaction call finishes the scoped rewrite and serves identically
    val logT = spark.table(s"`$db`.`docs__manifestlog`")
    logT.localCheckpoint().write.mode("overwrite")
      .saveAsTable(s"`$db`.`__docs__manifestlog_compact_staging`")
    spark.createDataFrame(Seq(Tuple1(2L))).toDF("folded_batch_id")
      .write.mode("overwrite")
      .saveAsTable(s"`$db`.`__docs__manifestlog_compact_ready`")
    intercept[IllegalArgumentException] {
      CatalogOps.exportVerifiedStreamServe(spark, db, "docs")
    }
    CatalogOps.compactBatchLog(spark, db, "docs__manifestlog")
    assert(!spark.catalog.tableExists(s"$db.__docs__manifestlog_compact_ready"))
    assert(CatalogOps.exportVerifiedStreamServe(spark, db, "docs")
      .collect().map(_.toSeq).toSeq == before)
    CatalogOps.dropDatabase(spark, db)
  }

  test("repartitioned export: same manifest, one file per shard directory") {
    import graft.sources.CatalogOps
    val docs = Tables.documents(spark, sf)
    val plain = CatalogOps.exportShardedVerified(spark, "sexppart", "docs",
      docs).collect().map(_.toSeq).toSeq
    val reparted = CatalogOps.exportShardedVerified(spark, "sexppart", "docs",
      docs, repartitionTasks = 16).collect().map(_.toSeq).toSeq
    // the documented 100 TB advice is executable and answer-preserving
    assert(reparted == plain)
    // each task now writes into exactly one shard directory: every
    // shard=* dir holds ONE parquet file (vs up to tasks× without)
    val loc = spark.sql("DESCRIBE TABLE EXTENDED `sexppart`.`docs`")
      .filter(col("col_name") === "Location").head().getString(1)
    val root = new java.io.File(new java.net.URI(loc))
    val shardDirs = root.listFiles().filter(f =>
      f.isDirectory && f.getName.startsWith("shard="))
    assert(shardDirs.length == 16)
    shardDirs.foreach { d =>
      val parts = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(parts.length == 1,
        s"${d.getName}: expected 1 parquet file, found ${parts.length}")
    }
    CatalogOps.dropDatabase(spark, "sexppart")
  }

  test("SFT formatting: template round-trips, mask covers prompt + roles") {
    val out = TextAnalysisOps.sftFormat(spark, sf).localCheckpoint()
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.collect().take(200).foreach { r =>
      val (id, rendered, nTotal, nMasked, ppm) = (r.getLong(0),
        r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))
      val toks = docs(id).split(" ", -1)
      assert(nTotal == toks.length + 2)
      assert(nMasked == toks.length / 2 + 2)
      assert(ppm == nMasked * 1000000L / nTotal)
      // stripping role markers recovers the original text
      val body = rendered.replace("<|user|> ", "")
        .replace(" <|assistant|> ", " ")
      assert(body == docs(id), s"doc $id")
      // the rendered token stream is exactly n_total long
      assert(rendered.split(" ", -1).length == nTotal)
    }
  }
}
