package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{EvalOps, LinkOps}
import graft.sources.Tables

/** Retrieval-evaluation, pair-mining, and link-centrality operators, each
  * cross-checked against an independent driver-side reference over the
  * collected fixture (same rounding rules, same integer-unit arithmetic).
  */
class EvalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.Sf

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private lazy val emb: Array[(Long, Int, Array[Double])] =
    Tables.embeddings(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2).toArray))
      .sortBy(_._1)

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Rounded-score ranking of `cands` against query vector `qv` with the
    * contract tie-break (score desc, vec_id asc).
    */
  private def rankedIds(qv: Array[Double],
      cands: Seq[(Long, Int, Array[Double])]): Seq[(Long, Int)] =
    cands.map { case (id, lab, v) => (id, lab, round6(cos(v, qv))) }
      .sortBy { case (id, _, s) => (-s, id) }
      .map { case (id, lab, _) => (id, lab) }

  test("hard negatives: never the query's label, ranked exactly as the reference") {
    val nQ = 5; val k = 5
    val got = EvalOps.hardNegatives(spark, sf, nQ, k).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    val byId = emb.map(e => e._1 -> e).toMap
    val cands = emb.filter(_._1 >= nQ).toSeq
    val want = (0L until nQ).flatMap { q =>
      val (_, qLab, qv) = byId(q)
      rankedIds(qv, cands.filter(_._2 != qLab)).take(k)
        .zipWithIndex.map { case ((id, _), i) => (q, id, i + 1) }
    }
    assert(got.toSeq === want)
    // and not one hit shares its query's label
    got.foreach { case (q, id, _) =>
      assert(byId(id)._2 !== byId(q)._2, s"query $q mined same-label $id")
    }
  }

  test("indexed hard negatives equal the exact path at exhaustive probes; valid below") {
    val kCells = 8
    val exact = EvalOps.hardNegatives(spark, sf, 5, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    val exhaustive = EvalOps.hardNegativesIndexed(spark, sf, 5, 5,
      nprobe = kCells, kCells = kCells).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    assert(exhaustive === exact,
      "probing every cell must reproduce the exact mining result")
    // pruned probes: a valid (possibly shallower) mining pool — every hit
    // is label-mismatched and ranked consistently
    val byId = emb.map(e => e._1 -> e._2).toMap
    val pruned = EvalOps.hardNegativesIndexed(spark, sf, 5, 5,
      nprobe = 2, kCells = kCells).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    assert(pruned.nonEmpty)
    pruned.groupBy(_._1).foreach { case (q, hits) =>
      assert(hits.map(_._3).sorted.toSeq === (1 to hits.length).toSeq)
      hits.foreach { case (_, id, _) => assert(byId(id) !== byId(q)) }
    }
  }

  test("rankEval equals an independent metric computation (recall/MRR/nDCG)") {
    val nQ = 8; val k = 10
    val got = EvalOps.rankEval(spark, sf, nQ, k).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    val byId = emb.map(e => e._1 -> e).toMap
    val cands = emb.filter(_._1 >= nQ).toSeq
    val w = EvalOps.dcgWeightsMicro(k)
    val idcg = EvalOps.idcgPrefixMicro(k)
    val want = (0L until nQ).map { q =>
      val (_, qLab, qv) = byId(q)
      val top = rankedIds(qv, cands).take(k)
      val nRel = cands.count(_._2 == qLab).toLong
      val rels = top.zipWithIndex.collect {
        case ((_, lab), i) if lab == qLab => i + 1 } // 1-based ranks
      val hits = rels.length.toLong
      val dcgMicro = rels.map(r => w(r - 1)).sum
      val recall = if (nRel > 0) round6(hits.toDouble / nRel) else 0.0
      val mrr = rels.headOption.map(r => round6(1.0 / r)).getOrElse(0.0)
      val ndcg = if (nRel > 0 && rels.nonEmpty)
        round6(dcgMicro.toDouble / idcg(math.min(nRel, k).toInt - 1)) else 0.0
      (q, nRel, hits, recall, mrr, ndcg)
    }
    assert(got.toSeq === want)
    got.foreach { case (_, _, _, rec, mrr, ndcg) =>
      assert(rec >= 0.0 && rec <= 1.0 && mrr >= 0.0 && mrr <= 1.0 &&
        ndcg >= 0.0 && ndcg <= 1.0, "metrics must be valid fractions")
    }
  }

  test("indexed eval equals the exact eval at exhaustive probes; valid fractions below") {
    val exact = EvalOps.rankEval(spark, sf, 8, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSeq
    val exhaustive = EvalOps.rankEvalIndexed(spark, sf, 8, 10,
      nprobe = 8, kCells = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSeq
    assert(exhaustive === exact,
      "probing every cell must reproduce the exact-scan eval bit-for-bit")
    val pruned = EvalOps.rankEvalIndexed(spark, sf, 8, 10,
      nprobe = 2, kCells = 8).collect()
      .map(r => (r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(pruned.length === 8)
    pruned.foreach { case (rec, mrr, ndcg) =>
      assert(rec >= 0.0 && rec <= 1.0 && mrr >= 0.0 && mrr <= 1.0 &&
        ndcg >= 0.0 && ndcg <= 1.0)
    }
  }

  test("rankEvalOn scores arbitrary runs/qrels, including empty-run and zero-relevant queries") {
    import spark.implicits._
    val k = 3
    // a beyond-k row (rank 4 on a relevant doc) must be cut by the @k
    // contract, not crash the weight lookup or inflate recall; a
    // duplicated qrels pair must not double-count
    val run = Seq((0L, 10L, 1), (0L, 11L, 2), (0L, 12L, 3), (0L, 99L, 4),
      (1L, 20L, 1), (1L, 21L, 2)).toDF("query_id", "vec_id", "rank")
    val qrels = Seq((0L, 11L), (0L, 11L), (0L, 99L), (2L, 5L))
      .toDF("query_id", "vec_id")
    val qids = Seq(0L, 1L, 2L).toDF("query_id")
    val got = EvalOps.rankEvalOn(run, qrels, qids, k).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSeq
    val w = EvalOps.dcgWeightsMicro(k); val idcg = EvalOps.idcgPrefixMicro(k)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect = Seq(
      // q0: hit at rank 2 of 2 relevant → recall .5, mrr .5, ndcg w2/(w1+w2)
      (0L, 2L, 1L, 0.5, 0.5, r6(w(1).toDouble / idcg(1))),
      // q1: ran but nothing relevant anywhere → all zeros
      (1L, 0L, 0L, 0.0, 0.0, 0.0),
      // q2: relevant exists but the run never returned rows → zeros
      (2L, 1L, 0L, 0.0, 0.0, 0.0))
    assert(got === expect)
  }

  test("rank store: warm-start refresh is an exact trajectory continuation") {
    import graft.sources.CatalogOps
    val db = "rankstore_t"
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath + s"/$db.db"))
    CatalogOps.createDatabase(spark, db)
    try {
      LinkOps.createRankStore(spark, db, "links", sf, iters = 2)
      val refreshed = LinkOps.refreshRanks(spark, db, "links", sf, extraIters = 3)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val cold = LinkOps.pageRank(spark, sf, iters = 5)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(refreshed === cold,
        "2 stored + 3 refreshed rounds must equal the 5-round cold run bit-for-bit")
      assert(spark.table(s"`$db`.`links__ranks`")
        .select(max(col("iters_done"))).head().getLong(0) === 5L)
      // a second refresh continues again — the store really is the vector
      val again = LinkOps.refreshRanks(spark, db, "links", sf, extraIters = 2)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val cold7 = LinkOps.pageRank(spark, sf, iters = 7)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(again === cold7)
    } finally spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
  }

  test("rank store: refresh over an EMPTY store warm-starts from zero, no NPE") {
    import graft.sources.CatalogOps
    val db = "rankstore_empty_t"
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    CatalogOps.createDatabase(spark, db)
    try {
      // an interrupted create leaves the table with zero rows: max(iters_done)
      // is null — refresh must treat that as iters_done=0 and seed every doc
      // at the uniform teleport floor, i.e. equal the cold run of extraIters
      spark.createDataFrame(Seq.empty[(Long, Long, Long)])
        .toDF("doc_id", "rank_nano", "iters_done")
        .write.mode("overwrite").saveAsTable(s"`$db`.`links__ranks`")
      val refreshed = LinkOps.refreshRanks(spark, db, "links", sf, extraIters = 2)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val cold = LinkOps.pageRank(spark, sf, iters = 2)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(refreshed === cold)
      assert(spark.table(s"`$db`.`links__ranks`")
        .select(max(col("iters_done"))).head().getLong(0) === 2L)
    } finally spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
  }

  test("pageRank equals a driver-side reference with identical integer arithmetic") {
    val iters = 3; val fanout = 4; val d = 0.85
    val got = LinkOps.pageRank(spark, sf, iters, fanout, d).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val n = Tables.documents(spark, sf).count()
    // reference: same edge hash, same nano-unit rounding, plain Scala
    val edges = for {
      src <- 0L until n
      k <- 1 to fanout
      dst = (src * LinkOps.EdgeMult + k * LinkOps.EdgeStride) % n
      if dst != src
    } yield (src, dst)
    val deg = edges.groupBy(_._1).map { case (s, es) => s -> es.length }
    var rank = Array.fill(n.toInt)(math.floor(1e9 / n + 0.5).toLong)
    val teleport = math.floor((1.0 - d) * 1e9 / n + 0.5)
    for (_ <- 1 to iters) {
      val in = Array.fill(n.toInt)(0L)
      edges.foreach { case (s, t) =>
        in(t.toInt) += math.floor(rank(s.toInt).toDouble / deg(s) + 0.5).toLong
      }
      rank = in.map(s => math.floor(teleport + d * s.toDouble + 0.5).toLong)
    }
    val want = rank.zipWithIndex.map { case (r, i) => (i.toLong, round6(r / 1e9)) }
    assert(got.toSeq === want.toSeq)
    // out-degrees: fanout minus at most dropped self-loops; rank mass ≈ 1
    assert(deg.values.forall(v => v == fanout || v == fanout - 1))
    val mass = got.map(_._2).sum
    assert(mass > 0.9 && mass < 1.1, s"rank mass drifted: $mass")
    assert(got.forall(_._2 > 0.0), "every node keeps at least the teleport mass")
  }
}
