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
}
