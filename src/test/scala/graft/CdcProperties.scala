package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** ScalaCheck law for the CDC change feed
  * ([[graft.sources.CatalogOps.changesVersioned]]): for ARBITRARY
  * upsert/delete histories and ANY (from, to) window, the feed must
  * equal the brute diff of the two resolved snapshots — inserts where a
  * key appears, updates where its payload was rewritten (by write, even
  * to the same value), deletes where it vanishes, nothing for keys that
  * net to absent-absent. Each case replays the history through the real
  * store (Spark jobs per op), so the suite runs fewer, larger cases.
  */
object CdcProperties extends Properties("graft.sources.ChangesVersioned") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = TestSpark.spark

  // an op is Left(upserts: id -> payload) or Right(deleted ids)
  private val genOp: Gen[Either[Map[Long, String], Seq[Long]]] = Gen.oneOf(
    Gen.mapOf(Gen.zip(Gen.choose(0L, 19L), Gen.identifier.map(_.take(6))))
      .filter(_.nonEmpty).map(Left(_)),
    Gen.nonEmptyListOf(Gen.choose(0L, 19L)).map(ids => Right(ids.distinct)))

  private val genHistory = for {
    init <- Gen.mapOf(Gen.zip(Gen.choose(0L, 19L), Gen.identifier.map(_.take(6))))
      .filter(_.nonEmpty)
    ops <- Gen.listOfN(3, genOp)
  } yield (init, ops)

  property("feedEqualsBruteSnapshotDiffOnAnyWindow") =
    forAll(genHistory, Gen.choose(0, 3), Gen.choose(0, 3)) {
      case ((init, ops), a, b) =>
        import graft.sources.CatalogOps
        import spark.implicits._
        val (fromV, toV) = (math.min(a, b).toLong, math.max(a, b).toLong)
        val db = "cdcprop"
        val name = s"t${System.identityHashCode((init, ops))}"
        spark.sql(s"CREATE DATABASE IF NOT EXISTS `$db`")
        try {
          CatalogOps.createVersionedCollection(spark, db, name,
            init.toSeq.toDF("doc_id", "payload"))
          // driver-side model: the resolved map after each version
          var model = Vector(init)
          ops.foreach {
            case Left(up) =>
              CatalogOps.upsertVersioned(spark, db, name, up.toSeq.toDF("doc_id", "payload"))
              model = model :+ (model.last ++ up)
            case Right(del) =>
              CatalogOps.deleteVersioned(spark, db, name, del)
              model = model :+ (model.last -- del)
          }
          val pre = model(fromV.toInt)
          val post = model(toV.toInt)
          // brute diff — but CDF semantics report WRITES: an id re-upserted
          // to the same payload is still an update, so "update" candidates
          // are keys present in both whose LAST WRITE is inside the window
          val lastWrite = (0 to toV.toInt).flatMap { v =>
            val touched: Set[Long] = ops.lift(v - 1) match {
              case Some(Left(up)) => up.keySet
              case Some(Right(del)) => del.toSet
              case None => if (v == 0) init.keySet else Set.empty
            }
            touched.map(_ -> v.toLong)
          }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
          val expected = ((pre.keySet ++ post.keySet).flatMap { id =>
            (pre.get(id), post.get(id)) match {
              case (None, Some(p)) => Some(("insert", id, p))
              case (Some(q), Some(p)) if lastWrite(id) > fromV =>
                Some(("update", id, p))
              case (Some(_), Some(_)) => None // untouched in the window
              case (Some(q), None) => Some(("delete", id, q))
              case (None, None) => None
            }
          }).toSet
          val got = CatalogOps.changesVersioned(spark, db, name, fromV, toV)
            .collect().map(r => (r.getString(0), r.getLong(2), r.getString(3))).toSet
          if (got != expected)
            println(s"MISMATCH init=$init ops=$ops window=($fromV,$toV]\n got=$got\n exp=$expected")
          got == expected
        } finally {
          spark.sql(s"DROP TABLE IF EXISTS `$db`.`${name}__vlog`")
          spark.sql(s"DROP TABLE IF EXISTS `$db`.`${name}__vmeta`")
        }
    }
}
