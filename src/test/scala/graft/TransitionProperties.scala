package graft

import java.sql.Timestamp
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.streaming.{Ev, StreamingOps}

/** Batch ≡ streaming law for the transition matrix: the multiset of
  * (user, from_type, to_type) rows emitted by
  * [[StreamingOps.statefulTransitions]] must equal the batch lag-window
  * pairs for EVERY arrival schedule — events scattered across
  * micro-batches in any order, including a user's later events arriving
  * micro-batches before earlier ones. Unlike the sessionize law (which
  * must deliver sessions whole), transitions carry no cross-batch merge
  * hazard: the op buffers until the watermark finalizes order, so the
  * generator splits ARBITRARILY. The one constraint is the watermark
  * contract itself: the global span stays under the 1-hour watermark so
  * no arrival order can drop an event.
  */
object TransitionProperties extends Properties("graft.streaming.Transitions") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private val spark = TestSpark.spark
  import spark.implicits._

  private val BaseMs = Timestamp.valueOf("2024-03-01 12:00:00").getTime
  private val qId = new AtomicInteger(0)
  private val Types = Vector("view", "click", "purchase", "error")

  private case class EvPlan(user: Long, minute: Int, tpe: Int, batch: Int)

  private val genPlan: Gen[(Int, List[EvPlan], Long)] = for {
    nBatches <- Gen.choose(1, 4)
    nUsers <- Gen.choose(2, 4)
    nEv <- Gen.choose(4, 24)
    evs <- Gen.listOfN(nEv, for {
      u <- Gen.choose(1, nUsers)
      m <- Gen.choose(0, 55) // span < the 1-hour watermark
      t <- Gen.choose(0, Types.length - 1)
      b <- Gen.choose(0, nBatches - 1)
    } yield EvPlan(u.toLong, m, t, b))
    seed <- Gen.choose(Long.MinValue, Long.MaxValue)
  } yield (nBatches, evs, seed)

  property("statefulTransitions = batch lag pairs for ANY arrival schedule") =
    forAll(genPlan) { case (nBatches, evs, seed) =>
      val rnd = new scala.util.Random(seed)
      val withIds = evs.zipWithIndex.map { case (p, i) =>
        Ev(p.user, i + 1L, new Timestamp(BaseMs + p.minute * 60000L),
          Types(p.tpe), 1.0)
      }
      val batches = Array.fill(nBatches)(List.newBuilder[Ev])
      withIds.zip(evs).foreach { case (e, p) => batches(p.batch) += e }

      implicit val ctx = spark.sqlContext
      val in = MemoryStream[Ev]
      val qname = s"trans_prop_${qId.incrementAndGet()}"
      val q = StreamingOps.statefulTransitions(in.toDS)
        .writeStream.format("memory").queryName(qname)
        .outputMode("append").start()
      val got =
        try {
          batches.foreach { b =>
            val rows = rnd.shuffle(b.result())
            if (rows.nonEmpty) { in.addData(rows: _*); q.processAllAvailable() }
          }
          // flush: advance the watermark far past every pending event,
          // then once more so the event-time timeouts fire
          in.addData(Ev(9999L, 999001L,
            new Timestamp(BaseMs + 6L * 3600000), "view", 1.0))
          q.processAllAvailable()
          in.addData(Ev(9999L, 999002L,
            new Timestamp(BaseMs + 12L * 3600000), "view", 1.0))
          q.processAllAvailable()
          spark.table(qname).filter($"user_id" < 9999L).collect()
            .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
            .groupBy(identity).view.mapValues(_.length).toMap
        } finally {
          q.stop()
          spark.catalog.dropTempView(qname)
        }

      // independent local reference: per user, sort by (ts, event_id),
      // chain consecutive types
      val want = withIds.groupBy(_.user_id).toList.flatMap { case (u, es) =>
        val ordered = es.sortBy(e => (e.ts.getTime, e.event_id))
        ordered.zip(ordered.drop(1)).map { case (a, b) =>
          (u, a.event_type, b.event_type)
        }
      }.groupBy(identity).view.mapValues(_.length).toMap

      if (got != want) {
        println(s"MISMATCH seed=$seed got=$got want=$want")
        false
      } else true
    }
}
