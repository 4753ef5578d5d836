package graft

import java.sql.Timestamp
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import graft.operators.EventOps
import graft.streaming.{Ev, StreamingOps}

/** Batch ≡ streaming sessionize under RANDOMIZED arrival order: the
  * closed-session set of [[StreamingOps.statefulSessions]] must equal the
  * batch gap-sessionize ([[EventOps.sessionizeOn]]) on the same events for
  * every arrival schedule the streaming contract covers.
  *
  * Generator constraints — each encodes a boundary of that contract, not a
  * convenience:
  *  - the global event span stays under the 1-hour watermark, so no
  *    arrival order can DROP an event (equivalence is only defined over
  *    watermark-accepted events);
  *  - each chronological session is delivered whole within one
  *    micro-batch. Sessions are shuffled across batches arbitrarily (late
  *    sessions after newer ones — the bc-late-accumulator path), and event
  *    order inside a batch is shuffled arbitrarily. Splitting one
  *    session's events across batches is NOT covered: the stream emits a
  *    closed session at batch end (bounded state), so a later bridging
  *    event would merge in batch but not in the stream — by design.
  */
object SessionizeProperties extends Properties("graft.streaming.Sessions") {

  // streaming-query-per-sample is expensive; 8 samples × ~4 users × random
  // session/batch schedules give dense coverage of the late paths
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private val spark = TestSpark.spark
  import spark.implicits._

  private val BaseMs = Timestamp.valueOf("2024-03-01 12:00:00").getTime
  private val GapMin = 5
  private val qId = new AtomicInteger(0)

  /** One user's timeline: distinct minute offsets in [0, 55] (global span
    * 55 min < the 1-hour watermark), split into gap-delimited sessions,
    * each session assigned to a micro-batch and the per-session order of
    * assignment randomized by the generator.
    */
  private case class UserPlan(user: Long, sessions: List[List[Int]], batchOf: List[Int])

  private def splitSessions(sorted: List[Int]): List[List[Int]] =
    sorted.foldLeft(List.empty[List[Int]]) {
      case (Nil, m) => List(List(m))
      case (cur :: done, m) =>
        if (m - cur.head > GapMin) List(m) :: cur :: done
        else (m :: cur) :: done
    }.map(_.reverse).reverse

  private def genUser(user: Long, nBatches: Int): Gen[UserPlan] = for {
    n <- Gen.choose(4, 16)
    minutes <- Gen.listOfN(n, Gen.choose(0, 55))
    sessions = splitSessions(minutes.distinct.sorted)
    batches <- Gen.listOfN(sessions.length, Gen.choose(0, nBatches - 1))
  } yield UserPlan(user, sessions, batches)

  private val genPlan: Gen[(Int, List[UserPlan], Long)] = for {
    nBatches <- Gen.choose(1, 4)
    nUsers <- Gen.choose(2, 4)
    users <- Gen.sequence[List[UserPlan], UserPlan](
      (1 to nUsers).map(u => genUser(u.toLong, nBatches)).toList)
    shuffleSeed <- Gen.choose(Long.MinValue, Long.MaxValue)
  } yield (nBatches, users, shuffleSeed)

  property("statefulSessions = batch sessionize for any session-whole arrival schedule") =
    forAll(genPlan) { case (nBatches, users, shuffleSeed) =>
      val rnd = new scala.util.Random(shuffleSeed)
      var eid = 0L
      // events per micro-batch: whole sessions land in their assigned
      // batch, arrival order WITHIN a batch is shuffled across users
      val perBatch = Array.fill(nBatches)(List.newBuilder[Ev])
      users.foreach { up =>
        up.sessions.zip(up.batchOf).foreach { case (mins, b) =>
          mins.foreach { m =>
            eid += 1
            perBatch(b) += Ev(up.user, eid,
              new Timestamp(BaseMs + m * 60000L), "click", 1.0)
          }
        }
      }
      val batches = perBatch.map(b => rnd.shuffle(b.result()))

      implicit val ctx = spark.sqlContext
      val in = MemoryStream[Ev]
      val qname = s"sess_prop_${qId.incrementAndGet()}"
      val q = StreamingOps.statefulSessions(in.toDS, gapMs = GapMin * 60000L)
        .writeStream.format("memory").queryName(qname)
        .outputMode("append").start()
      val got =
        try {
          batches.foreach { b =>
            if (b.nonEmpty) { in.addData(b: _*); q.processAllAvailable() }
          }
          // flush: advance the watermark far past every end + gap, then one
          // more batch so the event-time timeouts actually fire
          in.addData(Ev(9999L, 999001L, new Timestamp(BaseMs + 6L * 3600000), "click", 1.0))
          q.processAllAvailable()
          in.addData(Ev(9999L, 999002L, new Timestamp(BaseMs + 12L * 3600000), "click", 1.0))
          q.processAllAvailable()
          spark.table(qname).filter($"user_id" < 9999L).collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime,
              r.getTimestamp(3).getTime))
            .groupBy(identity).view.mapValues(_.length).toMap
        } finally {
          q.stop()
          spark.catalog.dropTempView(qname)
        }

      val allEvents = batches.flatten.map(e => (e.user_id, e.event_id, e.ts)).toSeq
        .toDF("user_id", "event_id", "ts")
      val want = EventOps.sessionizeOn(allEvents, GapMin).collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getTimestamp(3).getTime,
          r.getTimestamp(4).getTime))
        .groupBy(identity).view.mapValues(_.length).toMap

      if (got != want) {
        println(s"[sessionize-prop] MISMATCH seed=$shuffleSeed nBatches=$nBatches " +
          s"plan=$users\n got=$got\n want=$want")
      }
      got == want
    }
}
