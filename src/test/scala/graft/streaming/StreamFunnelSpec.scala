package graft.streaming

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.TestSpark

/** The incremental funnel must land on exactly the batch query's
  * conversion counts for a real ts-ordered micro-batched stream —
  * including users whose steps complete in DIFFERENT batches, which a
  * per-batch window can't see. */
class StreamFunnelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  // sf0.01: the smallest fixture where step-3 conversions exist, so
  // the hour-window leg is exercised, not just trivially empty
  val dir = "/root/testdata/sf0.01"

  test("property: any ts-ordered batch split folds to the global funnel model") {
    val rnd = new scala.util.Random(20260814L)
    val types = Array("click", "view", "purchase", "other")
    val hourUs = 3600L * 1000000L
    for (trial <- 1 to 6) {
      val n = 60 + rnd.nextInt(80)
      val evs = (0 until n).map { _ =>
        StreamFunnel.Ev(rnd.nextInt(5).toLong,
          rnd.nextInt(30).toLong * 1800L * 1000000L, // 30-min grid incl. ties
          types(rnd.nextInt(4)))
      }
      // pure model: global min-based step times per user
      val model = evs.groupBy(_.user_id).map { case (u, es) =>
        val t1 = es.filter(_.event_type == "click").map(_.ts_us).minOption
        val t2 = t1.flatMap(v1 =>
          es.filter(e => e.event_type == "view" && e.ts_us >= v1).map(_.ts_us).minOption)
        val t3 = t2.flatMap(v2 =>
          es.filter(e => e.event_type == "purchase" && e.ts_us >= v2 && e.ts_us <= v2 + hourUs)
            .map(_.ts_us).minOption)
        u -> ((t1.getOrElse(-1L), t2.getOrElse(-1L), t3.getOrElse(-1L)))
      }
      // ts-VALUE cuts (never split a tie group), random count
      val sorted = evs.sortBy(_.ts_us)
      val cutVals = Seq.fill(rnd.nextInt(4))(
        sorted(rnd.nextInt(n)).ts_us).distinct.sorted
      val batches = (Long.MinValue +: cutVals :+ Long.MaxValue).sliding(2).map {
        case Seq(a, b) => sorted.filter(e => e.ts_us > a && e.ts_us <= b)
        case _         => Seq.empty
      }.toSeq
      // fold the update function directly (unit form — no stream needed)
      val state = scala.collection.mutable.Map[Long, StreamFunnel.FunnelState]()
      batches.filter(_.nonEmpty).foreach { b =>
        b.groupBy(_.user_id).foreach { case (u, es) =>
          val gs = new TestGroupState(state.get(u))
          StreamFunnel.update(u, es.iterator, gs).foreach(st => state(u) = st)
        }
      }
      val got = state.map { case (u, st) => u -> ((st.t1, st.t2, st.t3)) }.toMap
      assert(got === model, s"trial $trial diverged (cuts=$cutVals)")
    }
  }

  test("streamed funnel states reproduce events_funnel_steps exactly") {
    val base = Files.createTempDirectory("sfunnel").toString
    val ev = graft.ops.Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("event_type"))
    // three ts-ordered micro-batches (value cuts never split a tie group)
    val Array(c1, c2) = ev.stat.approxQuantile("ts_us", Array(0.33, 0.66), 0.0)
    ev.filter(col("ts_us") <= c1).coalesce(1).write.parquet(s"$base/in/p1")
    ev.filter(col("ts_us") > c1 && col("ts_us") <= c2).coalesce(1).write.parquet(s"$base/in/p2")
    ev.filter(col("ts_us") > c2).coalesce(1).write.parquet(s"$base/in/p3")
    TestSpark.touch(s"$base/in/p1", 1000L)
    TestSpark.touch(s"$base/in/p2", 2000L)
    TestSpark.touch(s"$base/in/p3", 3000L)

    // latest state per user across the run
    val latest = scala.collection.mutable.Map[Long, (Long, Long, Long)]()
    implicit val evEnc = org.apache.spark.sql.Encoders.product[StreamFunnel.Ev]
    val q = StreamFunnel.funnelStates(
        spark.readStream
          .schema(ev.schema)
          .option("maxFilesPerTrigger", "1")
          .option("recursiveFileLookup", "true")
          .parquet(s"$base/in")
          .as[StreamFunnel.Ev])
      .toDF()
      .writeStream
      .outputMode("update")
      .foreachBatch { (b: DataFrame, _: Long) =>
        b.collect().foreach { r =>
          latest(r.getLong(0)) = (r.getLong(1), r.getLong(2), r.getLong(3))
        }
        ()
      }
      .trigger(Trigger.ProcessingTime(100))
      .option("checkpointLocation", s"$base/ckpt")
      .start()
    q.processAllAvailable()
    q.stop()

    import spark.implicits._
    val states = latest.toSeq.map { case (u, (t1, t2, t3)) => (u, t1, t2, t3) }
      .toDF("user_id", "t1", "t2", "t3")
    val streamed = StreamFunnel.funnelCounts(states).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val batch = graft.SparkEntry.queries("events_funnel_steps")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(streamed === batch,
      s"streamed funnel $streamed must equal the batch funnel $batch")
    // sanity: the funnel narrows and something converts
    val users = streamed.map(_._3)
    assert(users(0) >= users(1) && users(1) >= users(2) && users(2) > 0)
  }

  test("TTL deadline is monotone: a late-only batch cannot pull eviction backward") {
    val S = 1000000L
    val idleMs = 120000L
    // batch 1: click at t=2000s -> deadline = 2000s + 120s (ms)
    val gs1 = new TestGroupState[StreamFunnel.FunnelStateTtl](None)
    StreamFunnel.updateTtl(idleMs)(7L,
      Iterator(StreamFunnel.EvT(new java.sql.Timestamp(2000L * 1000), 7L, 2000L * S, "click")),
      gs1).toSeq
    assert(gs1.lastTimeoutMs === 2000L * 1000 + idleMs)
    // batch 2: ONLY a late (older) event, still inside the lateness
    // window — it must fold (the earlier click wins the min) but must
    // NOT pull the eviction deadline back to 1000s + 120s
    val gs2 = new TestGroupState[StreamFunnel.FunnelStateTtl](
      gs1.getOption, watermarkMs = 1990L * 1000)
    val out = StreamFunnel.updateTtl(idleMs)(7L,
      Iterator(StreamFunnel.EvT(new java.sql.Timestamp(1000L * 1000), 7L, 1000L * S, "click")),
      gs2).toSeq
    assert(out.head.t1 === 1000L * S, "the late event still folds into the funnel")
    assert(gs2.lastTimeoutMs === 2000L * 1000 + idleMs,
      "deadline must stay keyed to the newest-ever event, not the batch max")
    assert(gs2.getOption.exists(_.lastSeenMs === 2000L * 1000))
  }

  test("TTL twin survives a restart: in-horizon chains resume, expired users re-enter fresh") {
    import spark.implicits._
    val base = Files.createTempDirectory("sfunnel_restart").toString
    val S = 1000000L
    val schema = Seq((0L, 0L, "")).toDF("user_id", "ts_us", "event_type").schema
    def writeBatch(name: String, mtime: Long, rows: (Long, Long, String)*): Unit = {
      rows.toDF("user_id", "ts_us", "event_type").coalesce(1).write.parquet(s"$base/in/$name")
      TestSpark.touch(s"$base/in/$name", mtime)
    }
    def runUntilDrained(): Map[Long, (Long, Long, Long)] = {
      val latest = scala.collection.mutable.Map[Long, (Long, Long, Long)]()
      implicit val evEnc = org.apache.spark.sql.Encoders.product[StreamFunnel.Ev]
      val q = StreamFunnel.funnelStatesTtl(
          spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .option("recursiveFileLookup", "true")
            .parquet(s"$base/in")
            .as[StreamFunnel.Ev],
          idleSec = 120L, lateSec = 10L)
        .toDF()
        .writeStream
        .outputMode("update")
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.collect().foreach(r =>
            latest(r.getLong(0)) = (r.getLong(1), r.getLong(2), r.getLong(3)))
          ()
        }
        .trigger(Trigger.ProcessingTime(100))
        .option("checkpointLocation", s"$base/ckpt")
        .start()
      q.processAllAvailable()
      q.stop()
      latest.toMap
    }

    // run 1: user 100 clicks then goes idle; user 200 builds a chain
    // whose last event keeps it in-horizon; user 300 advances the
    // watermark to 5095s, past user 100's 1120s deadline but short of
    // user 200's 5115s one — p3 makes the expiry timer actually fire
    writeBatch("p1", 1000L, (100L, 1000L * S, "click"), (200L, 1000L * S, "click"))
    writeBatch("p2", 2000L, (200L, 4995L * S, "view"), (300L, 5100L * S, "click"))
    writeBatch("p3", 3000L, (300L, 5105L * S, "view"))
    val run1 = runUntilDrained()
    assert(run1(100L) === ((1000L * S, -1L, -1L)))
    assert(run1(200L) === ((1000L * S, 4995L * S, -1L)))

    // restart mid-horizon from the same checkpoint: the expired user
    // re-enters as a FRESH funnel (t1 = the new click, not the old
    // 1000s one), while the in-horizon user's checkpointed chain
    // completes with a purchase inside the hour window of its view
    writeBatch("p4", 4000L, (100L, 5110L * S, "click"), (200L, 5200L * S, "purchase"))
    val run2 = runUntilDrained()
    assert(run2(100L) === ((5110L * S, -1L, -1L)),
      "timed-out-and-removed user must restart as a fresh funnel")
    assert(run2(200L) === ((1000L * S, 4995L * S, 5200L * S)),
      "in-horizon user's cross-restart chain must survive via the checkpoint")
  }

  test("TTL twin: idle users age out of the store; in-horizon folding matches the no-TTL form") {
    import spark.implicits._
    val base = Files.createTempDirectory("sfunnel_ttl").toString
    val S = 1000000L // one second in micros
    // f1: 30 churn users + user 500 click at t=1000s
    val f1 = ((1L to 30L).map(u => (u, 1000L * S, "click")) :+ ((500L, 1000L * S, "click")))
      .toDF("user_id", "ts_us", "event_type")
    // f2: user 500 views 60s later (inside the 120s idle horizon) and a
    // filler event far in the future pushes the watermark past everyone
    val f2 = Seq((500L, 1060L * S, "view"), (600L, 200000L * S, "click"))
      .toDF("user_id", "ts_us", "event_type")
    // f3: one more batch so the advanced watermark's timers actually fire
    val f3 = Seq((600L, 300000L * S, "view")).toDF("user_id", "ts_us", "event_type")
    f1.coalesce(1).write.parquet(s"$base/in/p1")
    f2.coalesce(1).write.parquet(s"$base/in/p2")
    f3.coalesce(1).write.parquet(s"$base/in/p3")
    TestSpark.touch(s"$base/in/p1", 1000L)
    TestSpark.touch(s"$base/in/p2", 2000L)
    TestSpark.touch(s"$base/in/p3", 3000L)

    val latest = scala.collection.mutable.Map[Long, (Long, Long, Long)]()
    val stateRows = scala.collection.mutable.ArrayBuffer[Long]()
    implicit val evEnc = org.apache.spark.sql.Encoders.product[StreamFunnel.Ev]
    val q = StreamFunnel.funnelStatesTtl(
        spark.readStream.schema(f1.schema)
          .option("maxFilesPerTrigger", "1")
          .option("recursiveFileLookup", "true")
          .parquet(s"$base/in")
          .as[StreamFunnel.Ev],
        idleSec = 120L, lateSec = 10L)
      .toDF()
      .writeStream
      .outputMode("update")
      .foreachBatch { (b: DataFrame, _: Long) =>
        b.collect().foreach(r =>
          latest(r.getLong(0)) = (r.getLong(1), r.getLong(2), r.getLong(3)))
        ()
      }
      .trigger(Trigger.ProcessingTime(100))
      .option("checkpointLocation", s"$base/ckpt")
      .start()
    q.processAllAvailable()
    q.recentProgress.foreach { p =>
      p.stateOperators.headOption.foreach(so => stateRows += so.numRowsTotal)
    }
    q.stop()

    // in-horizon folding identical to the no-TTL semantics: user 500's
    // click→view chain built across two batches within the horizon
    assert(latest(500L) === ((1000L * S, 1060L * S, -1L)))
    // churn users emitted their step-1 state before expiring
    (1L to 30L).foreach(u => assert(latest(u) === ((1000L * S, -1L, -1L)), s"user $u"))
    // the store is sized by recently-active users, not users ever seen:
    // 32 distinct users flowed through; after the watermark passed the
    // idle horizon only the live user's row remains
    assert(stateRows.nonEmpty)
    assert(stateRows.max >= 31L, s"pre-expiry the store held every user (saw $stateRows)")
    assert(stateRows.last <= 2L,
      s"idle states must be cleared by the event-time timeout (saw $stateRows)")
  }
}
